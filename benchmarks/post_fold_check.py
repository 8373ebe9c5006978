import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp, time
from learned_pmctf_tpu.models.postprocess import PostProcess
from learned_pmctf_tpu.ops.fold import fold_small_convs

g = np.random.default_rng(0)
x = jnp.asarray(g.normal(0, 1, (1, 1, 64, 96)), jnp.float32)
m = PostProcess(1, 1)
with fold_small_convs(False):
    params = m.init(jax.random.PRNGKey(0), x)
    ref = jax.jit(lambda p, a: m.apply(p, a))(params, x)
with fold_small_convs(True):
    out = jax.jit(lambda p, a: m.apply(p, a))(params, x)
err = float(jnp.max(jnp.abs(ref - out)))
print("postprocess fold on/off max err:", err)
assert err < 5e-4, err  # 15 chained convs at bf16-default MXU precision

# timing at full-res 1080p
xb = jnp.asarray(g.normal(0, 1, (1, 1, 1152, 1920)), jnp.float32)
def timeit(fn, *a, runs=3):
    float(jnp.sum(fn(*a)))
    t0 = time.perf_counter()
    for _ in range(runs): float(jnp.sum(fn(*a)))
    return (time.perf_counter()-t0)/runs*1e3
with fold_small_convs(False):
    t_off = timeit(jax.jit(lambda p, a: m.apply(p, a)), params, xb)
with fold_small_convs(True):
    t_on = timeit(jax.jit(lambda p, a: m.apply(p, a)), params, xb)
print(f"postprocess 1080p: unfolded {t_off:.1f} ms  folded {t_on:.1f} ms")
