"""A/B the PostProcess stack: XLA width-fold path vs fused Pallas conv.

Measures the full PostProcess apply (13 convs, 64ch) at padded-1080p luma
(1152x1920) and chroma (2x 576x960) under the bf16 activation policy, plus
a numerical agreement check between the two paths.

Run: python benchmarks/pallas_conv_lab.py        (one TPU job at a time)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, runs=10):
    r = fn(*args)
    _ = float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(runs):
        r = fn(*args)
        _ = float(jnp.sum(r))
    return (time.perf_counter() - t0) / runs


def main():
    from learned_pmctf_tpu.models.postprocess import PostProcess
    from learned_pmctf_tpu.models import layers as L
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    g = np.random.default_rng(0)
    module = PostProcess()

    x0 = jnp.asarray(g.normal(0, 30, (1, 1, 128, 128)), jnp.float32)
    os.environ["PMCTF_PALLAS_POST"] = "0"
    params = module.init(jax.random.PRNGKey(0), x0)

    def apply_bf16(p, x):
        with L.conv_compute_dtype(jnp.bfloat16):
            return module.apply(p, x)

    def apply_f32(p, x):
        return module.apply(p, x)

    for (n, h, w, tag) in [(1, 1152, 1920, "luma-1080p"),
                           (2, 576, 960, "chroma-1080p")]:
        x = jnp.asarray(g.normal(0, 30, (n, 1, h, w)), jnp.float32)
        res = {}
        for mode, env in [("xla", "0"), ("pallas", "1")]:
            os.environ["PMCTF_PALLAS_POST"] = env
            for prec, fn in [("bf16", apply_bf16), ("f32", apply_f32)]:
                jf = jax.jit(fn)
                dt = timed(jf, params, x)
                res[(mode, prec)] = (dt, jf(params, x))
                print(f"{tag} {mode:6s} {prec}: {dt*1e3:7.2f} ms", flush=True)
        for prec in ("bf16", "f32"):
            d = float(jnp.max(jnp.abs(res[("xla", prec)][1]
                                      - res[("pallas", prec)][1])))
            print(f"{tag} max|xla-pallas| ({prec}): {d:.3e}")
    os.environ["PMCTF_PALLAS_POST"] = "0"


if __name__ == "__main__":
    main()
