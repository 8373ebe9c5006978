"""Width-only fold (1x2) vs full fold (2x2) vs direct, postprocess-shaped.

fold2x2 turns a 64ch net into 256ch at H/2 x W/2 but pays 4x FLOPs
(structural zeros run as real MACs); measured 104 -> 91 ms, i.e. the
fold only breaks even against the 4x price. Width-only fold (1x2) pays
2x FLOPs for 2C channels at H x W/2 — if the 128ch MXU rate is ~2x the
64ch rate, the net halves again.

Emulates the PostProcess body: 14 chained 3x3 convs at 64ch, 1080p,
batch 1, bf16 compute. Also raw-rate table for the candidate shapes.

Run: python benchmarks/foldw_lab.py
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    g = np.random.default_rng(0)

    def conv(x, w, pad="SAME"):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), pad, dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def timed(fn, *args, runs=3):
        r = fn(*args)
        float(jnp.sum(r.astype(jnp.float32) % 997.0))
        t0 = time.perf_counter()
        for _ in range(runs):
            r = fn(*args)
            float(jnp.sum(r.astype(jnp.float32) % 997.0))
        return (time.perf_counter() - t0) / runs

    # --- raw rate table ---------------------------------------------------
    K = 12
    for ch, h, w in [(64, 1152, 1920), (128, 1152, 960), (128, 576, 960),
                     (224, 576, 480), (256, 576, 960), (256, 576, 480),
                     (112, 576, 960), (224, 576, 960)]:
        x = jnp.asarray(g.normal(0, 1, (1, ch, h, w)), jnp.bfloat16)
        ws = [jnp.asarray(g.normal(0, 0.05, (ch, ch, 3, 3)), jnp.bfloat16)
              for _ in range(K)]

        @jax.jit
        def stack(x, ws=tuple(ws)):
            for wt in ws:
                x = conv(x, wt)
            return x

        dt = timed(stack, x)
        fl = 2 * ch * ch * 9 * h * w * K
        print(f"{ch:4d}ch @{h}x{w}: {dt*1e3/K:6.2f} ms/conv "
              f"{fl/dt/1e12:6.1f} TF/s", flush=True)

    # --- postprocess-shaped A/B ------------------------------------------
    from learned_pmctf_tpu.ops.fold import fold2, unfold2, fold2_weights
    h, w, ch, n = 1152, 1920, 64, 14
    x0 = jnp.asarray(g.normal(0, 1, (1, 1, h, w)), jnp.bfloat16)
    win = jnp.asarray(g.normal(0, 0.1, (ch, 1, 3, 3)), jnp.bfloat16)
    ws = [jnp.asarray(g.normal(0, 0.05, (ch, ch, 3, 3)), jnp.bfloat16)
          for _ in range(n)]
    wout = jnp.asarray(g.normal(0, 0.1, (1, ch, 3, 3)), jnp.bfloat16)

    @jax.jit
    def direct(x):
        x = conv(x, win)
        for wt in ws:
            x = jax.nn.relu(conv(x, wt))
        return conv(x, wout)

    @jax.jit
    def folded22(x):
        x = fold2(x)
        wi, pad = fold2_weights(win)
        x = conv(x, wi, pad)
        for wt in ws:
            wf, pad = fold2_weights(wt)
            x = jax.nn.relu(conv(x, wf, pad))
        wo, pad = fold2_weights(wout)
        return unfold2(conv(x, wo, pad))

    # width-only fold: (B,C,H,W) -> (B,2C,H,W/2); kernel 3x3 -> 3x3 with
    # dx = 2v + q_in - q_out, v in [-1,1] (same index algebra as fold2
    # restricted to the W axis).
    def foldw(x):
        b, c, hh, ww = x.shape
        return x.reshape(b, c, hh, ww // 2, 2).transpose(0, 1, 4, 2, 3) \
                .reshape(b, 2 * c, hh, ww // 2)

    def unfoldw(x):
        b, c2, hh, ww = x.shape
        return x.reshape(b, c2 // 2, 2, hh, ww).transpose(0, 1, 3, 4, 2) \
                .reshape(b, c2 // 2, hh, 2 * ww)

    def foldw_weights(wt):
        o, i, kh, kw = wt.shape
        m = np.zeros((2, 2, 3, kh, kw), np.float32)
        r = (kw - 1) // 2
        for qo in range(2):
            for qi in range(2):
                for vi, v in enumerate((-1, 0, 1)):
                    dx = 2 * v + qi - qo
                    if abs(dx) <= r:
                        m[qo, qi, vi, :, dx + r] = 1.0
        mm = jnp.asarray(m, wt.dtype)
        wf = jnp.einsum("abvyx,oiyx->oaibyv", mm, wt).reshape(2 * o, 2 * i, kh, 3)
        return wf, ((kh // 2, kh // 2), (1, 1))

    @jax.jit
    def folded1x2(x):
        x = foldw(x)
        wi, pad = foldw_weights(win)
        x = conv(x, wi, pad)
        for wt in ws:
            wf, pad = foldw_weights(wt)
            x = jax.nn.relu(conv(x, wf, pad))
        wo, pad = foldw_weights(wout)
        return unfoldw(conv(x, wo, pad))

    # numeric check (f32 weights/inputs)
    xs = jnp.asarray(g.normal(0, 1, (1, 1, 64, 64)), jnp.float32)
    a = direct(xs.astype(jnp.bfloat16)).astype(jnp.float32)
    b = folded1x2(xs.astype(jnp.bfloat16)).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"fold1x2 vs direct rel err: {err:.2e}")

    for name, fn in [("direct64", direct), ("fold2x2->256", folded22),
                     ("fold1x2->128", folded1x2)]:
        dt = timed(fn, x0)
        print(f"postproc-shaped {name}: {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
