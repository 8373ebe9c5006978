"""Chained-timing breakdown of the pWave/pMCTF hot path at 1080p.

Each component is applied K times inside ONE jitted program with the
output (or an epsilon-coupled derivative of it) fed back as input, so the
~35-70 ms axon readback cost is amortized: per-op = (t_chain)/K.

Run: python benchmarks/profile_pwave.py
"""

import time

import numpy as np

K = 8


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.models.pwave import PWave
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    module = PMCTF(decomp_levels=4, num_me_stages=4, ll_mode="fourstep", warp_mode="fast")
    g = np.random.default_rng(0)
    small = jnp.asarray(g.integers(0, 256, (1, 1, 128, 128)), jnp.float32)
    dpb0 = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda r: module.init(r, small, small, 10, dpb0,
                              method=PMCTF.full_init_graph)
    )({"params": jax.random.PRNGKey(0)})

    h, w = 1152, 1920
    x = jnp.asarray(g.integers(0, 256, (1, 1, h, w)), jnp.float32)
    cur = jnp.asarray(g.integers(0, 256, (1, 1, h, w)), jnp.float32)
    q = jnp.float32(10.0)

    apply = module.apply

    def chain(body, x0, runs=3):
        @jax.jit
        def chained(x):
            for _ in range(K):
                x = body(x)
            return jnp.sum(x.astype(jnp.float32) % 997.0)
        float(chained(x0))
        t0 = time.perf_counter()
        for _ in range(runs):
            float(chained(x0))
        return (time.perf_counter() - t0) / runs / K

    def eps(x, out):
        """Couple x to out without changing values (serializes the chain)."""
        leaf = jax.tree_util.tree_leaves(out)[0]
        return x + 1e-30 * leaf.astype(x.dtype).ravel()[0]

    # --- components -----------------------------------------------------
    def hp_full(xx):
        out = apply(params, xx, q, training=False,
                    method=lambda m, a, b, training: m.hp_coder(
                        a, b, training=training))
        return out["x_hat"]

    def ana_syn(xx):
        def f(m, a):
            y = m.hp_coder.analysis(a)
            rec = {l: dict(y[l]) for l in y}
            return m.hp_coder.synthesis(rec)
        return apply(params, xx, method=f)

    def ana_only(xx):
        def f(m, a):
            return m.hp_coder.analysis(a)
        y = apply(params, xx, method=f)
        return eps(xx, y[3]["ll"])

    def post_only(xx):
        return apply(params, xx,
                     method=lambda m, a: m.hp_coder.postprocess(a))

    sb = jnp.asarray(g.normal(0, 2, (1, 1, 576, 960)), jnp.float32)
    ctx = jnp.asarray(g.normal(0, 1, (1, 1, 576, 960)), jnp.float32)
    prev = jnp.asarray(g.normal(0, 2, (1, 1, 288, 480)), jnp.float32)

    def fusion_l0(ss):
        def f(m, a):
            out = m.hp_coder.context_fusion["0_lh"](
                a, context=ctx, prev_subband=prev, training=False)
            return out[2]  # x_hat (same shape)
        return apply(params, ss, method=f)

    def lstm_l0(ss):
        def f(m, a):
            states = m.hp_coder.context_prediction.init_states(
                1, a.shape[2], a.shape[3], a.dtype)
            c, _ = m.hp_coder.context_prediction.step(a, states)
            return c
        c = apply(params, ss, method=f)
        return eps(ss, c)

    pu_in = jnp.asarray(g.normal(0, 1, (1, 1, 1152, 960)), jnp.float32)

    def pu_only(xx):
        def f(m, a):
            return m.hp_coder.wavelet.lift_h.p1(a)
        return apply(params, xx, method=f)

    def lift1d(xx):
        def f(m, a):
            l, hh = m.hp_coder.wavelet.lift_h.forward_lift(a)
            return jnp.concatenate([l, hh], axis=2)
        return apply(params, xx, method=f)

    def spynet(xx):
        def f(m, a):
            return m.optic_flow(a / 255.0, cur / 255.0)
        flow = apply(params, xx, method=f)
        return eps(xx, flow)

    def motion(xx):
        def f(m, a):
            return m.compute_and_code_motion(a, cur, q, dpb0, 0, 1, False)
        out = apply(params, xx, method=f)
        return eps(xx, out[0])

    cases = [
        ("fusion_l0(576x960)", fusion_l0, sb),
        ("lstm_step_l0", lstm_l0, sb),
        ("pu_net(1152x960)", pu_only, pu_in),
        ("lift1d_fwd(1152x1920)", lift1d, x),
        ("spynet", spynet, x),
        ("motion_full", motion, x),
    ]
    for name, fn, x0 in cases:
        dt = chain(fn, x0)
        print(f"{name:28s} {dt*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
