"""Compile-time lab for the multi-chip dryrun (CPU-emulated mesh).

The driver gate runs __graft_entry__.dryrun_multichip(8) COLD on an
unknown host: every second of XLA-CPU compile time counts. This lab
times the two programs (init, train step) under candidate configs so the
dryrun can be tuned to finish well inside the driver timeout.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS="--xla_force_host_platform_device_count=8 <extra>" \
        python benchmarks/dryrun_lab.py [--spynet N] [--eager-init] ...
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spynet", type=int, default=4)
    ap.add_argument("--eager-init", action="store_true")
    ap.add_argument("--no-fold", action="store_true")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--hw", type=str, default="64x128")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--aot", action="store_true",
                    help="time lower vs compile; print HLO instruction count")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.parallel import make_mesh
    from learned_pmctf_tpu.training.optim import make_optimizer
    from learned_pmctf_tpu.training.steps import StageGates, make_pmctf_train_step

    n_devices = len(jax.devices())
    print(f"devices: {n_devices} x {jax.devices()[0].platform}")
    spatial = 2
    mesh = make_mesh(n_devices, spatial=spatial)
    data = n_devices // spatial

    module = PMCTF(decomp_levels=1, num_me_stages=2, channel_mv=8,
                   channel_n=8, features=8, ar_features=8,
                   spynet_levels=args.spynet)

    batch = data
    num_frames = args.frames
    h, w = (int(v) for v in args.hw.split("x"))
    g = np.random.default_rng(0)
    frames = jnp.asarray(
        g.integers(0, 256, (num_frames, batch, 1, h, w)), jnp.float32)

    rng = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    dpb = {"mv_feature": None, "ref_mv_y": None}

    ctx = None
    if args.no_fold:
        from learned_pmctf_tpu.ops.fold import fold_small_convs
        ctx = fold_small_convs(False)
        ctx.__enter__()

    t0 = time.time()
    init_fn = lambda r: module.init(r, frames[0], frames[1], 10, dpb,
                                    method=PMCTF.full_init_graph)
    if args.eager_init:
        params = init_fn(rng)
    else:
        params = jax.jit(init_fn)(rng)
    jax.block_until_ready(params)
    t_init = time.time() - t0
    print(f"init: {t_init:.1f}s")

    tx = make_optimizer(params, 1e-4)
    opt_state = tx.init(params)

    frame_sharding = NamedSharding(mesh, P(None, "data", None, None, "spatial"))
    repl = NamedSharding(mesh, P())
    frames = jax.device_put(frames, frame_sharding)
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    step = make_pmctf_train_step(module, tx, num_frames,
                                 StageGates.for_stage(4), remat=args.remat)
    if args.aot:
        with mesh:
            t0 = time.time()
            lowered = step.lower(params, opt_state, frames, jnp.float32(10.0),
                                 jnp.float32(0.05), jax.random.PRNGKey(2))
            t_lower = time.time() - t0
            txt = lowered.as_text()
            n_ops = txt.count("\n")
            n_conv = txt.count("stablehlo.convolution")
            n_dot = txt.count("stablehlo.dot")
            print(f"lower: {t_lower:.1f}s  stablehlo_lines={n_ops} "
                  f"convs={n_conv} dots={n_dot}")
            t0 = time.time()
            compiled = lowered.compile()
            print(f"compile: {time.time() - t0:.1f}s")
        return
    t0 = time.time()
    with mesh:
        params, opt_state, metrics = step(
            params, opt_state, frames, jnp.float32(10.0),
            jnp.float32(0.05), jax.random.PRNGKey(2))
        jax.block_until_ready(params)
    t_step = time.time() - t0
    loss = float(metrics["rd_loss"])
    print(f"step: {t_step:.1f}s  rd_loss={loss:.4f}")
    print(f"TOTAL {t_init + t_step:.1f}s")
    if ctx is not None:
        ctx.__exit__(None, None, None)


if __name__ == "__main__":
    main()

# quick AOT analysis helper (python benchmarks/dryrun_lab.py ... --aot)
