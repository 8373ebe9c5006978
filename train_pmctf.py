"""pMCTF-L staged-curriculum training CLI.

ref: train_pMCTF_L.py:286-531. Same 8-stage JSON curriculum (frames
4->4->2->2->2->4->8->16, parts Inter/All/MCTF, per-stage lr and frame
interval, loss-term gating), expressed over immutable pytrees:
freezing = optax masks, ME-stage cloning = params-tree copies, dataset
switching handled by the long-clip-capable VideoYCbCr loader. The GOP
graph is differentiated end-to-end with per-stage rematerialization.
"""

from __future__ import annotations

import argparse
import math
import os
import os.path as osp
import sys
import time

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser(description="pMCTF-L training")
    p.add_argument("-d", "--dataset", type=str, required=True)
    p.add_argument("--iframe_path", type=str, default=None,
                   help="pWave++ checkpoint to initialize lp/hp coders")
    p.add_argument("--spynet_path", type=str, default=None,
                   help="pretrained SpyNet torch checkpoint (key-remapped)")
    p.add_argument("--config", type=str, default="configs/train_mctf_gop16.json")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--start_stage", type=int, default=-1)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--patchsize", type=int, nargs=2, default=(128, 128))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--exp_postfix", default="", type=str)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--lossless", action="store_true")
    p.add_argument("--num_me_stages", default=2, type=int)
    p.add_argument("--ll_mode", default="fourstep", choices=("fourstep", "ar"))
    p.add_argument("--warp_mode", default="fast", choices=("exact", "fast"),
                   help="'fast' trains a self-consistent gather-free-warp "
                        "model; use 'exact' for reference-semantics parity")
    p.add_argument("--steps_per_epoch", type=int, default=-1)
    p.add_argument("--fix_interval", type=int, default=0,
                   help="pin the frame interval (and thus the ME-stage "
                        "selection): exactly ONE step graph compiles per "
                        "stage instead of num_me_stages — used by smoke "
                        "runs to halve remote-compile exposure")
    p.add_argument("--fix_q", type=int, default=-1,
                   help="pin the per-step q_index (default: random per "
                        "step, the reference's variable-rate sampling) — "
                        "makes the logged rd loss comparable across steps "
                        "for loss-curve evidence")
    p.add_argument("--log_every", type=int, default=100,
                   help="log train metrics every N global steps")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard the batch over this many devices (0 = all "
                        "visible devices if >1, else single-device); the "
                        "jitted GOP step is pure SPMD, so XLA inserts the "
                        "gradient all-reduce over ICI "
                        "(tests/dp_equiv_script.py asserts equivalence)")
    return p.parse_args(argv)


def main(argv):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.data import VideoYCbCr, DataLoader
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.training import (
        make_optimizer, make_pmctf_train_step, make_pmctf_train_step_split)
    from learned_pmctf_tpu.training.steps import StageGates
    from learned_pmctf_tpu.training.optim import trainable_mask
    from learned_pmctf_tpu.training.curriculum import (
        CurriculumConfig, PART_PREDICATES, clone_me_stage, load_from_iframe)
    from learned_pmctf_tpu.utils import get_cur_lambda
    from learned_pmctf_tpu.utils.checkpoint import (
        save_checkpoint, load_checkpoint)
    from learned_pmctf_tpu.utils.logger import get_root_logger, get_env_info

    # persistent compile cache: the staged GOP-8/16 step graphs take tens
    # of minutes to compile remotely; cache hits make retries/resumes cheap
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = CurriculumConfig.from_json(args.config)
    rng = np.random.default_rng(args.seed)

    # data parallelism: replicate params, shard the batch axis over the
    # mesh 'data' axis; the step compiles once and XLA SPMD adds the
    # gradient psum over ICI (SURVEY.md §2.6 item 1)
    n_dp = args.data_parallel or (
        jax.device_count() if jax.device_count() > 1 else 0)
    if n_dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from learned_pmctf_tpu.parallel import make_mesh
        assert args.batch_size % n_dp == 0, (args.batch_size, n_dp)
        dp_mesh = make_mesh(n_dp, spatial=1)
        dp_repl = NamedSharding(dp_mesh, P())
        dp_frames = NamedSharding(dp_mesh, P(None, "data"))
    else:
        dp_mesh = None

    exp_path = osp.join("experiments", f"pmctf_BS{args.batch_size}{args.exp_postfix}")
    os.makedirs(exp_path, exist_ok=True)
    logger = get_root_logger(
        log_file=osp.join(exp_path, f"train_{time.strftime('%Y%m%d_%H%M%S')}.log"))
    logger.info(get_env_info())

    module = PMCTF(lossy=not args.lossless, num_me_stages=args.num_me_stages,
                   ll_mode=args.ll_mode, quant_stage=False,
                   warp_mode=args.warp_mode)

    # init (touch all stages)
    g0 = jnp.zeros((args.batch_size, 1, *args.patchsize), jnp.float32)
    dpb = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda r: module.init(r, g0, g0, 10, dpb,
                              method=PMCTF.full_init_graph)
    )({"params": jax.random.PRNGKey(args.seed),
       "noise": jax.random.PRNGKey(args.seed + 1)})

    n_params = sum(p.size for p in jax.tree.leaves(params))
    n_mctf = sum(p.size for k, p in params["params"].items()
                 for p in jax.tree.leaves(p)
                 if k.startswith(("optic_flow", "temporal_filtering", "mv")))
    logger.info(f"parameters total {n_params/1e6:.3f}M, MCTF {n_mctf/1e6:.3f}M")

    if args.iframe_path:
        iframe_params, _, _ = load_checkpoint(args.iframe_path)
        params = load_from_iframe(params, iframe_params)
        logger.info(f"loaded I-frame model from {args.iframe_path}")
    if args.spynet_path:
        from learned_pmctf_tpu.utils.torch_import import load_spynet_torch
        params["params"]["optic_flow"] = load_spynet_torch(args.spynet_path)
        logger.info(f"loaded SpyNet from {args.spynet_path}")

    dataset = VideoYCbCr(args.dataset, split="train",
                         num_frames=cfg.num_frames[0],
                         patch_size=tuple(args.patchsize),
                         lossless=args.lossless, seed=args.seed)
    loader = DataLoader(dataset, args.batch_size,
                        num_workers=args.num_workers, seed=args.seed)

    qp_num = module.get_qp_num()

    stage_num = 0
    epochs_cur_stage = 0
    start_epoch = 0
    opt_state = None
    step_fn = None
    quant_stage_enabled = False

    if args.checkpoint:
        params, _, meta = load_checkpoint(args.checkpoint, params)
        if args.resume:
            if args.start_stage > 0:
                start_epoch = sum(cfg.num_epochs[:args.start_stage - 1])
            else:
                start_epoch = meta.get("epoch", -1) + 1
            acc = 0
            for sn, dur in enumerate(cfg.num_epochs):
                acc += dur
                if acc > start_epoch:
                    stage_num = sn
                    epochs_cur_stage = start_epoch - (acc - dur)
                    break
            logger.info(f"resume at epoch {start_epoch}, stage {stage_num+1}")

    def configure_stage(stage_num, params):
        """(Re)build optimizer + train step for the stage."""
        nonlocal quant_stage_enabled, module
        part = cfg.parts[stage_num]
        num_frames = cfg.num_frames[stage_num]
        dataset.update_num_frames(num_frames, logger)
        if cfg.frame_interval[stage_num] > 1:
            dataset.update_interval(cfg.frame_interval[stage_num], logger)
        if stage_num >= 4 and part == "All":
            dataset.use_random_interval()
        # >= so a resume that jumps PAST the transition stage (e.g.
        # --start_stage 7) still enables the temporal-layer quality
        # scaling that stage 6 would have switched on
        if stage_num >= 5 and part == "All" and not quant_stage_enabled:
            logger.info("ENABLE TEMPORAL LAYER ADAPTIVE QUALITY SCALING")
            # flax Modules are frozen dataclasses: clone(), not replace()
            # (hp_q_scale params exist in the tree regardless of the flag,
            # so flipping it mid-curriculum is structurally safe)
            module = module.clone(quant_stage=True)
            quant_stage_enabled = True
        if num_frames > 8 and num_frames != cfg.num_frames[stage_num - 1]:
            me_stage = int(math.log2(num_frames))
            start_idx = min(me_stage - 1, args.num_me_stages - 1)
            copy_idx = min(me_stage - 2, args.num_me_stages - 2)
            if start_idx > copy_idx >= 0:
                logger.info(f"cloning ME stage {copy_idx} -> {start_idx}+")
                params = clone_me_stage(params, start_idx, copy_idx,
                                        args.num_me_stages)
        predicate = PART_PREDICATES[part]
        mask = trainable_mask(params, predicate)
        tx = make_optimizer(params, cfg.lr[stage_num], weight_decay=0.0,
                            clip_norm=5.0, trainable=mask)
        opt_state = tx.init(params)
        gates = StageGates.for_stage(stage_num)
        # one jitted step per me_base (frame-interval-dependent ME stage
        # offset, ref: train_pMCTF_L.py:153-159); bounded by num_me_stages.
        # GOP >= split threshold (default 16) uses the stage-split step:
        # the fused GOP-16 step graph SIGKILLs the remote compile helper
        # (~17 MB MLIR), the per-stage programs have ample margin
        # (steps.py make_pmctf_train_step_split).
        split_gop = int(os.environ.get("PMCTF_SPLIT_GOP", "16"))
        make_step = make_pmctf_train_step_split if num_frames >= split_gop \
            else make_pmctf_train_step
        step_fn = {
            mb: make_step(module, tx, num_frames, gates, me_base=mb)
            for mb in range(args.num_me_stages)
        }
        logger.info(f"STAGE {stage_num+1}: part={part} frames={num_frames} "
                    f"lr={cfg.lr[stage_num]} gates={gates}")
        return params, opt_state, step_fn

    def place_dp(params, opt_state):
        if dp_mesh is not None:
            params = jax.device_put(params, dp_repl)
            opt_state = jax.device_put(opt_state, dp_repl)
        return params, opt_state

    params, opt_state, step_fn = configure_stage(stage_num, params)
    params, opt_state = place_dp(params, opt_state)

    noise_key = jax.random.PRNGKey(args.seed + 7)
    global_step = 0
    for epoch in range(start_epoch, cfg.total_epochs):
        if epochs_cur_stage == cfg.num_epochs[stage_num]:
            epochs_cur_stage = 0
            stage_num += 1
            params, opt_state, step_fn = configure_stage(stage_num, params)
            params, opt_state = place_dp(params, opt_state)

        num_frames = cfg.num_frames[stage_num]
        max_interval = cfg.frame_interval[stage_num]
        random_interval = stage_num >= 3
        if args.fix_interval > 0:
            random_interval = False
            max_interval = args.fix_interval

        steps = len(loader)
        if args.steps_per_epoch > 0:
            steps = min(steps, args.steps_per_epoch)
        t0 = time.time()
        if random_interval:
            dataset.use_random_interval()
            current_interval = dataset.set_current_interval()
        else:
            current_interval = max_interval
        for it, batch in enumerate(loader):
            if it >= steps:
                break
            global_step += 1
            # frames arrive as tuple of (B,3,ph,pw); train on Y only
            frames = jnp.stack([jnp.asarray(f)[:, 0:1] for f in batch])
            if dp_mesh is not None:
                frames = jax.device_put(frames, dp_frames)
            q_index = args.fix_q if args.fix_q >= 0 \
                else int(rng.integers(0, qp_num))
            lmbda = get_cur_lambda(cfg.train_lambda, q_index, qp_num)
            if random_interval:
                me_num = 0 if current_interval == 1 else \
                    current_interval // max(args.num_me_stages - 1, 1)
            else:
                me_num = min(args.num_me_stages - 1, max_interval - 1)
            me_num = min(me_num, args.num_me_stages - 1)
            noise_key, sub = jax.random.split(noise_key)
            params, opt_state, metrics = step_fn[me_num](
                params, opt_state, frames, jnp.float32(q_index),
                jnp.float32(lmbda), sub)
            if global_step % args.log_every == 0:
                logger.info(
                    f"epoch {epoch} [{it}/{steps}] "
                    f"rd {float(metrics['rd_loss']):.4f} "
                    f"mse {float(metrics['mse']):.2f} "
                    f"bppH {float(metrics['bpp_H']):.4f} "
                    f"bppMV {float(metrics['bpp_mv']):.4f} q {q_index}")
            if random_interval:
                current_interval = dataset.set_current_interval()

        epochs_cur_stage += 1
        save_checkpoint(osp.join(exp_path, f"state_epoch{epoch}"),
                        params, opt_state, epoch,
                        {"stage_num": stage_num,
                         "quant_stage": quant_stage_enabled})
        logger.info(f"epoch {epoch} done in {time.time()-t0:.0f}s; saved")


if __name__ == "__main__":
    main(sys.argv[1:])
