"""pWave++ image-coder training CLI.

ref: train_pWave.py:213-368. Same recipe: variable-rate training with a
random q_index per step (lambda log-interpolated from [1, 35]*0.003),
AdamW with cosine LR/WD schedules and warmup, grad clipping, best-loss
checkpointing. TPU-native: one jitted train step serves all 21 rate
points (q_index is a traced scalar); batches stream through a threaded
numpy loader.
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import os.path as osp
import sys
import time

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser(description="pWave++ training")
    p.add_argument("-d", "--dataset", type=str, required=True)
    p.add_argument("-e", "--epochs", default=31, type=int)
    p.add_argument("--save-freq", type=int, default=1)
    p.add_argument("-lr", "--learning-rate", default=1e-4, type=float)
    p.add_argument("--min_lr", default=1e-6, type=float)
    p.add_argument("-n", "--num-workers", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--test-batch-size", type=int, default=16)
    p.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--clip_max_norm", default=1.0, type=float)
    p.add_argument("--experiments_root", default="experiments", type=str)
    p.add_argument("--exp_postfix", default="", type=str)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--lossless", action="store_true")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--ll_mode", default="fourstep", choices=("fourstep", "ar"))
    p.add_argument("--features", type=int, default=112)
    p.add_argument("--steps_per_epoch", type=int, default=-1,
                   help="cap steps per epoch (smoke testing)")
    return p.parse_args(argv)


LAMBDA_LIST = [1, 35]  # ref: train_pWave.py:27


def main(argv):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.data import VideoFolder, DataLoader
    from learned_pmctf_tpu.models import PWave
    from learned_pmctf_tpu.training import make_optimizer, make_pwave_train_step
    from learned_pmctf_tpu.utils import cosine_scheduler, get_cur_lambda
    from learned_pmctf_tpu.utils.checkpoint import (
        save_checkpoint, load_checkpoint)
    from learned_pmctf_tpu.utils.logger import get_root_logger, get_env_info
    from learned_pmctf_tpu.utils.visualizer import Visualizer, pwave_visuals

    seed = args.seed if args.seed is not None else 0
    rng = np.random.default_rng(seed)

    exp_name = f"pwave_BS{args.batch_size}_LR{args.learning_rate}{args.exp_postfix}"
    exp_path = osp.join(args.experiments_root, exp_name)
    os.makedirs(exp_path, exist_ok=True)
    logger = get_root_logger(
        log_file=osp.join(exp_path, f"train_{time.strftime('%Y%m%d_%H%M%S')}.log"))
    logger.info(get_env_info())
    visualizer = Visualizer(exp_path)

    train_ds = VideoFolder(args.dataset, split="train",
                           patch_size=tuple(args.patch_size), seed=seed)
    valid_ds = VideoFolder(args.dataset, split="valid",
                           patch_size=tuple(args.patch_size), seed=seed)
    train_loader = DataLoader(train_ds, args.batch_size,
                              num_workers=args.num_workers, seed=seed)
    valid_loader = DataLoader(valid_ds, min(args.test_batch_size, len(valid_ds)),
                              shuffle=False, num_workers=args.num_workers,
                              drop_last=False)

    steps_per_epoch = len(train_loader)
    if args.steps_per_epoch > 0:
        steps_per_epoch = min(steps_per_epoch, args.steps_per_epoch)

    module = PWave(lossy=not args.lossless, ll_mode=args.ll_mode,
                   features=args.features)
    x0 = jnp.zeros((args.batch_size, 1, *args.patch_size), jnp.float32)
    params = jax.jit(lambda: module.init(jax.random.PRNGKey(seed), x0, 10))()
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info(f"parameters: {n_params / 1e6:.3f}M")

    warmup_epochs = int(args.epochs * 0.055)
    lr_sched = cosine_scheduler(args.learning_rate, args.min_lr, args.epochs,
                                steps_per_epoch, warmup_epochs=warmup_epochs)
    lr_fn = lambda step: jnp.asarray(lr_sched)[jnp.minimum(step, len(lr_sched) - 1)]

    tx = make_optimizer(params, lr_fn, weight_decay=args.weight_decay,
                        clip_norm=args.clip_max_norm)
    opt_state = tx.init(params)
    step_fn = make_pwave_train_step(module, tx)

    start_epoch = 0
    if args.checkpoint:
        params, opt_state, meta = load_checkpoint(
            args.checkpoint, params, opt_state)
        start_epoch = meta.get("epoch", -1) + 1
        logger.info(f"resumed from {args.checkpoint} at epoch {start_epoch}")

    qp_num = module.get_qp_num()
    best_loss = float("inf")
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        log_freq = max(1, steps_per_epoch // 50)
        for it, batch in enumerate(train_loader):
            if it >= steps_per_epoch:
                break
            q_index = int(rng.integers(0, qp_num))
            lmbda = get_cur_lambda(LAMBDA_LIST, q_index, qp_num)
            x = jnp.asarray(batch)
            if args.lossless:
                x = jnp.round(x)
            params, opt_state, metrics = step_fn(
                params, opt_state, x, jnp.float32(q_index), jnp.float32(lmbda))
            if it % log_freq == 0:
                logger.info(
                    f"epoch {epoch} [{it}/{steps_per_epoch}] "
                    f"loss {float(metrics['loss']):.4f} "
                    f"mse {float(metrics['mse']):.3f} "
                    f"bpp {float(metrics['bpp']):.4f} q {q_index}")

        # validation at the highest rate point (ref: train_pWave.py:116-158)
        val_losses = []
        q_index = qp_num - 1
        lmbda = get_cur_lambda(LAMBDA_LIST, q_index, qp_num)
        eval_fn = jax.jit(lambda p, x: module.apply(p, x, jnp.float32(q_index),
                                                    training=False))
        first_batch = True
        for batch in valid_loader:
            x = jnp.asarray(batch)
            out = eval_fn(params, x)
            n, _, h, w = batch.shape
            bpp = float(jnp.sum(out["bits"])) / (n * h * w)
            val_losses.append(lmbda * float(out["mse"]) + bpp)
            if first_batch:
                visualizer.display_current_results(
                    pwave_visuals(module, params, x[:1], out["x_hat"][:1]),
                    epoch, is_eval=True)
                first_batch = False
        loss = float(np.mean(val_losses)) if val_losses else float("inf")
        logger.info(f"epoch {epoch} valid loss {loss:.4f} "
                    f"({time.time() - t0:.0f}s)")

        is_best = loss < best_loss
        best_loss = min(best_loss, loss)
        if epoch % args.save_freq == 0 or epoch == args.epochs - 1 or is_best:
            name = "checkpoint_best_loss" if is_best else f"state_epoch{epoch}"
            save_checkpoint(osp.join(exp_path, name), params, opt_state,
                            epoch, {"loss": loss})
            logger.info(f"saved {name}")


if __name__ == "__main__":
    main(sys.argv[1:])
