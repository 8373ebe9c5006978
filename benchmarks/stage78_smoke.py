"""Curriculum stages 7-8 (GOP-8 / GOP-16) smoke on the real TPU.

Validates the scan/remat training-step design at its design point
(ref: train_pMCTF_L.py:450-501, configs/train_mctf_gop16.json): compiles
and steps the frames=8 and frames=16 staged train steps at batch 1,
128x128, resuming from a saved init checkpoint (exercises checkpoint
load, --start_stage epoch math, quant-stage transition and ME-stage
cloning at the 8->16 jump).

Usage (from /root/repo, one TPU job at a time):
    python benchmarks/stage78_smoke.py 2>&1 | tee docs/curriculum_smoke_stages7-8.log
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = "/tmp/vimeo_smoke16"
INIT_CKPT = os.path.join(REPO, "experiments", "smoke78_init")


def make_dataset(root=DATA, n_clips=4, n_frames=16, hw=(144, 160)):
    """Vimeo-style tree of 16-frame clips: smooth translating noise so
    motion estimation has real structure to chew on."""
    from PIL import Image
    g = np.random.default_rng(0)
    seq = os.path.join(root, "sequences", "00001")
    names = []
    for ci in range(n_clips):
        folder = os.path.join(seq, f"{ci:04d}")
        os.makedirs(folder, exist_ok=True)
        h, w = hw
        base = g.integers(0, 256, (h + n_frames * 2, w + n_frames * 2, 3))
        base = base.astype(np.uint8)
        for fi in range(n_frames):
            off = fi  # 1 px/frame diagonal pan
            img = base[off:off + h, off:off + w]
            Image.fromarray(img).save(
                os.path.join(folder, f"im{fi + 1:02d}.png"))
        names.append(f"00001/{ci:04d}")
    with open(os.path.join(root, "sep_trainlist.txt"), "w") as f:
        f.write("\n".join(names))
    with open(os.path.join(root, "sep_testlist.txt"), "w") as f:
        f.write(names[0])
    print(f"[smoke78] dataset at {root}: {n_clips} clips x {n_frames} frames")


def make_init_ckpt():
    """Init the full-width model exactly as train_pmctf.py does and save
    it so the trainer can --resume --start_stage 7 from it."""
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache
    from learned_pmctf_tpu.utils.checkpoint import save_checkpoint

    enable_compilation_cache()
    module = PMCTF(lossy=True, num_me_stages=2, ll_mode="fourstep",
                   quant_stage=False, warp_mode="fast")
    g0 = jnp.zeros((1, 1, 128, 128), jnp.float32)
    dpb = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda r: module.init(r, g0, g0, 10, dpb,
                              method=PMCTF.full_init_graph)
    )({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)})
    save_checkpoint(INIT_CKPT, params, None, epoch=18, extra={"smoke": True})
    print(f"[smoke78] init checkpoint saved to {INIT_CKPT}")


def main():
    if not os.path.isdir(DATA):
        make_dataset()
    if not os.path.isdir(INIT_CKPT):
        make_init_ckpt()
    cmd = [
        sys.executable, os.path.join(REPO, "train_pmctf.py"),
        "-d", DATA,
        "--config", os.path.join(REPO, "configs/train_mctf_gop16_smoke.json"),
        "--checkpoint", INIT_CKPT, "--resume", "--start_stage", "7",
        "--batch-size", "1", "--patchsize", "128", "128",
        "--steps_per_epoch", "2", "--num-workers", "2", "--log_every", "1",
        "--fix_interval", "1",
        "--exp_postfix", "_smoke78",
    ]
    # Retry ladder: the remote compile helper occasionally SIGKILLs the
    # Nth big compile of a session (first-of-session compiles of the
    # same size succeed). The persistent compile cache makes each retry
    # strictly monotonic — completed graphs reload in seconds — so a
    # fresh process per attempt converges.
    for attempt in range(4):
        print(f"[smoke78] attempt {attempt}:", " ".join(cmd), flush=True)
        rc = subprocess.run(cmd, cwd=REPO).returncode
        print(f"[smoke78] trainer rc={rc}")
        if rc == 0:
            break
    sys.exit(rc)


if __name__ == "__main__":
    main()
