"""Sustained curriculum stage 7-8 training on the real TPU (VERDICT r3
item 4): >=20 consecutive GOP-8 steps and >=5 GOP-16 steps with the
rd_loss trend visible in the log.

Reuses stage78_smoke's synthetic vimeo tree + init checkpoint; runs the
real trainer (train_pmctf.py) from --start_stage 7 with 20 steps/epoch
and per-step logging, so the committed log shows a loss curve rather
than a single step. ref: train_pMCTF_L.py:161-251 (the staged loop).

Usage (one TPU job at a time):
    python benchmarks/stage78_sustained.py 2>&1 | tee docs/curriculum_sustained.log
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stage78_smoke import INIT_CKPT, make_dataset, make_init_ckpt  # noqa: E402

# 24 clips: the trainer caps steps/epoch at len(dataset)/batch, so the
# 4-clip smoke tree silently shortens "20 steps/epoch" to 4 (observed in
# the first r4 run). 24 clips / batch 1 >= the 20-step ask.
DATA = "/tmp/vimeo_sustained24"


def main():
    if not os.path.isdir(DATA):
        make_dataset(root=DATA, n_clips=24)
    if not os.path.isdir(INIT_CKPT):
        make_init_ckpt()
    cmd = [
        sys.executable, os.path.join(REPO, "train_pmctf.py"),
        "-d", DATA,
        "--config", os.path.join(REPO, "configs/train_mctf_gop16_smoke.json"),
        "--checkpoint", INIT_CKPT, "--resume", "--start_stage", "7",
        "--batch-size", "1", "--patchsize", "128", "128",
        "--steps_per_epoch", "20", "--num-workers", "2",
        # log_every 5, NOT 1: a metrics readback immediately after every
        # single dispatch of the big GOP-8/16 step program wedges the
        # axon relay reproducibly at step 1 (r3 stage-8, r4 stage-7 —
        # 40+ min stuck in wait_woken with 0% CPU). Batching 5 dispatches
        # between syncs avoids it (probe evidence: /tmp/probe78.log ran
        # 5 GOP-8 steps + stage-8 transition cleanly).
        "--log_every", "5",
        # pin q so the logged rd values are comparable across steps
        "--fix_q", "10",
        "--fix_interval", "1",
        "--exp_postfix", "_sustained78",
    ]
    # Retry ladder (see stage78_smoke.py): the remote compile helper can
    # SIGKILL a late big compile; the persistent cache makes retries
    # strictly monotonic.
    for attempt in range(4):
        print(f"[sustained78] attempt {attempt}:", " ".join(cmd), flush=True)
        rc = subprocess.run(cmd, cwd=REPO).returncode
        print(f"[sustained78] trainer rc={rc}", flush=True)
        if rc == 0:
            break
    sys.exit(rc)


if __name__ == "__main__":
    main()
