"""Full-curriculum smoke: stages 1->8 in ONE trainer run (VERDICT r4
item 7).

Previous rounds proved the stages in disjoint fragments (1-5, resume at
6, 7-8); this runs the ENTIRE 8-stage smoke curriculum (frames
4->4->2->2->2->4->8->16, parts Inter/All/MCTF, ME cloning at the 8->16
jump, quality-scaling enable at stage 6) in one process from a fresh
init — every stage transition, freeze/unfreeze repartition and dataset
frame-count/interval switch exercised back-to-back, ending with GOP-16
steps through the split train step. ref: train_pMCTF_L.py:450-501.

Usage (one TPU job at a time):
    python benchmarks/curriculum_full_smoke.py 2>&1 | tee docs/curriculum_full_smoke.log
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stage78_smoke import make_dataset  # noqa: E402

DATA = "/tmp/vimeo_fullsmoke24"


def main():
    if not os.path.isdir(DATA):
        make_dataset(root=DATA, n_clips=24)
    cmd = [
        sys.executable, os.path.join(REPO, "train_pmctf.py"),
        "-d", DATA,
        "--config", os.path.join(REPO, "configs/train_mctf_gop16_smoke.json"),
        "--batch-size", "1", "--patchsize", "128", "128",
        "--steps_per_epoch", "2", "--num-workers", "2",
        # log_every 2 (not 1): per-dispatch readbacks of the big step
        # programs can wedge the axon relay (see stage78_sustained.py)
        "--log_every", "2",
        "--fix_q", "10",
        "--fix_interval", "1",
        "--exp_postfix", "_fullsmoke",
    ]
    # Retry ladder: if the remote compile helper dies on a late compile,
    # resume from the last epoch checkpoint (persistent compile cache
    # makes the retry strictly monotonic).
    ckpt_dir = os.path.join(REPO, "experiments", "pmctf_BS1_fullsmoke")
    for attempt in range(4):
        c = list(cmd)
        if attempt > 0 and os.path.isdir(ckpt_dir):
            epochs = sorted(int(d.replace("state_epoch", ""))
                            for d in os.listdir(ckpt_dir)
                            if d.startswith("state_epoch"))
            if epochs:
                c += ["--checkpoint",
                      os.path.join(ckpt_dir, f"state_epoch{epochs[-1]}"),
                      "--resume"]
        print(f"[fullsmoke] attempt {attempt}:", " ".join(c), flush=True)
        rc = subprocess.run(c, cwd=REPO).returncode
        print(f"[fullsmoke] trainer rc={rc}", flush=True)
        if rc == 0:
            break
    sys.exit(rc)


if __name__ == "__main__":
    main()
