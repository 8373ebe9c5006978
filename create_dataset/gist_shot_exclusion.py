"""Near-duplicate shot exclusion via GIST descriptors.

ref: create-dataset/gist_shot_exclusion.py:16-36. Computes a GIST
descriptor per clip (first frame) and marks clips whose descriptor is
within --thresh L2 distance of an earlier clip for exclusion.

Usage:
  python create_dataset/gist_shot_exclusion.py --data DIR --out excluded.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os.path as osp
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from gist import gist_descriptor  # noqa: E402


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--out", default="excluded.json")
    p.add_argument("--thresh", type=float, default=0.4)
    args = p.parse_args(argv)

    folders = sorted(glob.iglob(osp.join(args.data, "sequences", "*", "*")))
    descriptors = []
    keys = []
    excluded = []
    for folder in folders:
        ims = sorted(glob.glob(osp.join(folder, "*.png")))
        if not ims:
            continue
        img = np.asarray(Image.open(ims[0]).convert("L").resize((128, 128)))
        d = gist_descriptor(img)
        d = d / (np.linalg.norm(d) + 1e-9)
        key = "/".join(folder.split("/")[-2:])
        dup = any(np.linalg.norm(d - prev) < args.thresh
                  for prev in descriptors)
        if dup:
            excluded.append(key)
        else:
            descriptors.append(d)
            keys.append(key)

    with open(args.out, "w") as f:
        json.dump(excluded, f, indent=2)
    print(f"{len(excluded)} / {len(folders)} clips marked near-duplicate")


if __name__ == "__main__":
    main(sys.argv[1:])
