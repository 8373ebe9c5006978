"""Per-clip average optical-flow magnitude statistics.

ref: create-dataset/average_flow.py:23-40 (DCVC-DC SpyNet). Uses this
framework's MESpynet (optionally with imported pretrained weights) to
compute mean |flow| between the first and middle frame of each clip;
the stats drive motion-balanced clip selection.

Usage:
  python create_dataset/average_flow.py --data DIR --out flow_stats.json \
      [--spynet ckpt]
"""

from __future__ import annotations

import argparse
import glob
import json
import os.path as osp
import sys

import numpy as np
from PIL import Image

# repo root on sys.path so the script runs from any cwd
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="vimeo-32 root")
    p.add_argument("--out", default="flow_stats.json")
    p.add_argument("--spynet", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models.spynet import MESpynet

    model = MESpynet(levels=6)
    x0 = jnp.zeros((1, 3, 256, 448), jnp.float32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x0, x0))()
    if args.spynet:
        from learned_pmctf_tpu.utils.torch_import import load_spynet_torch
        params = {"params": load_spynet_torch(args.spynet)}

    flow_fn = jax.jit(lambda p, a, b: model.apply(p, a, b))

    stats = {}
    folders = sorted(glob.iglob(osp.join(args.data, "sequences", "*", "*")))
    for folder in folders:
        ims = sorted(glob.glob(osp.join(folder, "*.png")))
        if len(ims) < 2:
            continue

        def load(path):
            img = np.asarray(Image.open(path).convert("RGB"), np.float32)
            return jnp.asarray(img.transpose(2, 0, 1))[None] / 255.0

        a = load(ims[0])
        b = load(ims[len(ims) // 2])
        flow = flow_fn(params, a, b)
        mag = float(jnp.mean(jnp.sqrt(flow[:, 0] ** 2 + flow[:, 1] ** 2)))
        key = "/".join(folder.split("/")[-2:])
        stats[key] = mag

    with open(args.out, "w") as f:
        json.dump(stats, f, indent=2)
    vals = np.array(list(stats.values()))
    print(f"{len(stats)} clips; mean |flow| {vals.mean():.3f} "
          f"median {np.median(vals):.3f}")


if __name__ == "__main__":
    main(sys.argv[1:])
