"""Vimeo original-clip download helper.

ref: create-dataset/download.py. Builds the per-clip URL list from the
vimeo-90k metadata and fetches with resumable curl. This container is
zero-egress — with --list_only the script just writes the command list.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

VIMEO_URL_TEMPLATE = "https://vimeo.com/{clip_id}"


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--clip_list", required=True,
                   help="file with one vimeo clip id per line")
    p.add_argument("--out", default="downloads")
    p.add_argument("--list_only", action="store_true")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    with open(args.clip_list) as f:
        clip_ids = [line.strip() for line in f if line.strip()]

    cmds = []
    for cid in clip_ids:
        url = VIMEO_URL_TEMPLATE.format(clip_id=cid)
        dst = os.path.join(args.out, f"{cid}.mp4")
        cmds.append(["yt-dlp", "-o", dst, url])

    if args.list_only:
        list_path = os.path.join(args.out, "download_cmds.sh")
        with open(list_path, "w") as f:
            f.write("#!/bin/sh\n")
            for c in cmds:
                f.write(" ".join(c) + "\n")
        print(f"wrote {len(cmds)} commands to {list_path}")
        return

    for c in cmds:
        subprocess.run(c, check=False)


if __name__ == "__main__":
    main(sys.argv[1:])
