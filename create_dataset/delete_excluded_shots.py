"""Delete clips listed in the GIST exclusion file.

ref: create-dataset/delete_excluded_shots.py.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import shutil
import sys


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--excluded", default="excluded.json")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args(argv)

    with open(args.excluded) as f:
        excluded = json.load(f)
    removed = 0
    for key in excluded:
        folder = osp.join(args.data, "sequences", key)
        if osp.isdir(folder):
            if args.dry_run:
                print(f"would remove {folder}")
            else:
                shutil.rmtree(folder)
            removed += 1
    print(f"{'would remove' if args.dry_run else 'removed'} {removed} clips")


if __name__ == "__main__":
    main(sys.argv[1:])
