#!/usr/bin/env python3
"""Leave-one-user-out splits from converted annotations
(equivalent of scripts/aicity_split_anno.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("anno_file")
    p.add_argument("out_path")
    p.add_argument("--method", type=int, choices=[1, 2], default=2)
    args = p.parse_args()

    from aicity_action_tpu.pipeline.anno import make_user_splits

    dirs = make_user_splits(args.anno_file, args.out_path, args.method)
    print(f"wrote {len(dirs)} splits under {args.out_path}")


if __name__ == "__main__":
    main()
