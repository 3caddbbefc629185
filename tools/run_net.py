#!/usr/bin/env python3
"""CLI entry: train then test per config (reference: tools/run_net.py).

Usage:
    python tools/run_net.py --cfg configs/X.yaml [KEY VALUE ...]

There is no multiprocessing spawn (`misc.py:292-322` in the reference): one
process per host drives all local chips; multi-host jobs launch this script
once per host with ``--num_shards/--shard_id``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aicity_action_tpu.config import parse_args, load_config, assert_and_infer_cfg
from aicity_action_tpu.engine.train_loop import train
from aicity_action_tpu.engine.test_loop import test


def main():
    args = parse_args()
    cfg = load_config(args)
    cfg = assert_and_infer_cfg(cfg)

    if cfg.TRAIN.ENABLE:
        train(cfg)
    if cfg.TEST.ENABLE:
        test(cfg)


if __name__ == "__main__":
    main()
