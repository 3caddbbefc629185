#!/usr/bin/env python3
"""CLI for contrastive (CLIP-style) training/testing
(reference: tools/run_net_contrastive.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aicity_action_tpu.config import parse_args, load_config, assert_and_infer_cfg
from aicity_action_tpu.engine.contrastive_loop import (
    test_contrastive,
    train_contrastive,
)


def main():
    args = parse_args()
    cfg = load_config(args)
    cfg = assert_and_infer_cfg(cfg)
    if cfg.TRAIN.ENABLE:
        train_contrastive(cfg)
    if cfg.TEST.ENABLE:
        test_contrastive(cfg, cfg.TEST.SAVE_RESULTS_PATH or None)


if __name__ == "__main__":
    main()
