#!/usr/bin/env python3
"""Data-loading throughput benchmark CLI
(equivalent of running the reference's utils/benchmark.py harness)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aicity_action_tpu.config import parse_args, load_config, assert_and_infer_cfg
from aicity_action_tpu.utils.benchmark import benchmark_data_loading


def main():
    args = parse_args()
    cfg = load_config(args)
    cfg = assert_and_infer_cfg(cfg)
    benchmark_data_loading(cfg)


if __name__ == "__main__":
    main()
