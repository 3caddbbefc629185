#!/usr/bin/env python3
"""Headline benchmark: MViT-v2-B 16x4 @ 448 inference throughput per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

Protocol notes for this environment:
- timing uses a jitted fori_loop whose iterations are data-dependent
  (``x *= 1 + eps * mean(preds)``) so XLA cannot elide model calls, and
  completion is observed by materializing one scalar — ``block_until_ready``
  does not reliably wait through the axon tunnel after the first execution.
- ``vs_baseline`` compares against the BASELINE.md target of >=3x A100
  throughput on v5e-8. The reference publishes no A100 clips/sec; we use an
  estimated 30 clips/s/A100 for MViT-v2-B 16x4 @448 inference (~420 GFLOPs/
  clip at ~35% TF32 utilization), i.e. a per-chip target of
  3 * 30 / 8 = 11.25 clips/s. vs_baseline = measured / 11.25.
"""

import json
import sys
import time

import numpy as np

BATCH = 4
CROP = 448
ITERS = 10
A100_EST_CLIPS_PER_SEC = 30.0
TARGET_PER_CHIP = 3.0 * A100_EST_CLIPS_PER_SEC / 8.0


def main():
    import jax
    import jax.numpy as jnp

    from aicity_action_tpu.config import get_cfg
    from aicity_action_tpu.models.build import build_model

    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml"
    )
    cfg.DATA.TRAIN_CROP_SIZE = CROP
    cfg.DATA.TEST_CROP_SIZE = CROP
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"

    module, params = build_model(cfg)

    def chain(p, x):
        def body(i, x):
            preds = module.apply({"params": p}, [x])
            return x * (1 + 1e-3 * preds.mean().astype(x.dtype))
        return jax.lax.fori_loop(0, ITERS, body, x)

    f = jax.jit(chain)
    x = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, 16, CROP, CROP, 3), jnp.bfloat16
    )
    # compile + first run
    r = f(params, x)
    _ = np.asarray(r.ravel()[0])
    # timed run
    t0 = time.time()
    r = f(params, x)
    _ = np.asarray(r.ravel()[0])
    dt = (time.time() - t0) / ITERS
    clips_per_sec = BATCH / dt

    print(json.dumps({
        "metric": "clips/sec/chip MViT-v2-B 16x4@448 bf16 inference (bs=4)",
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / TARGET_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
