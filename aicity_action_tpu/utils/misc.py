"""Miscellaneous utilities (reference: slowfast/utils/misc.py).

Model statistics (params / FLOPs / activations via jax cost analysis instead
of fvcore), memory logging, NaN checks, eval-epoch cadence, class names.
"""

from __future__ import annotations

import json
import math
from typing import Optional

import numpy as np

from .logging import get_logger

logger = get_logger(__name__)


def check_nan_losses(loss: float) -> None:
    """Raise on NaN loss (reference misc.py:26-32)."""
    if math.isnan(loss):
        raise RuntimeError("ERROR: Got NaN losses")


def params_count(params) -> int:
    """Number of parameters in a pytree (reference misc.py params_count)."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def get_flop_stats(module, params, example_inputs, model_state=None) -> float:
    """Estimated forward GFLOPs from XLA's cost analysis (replaces fvcore's
    flop counting, reference misc.py:78-206)."""
    import jax

    def fwd(p, x):
        return module.apply({"params": p, **(model_state or {})}, x)

    try:
        lowered = jax.jit(fwd).lower(params, example_inputs)
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops", 0.0)
        return float(flops) / 1e9
    except Exception as e:  # pragma: no cover - backend-specific
        logger.warning("flop estimation failed: %s", e)
        return 0.0


def gpu_mem_usage() -> float:
    """Peak device memory in GB (TPU HBM when available)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0) / 1024 ** 3
    except Exception:
        return 0.0


def cpu_mem_usage() -> tuple[float, float]:
    """(used, total) host memory in GB."""
    try:
        with open("/proc/meminfo") as f:
            info = {}
            for line in f:
                k, v = line.split(":")
                info[k] = int(v.strip().split()[0]) * 1024
        total = info["MemTotal"] / 1024 ** 3
        avail = info["MemAvailable"] / 1024 ** 3
        return total - avail, total
    except Exception:
        return 0.0, 0.0


def log_model_info(module, params, example_inputs=None, model_state=None):
    logger.info("Model: %s", type(module).__name__)
    logger.info("Params: {:,}".format(params_count(params)))
    logger.info("Mem: %.2f GB", gpu_mem_usage())
    if example_inputs is not None:
        gflops = get_flop_stats(module, params, example_inputs, model_state)
        if gflops:
            logger.info("FLOPs: %.2f G", gflops)


def is_eval_epoch(cfg, cur_epoch: int, multigrid_schedule=None) -> bool:
    """Eval cadence, multigrid-aware (reference misc.py:209-230)."""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    if multigrid_schedule is not None:
        prev_epoch = 0
        for s in multigrid_schedule:
            if cur_epoch < s[-1]:
                period = max(
                    (s[-1] - prev_epoch) // cfg.MULTIGRID.EVAL_FREQ + 1, 1
                )
                return (s[-1] - 1 - cur_epoch) % period == 0
            prev_epoch = s[-1]
    return (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0


def get_class_names(path: str, parent_path: Optional[str] = None,
                    subset_path: Optional[str] = None):
    """Read class names json (reference misc.py:get_class_names)."""
    with open(path) as f:
        class2idx = json.load(f)
    max_key = max(class2idx.values())
    class_names = [None] * (max_key + 1)
    for k, i in class2idx.items():
        class_names[i] = k

    class_parent = None
    if parent_path:
        with open(parent_path) as f:
            d_parent = json.load(f)
        class_parent = {}
        for parent, children in d_parent.items():
            indices = [
                class2idx[c] for c in children if class2idx.get(c) is not None
            ]
            class_parent[parent] = indices

    subset_ids = None
    if subset_path:
        with open(subset_path) as f:
            subset = f.read().split("\n")
            subset_ids = [
                class2idx[name] for name in subset
                if class2idx.get(name) is not None
            ]
    return class_names, class_parent, subset_ids


def frozen_bn_stats(model_state):
    """Return model_state unchanged — a marker for APIs that froze BN in
    torch; in flax, not updating batch_stats IS freezing (eval step never
    mutates them)."""
    return model_state
