"""Learning-rate policies (reference: slowfast/utils/lr_policy.py).

The reference recomputes the LR *every iteration* at fractional epoch
``cur_epoch + iter/steps_per_epoch`` (`tools/train_net.py:113-115`). Here the
same math is exposed two ways:

- :func:`get_lr_at_epoch` — pure Python floats (logging, tests)
- :func:`make_lr_schedule` — an optax-style ``step -> lr`` schedule usable
  inside jit (jnp ops only).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def get_lr_at_epoch(solver, cur_epoch: float) -> float:
    """LR at fractional epoch, with linear warmup blended in."""
    lr = _policy_fn(solver)(solver, cur_epoch)
    if cur_epoch < solver.WARMUP_EPOCHS:
        lr_start = solver.WARMUP_START_LR
        lr_end = _policy_fn(solver)(solver, solver.WARMUP_EPOCHS)
        alpha = (lr_end - lr_start) / solver.WARMUP_EPOCHS
        lr = cur_epoch * alpha + lr_start
    return lr


def lr_func_cosine(solver, cur_epoch):
    offset = solver.WARMUP_EPOCHS if solver.COSINE_AFTER_WARMUP else 0.0
    assert solver.COSINE_END_LR < solver.BASE_LR
    cos = jnp.cos if _traced(cur_epoch) else math.cos
    return (
        solver.COSINE_END_LR
        + (solver.BASE_LR - solver.COSINE_END_LR)
        * (cos(math.pi * (cur_epoch - offset) / (solver.MAX_EPOCH - offset)) + 1.0)
        * 0.5
    )


def lr_func_steps_with_relative_lrs(solver, cur_epoch):
    steps = list(solver.STEPS) + [solver.MAX_EPOCH]
    if _traced(cur_epoch):
        ind = jnp.searchsorted(
            jnp.asarray(steps, jnp.float32), cur_epoch, side="right"
        ) - 1
        lrs = jnp.asarray(list(solver.LRS), jnp.float32)
        return lrs[jnp.clip(ind, 0, len(solver.LRS) - 1)] * solver.BASE_LR
    ind = 0
    for i, step in enumerate(steps):
        if cur_epoch < step:
            ind = i
            break
    return solver.LRS[ind - 1] * solver.BASE_LR


_POLICIES = {
    "cosine": lr_func_cosine,
    "steps_with_relative_lrs": lr_func_steps_with_relative_lrs,
}


def _policy_fn(solver):
    try:
        return _POLICIES[solver.LR_POLICY]
    except KeyError:
        raise NotImplementedError(f"Unknown LR policy: {solver.LR_POLICY}")


def _traced(x) -> bool:
    return isinstance(x, jnp.ndarray) or hasattr(x, "aval")


def make_lr_schedule(solver, steps_per_epoch: int) -> Callable:
    """Return ``step -> lr`` usable under jit (matches per-iter LR updates)."""

    warmup = solver.WARMUP_EPOCHS
    policy = _policy_fn(solver)

    def schedule(step):
        cur_epoch = step / steps_per_epoch
        lr = policy(solver, cur_epoch)
        if warmup > 0:
            lr_start = solver.WARMUP_START_LR
            lr_end = policy(solver, warmup)
            alpha = (lr_end - lr_start) / warmup
            warm_lr = cur_epoch * alpha + lr_start
            lr = jnp.where(cur_epoch < warmup, warm_lr, lr)
        return jnp.asarray(lr, jnp.float32)

    return schedule
