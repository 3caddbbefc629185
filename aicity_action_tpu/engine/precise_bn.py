"""Precise-BN: recompute BatchNorm statistics as a true average over N
batches (reference: fvcore update_bn_stats used at train_net.py:543-564).

flax BatchNorm only exposes EMA updates, so per-batch statistics are
recovered algebraically: with ``new = m*cur + (1-m)*batch``,
``batch = (new - m*cur) / (1-m)``. We run the forward with mutable
batch_stats, invert the EMA to get each batch's raw stats, and average them
equally across batches — exactly fvcore's semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BN_MOMENTUM = 0.9  # matches models/convnets.BatchNorm default


def calculate_and_update_precise_bn(
    module, params, model_state, batches, *, num_batches: int,
    momentum: float = BN_MOMENTUM,
):
    """Returns model_state with batch_stats replaced by precise averages.

    ``batches`` yields input pytrees (the model's first argument).
    """
    if "batch_stats" not in model_state:
        return model_state

    def fwd(p, ms, x):
        _, new_ms = module.apply(
            {"params": p, **ms}, x, train=True, mutable=["batch_stats"],
        )
        return new_ms["batch_stats"]

    jitted = jax.jit(fwd)

    cur = model_state["batch_stats"]
    acc = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), cur)
    seen = 0
    for x in batches:
        if seen >= num_batches:
            break
        new = jitted(params, {"batch_stats": cur} | {
            k: v for k, v in model_state.items() if k != "batch_stats"
        }, x)
        # invert the EMA to recover raw batch statistics
        raw = jax.tree.map(
            lambda n, c: (np.asarray(n) - momentum * np.asarray(c))
            / (1 - momentum),
            new, cur,
        )
        acc = jax.tree.map(lambda a, r: a + r, acc, raw)
        seen += 1
    if seen == 0:
        return model_state
    precise = jax.tree.map(lambda a: a / seen, acc)
    out = dict(model_state)
    out["batch_stats"] = jax.tree.map(jnp.asarray, precise)
    return out
