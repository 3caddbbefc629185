"""Detection (AVA) train/eval steps.

Reference: the DETECTION.ENABLE branches of tools/train_net.py (forward with
meta["boxes"], BCE loss) and test_net.py (gather preds/ori_boxes/metadata
for the AVAMeter).

Boxes arrive as fixed-size slabs ``[B, max_boxes, 4]`` with a validity mask
(see data/ava.py) — the step flattens them into ``[B*max_boxes, 5]`` rows
with batch indices (what ROIAlign consumes) and masks padded boxes out of
the loss. Static shapes everywhere: no per-batch recompilation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models import losses as loss_lib
from .steps import TrainState


def _flatten_boxes(boxes: jax.Array) -> jax.Array:
    """[B, M, 4] → [B*M, 5] with batch index prepended (detection collate
    semantics, reference loader.py:98-132)."""
    B, M, _ = boxes.shape
    idx = jnp.repeat(jnp.arange(B, dtype=boxes.dtype), M)[:, None]
    return jnp.concatenate([idx, boxes.reshape(B * M, 4)], axis=1)


def make_detection_train_step(module, tx, loss_name: str = "bce") -> Callable:
    loss_func = loss_lib.get_loss_func(loss_name)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        d_rng, dp_rng = jax.random.split(step_rng)
        boxes5 = _flatten_boxes(batch["boxes"])
        mask = batch["box_mask"].reshape(-1)  # [B*M]
        labels = batch["labels"].reshape(mask.shape[0], -1)

        def compute_loss(params):
            preds, new_ms = module.apply(
                {"params": params, **state.model_state},
                batch["inputs"], boxes5, train=True,
                rngs={"dropout": d_rng, "droppath": dp_rng},
                mutable=["batch_stats"],
            )
            per_box = loss_func(preds, labels, reduction="none")
            loss = (per_box * mask).sum() / jnp.maximum(mask.sum(), 1.0)
            return loss, (preds, new_ms)

        (loss, (preds, new_ms)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ms = dict(state.model_state)
        ms.update(new_ms)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt,
            model_state=ms,
        )
        return new_state, {"loss": loss,
                           "loss_is_nan": ~jnp.isfinite(loss)}, preds

    return train_step


def make_detection_eval_step(module) -> Callable:
    def eval_step(params, batch, model_state=None):
        boxes5 = _flatten_boxes(batch["boxes"])
        return module.apply(
            {"params": params, **(model_state or {})},
            batch["inputs"], boxes5, train=False,
        )

    return eval_step
