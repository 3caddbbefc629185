"""Jitted train / eval steps.

TPU-native re-design of the reference's per-iteration loop
(`/root/reference/tools/train_net.py:83-324`):

- forward + loss + backward + clip + optimizer update is ONE jitted function;
  with the batch sharded over the mesh's data axis, XLA inserts the gradient
  all-reduce (replaces DDP bucketed NCCL allreduce).
- the LR is a schedule evaluated inside the step (replaces per-iter
  ``set_lr``, train_net.py:113-115).
- bf16 activations replace AMP GradScaler (no loss scaling needed:
  gradients accumulate in f32).
- NaN handling: instead of raising mid-epoch (`misc.py:26-32`), the step
  returns ``loss_is_nan`` for the host loop to act on.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models import losses as loss_lib
from ..utils import logging


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    # non-param variable collections (BatchNorm running stats etc.); the
    # reference calls this "model_state" in its checkpoints
    model_state: Any = flax.struct.field(default_factory=dict)

    @classmethod
    def create(cls, params, tx, model_state=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            model_state=model_state or {},
        )


def make_train_step(
    module,
    tx: optax.GradientTransformation,
    loss_name: str,
    *,
    mixup_fn: Optional[Callable] = None,
    gather_before_loss: bool = False,
    data_axis: str | None = None,
    num_classes: int | None = None,
    moe_aux_weight: float = 0.0,
) -> Callable:
    """Build the jittable train step.

    ``gather_before_loss`` mirrors TRAIN.GATHER_BEFORE_LOSS
    (`train_net.py:142-152`): the loss sees the *global* batch. Under jit
    with a sharded batch the mean over the batch axis is already global, so
    this flag only matters for losses with cross-sample terms (handled by the
    contrastive step separately).
    """
    if mixup_fn is not None and loss_name == "cross_entropy":
        # mixup produces soft targets; plain CE can't consume them
        loss_name = "soft_cross_entropy"
    loss_func = loss_lib.get_loss_func(loss_name)
    if gather_before_loss:
        # Not silently ignored: under sharded jit every registered
        # per-sample loss already reduces over the GLOBAL batch axis, so
        # the reference's all-gather (train_net.py:142-152) is implicit.
        # Losses with cross-sample terms live in the contrastive step,
        # which gathers explicitly. State that, once, at build time.
        logging.get_logger(__name__).info(
            "TRAIN.GATHER_BEFORE_LOSS=True: batch-mean losses are already "
            "global under sharded jit; no extra gather is inserted "
            "(cross-sample losses are handled by the contrastive step)")

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        dropout_rng, droppath_rng, mixup_rng = jax.random.split(step_rng, 3)

        inputs = batch["inputs"]
        labels = batch["labels"]
        if mixup_fn is not None:
            inputs, labels = mixup_fn(mixup_rng, inputs, labels)
        elif (loss_name in loss_lib._SOFT_TARGET_LOSSES
              and labels.ndim == 1 and num_classes is not None):
            # soft-target losses need [B, C] targets; int labels one-hot
            labels = jax.nn.one_hot(labels, num_classes)

        # Short final batches arrive padded to the compiled size with
        # repeats of the last sample; ``n_valid`` (when present) masks the
        # padding out of the loss AND the gradient, matching the reference
        # which simply trains on the true short batch.
        n_valid = batch.get("n_valid")

        def compute_loss(params):
            # MoE models (MVIT.MOE.ENABLE) sow their Switch load-balance
            # losses into "intermediates"; collect them only when a weight
            # is configured so the non-MoE step is byte-identical
            mutable = (["batch_stats", "intermediates"]
                       if moe_aux_weight else ["batch_stats"])
            preds, new_model_state = module.apply(
                {"params": params, **state.model_state},
                inputs,
                train=True,
                rngs={"dropout": dropout_rng, "droppath": droppath_rng},
                mutable=mutable,
            )
            if moe_aux_weight:
                new_model_state = dict(new_model_state)
                aux_leaves = jax.tree.leaves(
                    new_model_state.pop("intermediates", {}))
            if n_valid is None:
                loss = loss_func(preds, labels)
            else:
                per_sample = loss_func(preds, labels, reduction="none")
                mask = (jnp.arange(per_sample.shape[0]) < n_valid).astype(
                    per_sample.dtype)
                loss = (per_sample * mask).sum() / n_valid.astype(
                    per_sample.dtype)
            if moe_aux_weight and aux_leaves:
                loss = loss + moe_aux_weight * (
                    sum(aux_leaves) / len(aux_leaves))
            return loss, (preds, new_model_state)

        (loss, (preds, new_model_state)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        model_state = dict(state.model_state)
        model_state.update(new_model_state)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            model_state=model_state,
        )
        metrics = {
            "loss": loss,
            "loss_is_nan": ~jnp.isfinite(loss),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics, preds

    return train_step


def make_multihead_train_step(
    module,
    tx: optax.GradientTransformation,
    *,
    datasets,
    loss_funcs,
    loss_weights=None,
    add_cross_proj: bool = False,
    cross_proj_add_to_pred: bool = False,
    proj_loss_func: str | None = None,
    proj_loss_weight: float = 0.5,
    use_vicreg: bool = False,
    vicreg_weight: float = 0.01,
) -> Callable:
    """Multi-dataset training step (reference: train_net.py:155-218).

    The batch carries one-hot labels in the max class space plus a
    ``dataset_idx`` column; per-dataset masks and per-dataset label slices
    are derived inside the step. ``use_vicreg`` adds the std+cov regularizer
    on the pooled embedding (reference: train_net.py:155-162; the reference
    asserts GATHER_BEFORE_LOSS because it needs the global batch — under
    sharded jit the batch axis is already global). Padded batch rows
    (``n_valid``) are masked out of every term.
    """
    weights = (
        dict(zip(datasets, loss_weights)) if loss_weights is not None else None
    )

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        dropout_rng, droppath_rng = jax.random.split(step_rng)
        inputs = batch["inputs"]
        labels_full = batch["labels"]  # [B, max_classes] one-hot
        ds_idx = batch["dataset_idx"]  # [B]
        n_valid = batch.get("n_valid")
        B = labels_full.shape[0]
        valid = (
            None if n_valid is None
            else (jnp.arange(B) < n_valid).astype(jnp.float32)
        )

        masks = {
            ds: (ds_idx == i).astype(jnp.float32)
            * (1.0 if valid is None else valid)
            for i, ds in enumerate(datasets)
        }
        from ..models.losses import (
            compute_multi_dataset_loss,
            compute_vicreg_loss,
        )

        n_cls = {ds: n for ds, n in zip(
            datasets, module.spec.multi_num_classes)}

        def compute_loss(params):
            out = module.apply(
                {"params": params},
                inputs,
                None,
                None,
                train=True,
                run_cross_proj=add_cross_proj,
                return_emb=use_vicreg,
                rngs={"dropout": dropout_rng, "droppath": droppath_rng},
            )
            preds, emb = out if use_vicreg else (out, None)
            labels = {ds: labels_full[:, : n_cls[ds]] for ds in datasets}
            loss = compute_multi_dataset_loss(
                preds, labels, masks, datasets, loss_funcs,
                dataset_loss_weights=weights,
                add_cross_proj=add_cross_proj,
                cross_proj_add_to_pred=cross_proj_add_to_pred,
                proj_loss_func=proj_loss_func,
                proj_loss_weight=proj_loss_weight,
                num_valid=n_valid,
            )
            if use_vicreg:
                loss = loss + vicreg_weight * compute_vicreg_loss(
                    emb.astype(jnp.float32), std_weight=1.0, cov_weight=1.0,
                    mask=valid,
                )
            return loss, preds

        (loss, preds), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt,
        )
        metrics = {"loss": loss, "loss_is_nan": ~jnp.isfinite(loss)}
        return new_state, metrics, preds

    return train_step


def make_multihead_eval_step(module) -> Callable:
    """Eval step scoring EVERY dataset head; the host selects each sample's
    own dataset (reference: test_net.py:109-114 selects per-batch; here the
    val batch mixes datasets, so selection happens meter-side)."""

    def eval_step(params, batch: dict, model_state=None):
        variables = {"params": params, **(model_state or {})}
        return module.apply(variables, batch["inputs"], None, None,
                            train=False)

    return eval_step


def make_eval_step(module) -> Callable:
    def eval_step(params, batch: dict, model_state=None):
        variables = {"params": params, **(model_state or {})}
        return module.apply(variables, batch["inputs"], train=False)

    return eval_step


def topk_accuracies(preds: jax.Array, labels: jax.Array, ks=(1, 5)):
    """Top-k accuracy (reference: utils/metrics.py:topks_correct).

    ``labels`` are int class ids; returns dict of accuracies in [0, 1].
    """
    max_k = max(ks)
    _, top = jax.lax.top_k(preds, max_k)
    correct = top == labels[:, None]
    out = {}
    for k in ks:
        out[f"top{k}_acc"] = correct[:, :k].any(axis=1).mean()
    return out
