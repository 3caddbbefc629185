"""Contrastive (CLIP-style) training and retrieval testing.

Reference: tools/train_net_contrastive.py / test_net_contrastive.py.

TPU-native notes:
- the reference hand-rolls a gradient-preserving all-gather
  (``all_gather_cat_self``, distributed.py:42-96) to build the global-batch
  similarity matrix. Under jit with batch-sharded features, the
  ``V @ T.T`` contraction over the full batch IS the global matrix — XLA
  inserts the (differentiable) collectives.
- MoCo momentum encoders are an EMA *parameter pytree* updated by
  ``tree_map`` inside the jitted step, not deep-copied modules.
- logit_scale is clamped to ln(100) after each update
  (train_net_contrastive.py:216-217).
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import losses as loss_lib

LOGIT_SCALE_MAX = math.log(100.0)


class ContrastiveState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any = None  # MoCo momentum encoder weights

    @classmethod
    def create(cls, params, tx, use_moco=False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if use_moco else None,
        )


def contrastive_gt_matrix(labels: jax.Array, valid=None) -> jax.Array:
    """Row-normalized same-label match matrix (metrics.py:9-23).

    ``valid`` (bool ``[B]``) zeroes padded rows/columns; the denominator is
    clamped so padded rows yield all-zero targets (hence zero loss) instead
    of NaN. With no padding the clamp is inert (the diagonal guarantees a
    row sum ≥ 1)."""
    same = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    if valid is not None:
        v = valid.astype(jnp.float32)
        same = same * v[:, None] * v[None, :]
    return same / jnp.maximum(same.sum(axis=1, keepdims=True), 1.0)


def recall_at_rank(simi: np.ndarray, gt: np.ndarray, ks=(1, 5, 10)):
    """Fraction of rows whose top-k ranked entries hit a positive
    (metrics.py:25-49)."""
    order = np.argsort(-simi, axis=1)
    hits = np.take_along_axis(gt, order, axis=1) > 0
    return [float(hits[:, :k].any(axis=1).mean()) for k in ks]


def make_contrastive_train_step(
    module,
    tx: optax.GradientTransformation,
    *,
    use_moco: bool = False,
    moco_momentum: float = 0.99,
) -> Callable:
    def train_step(state: ContrastiveState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        drop_rng, dp_rng = jax.random.split(step_rng)
        frames, tokens, labels = (
            batch["inputs"], batch["tokens"], batch["labels"])

        ema_params = state.ema_params
        if use_moco:
            # EMA update BEFORE use (reference _moco_update then encode)
            ema_params = jax.tree.map(
                lambda m, p: m * moco_momentum + p * (1 - moco_momentum),
                ema_params, state.params,
            )
            v_m, t_m, _ = module.apply(
                {"params": ema_params}, frames, tokens, train=False)
            v_m = jax.lax.stop_gradient(v_m)
            t_m = jax.lax.stop_gradient(t_m)

        # padded batch rows (n_valid) must not appear as negatives in the
        # softmax NOR contribute rows to the loss
        n_valid = batch.get("n_valid")
        B = labels.shape[0]
        if n_valid is None:
            valid, col_bias, denom = None, 0.0, float(B)
        else:
            valid = jnp.arange(B) < n_valid
            col_bias = jnp.where(valid, 0.0, -1e9)[None, :]
            denom = n_valid.astype(jnp.float32)
        gt = contrastive_gt_matrix(labels, valid)

        def compute_loss(params):
            v, t, scale = module.apply(
                {"params": params}, frames, tokens, train=True,
                rngs={"dropout": drop_rng, "droppath": dp_rng},
            )
            if use_moco:
                logits_v = scale * v @ t_m.T
                logits_t = scale * t @ v_m.T
            else:
                logits_v = scale * v @ t.T
                logits_t = logits_v.T
            per_v = loss_lib.soft_cross_entropy(
                logits_v + col_bias, gt, reduction="none")
            per_t = loss_lib.soft_cross_entropy(
                logits_t + col_bias, gt.T, reduction="none")
            loss = (per_v.sum() + per_t.sum()) / (2.0 * denom)
            return loss, (v, t, scale)

        (loss, (v, t, scale)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # clamp temperature to [0, ln 100]
        new_params = dict(new_params)
        new_params["logit_scale"] = jnp.clip(
            new_params["logit_scale"], 0.0, LOGIT_SCALE_MAX)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=ema_params,
        )
        metrics = {
            "loss": loss,
            "logit_scale": scale,
            "loss_is_nan": ~jnp.isfinite(loss),
        }
        return new_state, metrics, (v, t)

    return train_step


def make_feature_step(module) -> Callable:
    """Eval step returning L2-normed (video, text) features + temperature."""

    def step(params, batch):
        return module.apply(
            {"params": params}, batch["inputs"], batch["tokens"], train=False)

    return step


def retrieval_metrics(video_feats, text_feats, labels, ks=(1, 5, 10)):
    """v2t and t2v recall@k over a feature set
    (test_net_contrastive.py:150-160)."""
    v = np.asarray(video_feats)
    t = np.asarray(text_feats)
    labels = np.asarray(labels)
    gt = np.asarray(contrastive_gt_matrix(jnp.asarray(labels)))
    simi_v2t = v @ t.T
    out = {}
    for k, r in zip(ks, recall_at_rank(simi_v2t, gt, ks)):
        out[f"v2t_recall@{k}"] = r
    for k, r in zip(ks, recall_at_rank(simi_v2t.T, gt.T, ks)):
        out[f"t2v_recall@{k}"] = r
    return out
