"""Loss functions (reference: slowfast/models/losses.py).

All losses are pure jnp functions ``loss(logits, targets, reduction)`` and
registered in ``_LOSSES``. Targets are int labels for ``cross_entropy`` and
``[B, C]`` soft/multi-hot vectors for the soft-target family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _reduce(loss, reduction):
    if reduction == "mean":
        return loss.mean()
    if reduction == "none":
        return loss
    raise NotImplementedError(reduction)


def cross_entropy(logits, labels, reduction="mean"):
    """Int-label CE, mirrors torch.nn.CrossEntropyLoss."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return _reduce(loss, reduction)


def soft_cross_entropy(logits, targets, reduction="mean"):
    """Soft-target CE (losses.py:119-142) — for MixUp / label smoothing."""
    loss = jnp.sum(-targets * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    return _reduce(loss, reduction)


def bce(probs, targets, reduction="mean"):
    """torch.nn.BCELoss on probabilities (clamped for stability)."""
    p = jnp.clip(probs, 1e-7, 1 - 1e-7)
    loss = -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
    loss = loss.mean(axis=-1) if loss.ndim == 2 and reduction == "none" else loss
    return _reduce(loss, reduction)


def bce_logit(logits, targets, reduction="mean"):
    """torch.nn.BCEWithLogitsLoss: numerically-stable sigmoid BCE."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    loss = loss.mean(axis=-1) if loss.ndim == 2 and reduction == "none" else loss
    return _reduce(loss, reduction)


def normalized_soft_cross_entropy(logits, targets, reduction="mean"):
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(targets * logp, axis=-1) / (-logp.sum(axis=-1))
    return _reduce(loss, reduction)


def reverse_soft_cross_entropy(logits, targets, reduction="mean"):
    pred = jnp.clip(jax.nn.softmax(logits, axis=-1), 1e-7, 1.0)
    t = jnp.log(jnp.clip(targets, 1e-4, 1.0))
    loss = -jnp.sum(t * pred, axis=-1)
    return _reduce(loss, reduction)


def mean_absolute_error(logits, targets, reduction="mean"):
    """Reduced MAE = 1 - sum(p*q) (robust-loss family, losses.py:205-240)."""
    pred = jax.nn.softmax(logits, axis=-1)
    loss = 1.0 - jnp.sum(targets * pred, axis=-1)
    return _reduce(loss, reduction)


def nce_and_rce(logits, targets, reduction="mean", alpha=1.0, beta=1.0):
    return alpha * normalized_soft_cross_entropy(logits, targets, reduction) \
        + beta * reverse_soft_cross_entropy(logits, targets, reduction)


def lsep(scores, labels, reduction="mean"):
    """Pairwise log-sum-exp ranking loss (losses.py:253-282).

    NOTE: faithfully reproduces the reference's reduction — the pairwise sum
    runs over the whole batch and produces a scalar before log.
    """
    B, C = labels.shape
    mask = ((labels[:, None, :] - labels[:, :, None]) > 0).astype(scores.dtype)
    diff = scores[:, :, None] - scores[:, None, :]
    loss = jnp.log1p(jnp.sum(jnp.exp(diff) * mask))
    return _reduce(loss, reduction)


_LOSSES = {
    "cross_entropy": cross_entropy,
    "bce": bce,
    "bce_logit": bce_logit,
    "soft_cross_entropy": soft_cross_entropy,
    "mean_absolute_error": mean_absolute_error,
    "reverse_soft_cross_entropy": reverse_soft_cross_entropy,
    "normalized_soft_cross_entropy": normalized_soft_cross_entropy,
    "nce_and_rce": nce_and_rce,
    "lsep": lsep,
}

_SOFT_TARGET_LOSSES = frozenset(
    {"bce", "bce_logit", "soft_cross_entropy", "nce_and_rce",
     "normalized_soft_cross_entropy", "reverse_soft_cross_entropy"}
)


def get_loss_func(loss_name: str):
    if loss_name not in _LOSSES:
        raise NotImplementedError(f"Loss {loss_name} is not supported")
    return _LOSSES[loss_name]


def compute_multi_dataset_loss(
    preds: dict,
    labels: dict,
    masks: dict,
    datasets,
    loss_funcs,
    dataset_loss_weights=None,
    add_cross_proj=False,
    cross_proj_add_to_pred=False,
    proj_loss_func=None,
    proj_loss_weight=0.5,
    num_valid=None,
):
    """Masked multi-head loss (reference: losses.py:12-89).

    ``preds`` may contain extra ``"{src}_{dst}"`` cross-projection entries.
    Per-sample losses are masked by dataset membership, weighted, concatenated
    and summed over all heads, divided by the minibatch size (``num_valid``
    when the batch carries padding — the caller must already have zeroed the
    padded rows out of ``masks``).
    """
    losses = []
    assert len(datasets) == len(loss_funcs)
    pfn = get_loss_func(proj_loss_func) if proj_loss_func else None

    for dataset_name, loss_name in zip(datasets, loss_funcs):
        if loss_name not in _SOFT_TARGET_LOSSES:
            raise NotImplementedError(
                f"Loss {loss_name} is not supported for multi-dataset"
            )
        loss_func = get_loss_func(loss_name)
        pred = preds[dataset_name]

        if add_cross_proj and cross_proj_add_to_pred:
            for d1_d2 in preds:
                if d1_d2 in datasets:
                    continue
                _, d2 = d1_d2.split("_", 1)
                if d2 == dataset_name:
                    pred = pred + preds[d1_d2] * proj_loss_weight

        loss = loss_func(pred, labels[dataset_name], reduction="none")
        if loss.ndim == 2:
            loss = loss.mean(axis=-1)

        if add_cross_proj and not cross_proj_add_to_pred:
            proj_losses = []
            for d1_d2 in preds:
                if d1_d2 in datasets:
                    continue
                _, d2 = d1_d2.split("_", 1)
                if d2 == dataset_name:
                    pl = pfn(preds[d1_d2], labels[dataset_name], reduction="none")
                    if pl.ndim == 2:
                        pl = pl.mean(axis=-1)
                    proj_losses.append(pl * proj_loss_weight)
            if proj_losses:
                loss = loss + jnp.stack(proj_losses, axis=1).mean(axis=1)

        if dataset_loss_weights is not None:
            loss = dataset_loss_weights[dataset_name] * loss
        losses.append(masks[dataset_name] * loss)

    denom = losses[0].shape[0] if num_valid is None else num_valid
    return jnp.concatenate(losses, axis=0).sum() / denom


def compute_vicreg_loss(emb, std_weight=25.0, cov_weight=1.0, mask=None):
    """VICReg std+cov regularizer (reference: losses.py:97-116).

    ``mask`` (``[B]`` of 0/1) excludes padded batch rows from the batch
    statistics; with all-ones it reduces exactly to the unmasked form.
    """
    if mask is None:
        n = emb.shape[0]
        emb = emb - emb.mean(axis=0)
    else:
        m = mask.astype(emb.dtype)[:, None]
        n = jnp.maximum(mask.sum(), 1)
        emb = (emb - (emb * m).sum(axis=0) / n) * m
    # torch.var defaults to the unbiased (n-1) estimator; clamp the
    # denominator so a 1-valid-row (padded) batch yields a finite loss
    # instead of 0/0 = NaN tripping the train loop's NaN hard-fail.
    denom = jnp.maximum(n - 1, 1) if mask is not None else max(n - 1, 1)
    var = (emb ** 2).sum(axis=0) / denom
    std_emb = jnp.sqrt(var + 1e-4)
    std_loss = jnp.mean(jax.nn.relu(1 - std_emb))

    f = emb.shape[1]
    cov = (emb.T @ emb) / denom
    off_diag = cov - jnp.diag(jnp.diag(cov))
    cov_loss = (off_diag ** 2).sum() / f
    return std_loss * std_weight + cov_loss * cov_weight
