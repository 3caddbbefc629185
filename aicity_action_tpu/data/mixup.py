"""Batch-level MixUp / CutMix in JAX (reference: slowfast/datasets/mixup.py).

The reference applies timm-style batch mixup on device inside the train loop
(`tools/train_net.py:118-123`): ONE lambda per batch, each sample mixed with
the batch-reversed sample, labels converted to smoothed one-hot soft targets.
Here it runs inside the jitted train step with explicit PRNG keys — CutMix
boxes become static-shape masks (broadcasted_iota comparisons), so nothing
recompiles.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def one_hot_smooth(labels, num_classes, smoothing=0.0):
    """Smoothed one-hot (mixup.py:convert_to_one_hot/mixup_target)."""
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    if labels.ndim == 1:
        return jax.nn.one_hot(labels, num_classes) * (on - off) + off
    return labels * on + (1 - labels) * off


def _beta_sample(rng, alpha):
    a = jax.random.gamma(rng, alpha)
    b = jax.random.gamma(jax.random.fold_in(rng, 1), alpha)
    return a / (a + b)


def _cutmix_mask_and_lam(rng, shape_hw, lam):
    """Static-shape cutmix mask. Returns (mask[H, W], corrected lam)."""
    H, W = shape_hw
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (H * ratio).astype(jnp.int32)
    cut_w = (W * ratio).astype(jnp.int32)
    ry, rx = jax.random.split(rng)
    cy = jax.random.randint(ry, (), 0, H)
    cx = jax.random.randint(rx, (), 0, W)
    yl = jnp.clip(cy - cut_h // 2, 0, H)
    yh = jnp.clip(cy + cut_h // 2, 0, H)
    xl = jnp.clip(cx - cut_w // 2, 0, W)
    xh = jnp.clip(cx + cut_w // 2, 0, W)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = ((rows >= yl) & (rows < yh) & (cols >= xl) & (cols < xh))
    # correct lam by the actual clipped box area (mixup.py:get_cutmix_bbox)
    lam_corr = 1.0 - ((yh - yl) * (xh - xl)) / float(H * W)
    return inside, lam_corr


def make_mixup_fn(
    *,
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    mix_prob: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
) -> Callable:
    """Returns ``fn(rng, inputs, labels) -> (mixed_inputs, soft_targets)``.

    ``inputs`` is a list of pathway tensors ``[B, T, H, W, C]`` (all mixed
    with the same lam/box) or a single tensor.
    """

    use_cutmix_branch = cutmix_alpha > 0.0
    use_mixup_branch = mixup_alpha > 0.0

    def fn(rng, inputs, labels):
        is_list = isinstance(inputs, (list, tuple))
        xs = list(inputs) if is_list else [inputs]

        r_apply, r_switch, r_lam_m, r_lam_c, r_box = jax.random.split(rng, 5)

        use_cutmix = jnp.where(
            jnp.asarray(use_cutmix_branch and use_mixup_branch),
            jax.random.bernoulli(r_switch, switch_prob),
            jnp.asarray(use_cutmix_branch),
        )
        lam_mix = _beta_sample(r_lam_m, mixup_alpha) if use_mixup_branch else jnp.float32(1.0)
        lam_cut = _beta_sample(r_lam_c, cutmix_alpha) if use_cutmix_branch else jnp.float32(1.0)

        H, W = xs[0].shape[-3], xs[0].shape[-2]
        box_mask, lam_cut_corr = _cutmix_mask_and_lam(r_box, (H, W), lam_cut)

        lam = jnp.where(use_cutmix, lam_cut_corr, lam_mix)
        # apply with probability mix_prob
        apply = jax.random.bernoulli(r_apply, mix_prob)
        lam = jnp.where(apply, lam, 1.0)

        def mix_one(x):
            flipped = jnp.flip(x, axis=0)
            mixed = x * lam.astype(x.dtype) + flipped * (1 - lam).astype(x.dtype)
            # cutmix: paste the flipped box region
            m = box_mask[None, None, :, :, None].astype(x.dtype)
            cut = x * (1 - m) + flipped * m
            use_cut = apply & use_cutmix
            return jnp.where(use_cut, cut, mixed)

        xs = [mix_one(x) for x in xs]

        t1 = one_hot_smooth(labels, num_classes, label_smoothing)
        t2 = jnp.flip(t1, axis=0)
        targets = t1 * lam + t2 * (1 - lam)

        return (xs if is_list else xs[0]), targets

    return fn


def build_mixup_from_cfg(cfg):
    if not cfg.MIXUP.ENABLE:
        return None
    return make_mixup_fn(
        num_classes=cfg.MODEL.NUM_CLASSES,
        mixup_alpha=cfg.MIXUP.ALPHA,
        cutmix_alpha=cfg.MIXUP.CUTMIX_ALPHA,
        mix_prob=cfg.MIXUP.PROB,
        switch_prob=cfg.MIXUP.SWITCH_PROB,
        label_smoothing=cfg.MIXUP.LABEL_SMOOTH_VALUE,
    )
