"""Optimizer construction with parameter-group semantics.

Re-design of `/root/reference/slowfast/models/optimizer.py:26-236` on optax:
the reference's per-group torch param lists become pytree *masks*:

- zero weight decay for 1-D params and biases when ``SOLVER.ZERO_WD_1D_PARAM``
  (`optimizer.py:71-74`) and for the model's ``no_weight_decay`` set
  (pos embeds / cls token when ``MVIT.ZERO_DECAY_POS_CLS``)
- BatchNorm params use ``BN.WEIGHT_DECAY`` (`optimizer.py:92`)
- cross-projection heads may use a different LR
  (`optimizer.py:85-89` — implemented as a per-leaf LR scale mask)

ZeRO-1 (``OPTIMIZING_METHOD=zero_sgd|zero_adamw``, reference
`optimizer.py:142-155,189-199`): the optax update rule is identical to the
non-zero variant; the state sharding lives in
``parallel/tp.py:zero1_state_shardings`` — optimizer moments are annotated
with a ``NamedSharding`` over the data axis (train_loop applies it), so
mu/nu memory shrinks by 1/dp exactly like ``ZeroRedundancyOptimizer``.

Optimizers: sgd (momentum/nesterov/dampening), adam, adamw — matching torch
update rules through optax.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

from .lr_policy import make_lr_schedule


def _param_labels(params, zero_wd_1d: bool, no_decay_names: frozenset):
    """Label every leaf: 'zero_wd' | 'bn' | 'cross_proj' | 'default'."""

    def label(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        spath = "/".join(str(k) for k in keys)
        if any(k.startswith("cross_") for k in keys if isinstance(k, str)):
            return "cross_proj"
        # flax BatchNorm params live under a module whose name contains 'bn'
        if any(isinstance(k, str) and ("bn" in k.lower() and "attn" not in k.lower()) for k in keys):
            return "bn"
        if any(name in spath for name in no_decay_names):
            return "zero_wd"
        if zero_wd_1d and (leaf.ndim <= 1 or keys[-1] == "bias"):
            return "zero_wd"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def no_weight_decay_names(cfg) -> frozenset:
    """Names excluded from weight decay (reference MViT.no_weight_decay,
    `video_model_builder.py:1136-1159`)."""
    if cfg.MODEL.MODEL_NAME == "MViT" and cfg.MVIT.ZERO_DECAY_POS_CLS:
        return frozenset(
            {"pos_embed_spatial", "pos_embed_temporal", "pos_embed_class",
             "pos_embed", "cls_token"}
        )
    return frozenset()


def construct_optimizer(
    cfg, params, steps_per_epoch: int
) -> tuple[optax.GradientTransformation, Callable]:
    """Build the optax transform chain and the LR schedule.

    Returns ``(tx, lr_schedule)``; ``lr_schedule(step)`` gives the LR for
    logging (the same schedule drives the updates).
    """
    solver = cfg.SOLVER
    schedule = make_lr_schedule(solver, steps_per_epoch)

    labels = _param_labels(
        params, solver.ZERO_WD_1D_PARAM, no_weight_decay_names(cfg)
    )

    def wd_mask_for(label_value):
        return jax.tree.map(lambda l: l == label_value, labels)

    method = solver.OPTIMIZING_METHOD
    chain = []

    # gradient clipping first (reference clips before step,
    # train_net.py:233-243)
    if solver.CLIP_GRAD_VAL:
        chain.append(optax.clip(solver.CLIP_GRAD_VAL))
    elif solver.CLIP_GRAD_L2NORM:
        chain.append(optax.clip_by_global_norm(solver.CLIP_GRAD_L2NORM))

    if method in ("sgd", "zero_sgd", "sgd_8bit"):
        # torch-SGD semantics: wd folded into the gradient before momentum
        if solver.WEIGHT_DECAY:
            chain.append(
                optax.add_decayed_weights(
                    solver.WEIGHT_DECAY, mask=wd_mask_for("default")
                )
            )
        if cfg.BN.WEIGHT_DECAY:
            chain.append(
                optax.add_decayed_weights(
                    cfg.BN.WEIGHT_DECAY, mask=wd_mask_for("bn")
                )
            )
        chain.append(
            optax.trace(
                decay=solver.MOMENTUM, nesterov=solver.NESTEROV,
            )
        )
        chain.append(optax.scale_by_learning_rate(schedule))
    elif method in ("adam", "adamw", "zero_adamw", "adam_8bit"):
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if method in ("adamw", "zero_adamw"):
            # decoupled decay, scaled by LR like torch AdamW
            if solver.WEIGHT_DECAY:
                chain.append(
                    optax.add_decayed_weights(
                        solver.WEIGHT_DECAY, mask=wd_mask_for("default")
                    )
                )
            if cfg.BN.WEIGHT_DECAY:
                chain.append(
                    optax.add_decayed_weights(
                        cfg.BN.WEIGHT_DECAY, mask=wd_mask_for("bn")
                    )
                )
        chain.append(optax.scale_by_learning_rate(schedule))
    else:
        raise NotImplementedError(f"Does not support {method} optimizer")

    tx = optax.chain(*chain)

    if cfg.MODEL.MULTI_ADD_CROSS_PROJ and cfg.MODEL.MULTI_FIX_PROJ:
        # freeze the cross-dataset projections (reference intent at
        # train_net.py:688-695; its `.require_grad = False` is a silent
        # no-op typo — here the updates really are zeroed)
        tx = optax.chain(
            tx, optax.masked(optax.set_to_zero(), wd_mask_for("cross_proj"))
        )

    if cfg.MODEL.MULTI_PROJ_TRAIN_DIFF_LR:
        # scale cross-proj leaves' update by lr_proj / lr_base per step
        proj_scale = optax.masked(
            optax.scale_by_schedule(
                lambda step: cfg.MODEL.MULTI_PROJ_LR / schedule(step)
            ),
            wd_mask_for("cross_proj"),
        )
        tx = optax.chain(tx, proj_scale)

    return tx, schedule
