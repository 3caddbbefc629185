"""Registered model builders.

Each builder takes a cfg and returns ``(flax_module, example_input)``.
Input layout is channels-last ``[B, T, H, W, C]``; multi-pathway models take
a list of such tensors (pathway convention matches the reference,
`video_model_builder.py:1165-1167`).
"""

from __future__ import annotations

import jax.numpy as jnp

from .build import MODEL_REGISTRY, compute_dtypes
from .mvit import MViT as MViTModule, build_mvit_spec


@MODEL_REGISTRY.register(name="MViT")
def build_mvit(cfg):
    spec = build_mvit_spec(cfg)
    dtype, param_dtype = compute_dtypes(cfg)
    module = MViTModule(spec=spec, dtype=dtype, param_dtype=param_dtype)
    x = jnp.zeros(
        (1, spec.num_frames, spec.crop_size, spec.crop_size, spec.in_channels),
        dtype,
    )
    example = x if spec.direct_input else [x]
    if cfg.DETECTION.ENABLE:
        return module, (example, jnp.zeros((1, 5), jnp.float32))
    return module, example


def _conv_example(cfg, dtype, pathways):
    T = cfg.DATA.NUM_FRAMES
    S = cfg.DATA.TRAIN_CROP_SIZE
    C = cfg.DATA.INPUT_CHANNEL_NUM
    if pathways == 1:
        xs = [jnp.zeros((1, T, S, S, C[0]), dtype)]
    else:
        alpha = cfg.SLOWFAST.ALPHA
        xs = [
            jnp.zeros((1, T // alpha, S, S, C[0]), dtype),
            jnp.zeros((1, T, S, S, C[1] if len(C) > 1 else C[0]), dtype),
        ]
    if cfg.DETECTION.ENABLE:
        boxes = jnp.zeros((1, 5), jnp.float32)
        return (xs, boxes)  # tuple => multiple positional args at init
    return xs


@MODEL_REGISTRY.register(name="ResNet")
def build_resnet(cfg):
    from .resnet_models import ResNet

    dtype, _ = compute_dtypes(cfg)
    module = ResNet(cfg_frozen=cfg.to_dict(), dtype=dtype)
    return module, _conv_example(cfg, dtype, 1)


@MODEL_REGISTRY.register(name="SlowFast")
def build_slowfast(cfg):
    from .resnet_models import SlowFast

    dtype, _ = compute_dtypes(cfg)
    module = SlowFast(cfg_frozen=cfg.to_dict(), dtype=dtype)
    return module, _conv_example(cfg, dtype, 2)


@MODEL_REGISTRY.register(name="X3D")
def build_x3d(cfg):
    from .resnet_models import X3D

    dtype, _ = compute_dtypes(cfg)
    module = X3D(cfg_frozen=cfg.to_dict(), dtype=dtype)
    return module, _conv_example(cfg, dtype, 1)


@MODEL_REGISTRY.register(name="ActionCLIP")
def build_actionclip_entry(cfg):
    from .actionclip import build_actionclip

    return build_actionclip(cfg)
