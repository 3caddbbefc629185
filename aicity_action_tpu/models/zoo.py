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
    return module, example
