"""Detection RoI head (reference: head_helper.py ResNetRoIHead:14-136).

Temporal AvgPool → ROIAlign → spatial MaxPool → concat pathways → linear.
The activation is applied in BOTH train and eval (AVA uses sigmoid+BCE;
reference head applies act unconditionally in forward).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.roi_align import roi_align
from .common import trunc_normal_init
from .heads import head_activation


class ResNetRoIHead(nn.Module):
    num_classes: int
    pool_size: tuple  # per pathway: (temporal_kernel, 1, 1)
    resolution: tuple  # per pathway roi output size
    scale_factor: tuple  # per pathway spatial stride
    dropout_rate: float = 0.0
    act_func: str = "sigmoid"
    aligned: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, inputs: Sequence[jax.Array], bboxes: jax.Array,
        *, train: bool = False,
    ) -> jax.Array:
        """``inputs[p]``: [B, T, H, W, C]; ``bboxes``: [N, 5]
        (batch_idx, x1, y1, x2, y2)."""
        pooled = []
        for p, x in enumerate(inputs):
            # temporal average pool to one frame
            x = x.mean(axis=1)  # [B, H, W, C]
            rois = roi_align(
                x, bboxes,
                output_size=self.resolution[p],
                spatial_scale=1.0 / self.scale_factor[p],
                sampling_ratio=0,
                aligned=self.aligned,
            )  # [N, r, r, C]
            pooled.append(rois.max(axis=(1, 2)))  # spatial max pool
        x = jnp.concatenate(pooled, axis=-1)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(
            self.num_classes, kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            name="projection",
        )(x)
        # activation in train AND eval (reference head_helper.py:135)
        return head_activation(x, self.act_func)
