"""ROIAlign in pure JAX (gather + bilinear interpolation).

Replaces detectron2's CUDA ROIAlign (used by the reference's detection head,
`head_helper.py:78-84`). Implements the detectron2 v2 semantics
(``aligned=True``: coordinates shifted by -0.5 for correct pixel-center
alignment) and the legacy mode. ``sampling_ratio=0`` (adaptive) uses
ceil(roi_size / out_size) samples per bin, matching torchvision/detectron2.

Everything is static-shape and vectorized: for a fixed number of boxes the
whole op lowers to gathers + matmul-free VPU work, jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear(img: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """Sample img [H, W, C] at float coords y/x [...] → [..., C].

    Out-of-range samples clamp to the border after the -1 < y < H check
    zeroes them (torchvision semantics: y < -1 or y > H → 0).
    """
    H, W = img.shape[0], img.shape[1]
    valid = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    out = (
        v00 * (1 - ly) * (1 - lx)
        + v01 * (1 - ly) * lx
        + v10 * ly * (1 - lx)
        + v11 * ly * lx
    )
    return out * valid[..., None]


def roi_align(
    features: jax.Array,
    boxes: jax.Array,
    *,
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 0,
    aligned: bool = True,
) -> jax.Array:
    """ROIAlign.

    Args:
      features: ``[B, H, W, C]`` (channels-last).
      boxes: ``[N, 5]`` rows of ``(batch_idx, x1, y1, x2, y2)`` in input
        coordinates (the detection collate prepends the batch index,
        reference loader.py:98-132).
      output_size: output bin grid (square).
      spatial_scale: multiply box coords by this (1/stride).
      sampling_ratio: samples per bin dim; 0 = adaptive ceil(roi/out).
      aligned: detectron2 "aligned" mode (-0.5 shift).

    Returns ``[N, output_size, output_size, C]``.
    """
    B, H, W, C = features.shape
    out = output_size
    offset = 0.5 if aligned else 0.0

    batch_idx = boxes[:, 0].astype(jnp.int32)
    x1 = boxes[:, 1] * spatial_scale - offset
    y1 = boxes[:, 2] * spatial_scale - offset
    x2 = boxes[:, 3] * spatial_scale - offset
    y2 = boxes[:, 4] * spatial_scale - offset

    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_w = roi_w / out
    bin_h = roi_h / out

    if sampling_ratio > 0:
        ns = sampling_ratio
    else:
        # adaptive: static upper bound from the max possible roi size
        ns = max(int(jnp.ceil(H / out)) if False else -(-H // out), 1)

    # sample grid per box: [out, ns] offsets within each bin
    ix = (jnp.arange(out)[:, None] + (jnp.arange(ns)[None, :] + 0.5) / ns)
    # y coords [N, out, ns]
    ys = y1[:, None, None] + ix[None] * bin_h[:, None, None]
    xs = x1[:, None, None] + ix[None] * bin_w[:, None, None]

    def one_box(b, ys_b, xs_b):
        img = features[b]
        # full sample grid [out*ns, out*ns]
        yy = jnp.repeat(ys_b.reshape(-1), out * ns)
        xx = jnp.tile(xs_b.reshape(-1), out * ns)
        vals = _bilinear(img, yy, xx)  # [out*ns*out*ns, C]
        vals = vals.reshape(out, ns, out, ns, C)
        return vals.mean(axis=(1, 3))

    return jax.vmap(one_box)(batch_idx, ys, xs)
