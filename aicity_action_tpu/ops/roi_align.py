"""ROIAlign in pure JAX (gather + bilinear interpolation).

Replaces detectron2's CUDA ROIAlign (used by the reference's detection head,
`head_helper.py:78-84`). Implements the detectron2 v2 semantics
(``aligned=True``: coordinates shifted by -0.5 for correct pixel-center
alignment) and the legacy mode, with the exact CPU-kernel rules:

- ``sampling_ratio=0`` (adaptive) uses ``ceil(roi_size / out_size)`` samples
  per bin **per ROI** (grid height from roi height, grid width from roi
  width), not a global bound. JAX needs static shapes, so the sample grid is
  sized to a static upper bound and per-ROI masked: samples past a box's own
  grid count contribute zero and the bin divides by that box's true
  ``max(grid_h * grid_w, 1)`` (degenerate boxes with a 0-sample grid yield
  0, as in the reference kernel's empty loop).
- bilinear samples are zero only strictly outside ``[-1, size]``
  (``y < -1 or y > H`` — boundary-inclusive survival); surviving coords
  clamp to ``[0, size-1]``, which reproduces the kernel's ``y <= 0 -> 0``
  and ``y_low >= H-1 -> y = H-1`` clamps.

Everything is static-shape and vectorized: for a fixed number of boxes the
whole op lowers to gathers + VPU work, jit/vmap friendly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _bilinear(img: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """Sample img [H, W, C] at float coords y/x [...] → [..., C].

    detectron2 bilinear_interpolate: zero iff y < -1 or y > H (likewise x);
    otherwise clamp into [0, size-1] and interpolate (the clamp covers both
    the ``y <= 0 -> y = 0`` and the ``y_low >= H-1 -> y = H-1`` rules).
    """
    H, W = img.shape[0], img.shape[1]
    valid = (y >= -1.0) & (y <= H) & (x >= -1.0) & (x <= W)
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
    max_samples: int | None = None,
) -> jax.Array:
    """ROIAlign.

    Args:
      features: ``[B, H, W, C]`` (channels-last).
      boxes: ``[N, 5]`` rows of ``(batch_idx, x1, y1, x2, y2)`` in input
        coordinates (the detection collate prepends the batch index,
        reference loader.py:98-132).
      output_size: output bin grid (square).
      spatial_scale: multiply box coords by this (1/stride).
      sampling_ratio: samples per bin dim; 0 = adaptive ceil(roi/out) per
        ROI and per axis (detectron2 CPU/CUDA kernel rule).
      aligned: detectron2 "aligned" mode (-0.5 shift).
      max_samples: static per-axis cap on the adaptive grid. Defaults to
        ``ceil(H_feat / out)`` / ``ceil(W_feat / out)`` — exact whenever
        boxes are clipped to the input image (the AVA loaders clip). A box
        whose scaled extent exceeds the feature map saturates at the cap;
        raise it for such callers.

    Returns ``[N, output_size, output_size, C]``.
    """
    features = jnp.asarray(features)
    boxes = jnp.asarray(boxes)
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
        ns_h = ns_w = sampling_ratio
        gh = jnp.full_like(roi_h, sampling_ratio)
        gw = jnp.full_like(roi_w, sampling_ratio)
    else:
        # per-ROI adaptive grid; static shape = the cap, dynamic count = gh/gw
        if max_samples is None:
            ns_h = max(math.ceil(H / out), 1)
            ns_w = max(math.ceil(W / out), 1)
        else:
            ns_h = ns_w = max_samples
        gh = jnp.clip(jnp.ceil(roi_h / out), 0, ns_h)
        gw = jnp.clip(jnp.ceil(roi_w / out), 0, ns_w)
    count = jnp.maximum(gh * gw, 1.0)  # [N]

    # sample coords: y = y1 + (ph + (iy + 0.5)/gh) * bin_h, iy in [0, gh)
    iy = jnp.arange(ns_h, dtype=jnp.float32)
    ix = jnp.arange(ns_w, dtype=jnp.float32)
    ph = jnp.arange(out, dtype=jnp.float32)
    # [N, out, ns]: bin index + within-bin offset (per-box grid count)
    fy = ph[None, :, None] + (iy[None, None, :] + 0.5) / jnp.maximum(
        gh, 1.0)[:, None, None]
    fx = ph[None, :, None] + (ix[None, None, :] + 0.5) / jnp.maximum(
        gw, 1.0)[:, None, None]
    ys = y1[:, None, None] + fy * bin_h[:, None, None]
    xs = x1[:, None, None] + fx * bin_w[:, None, None]
    my = (iy[None, :] < gh[:, None]).astype(features.dtype)  # [N, ns_h]
    mx = (ix[None, :] < gw[:, None]).astype(features.dtype)  # [N, ns_w]

    def one_box(b, ys_b, xs_b, my_b, mx_b, count_b):
        img = features[b]
        # full sample grid [out, ns_h, out, ns_w]
        yy = ys_b[:, :, None, None]
        xx = xs_b[None, None, :, :]
        vals = _bilinear(img, jnp.broadcast_to(yy, (out, ns_h, out, ns_w)),
                         jnp.broadcast_to(xx, (out, ns_h, out, ns_w)))
        w = my_b[None, :, None, None] * mx_b[None, None, None, :]
        return (vals * w[..., None]).sum(axis=(1, 3)) / count_b

    return jax.vmap(one_box)(batch_idx, ys, xs, my, mx, count)
