"""Token-space spatiotemporal pooling ops for pooled multi-head attention.

TPU-native re-design of the reference ``attention_pool``
(`/root/reference/slowfast/models/attention.py:12-83`). Differences from the
CUDA/torch formulation:

- Layout is channels-last NDHWC (`[B*heads, T, H, W, head_dim]`), which maps
  the channel axis onto TPU lanes; the reference uses NCDHW.
- The fold of the head axis into the batch axis is a *free* reshape from the
  `[B, heads, L, head_dim]` token layout (heads precede tokens), so no data
  movement happens before the conv.
- Depthwise 3-D conv uses `lax.conv_general_dilated` with
  ``feature_group_count=head_dim`` — identical math to torch's
  ``Conv3d(head_dim, head_dim, groups=head_dim, bias=False)`` since all heads
  share the same per-channel filters (the reference folds heads into batch
  too).
- max/avg pooling uses `lax.reduce_window` with explicit padding, matching
  torch's ``MaxPool3d/AvgPool3d(..., ceil_mode=False)`` (count_include_pad
  semantics for avg are matched: torch default ``count_include_pad=True``).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _as3(x: Sequence[int]) -> tuple[int, int, int]:
    t = tuple(int(v) for v in x)
    assert len(t) == 3, t
    return t  # type: ignore[return-value]


def depthwise_conv3d(
    x: jax.Array,
    weights: jax.Array,
    stride: Sequence[int],
    padding: Sequence[int],
) -> jax.Array:
    """Depthwise 3-D convolution in NDHWC layout.

    Args:
      x: ``[B, T, H, W, C]``.
      weights: ``[kT, kH, kW, 1, C]`` (DHWIO with feature_group_count=C).
      stride/padding: length-3 (T, H, W).
    """
    s = _as3(stride)
    p = _as3(padding)
    # NOTE (negative result): decomposing into kT time-shifted depthwise 2-D
    # convs wins 16-32% in an isolated microbench but LOSES ~8 ms/iter inside
    # the full model (the pad/slice/add chain breaks XLA's surrounding
    # fusions); the plain 3-D form stays. See docs/DESIGN.md §8.
    return lax.conv_general_dilated(
        x,
        weights,
        window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1]), (p[2], p[2])],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1],
    )


def pool3d(
    x: jax.Array,
    kind: str,
    kernel: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
) -> jax.Array:
    """Max or average 3-D pooling in NDHWC layout (torch ceil_mode=False).

    torch AvgPool3d defaults to ``count_include_pad=True`` — the divisor is
    the full kernel volume even at padded borders — which we match.
    """
    k = _as3(kernel)
    s = _as3(stride)
    p = _as3(padding)
    window = (1, k[0], k[1], k[2], 1)
    strides = (1, s[0], s[1], s[2], 1)
    pads = ((0, 0), (p[0], p[0]), (p[1], p[1]), (p[2], p[2]), (0, 0))
    if kind == "max":
        init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
        return lax.reduce_window(x, init, lax.max, window, strides, pads)
    elif kind == "avg":
        summed = lax.reduce_window(x, 0.0, lax.add, window, strides, pads)
        return summed / math.prod(k)
    raise ValueError(f"Unknown pooling kind: {kind}")


def pooled_hw(size: int, kernel: int, stride: int, padding: int) -> int:
    """Output size of a pooling/conv dim: floor((N + 2P - K)/S) + 1."""
    return (size + 2 * padding - kernel) // stride + 1


def attention_pool(
    tensor: jax.Array,
    thw: tuple[int, int, int],
    *,
    mode: str,
    kernel: Sequence[int] | None,
    stride: Sequence[int] | None,
    conv_weights: jax.Array | None = None,
    has_cls: bool = False,
) -> tuple[jax.Array, tuple[int, int, int]]:
    """Pool the token axis of an attention tensor.

    Reference semantics (`attention.py:12-83`): reshape tokens back to a
    (T, H, W) volume, pool (depthwise conv / max / avg), flatten back; the
    cls token bypasses pooling and is re-attached in front.

    Args:
      tensor: ``[B, N, L, d]`` (N = heads) or ``[B, L, d]``.
      thw: current (T, H, W) with ``prod(thw) == L`` (minus cls token).
      mode: "conv" | "max" | "avg".
      kernel/stride: pooling kernel and stride; ``None``/all-ones kernel with
        unit stride means no pooling (identity, returned unchanged).
      conv_weights: ``[kT, kH, kW, 1, d]`` depthwise weights for mode="conv".
      has_cls: whether token 0 is a cls token.

    Returns:
      (pooled tensor in the same rank as the input, new (T, H, W)).
    """
    if kernel is None or len(kernel) == 0:
        return tensor, thw

    squeeze = tensor.ndim == 3
    if squeeze:
        tensor = tensor[:, None]

    cls_tok = None
    if has_cls:
        cls_tok, tensor = tensor[:, :, :1], tensor[:, :, 1:]

    B, N, L, d = tensor.shape
    T, H, W = thw
    assert L == T * H * W, (L, thw)

    k = _as3(kernel)
    s = _as3(stride if stride is not None else (1, 1, 1))
    p = tuple(kk // 2 for kk in k)

    # [B, N, L, d] -> [B*N, T, H, W, d] : free reshape, heads fold into batch
    x = tensor.reshape(B * N, T, H, W, d)
    if mode == "conv":
        assert conv_weights is not None
        x = depthwise_conv3d(x, conv_weights, s, p)
    else:
        x = pool3d(x, mode, k, s, p)

    nT, nH, nW = x.shape[1], x.shape[2], x.shape[3]
    out = x.reshape(B, N, nT * nH * nW, d)

    if cls_tok is not None:
        out = jnp.concatenate([cls_tok, out], axis=2)
    if squeeze:
        out = out[:, 0]
    return out, (nT, nH, nW)
