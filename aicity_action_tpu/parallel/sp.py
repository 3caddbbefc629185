"""Sequence (spatial-token) parallelism for pooled attention.

The reference has NO sequence parallelism (SURVEY §5.7) — it scales long
token counts algorithmically (pooling + windowing). This module is the
TPU-native scaling path BEYOND the reference, for regimes its design can't
reach (crops ≥ 896, whole-video token streams): shard one token-grid axis
— H rows or T frames — across the mesh and keep every op local except two
cheap exchanges. (The axis choice matters for alignment: see
``sp_model.plan_sp_blocks`` — the flagship 448 config H-shards 2-way but
T-shards 8-way through all blocks.)

Why MViT makes this easy (and ring attention unnecessary): K/V are pooled
by (1, 8, 8)+ strides before attention, so the GLOBAL pooled K/V is tiny
(1568 tokens at 448 crop). The decomposition per block:

- LayerNorm / qkv projection / MLP: token-local, no communication.
- 3x3x3 pool convs: a ``k//2``-slice halo exchange along the sharded axis
  (`halo_exchange`, two `ppermute`s over the ICI ring).
- attention: local q shard against the ALL-GATHERED pooled K/V
  (`all_gather` of ~0.3 MB — negligible on ICI).

All ops are jit/shard_map-compatible pure functions; gradients flow through
the collectives natively (JAX differentiates ppermute/all_gather).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def halo_exchange(x: jax.Array, axis_name: str, *, axis: int,
                  halo: int = 1, fill_value: float = 0.0):
    """Exchange ``halo`` boundary slices of a volume sharded on ``axis``.

    Args:
      x: local shard, e.g. ``[B, T, H_local, W, C]`` (axis=2, H-sharded)
        or ``[B, T_local, H, W, C]`` (axis=1, T-sharded).
      axis_name: mesh axis the dim is sharded over.
      axis: which array axis is sharded.
      fill_value: value at the grid edges — 0 matches a conv's zero
        padding, ``-inf`` matches max-pool padding semantics.
    Returns ``(before, after)`` neighbor slices, each ``halo`` wide on
    ``axis``.
    """
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)

    # my leading rows go to my lower neighbor; my trailing to my upper one
    lead = lax.slice_in_dim(x, 0, halo, axis=axis)
    trail = lax.slice_in_dim(x, x.shape[axis] - halo, x.shape[axis],
                             axis=axis)
    from_above = lax.ppermute(
        trail, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_below = lax.ppermute(
        lead, axis_name, [(i, (i - 1) % n) for i in range(n)])
    edge = jnp.full_like(lead, fill_value)
    from_above = jnp.where(idx == 0, edge, from_above)
    from_below = jnp.where(idx == n - 1, edge, from_below)
    return from_above, from_below


def halo_exchange_h(x: jax.Array, axis_name: str, halo: int = 1,
                    fill_value: float = 0.0):
    """H-axis form of :func:`halo_exchange` (volume ``[B,T,H_l,W,C]``)."""
    return halo_exchange(x, axis_name, axis=2, halo=halo,
                         fill_value=fill_value)


def sp_pool_volume(x: jax.Array, axis_name: str | None, *, mode: str,
                   kernel, stride, conv_weights=None, shard_axis: int = 2):
    """Sharded pooling of a ``[B, T, H, W, C]`` volume whose ``shard_axis``
    (2 = H rows, 1 = T frames) is mesh-sharded — the SP form of
    ``ops.pooling.attention_pool``'s core (conv / max / avg, pad ``k//2``).

    The sharded axis's padding comes from a ``k//2``-slice halo exchange
    (zeros for conv, ``-inf`` for max, matching the dense op's edge
    semantics); the other two axes keep ordinary padding. Requires the
    local extent divisible by the axis stride (shard boundaries on pooling
    windows — identical results to the unsharded op). ``axis_name=None``
    degrades to the dense op (used for the post-gather tail blocks).
    """
    kt, kh, kw = (int(v) for v in kernel)
    st, sh, sw = (int(v) for v in stride)
    if axis_name is None:
        from ..ops.pooling import depthwise_conv3d, pool3d

        pad = (kt // 2, kh // 2, kw // 2)
        if mode == "conv":
            return depthwise_conv3d(x, conv_weights, (st, sh, sw), pad)
        return pool3d(x, mode, (kt, kh, kw), (st, sh, sw), pad)

    assert shard_axis in (1, 2), shard_axis
    ax_k, ax_s = ((kh, sh) if shard_axis == 2 else (kt, st))
    assert x.shape[shard_axis] % ax_s == 0, (x.shape, shard_axis, ax_s)
    halo = ax_k // 2
    if halo:
        fill = -jnp.inf if mode == "max" else 0.0
        above, below = halo_exchange(x, axis_name, axis=shard_axis,
                                     halo=halo, fill_value=fill)
        xh = jnp.concatenate([above, x, below], axis=shard_axis)
    else:
        xh = x
    # the sharded axis is already halo-padded; the others pad normally
    pads3 = [(kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    pads3[shard_axis - 1] = (0, 0)
    if mode == "conv":
        return lax.conv_general_dilated(
            xh, conv_weights,
            window_strides=(st, sh, sw),
            padding=pads3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=x.shape[-1],
        )
    assert mode in ("max", "avg"), mode
    window = (1, kt, kh, kw, 1)
    strides = (1, st, sh, sw, 1)
    pads = ((0, 0), *pads3, (0, 0))
    if mode == "max":
        return lax.reduce_window(xh, -jnp.inf, lax.max, window, strides,
                                 pads)
    import math as _math

    summed = lax.reduce_window(xh, 0.0, lax.add, window, strides, pads)
    return summed / _math.prod((kt, kh, kw))


def sp_depthwise_pool(x: jax.Array, weights: jax.Array, stride_hw: int,
                      axis_name: str):
    """H-sharded depthwise 3x3x3 conv (stride ``(1, s, s)``, pad 1).

    Each shard convolves its rows plus one halo row from each neighbor —
    identical results to the unsharded conv PROVIDED ``H_local % s == 0``
    (shard boundaries align with pooling windows).
    x: ``[B, T, H_local, W, C]``; weights ``[3, 3, 3, 1, C]``.
    """
    assert x.shape[2] % stride_hw == 0, (x.shape, stride_hw)
    above, below = halo_exchange_h(x, axis_name)
    xh = jnp.concatenate([above, x, below], axis=2)
    # H padding is provided by the halos; T/W keep the conv's own zero pad
    out = lax.conv_general_dilated(
        xh, weights,
        window_strides=(1, stride_hw, stride_hw),
        padding=[(1, 1), (0, 0), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1],
    )
    return out


def sp_pooled_attention(
    x: jax.Array,
    thw_local: tuple[int, int, int],
    params: dict,
    *,
    axis_name: str,
    stride_q: int = 1,
    stride_kv: int = 8,
    ln_eps: float = 1e-6,
    pool_ln_eps: float = 1e-5,
):
    """One sequence-parallel pooled-attention block (h=1, the MViT block-0
    shape where token counts explode first).

    ``x``: local H-shard of tokens as a volume ``[B, T, H_local, W, C]``.
    ``params``: {ln_scale, ln_bias, qkv_w, qkv_b, pool_q_w, pool_k_w,
    pool_v_w, norm_q_scale/bias, norm_k_scale/bias, norm_v_scale/bias,
    proj_w, proj_b} — the exact parameters of MultiScaleAttention.

    Communication: 3 halo exchanges (q/k/v pooling) + 1 all_gather of the
    pooled K/V. Everything else is local. Returns the local out shard
    ``[B, T, Hq_local, W_q, C]``.
    """
    B, T, Hl, W, C = x.shape

    def _ln(t, scale, bias, eps):
        tf = t.astype(jnp.float32)
        mu = tf.mean(-1, keepdims=True)
        var = ((tf - mu) ** 2).mean(-1, keepdims=True)
        return ((tf - mu) * lax.rsqrt(var + eps) * scale + bias).astype(
            t.dtype)

    xn = _ln(x, params["ln_scale"], params["ln_bias"], ln_eps)
    qkv = jnp.dot(xn, params["qkv_w"])
    if params.get("qkv_b") is not None:
        qkv = qkv + params["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def _pool_norm(t, w, scale, bias, stride):
        p = sp_depthwise_pool(t, w, stride, axis_name)
        return _ln(p, scale, bias, pool_ln_eps)

    q = _pool_norm(q, params["pool_q_w"], params["norm_q_scale"],
                   params["norm_q_bias"], stride_q)
    k = _pool_norm(k, params["pool_k_w"], params["norm_k_scale"],
                   params["norm_k_bias"], stride_kv)
    v = _pool_norm(v, params["pool_v_w"], params["norm_v_scale"],
                   params["norm_v_bias"], stride_kv)

    # global pooled K/V: tiny after the (1, s, s) kv stride
    k_all = lax.all_gather(k, axis_name, axis=2, tiled=True)
    v_all = lax.all_gather(v, axis_name, axis=2, tiled=True)

    d = C
    scale = d ** -0.5
    qf = q.reshape(B, -1, d)
    kf = k_all.reshape(B, -1, d)
    vf = v_all.reshape(B, -1, d)
    s = jnp.einsum("bqd,bkd->bqk", qf.astype(jnp.float32),
                   kf.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bqk,bkd->bqd", p, vf.astype(jnp.float32)).astype(
        x.dtype)
    out = out + qf  # MViT-v2 query residual
    out = jnp.dot(out, params["proj_w"]) + params["proj_b"]
    Hq = q.shape[2]
    Wq = q.shape[3]
    return out.reshape(B, T, Hq, Wq, C)
