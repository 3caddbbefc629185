"""Fused token-pooling Pallas kernels for MViT pooled attention.

Two ops, both operating on channels-last volumes ``[G, T, H, W, C]``:

- :func:`fused_pool_conv_ln` — depthwise 3x3x3 conv (stride ``(1, s, s)``,
  pad 1, no bias) immediately followed by grouped LayerNorm over head_dim.
  Replaces the reference's per-head ``Conv3d(groups=head_dim)`` + LN inside
  ``attention_pool`` (`/root/reference/slowfast/models/attention.py:12-83,
  169-213`).
- :func:`fused_max_pool` — the skip-path max pool, kernel ``(1, 3, 3)``
  stride ``(1, s, s)`` (`attention.py:388-395`).

Why Pallas: XLA lowers the depthwise conv with a hostile output layout
(~135 GB/s, 16% of HBM bandwidth at the 448 shapes) and runs the grouped
LN as a separate pass; fused here, each q/k/v pooling is ONE pass over the
activation at memory speed.

Kernel shape strategy: the H axis is pre-factored into (block-rows, s) so
output tiles map to non-overlapping input block-rows; the one (kh-1)//s
halo block-row rides in as a second BlockSpec on the same array (Pallas
index maps cannot express overlapping windows). The W axis stays
unfactored — taps slice the loaded value with static strides. Backward =
``jax.vjp`` of the identical-math XLA composition (forward stays Pallas
under ``grad``; only the backward pass uses the composition).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import flash_attention as _fa

# input-block VMEM budget (bytes); Pallas double-buffers pipeline inputs
# and the f32 accumulator + slab temps live on the same 16 MB scoped stack
_IN_BYTES_BUDGET = 2 * 1024 * 1024


def _out_size(n: int, k: int, s: int) -> int:
    return (n + 2 * (k // 2) - k) // s + 1


def _plan(T, H, W, C, kt, s, itemsize):
    """Tile plan: returns dict or None if the shape doesn't tile."""
    Ho, Wo = _out_size(H, 3, s), _out_size(W, 3, s)
    To = _out_size(T, kt, 1)
    hb = 2 // s  # halo block-rows: (kh-1)//s
    hblocks = max(Ho + hb, -(-(H + 1) // s))
    wp = max(s * (Wo - 1) + 3, W + 1)
    r = None
    for cand in range(Ho, 0, -1):
        if Ho % cand or (hb and cand % hb):
            continue
        if kt * (cand + hb) * s * wp * C * itemsize <= _IN_BYTES_BUDGET:
            r = cand
            break
    if r is None:
        return None
    return dict(To=To, Ho=Ho, Wo=Wo, hb=hb, hblocks=hblocks, wp=wp, r=r,
                tp=T + 2 * (kt // 2))


def fused_pool_supported(thw, C: int, stride, kernel, groups: int = 1,
                         itemsize: int = 2) -> bool:
    T, H, W = thw
    k = tuple(int(v) for v in kernel)
    s = tuple(int(v) for v in stride)
    if k[1] != 3 or k[2] != 3 or k[0] not in (1, 3):
        return False
    if s[0] != 1 or s[1] != s[2] or s[1] not in (1, 2, 4, 8):
        return False
    if C % groups or (C // groups) % 8:
        return False
    return _plan(T, H, W, C, k[0], s[1], itemsize) is not None


def _prep(x5, kt, s, plan, pad_value):
    """Pad + factor H into (block-rows, s): [G, Tp, hblocks, s, wp, C]."""
    G, T, H, W, C = x5.shape
    xp = jnp.pad(
        x5,
        ((0, 0), (kt // 2, kt // 2),
         (1, plan["hblocks"] * s - H - 1),
         (1, plan["wp"] - W - 1), (0, 0)),
        constant_values=pad_value,
    )
    return xp.reshape(G, plan["tp"], plan["hblocks"], s, plan["wp"], C)


def _pool_kernel(*refs, kt, r, hb, s, wo, c, groups, eps, mode):
    mains = refs[:kt]
    idx = kt
    halos = refs[idx:idx + kt] if hb else ()
    idx += kt if hb else 0
    if mode == "conv":
        w_ref, g_ref, b_ref = refs[idx:idx + 3]
    o_ref = refs[-1]

    acc = None
    for a in range(kt):
        m = mains[a][0, 0]  # [r, s, wp, C]
        v = jnp.concatenate([m, halos[a][0, 0]], axis=0) if hb else m
        for b in range(3):
            rb, rp = divmod(b, s)
            for cc in range(3):
                slab = v[rb:rb + r, rp,
                         cc:cc + s * (wo - 1) + 1:s, :].astype(jnp.float32)
                if mode == "conv":
                    wt = w_ref[a * 9 + b * 3 + cc, :].astype(jnp.float32)
                    term = slab * wt
                    acc = term if acc is None else acc + term
                else:
                    acc = slab if acc is None else jnp.maximum(acc, slab)

    if mode == "conv":
        dg = c // groups
        gam = g_ref[0].astype(jnp.float32)
        bet = b_ref[0].astype(jnp.float32)
        for gi in range(groups):
            xs = acc[..., gi * dg:(gi + 1) * dg]
            mu = jnp.mean(xs, axis=-1, keepdims=True)
            xc = xs - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            o_ref[0, 0, :, :, gi * dg:(gi + 1) * dg] = (
                xc * lax.rsqrt(var + eps) * gam + bet
            ).astype(o_ref.dtype)
    else:
        o_ref[0, 0] = acc.astype(o_ref.dtype)


def _pool_impl(x5, w, gamma, beta, kt, s, groups, eps, mode):
    G, T, H, W, C = x5.shape
    plan = _plan(T, H, W, C, kt, s, x5.dtype.itemsize)
    assert plan is not None, (x5.shape, kt, s)
    to, ho, wo = plan["To"], plan["Ho"], plan["Wo"]
    r, hb, wp = plan["r"], plan["hb"], plan["wp"]

    pad_value = 0 if mode == "conv" else (
        -jnp.inf if jnp.issubdtype(x5.dtype, jnp.floating)
        else jnp.iinfo(x5.dtype).min)
    xp = _prep(x5, kt, s, plan, pad_value)

    in_specs = []
    args = []
    for a in range(kt):
        in_specs.append(pl.BlockSpec(
            (1, 1, r, s, wp, C),
            functools.partial(
                lambda g, t, j, a: (g, t + a, j, 0, 0, 0), a=a),
            memory_space=pltpu.VMEM))
        args.append(xp)
    if hb:
        for a in range(kt):
            in_specs.append(pl.BlockSpec(
                (1, 1, hb, s, wp, C),
                functools.partial(
                    lambda g, t, j, a: (
                        g, t + a, (j + 1) * (r // hb), 0, 0, 0), a=a),
                memory_space=pltpu.VMEM))
            args.append(xp)
    if mode == "conv":
        dg = C // groups
        in_specs += [
            pl.BlockSpec((kt * 9, C), lambda g, t, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg), lambda g, t, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg), lambda g, t, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [w.reshape(kt * 9, C), gamma.reshape(1, dg),
                 beta.reshape(1, dg)]

    kernel = functools.partial(
        _pool_kernel, kt=kt, r=r, hb=hb, s=s, wo=wo, c=C,
        groups=groups, eps=eps, mode=mode)
    flops = G * to * ho * wo * C * kt * 9 * 2
    out = pl.pallas_call(
        kernel,
        grid=(G, to, ho // r),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, r, wo, C), lambda g, t, j: (g, t, j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, to, ho, wo, C), x5.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x5.dtype.itemsize * (
                kt * G * plan["tp"] * plan["hblocks"] * s * wp * C
                + G * to * ho * wo * C),
            transcendentals=0,
        ),
        interpret=_fa.INTERPRET,
    )(*args)
    return out


# ------------------------------------------------------- XLA reference math

def _ref_pool_conv_ln(x5, w, gamma, beta, s, groups, eps):
    C = x5.shape[-1]
    out = lax.conv_general_dilated(
        x5, w[:, :, :, None, :],
        window_strides=(1, s, s),
        padding=[(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=C,
    )
    dg = C // groups
    xs = out.reshape(*out.shape[:-1], groups, dg).astype(jnp.float32)
    mu = xs.mean(axis=-1, keepdims=True)
    xc = xs - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    y = xc * lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.reshape(out.shape).astype(x5.dtype)


def _ref_max_pool(x5, kt, s):
    init = -jnp.inf if jnp.issubdtype(x5.dtype, jnp.floating) else (
        jnp.iinfo(x5.dtype).min)
    return lax.reduce_window(
        x5, init, lax.max,
        (1, kt, 3, 3, 1), (1, 1, s, s, 1),
        ((0, 0), (kt // 2, kt // 2), (1, 1), (1, 1), (0, 0)),
    )


# ------------------------------------------------------------- public ops

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_pool_conv_ln(x5, w, gamma, beta, s: int, groups: int, eps: float):
    """Depthwise 3x3x3 conv (stride ``(1, s, s)``, pad 1) + grouped LN.

    Args:
      x5: ``[G, T, H, W, C]`` activation volume.
      w: ``[3, 3, 3, C]`` per-channel taps (heads tiled into C).
      gamma, beta: ``[C // groups]`` shared LN params.
    Returns ``[G, T, Ho, Wo, C]``.
    """
    return _pool_impl(x5, w, gamma, beta, 3, s, groups, eps, "conv")


def _conv_ln_fwd(x5, w, gamma, beta, s, groups, eps):
    return fused_pool_conv_ln(x5, w, gamma, beta, s, groups, eps), (
        x5, w, gamma, beta)


def _conv_ln_bwd(s, groups, eps, res, g):
    x5, w, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x, ww, gm, bt: _ref_pool_conv_ln(x, ww, gm, bt, s, groups,
                                                eps),
        x5, w, gamma, beta)
    return vjp(g)


fused_pool_conv_ln.defvjp(_conv_ln_fwd, _conv_ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_max_pool(x5, kt: int, s: int):
    """Max pool kernel ``(kt, 3, 3)`` stride ``(1, s, s)`` pad
    ``(kt//2, 1, 1)`` (-inf padding, torch MaxPool3d semantics)."""
    return _pool_impl(x5, None, None, None, kt, s, 1, 0.0, "max")


def _max_fwd(x5, kt, s):
    return fused_max_pool(x5, kt, s), (x5,)


def _max_bwd(kt, s, res, g):
    (x5,) = res
    _, vjp = jax.vjp(lambda x: _ref_max_pool(x, kt, s), x5)
    return vjp(g)


fused_max_pool.defvjp(_max_fwd, _max_bwd)
