"""Fused LayerNorm+matmul Pallas kernels for the MViT block hot path.

Why: with LN and attention already in Pallas (C-minormost layouts pinned),
XLA still picks token-minormost ({1,2,0}) output layouts for the remaining
3-D dots (qkv / mlp), paying a relayout copy into every Pallas consumer and
running the dots themselves at 9-12 TFLOP/s (profiled, 448 crop). These
kernels fuse the preceding LayerNorm into the matmul, keep weights VMEM-
resident across row tiles, accumulate in f32 on the MXU, and emit
C-minormost bf16 — no layout negotiation left.

Kernels:
- ``fused_ln_qkv``  : LN(x) @ Wqkv (+bias) -> (q, k, v)   [norm1 + qkv]
- ``fused_ln_mlp``  : fc2(gelu(fc1(LN(x)))) (+biases)     [norm2 + MLP]

Backward passes reuse ``jax.vjp`` of the straight-line jnp reference
implementation (identical math, f32 stats/accum), so training works today;
the backward matmuls stay XLA.

Reference equivalence: attention.py:230 (fused qkv linear),
common.py Mlp (fc1/gelu/fc2), video_model_builder.py:849-851 (eps 1e-6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import flash_attention as _fa

# row-tile candidates: multiples of 8 (f32 sublane requirement)
_ROW_TILES = (1024, 896, 784, 512, 448, 392, 256, 224, 128, 112,
              64, 56, 32, 16, 8)


def _pick_rows(m: int, cap: int) -> int | None:
    for t in _ROW_TILES:
        if t <= cap and m % t == 0:
            return t
    return None


def _ln_f32(x, gamma, beta, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * gamma + beta


def _erf_f32(x):
    """erf via Abramowitz–Stegun 7.1.26 (max abs error 1.5e-7 — far below
    bf16 resolution). Mosaic implements neither ``erf`` nor ``erfc``; only
    ``exp`` is needed here."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_f32(x):
    # erf-form GELU (torch default; parity note in models/common.py)
    return 0.5 * x * (1.0 + _erf_f32(x * (2.0 ** -0.5)))


# ------------------------------------------------------------- ln + qkv

def _ln_qkv_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref,
                   q_ref, k_ref, v_ref, *, eps, has_bias):
    x = x_ref[:].astype(jnp.float32)
    gam = g_ref[0].astype(jnp.float32)
    bet = b_ref[0].astype(jnp.float32)
    xn = _ln_f32(x, gam, bet, eps).astype(x_ref.dtype)
    C = q_ref.shape[-1]
    for i, out_ref in enumerate((q_ref, k_ref, v_ref)):
        w = w_ref[:, i * C:(i + 1) * C]
        acc = jax.lax.dot_general(
            xn, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bias:
            acc = acc + bias_ref[0, i * C:(i + 1) * C].astype(jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype)


def _ref_ln_qkv(x2, gamma, beta, w, bias, eps):
    xn = _ln_f32(
        x2.astype(jnp.float32), gamma.astype(jnp.float32),
        beta.astype(jnp.float32), eps,
    ).astype(x2.dtype)
    C = w.shape[1] // 3
    outs = []
    for i in range(3):
        o = jax.lax.dot_general(
            xn, w[:, i * C:(i + 1) * C], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            o = o + bias[i * C:(i + 1) * C].astype(jnp.float32)
        outs.append(o.astype(x2.dtype))
    return tuple(outs)


def ln_qkv_supported(m: int, d: int, c3: int) -> bool:
    if d % 8 or (c3 // 3) % 8 or c3 % 3:
        return False
    # weights + one row tile must fit VMEM comfortably
    if d * c3 * 2 > 8 * 1024 * 1024:
        return False
    return _pick_rows(m, 1024) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_ln_qkv(x2, gamma, beta, w, bias, eps: float):
    """``LN(x2) @ w (+bias)`` split into (q, k, v).

    Args:
      x2: ``[M, D]``.
      gamma, beta: ``[D]`` LayerNorm params.
      w: ``[D, 3C]`` fused qkv kernel.
      bias: ``[3C]`` or None.
    Returns (q, k, v), each ``[M, C]`` in x2's dtype.
    """
    return _ln_qkv_fwd(x2, gamma, beta, w, bias, eps)[0]


def _ln_qkv_impl(x2, gamma, beta, w, bias, eps):
    M, D = x2.shape
    C3 = w.shape[1]
    C = C3 // 3
    # hidden f32 rows cap VMEM: TM * C3 * 4 <= ~2.5MB
    cap = max(8, (2_500_000 // (C3 * 4)) // 8 * 8)
    tm = _pick_rows(M, min(1024, cap))
    assert tm is not None, (M, C3)
    has_bias = bias is not None
    bias_in = bias if has_bias else jnp.zeros((C3,), x2.dtype)
    kernel = functools.partial(_ln_qkv_kernel, eps=eps, has_bias=has_bias)
    out_spec = pl.BlockSpec((tm, C), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((tm, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, C3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((M, C), x2.dtype) for _ in range(3)),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * C3,
            bytes_accessed=2 * (M * D + M * C3) + D * C3 * 2,
            transcendentals=M,
        ),
        interpret=_fa.INTERPRET,
    )(x2, gamma.reshape(1, D), beta.reshape(1, D), w,
      bias_in.reshape(1, C3))


def _ln_qkv_fwd(x2, gamma, beta, w, bias, eps):
    out = _ln_qkv_impl(x2, gamma, beta, w, bias, eps)
    return out, (x2, gamma, beta, w, bias)


def _ln_qkv_bwd(eps, res, g):
    x2, gamma, beta, w, bias = res
    if bias is None:
        _, vjp = jax.vjp(
            lambda x, gm, bt, ww: _ref_ln_qkv(x, gm, bt, ww, None, eps),
            x2, gamma, beta, w)
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        lambda x, gm, bt, ww, bb: _ref_ln_qkv(x, gm, bt, ww, bb, eps),
        x2, gamma, beta, w, bias)
    return vjp(g)


fused_ln_qkv.defvjp(
    lambda x2, g, b, w, bias, eps: _ln_qkv_fwd(x2, g, b, w, bias, eps),
    _ln_qkv_bwd,
)


# ------------------------------------------------------------- ln + mlp

def _ln_mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    gam = g_ref[0].astype(jnp.float32)
    bet = b_ref[0].astype(jnp.float32)
    xn = _ln_f32(x, gam, bet, eps).astype(x_ref.dtype)
    h = jax.lax.dot_general(
        xn, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    h = _gelu_f32(h).astype(x_ref.dtype)
    o = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _ref_ln_mlp(x2, gamma, beta, w1, b1, w2, b2, eps):
    xn = _ln_f32(
        x2.astype(jnp.float32), gamma.astype(jnp.float32),
        beta.astype(jnp.float32), eps,
    ).astype(x2.dtype)
    h = jax.lax.dot_general(
        xn, w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32)
    h = _gelu_f32(h).astype(x2.dtype)
    o = jax.lax.dot_general(
        h, w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2.astype(jnp.float32)
    return o.astype(x2.dtype)


def ln_mlp_supported(m: int, d: int, h: int, c_out: int) -> bool:
    if d % 8 or h % 8 or c_out % 8:
        return False
    if (d * h + h * c_out) * 2 > 10 * 1024 * 1024:
        return False
    return _pick_rows(m, 1024) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ln_mlp(x2, gamma, beta, w1, b1, w2, b2, eps: float):
    """``fc2(gelu(fc1(LN(x2))))`` — the MViT block MLP with its pre-LN.

    x2 ``[M, D]``; w1 ``[D, H]``; w2 ``[H, C]``; returns ``[M, C]``.
    The residual add stays outside (cheap elementwise in XLA).
    """
    return _ln_mlp_fwd(x2, gamma, beta, w1, b1, w2, b2, eps)[0]


def _ln_mlp_impl(x2, gamma, beta, w1, b1, w2, b2, eps):
    M, D = x2.shape
    H = w1.shape[1]
    C = w2.shape[1]
    # f32 hidden tile caps VMEM: TM * H * 4 <= ~2MB
    cap = max(8, (2_000_000 // (H * 4)) // 8 * 8)
    tm = _pick_rows(M, min(1024, cap))
    assert tm is not None, (M, H)
    kernel = functools.partial(_ln_mlp_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((tm, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (D * H + H * C),
            bytes_accessed=2 * M * (D + C) + (D * H + H * C) * 2,
            transcendentals=M * H,
        ),
        interpret=_fa.INTERPRET,
    )(x2, gamma.reshape(1, D), beta.reshape(1, D), w1, b1.reshape(1, H),
      w2, b2.reshape(1, C))


def _ln_mlp_fwd(x2, gamma, beta, w1, b1, w2, b2, eps):
    out = _ln_mlp_impl(x2, gamma, beta, w1, b1, w2, b2, eps)
    return out, (x2, gamma, beta, w1, b1, w2, b2)


def _ln_mlp_bwd(eps, res, g):
    x2, gamma, beta, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _ref_ln_mlp(*a, eps), x2, gamma, beta, w1, b1, w2, b2)
    return vjp(g)


fused_ln_mlp.defvjp(
    lambda x2, g, b, w1, b1, w2, b2, eps: _ln_mlp_fwd(
        x2, g, b, w1, b1, w2, b2, eps),
    _ln_mlp_bwd,
)
