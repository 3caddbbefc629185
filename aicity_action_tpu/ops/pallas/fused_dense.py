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


def _ln_qkv_bwd_kernel(x_ref, gq_ref, gk_ref, gv_ref, gam_ref, bet_ref,
                       w_ref, dx_ref, dwq_ref, dwk_ref, dwv_ref,
                       dbq_ref, dbk_ref, dbv_ref,
                       dgam_ref, dbet_ref, *, eps):
    """One row tile: recompute LN in VMEM, accumulate dW/db/dLN into
    constant-indexed f32 blocks across the sequential grid. dW is emitted
    as three separate [D, C] blocks (q/k/v): reading lane-misaligned
    ``w[:, j*C:(j+1)*C]`` slices is proven in the forward kernel, but
    accumulating into them is not — separate refs sidestep it."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dwq_ref[:] = jnp.zeros_like(dwq_ref[:])
        dwk_ref[:] = jnp.zeros_like(dwk_ref[:])
        dwv_ref[:] = jnp.zeros_like(dwv_ref[:])
        dbq_ref[:] = jnp.zeros_like(dbq_ref[:])
        dbk_ref[:] = jnp.zeros_like(dbk_ref[:])
        dbv_ref[:] = jnp.zeros_like(dbv_ref[:])
        dgam_ref[:] = jnp.zeros_like(dgam_ref[:])
        dbet_ref[:] = jnp.zeros_like(dbet_ref[:])

    dt = x_ref.dtype
    x = x_ref[:].astype(jnp.float32)
    gam = gam_ref[0].astype(jnp.float32)
    bet = bet_ref[0].astype(jnp.float32)
    C = gq_ref.shape[1]

    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    xn = (xhat * gam + bet).astype(dt)

    TQ, D = x.shape
    dxn = jnp.zeros((TQ, D), jnp.float32)
    for j, (g_ref, dw_ref, db_ref) in enumerate(
            ((gq_ref, dwq_ref, dbq_ref), (gk_ref, dwk_ref, dbk_ref),
             (gv_ref, dwv_ref, dbv_ref))):
        gj = g_ref[:]
        w_j = w_ref[:, j * C:(j + 1) * C]
        db_ref[:] += gj.astype(jnp.float32).sum(axis=0, keepdims=True)
        dw_ref[:] += jax.lax.dot_general(
            xn, gj, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxn = dxn + jax.lax.dot_general(
            gj, w_j, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    dgam_ref[:] += (dxn * xhat).sum(axis=0, keepdims=True)
    dbet_ref[:] += dxn.sum(axis=0, keepdims=True)
    dxhat = dxn * gam
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def ln_qkv_bwd_supported(m: int, d: int, c3: int) -> bool:
    if 6 * d * c3 > 11 * 1024 * 1024:
        return False
    cap = max(8, (2_500_000 // (max(d, c3) * 4)) // 8 * 8)
    return _pick_rows(m, min(1024, cap)) is not None


def _ln_qkv_bwd_impl(x2, gamma, beta, w, g, eps):
    M, D = x2.shape
    C3 = w.shape[1]
    C = C3 // 3
    cap = max(8, (2_500_000 // (max(D, C3) * 4)) // 8 * 8)
    tm = _pick_rows(M, min(1024, cap))
    assert tm is not None, (M, D, C3)
    row = pl.BlockSpec((tm, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((tm, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    dx, dwq, dwk, dwv, dbq, dbk, dbv, dgam, dbet = pl.pallas_call(
        functools.partial(_ln_qkv_bwd_kernel, eps=eps),
        grid=(M // tm,),
        in_specs=[row, gspec, gspec, gspec, vec(D), vec(D), const(D, C3)],
        out_specs=(row, const(D, C), const(D, C), const(D, C),
                   vec(C), vec(C), vec(C), vec(D), vec(D)),
        out_shape=(
            jax.ShapeDtypeStruct((M, D), x2.dtype),
            jax.ShapeDtypeStruct((D, C), jnp.float32),
            jax.ShapeDtypeStruct((D, C), jnp.float32),
            jax.ShapeDtypeStruct((D, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * M * D * C3,
            bytes_accessed=2 * M * (2 * D + C3) + D * C3 * 6,
            transcendentals=M,
        ),
        interpret=_fa.INTERPRET,
    )(x2, g[0], g[1], g[2], gamma.reshape(1, D), beta.reshape(1, D), w)
    dw = jnp.concatenate([dwq, dwk, dwv], axis=1)
    db = jnp.concatenate([dbq, dbk, dbv], axis=1)
    return (dx, dgam.reshape(D).astype(gamma.dtype),
            dbet.reshape(D).astype(beta.dtype), dw.astype(w.dtype),
            db.reshape(C3))


def _ln_qkv_bwd(eps, res, g):
    x2, gamma, beta, w, bias = res
    M, D = x2.shape
    C3 = w.shape[1]
    if not _fa.is_disabled() and ln_qkv_bwd_supported(M, D, C3):
        dx, dgam, dbet, dw, db = _ln_qkv_bwd_impl(
            x2, gamma, beta, w, g, eps)
        if bias is None:
            return dx, dgam, dbet, dw, None
        return dx, dgam, dbet, dw, db.astype(bias.dtype)
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


def _gelu_grad_f32(x):
    # d/dx [0.5 x (1 + erf(x/sqrt(2)))] = 0.5 (1 + erf(x/sqrt(2))) + x phi(x)
    inv_sqrt2 = 2.0 ** -0.5
    phi = jnp.exp(-0.5 * x * x) * 0.3989422804014327  # 1/sqrt(2*pi)
    return 0.5 * (1.0 + _erf_f32(x * inv_sqrt2)) + x * phi


def _ln_mlp_bwd_kernel(x_ref, g_ref, gam_ref, bet_ref, w1_ref, b1_ref,
                       w2_ref, dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref,
                       dgam_ref, dbet_ref, *, eps):
    """One row tile: recompute the forward in VMEM (remat-style — the fwd
    saves only x2/params), then accumulate dW/db/dLN into constant-indexed
    f32 output blocks across the sequential grid."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref[:])
        dw2_ref[:] = jnp.zeros_like(dw2_ref[:])
        db1_ref[:] = jnp.zeros_like(db1_ref[:])
        db2_ref[:] = jnp.zeros_like(db2_ref[:])
        dgam_ref[:] = jnp.zeros_like(dgam_ref[:])
        dbet_ref[:] = jnp.zeros_like(dbet_ref[:])

    dt = x_ref.dtype
    x = x_ref[:].astype(jnp.float32)
    gam = gam_ref[0].astype(jnp.float32)
    bet = bet_ref[0].astype(jnp.float32)
    D = x.shape[1]

    # --- recompute forward (same cast discipline as _ln_mlp_kernel)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    xn = (xhat * gam + bet).astype(dt)
    h_pre = jax.lax.dot_general(
        xn, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    h = _gelu_f32(h_pre).astype(dt)

    # --- backward
    g_out = g_ref[:]
    gf = g_out.astype(jnp.float32)
    db2_ref[:] += gf.sum(axis=0, keepdims=True)
    dw2_ref[:] += jax.lax.dot_general(
        h, g_out, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(
        g_out, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_pre = dh * _gelu_grad_f32(h_pre)
    db1_ref[:] += dh_pre.sum(axis=0, keepdims=True)
    dhp = dh_pre.astype(dt)
    dw1_ref[:] += jax.lax.dot_general(
        xn, dhp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dxn = jax.lax.dot_general(
        dhp, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dgam_ref[:] += (dxn * xhat).sum(axis=0, keepdims=True)
    dbet_ref[:] += dxn.sum(axis=0, keepdims=True)
    dxhat = dxn * gam
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def ln_mlp_bwd_supported(m: int, d: int, h: int, c_out: int) -> bool:
    # weights bf16 + dw f32 accumulators must both sit in VMEM
    if 6 * (d * h + h * c_out) > 11 * 1024 * 1024:
        return False
    cap = max(8, (2_500_000 // (h * 8)) // 8 * 8)
    return _pick_rows(m, min(1024, cap)) is not None


def _ln_mlp_bwd_impl(x2, gamma, beta, w1, b1, w2, g, eps):
    M, D = x2.shape
    H = w1.shape[1]
    C = w2.shape[1]
    # two f32 [tm, H] hidden tiles (h_pre, dh) cap the row tile
    cap = max(8, (2_500_000 // (H * 8)) // 8 * 8)
    tm = _pick_rows(M, min(1024, cap))
    assert tm is not None, (M, H)
    row = pl.BlockSpec((tm, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    dx, dw1, dw2, db1, db2, dgam, dbet = pl.pallas_call(
        functools.partial(_ln_mlp_bwd_kernel, eps=eps),
        grid=(M // tm,),
        in_specs=[
            row,
            pl.BlockSpec((tm, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec(D), vec(D), const(D, H), vec(H), const(H, C),
        ],
        out_specs=(row, const(D, H), const(H, C), vec(H), vec(C),
                   vec(D), vec(D)),
        out_shape=(
            jax.ShapeDtypeStruct((M, D), x2.dtype),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((H, C), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * M * (D * H + H * C),
            bytes_accessed=2 * M * (2 * D + C) + (D * H + H * C) * 6,
            transcendentals=2 * M * H,
        ),
        interpret=_fa.INTERPRET,
    )(x2, g, gamma.reshape(1, D), beta.reshape(1, D), w1,
      b1.reshape(1, H), w2)
    wdt = w1.dtype
    return (dx, dgam.reshape(D).astype(gamma.dtype),
            dbet.reshape(D).astype(beta.dtype), dw1.astype(wdt),
            db1.reshape(H).astype(b1.dtype), dw2.astype(w2.dtype),
            db2.reshape(C).astype(w2.dtype))


def _ln_mlp_bwd_hsplit_kernel(x_ref, g_ref, gam_ref, bet_ref, w1_ref,
                              b1_ref, w2_ref, dxnp_ref, dw1_ref,
                              dw2_ref, db1_ref, db2_ref, *, eps):
    """H-sliced variant for blocks whose full weight set busts VMEM
    (D=768/H=3072: 6·(D·H+H·C) ≈ 28 MB vs the ~12 MB budget).

    Grid is ``(n_h, n_m)`` — h slow, m fast — so each h-slice's dW/db
    blocks stay VMEM-resident across the whole m sweep and are written to
    HBM once per slice. ``dxn`` contributions are emitted as per-slice f32
    partials ``[n_h, M, D]`` (each block written exactly once — no output
    revisiting); the LN backward runs in a cheap XLA epilogue over their
    sum. At this stage's small q-pooled M the partials are ~80 MB of HBM
    traffic — noise next to the matmul time."""
    h = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref[:])
        dw2_ref[:] = jnp.zeros_like(dw2_ref[:])
        db1_ref[:] = jnp.zeros_like(db1_ref[:])

    @pl.when(jnp.logical_and(h == 0, i == 0))
    def _():
        db2_ref[:] = jnp.zeros_like(db2_ref[:])

    dt = x_ref.dtype
    x = x_ref[:].astype(jnp.float32)
    gam = gam_ref[0].astype(jnp.float32)
    bet = bet_ref[0].astype(jnp.float32)

    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    xn = (xhat * gam + bet).astype(dt)

    h_pre = jax.lax.dot_general(
        xn, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    hact = _gelu_f32(h_pre).astype(dt)

    g_out = g_ref[:]
    gf = g_out.astype(jnp.float32)

    @pl.when(h == 0)
    def _():
        db2_ref[:] += gf.sum(axis=0, keepdims=True)

    dw2_ref[:] += jax.lax.dot_general(
        hact, g_out, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(
        g_out, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_pre = dh * _gelu_grad_f32(h_pre)
    db1_ref[:] += dh_pre.sum(axis=0, keepdims=True)
    dhp = dh_pre.astype(dt)
    dw1_ref[:] += jax.lax.dot_general(
        xn, dhp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dxnp_ref[0] = jax.lax.dot_general(
        dhp, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _hsplit_plan(m: int, d: int, h: int, c_out: int):
    """Pick (h_slice, row_tile) so bf16 weights + f32 accumulators for one
    slice plus the row tiles fit a ~10 MB scoped-VMEM stack. Returns None
    when no layout fits."""
    for hs in (1024, 768, 512, 384, 256):
        if h % hs:
            continue
        if 6 * (d * hs + hs * c_out) > 7 * 1024 * 1024:
            continue
        # row tiles: two f32 [tm, hs] (h_pre, dh) + f32 dxn [tm, d]
        cap = max(8, (2_500_000 // ((2 * hs + d) * 4)) // 8 * 8)
        tm = _pick_rows(m, min(1024, cap))
        if tm is not None:
            return hs, tm
    return None


def ln_mlp_bwd_hsplit_supported(m: int, d: int, h: int, c_out: int) -> bool:
    return _hsplit_plan(m, d, h, c_out) is not None


def _ln_mlp_bwd_hsplit_impl(x2, gamma, beta, w1, b1, w2, g, eps):
    M, D = x2.shape
    H = w1.shape[1]
    C = w2.shape[1]
    hs, tm = _hsplit_plan(M, D, H, C)
    n_h = H // hs
    row = pl.BlockSpec((tm, D), lambda h, i: (i, 0), memory_space=pltpu.VMEM)
    grow = pl.BlockSpec((tm, C), lambda h, i: (i, 0),
                        memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda h, i: (0, 0),
                                 memory_space=pltpu.VMEM)
    hvec = lambda n: pl.BlockSpec((1, n), lambda h, i: (0, h),
                                  memory_space=pltpu.VMEM)
    dxnp, dw1, dw2, db1, db2 = pl.pallas_call(
        functools.partial(_ln_mlp_bwd_hsplit_kernel, eps=eps),
        grid=(n_h, M // tm),
        in_specs=[
            row, grow, vec(D), vec(D),
            pl.BlockSpec((D, hs), lambda h, i: (0, h),
                         memory_space=pltpu.VMEM),
            hvec(hs),
            pl.BlockSpec((hs, C), lambda h, i: (h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, D), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, hs), lambda h, i: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hs, C), lambda h, i: (h, 0),
                         memory_space=pltpu.VMEM),
            hvec(hs), vec(C),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_h, M, D), jnp.float32),  # dxn partials
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((H, C), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * M * (D * H + H * C),
            bytes_accessed=2 * M * (2 * D + C) * n_h + (D * H + H * C) * 6,
            transcendentals=2 * M * H,
        ),
        interpret=_fa.INTERPRET,
    )(x2, g, gamma.reshape(1, D), beta.reshape(1, D), w1,
      b1.reshape(1, H), w2)

    # LN backward epilogue (XLA): elementwise + row means over [M, D]
    dxn = dxnp.sum(axis=0)
    xf = x2.astype(jnp.float32)
    gam = gamma.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    dgam = (dxn * xhat).sum(axis=0)
    dbet = dxn.sum(axis=0)
    dxhat = dxn * gam
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x2.dtype)

    wdt = w1.dtype
    return (dx, dgam.astype(gamma.dtype),
            dbet.astype(beta.dtype), dw1.astype(wdt),
            db1.reshape(H).astype(b1.dtype), dw2.astype(w2.dtype),
            db2.reshape(C).astype(w2.dtype))


def _ln_mlp_bwd(eps, res, g):
    x2, gamma, beta, w1, b1, w2, b2 = res
    M, D = x2.shape
    H = w1.shape[1]
    C = w2.shape[1]
    if not _fa.is_disabled():
        if ln_mlp_bwd_supported(M, D, H, C):
            db2_dt = b2.dtype
            out = _ln_mlp_bwd_impl(x2, gamma, beta, w1, b1, w2, g, eps)
            dx, dgam, dbet, dw1, db1, dw2, db2 = out
            return dx, dgam, dbet, dw1, db1, dw2, db2.astype(db2_dt)
        if ln_mlp_bwd_hsplit_supported(M, D, H, C):
            db2_dt = b2.dtype
            out = _ln_mlp_bwd_hsplit_impl(x2, gamma, beta, w1, b1, w2, g,
                                          eps)
            dx, dgam, dbet, dw1, db1, dw2, db2 = out
            return dx, dgam, dbet, dw1, db1, dw2, db2.astype(db2_dt)
    _, vjp = jax.vjp(
        lambda *a: _ref_ln_mlp(*a, eps), x2, gamma, beta, w1, b1, w2, b2)
    return vjp(g)


fused_ln_mlp.defvjp(
    lambda x2, g, b, w1, b1, w2, b2, eps: _ln_mlp_fwd(
        x2, g, b, w1, b1, w2, b2, eps),
    _ln_mlp_bwd,
)
