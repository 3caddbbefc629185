"""Fused (grouped) LayerNorm Pallas kernel.

Why: profiling the MViT-B 448 forward showed XLA's LayerNorm lowering —
a reduce over the channel (lane) axis — makes layout assignment prefer
L-minormost activations for every adjacent tensor, which forces ~25 ms/step
of pure layout copies against the attention kernel's C-minormost operands
and drags the MLP matmuls to 9-12 TFLOP/s. Implementing LN as a Pallas
kernel pins C-minormost operands/results (the Pallas default layout), so
the surrounding dots keep their natural layouts, and the normalize runs at
HBM bandwidth in one pass.

Supports *grouped* LN: the MViT attention-pool norms normalize per head
over head_dim with shared ``[d]`` params while tensors stay in the fused
``[B, L, h*d]`` channel layout (reference applies ``nn.LayerNorm(head_dim)``
to a head-major tensor, `attention.py:65,338` — identical math).

Forward and backward are both Pallas; dgamma/dbeta accumulate in a
revisited output block over the row-tile grid dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import flash_attention as _fa  # reuse INTERPRET/_DISABLED switches

# row-tile candidates: multiples of 8 (f32 sublane requirement)
_ROW_TILES = (1024, 896, 784, 512, 448, 392, 256, 224, 128, 112,
              64, 56, 32, 16, 8)


def _pick_rows(m: int, cap: int | None = None) -> int | None:
    for t in _ROW_TILES:
        if m % t == 0 and (cap is None or t <= cap):
            return t
    return None


def _bwd_rows(m: int, c: int) -> int | None:
    # the bwd kernel keeps ~24 bytes/element on the scoped VMEM stack
    # (double-buffered x/dy/dx blocks + two f32 copies); at C=768, tm=896
    # that measured 16.06 MB against the 16 MB limit — cap the row tile so
    # the stack stays near 12 MB
    return _pick_rows(m, max(8, 12_000_000 // (24 * c)))


def layer_norm_supported(x_shape, groups: int) -> bool:
    c = x_shape[-1]
    m = 1
    for s in x_shape[:-1]:
        m *= s
    return (
        c % groups == 0
        and (c // groups) % 8 == 0
        and _pick_rows(m) is not None
    )


def _ln_fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, eps, groups):
    x = x_ref[:].astype(jnp.float32)  # [TM, C]
    gam = g_ref[0].astype(jnp.float32)  # [dg]
    bet = b_ref[0].astype(jnp.float32)
    C = x.shape[-1]
    dg = C // groups
    for gi in range(groups):
        xs = x[:, gi * dg:(gi + 1) * dg]
        mu = jnp.mean(xs, axis=-1, keepdims=True)
        xc = xs - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps) * gam + bet
        o_ref[:, gi * dg:(gi + 1) * dg] = y.astype(o_ref.dtype)


def _ln_fwd_impl(x2, gamma, beta, eps, groups, tm):
    M, C = x2.shape
    kernel = functools.partial(_ln_fwd_kernel, eps=eps, groups=groups)
    dg = C // groups
    return pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((tm, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * M * C, bytes_accessed=4 * M * C, transcendentals=M,
        ),
        interpret=_fa.INTERPRET,
    )(x2, gamma.reshape(1, dg), beta.reshape(1, dg))


def _ln_bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *,
                   eps, groups):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    gam = g_ref[0].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    C = x.shape[-1]
    dg = C // groups

    @pl.when(i == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    for gi in range(groups):
        sl = slice(gi * dg, (gi + 1) * dg)
        xs = x[:, sl]
        dys = dy[:, sl]
        mu = jnp.mean(xs, axis=-1, keepdims=True)
        xc = xs - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = xc * rstd
        dyg = dys * gam
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
        dx = (dyg - m1 - xhat * m2) * rstd
        dx_ref[:, sl] = dx.astype(dx_ref.dtype)
        dg_ref[0, :] += jnp.sum(dys * xhat, axis=0)
        db_ref[0, :] += jnp.sum(dys, axis=0)


def _ln_bwd_impl(x2, gamma, dy2, eps, groups, tm):
    M, C = x2.shape
    dg = C // groups
    kernel = functools.partial(_ln_bwd_kernel, eps=eps, groups=groups)
    dx, dgam, dbet = pl.pallas_call(
        kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((tm, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, C), x2.dtype),
            jax.ShapeDtypeStruct((1, dg), jnp.float32),
            jax.ShapeDtypeStruct((1, dg), jnp.float32),
        ),
        interpret=_fa.INTERPRET,
    )(x2, gamma.reshape(1, dg), dy2)
    return dx, dgam.reshape(dg), dbet.reshape(dg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, gamma, beta, eps: float, groups: int = 1):
    """Grouped LayerNorm over the trailing axis.

    Args:
      x: ``[..., C]``; normalized per ``C // groups``-wide channel group.
      gamma, beta: ``[C // groups]`` scale/shift (shared across groups,
        matching the reference's per-head LN with shared params).
      eps: stabilizer inside the rsqrt.
      groups: number of channel groups (1 = plain LN; h = per-head).
    """
    return _fused_ln_fwd(x, gamma, beta, eps, groups)[0]


def _fused_ln_fwd(x, gamma, beta, eps, groups):
    shape = x.shape
    C = shape[-1]
    x2 = x.reshape(-1, C)
    tm = _pick_rows(x2.shape[0])
    assert tm is not None, x2.shape
    out = _ln_fwd_impl(x2, gamma, beta, eps, groups, tm)
    return out.reshape(shape), (x, gamma)


def _fused_ln_bwd(eps, groups, res, dy):
    x, gamma = res
    shape = x.shape
    C = shape[-1]
    x2 = x.reshape(-1, C)
    dy2 = dy.reshape(-1, C)
    tm = _bwd_rows(x2.shape[0], C)
    dx, dgam, dbet = _ln_bwd_impl(x2, gamma, dy2, eps, groups, tm)
    return (
        dx.reshape(shape),
        dgam.astype(gamma.dtype),
        dbet.astype(gamma.dtype),
    )


fused_layer_norm.defvjp(
    lambda x, g, b, eps, groups: _fused_ln_fwd(x, g, b, eps, groups),
    _fused_ln_bwd,
)
