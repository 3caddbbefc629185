"""Flash (streaming-softmax) attention Pallas kernel for pooled attention.

Why: XLA materializes MViT's attention logits ``[B, h, Lq, Lk]`` in f32 in
HBM with a layout hostile to the softmax reduction — profiled at 43 GB/s and
~80% of the whole forward pass at 448 crop (blocks 1/3/14). This kernel keeps
each logits tile in VMEM with a running max/sum (Dao et al. flash attention),
so HBM traffic drops from O(Lq*Lk) to O((Lq+Lk)*d).

Shape regime (MViT-B @448/@224): d = 96, Lk ∈ {392, 1568, 6272}; K and V for
one (batch, head) fit in VMEM entirely, so the kernel streams q tiles against
chunked K/V with f32 accumulation.

Non-goals: causal masking (MViT attention is full), cls-token handling
(callers fall back to the XLA path when a cls token makes lengths odd), and
a Pallas backward (training uses a recompute-based VJP in plain XLA; the
inference path is the perf-critical one).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# candidate tile sizes, multiples of 8 (f32 sublane); picked by divisibility
_Q_TILES = (512, 448, 392, 256, 196, 128, 98, 64, 56, 32, 16, 8)
_K_TILES = (1568, 1024, 784, 512, 392, 256, 196, 128, 98, 64, 56, 32, 16, 8)


def _pick_tile(length: int, candidates, cap: int) -> int | None:
    for t in candidates:
        if t <= cap and length % t == 0:
            return t
    return None


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, k_chunk: int):
    """One (g, q_tile) program: stream K/V chunks with running softmax."""
    q = q_ref[0].astype(jnp.float32)  # [TQ, d]
    Lk = k_ref.shape[1]
    num_k = Lk // k_chunk
    TQ = q.shape[0]
    d = q.shape[1]

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * k_chunk, k_chunk), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * k_chunk, k_chunk), :].astype(jnp.float32)
        # [TQ, TK]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((TQ, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((TQ, 1), jnp.float32)
    acc0 = jnp.zeros((TQ, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


# flipped by tests to run the kernel through the Pallas interpreter on CPU
INTERPRET = False

# trace-time escape hatch: model init (flax lazy_init) lowers the forward on
# the host CPU where Pallas can't lower; builders disable flash around init.
_DISABLED = False


class disabled:
    """Context manager: force the XLA attention path at trace time."""

    def __enter__(self):
        global _DISABLED
        self._prev = _DISABLED
        _DISABLED = True

    def __exit__(self, *exc):
        global _DISABLED
        _DISABLED = self._prev


def is_disabled() -> bool:
    return _DISABLED


def _flash_attention_fwd_impl(q, k, v, scale, q_tile, k_chunk):
    G, Lq, d = q.shape
    Lk = k.shape[1]
    grid = (G, Lq // q_tile)
    kernel = functools.partial(_flash_kernel, scale=scale, k_chunk=k_chunk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, d), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            # full K/V per g: block constant across i -> stays resident
            pl.BlockSpec((1, Lk, d), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, d), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, d), lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * G * Lq * Lk * d,
            bytes_accessed=2 * (G * Lq * d + 2 * G * Lk * d),
            transcendentals=G * Lq * Lk,
        ),
        interpret=INTERPRET,
    )(q, k, v)


def flash_attention_supported(Lq: int, Lk: int, d: int) -> bool:
    """Whether the kernel handles these lengths (tiles must divide)."""
    vmem_cap = 4 * 1024 * 1024  # leave room: K+V f32 copies + logits tile
    if 2 * Lk * d * 4 > 10 * 1024 * 1024:
        return False
    qt = _pick_tile(Lq, _Q_TILES, Lq)
    kt = _pick_tile(Lk, _K_TILES, Lk)
    return qt is not None and kt is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """Streaming-softmax attention.

    Args:
      q: ``[G, Lq, d]`` (G = batch*heads folded).
      k, v: ``[G, Lk, d]``.
      scale: logit scale (usually ``d ** -0.5``).

    Returns ``softmax(q @ k.T * scale) @ v`` in q's dtype.
    """
    return _flash_fwd(q, k, v, scale)[0]


def _flash_fwd(q, k, v, scale):
    G, Lq, d = q.shape
    Lk = k.shape[1]
    q_tile = _pick_tile(Lq, _Q_TILES, Lq)
    k_chunk = _pick_tile(Lk, _K_TILES, Lk)
    assert q_tile is not None and k_chunk is not None, (Lq, Lk)
    out = _flash_attention_fwd_impl(q, k, v, scale, q_tile, k_chunk)
    return out, (q, k, v)


def _flash_bwd(scale, res, g):
    """Recompute-based VJP in plain XLA (training path).

    Standard softmax-attention gradients with the logits recomputed; XLA may
    still materialize [Lq, Lk] here, which is acceptable for training (remat
    already bounds memory) — the inference path never takes this branch.
    """
    q, k, v = res
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    s = jnp.einsum("gqd,gkd->gqk", qf, kf) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("gqk,gqd->gkd", p, gf)
    dp = jnp.einsum("gqd,gkd->gqk", gf, vf)
    tmp = (dp * p).sum(axis=-1, keepdims=True)
    ds = p * (dp - tmp) * scale
    dq = jnp.einsum("gqk,gkd->gqd", ds, kf)
    dk = jnp.einsum("gqk,gqd->gkd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(lambda q, k, v, scale: _flash_fwd(q, k, v, scale),
                       _flash_bwd)


# --------------------------------------------------------- BLHD variant
# Heads stay folded in the channel dim ([B, L, h, d]) through the qkv
# projection and pooling; this kernel slices the head axis via the grid, so
# the model never materializes a head-major transpose.

def _flash_kernel_blhd(q_ref, k_ref, v_ref, o_ref, *, scale, k_chunk):
    q = q_ref[0, :, 0, :].astype(jnp.float32)  # [TQ, d]
    Lk = k_ref.shape[1]
    num_k = Lk // k_chunk
    TQ, d = q.shape

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * k_chunk, k_chunk), 0, :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * k_chunk, k_chunk), 0, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((TQ, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((TQ, 1), jnp.float32)
    acc0 = jnp.zeros((TQ, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    o_ref[0, :, 0, :] = (acc / l).astype(o_ref.dtype)


def _flash_blhd_impl(q, k, v, scale, q_tile, k_chunk):
    B, Lq, h, d = q.shape
    Lk = k.shape[1]
    grid = (B, h, Lq // q_tile)
    kernel = functools.partial(_flash_kernel_blhd, scale=scale,
                               k_chunk=k_chunk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, 1, d), lambda b, hh, i: (b, i, hh, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, 1, d), lambda b, hh, i: (b, 0, hh, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, 1, d), lambda b, hh, i: (b, 0, hh, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, 1, d),
                               lambda b, hh, i: (b, i, hh, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, h, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * h * Lq * Lk * d,
            bytes_accessed=2 * B * h * (Lq * d + 2 * Lk * d),
            transcendentals=B * h * Lq * Lk,
        ),
        interpret=INTERPRET,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_blhd(q, k, v, scale: float):
    """Flash attention over ``[B, L, h, d]`` tensors (head-interleaved
    channel layout) — no head-major transpose anywhere."""
    return _flash_blhd_fwd(q, k, v, scale)[0]


def _flash_blhd_fwd(q, k, v, scale):
    B, Lq, h, d = q.shape
    Lk = k.shape[1]
    q_tile = _pick_tile(Lq, _Q_TILES, Lq)
    k_chunk = _pick_tile(Lk, _K_TILES, Lk)
    assert q_tile is not None and k_chunk is not None, (Lq, Lk)
    return _flash_blhd_impl(q, k, v, scale, q_tile, k_chunk), (q, k, v)


def _flash_blhd_bwd(scale, res, g):
    q, k, v = res
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
    tmp = (dp * p).sum(axis=-1, keepdims=True)
    ds = p * (dp - tmp) * scale
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention_blhd.defvjp(
    lambda q, k, v, scale: _flash_blhd_fwd(q, k, v, scale),
    _flash_blhd_bwd,
)
