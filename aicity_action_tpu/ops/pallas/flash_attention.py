"""Flash (streaming-softmax) attention Pallas kernel for pooled attention.

Why: XLA materializes MViT's attention logits ``[B, h, Lq, Lk]`` in f32 in
HBM with a layout hostile to the softmax reduction — profiled at 43 GB/s and
~80% of the whole forward pass at 448 crop (blocks 1/3/14). This kernel keeps
each logits tile in VMEM with a running max/sum (Dao et al. flash attention),
so HBM traffic drops from O(Lq*Lk) to O((Lq+Lk)*d).

Shape regime (MViT-B @448/@224): d = 96, Lk ∈ {392, 1568, 6272}; K and V for
one (batch, head) fit in VMEM entirely, so the kernel streams q tiles against
chunked K/V with f32 accumulation.

The backward is also Pallas (standard flash backward: forward saves the
per-row logsumexp; dq tiles over q, dk/dv tile over k with q streamed
through the grid) — the XLA-materialized VJP was ~100x slower on the
training step.

Non-goals: causal masking (MViT attention is full) and cls-token handling
(callers fall back to the XLA path when a cls token makes lengths odd).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Mosaic checks the kernel's scoped-VMEM stack against a conservative 16 MB
# default; v5e cores have 128 MB of VMEM and the fused-LN kernels' resident
# K/V + kn/vn scratch legitimately need more (the round-3 driver bench OOMed
# at 16.11 MB on the Lq=25088/Lk=6272 fused-LN forward). Raise the check —
# actual usage is still bounded by the tile budgets below.
_SCOPED_VMEM_LIMIT = 64 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_SCOPED_VMEM_LIMIT)

# statically unroll k-chunk loops up to this many chunks (fori_loop carries
# are physically copied each iteration in Mosaic; measured +24% at num_k=4)
_UNROLL_MAX = 8

# candidate tile sizes, multiples of 8 (f32 sublane); picked by divisibility
_Q_TILES = (1024, 512, 448, 392, 256, 196, 128, 98, 64, 56, 32, 16, 8)
_K_TILES = (1568, 1024, 784, 512, 392, 256, 196, 128, 98, 64, 56, 32, 16, 8)


def _pick_tile(length: int, candidates, cap: int) -> int | None:
    # Mosaic block rule: the second-minor block dim must be 8-divisible OR
    # equal the full array dim; non-x8 candidates (196, 98) are only legal
    # when they cover the whole axis.
    for t in candidates:
        if t <= cap and length % t == 0 and (t % 8 == 0 or t == length):
            return t
    return None


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, k_chunk: int,
                  kv_valid: int | None = None):
    """One (g, q_tile) program: stream K/V chunks with running softmax.

    ``kv_valid``: number of REAL keys when K/V are zero-padded to a tile
    multiple (cls-token layouts); padded columns are masked to -inf before
    the max so they contribute nothing to the softmax."""
    # fold the scale into q (one [TQ, d] pass); operands stay in the input
    # dtype (bf16 in production) feeding the MXU with f32 accumulation —
    # materialized f32 copies of K/V chunks blew the scoped-VMEM stack once
    # the chunk loop was unrolled
    dt = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale, dt)  # [TQ, d]
    Lk = k_ref.shape[1]
    num_k = Lk // k_chunk
    TQ = q.shape[0]
    d = q.shape[1]

    if num_k == 1:
        # single K/V chunk: plain softmax, no running-max rescale carries
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if kv_valid is not None and kv_valid < Lk:
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, Lk), 1)
            s = jnp.where(cols < kv_valid, s, _NEG_INF)
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = p.sum(axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(dt), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (acc / l).astype(o_ref.dtype)
        return

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * k_chunk, k_chunk), :]
        v = v_ref[0, pl.ds(j * k_chunk, k_chunk), :]
        # [TQ, TK]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if kv_valid is not None and kv_valid < Lk:
            cols = (j * k_chunk
                    + jax.lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1))
            s = jnp.where(cols < kv_valid, s, _NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(dt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((TQ, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((TQ, 1), jnp.float32)
    acc0 = jnp.zeros((TQ, d), jnp.float32)
    if num_k <= _UNROLL_MAX:
        # static unroll: Mosaic copies fori_loop carries every iteration
        # (measured +24% from unrolling at num_k=4)
        carry = (m0, l0, acc0)
        for j in range(num_k):
            carry = body(j, carry)
        m, l, acc = carry
    else:
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


def _flash_attention_fwd_impl(q, k, v, scale, q_tile, k_chunk,
                              kv_valid=None):
    G, Lq, d = q.shape
    Lk = k.shape[1]
    grid = (G, Lq // q_tile)
    kernel = functools.partial(_flash_kernel, scale=scale, k_chunk=k_chunk,
                               kv_valid=kv_valid)
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
        compiler_params=_COMPILER_PARAMS,
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


def _try_tiles_for(Lq, Lk, budget):
    """(q_tile, k_chunk) pick that returns None when no legal tile exists
    (``_tiles_for`` asserts) — used by the ``*_supported`` predicates so
    callers fall back to the unfused path instead of failing at trace."""
    k_chunk = _pick_tile(Lk, _K_TILES, Lk)
    if k_chunk is None:
        return None
    q_tile = _pick_tile(Lq, _Q_TILES,
                        max(8, (budget // (4 * k_chunk)) // 8 * 8))
    if q_tile is None:
        return None
    return q_tile, k_chunk


def _tiles_for(Lq, Lk, budget=3_000_000):
    """Joint (q_tile, k_chunk) pick. With the k-chunk loop statically
    unrolled, several 1568-wide chunks beat one huge chunk (measured
    6.34 vs 6.61 ms on the Lk=6272 block); the f32 logits tile
    q_tile*k_chunk*4 stays under ``budget`` bytes of the 16 MB scoped VMEM
    (tighter for the lse-saving forward, which carries extra blocks).
    NOTE: unrolled chunk loops keep more temporaries live on the scoped
    VMEM stack — a 6.5 MB budget OOMed at q_tile=1024."""
    k_chunk = _pick_tile(Lk, _K_TILES, Lk)
    q_cap = max(8, (budget // (4 * k_chunk)) // 8 * 8)
    q_tile = _pick_tile(Lq, _Q_TILES, q_cap)
    assert q_tile is not None and k_chunk is not None, (Lq, Lk)
    return q_tile, k_chunk


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """Streaming-softmax attention.

    Args:
      q: ``[G, Lq, d]`` (G = batch*heads folded).
      k, v: ``[G, Lk, d]``.
      scale: logit scale (usually ``d ** -0.5``).

    Returns ``softmax(q @ k.T * scale) @ v`` in q's dtype.
    """
    q_tile, k_chunk = _tiles_for(q.shape[1], k.shape[1])
    return _flash_attention_fwd_impl(q, k, v, scale, q_tile, k_chunk)


def _flash_fwd(q, k, v, scale):
    """Forward rule under AD: also saves the per-row logsumexp."""
    q_tile, k_chunk = _tiles_for(q.shape[1], k.shape[1], budget=2_500_000)
    out, lse = _flash_fwd_with_lse(q, k, v, scale, q_tile, k_chunk)
    return out, (q, k, v, out, lse)


# ------------------------------------------------------------- backward
# Standard flash backward (Dao et al.): the forward additionally returns the
# per-row logsumexp; the backward recomputes probability tiles in VMEM.
# dq kernel tiles over q; dk/dv kernel tiles over k. Without this, the VJP
# would materialize the [Lq, Lk] logits in XLA — profiled at ~100x slower
# on the training step.

def _flash_fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                          scale, k_chunk, kv_valid=None):
    # same operand discipline as _flash_kernel: input-dtype (bf16) operands
    # into the MXU, f32 accumulation, scale folded into q — the bwd kernels
    # fold identically so their recomputed logits match this lse
    dt = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale, dt)
    Lk = k_ref.shape[1]
    num_k = Lk // k_chunk
    TQ, d = q.shape

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * k_chunk, k_chunk), :]
        v = v_ref[0, pl.ds(j * k_chunk, k_chunk), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if kv_valid is not None and kv_valid < Lk:
            cols = (j * k_chunk
                    + jax.lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1))
            s = jnp.where(cols < kv_valid, s, _NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(dt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((TQ, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((TQ, 1), jnp.float32)
    acc0 = jnp.zeros((TQ, d), jnp.float32)
    if num_k <= _UNROLL_MAX:
        carry = (m0, l0, acc0)
        for j in range(num_k):
            carry = body(j, carry)
        m, l, acc = carry
    else:
        m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0, 0] = (m + jnp.log(l))[:, 0]


def _flash_fwd_with_lse(q, k, v, scale, q_tile, k_chunk, kv_valid=None):
    G, Lq, d = q.shape
    Lk = k.shape[1]
    kernel = functools.partial(_flash_fwd_lse_kernel, scale=scale,
                               k_chunk=k_chunk, kv_valid=kv_valid)
    return pl.pallas_call(
        kernel,
        grid=(G, Lq // q_tile),
        in_specs=[
            pl.BlockSpec((1, q_tile, d), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, d), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, d), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, q_tile, d), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, q_tile), lambda g, i: (g, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lq, d), q.dtype),
            # lse tiled [G, nq, 1, TQ]: the trailing (1, TQ) block equals the
            # array dims, satisfying Mosaic's (8, 128)-or-full block rule for
            # any q tile size
            jax.ShapeDtypeStruct((G, Lq // q_tile, 1, q_tile), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(q, k, v)


def _flash_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref,
                     *, scale, k_chunk):
    # both logit scales fold into the small [*, d] operands (q for s, k for
    # the dq dot); operands stay in the input dtype for the MXU with f32
    # accumulation (materialized f32 K/V copies OOM the scoped VMEM stack
    # under unrolling)
    dt = q_ref.dtype
    q = q_ref[0] * jnp.asarray(scale, dt)
    g = g_ref[0]
    lse = lse_ref[0, 0, 0][:, None]
    delta = delta_ref[0, 0, 0][:, None]
    Lk = k_ref.shape[1]
    num_k = Lk // k_chunk
    TQ, d = q.shape

    def body(j, dq):
        k = k_ref[0, pl.ds(j * k_chunk, k_chunk), :]
        v = v_ref[0, pl.ds(j * k_chunk, k_chunk), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(dt)
        return dq + jax.lax.dot_general(
            ds, k * jnp.asarray(scale, dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jnp.zeros((TQ, d), jnp.float32)
    if num_k <= _UNROLL_MAX:
        for j in range(num_k):
            dq = body(j, dq)
    else:
        dq = jax.lax.fori_loop(0, num_k, body, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                      dk_ref, dv_ref, *, scale):
    """Grid (G, k_tiles, q_chunks): the q axis streams through the grid's
    innermost dim while the dk/dv output block (constant over it) stays
    resident in VMEM and accumulates in f32."""
    i = pl.program_id(2)
    dt = q_ref.dtype
    k = k_ref[0]
    v = v_ref[0]
    # q*scale serves both the logits (s = q_s k^T) and the dk dot
    # (dk = ds^T (scale*q)); operands stay input-dtype for the MXU
    q = q_ref[0] * jnp.asarray(scale, dt)
    g = g_ref[0]
    lse = lse_ref[0, 0, 0][:, None]
    delta = delta_ref[0, 0, 0][:, None]

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse)  # [q_chunk, TK]
    dv_ref[0] += jax.lax.dot_general(
        p.astype(dt), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(dt)
    dk_ref[0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _flash_dqkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                       dq_ref, dk_ref, dv_ref, *, scale):
    """Merged backward for the whole-K/V-in-VMEM regime (every pooled-KV
    MViT shape: Lk <= 1568). Grid (G, q_tiles): dq is written per step
    while dk/dv accumulate in resident f32 output blocks — the logits
    matmul and softmax recompute happen ONCE per (q, k) pair instead of
    once in each of the split dq / dkv kernels (5 MXU dots per pair
    instead of 7, one exp instead of two)."""
    i = pl.program_id(1)
    dt = q_ref.dtype
    k = k_ref[0]
    v = v_ref[0]
    # q*scale serves the logits AND the dk dot; k*scale serves the dq dot
    # (d s/d q = scale*k, d s/d k = scale*q)
    q = q_ref[0] * jnp.asarray(scale, dt)
    g = g_ref[0]
    lse = lse_ref[0, 0, 0][:, None]
    delta = delta_ref[0, 0, 0][:, None]

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse)
    dv_ref[0] += jax.lax.dot_general(
        p.astype(dt), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(dt)
    dk_ref[0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ref[0] = jax.lax.dot_general(
        ds, k * jnp.asarray(scale, dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)


def _flash_dqkv_chunked_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref,
                               delta_ref, dqp_ref, dk_ref, dv_ref, *, scale):
    """K-chunked merged backward for shapes whose whole K/V does NOT fit
    VMEM (Lk = 6272 stage-2/3 blocks at 448). Grid (G, k_tiles, q_tiles),
    q innermost: dk/dv accumulate in resident f32 blocks per (g, k) while
    dq is emitted as per-k-chunk f32 PARTIALS ``[G, nk, Lq, d]`` summed by
    XLA afterwards — that extra HBM round-trip (~0.9 ms at the 448 shapes)
    buys the merged kernel's 5-dots/1-exp per (q, k) pair vs the split
    kernels' 7-dots/2-exp."""
    i = pl.program_id(2)
    dt = q_ref.dtype
    k = k_ref[0]
    v = v_ref[0]
    q = q_ref[0] * jnp.asarray(scale, dt)
    g = g_ref[0]
    lse = lse_ref[0, 0, 0][:, None]
    delta = delta_ref[0, 0, 0][:, None]

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse)
    dv_ref[0] += jax.lax.dot_general(
        p.astype(dt), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(dt)
    dk_ref[0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dqp_ref[0, 0] = jax.lax.dot_general(
        ds, k * jnp.asarray(scale, dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# independent VMEM budgets for the backward kernels' f32 logits tiles —
# the fwd's lse arrives tiled by the FORWARD's q tile, but flattening
# [G, nq, 1, TQ] -> [G, Lq] is a layout-preserving (free) reshape, so the
# backward re-tiles lse/delta to its own choice
_BWD_DQ_BUDGET = 3_300_000
_BWD_DKV_BUDGET = 3_300_000
# merged-kernel: two f32 [q_tile, Lk] buffers (p and dp) live at once
_BWD_FUSED_BUDGET = 3_300_000
# resident K/V (input dtype) + f32 dk/dv accumulator blocks
_BWD_KV_RESIDENT_CAP = 4 * 1024 * 1024
# bound the dq-partials HBM round-trip of the chunked merged kernel
_BWD_CHUNKED_MAX_NK = 8


def _bwd_fused_tile(Lq, Lk, d, dtype_bytes=2):
    """q tile for the merged dq/dk/dv kernel, or None if K/V + accumulators
    don't comfortably fit in VMEM."""
    kv_resident = 2 * Lk * d * dtype_bytes + 2 * Lk * d * 4
    if kv_resident > _BWD_KV_RESIDENT_CAP:
        return None
    q_cap = max(8, (_BWD_FUSED_BUDGET // (4 * Lk)) // 8 * 8)
    return _pick_tile(Lq, _Q_TILES, q_cap)


def _bwd_chunked_tiles(Lq, Lk, d, dtype_bytes=2):
    """(k_tile, q_tile) for the k-chunked merged kernel, or None."""
    kt_cap = _BWD_KV_RESIDENT_CAP // (2 * d * (dtype_bytes + 4))
    kt = _pick_tile(Lk, _K_TILES, kt_cap)
    if kt is None or Lk // kt > _BWD_CHUNKED_MAX_NK:
        return None
    qt = _pick_tile(Lq, _Q_TILES,
                    max(8, (_BWD_FUSED_BUDGET // (4 * kt)) // 8 * 8))
    if qt is None:
        return None
    return kt, qt


def _bwd_dq_tiles(Lq, Lk):
    return _tiles_for(Lq, Lk, budget=_BWD_DQ_BUDGET)


def _bwd_dkv_tiles(Lq, Lk):
    k_tile = _pick_tile(Lk, _K_TILES, Lk)
    q_cap = max(8, (_BWD_DKV_BUDGET // (4 * k_tile)) // 8 * 8)
    q_chunk = _pick_tile(Lq, _Q_TILES, q_cap)
    assert k_tile is not None and q_chunk is not None, (Lq, Lk)
    return k_tile, q_chunk


def _flash_bwd(scale, res, g):
    q, k, v, out, lse = res
    G, Lq, d = q.shape
    Lk = k.shape[1]
    # delta = rowsum(dO * O), precomputed in XLA (cheap elementwise)
    delta_flat = (g.astype(jnp.float32) * out.astype(jnp.float32)).sum(-1)
    lse_flat = lse.reshape(G, Lq)

    qt = _bwd_fused_tile(Lq, Lk, d)
    if qt is not None:
        lse_t = lse_flat.reshape(G, Lq // qt, 1, qt)
        delta_t = delta_flat.reshape(G, Lq // qt, 1, qt)
        full_kv = pl.BlockSpec((1, Lk, d), lambda gg, i: (gg, 0, 0),
                               memory_space=pltpu.VMEM)
        per_q = pl.BlockSpec((1, qt, d), lambda gg, i: (gg, i, 0),
                             memory_space=pltpu.VMEM)
        per_row = pl.BlockSpec((1, 1, 1, qt), lambda gg, i: (gg, i, 0, 0),
                               memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_flash_dqkv_kernel, scale=scale),
            grid=(G, Lq // qt),
            in_specs=[per_q, full_kv, full_kv, per_q, per_row, per_row],
            out_specs=(per_q, full_kv, full_kv),
            out_shape=(
                jax.ShapeDtypeStruct((G, Lq, d), q.dtype),
                jax.ShapeDtypeStruct((G, Lk, d), jnp.float32),
                jax.ShapeDtypeStruct((G, Lk, d), jnp.float32),
            ),
            compiler_params=_COMPILER_PARAMS,
            interpret=INTERPRET,
        )(q, k, v, g, lse_t, delta_t)
        return dq, dk.astype(k.dtype), dv.astype(v.dtype)

    chunked = _bwd_chunked_tiles(Lq, Lk, d)
    if chunked is not None:
        kt, qt = chunked
        nk = Lk // kt
        lse_t = lse_flat.reshape(G, Lq // qt, 1, qt)
        delta_t = delta_flat.reshape(G, Lq // qt, 1, qt)
        per_kv = pl.BlockSpec((1, kt, d), lambda gg, j, i: (gg, j, 0),
                              memory_space=pltpu.VMEM)
        per_q = pl.BlockSpec((1, qt, d), lambda gg, j, i: (gg, i, 0),
                             memory_space=pltpu.VMEM)
        per_row = pl.BlockSpec((1, 1, 1, qt), lambda gg, j, i: (gg, i, 0, 0),
                               memory_space=pltpu.VMEM)
        dqp, dk, dv = pl.pallas_call(
            functools.partial(_flash_dqkv_chunked_kernel, scale=scale),
            grid=(G, nk, Lq // qt),
            in_specs=[per_q, per_kv, per_kv, per_q, per_row, per_row],
            out_specs=(
                pl.BlockSpec((1, 1, qt, d), lambda gg, j, i: (gg, j, i, 0),
                             memory_space=pltpu.VMEM),
                per_kv, per_kv,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((G, nk, Lq, d), jnp.float32),
                jax.ShapeDtypeStruct((G, Lk, d), jnp.float32),
                jax.ShapeDtypeStruct((G, Lk, d), jnp.float32),
            ),
            compiler_params=_COMPILER_PARAMS,
            interpret=INTERPRET,
        )(q, k, v, g, lse_t, delta_t)
        dq = dqp.sum(axis=1).astype(q.dtype)
        return dq, dk.astype(k.dtype), dv.astype(v.dtype)

    q_tile, k_chunk = _bwd_dq_tiles(Lq, Lk)
    delta = delta_flat.reshape(G, Lq // q_tile, 1, q_tile)
    lse = lse_flat.reshape(G, Lq // q_tile, 1, q_tile)

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale, k_chunk=k_chunk),
        grid=(G, Lq // q_tile),
        in_specs=[
            pl.BlockSpec((1, q_tile, d), lambda gg, i: (gg, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, d), lambda gg, i: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, d), lambda gg, i: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, d), lambda gg, i: (gg, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, q_tile), lambda gg, i: (gg, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, q_tile), lambda gg, i: (gg, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, d), lambda gg, i: (gg, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Lq, d), q.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(q, k, v, g, lse, delta)

    # dk/dv: tile over k, stream q chunks through the innermost grid dim
    k_tile, q_chunk = _bwd_dkv_tiles(Lq, Lk)
    lse_kv = lse_flat.reshape(G, Lq // q_chunk, 1, q_chunk)
    delta_kv = delta_flat.reshape(G, Lq // q_chunk, 1, q_chunk)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale),
        grid=(G, Lk // k_tile, Lq // q_chunk),
        in_specs=[
            pl.BlockSpec((1, q_chunk, d), lambda gg, j, i: (gg, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_tile, d), lambda gg, j, i: (gg, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_tile, d), lambda gg, j, i: (gg, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_chunk, d), lambda gg, j, i: (gg, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, q_chunk), lambda gg, j, i: (gg, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, q_chunk), lambda gg, j, i: (gg, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k_tile, d), lambda gg, j, i: (gg, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_tile, d), lambda gg, j, i: (gg, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lk, d), jnp.float32),
            jax.ShapeDtypeStruct((G, Lk, d), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(q, k, v, g, lse_kv, delta_kv)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(lambda q, k, v, scale: _flash_fwd(q, k, v, scale),
                       _flash_bwd)


# ------------------------------------------------- padded (cls-token) path
# MViT configs with CLS_EMBED_ON have odd sequence lengths (1 + T*H*W) that
# no tile divides (reference cls handling: attention.py:263-279). Zero-pad
# q/k/v to tile multiples and mask the padded KEY columns to -inf inside the
# forward kernels; padded q rows produce garbage that is sliced off, and the
# backward needs no mask: padded K/V are zeros, so their contributions to
# dq vanish, while dk/dv rows in the padding are discarded by the slice.

def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_len(n: int) -> int:
    return _round_up(n, 128 if n >= 128 else 8)


def flash_attention_padded_supported(Lq: int, Lk: int, d: int) -> bool:
    lkp = _pad_len(Lk)
    if 2 * lkp * d * 4 > 10 * 1024 * 1024:
        return False
    return (_pick_tile(_pad_len(Lq), _Q_TILES, 512) is not None
            and _pick_tile(lkp, _K_TILES, lkp) is not None)


def _pad_qkv(q, k, v):
    Lq, Lk = q.shape[1], k.shape[1]
    lqp, lkp = _pad_len(Lq), _pad_len(Lk)
    pq = jnp.pad(q, ((0, 0), (0, lqp - Lq), (0, 0)))
    pk = jnp.pad(k, ((0, 0), (0, lkp - Lk), (0, 0)))
    pv = jnp.pad(v, ((0, 0), (0, lkp - Lk), (0, 0)))
    return pq, pk, pv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_padded(q, k, v, scale: float):
    """Flash attention for arbitrary (non-tile-divisible) lengths.

    Same contract as :func:`flash_attention`; q/k/v are ``[G, L, d]`` with
    any L.
    """
    Lq, Lk = q.shape[1], k.shape[1]
    pq, pk, pv = _pad_qkv(q, k, v)
    q_tile, k_chunk = _tiles_for(pq.shape[1], pk.shape[1])
    out = _flash_attention_fwd_impl(pq, pk, pv, scale, q_tile, k_chunk,
                                    kv_valid=Lk)
    return out[:, :Lq]


def _flash_padded_fwd(q, k, v, scale):
    Lq, Lk = q.shape[1], k.shape[1]
    pq, pk, pv = _pad_qkv(q, k, v)
    q_tile, k_chunk = _tiles_for(pq.shape[1], pk.shape[1],
                                 budget=2_500_000)
    out, lse = _flash_fwd_with_lse(pq, pk, pv, scale, q_tile, k_chunk,
                                   kv_valid=Lk)
    return out[:, :Lq], (pq, pk, pv, out, lse, Lq, Lk)


def _flash_padded_bwd(scale, res, g):
    pq, pk, pv, out, lse, Lq, Lk = res
    gp = jnp.pad(g, ((0, 0), (0, pq.shape[1] - Lq), (0, 0)))
    dq, dk, dv = _flash_bwd(scale, (pq, pk, pv, out, lse), gp)
    return dq[:, :Lq], dk[:, :Lk], dv[:, :Lk]


flash_attention_padded.defvjp(
    lambda q, k, v, scale: _flash_padded_fwd(q, k, v, scale),
    _flash_padded_bwd,
)


# --------------------------------------- fused post-pool LayerNorm variant
# MViT normalizes pooled q/k/v per head (reference attention_pool,
# attention.py:65) before attention; as standalone kernels those norms are
# ~96 small launches/step (fwd+bwd x 3 tensors x 16 blocks) plus an HBM
# round-trip for the LONG q tensor. This variant consumes the RAW pooled
# tensors in head-major ``[G, L, d]`` layout and applies the row LayerNorm
# (full last axis = head_dim — no grouped 96-lane slicing, the documented
# VPU-roll trap of ops/pallas/layer_norm.py) inside the attention kernels:
# K/V are normalized ONCE per group into VMEM scratch, q per tile, and the
# v2 query-residual (``x = x + q``, attention.py:277-279) is added to the
# output tile in-kernel so the normalized q never touches HBM at all.
#
# The backward folds the LN VJP in too: the merged dq/dk/dv kernel converts
# the accumulated d(normed) to d(raw) + dgamma/dbeta in resident blocks at
# the last q step; the k-chunked variant emits d(normed q) partials and the
# wrapper fuses the LN VJP into the XLA partial-sum consumer. delta is
# reconstructed as rowsum(g * (out - LN(q))) — with the residual fused the
# saved ``out`` includes qn, so the pure attention output is recovered in
# bf16 (one rounding step; parity-tested against the unfused path).


def _ln_rows_f32(x, eps):
    """Row LayerNorm stats over the (full, resident) last axis.

    x: f32 ``[M, d]`` -> (xhat, rstd), both f32."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return xc * rstd, rstd


def _normed(t_f32, g_ref, b_ref, eps, dt):
    xh, _ = _ln_rows_f32(t_f32, eps)
    return (xh * g_ref[0].astype(jnp.float32)
            + b_ref[0].astype(jnp.float32)).astype(dt)


def _ln_vjp_rows(x_f32, gam_f32, dyn_f32, eps):
    """Row-LN VJP: (dx, dgamma_rows, dbeta_rows) for d(normed)=dyn."""
    xhat, rstd = _ln_rows_f32(x_f32, eps)
    dyg = dyn_f32 * gam_f32
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx = (dyg - m1 - xhat * m2) * rstd
    dgam = jnp.sum(dyn_f32 * xhat, axis=0)
    dbet = jnp.sum(dyn_f32, axis=0)
    return dx, dgam, dbet


def _flash_ln_fwd_kernel(q_ref, k_ref, v_ref, gq_ref, bq_ref, gk_ref,
                         bk_ref, gv_ref, bv_ref, o_ref, kn_s, vn_s, *,
                         scale, k_chunk, eps, flags, add_qn,
                         lse_ref=None):
    i = pl.program_id(1)
    dt = q_ref.dtype
    fq, fk, fv = flags

    @pl.when(i == 0)
    def _():
        if fk:
            kn_s[...] = _normed(k_ref[0].astype(jnp.float32), gk_ref,
                                bk_ref, eps, dt)
        if fv:
            vn_s[...] = _normed(v_ref[0].astype(jnp.float32), gv_ref,
                                bv_ref, eps, dt)

    if fq:
        qb = _normed(q_ref[0].astype(jnp.float32), gq_ref, bq_ref, eps, dt)
    else:
        qb = q_ref[0]
    q = qb * jnp.asarray(scale, dt)
    Lk = k_ref.shape[1]
    num_k = Lk // k_chunk
    TQ, d = q.shape

    def body(j, carry):
        m, l, acc = carry
        k = (kn_s[pl.ds(j * k_chunk, k_chunk), :] if fk
             else k_ref[0, pl.ds(j * k_chunk, k_chunk), :])
        v = (vn_s[pl.ds(j * k_chunk, k_chunk), :] if fv
             else v_ref[0, pl.ds(j * k_chunk, k_chunk), :])
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(dt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((TQ, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((TQ, 1), jnp.float32)
    acc0 = jnp.zeros((TQ, d), jnp.float32)
    if num_k <= _UNROLL_MAX:
        carry = (m0, l0, acc0)
        for j in range(num_k):
            carry = body(j, carry)
        m, l, acc = carry
    else:
        m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    out = (acc / l).astype(o_ref.dtype)
    o_ref[0] = out + qb if add_qn else out
    if lse_ref is not None:
        lse_ref[0, 0, 0] = (m + jnp.log(l))[:, 0]


def _ln_scratch(Lk, d, dt, flags):
    _, fk, fv = flags
    return [
        pltpu.VMEM((Lk if fk else 8, d), dt),
        pltpu.VMEM((Lk if fv else 8, d), dt),
    ]


def _flash_ln_fwd_impl(q, k, v, params, scale, eps, flags, add_qn,
                       q_tile, k_chunk, with_lse):
    G, Lq, d = q.shape
    Lk = k.shape[1]
    dt = q.dtype
    kernel = functools.partial(
        _flash_ln_fwd_kernel, scale=scale, k_chunk=k_chunk, eps=eps,
        flags=flags, add_qn=add_qn,
    )
    per_q = pl.BlockSpec((1, q_tile, d), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM)
    full_kv = pl.BlockSpec((1, Lk, d), lambda g, i: (g, 0, 0),
                           memory_space=pltpu.VMEM)
    par = pl.BlockSpec((1, d), lambda g, i: (0, 0),
                       memory_space=pltpu.VMEM)
    out_specs = per_q
    out_shape = jax.ShapeDtypeStruct((G, Lq, d), dt)
    if with_lse:
        kernel = functools.partial(
            _flash_ln_fwd_lse_kernel, scale=scale, k_chunk=k_chunk,
            eps=eps, flags=flags, add_qn=add_qn,
        )
        out_specs = (per_q,
                     pl.BlockSpec((1, 1, 1, q_tile), lambda g, i: (g, i, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((G, Lq // q_tile, 1, q_tile),
                                          jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(G, Lq // q_tile),
        in_specs=[per_q, full_kv, full_kv] + [par] * 6,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=_ln_scratch(Lk, d, dt, flags),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * G * Lq * Lk * d,
            bytes_accessed=2 * (G * Lq * d + 2 * G * Lk * d),
            transcendentals=G * Lq * Lk,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(q, k, v, *params)


def _flash_ln_fwd_lse_kernel(q_ref, k_ref, v_ref, gq_ref, bq_ref, gk_ref,
                             bk_ref, gv_ref, bv_ref, o_ref, lse_ref,
                             kn_s, vn_s, *, scale, k_chunk, eps, flags,
                             add_qn):
    _flash_ln_fwd_kernel(
        q_ref, k_ref, v_ref, gq_ref, bq_ref, gk_ref, bk_ref, gv_ref,
        bv_ref, o_ref, kn_s, vn_s, scale=scale, k_chunk=k_chunk, eps=eps,
        flags=flags, add_qn=add_qn, lse_ref=lse_ref,
    )


def _flash_ln_dqkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                          gq_ref, bq_ref, gk_ref, bk_ref, gv_ref, bv_ref,
                          dq_ref, dk_ref, dv_ref, dgq_ref, dbq_ref,
                          dgk_ref, dbk_ref, dgv_ref, dbv_ref, kn_s, vn_s,
                          *, scale, eps, flags, add_qn, nq):
    """Merged backward with the LN VJP folded in. Grid (G, q_tiles):
    dk/dv accumulate d(normed) in resident f32 blocks and are converted to
    d(raw) + dgamma/dbeta IN PLACE at the last q step; dq converts per
    tile. The dgamma/dbeta outputs are revisited across the whole grid."""
    gg = pl.program_id(0)
    i = pl.program_id(1)
    dt = q_ref.dtype
    fq, fk, fv = flags

    @pl.when((gg == 0) & (i == 0))
    def _():
        for r in (dgq_ref, dbq_ref, dgk_ref, dbk_ref, dgv_ref, dbv_ref):
            r[...] = jnp.zeros_like(r)

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])
        if fk:
            kn_s[...] = _normed(k_ref[0].astype(jnp.float32), gk_ref,
                                bk_ref, eps, dt)
        if fv:
            vn_s[...] = _normed(v_ref[0].astype(jnp.float32), gv_ref,
                                bv_ref, eps, dt)

    kb = kn_s[...] if fk else k_ref[0]
    vb = vn_s[...] if fv else v_ref[0]
    if fq:
        qf = q_ref[0].astype(jnp.float32)
        qxh, qrstd = _ln_rows_f32(qf, eps)
        gq = gq_ref[0].astype(jnp.float32)
        qb = (qxh * gq + bq_ref[0].astype(jnp.float32)).astype(dt)
    else:
        qb = q_ref[0]
    qs = qb * jnp.asarray(scale, dt)
    g = g_ref[0]
    lse = lse_ref[0, 0, 0][:, None]
    delta = delta_ref[0, 0, 0][:, None]

    s = jax.lax.dot_general(
        qs, kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse)
    dv_ref[0] += jax.lax.dot_general(
        p.astype(dt), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        g, vb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(dt)
    dk_ref[0] += jax.lax.dot_general(
        ds, qs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dqn = jax.lax.dot_general(
        ds, kb * jnp.asarray(scale, dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if add_qn:
        dqn = dqn + g.astype(jnp.float32)
    if fq:
        dyg = dqn * gq
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * qxh, axis=-1, keepdims=True)
        dq_ref[0] = ((dyg - m1 - qxh * m2) * qrstd).astype(dq_ref.dtype)
        dgq_ref[0, :] += jnp.sum(dqn * qxh, axis=0)
        dbq_ref[0, :] += jnp.sum(dqn, axis=0)
    else:
        dq_ref[0] = dqn.astype(dq_ref.dtype)

    @pl.when(i == nq - 1)
    def _():
        if fk:
            dxk, dgam, dbet = _ln_vjp_rows(
                k_ref[0].astype(jnp.float32),
                gk_ref[0].astype(jnp.float32), dk_ref[0], eps)
            dk_ref[0] = dxk
            dgk_ref[0, :] += dgam
            dbk_ref[0, :] += dbet
        if fv:
            dxv, dgam, dbet = _ln_vjp_rows(
                v_ref[0].astype(jnp.float32),
                gv_ref[0].astype(jnp.float32), dv_ref[0], eps)
            dv_ref[0] = dxv
            dgv_ref[0, :] += dgam
            dbv_ref[0, :] += dbet


def _flash_ln_dqkv_chunked_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref,
                                  delta_ref, gq_ref, bq_ref, gk_ref,
                                  bk_ref, gv_ref, bv_ref, dqp_ref, dk_ref,
                                  dv_ref, dgk_ref, dbk_ref, dgv_ref,
                                  dbv_ref, kn_s, vn_s, *, scale, eps,
                                  flags, add_qn, nq):
    """K-chunked merged backward with the K/V LN VJP folded in. Grid
    (G, k_tiles, q_tiles), q innermost. dq is emitted as d(NORMED q)
    per-chunk f32 partials; the wrapper applies the q-side LN VJP inside
    the XLA partial-sum consumer (one fused pass — in-kernel q conversion
    is impossible here because no single chunk sees the full dqn)."""
    gg = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)
    dt = q_ref.dtype
    fq, fk, fv = flags

    @pl.when((gg == 0) & (j == 0) & (i == 0))
    def _():
        for r in (dgk_ref, dbk_ref, dgv_ref, dbv_ref):
            r[...] = jnp.zeros_like(r)

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])
        if fk:
            kn_s[...] = _normed(k_ref[0].astype(jnp.float32), gk_ref,
                                bk_ref, eps, dt)
        if fv:
            vn_s[...] = _normed(v_ref[0].astype(jnp.float32), gv_ref,
                                bv_ref, eps, dt)

    kb = kn_s[...] if fk else k_ref[0]
    vb = vn_s[...] if fv else v_ref[0]
    if fq:
        qb = _normed(q_ref[0].astype(jnp.float32), gq_ref, bq_ref, eps, dt)
    else:
        qb = q_ref[0]
    qs = qb * jnp.asarray(scale, dt)
    g = g_ref[0]
    lse = lse_ref[0, 0, 0][:, None]
    delta = delta_ref[0, 0, 0][:, None]

    s = jax.lax.dot_general(
        qs, kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse)
    dv_ref[0] += jax.lax.dot_general(
        p.astype(dt), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        g, vb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(dt)
    dk_ref[0] += jax.lax.dot_general(
        ds, qs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dqp_ref[0, 0] = jax.lax.dot_general(
        ds, kb * jnp.asarray(scale, dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _():
        if fk:
            dxk, dgam, dbet = _ln_vjp_rows(
                k_ref[0].astype(jnp.float32),
                gk_ref[0].astype(jnp.float32), dk_ref[0], eps)
            dk_ref[0] = dxk
            dgk_ref[0, :] += dgam
            dbk_ref[0, :] += dbet
        if fv:
            dxv, dgam, dbet = _ln_vjp_rows(
                v_ref[0].astype(jnp.float32),
                gv_ref[0].astype(jnp.float32), dv_ref[0], eps)
            dv_ref[0] = dxv
            dgv_ref[0, :] += dgam
            dbv_ref[0, :] += dbet


def _ln_bwd_fused_tile(Lq, Lk, d, flags, dtype_bytes=2):
    """Like _bwd_fused_tile but accounts for the kn/vn VMEM scratch."""
    _, fk, fv = flags
    scratch = (int(fk) + int(fv)) * Lk * d * dtype_bytes
    kv_resident = 2 * Lk * d * dtype_bytes + 2 * Lk * d * 4 + scratch
    if kv_resident > _BWD_KV_RESIDENT_CAP:
        return None
    q_cap = max(8, (_BWD_FUSED_BUDGET // (4 * Lk)) // 8 * 8)
    return _pick_tile(Lq, _Q_TILES, q_cap)


def _ln_bwd_chunked_tiles(Lq, Lk, d, flags, dtype_bytes=2):
    _, fk, fv = flags
    per_row = 2 * d * (dtype_bytes + 4) + (int(fk) + int(fv)) * d * dtype_bytes
    kt = _pick_tile(Lk, _K_TILES, _BWD_KV_RESIDENT_CAP // per_row)
    if kt is None or Lk // kt > _BWD_CHUNKED_MAX_NK:
        return None
    qt = _pick_tile(Lq, _Q_TILES,
                    max(8, (_BWD_FUSED_BUDGET // (4 * kt)) // 8 * 8))
    if qt is None:
        return None
    return kt, qt


def _ln_fwd_budget(Lk, d, flags, with_lse=False):
    """Forward logits budget for the fused-LN kernels. With the scoped-VMEM
    check raised to _SCOPED_VMEM_LIMIT the kn/vn scratch no longer crowds
    the 16 MB default (the Lq=25088/Lk=6272 forward measured 16.11 MB and
    OOMed the default limit even at a 1 MB budget), so the inference
    forward runs the plain kernels' budget. The lse-saving training forward
    keeps the scratch-shrunken budget — measured 20 ms/step FASTER at 448
    bs4 with the smaller q tiles (201.3 vs 221.6 ms at 2.5 MB)."""
    if not with_lse:
        return 2_500_000
    _, fk, fv = flags
    scratch = (int(fk) + int(fv)) * Lk * d * 2
    return max(1_000_000, 2_500_000 - scratch)


def flash_attention_ln_supported(Lq: int, Lk: int, d: int,
                                 flags=(True, True, True)) -> bool:
    """Whether the fused-LN path handles these lengths (both the forward
    tiling and one of the merged backward kernels must apply)."""
    if not flash_attention_supported(Lq, Lk, d):
        return False
    # both forwards must tile: the custom_vjp primal (inference, no lse)
    # and the AD forward (saves lse, scratch-shrunken budget can squeeze
    # q_cap below every legal tile for non-x8 Lq like 196)
    for with_lse in (False, True):
        if _try_tiles_for(
                Lq, Lk, _ln_fwd_budget(Lk, d, flags,
                                       with_lse=with_lse)) is None:
            return False
    return (_ln_bwd_fused_tile(Lq, Lk, d, flags) is not None
            or _ln_bwd_chunked_tiles(Lq, Lk, d, flags) is not None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def flash_attention_ln(q, k, v, gq, bq, gk, bk, gv, bv,
                       scale: float, eps: float, flags, add_qn: bool):
    """Flash attention over RAW pooled q/k/v with per-row LayerNorm fused.

    Args:
      q: ``[G, Lq, d]`` raw (un-normalized) pooled queries, head-major.
      k, v: ``[G, Lk, d]`` raw pooled keys/values.
      gq/bq, gk/bk, gv/bv: ``[d]`` LN scale/bias per tensor (pass dummies
        for tensors whose flag is False — their grads come back as zeros).
      scale: logit scale.
      eps: LN epsilon (reference pool norms: torch default 1e-5).
      flags: static (norm_q, norm_k, norm_v) booleans.
      add_qn: fuse the v2 query-residual ``out + LN(q)`` into the output
        tile (reference attention.py:277-279).

    Returns ``softmax(LN(q) @ LN(k).T * scale) @ LN(v) [+ LN(q)]``.
    """
    q_tile, k_chunk = _tiles_for(
        q.shape[1], k.shape[1],
        budget=_ln_fwd_budget(k.shape[1], q.shape[2], flags))
    return _flash_ln_fwd_impl(
        q, k, v, (gq.reshape(1, -1), bq.reshape(1, -1), gk.reshape(1, -1),
                  bk.reshape(1, -1), gv.reshape(1, -1), bv.reshape(1, -1)),
        scale, eps, flags, add_qn, q_tile, k_chunk, with_lse=False)


def _flash_ln_fwd(q, k, v, gq, bq, gk, bk, gv, bv, scale, eps, flags,
                  add_qn):
    q_tile, k_chunk = _tiles_for(
        q.shape[1], k.shape[1],
        budget=_ln_fwd_budget(k.shape[1], q.shape[2], flags,
                              with_lse=True))
    out, lse = _flash_ln_fwd_impl(
        q, k, v, (gq.reshape(1, -1), bq.reshape(1, -1), gk.reshape(1, -1),
                  bk.reshape(1, -1), gv.reshape(1, -1), bv.reshape(1, -1)),
        scale, eps, flags, add_qn, q_tile, k_chunk, with_lse=True)
    return out, (q, k, v, gq, bq, gk, bk, gv, bv, out, lse)


def _xla_ln(t, gam, bet, eps):
    tf = t.astype(jnp.float32)
    xh, _ = _ln_rows_f32(tf, eps)
    return (xh * gam.astype(jnp.float32) + bet.astype(jnp.float32))


def _flash_ln_bwd(scale, eps, flags, add_qn, res, g):
    q, k, v, gq, bq, gk, bk, gv, bv, out, lse = res
    G, Lq, d = q.shape
    Lk = k.shape[1]
    dt = q.dtype
    fq, fk, fv = flags
    if fq:
        qb = _xla_ln(q, gq, bq, eps).astype(dt)
    else:
        qb = q
    if add_qn:
        # recover the pure attention output (out includes the fused
        # residual); one bf16 rounding step vs the unfused path
        o_attn = out.astype(jnp.float32) - qb.astype(jnp.float32)
    else:
        o_attn = out.astype(jnp.float32)
    delta_flat = (g.astype(jnp.float32) * o_attn).sum(-1)
    lse_flat = lse.reshape(G, Lq)
    params = (gq.reshape(1, -1), bq.reshape(1, -1), gk.reshape(1, -1),
              bk.reshape(1, -1), gv.reshape(1, -1), bv.reshape(1, -1))
    par = pl.BlockSpec((1, d), lambda *_: (0, 0), memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, d), lambda *_: (0, 0), memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((1, d), jnp.float32)

    def _zeros_like_params():
        return (jnp.zeros_like(gq), jnp.zeros_like(bq))

    qt = _ln_bwd_fused_tile(Lq, Lk, d, flags)
    if qt is not None:
        nq = Lq // qt
        lse_t = lse_flat.reshape(G, nq, 1, qt)
        delta_t = delta_flat.reshape(G, nq, 1, qt)
        full_kv = pl.BlockSpec((1, Lk, d), lambda gg, i: (gg, 0, 0),
                               memory_space=pltpu.VMEM)
        per_q = pl.BlockSpec((1, qt, d), lambda gg, i: (gg, i, 0),
                             memory_space=pltpu.VMEM)
        per_row = pl.BlockSpec((1, 1, 1, qt), lambda gg, i: (gg, i, 0, 0),
                               memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            functools.partial(_flash_ln_dqkv_kernel, scale=scale, eps=eps,
                              flags=flags, add_qn=add_qn, nq=nq),
            grid=(G, nq),
            in_specs=[per_q, full_kv, full_kv, per_q, per_row, per_row]
            + [par] * 6,
            out_specs=(per_q, full_kv, full_kv) + (acc,) * 6,
            out_shape=(
                jax.ShapeDtypeStruct((G, Lq, d), dt),
                jax.ShapeDtypeStruct((G, Lk, d), jnp.float32),
                jax.ShapeDtypeStruct((G, Lk, d), jnp.float32),
            ) + (acc_shape,) * 6,
            scratch_shapes=_ln_scratch(Lk, d, dt, flags),
            compiler_params=_COMPILER_PARAMS,
            interpret=INTERPRET,
        )(q, k, v, g, lse_t, delta_t, *params)
        dq, dk, dv, dgq, dbq, dgk, dbk, dgv, dbv = outs
        dgq, dbq, dgk, dbk, dgv, dbv = (
            t.reshape(d) for t in (dgq, dbq, dgk, dbk, dgv, dbv))
    else:
        kt, qt = _ln_bwd_chunked_tiles(Lq, Lk, d, flags)
        nk, nq = Lk // kt, Lq // qt
        lse_t = lse_flat.reshape(G, nq, 1, qt)
        delta_t = delta_flat.reshape(G, nq, 1, qt)
        per_kv = pl.BlockSpec((1, kt, d), lambda gg, j, i: (gg, j, 0),
                              memory_space=pltpu.VMEM)
        per_q = pl.BlockSpec((1, qt, d), lambda gg, j, i: (gg, i, 0),
                             memory_space=pltpu.VMEM)
        per_row = pl.BlockSpec((1, 1, 1, qt),
                               lambda gg, j, i: (gg, i, 0, 0),
                               memory_space=pltpu.VMEM)
        par3 = pl.BlockSpec((1, d), lambda *_: (0, 0),
                            memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            functools.partial(_flash_ln_dqkv_chunked_kernel, scale=scale,
                              eps=eps, flags=flags, add_qn=add_qn, nq=nq),
            grid=(G, nk, nq),
            in_specs=[per_q, per_kv, per_kv, per_q, per_row, per_row]
            + [par3] * 6,
            out_specs=(
                pl.BlockSpec((1, 1, qt, d), lambda gg, j, i: (gg, j, i, 0),
                             memory_space=pltpu.VMEM),
                per_kv, per_kv,
            ) + (par3,) * 4,
            out_shape=(
                jax.ShapeDtypeStruct((G, nk, Lq, d), jnp.float32),
                jax.ShapeDtypeStruct((G, Lk, d), jnp.float32),
                jax.ShapeDtypeStruct((G, Lk, d), jnp.float32),
            ) + (acc_shape,) * 4,
            scratch_shapes=[
                pltpu.VMEM((kt if fk else 8, d), dt),
                pltpu.VMEM((kt if fv else 8, d), dt),
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=INTERPRET,
        )(q, k, v, g, lse_t, delta_t, *params)
        dqp, dk, dv, dgk, dbk, dgv, dbv = outs
        dgk, dbk, dgv, dbv = (t.reshape(d) for t in (dgk, dbk, dgv, dbv))
        dqn = dqp.sum(axis=1)  # [G, Lq, d] f32, d(normed q)
        if add_qn:
            dqn = dqn + g.astype(jnp.float32)
        if fq:
            # q-side LN VJP fused by XLA into the partial-sum consumer
            qf = q.astype(jnp.float32)
            mu = jnp.mean(qf, axis=-1, keepdims=True)
            xc = qf - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            rstd = jax.lax.rsqrt(var + eps)
            xhat = xc * rstd
            dyg = dqn * gq.astype(jnp.float32)
            m1 = jnp.mean(dyg, axis=-1, keepdims=True)
            m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
            dq = ((dyg - m1 - xhat * m2) * rstd).astype(dt)
            dgq = (dqn * xhat).sum((0, 1))
            dbq = dqn.sum((0, 1))
        else:
            dq = dqn.astype(dt)
            dgq, dbq = _zeros_like_params()

    if not fq:
        dgq, dbq = _zeros_like_params()
    if not fk:
        dgk, dbk = _zeros_like_params()
    if not fv:
        dgv, dbv = _zeros_like_params()
    return (dq, dk.astype(k.dtype), dv.astype(v.dtype),
            dgq.astype(gq.dtype), dbq.astype(bq.dtype),
            dgk.astype(gk.dtype), dbk.astype(bk.dtype),
            dgv.astype(gv.dtype), dbv.astype(bv.dtype))


flash_attention_ln.defvjp(
    lambda q, k, v, gq, bq, gk, bk, gv, bv, scale, eps, flags, add_qn:
        _flash_ln_fwd(q, k, v, gq, bq, gk, bk, gv, bv, scale, eps, flags,
                      add_qn),
    _flash_ln_bwd,
)
