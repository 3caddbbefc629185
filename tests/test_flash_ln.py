"""Fused post-pool-LN flash attention: parity + VJP (interpreter mode).

The fused kernel consumes RAW pooled q/k/v plus the per-head LN params
(reference attention_pool norms, attention.py:65) and optionally adds the
v2 query-residual (attention.py:277-279) in-kernel. Reference composition
here: row LayerNorm -> softmax attention -> (+ LN(q)).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicity_action_tpu.ops.pallas import flash_attention as fa

EPS = 1e-5


@pytest.fixture(autouse=True)
def _interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _ln(x, g, b):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + EPS) * g + b


def _ref(q, k, v, gq, bq, gk, bk, gv, bv, scale, flags, add_qn):
    fq, fk, fv = flags
    qn = _ln(q, gq, bq) if fq else q.astype(jnp.float32)
    kn = _ln(k, gk, bk) if fk else k.astype(jnp.float32)
    vn = _ln(v, gv, bv) if fv else v.astype(jnp.float32)
    s = jnp.einsum("gqd,gkd->gqk", qn, kn) * scale
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("gqk,gkd->gqd", p, vn)
    return out + qn if add_qn else out


def _rand(rs, *shape):
    return jnp.asarray(rs.randn(*shape), jnp.float32)


def _inputs(G=2, Lq=128, Lk=64, d=32, seed=0):
    rs = np.random.RandomState(seed)
    q = _rand(rs, G, Lq, d)
    k = _rand(rs, G, Lk, d)
    v = _rand(rs, G, Lk, d)
    params = tuple(
        jnp.asarray(1.0 + 0.1 * rs.randn(d), jnp.float32) if i % 2 == 0
        else _rand(rs, d)
        for i in range(6)
    )
    return q, k, v, params


@pytest.mark.parametrize("flags,add_qn", [
    ((True, True, True), True),
    ((True, True, True), False),
    ((True, False, False), True),
    ((False, True, True), False),
])
def test_forward_parity(flags, add_qn):
    q, k, v, params = _inputs()
    scale = q.shape[-1] ** -0.5
    out = fa.flash_attention_ln(q, k, v, *params, scale, EPS, flags, add_qn)
    ref = _ref(q, k, v, *params, scale, flags, add_qn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def _grad_check(flags, add_qn, force_chunked, monkeypatch):
    if force_chunked:
        # shrink the residency cap so the merged kernel declines and the
        # k-chunked kernel (+ XLA-side q LN VJP) runs at small test shapes
        monkeypatch.setattr(fa, "_BWD_KV_RESIDENT_CAP", 8 * 1024)
    q, k, v, params = _inputs(G=2, Lq=64, Lk=64, d=16, seed=3)
    scale = q.shape[-1] ** -0.5

    def f_fused(*args):
        return (fa.flash_attention_ln(
            *args, scale, EPS, flags, add_qn) ** 2).sum()

    def f_ref(*args):
        return (_ref(*args, scale, flags, add_qn) ** 2).sum()

    if force_chunked:
        assert fa._ln_bwd_fused_tile(64, 64, 16, flags) is None
        assert fa._ln_bwd_chunked_tiles(64, 64, 16, flags) is not None

    got = jax.grad(f_fused, argnums=tuple(range(9)))(q, k, v, *params)
    want = jax.grad(f_ref, argnums=tuple(range(9)))(q, k, v, *params)
    names = ["q", "k", "v", "gq", "bq", "gk", "bk", "gv", "bv"]
    fq, fk, fv = flags
    active = [True, True, True, fq, fq, fk, fk, fv, fv]
    for name, g_got, g_want, act in zip(names, got, want, active):
        if not act:
            g_want = jnp.zeros_like(g_want)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), atol=5e-4, rtol=1e-3,
            err_msg=f"grad {name} flags={flags} add_qn={add_qn} "
                    f"chunked={force_chunked}")


@pytest.mark.parametrize("flags,add_qn", [
    ((True, True, True), True),
    ((True, True, True), False),
    ((True, False, True), True),
    ((False, True, True), True),
])
def test_vjp_merged(flags, add_qn, monkeypatch):
    _grad_check(flags, add_qn, force_chunked=False, monkeypatch=monkeypatch)


@pytest.mark.parametrize("flags,add_qn", [
    ((True, True, True), True),
    ((True, True, True), False),
    ((False, True, True), False),
])
def test_vjp_chunked(flags, add_qn, monkeypatch):
    _grad_check(flags, add_qn, force_chunked=True, monkeypatch=monkeypatch)


def test_vjp_bf16_add_qn():
    """Production-dtype check for the add_qn backward, which recovers the
    pure attention output as ``out - LN(q)`` from the bf16-rounded saved
    ``out`` (extra rounding/cancellation vs the f32 tests). Tolerances
    follow bf16's ~2^-8 relative resolution on O(1) values."""
    q, k, v, params = _inputs(G=2, Lq=64, Lk=64, d=16, seed=9)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    params = tuple(t.astype(jnp.bfloat16) for t in params)
    scale = q.shape[-1] ** -0.5
    flags, add_qn = (True, True, True), True

    def f_fused(*args):
        return (fa.flash_attention_ln(
            *args, scale, EPS, flags, add_qn).astype(jnp.float32) ** 2).sum()

    def f_ref(*args):
        a32 = tuple(t.astype(jnp.float32) for t in args)
        return (_ref(*a32, scale, flags, add_qn) ** 2).sum()

    got = jax.grad(f_fused, argnums=tuple(range(9)))(q, k, v, *params)
    want = jax.grad(f_ref, argnums=tuple(range(9)))(q, k, v, *params)
    names = ["q", "k", "v", "gq", "bq", "gk", "bk", "gv", "bv"]
    got = [np.asarray(g, np.float32) for g in got]
    want = [np.asarray(g, np.float32) for g in want]
    # normalize per-argument errors by the GLOBAL gradient scale: bk's true
    # gradient is analytically zero (softmax is invariant to the uniform
    # per-column logit shift a key-bias change induces), so its numerical
    # value is pure cancellation noise at any dtype and per-tensor relative
    # error is meaningless there.
    scale_all = max(float(np.abs(g).max()) for g in want)
    for name, g_got, g_want in zip(names, got, want):
        rel = float(np.abs(g_got - g_want).max()) / scale_all
        assert rel < 2e-2, f"bf16 add_qn grad {name}: rel err {rel:.3e}"


def test_supported_predicate():
    # flagship 448 shapes (h-folded G): every block class must be taken
    assert fa.flash_attention_ln_supported(25088, 1568, 96)   # stage 1
    assert fa.flash_attention_ln_supported(25088, 6272, 96)   # q-pool blk
    assert fa.flash_attention_ln_supported(6272, 6272, 96)    # stage 2/3
    assert fa.flash_attention_ln_supported(1568, 1568, 96)
    assert fa.flash_attention_ln_supported(392, 392, 96)      # stage 4
    assert not fa.flash_attention_ln_supported(1009, 392, 96)  # prime Lq
