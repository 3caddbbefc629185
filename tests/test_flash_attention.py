"""Flash attention kernel parity (interpreter mode on CPU) and VJP checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicity_action_tpu.ops.pallas import flash_attention as fa


@pytest.fixture(autouse=True)
def _interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _ref(q, k, v, scale):
    s = jnp.einsum("gqd,gkd->gqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gqk,gkd->gqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("G,Lq,Lk,d", [
    (2, 128, 64, 96),     # multiple k chunks
    (3, 392, 392, 96),    # MViT-like: 392 = 8*7*7
    (1, 256, 98, 32),     # odd-ish Lk
])
def test_forward_parity(G, Lq, Lk, d):
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(G, Lq, d), jnp.float32)
    k = jnp.asarray(rs.randn(G, Lk, d), jnp.float32)
    v = jnp.asarray(rs.randn(G, Lk, d), jnp.float32)
    scale = d ** -0.5
    out = fa.flash_attention(q, k, v, scale)
    ref = _ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_supported_predicate():
    assert fa.flash_attention_supported(100352, 1568, 96)
    assert fa.flash_attention_supported(25088, 6272, 96)
    assert fa.flash_attention_supported(1568, 6272, 96)
    assert fa.flash_attention_supported(25088, 392, 96)
    # prime length: no tile divides
    assert not fa.flash_attention_supported(1009, 392, 96)


def test_vjp_matches_reference():
    rs = np.random.RandomState(1)
    G, Lq, Lk, d = 2, 64, 32, 16
    q = jnp.asarray(rs.randn(G, Lq, d), jnp.float32)
    k = jnp.asarray(rs.randn(G, Lk, d), jnp.float32)
    v = jnp.asarray(rs.randn(G, Lk, d), jnp.float32)
    scale = d ** -0.5

    def f_flash(q, k, v):
        return fa.flash_attention(q, k, v, scale).sum()

    def f_ref(q, k, v):
        return _ref(q, k, v, scale).sum()

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_vjp_chunked_merged_path(monkeypatch):
    """Force the k-chunked merged backward (production Lk=6272 regime) by
    shrinking the KV-residency cap so whole-K/V doesn't 'fit'."""
    monkeypatch.setattr(fa, "_BWD_KV_RESIDENT_CAP", 16 * 12 * 16)  # Lk>16
    rs = np.random.RandomState(2)
    G, Lq, Lk, d = 2, 64, 64, 16
    assert fa._bwd_fused_tile(Lq, Lk, d) is None
    chunked = fa._bwd_chunked_tiles(Lq, Lk, d)
    assert chunked is not None and Lk // chunked[0] > 1, chunked
    q = jnp.asarray(rs.randn(G, Lq, d), jnp.float32)
    k = jnp.asarray(rs.randn(G, Lk, d), jnp.float32)
    v = jnp.asarray(rs.randn(G, Lk, d), jnp.float32)
    scale = d ** -0.5

    def f_flash(q, k, v):
        return (fa.flash_attention(q, k, v, scale) ** 2).sum()

    def f_ref(q, k, v):
        return (_ref(q, k, v, scale) ** 2).sum()

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


class TestFusedLayerNorm:
    """Pallas grouped LayerNorm vs reference math (interpreter mode)."""

    def _ref(self, x, g, b, eps, groups):
        C = x.shape[-1]
        dg = C // groups
        xs = x.reshape(*x.shape[:-1], groups, dg).astype(np.float32)
        mu = xs.mean(-1, keepdims=True)
        xc = xs - mu
        var = (xc * xc).mean(-1, keepdims=True)
        y = xc / np.sqrt(var + eps) * g + b
        return y.reshape(x.shape)

    @pytest.mark.parametrize("groups", [1, 2, 4])
    def test_forward_matches(self, groups):
        from aicity_action_tpu.ops.pallas import flash_attention as fa
        from aicity_action_tpu.ops.pallas.layer_norm import fused_layer_norm

        rng = np.random.RandomState(0)
        C = 32 * groups
        x = rng.randn(64, C).astype(np.float32)
        g = rng.randn(C // groups).astype(np.float32)
        b = rng.randn(C // groups).astype(np.float32)
        old = fa.INTERPRET
        fa.INTERPRET = True
        try:
            out = fused_layer_norm(
                jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), 1e-5, groups)
        finally:
            fa.INTERPRET = old
        np.testing.assert_allclose(
            np.asarray(out), self._ref(x, g, b, 1e-5, groups),
            rtol=2e-5, atol=2e-5)

    def test_grad_matches(self):
        from aicity_action_tpu.ops.pallas import flash_attention as fa
        from aicity_action_tpu.ops.pallas.layer_norm import fused_layer_norm

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(32, 64).astype(np.float32))
        g = jnp.asarray(rng.randn(32).astype(np.float32))
        b = jnp.asarray(rng.randn(32).astype(np.float32))

        def ref_fn(x, g, b):
            xs = x.reshape(32, 2, 32).astype(jnp.float32)
            mu = xs.mean(-1, keepdims=True)
            xc = xs - mu
            var = (xc * xc).mean(-1, keepdims=True)
            y = xc * jax.lax.rsqrt(var + 1e-5) * g + b
            return (y.reshape(32, 64) * jnp.arange(64)).sum()

        def pl_fn(x, g, b):
            y = fused_layer_norm(x, g, b, 1e-5, 2)
            return (y * jnp.arange(64)).sum()

        old = fa.INTERPRET
        fa.INTERPRET = True
        try:
            got = jax.grad(pl_fn, argnums=(0, 1, 2))(x, g, b)
        finally:
            fa.INTERPRET = old
        want = jax.grad(ref_fn, argnums=(0, 1, 2))(x, g, b)
        for a, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(w), rtol=1e-4, atol=1e-4)


class TestFusedDense:
    """fused_ln_qkv / fused_ln_mlp vs the jnp reference (interpret mode)."""

    def test_ln_qkv(self):
        from aicity_action_tpu.ops.pallas import flash_attention as fa
        from aicity_action_tpu.ops.pallas.fused_dense import (
            _ref_ln_qkv, fused_ln_qkv)

        rng = np.random.RandomState(0)
        M, D, C = 64, 32, 48
        x = jnp.asarray(rng.randn(M, D).astype(np.float32))
        gm = jnp.asarray(rng.randn(D).astype(np.float32))
        bt = jnp.asarray(rng.randn(D).astype(np.float32))
        w = jnp.asarray(rng.randn(D, 3 * C).astype(np.float32))
        b = jnp.asarray(rng.randn(3 * C).astype(np.float32))
        old = fa.INTERPRET
        fa.INTERPRET = True
        try:
            got = fused_ln_qkv(x, gm, bt, w, b, 1e-6)
        finally:
            fa.INTERPRET = old
        want = _ref_ln_qkv(x, gm, bt, w, b, 1e-6)
        for a, e in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("has_bias", [True, False])
    def test_ln_qkv_grad(self, has_bias):
        from aicity_action_tpu.ops.pallas import flash_attention as fa
        from aicity_action_tpu.ops.pallas.fused_dense import (
            _ref_ln_qkv, fused_ln_qkv)

        rng = np.random.RandomState(2)
        M, D, C = 64, 32, 48
        x = jnp.asarray(rng.randn(M, D).astype(np.float32)) * 0.5
        gm = jnp.asarray(rng.randn(D).astype(np.float32))
        bt = jnp.asarray(rng.randn(D).astype(np.float32))
        w = jnp.asarray(rng.randn(D, 3 * C).astype(np.float32)) * 0.2
        b = (jnp.asarray(rng.randn(3 * C).astype(np.float32))
             if has_bias else None)

        def loss(fn):
            def inner(x, gm, bt, w, *rest):
                q, k, v = fn(x, gm, bt, w, rest[0] if rest else None, 1e-6)
                return (q * 1.0).sum() + (k * 0.5).sum() + (v * 2.0).sum()
            return inner

        args = (x, gm, bt, w) + ((b,) if has_bias else ())
        nargs = len(args)
        old = fa.INTERPRET
        fa.INTERPRET = True
        try:
            got = jax.grad(loss(fused_ln_qkv),
                           argnums=tuple(range(nargs)))(*args)
        finally:
            fa.INTERPRET = old
        want = jax.grad(loss(_ref_ln_qkv),
                        argnums=tuple(range(nargs)))(*args)
        for a, e in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=1e-4, atol=1e-4)

    def test_bwd_kernels_bf16(self):
        """Production dtype smoke: bf16 operands through both Pallas
        backwards (interpret mode), grads finite and close to the f32
        reference within bf16 resolution."""
        from aicity_action_tpu.ops.pallas import flash_attention as fa
        from aicity_action_tpu.ops.pallas.fused_dense import (
            _ref_ln_mlp, fused_ln_mlp, fused_ln_qkv)

        rng = np.random.RandomState(3)
        M, D, H = 64, 32, 64
        args32 = [
            jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.5
            for s in [(M, D), (D,), (D,), (D, H), (H,), (H, D), (D,)]
        ]
        args16 = [a.astype(jnp.bfloat16) for a in args32]
        old = fa.INTERPRET
        fa.INTERPRET = True
        try:
            g16 = jax.grad(
                lambda *a: fused_ln_mlp(*a, 1e-6).astype(jnp.float32).sum(),
                argnums=(0, 3, 5))(*args16)
            q16 = jax.grad(
                lambda x, gm, bt, w: sum(
                    o.astype(jnp.float32).sum()
                    for o in fused_ln_qkv(x, gm, bt, w, None, 1e-6)),
                argnums=(0, 3))(*args16[:3], args16[3].repeat(3, axis=1))
        finally:
            fa.INTERPRET = old
        gref = jax.grad(
            lambda *a: _ref_ln_mlp(*a, 1e-6).astype(jnp.float32).sum(),
            argnums=(0, 3, 5))(*args16)
        for a, e in zip(g16, gref):
            a, e = np.asarray(a, np.float32), np.asarray(e, np.float32)
            assert np.isfinite(a).all()
            # bf16 near-cancellations allow isolated outliers; the smoke
            # guard is aggregate agreement, not elementwise tightness
            np.testing.assert_allclose(a, e, rtol=0.2, atol=0.2)
        for a in q16:
            assert np.isfinite(np.asarray(a, np.float32)).all()

    def test_bwd_gates_cover_production_shapes(self):
        """MViT-B @448 bs4 shapes must stay on the Pallas backwards
        (regression guard: a gate change silently falling back to the
        XLA vjp costs ~25 ms/step)."""
        from aicity_action_tpu.ops.pallas.fused_dense import (
            ln_mlp_bwd_supported, ln_qkv_bwd_supported)

        from aicity_action_tpu.ops.pallas.fused_dense import (
            ln_mlp_bwd_hsplit_supported)

        B = 4
        stages = [(100352, 96), (25088, 192), (6272, 384), (1568, 768)]
        for L, D in stages:
            assert ln_qkv_bwd_supported(B * L, D, 3 * D), (L, D)
        for L, D in stages[:-1]:
            assert ln_mlp_bwd_supported(B * L, D, 4 * D, D), (L, D)
        # the D=768 MLP busts the single-pass VMEM budget but must be
        # covered by the H-sliced kernel
        L, D = stages[-1]
        assert not ln_mlp_bwd_supported(B * L, D, 4 * D, D)
        assert ln_mlp_bwd_hsplit_supported(B * L, D, 4 * D, D)
        # ... at 224-crop bs8 too (8 * 392 rows)
        assert ln_mlp_bwd_hsplit_supported(8 * 392, D, 4 * D, D)
        # stage-transition qkv (dim doubles)
        for L, D in stages[:-1]:
            assert ln_qkv_bwd_supported(B * L, D, 6 * D), (L, D)

    def test_ln_mlp_hsplit_grad(self):
        """H-sliced MLP backward (the D=768/H=3072 stage) vs the jnp
        reference vjp, at the real channel shapes with a reduced row
        count (interpret mode)."""
        from aicity_action_tpu.ops.pallas import flash_attention as fa
        from aicity_action_tpu.ops.pallas.fused_dense import (
            _hsplit_plan, _ref_ln_mlp, fused_ln_mlp, ln_mlp_bwd_supported)

        rng = np.random.RandomState(2)
        M, D, H, C = 448, 768, 3072, 768
        assert not ln_mlp_bwd_supported(M, D, H, C)
        assert _hsplit_plan(M, D, H, C) is not None
        args = [
            jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.3
            for s in [(M, D), (D,), (D,), (D, H), (H,), (H, C), (C,)]
        ]
        old = fa.INTERPRET
        fa.INTERPRET = True
        try:
            g = jax.grad(lambda *a: fused_ln_mlp(*a, 1e-6).sum(),
                         argnums=tuple(range(7)))(*args)
        finally:
            fa.INTERPRET = old
        gw = jax.grad(lambda *a: _ref_ln_mlp(*a, 1e-6).sum(),
                      argnums=tuple(range(7)))(*args)
        for a, e in zip(g, gw):
            scale = max(1.0, float(np.abs(np.asarray(e)).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(e) / scale,
                rtol=2e-4, atol=2e-4)

    def test_ln_mlp_and_grad(self):
        from aicity_action_tpu.ops.pallas import flash_attention as fa
        from aicity_action_tpu.ops.pallas.fused_dense import (
            _ref_ln_mlp, fused_ln_mlp)

        rng = np.random.RandomState(1)
        M, D, H, C = 64, 32, 64, 32
        args = [
            jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.5
            for s in [(M, D), (D,), (D,), (D, H), (H,), (H, C), (C,)]
        ]
        old = fa.INTERPRET
        fa.INTERPRET = True
        try:
            got = fused_ln_mlp(*args, 1e-6)
            g = jax.grad(lambda *a: fused_ln_mlp(*a, 1e-6).sum(),
                         argnums=tuple(range(7)))(*args)
        finally:
            fa.INTERPRET = old
        want = _ref_ln_mlp(*args, 1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        gw = jax.grad(lambda *a: _ref_ln_mlp(*a, 1e-6).sum(),
                      argnums=tuple(range(7)))(*args)
        for a, e in zip(g, gw):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=1e-4, atol=1e-4)


# ------------------------------------------------- padded (cls-token) path
@pytest.mark.parametrize("G,Lq,Lk,d", [
    (2, 393, 393, 96),    # 1 + 8*7*7: MViT-v1 K400 cls layout
    (1, 1569, 99, 32),    # odd both ways
    (2, 25089, 1569, 96), # 1 + 56*56*8 q against 1 + 1568 kv
])
def test_padded_forward_parity(G, Lq, Lk, d):
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(G, Lq, d), jnp.float32)
    k = jnp.asarray(rs.randn(G, Lk, d), jnp.float32)
    v = jnp.asarray(rs.randn(G, Lk, d), jnp.float32)
    scale = d ** -0.5
    assert fa.flash_attention_padded_supported(Lq, Lk, d)
    out = fa.flash_attention_padded(q, k, v, scale)
    assert out.shape == (G, Lq, d)
    ref = _ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_padded_vjp_matches_reference():
    rs = np.random.RandomState(2)
    G, Lq, Lk, d = 2, 129, 67, 32
    q = jnp.asarray(rs.randn(G, Lq, d), jnp.float32)
    k = jnp.asarray(rs.randn(G, Lk, d), jnp.float32)
    v = jnp.asarray(rs.randn(G, Lk, d), jnp.float32)
    scale = d ** -0.5
    cot = jnp.asarray(rs.randn(G, Lq, d), jnp.float32)

    out, vjp = jax.vjp(lambda q, k, v: fa.flash_attention_padded(
        q, k, v, scale), q, k, v)
    dq, dk, dv = vjp(cot)
    ref_out, ref_vjp = jax.vjp(lambda q, k, v: _ref(q, k, v, scale).astype(
        q.dtype), q, k, v)
    rdq, rdk, rdv = ref_vjp(cot)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=1e-4)
    for a, b in zip((dq, dk, dv), (rdq, rdk, rdv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3)
