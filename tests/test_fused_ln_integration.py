"""Interpret-mode integration test for the fused-LN attention branch.

Round-3 advice: the fused-LN wiring inside ``MultiScaleAttention``
(head-major packing, deferred ``_LNParams`` declaration, in-kernel v2
q-residual) requires ``jax.default_backend() == "tpu"`` and so was only
exercised on real hardware — a wiring mistake (wrong transpose, flag, or
param aliasing) would have surfaced only in the driver bench. Here the
branch is forced on CPU through the injectable ``mvit._use_pallas`` gate
with the Pallas interpreter, and asserted to be fully interchangeable with
the unfused XLA path: identical param tree, outputs, and grads.

Reference semantics under test: attention_pool LN placement
(/root/reference/slowfast/models/attention.py:12-83) and the v2 query
residual (attention.py:277-279).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicity_action_tpu.models import mvit as mvit_mod
from aicity_action_tpu.models.mvit import MultiScaleAttention
from aicity_action_tpu.ops.pallas import flash_attention as fa

B, T, H, W = 2, 2, 8, 8
DIM, HEADS = 64, 2
THW = (T, H, W)


def _module(q_residual=True):
    return MultiScaleAttention(
        dim=DIM, dim_out=DIM, num_heads=HEADS,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2), stride_kv=(1, 2, 2),
        mode="conv", qkv_bias=True, has_cls=False,
        q_pool_residual=q_residual,
    )


def _x(seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(B, T * H * W, DIM), jnp.float32)


def _force_fused(monkeypatch):
    monkeypatch.setattr(fa, "INTERPRET", True)
    monkeypatch.setattr(mvit_mod, "_use_pallas", lambda: True)
    monkeypatch.setenv("AICITY_TPU_FUSE_ATTN_LN", "1")


def test_shapes_supported():
    # the pooled test shapes must take the fused path, else this file
    # exercises nothing: Lq = Lk = 2*4*4 = 32, d = 32
    assert fa.flash_attention_ln_supported(32, 32, 32, (True, True, True))


def test_param_tree_identical(monkeypatch):
    """The deferred-_LNParams declaration (fused) and the FusedLayerNorm
    declaration (unfused) must produce the same param tree, so checkpoints
    are interchangeable between the two code paths."""
    x = _x()
    unfused = _module().init(jax.random.PRNGKey(0), x, THW)["params"]
    _force_fused(monkeypatch)
    fused = _module().init(jax.random.PRNGKey(0), x, THW)["params"]

    flat_u = jax.tree_util.tree_flatten_with_path(unfused)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(fused)[0]
    paths_u = [(jax.tree_util.keystr(p), v.shape) for p, v in flat_u]
    paths_f = [(jax.tree_util.keystr(p), v.shape) for p, v in flat_f]
    assert paths_u == paths_f


@pytest.mark.parametrize("q_residual", [True, False])
def test_forward_parity_fused_vs_unfused(monkeypatch, q_residual):
    x = _x(1)
    mod = _module(q_residual)
    params = mod.init(jax.random.PRNGKey(2), x, THW)["params"]
    # make the LN params non-trivial so a dropped/aliased LN would show
    params = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.random.RandomState(3).randn(*v.shape)
        .astype(np.float32), params)
    out_ref, thw_ref = mod.apply({"params": params}, x, THW)

    _force_fused(monkeypatch)
    calls = []
    orig = fa.flash_attention_ln

    def recording(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "flash_attention_ln", recording)
    out_fused, thw_fused = mod.apply({"params": params}, x, THW)

    assert calls, "fused-LN kernel was not taken"
    assert tuple(thw_ref) == tuple(thw_fused)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=2e-5, rtol=1e-4)


def test_grad_parity_fused_vs_unfused(monkeypatch):
    x = _x(4)
    mod = _module()
    params = mod.init(jax.random.PRNGKey(5), x, THW)["params"]
    params = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.random.RandomState(6).randn(*v.shape)
        .astype(np.float32), params)

    def loss(p, xx):
        out, _ = mod.apply({"params": p}, xx, THW)
        return (out.astype(jnp.float32) ** 2).sum()

    g_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(params, x)
    _force_fused(monkeypatch)
    g_fused, gx_fused = jax.grad(loss, argnums=(0, 1))(params, x)

    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_f = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(g_fused)[0])
    for path, v_ref in flat_r:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(v_ref),
            atol=5e-4, rtol=2e-3, err_msg=f"grad mismatch at {key}")
    np.testing.assert_allclose(
        np.asarray(gx_fused), np.asarray(gx_ref), atol=5e-4, rtol=2e-3,
        err_msg="grad mismatch at input")


def test_fuse_env_gate(monkeypatch):
    """AICITY_TPU_FUSE_ATTN_LN=0 must keep the fused kernel out even when
    Pallas is available (the A/B measurement gate)."""
    x = _x(7)
    mod = _module()
    params = mod.init(jax.random.PRNGKey(8), x, THW)["params"]
    _force_fused(monkeypatch)
    monkeypatch.setenv("AICITY_TPU_FUSE_ATTN_LN", "0")
    calls = []
    orig = fa.flash_attention_ln

    def recording(*a, **kw):  # pragma: no cover - should not run
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "flash_attention_ln", recording)
    mod.apply({"params": params}, x, THW)
    assert not calls


def test_fuse_auto_mode_eval_only(monkeypatch):
    """Default (``auto``): the fused kernel runs at eval
    (deterministic=True) and stays out of the AD/train path
    (deterministic=False) — the measured win/loss split of DESIGN §17."""
    x = _x(9)
    mod = _module()
    params = mod.init(jax.random.PRNGKey(10), x, THW)["params"]
    _force_fused(monkeypatch)
    monkeypatch.delenv("AICITY_TPU_FUSE_ATTN_LN", raising=False)
    calls = []
    orig = fa.flash_attention_ln

    def recording(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "flash_attention_ln", recording)
    mod.apply({"params": params}, x, THW, deterministic=True)
    assert calls, "auto mode must fuse at eval"
    n_eval = len(calls)
    mod.apply({"params": params}, x, THW, deterministic=False,
              rngs={"dropout": jax.random.PRNGKey(11)})
    assert len(calls) == n_eval, "auto mode must not fuse in training"
