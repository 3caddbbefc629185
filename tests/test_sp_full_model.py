"""Full-model sequence parallelism parity (parallel/sp_model.py).

The H-sharded forward must reproduce the dense MViT.apply bit-for-bit-ish
(f32, same op order per token) across the REAL schedule features: h>1
heads, q-pooling, adaptive kv strides, channel expansion (front and back),
cls tokens, and the sharded->dense hand-off when the grid stops dividing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.models.build import build_model
from aicity_action_tpu.models.mvit import build_mvit_spec
from aicity_action_tpu.parallel.sp_model import (
    plan_sp_blocks,
    sp_apply,
    sp_forward,
)


def _cfg(cls_on=False, expand_front=True, depth=4):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.MODEL.HEAD_ACT = "softmax"
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    m = cfg.MVIT
    m.EMBED_DIM = 16
    m.DEPTH = depth
    m.NUM_HEADS = 2
    m.PATCH_PADDING = (1, 3, 3)
    m.DIM_MUL = [[1, 2.0]]
    m.HEAD_MUL = [[1, 2.0]]
    m.POOL_KVQ_KERNEL = [3, 3, 3]
    m.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    m.POOL_Q_STRIDE = [[1, 1, 2, 2], [2, 1, 2, 2]]
    m.CLS_EMBED_ON = cls_on
    m.SEP_POS_EMBED = True
    m.CHANNEL_EXPAND_FRONT = expand_front
    m.Q_POOL_ALL = True
    m.Q_POOL_RESIDUAL = True
    m.DROPPATH_RATE = 0.0
    return cfg


def _dense_logits(cfg, module, params, x):
    out = module.apply({"params": params}, [jnp.asarray(x)], train=False)
    return np.asarray(out)


def _sp_logits(cfg, params, x, n_sp, shard_axis="h"):
    spec = build_mvit_spec(cfg)
    mesh = Mesh(np.array(jax.devices()[:n_sp]), ("sp",))
    logits = sp_apply(params, spec, jnp.asarray(x), mesh,
                      shard_axis=shard_axis)
    return np.asarray(jax.nn.softmax(logits, axis=-1))


@pytest.mark.parametrize("cls_on,expand_front,n_sp", [
    (False, True, 2),    # flagship shape (aicity: no cls, expand front)
    (False, True, 4),    # forces the sharded->dense hand-off at block 2
    (True, False, 2),    # cls token + MLP-side channel change
])
def test_full_model_parity(cls_on, expand_front, n_sp):
    cfg = _cfg(cls_on=cls_on, expand_front=expand_front)
    module, params = build_model(cfg)
    spec = build_mvit_spec(cfg)
    n_plan = plan_sp_blocks(spec, n_sp)
    if n_sp == 4:
        assert n_plan == 2, n_plan  # hand-off mid-model
    else:
        assert n_plan == len(spec.blocks), n_plan  # fully sharded

    x = np.random.RandomState(0).randn(2, 8, 32, 32, 3).astype(np.float32)
    want = _dense_logits(cfg, module, params, x)
    got = _sp_logits(cfg, params, x, n_sp)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("cls_on,n_sp", [
    (False, 2),
    (False, 4),   # T=4 post-patch: every shard holds ONE frame + halos
    (True, 2),
])
def test_t_axis_full_model_parity(cls_on, n_sp):
    """T-frame sharding (shard_axis="t"): the tiny schedule's temporal
    pooling strides are 1 everywhere, so ALL blocks stay sharded at any
    n_sp dividing T — the axis the flagship 448 config scales past 2-way
    (H=112 trips the kv-stride-8 alignment; T=8 does not)."""
    cfg = _cfg(cls_on=cls_on)
    module, params = build_model(cfg)
    spec = build_mvit_spec(cfg)
    assert plan_sp_blocks(spec, n_sp, "t") == len(spec.blocks)

    x = np.random.RandomState(3).randn(2, 8, 32, 32, 3).astype(np.float32)
    want = _dense_logits(cfg, module, params, x)
    got = _sp_logits(cfg, params, x, n_sp, shard_axis="t")
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_t_axis_gradients():
    """Gradients through the T-axis halo exchanges/gathers match dense."""
    cfg = _cfg()
    module, params = build_model(cfg)
    spec = build_mvit_spec(cfg)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    x = jnp.asarray(
        np.random.RandomState(4).randn(1, 8, 32, 32, 3).astype(np.float32))

    def sp_loss(p):
        return sp_apply(p, spec, x, mesh, shard_axis="t").sum()

    def dense_loss(p):
        # train=True: eval mode applies the softmax head activation, which
        # makes sum(out) constant; droppath/dropout are 0 so the math is
        # identical to the SP path's activation-free logits
        rngs = {"dropout": jax.random.PRNGKey(0),
                "droppath": jax.random.PRNGKey(1)}
        out = module.apply({"params": p}, [x], train=True, rngs=rngs)
        return out.sum()

    g_sp = jax.tree.leaves(jax.grad(sp_loss)(params))
    g_dense = jax.tree.leaves(jax.grad(dense_loss)(params))
    assert len(g_sp) == len(g_dense)
    for a, b in zip(g_sp, g_dense):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            atol=3e-5, rtol=1e-4)


def test_non_dividing_mesh_falls_back_dense():
    """H % n_sp != 0 (post-patch H=8, 3 shards) must not slice the grid:
    plan_sp_blocks plans 0 sharded blocks and sp_apply runs fully dense,
    still matching the module (regression: the slice used to run
    unconditionally, silently dropping token rows)."""
    cfg = _cfg()
    module, params = build_model(cfg)
    spec = build_mvit_spec(cfg)
    assert plan_sp_blocks(spec, 3) == 0
    x = np.random.RandomState(2).randn(1, 8, 32, 32, 3).astype(np.float32)
    want = _dense_logits(cfg, module, params, x)
    got = _sp_logits(cfg, params, x, 3)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_dense_reference_path_matches_module():
    """sp_forward with axis_name=None is the pure-function reference —
    it must match MViT.apply exactly (guards drift between the two)."""
    cfg = _cfg()
    module, params = build_model(cfg)
    spec = build_mvit_spec(cfg)
    x = np.random.RandomState(1).randn(1, 8, 32, 32, 3).astype(np.float32)
    logits = sp_forward(params, spec, jnp.asarray(x), axis_name=None,
                        n_sp=1)
    got = np.asarray(jax.nn.softmax(logits, axis=-1))
    want = _dense_logits(cfg, module, params, x)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_gradients_flow_through_sp():
    """Gradients through halo exchanges + all_gathers match the dense
    gradients (training viability, not just inference)."""
    cfg = _cfg()
    module, params = build_model(cfg)
    spec = build_mvit_spec(cfg)
    mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
    x = jnp.asarray(
        np.random.RandomState(2).randn(1, 8, 32, 32, 3).astype(np.float32))

    def sp_loss(p):
        return sp_apply(p, spec, x, mesh).sum()

    def dense_loss(p):
        rngs = {"dropout": jax.random.PRNGKey(0),
                "droppath": jax.random.PRNGKey(1)}
        out = module.apply({"params": p}, [x], train=True, rngs=rngs)
        return out.sum()

    g_sp = jax.grad(sp_loss)(params)
    g_dense = jax.grad(dense_loss)(params)
    flat_sp = jax.tree.leaves(g_sp)
    flat_dense = jax.tree.leaves(g_dense)
    assert len(flat_sp) == len(flat_dense)
    for a, b in zip(flat_sp, flat_dense):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            atol=3e-5, rtol=1e-4)
