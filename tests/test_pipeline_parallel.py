"""Pipeline parallelism (parallel/pp.py): stage splitting, pipelined
forward parity vs the dense MViT, and GPipe recompute-backward gradient
parity vs a single-device value_and_grad — on the multi-device CPU mesh
(conftest forces 8 virtual devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.models.build import build_model
from aicity_action_tpu.models.mvit import build_mvit_spec
from aicity_action_tpu.parallel.pp import (
    MViTPipeline,
    block_flops,
    merge_stage_params,
    split_pp_stages,
    split_stage_params,
    thw_schedule,
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


def _build(cls_on=False, expand_front=True):
    cfg = _cfg(cls_on=cls_on, expand_front=expand_front)
    module, params = build_model(cfg)
    spec = build_mvit_spec(cfg)
    x = np.random.RandomState(0).randn(
        4, cfg.DATA.NUM_FRAMES, 32, 32, 3).astype(np.float32)
    return cfg, module, params, spec, x


def test_split_pp_stages_balanced_and_contiguous():
    cfg = _cfg()
    spec = build_mvit_spec(cfg)
    sched = thw_schedule(spec)
    costs = [block_flops(spec, i, sched[i]) for i in range(len(spec.blocks))]
    for n in (1, 2, 4):
        ranges = split_pp_stages(spec, n)
        assert len(ranges) == n
        assert ranges[0][0] == 0 and ranges[-1][1] == len(spec.blocks)
        for (a, b), (c, d) in zip(ranges, ranges[1:]):
            assert b == c and a < b and c < d
        # DP optimum can't be worse than the naive equal-depth split
        def max_cost(rs):
            return max(sum(costs[a:b]) for a, b in rs)
        step = len(costs) // n
        naive = [(i * step, (i + 1) * step if i < n - 1 else len(costs))
                 for i in range(n)]
        assert max_cost(ranges) <= max_cost(naive) + 1e-6


def test_stage_params_partition_is_disjoint_and_complete():
    cfg = _cfg(cls_on=True)
    _, params = build_model(cfg)
    spec = build_mvit_spec(cfg)
    ranges = split_pp_stages(spec, 2)
    parts = split_stage_params(params, spec, ranges)
    seen = set()
    for p in parts:
        assert not (seen & set(p)), "stage params overlap"
        seen |= set(p)
    assert seen == set(params), (seen ^ set(params))
    merged = merge_stage_params(parts)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        merged, dict(params)))


@pytest.mark.parametrize("cls_on", [False, True])
@pytest.mark.parametrize("n_stages", [2, 4])
def test_pp_forward_parity(cls_on, n_stages):
    cfg, module, params, spec, x = _build(cls_on=cls_on)
    want = np.asarray(
        module.apply({"params": params}, [jnp.asarray(x)], train=False))
    pipe = MViTPipeline(params, spec, jax.devices()[:n_stages])
    got = np.asarray(jax.nn.softmax(pipe.apply(x, n_microbatches=2), -1))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pp_grad_parity_and_microbatch_invariance():
    cfg, module, params, spec, x = _build(cls_on=False)
    y = np.asarray([0, 3, 1, 4], np.int32)

    def dense_loss(p):
        logits = module.apply({"params": p}, [jnp.asarray(x)], train=True)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.take_along_axis(logp, jnp.asarray(y)[:, None], 1).mean()

    want_loss, want_grads = jax.value_and_grad(dense_loss)(params)

    pipe = MViTPipeline(params, spec, jax.devices()[:2])
    for M in (1, 2, 4):
        loss, stage_grads = pipe.loss_and_grads(x, y, n_microbatches=M)
        np.testing.assert_allclose(
            float(loss), float(want_loss), atol=1e-5,
            err_msg=f"M={M}")
        got = merge_stage_params([jax.device_get(g) for g in stage_grads])
        flat_w, _ = jax.tree_util.tree_flatten_with_path(dict(want_grads))
        flat_g = dict(jax.tree_util.tree_flatten_with_path(got)[0])
        for path, w in flat_w:
            g = flat_g[path]
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=3e-5,
                err_msg=f"M={M} leaf={jax.tree_util.keystr(path)}")


def test_pp_sgd_step_decreases_loss():
    cfg, module, params, spec, x = _build(cls_on=False)
    y = np.asarray([0, 3, 1, 4], np.int32)
    pipe = MViTPipeline(params, spec, jax.devices()[:2])
    l0 = float(pipe.sgd_step(x, y, lr=0.05, n_microbatches=2))
    l1 = float(pipe.sgd_step(x, y, lr=0.05, n_microbatches=2))
    assert l1 < l0, (l0, l1)


def test_pp_droppath_microbatch_invariance_and_effect():
    """Stochastic depth through the pipe: masks are drawn per (block,
    GLOBAL sample), so gradients are exactly invariant to the microbatch
    count; with rate ~1 the surviving model differs from eval."""
    cfg = _cfg(cls_on=False)
    cfg.MVIT.DROPPATH_RATE = 0.5
    module, params = build_model(cfg)
    spec = build_mvit_spec(cfg)
    rs = np.random.RandomState(1)
    x = rs.randn(4, cfg.DATA.NUM_FRAMES, 32, 32, 3).astype(np.float32)
    y = np.asarray([0, 3, 1, 4], np.int32)
    pipe = MViTPipeline(params, spec, jax.devices()[:2])
    key = jax.random.PRNGKey(7)

    ref_loss, ref_grads = pipe.loss_and_grads(
        x, y, n_microbatches=1, droppath_key=key)
    for M in (2, 4):
        loss, grads = pipe.loss_and_grads(
            x, y, n_microbatches=M, droppath_key=key)
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(grads)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-6)
    # masks bite: the stochastic loss differs from the deterministic one
    det_loss, _ = pipe.loss_and_grads(x, y, n_microbatches=1)
    assert abs(float(ref_loss) - float(det_loss)) > 1e-4
    # and a fresh key redraws different masks
    other, _ = pipe.loss_and_grads(
        x, y, n_microbatches=1, droppath_key=jax.random.PRNGKey(8))
    assert abs(float(ref_loss) - float(other)) > 1e-6


def test_pp_optax_step_with_droppath_trains():
    """init_optimizer/opt_step: per-stage adamw state on each stage's
    device; the aicity-style recipe (drop-path on) reduces loss."""
    import optax

    cfg = _cfg(cls_on=False)
    cfg.MVIT.DROPPATH_RATE = 0.1
    module, params = build_model(cfg)
    spec = build_mvit_spec(cfg)
    rs = np.random.RandomState(2)
    x = rs.randn(4, cfg.DATA.NUM_FRAMES, 32, 32, 3).astype(np.float32)
    y = np.asarray([0, 3, 1, 4], np.int32)
    pipe = MViTPipeline(params, spec, jax.devices()[:4])
    pipe.init_optimizer(optax.adamw(3e-3))
    key = jax.random.PRNGKey(0)
    losses = [
        float(pipe.opt_step(x, y, n_microbatches=2,
                            droppath_key=jax.random.fold_in(key, i)))
        for i in range(4)
    ]
    assert losses[-1] < losses[0], losses
    # optimizer state lives per stage: each mu leaf sits on its device
    for s in range(pipe.n_stages):
        mu = jax.tree.leaves(pipe.opt_states[s])[1]
        assert list(mu.devices())[0] == pipe.devices[s]
