"""MoE MLP (models/moe.py) + expert parallelism (parallel/ep.py).

Beyond-reference capability (the reference has no MoE — SURVEY §2.2);
correctness is pinned three ways:
- the static-shape dispatch/combine einsum machinery against a per-token
  python loop implementing the same slot-major capacity rule,
- the expert-parallel shard_map path (two all_to_alls) against the dense
  layer, outputs AND gradients,
- the GSPMD route (expert-sharded params, unchanged train step) against
  the unsharded step's loss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.models.moe import (
    MoESpec,
    moe_apply,
    moe_ffn,
    route_tokens,
)
from aicity_action_tpu.parallel.ep import (
    ep_moe_mlp,
    moe_param_shardings,
)


def _layer_params(rng, D, H, E, O=None, scale=0.5):
    O = O or D
    ks = rng.standard_normal
    return {
        "ln_scale": jnp.asarray(1.0 + 0.1 * ks(D), jnp.float32),
        "ln_bias": jnp.asarray(0.1 * ks(D), jnp.float32),
        "router": jnp.asarray(scale * ks((D, E)), jnp.float32),
        "fc1": {"kernel": jnp.asarray(scale * ks((E, D, H)), jnp.float32),
                "bias": jnp.asarray(0.1 * ks((E, H)), jnp.float32)},
        "fc2": {"kernel": jnp.asarray(scale * ks((E, H, O)), jnp.float32),
                "bias": jnp.asarray(0.1 * ks((E, O)), jnp.float32)},
    }


def _oracle_moe(params, x, top_k, capacity_factor):
    """Per-token loop implementing the documented routing contract:
    slot-major priority (all top-1 picks claim capacity before any
    top-2 pick), token order within a slot, gates renormalized over the
    token's top-k, dropped (token, slot) pairs contribute nothing."""
    from scipy.special import softmax as sp_softmax

    B, L, D = x.shape
    E = params["router"].shape[1]
    C = MoESpec(num_experts=E, top_k=top_k,
                capacity_factor=capacity_factor).capacity(L)
    out = np.zeros((B, L, params["fc2"]["kernel"].shape[2]), np.float32)
    xf = np.asarray(x, np.float64)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xn = ((xf - mean) / np.sqrt(var + 1e-6)
          * np.asarray(params["ln_scale"], np.float64)
          + np.asarray(params["ln_bias"], np.float64))

    def ffn(e, t):  # expert e on token t (f32 like the layer)
        h = np.asarray(t, np.float32) @ np.asarray(
            params["fc1"]["kernel"][e]) + np.asarray(
            params["fc1"]["bias"][e])
        from scipy.stats import norm
        g = h * norm.cdf(h)  # exact gelu
        return g @ np.asarray(params["fc2"]["kernel"][e]) + np.asarray(
            params["fc2"]["bias"][e])

    for b in range(B):
        probs = sp_softmax(
            np.asarray(xn[b] @ np.asarray(params["router"], np.float64),
                       np.float32), axis=-1)
        idx = np.argsort(-probs, axis=-1, kind="stable")[:, :top_k]
        gates = np.take_along_axis(probs, idx, axis=-1)
        gates = gates / np.maximum(gates.sum(-1, keepdims=True), 1e-9)
        counts = np.zeros(E, np.int64)
        for slot in range(top_k):
            for t in range(L):
                e = idx[t, slot]
                if counts[e] < C:
                    counts[e] += 1
                    out[b, t] += gates[t, slot] * ffn(e, xn[b, t])
    return out


@pytest.mark.parametrize("top_k,cf", [(1, 1.0), (2, 1.25), (2, 0.4)])
def test_dispatch_matches_loop_oracle(top_k, cf):
    rng = np.random.default_rng(0)
    B, L, D, H, E = 2, 24, 8, 16, 4
    params = _layer_params(rng, D, H, E)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    y, aux = jax.jit(
        lambda p, t: moe_apply(p, t, top_k=top_k, capacity_factor=cf)
    )(params, x)
    y_ref = _oracle_moe(params, np.asarray(x), top_k, cf)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)
    assert np.isfinite(float(aux))


def test_no_drop_uses_all_topk_and_drops_under_tiny_capacity():
    rng = np.random.default_rng(1)
    B, L, D, H, E = 1, 16, 8, 8, 4
    params = _layer_params(rng, D, H, E)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    # cf huge -> nothing drops; every token's renormalized gates sum to 1
    _, dispatch, combine, _ = route_tokens(
        params, x, num_experts=E, top_k=2, capacity_factor=10.0)
    np.testing.assert_allclose(
        np.asarray(dispatch.sum(axis=(2, 3))), 2.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(combine.sum(axis=(2, 3))), 1.0, atol=1e-6)
    # capacity C=1 total slots E*C=4 < 2*L -> most (token, slot)s drop
    _, d2, c2, _ = route_tokens(
        params, x, num_experts=E, top_k=2, capacity_factor=1.0 / 8)
    assert float(d2.sum()) == E * 1.0  # exactly C slots filled per expert
    dropped = np.asarray(c2.sum(axis=(2, 3)))[0]
    assert (dropped == 0).sum() >= L - E  # fully-dropped tokens emit zero


def test_aux_loss_is_one_for_uniform_router():
    rng = np.random.default_rng(2)
    D, H, E = 8, 8, 4
    params = _layer_params(rng, D, H, E)
    params["router"] = jnp.zeros((D, E), jnp.float32)  # uniform probs
    x = jnp.asarray(rng.standard_normal((2, 32, D)), jnp.float32)
    # uniform probs: p_e = 1/E; f from top-k tie-break is degenerate, so
    # aux = E * sum_e f_e * (1/E) = sum_e f_e = 1 regardless of ties
    _, _, _, aux = route_tokens(params, x, num_experts=E, top_k=2,
                                capacity_factor=2.0)
    assert abs(float(aux) - 1.0) < 1e-5


def _moe_cfg(depth=4, experts=4, layers=(1, 3)):
    cfg = get_cfg()
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.MODEL.HEAD_ACT = "softmax"
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    m = cfg.MVIT
    m.EMBED_DIM = 16
    m.DEPTH = depth
    m.NUM_HEADS = 2
    m.PATCH_KERNEL = [3, 7, 7]
    m.PATCH_STRIDE = [2, 4, 4]
    m.PATCH_PADDING = [1, 3, 3]
    m.DROPPATH_RATE = 0.0
    m.MOE.ENABLE = True
    m.MOE.NUM_EXPERTS = experts
    m.MOE.LAYERS = list(layers)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_moe_layer_on_channel_change_block_raises():
    from aicity_action_tpu.models.mvit import build_mvit_spec

    # non-expand-front: block i's MLP carries the dim change when
    # dim_mul[i+1] != 1, so DIM_MUL at index 1 makes block 0 the
    # channel-change block
    cfg = _moe_cfg(layers=(0,))
    cfg.MVIT.DIM_MUL = [[1, 2.0]]
    with pytest.raises(ValueError, match="changes"):
        build_mvit_spec(cfg)


def test_mvit_moe_trains_and_aux_reaches_loss():
    import optax

    from aicity_action_tpu.engine.steps import TrainState, make_train_step
    from aicity_action_tpu.models.build import build_model

    cfg = _moe_cfg()
    module, params = build_model(cfg)
    tx = optax.adamw(1e-3)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 7, 4), jnp.int32)
    batch = {"inputs": [x], "labels": labels}
    key = jax.random.PRNGKey(0)

    losses = {}
    for w in (0.0, 10.0):
        step = jax.jit(make_train_step(
            module, tx, "cross_entropy", num_classes=7, moe_aux_weight=w))
        state = TrainState.create(params, tx)
        state, metrics, _ = step(state, batch, key)
        losses[w] = float(metrics["loss"])
        assert np.isfinite(losses[w])
        # router must receive gradient through the combine weights
        if w == 0.0:
            l0 = losses[w]
            g = jax.grad(lambda p: step(
                TrainState.create(p, tx), batch, key)[1]["loss"])(params)
            rg = np.asarray(g["blocks_1"]["mlp"]["router"])
            assert np.abs(rg).max() > 0
    # the balanced-routing init makes aux ~1.0; the weighted loss must
    # sit ~w*aux above the unweighted one
    assert losses[10.0] > l0 + 5.0


def _mesh(shape, names):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize("n_ep,top_k", [(2, 2), (4, 1), (4, 2)])
def test_ep_shard_map_matches_dense(n_ep, top_k):
    rng = np.random.default_rng(4)
    B, L, D, H, E = 4, 24, 8, 16, 8
    params = _layer_params(rng, D, H, E)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    y_dense, aux_dense = moe_apply(params, x, top_k=top_k,
                                   capacity_factor=1.25)
    mesh = _mesh((n_ep,), ("ep",))
    y_ep, aux_ep = ep_moe_mlp(mesh, params, x, top_k=top_k,
                              capacity_factor=1.25)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_dense),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(aux_ep), float(aux_dense), rtol=1e-5)


def test_ep_gradients_match_dense():
    rng = np.random.default_rng(5)
    B, L, D, H, E = 4, 16, 8, 8, 4
    params = _layer_params(rng, D, H, E)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)

    def loss_dense(p):
        y, aux = moe_apply(p, x, top_k=2, capacity_factor=1.25)
        return jnp.mean((y - tgt) ** 2) + 0.01 * aux

    mesh = _mesh((4,), ("ep",))

    def loss_ep(p):
        y, aux = ep_moe_mlp(mesh, p, x, top_k=2, capacity_factor=1.25)
        return jnp.mean((y - tgt) ** 2) + 0.01 * aux

    gd = jax.grad(loss_dense)(params)
    ge = jax.grad(loss_ep)(params)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(gd)[0],
            jax.tree_util.tree_flatten_with_path(ge)[0]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5,
            err_msg=jax.tree_util.keystr(kp))


def test_gspmd_expert_sharded_train_step():
    """The unchanged jitted train step over a (dp, ep) mesh with the MoE
    banks sharded over "ep": same loss as unsharded, expert leaves
    actually sharded."""
    import optax

    from aicity_action_tpu.engine.steps import TrainState, make_train_step
    from aicity_action_tpu.models.build import build_model
    from aicity_action_tpu.parallel.ep import ep_state_shardings

    cfg = _moe_cfg()
    module, params = build_model(cfg)
    tx = optax.adamw(1e-3)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((4, 4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 7, 4), jnp.int32)
    batch = {"inputs": [x], "labels": labels}
    key = jax.random.PRNGKey(0)
    step = make_train_step(module, tx, "cross_entropy", num_classes=7,
                           moe_aux_weight=0.01)

    state = TrainState.create(params, tx)
    _, m_dense, _ = jax.jit(step)(state, batch, key)

    mesh = _mesh((2, 4), ("data", "ep"))
    sh = ep_state_shardings(mesh, state, "ep")
    state_sh = jax.device_put(state, sh)
    w1 = state_sh.params["blocks_1"]["mlp"]["fc1_kernel"]
    assert not w1.sharding.is_fully_replicated  # experts genuinely split
    b_sh = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(
            mesh, P(("data",) if getattr(a, "ndim", 0) > 0 else None))),
        batch)
    new_state, m_ep, _ = jax.jit(step)(state_sh, b_sh, key)
    np.testing.assert_allclose(float(m_ep["loss"]), float(m_dense["loss"]),
                               rtol=1e-5)
    # updated expert banks keep their "ep" sharding through the step
    w1n = new_state.params["blocks_1"]["mlp"]["fc1_kernel"]
    assert not w1n.sharding.is_fully_replicated


def test_moe_aux_survives_act_checkpoint():
    """nn.remat must not swallow the sown aux losses (ACT_CHECKPOINT on)."""
    from aicity_action_tpu.models.build import build_model

    cfg = _moe_cfg()
    cfg.MODEL.ACT_CHECKPOINT = True
    module, params = build_model(cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32)
    _, st = module.apply(
        {"params": params}, [x], train=True,
        rngs={"dropout": jax.random.PRNGKey(0),
              "droppath": jax.random.PRNGKey(1)},
        mutable=["batch_stats", "intermediates"])
    leaves = jax.tree.leaves(st.get("intermediates", {}))
    assert len(leaves) == 2 and all(np.isfinite(float(v)) for v in leaves)


def test_moe_blocks_rejected_by_sp_and_pp():
    """Token-sharded SP would change per-sample routing; PP's block math
    is the dense MLP — both must refuse MoE specs loudly."""
    from aicity_action_tpu.models.build import build_model
    from aicity_action_tpu.models.mvit import build_mvit_spec
    from aicity_action_tpu.parallel.pp import MViTPipeline
    from aicity_action_tpu.parallel.sp_model import sp_apply

    cfg = _moe_cfg()
    module, params = build_model(cfg)
    spec = build_mvit_spec(cfg)
    with pytest.raises(NotImplementedError, match="MoE"):
        MViTPipeline(params, spec, jax.devices()[:2])
    mesh = _mesh((2,), ("sp",))
    x = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    with pytest.raises(NotImplementedError, match="MoE"):
        sp_apply(params, spec, x, mesh)
