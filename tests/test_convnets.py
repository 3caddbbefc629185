"""Conv-backbone parity and smoke tests.

Block-level numerics are checked against the reference's own
resnet_helper/stem_helper (loaded standalone, torch CPU); full models get
shape/finiteness smoke tests plus a train-step integration check (BatchNorm
batch_stats must update).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.models.convnets import (
    BottleneckTransform,
    Nonlocal,
    ResBlock,
    ResNetBasicStem,
    SE,
    X3DTransform,
)

from ref_oracle import load_reference_convnets, torch_to_numpy

torch = pytest.importorskip("torch")


def _bn_params(tbn):
    return (
        {"scale": torch_to_numpy(tbn.weight), "bias": torch_to_numpy(tbn.bias)},
        {"mean": torch_to_numpy(tbn.running_mean),
         "var": torch_to_numpy(tbn.running_var)},
    )


def _conv_w(tconv):
    # torch [O, I/g, kT, kH, kW] -> flax [kT, kH, kW, I/g, O]
    return torch_to_numpy(tconv.weight).transpose(2, 3, 4, 1, 0)


def _norm_factory():
    import flax.linen as nn
    from aicity_action_tpu.models.convnets import BatchNorm

    return lambda name=None: BatchNorm(name=name)


def _randomize_bn(module):
    """Give BN layers non-trivial affine + running stats."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)


class TestBottleneckParity:
    def test_eval_forward(self):
        ref_resnet, _ = load_reference_convnets()
        torch.manual_seed(0)
        dim_in, dim_out, dim_inner = 8, 16, 4
        tblock = ref_resnet.BottleneckTransform(
            dim_in, dim_out, temp_kernel_size=3, stride=2,
            dim_inner=dim_inner, num_groups=1,
        ).eval()
        _randomize_bn(tblock)

        x = np.random.RandomState(0).randn(2, 4, 8, 8, dim_in).astype(np.float32)
        with torch.no_grad():
            ref_out = tblock(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
        ref_out = torch_to_numpy(ref_out).transpose(0, 2, 3, 4, 1)

        norm = _norm_factory()
        jblock = BottleneckTransform(
            dim_out=dim_out, dim_inner=dim_inner, temp_kernel_size=3,
            stride=2, num_groups=1, norm=norm, final_norm=norm,
        )
        a_aff, a_stats = _bn_params(tblock.a_bn)
        b_aff, b_stats = _bn_params(tblock.b_bn)
        c_aff, c_stats = _bn_params(tblock.c_bn)
        variables = {
            "params": {
                "a": {"kernel": _conv_w(tblock.a)},
                "a_bn": {"bn": a_aff},
                "b": {"kernel": _conv_w(tblock.b)},
                "b_bn": {"bn": b_aff},
                "c": {"kernel": _conv_w(tblock.c)},
                "c_bn": {"bn": c_aff},
            },
            "batch_stats": {
                "a_bn": {"bn": a_stats},
                "b_bn": {"bn": b_stats},
                "c_bn": {"bn": c_stats},
            },
        }
        out = jblock.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=3e-5, rtol=1e-4)


class TestStemParity:
    def test_basic_stem(self):
        _, ref_stem = load_reference_convnets()
        torch.manual_seed(1)
        tstem = ref_stem.ResNetBasicStem(
            3, 8, [5, 7, 7], [1, 2, 2], [2, 3, 3]).eval()
        _randomize_bn(tstem)
        x = np.random.RandomState(1).randn(2, 8, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            ref_out = tstem(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
        ref_out = torch_to_numpy(ref_out).transpose(0, 2, 3, 4, 1)

        norm = _norm_factory()
        jstem = ResNetBasicStem(
            dim_out=8, kernel=(5, 7, 7), stride=(1, 2, 2),
            padding=(2, 3, 3), norm=norm)
        aff, stats = _bn_params(tstem.bn)
        variables = {
            "params": {
                "conv": {"kernel": _conv_w(tstem.conv),
                         "bias": torch_to_numpy(tstem.conv.bias)}
                if tstem.conv.bias is not None
                else {"kernel": _conv_w(tstem.conv)},
                "norm": {"bn": aff},
            },
            "batch_stats": {"norm": {"bn": stats}},
        }
        out = jstem.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=3e-5, rtol=1e-4)


def _tiny_conv_cfg(model_name, arch):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = model_name
    cfg.MODEL.ARCH = arch
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.DATA.INPUT_CHANNEL_NUM = [3, 3]
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.X3D.DIM_C1 = 8
    cfg.X3D.DIM_C5 = 32
    return cfg


@pytest.mark.parametrize("name,arch,pathways", [
    ("ResNet", "slow", 1),
    ("ResNet", "i3d", 1),
    ("ResNet", "c2d", 1),
    ("SlowFast", "slowfast", 2),
    ("X3D", "x3d", 1),
])
def test_model_smoke(name, arch, pathways):
    from aicity_action_tpu.models.build import build_model_with_state

    cfg = _tiny_conv_cfg(name, arch)
    if pathways == 1:
        cfg.DATA.INPUT_CHANNEL_NUM = [3]
    module, params, model_state = build_model_with_state(cfg)
    assert "batch_stats" in model_state

    B, T, S = 2, cfg.DATA.NUM_FRAMES, 64
    if pathways == 2:
        x = [jnp.ones((B, T // cfg.SLOWFAST.ALPHA, S, S, 3)),
             jnp.ones((B, T, S, S, 3))]
    else:
        x = [jnp.ones((B, T, S, S, 3))]
    out = module.apply(
        {"params": params, **model_state}, x, train=False)
    assert out.shape == (B, 5)
    assert np.isfinite(np.asarray(out)).all()
    # eval head applies softmax
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-4)


def test_slowfast_train_step_updates_bn():
    import optax

    from aicity_action_tpu.engine.steps import TrainState, make_train_step
    from aicity_action_tpu.models.build import build_model_with_state

    cfg = _tiny_conv_cfg("SlowFast", "slowfast")
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    module, params, model_state = build_model_with_state(cfg)
    tx = optax.sgd(0.01)
    state = TrainState.create(params, tx, model_state)
    step = make_train_step(module, tx, "cross_entropy")

    B, T, S = 2, 8, 64
    batch = {
        "inputs": [jnp.ones((B, 2, S, S, 3)), jnp.ones((B, T, S, S, 3))],
        "labels": jnp.asarray([0, 1]),
    }
    new_state, metrics, _ = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # BN running stats must have moved
    old = jax.tree.leaves(state.model_state["batch_stats"])
    new = jax.tree.leaves(new_state.model_state["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )
