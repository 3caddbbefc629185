"""Solver and loss parity tests vs torch / reference math."""

import numpy as np
import pytest

import jax.numpy as jnp

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.models import losses as L
from aicity_action_tpu.solver.lr_policy import get_lr_at_epoch, make_lr_schedule

torch = pytest.importorskip("torch")


# ------------------------------------------------------------------ losses
def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_soft_cross_entropy_matches_torch():
    x, y = _rand((4, 10)), np.abs(_rand((4, 10), 1))
    y = y / y.sum(-1, keepdims=True)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    ref = torch.sum(-yt * torch.nn.functional.log_softmax(xt, dim=-1), dim=-1).mean()
    got = L.soft_cross_entropy(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_cross_entropy_matches_torch():
    x = _rand((6, 12))
    labels = np.array([0, 3, 11, 5, 2, 7])
    ref = torch.nn.CrossEntropyLoss()(torch.from_numpy(x), torch.from_numpy(labels))
    got = L.cross_entropy(jnp.asarray(x), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_bce_logit_matches_torch():
    x, y = _rand((4, 8)), (np.abs(_rand((4, 8), 2)) > 0.5).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(x), torch.from_numpy(y))
    got = L.bce_logit(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_nce_rce_matches_reference_formula():
    x = _rand((4, 5))
    y = np.eye(5, dtype=np.float32)[[0, 1, 2, 3]]
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    logp = torch.nn.functional.log_softmax(xt, dim=-1)
    nce = (-(yt * logp).sum(-1) / (-logp.sum(-1))).mean()
    p = torch.clamp(torch.softmax(xt, -1), 1e-7, 1.0)
    rce = (-(torch.clamp(yt, 1e-4, 1.0).log() * p).sum(-1)).mean()
    got = L.nce_and_rce(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(nce + rce), rtol=1e-5)


def test_multi_dataset_loss_masks():
    preds = {"a": jnp.asarray(_rand((4, 3))), "b": jnp.asarray(_rand((4, 2), 1))}
    labels = {
        "a": jnp.asarray(np.eye(3, dtype=np.float32)[[0, 1, 2, 0]]),
        "b": jnp.asarray(np.eye(2, dtype=np.float32)[[0, 1, 0, 1]]),
    }
    masks = {
        "a": jnp.asarray([1.0, 1.0, 0.0, 0.0]),
        "b": jnp.asarray([0.0, 0.0, 1.0, 1.0]),
    }
    loss = L.compute_multi_dataset_loss(
        preds, labels, masks, ["a", "b"],
        ["soft_cross_entropy", "bce_logit"],
    )
    # manual: mean over batch of masked per-sample losses summed across heads
    la = L.soft_cross_entropy(preds["a"], labels["a"], reduction="none")
    lb = L.bce_logit(preds["b"], labels["b"], reduction="none")
    expect = (np.asarray(la * masks["a"]).sum() + np.asarray(lb * masks["b"]).sum()) / 4
    np.testing.assert_allclose(float(loss), expect, rtol=1e-6)


def test_vicreg_matches_reference_formula():
    emb = _rand((8, 16))
    et = torch.from_numpy(emb)
    et = et - et.mean(dim=0)
    std = torch.sqrt(et.var(dim=0) + 1e-4)
    std_loss = torch.mean(torch.relu(1 - std))
    cov = (et.T @ et) / 7
    n = cov.shape[0]
    off = cov.flatten()[:-1].view(n - 1, n + 1)[:, 1:].flatten()
    ref = std_loss * 25.0 + off.pow(2).sum().div(16) * 1.0
    got = L.compute_vicreg_loss(jnp.asarray(emb))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


# --------------------------------------------------------------- lr policy
def _solver_cfg(**over):
    cfg = get_cfg()
    s = cfg.SOLVER
    s.BASE_LR = 0.002
    s.COSINE_END_LR = 2e-5
    s.WARMUP_START_LR = 2e-5
    s.WARMUP_EPOCHS = 15.0
    s.COSINE_AFTER_WARMUP = True
    s.LR_POLICY = "cosine"
    s.MAX_EPOCH = 100
    for k, v in over.items():
        setattr(s, k, v)
    return s


def test_cosine_warmup_shape():
    s = _solver_cfg()
    # warmup: linear from WARMUP_START_LR to cosine(WARMUP_EPOCHS)
    assert get_lr_at_epoch(s, 0.0) == pytest.approx(2e-5)
    lr_end_warm = get_lr_at_epoch(s, 15.0)
    assert lr_end_warm == pytest.approx(0.002, rel=1e-6)  # cos(0) -> base lr
    # midpoint of cosine: (base+end)/2
    mid = get_lr_at_epoch(s, (100 + 15) / 2)
    assert mid == pytest.approx((0.002 + 2e-5) / 2, rel=1e-3)
    # end of schedule
    assert get_lr_at_epoch(s, 100.0) == pytest.approx(2e-5, rel=1e-3)


def test_schedule_matches_python_math():
    s = _solver_cfg()
    sched = make_lr_schedule(s, steps_per_epoch=10)
    for step in [0, 5, 149, 150, 500, 999]:
        np.testing.assert_allclose(
            float(sched(step)), get_lr_at_epoch(s, step / 10), rtol=1e-5
        )


def test_steps_policy():
    s = _solver_cfg(LR_POLICY="steps_with_relative_lrs",
                    STEPS=[0, 40, 80], LRS=[1.0, 0.1, 0.01],
                    WARMUP_EPOCHS=0.0)
    assert get_lr_at_epoch(s, 10) == pytest.approx(0.002)
    assert get_lr_at_epoch(s, 50) == pytest.approx(0.0002)
    assert get_lr_at_epoch(s, 90) == pytest.approx(0.00002)
    sched = make_lr_schedule(s, steps_per_epoch=1)
    np.testing.assert_allclose(float(sched(50)), 0.0002, rtol=1e-5)


def test_optimizer_zero_wd_partition():
    import optax
    from aicity_action_tpu.solver.optimizer import construct_optimizer

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = "adamw"
    cfg.SOLVER.ZERO_WD_1D_PARAM = True
    cfg.SOLVER.WEIGHT_DECAY = 0.5  # large, to make decay visible
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.SOLVER.COSINE_END_LR = 0.0
    cfg.SOLVER.CLIP_GRAD_L2NORM = None

    params = {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "norm": {"scale": jnp.ones((4,))},
    }
    tx, sched = construct_optimizer(cfg, params, steps_per_epoch=10)
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    # kernel gets decayed (update nonzero), 1-D params don't
    assert float(jnp.abs(updates["dense"]["kernel"]).sum()) > 0
    assert float(jnp.abs(updates["dense"]["bias"]).sum()) == 0
    assert float(jnp.abs(updates["norm"]["scale"]).sum()) == 0


import jax  # noqa: E402  (used in test above)
