"""Multi-head training step and zero-shot scoring tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.pipeline import zeroshot as zs


def _multihead_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.USE_MULTI_HEAD = True
    cfg.MODEL.MULTI_DATASETS = ["kinetics", "mmit"]
    cfg.MODEL.MULTI_NUM_CLASSES = [6, 4]
    cfg.MODEL.MULTI_LOSS_FUNCS = ["soft_cross_entropy", "bce_logit"]
    cfg.MODEL.MULTI_HEAD_ACT = ["softmax", "sigmoid"]
    cfg.MODEL.MULTI_LOSS_WEIGHTS = [1.0, 10.0]
    cfg.MODEL.MULTI_ADD_CROSS_PROJ = True
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    m = cfg.MVIT
    m.EMBED_DIM = 16
    m.DEPTH = 2
    m.PATCH_PADDING = (1, 3, 3)
    m.DIM_MUL = [[1, 2.0]]
    m.HEAD_MUL = [[1, 2.0]]
    m.POOL_KVQ_KERNEL = [3, 3, 3]
    m.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    m.POOL_Q_STRIDE = [[1, 1, 2, 2]]
    m.CLS_EMBED_ON = False
    m.SEP_POS_EMBED = True
    m.CHANNEL_EXPAND_FRONT = True
    m.Q_POOL_ALL = True
    m.Q_POOL_RESIDUAL = True
    m.DROPPATH_RATE = 0.0
    return cfg


def test_multihead_forward_and_train_step():
    import optax

    from aicity_action_tpu.engine.steps import (
        TrainState, make_multihead_train_step)
    from aicity_action_tpu.models.build import build_model

    cfg = _multihead_cfg()
    module, params = build_model(cfg)

    x = [jnp.asarray(np.random.RandomState(0).randn(4, 4, 32, 32, 3),
                     jnp.float32)]
    out = module.apply({"params": params}, x, None, None,
                       train=False, run_cross_proj=True)
    assert set(out) == {"kinetics", "mmit", "kinetics_mmit", "mmit_kinetics"}
    assert out["kinetics"].shape == (4, 6)
    assert out["mmit"].shape == (4, 4)
    assert out["kinetics_mmit"].shape == (4, 4)
    # eval activations applied per head
    np.testing.assert_allclose(np.asarray(out["kinetics"]).sum(-1), 1.0,
                               rtol=1e-4)

    # single-dataset selection (test_net.py:109-114 semantics)
    out_one = module.apply({"params": params}, x, None, "mmit", train=False)
    assert set(out_one) == {"mmit"}

    tx = optax.adamw(1e-4)
    state = TrainState.create(params, tx)
    step = jax.jit(make_multihead_train_step(
        module, tx,
        datasets=cfg.MODEL.MULTI_DATASETS,
        loss_funcs=cfg.MODEL.MULTI_LOSS_FUNCS,
        loss_weights=cfg.MODEL.MULTI_LOSS_WEIGHTS,
        add_cross_proj=True,
        proj_loss_func="soft_cross_entropy",
    ))
    labels = np.zeros((4, 6), np.float32)
    labels[np.arange(4), [0, 1, 2, 3]] = 1.0
    batch = {
        "inputs": x,
        "labels": jnp.asarray(labels),
        "dataset_idx": jnp.asarray([0, 0, 1, 1]),
    }
    new_state, metrics, preds = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(np.asarray(new_state.step)) == 1


# ---------------------------------------------------------------- zeroshot
def test_query_embedding_and_weights():
    word_emb = {
        "driving": np.array([1.0, 0.0, 0.0], np.float32),
        "car": np.array([0.8, 0.6, 0.0], np.float32),
    }
    q = zs.embed_query(zs.query_words("Driving a car!"), word_emb, 3)
    assert np.linalg.norm(q) == pytest.approx(1.0)

    class_embs = {
        "k700": np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32),
        "mit": np.array([[0.9, 0.1, 0]], np.float32),
    }
    names = {"k700": ["drive", "swim", "jump"], "mit": ["driving"]}
    kept, weights = zs.class_weights_for_query(
        q, class_embs, names, min_simi=0.5, top_k_cls=2)
    assert len(kept) == 2
    assert weights["k700"][0] > 0  # "drive" matched
    assert weights["k700"][1] == 0  # "swim" below threshold

    preds = {
        "k700": np.array([[0.9, 0.0, 0.0], [0.1, 0.9, 0.0]], np.float32),
        "mit": np.array([[0.5], [0.1]], np.float32),
    }
    fused = zs.fuse_predictions(preds, weights)
    assert fused.shape == (2,)
    assert fused[0] > fused[1]  # video 0 scores higher for "driving a car"


def test_retrieve_videos_by_text():
    feats = np.eye(3, 4, dtype=np.float32)
    ids = ["v0", "v1", "v2"]

    def fake_encoder(text):
        assert "the" not in text.split()  # blacklist applied
        return np.array([0, 1, 0, 0], np.float32)

    ranked = zs.retrieve_videos_by_text("the person swimming", feats, ids,
                                        fake_encoder, top_k=2)
    assert ranked[0][0] == "v1"
