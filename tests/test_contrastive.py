"""Contrastive stack tests: text encoder parity vs the reference CLIP
transformer (torch oracle), ActionCLIP forward, contrastive train step with
MoCo EMA, retrieval metrics."""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.engine.contrastive import (
    ContrastiveState,
    contrastive_gt_matrix,
    make_contrastive_train_step,
    recall_at_rank,
    retrieval_metrics,
)
from aicity_action_tpu.models.text import TextTransformer

from ref_oracle import load_reference_attention, torch_to_numpy, _load, REF

torch = pytest.importorskip("torch")


def load_reference_text():
    if "slowfast.models.text_models" in sys.modules:
        return sys.modules["slowfast.models.text_models"]
    load_reference_attention()
    # text_models imports slowfast.models.utils which pulls in the logging
    # stack; stub just the symbol it needs
    mu = types.ModuleType("slowfast.models.utils")
    mu.validate_checkpoint_wrapper_import = lambda x: None
    sys.modules["slowfast.models.utils"] = mu
    sys.modules["slowfast.models"].utils = mu
    return _load("slowfast.models.text_models", f"{REF}/text_models.py")


def _convert_text_weights(tmodel, layers):
    sd = {k: torch_to_numpy(v) for k, v in tmodel.state_dict().items()}
    p = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"],
                     "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    for i in range(layers):
        r = f"resblocks.{i}"
        p[f"resblocks_{i}"] = {
            "ln_1": {"scale": sd[f"{r}.ln_1.weight"],
                     "bias": sd[f"{r}.ln_1.bias"]},
            "ln_2": {"scale": sd[f"{r}.ln_2.weight"],
                     "bias": sd[f"{r}.ln_2.bias"]},
            "attn": {
                "in_proj_kernel": sd[f"{r}.attn.in_proj_weight"].T,
                "in_proj_bias": sd[f"{r}.attn.in_proj_bias"],
                "out_proj": {
                    "kernel": sd[f"{r}.attn.out_proj.weight"].T,
                    "bias": sd[f"{r}.attn.out_proj.bias"],
                },
            },
            "c_fc": {"kernel": sd[f"{r}.mlp.c_fc.weight"].T,
                     "bias": sd[f"{r}.mlp.c_fc.bias"]},
            "c_proj": {"kernel": sd[f"{r}.mlp.c_proj.weight"].T,
                       "bias": sd[f"{r}.mlp.c_proj.bias"]},
        }
    return p


def test_text_encoder_parity():
    ref_text = load_reference_text()
    torch.manual_seed(0)
    width, layers, heads, ctx, vocab, emb = 64, 2, 4, 16, 100, 32
    tmodel = ref_text.Transformer(
        width=width, layers=layers, heads=heads, context_length=ctx,
        vocab_size=vocab, embed_dim=emb).eval()

    rs = np.random.RandomState(0)
    # token rows with EOT (= max id in row) somewhere in the middle
    tokens = rs.randint(1, 80, (3, ctx))
    tokens[:, 10] = 99  # EOT position (highest id)
    with torch.no_grad():
        ref_out = tmodel.encode_text(torch.from_numpy(tokens)).numpy()

    jmodel = TextTransformer(
        width=width, layers=layers, heads=heads, context_length=ctx,
        vocab_size=vocab, embed_dim=emb)
    params = _convert_text_weights(tmodel, layers)
    out = jmodel.apply({"params": params}, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=3e-5, rtol=1e-4)


def test_gt_matrix_matches_reference_semantics():
    labels = jnp.asarray([0, 1, 0, 2])
    gt = np.asarray(contrastive_gt_matrix(labels))
    np.testing.assert_allclose(gt[0], [0.5, 0, 0.5, 0])
    np.testing.assert_allclose(gt[1], [0, 1, 0, 0])
    np.testing.assert_allclose(gt.sum(1), 1.0)


def test_recall_at_rank():
    simi = np.array([[0.9, 0.1], [0.2, 0.8]])
    gt = np.eye(2)
    assert recall_at_rank(simi, gt, ks=(1,)) == [1.0]
    simi2 = np.array([[0.1, 0.9], [0.2, 0.8]])
    assert recall_at_rank(simi2, gt, ks=(1, 2)) == [0.5, 1.0]


def _tiny_clip_cfg():
    cfg = get_cfg()
    cfg.CONTRA.ENABLE = True
    cfg.CONTRA.transformer_width = 32
    cfg.CONTRA.transformer_layers = 2
    cfg.CONTRA.transformer_heads = 2
    cfg.CONTRA.CONTEXT_LENGTH = 8
    cfg.CONTRA.vocab_size = 64
    cfg.CONTRA.embed_dim = 16
    cfg.MODEL.MODEL_NAME = "ActionCLIP"
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


@pytest.mark.parametrize("use_moco", [False, True])
def test_actionclip_train_step(use_moco):
    import optax

    from aicity_action_tpu.models.build import build_model

    cfg = _tiny_clip_cfg()
    module, params = build_model(cfg)

    tx = optax.adamw(1e-4)
    state = ContrastiveState.create(params, tx, use_moco=use_moco)
    step = jax.jit(make_contrastive_train_step(
        module, tx, use_moco=use_moco, moco_momentum=0.9))

    B = 4
    batch = {
        "inputs": [jnp.asarray(
            np.random.RandomState(0).randn(B, 4, 32, 32, 3), jnp.float32)],
        "tokens": jnp.asarray(
            np.random.RandomState(1).randint(1, 60, (B, 8))),
        "labels": jnp.asarray([0, 1, 1, 2]),
    }
    rng = jax.random.PRNGKey(0)
    new_state, metrics, (v, t) = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    # features are L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(v), axis=-1), 1.0, rtol=1e-3)
    # logit scale stays clamped
    assert 0.0 <= float(new_state.params["logit_scale"]) <= np.log(100) + 1e-6
    if use_moco:
        # EMA moved toward (but is not equal to) the online params
        diff = jax.tree.map(
            lambda e, p: float(np.abs(np.asarray(e) - np.asarray(p)).max()),
            new_state.ema_params, new_state.params)
        assert max(jax.tree.leaves(diff)) > 0

    # second step must also run (donated state round-trip)
    new_state2, m2, _ = step(new_state, batch, rng)
    assert np.isfinite(float(m2["loss"]))


def test_retrieval_metrics_shapes():
    rs = np.random.RandomState(0)
    v = rs.randn(6, 8)
    t = rs.randn(6, 8)
    labels = np.array([0, 0, 1, 2, 3, 4])
    out = retrieval_metrics(v, t, labels)
    assert set(out) == {
        "v2t_recall@1", "v2t_recall@5", "v2t_recall@10",
        "t2v_recall@1", "t2v_recall@5", "t2v_recall@10"}
    assert all(0.0 <= x <= 1.0 for x in out.values())
