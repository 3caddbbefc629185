"""Contrastive loop integration on synthetic video+caption data, and
tokenizer round-trip tests."""

import numpy as np
import pytest

from aicity_action_tpu.config import get_cfg, assert_and_infer_cfg

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip")
    vdir = d / "videos"
    vdir.mkdir()
    rs = np.random.RandomState(0)
    for i in range(8):
        path = str(vdir / f"v{i}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
        for _ in range(40):
            w.write(rs.randint(0, 255, (48, 64, 3), np.uint8))
        w.release()
    for split in ("train", "val", "test"):
        with open(vdir / f"{split}_tokenized.csv", "w") as f:
            for i in range(8):
                ids = ",".join(str(x) for x in rs.randint(1, 60, 5))
                f.write(f"v{i}.mp4 {i} {ids}\n")
    return d


def _cfg(workdir):
    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(workdir / "out")
    cfg.DATA.PATH_TO_DATA_DIR = str(workdir / "videos")
    cfg.DATA.PATH_PREFIX = str(workdir / "videos")
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [40, 48]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.MODEL.MODEL_NAME = "ActionCLIP"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.CONTRA.ENABLE = True
    cfg.CONTRA.transformer_width = 32
    cfg.CONTRA.transformer_layers = 2
    cfg.CONTRA.transformer_heads = 2
    cfg.CONTRA.CONTEXT_LENGTH = 8
    cfg.CONTRA.vocab_size = 64
    cfg.CONTRA.embed_dim = 16
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
    cfg.TRAIN.DATASET = "web_video_text"
    cfg.TEST.DATASET = "web_video_text"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.SOLVER.COSINE_END_LR = 0.0
    cfg.SOLVER.OPTIMIZING_METHOD = "adamw"
    cfg.TRAIN.EVAL_PERIOD = 1
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.LOG_PERIOD = 1
    return assert_and_infer_cfg(cfg)


def test_contrastive_train_and_test(workdir):
    from aicity_action_tpu.engine.contrastive_loop import (
        test_contrastive, train_contrastive)

    cfg = _cfg(workdir)
    state = train_contrastive(cfg)
    assert int(np.asarray(state.step)) == 1
    stats = test_contrastive(cfg)
    assert "v2t_recall@1" in stats


def test_tokenizer_with_tiny_vocab(tmp_path):
    """BPE merge mechanics on a minimal merges file."""
    from aicity_action_tpu.data.tokenizer import SimpleTokenizer, tokenize

    merges = ["#version: 0.2"]
    merges += ["h e", "he l", "hel l", "hell o</w>", "w o", "wo r",
               "wor l", "worl d</w>"]
    # pad the merges list so vocab construction works
    path = tmp_path / "merges.txt"
    path.write_text("\n".join(merges) + "\n")
    tok = SimpleTokenizer(str(path))
    ids = tok.encode("hello world")
    assert ids, "must produce tokens"
    assert tok.decode(ids).strip() == "hello world"

    arr = tokenize(tok, ["hello world", "hello"], context_length=8)
    assert arr.shape == (2, 8)
    sot = tok.encoder["<|startoftext|>"]
    eot = tok.encoder["<|endoftext|>"]
    assert arr[0, 0] == sot
    assert eot in arr[0]
