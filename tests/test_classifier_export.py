"""VideoActionClassifier: inference, batch padding, StableHLO export round-trip."""

import numpy as np
import pytest

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.pipeline.classifier import (
    VideoActionClassifier,
    load_exported,
)


def _tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.TRAIN.AUTO_RESUME = False
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


def test_inference_and_padding(tmp_path):
    cfg = _tiny_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    clf = VideoActionClassifier(cfg, batch_size=4)

    rs = np.random.RandomState(0)
    x3 = rs.randn(3, 4, 32, 32, 3).astype(np.float32)
    out3 = clf.inference([x3])
    assert out3.shape == (3, 5)
    np.testing.assert_allclose(out3.sum(-1), 1.0, rtol=1e-4)

    # oversized batch splits transparently
    x9 = rs.randn(9, 4, 32, 32, 3).astype(np.float32)
    out9 = clf.inference([x9])
    assert out9.shape == (9, 5)
    np.testing.assert_allclose(out9[:3], clf.inference([x9[:3]]), atol=1e-5)


def test_export_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    clf = VideoActionClassifier(cfg, batch_size=2)
    path = str(tmp_path / "model.stablehlo")
    clf.export(path)

    rs = np.random.RandomState(1)
    x = rs.randn(2, 4, 32, 32, 3).astype(np.float32)
    want = clf.inference([x])

    loaded = VideoActionClassifier(cfg, batch_size=2, exported_path=path)
    got = loaded.inference([x])
    np.testing.assert_allclose(got, want, atol=1e-5)
