"""Config system tests: reference-YAML compatibility and override semantics."""

import pytest

from aicity_action_tpu.config import get_cfg, assert_and_infer_cfg

REF_CFG = "/root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml"


def test_defaults_basic():
    cfg = get_cfg()
    assert cfg.MVIT.EMBED_DIM == 96
    assert cfg.TRAIN.BATCH_SIZE == 64
    assert cfg.MODEL.MODEL_NAME == "SlowFast"


def test_reference_yaml_loads_unchanged():
    cfg = get_cfg()
    cfg.merge_from_file(REF_CFG)
    assert cfg.MODEL.MODEL_NAME == "MViT"
    assert cfg.MODEL.NUM_CLASSES == 18
    assert cfg.DATA.NUM_FRAMES == 16
    assert cfg.DATA.SAMPLING_RATE == 4
    assert cfg.DATA.TRAIN_CROP_SIZE == 448
    # tuple-syntax values are literal-evaluated like yacs
    assert tuple(cfg.MVIT.PATCH_KERNEL) == (3, 7, 7)
    assert tuple(cfg.MVIT.PATCH_STRIDE) == (2, 4, 4)
    assert cfg.MVIT.POOL_Q_STRIDE == [[1, 1, 2, 2], [3, 1, 2, 2], [14, 1, 2, 2]]
    assert cfg.MVIT.CHANNEL_EXPAND_FRONT is True
    assert cfg.MVIT.Q_POOL_ALL is True
    assert cfg.MVIT.Q_POOL_RESIDUAL is True
    assert cfg.MVIT.CLS_EMBED_ON is False
    assert cfg.SOLVER.OPTIMIZING_METHOD == "adamw"
    assert cfg.SOLVER.BASE_LR == pytest.approx(0.002)


def test_all_reference_configs_load():
    import glob

    for path in glob.glob("/root/reference/configs/Aicity/*.yaml"):
        cfg = get_cfg()
        cfg.merge_from_file(path)
        assert cfg.MODEL.MODEL_NAME == "MViT", path


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(
        ["TRAIN.BATCH_SIZE", "16", "MODEL.NUM_CLASSES", "18",
         "MVIT.POOL_KVQ_KERNEL", "[3, 3, 3]", "DATA.DECODING_BACKEND", "cv2"]
    )
    assert cfg.TRAIN.BATCH_SIZE == 16
    assert cfg.MODEL.NUM_CLASSES == 18
    assert cfg.MVIT.POOL_KVQ_KERNEL == [3, 3, 3]


def test_unknown_key_rejected():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOT.A.KEY", "1"])


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.BATCH_SIZE = 1
    cfg.defrost()
    cfg.TRAIN.BATCH_SIZE = 8
    assert cfg.TRAIN.BATCH_SIZE == 8


def test_assert_and_infer():
    cfg = get_cfg()
    cfg.NUM_GPUS = 4
    cfg.TRAIN.BATCH_SIZE = 6
    with pytest.raises(AssertionError):
        assert_and_infer_cfg(cfg)
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    assert_and_infer_cfg(cfg)


def test_lr_scale_by_shards():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR_SCALE_NUM_SHARDS = True
    cfg.SOLVER.BASE_LR = 0.1
    cfg.NUM_SHARDS = 4
    assert_and_infer_cfg(cfg)
    assert cfg.SOLVER.BASE_LR == pytest.approx(0.4)
