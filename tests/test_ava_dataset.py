"""AVA dataset + detection step tests on synthetic frame lists."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicity_action_tpu.config import get_cfg

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def ava_root(tmp_path_factory):
    d = tmp_path_factory.mktemp("ava")
    frames = d / "frames"
    lists = d / "lists"
    anno = d / "anno"
    frames.mkdir(); lists.mkdir(); anno.mkdir()

    rs = np.random.RandomState(0)
    rows = []
    for vid in ("vidA", "vidB"):
        (frames / vid).mkdir()
        for i in range(1, 121):
            name = f"{vid}/{vid}_{i:06d}.jpg"
            cv2.imwrite(str(frames / name),
                        rs.randint(0, 255, (64, 80, 3), np.uint8))
            rows.append(f"{vid} 0 {i} {name} \"\"\n")
    with open(lists / "train.csv", "w") as f:
        f.write("original_video_id video_id frame_id path labels\n")
        f.writelines(rows)
    with open(lists / "val.csv", "w") as f:
        f.write("original_video_id video_id frame_id path labels\n")
        f.writelines(rows)

    # gt boxes at sec 902/903 (frame (sec-900)*30 = 60/90)
    with open(anno / "train_gt.csv", "w") as f:
        f.write("vidA,0902,0.1,0.1,0.6,0.7,2,1\n")
        f.write("vidA,0902,0.1,0.1,0.6,0.7,5,1\n")  # same box, 2nd label
        f.write("vidB,0902,0.2,0.2,0.8,0.9,7,1\n")
    with open(anno / "val_pred.csv", "w") as f:
        f.write("vidA,0902,0.1,0.1,0.6,0.7,,0.95\n")
        f.write("vidB,0902,0.2,0.2,0.8,0.9,,0.99\n")
    return d


def _ava_cfg(ava_root, mode_frames=4):
    cfg = get_cfg()
    cfg.DETECTION.ENABLE = True
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 80
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.MODEL.LOSS_FUNC = "bce"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.DATA.NUM_FRAMES = mode_frames
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [56, 64]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.AVA.FRAME_DIR = str(ava_root / "frames")
    cfg.AVA.FRAME_LIST_DIR = str(ava_root / "lists")
    cfg.AVA.ANNOTATION_DIR = str(ava_root / "anno")
    cfg.AVA.TRAIN_GT_BOX_LISTS = ["train_gt.csv"]
    cfg.AVA.TEST_PREDICT_BOX_LISTS = ["val_pred.csv"]
    cfg.AVA.DETECTION_SCORE_THRESH = 0.9
    cfg.AVA.FULL_TEST_ON_VAL = True
    return cfg


def test_ava_dataset_train_items(ava_root):
    from aicity_action_tpu.data.ava import Ava

    cfg = _ava_cfg(ava_root)
    ds = Ava(cfg, "train")
    assert len(ds) == 2  # one keyframe per video at sec 902
    inputs, labels, index, meta = ds[0]
    assert inputs[0].shape == (4, 32, 32, 3)
    assert labels.shape == (Ava.MAX_BOXES, 80)
    # two labels on the first box (ids 2 and 5 -> cols 1 and 4)
    assert labels[0, 1] == 1.0 and labels[0, 4] == 1.0
    assert meta["box_mask"].sum() == 1
    assert meta["boxes"].shape == (Ava.MAX_BOXES, 4)
    assert meta["metadata"][0].tolist() == [0.0, 902.0]


def test_ava_dataset_val_uses_predicted_boxes(ava_root):
    from aicity_action_tpu.data.ava import Ava

    cfg = _ava_cfg(ava_root)
    ds = Ava(cfg, "val")
    assert len(ds) == 2
    _, labels, _, meta = ds[0]
    assert meta["box_mask"].sum() == 1
    assert labels.sum() == 0  # predicted boxes carry no labels


def test_detection_train_and_eval_step(ava_root):
    import optax

    from aicity_action_tpu.data.ava import Ava
    from aicity_action_tpu.data.loader import Loader
    from aicity_action_tpu.engine.detection import (
        make_detection_eval_step, make_detection_train_step)
    from aicity_action_tpu.engine.steps import TrainState
    from aicity_action_tpu.models.build import build_model_with_state

    cfg = _ava_cfg(ava_root)
    module, params, model_state = build_model_with_state(cfg)

    ds = Ava(cfg, "train")
    loader = Loader(ds, 2, shuffle=False, drop_last=False, num_workers=1)
    batch = next(iter(loader))
    dev_batch = {
        "inputs": [jnp.asarray(x) for x in batch["inputs"]],
        "boxes": jnp.asarray(batch["boxes"]),
        "box_mask": jnp.asarray(batch["box_mask"]),
        "labels": jnp.asarray(batch["labels"]),
    }

    tx = optax.sgd(0.01)
    state = TrainState.create(params, tx, model_state)
    step = jax.jit(make_detection_train_step(module, tx, "bce"))
    new_state, metrics, preds = step(state, dev_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert preds.shape == (2 * Ava.MAX_BOXES, 80)

    eval_step = jax.jit(make_detection_eval_step(module))
    preds = eval_step(new_state.params, dev_batch, new_state.model_state)
    p = np.asarray(preds)
    assert ((p >= 0) & (p <= 1)).all()


def test_ava_meter_end_to_end(ava_root, tmp_path):
    """Perfect predictions on the GT boxes → mAP 1.0 on annotated classes."""
    from aicity_action_tpu.utils.meters import AVAMeter

    cfg = _ava_cfg(ava_root)
    cfg.AVA.GROUNDTRUTH_FILE = "train_gt.csv"
    cfg.AVA.EXCLUSION_FILE = ""
    labelmap = tmp_path / "lm.pbtxt"
    labelmap.write_text(
        'item {\n  name: "a"\n  id: 2\n}\n'
        'item {\n  name: "b"\n  id: 5\n}\n'
        'item {\n  name: "c"\n  id: 7\n}\n'
    )
    cfg.AVA.LABEL_MAP_FILE = str(labelmap)
    cfg.AVA.ANNOTATION_DIR = str(ava_root / "anno")

    meter = AVAMeter(1, cfg, "test")
    meter.video_idx_to_name = ["vidA", "vidB"]

    preds = np.zeros((2, 80), np.float32)
    preds[0, [1, 4]] = 0.9   # vidA box: classes 2 and 5
    preds[1, 6] = 0.9        # vidB box: class 7
    ori_boxes = np.array([  # normalized (x1, y1, x2, y2)
        [0.1, 0.1, 0.6, 0.7],
        [0.2, 0.2, 0.8, 0.9],
    ], np.float32)
    metadata = np.array([[0, 902], [1, 902]], np.float32)
    meter.update_stats(preds, ori_boxes, metadata)
    mAP = meter.finalize_metrics(log=False)
    assert mAP == pytest.approx(1.0)
