"""Data layer tests: sampling math vs reference semantics, synthetic-video
decode, dataset enumeration, loader batching."""

import math
import os
import random

import numpy as np
import pytest

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.data import decoder, transform
from aicity_action_tpu.data.datasets import build_dataset
from aicity_action_tpu.data.loader import Loader, construct_loader

cv2 = pytest.importorskip("cv2")


# --------------------------------------------------------------- sampling
def test_temporal_sampling_matches_torch_linspace():
    torch = pytest.importorskip("torch")
    frames = np.arange(50 * 2).reshape(50, 2).astype(np.float32)
    for start, end, n in [(0, 49, 16), (3.7, 40.2, 16), (0, 10, 16), (5, 5, 4)]:
        idx_ref = torch.clamp(torch.linspace(start, end, n), 0, 49).long().numpy()
        got = decoder.sample_indices(start, end, n, 50)
        np.testing.assert_array_equal(got, idx_ref)


def test_get_start_end_idx_uniform():
    # video 300 frames, clip 64 frames, 10 views
    for ci in range(10):
        s, e = decoder.get_start_end_idx(300, 64, ci, 10)
        assert s == (300 - 64) * ci / 10
        assert e == s + 63
    # use_offset center clip
    s, e = decoder.get_start_end_idx(300, 64, 0, 1, use_offset=True)
    assert s == math.floor((300 - 64) / 2)


def test_clip_size_fps_renormalization():
    # 16 frames x 4 stride at target 30fps from a 60fps video = 128 src frames
    assert decoder.clip_size_in_frames(4, 16, 60.0, 30.0) == 128.0


# ------------------------------------------------------------ transforms
def test_uniform_crop_positions():
    frames = np.arange(1 * 8 * 16 * 1).reshape(1, 8, 16, 1).astype(np.uint8)
    left = transform.uniform_crop(frames, 8, 0)
    center = transform.uniform_crop(frames, 8, 1)
    right = transform.uniform_crop(frames, 8, 2)
    np.testing.assert_array_equal(left, frames[:, :, 0:8])
    np.testing.assert_array_equal(center, frames[:, :, 4:12])
    np.testing.assert_array_equal(right, frames[:, :, 8:16])


def test_tensor_normalize():
    frames = np.full((2, 4, 4, 3), 255, np.uint8)
    out = transform.tensor_normalize(frames, [0.45] * 3, [0.225] * 3)
    np.testing.assert_allclose(out, (1.0 - 0.45) / 0.225, rtol=1e-6)


def test_pack_pathway_slowfast():
    frames = np.arange(32)[:, None, None, None] * np.ones((32, 2, 2, 3))
    slow, fast = transform.pack_pathway_output(frames, 2, alpha=4)
    assert fast.shape[0] == 32 and slow.shape[0] == 8
    # linspace endpoints included (reference utils.py:75-108)
    idx = np.linspace(0, 31, 8).astype(np.int64)
    np.testing.assert_array_equal(slow[:, 0, 0, 0], idx.astype(np.float64))


# ------------------------------------------------- synthetic video fixture
def _write_video(path, num_frames=60, fps=30, size=(64, 48)):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(path, fourcc, fps, size)
    assert w.isOpened()
    for i in range(num_frames):
        frame = np.full((size[1], size[0], 3), i % 256, np.uint8)
        w.write(frame)
    w.release()


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    for i in range(4):
        _write_video(str(d / f"v{i}.mp4"), num_frames=60 + 10 * i)
    for split in ("train", "val", "test"):
        with open(d / f"{split}.csv", "w") as f:
            for i in range(4):
                f.write(f"v{i}.mp4 {i % 3}\n")
    return str(d)


def test_cv2_decode_clip(video_dir):
    frames = decoder.decode(
        os.path.join(video_dir, "v0.mp4"),
        sampling_rate=2, num_frames=8, clip_idx=0, num_clips=3,
        target_fps=30, backend="cv2",
    )
    assert frames.shape == (8, 48, 64, 3)
    # frame values encode the frame index -> verify monotonic sampling
    vals = frames[:, 0, 0, 0].astype(int)
    assert all(b >= a for a, b in zip(vals, vals[1:]))


def _mini_cfg(video_dir):
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = video_dir
    cfg.DATA.PATH_PREFIX = video_dir
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [48, 56]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MODEL.ARCH = "mvit"
    cfg.TRAIN.DATASET = "aicity"
    cfg.TEST.DATASET = "aicity"
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TEST.BATCH_SIZE = 6
    cfg.DATA_LOADER.NUM_WORKERS = 2
    return cfg


def test_dataset_test_replication(video_dir):
    cfg = _mini_cfg(video_dir)
    ds = build_dataset("aicity", cfg, "test")
    assert len(ds) == 4 * 2 * 3
    assert ds.num_videos == 4
    inputs, label, index, meta = ds[0]
    assert inputs[0].shape == (4, 32, 32, 3)
    assert inputs[0].dtype == np.float32


def test_dataset_train_item(video_dir):
    cfg = _mini_cfg(video_dir)
    ds = build_dataset("aicity", cfg, "train")
    assert len(ds) == 4
    inputs, label, index, _ = ds[1]
    assert inputs[0].shape == (4, 32, 32, 3)
    assert label == 1


def test_loader_batching_and_epoch_shuffle(video_dir):
    cfg = _mini_cfg(video_dir)
    loader = construct_loader(cfg, "train")
    batches = list(loader)
    assert len(batches) == 1  # 4 videos / batch 4, drop_last
    b = batches[0]
    assert b["inputs"][0].shape == (4, 4, 32, 32, 3)
    assert b["labels"].shape == (4,)

    order1 = [tuple(b["index"]) for b in loader]
    loader.set_epoch(1)
    order2 = [tuple(b["index"]) for b in loader]
    assert order1 != order2  # epoch reseeds the shuffle


def test_loader_host_sharding(video_dir):
    cfg = _mini_cfg(video_dir)
    ds = build_dataset("aicity", cfg, "test")
    l0 = Loader(ds, 4, shuffle=False, drop_last=False, num_workers=1,
                shard_id=0, num_shards=2)
    l1 = Loader(ds, 4, shuffle=False, drop_last=False, num_workers=1,
                shard_id=1, num_shards=2)
    i0 = np.concatenate([b["index"] for b in l0])
    i1 = np.concatenate([b["index"] for b in l1])
    assert len(i0) == len(i1) == len(ds) // 2
    assert set(i0) | set(i1) == set(range(len(ds)))


# ------------------------------------------------- selective PyAV decode
class _FakeFrame:
    def __init__(self, pts, img):
        self.pts = pts
        self._img = img

    def to_rgb(self):
        return self

    def to_ndarray(self):
        return self._img


class _FakeStream:
    def __init__(self, n, fps, timebase, with_meta):
        self.average_rate = fps
        self.frames = n if with_meta else 0
        self.duration = n * timebase if with_meta else None


class _FakeVideoContainer:
    """Mimics the PyAV container API: pts-granular seek that snaps BACK to
    the nearest keyframe, sequential decode from there. Counts decoded
    frames so tests can assert selective decoding is O(clip)."""

    def __init__(self, n=600, fps=30.0, timebase=512, keyframe_every=8,
                 with_meta=True):
        self.n = n
        self.timebase = timebase
        self.keyframe_every = keyframe_every
        self.decoded = 0
        self._pos = 0
        rs = np.random.RandomState(0)
        self._imgs = rs.randint(0, 255, (n, 8, 8, 3), np.uint8)
        stream = _FakeStream(n, fps, timebase, with_meta)

        class _S:
            video = [stream]

        self.streams = _S()

    def seek(self, offset, any_frame=False, backward=True, stream=None):
        assert backward and not any_frame
        frame = min(offset // self.timebase, self.n - 1)
        self._pos = int(frame // self.keyframe_every * self.keyframe_every)

    def decode(self, stream):
        for i in range(self._pos, self.n):
            self.decoded += 1
            yield _FakeFrame(i * self.timebase, self._imgs[i])


def test_pyav_selective_decode_is_o_clip():
    """With header metadata, pyav_decode reads only the clip window +
    seek margin — independent of video length (reference decoder.py:253-326)."""
    for n in (600, 6000):
        c = _FakeVideoContainer(n=n)
        frames, fps, decode_all = decoder.pyav_decode(
            c, sampling_rate=2, num_frames=8, clip_idx=0, num_clips=3)
        assert not decode_all
        assert fps == 30.0
        # window = 16 source frames; margin 1024 pts = 2 frames; keyframe
        # snap-back <= 8; one past-the-end frame closes the stream
        assert c.decoded <= 16 + 2 + 8 + 2, (n, c.decoded)
        assert frames.shape[1:] == (8, 8, 3)

    # clip content parity: selective window frames == the directly indexed
    # frames of the full video
    c = _FakeVideoContainer(n=600)
    frames, fps, _ = decoder.pyav_decode(
        c, sampling_rate=2, num_frames=8, clip_idx=1, num_clips=3)
    s, e = decoder.get_start_end_idx(600, 16.0, 1, 3)
    # first buffered frame = first pts >= int(s * timebase)
    start = math.ceil(int(s * c.timebase) / c.timebase)
    np.testing.assert_array_equal(frames[0], c._imgs[start])


def test_pyav_decode_no_metadata_falls_back_to_full():
    c = _FakeVideoContainer(n=120, with_meta=False)
    frames, fps, decode_all = decoder.pyav_decode(
        c, sampling_rate=2, num_frames=8, clip_idx=0, num_clips=3)
    assert decode_all
    assert c.decoded == 120
    assert frames.shape[0] == 120


def test_ssv2_frames_dataset(tmp_path):
    """Ssv2_frames: official json label pair + frame-list csv
    (reference ssv2_frames.py:75-160)."""
    import json

    root = tmp_path / "ssv2"
    frames_dir = root / "frames"
    frames_dir.mkdir(parents=True)
    labels = {"Doing thing": "0", "Other thing": "1"}
    (root / "something-something-v2-labels.json").write_text(
        json.dumps(labels))
    vids = [
        {"id": "101", "template": "Doing [thing]"},
        {"id": "102", "template": "Other [thing]"},
    ]
    (root / "something-something-v2-train.json").write_text(json.dumps(vids))
    (root / "something-something-v2-validation.json").write_text(
        json.dumps(vids))

    import cv2 as _cv2
    rows = ["original_vido_id video_id frame_id path labels"]
    rs = np.random.RandomState(0)
    for vid in ("101", "102"):
        for i in range(12):
            p = frames_dir / f"{vid}_{i:03d}.jpg"
            _cv2.imwrite(str(p), rs.randint(0, 255, (48, 64, 3), np.uint8))
            rows.append(f"{vid} {vid} {i} frames/{p.name} \"\"")
    for split in ("train", "val"):
        (root / f"{split}.csv").write_text("\n".join(rows))

    cfg = get_cfg()
    cfg.MODEL.ARCH = "mvit"
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.PATH_PREFIX = str(root)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_JITTER_SCALES = [40, 48]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 3

    ds = build_dataset("ssv2_frames", cfg, "train")
    assert len(ds) == 2 and ds.num_videos == 2
    inputs, label, idx, meta = ds[0]
    assert inputs[0].shape == (4, 32, 32, 3)
    assert label == 0
    assert ds[1][1] == 1

    # test mode: views x crops replication
    ds_test = build_dataset("ssv2_frames", cfg, "test")
    assert len(ds_test) == 2 * 3


def test_imagenet_directory_tree_and_preload(tmp_path):
    """Imagenet manifest resolution: class-subdir tree (reference
    imagenet.py:53-74) and preloaded imdb json (imagenet.py:44-51)."""
    import json

    import cv2 as _cv2

    root = tmp_path / "in1k"
    rs = np.random.RandomState(0)
    for cls in ("n01440764", "n01443537"):
        d = root / "train" / cls
        d.mkdir(parents=True)
        for i in range(2):
            _cv2.imwrite(str(d / f"im{i}.jpg"),
                         rs.randint(0, 255, (40, 40, 3), np.uint8))

    cfg = get_cfg()
    cfg.MODEL.ARCH = "mvit"
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    ds = build_dataset("imagenet", cfg, "train")
    assert len(ds) == 4
    inputs, label, _, _ = ds[0]
    assert inputs[0].shape == (1, 32, 32, 3)
    assert sorted({ds[i][1] for i in range(4)}) == [0, 1]

    # preload imdb takes priority
    pre = tmp_path / "imdb"
    pre.mkdir()
    (pre / "train.json").write_text(json.dumps([
        {"im_path": str(root / "train/n01440764/im0.jpg"), "class": 7},
    ]))
    cfg.DATA.PATH_TO_PRELOAD_IMDB = str(pre)
    ds2 = build_dataset("imagenet", cfg, "train")
    assert len(ds2) == 1 and ds2[0][1] == 7


# ------------------------------------- label-path parity (VERDICT r4 #6)
# Reference semantics: mmit multi-hot parse (mmit.py:139-153), activitynet
# first-label-only (activitynet.py:134-135), VAL_SKIP keeping every k-th
# ORIGINAL csv row in val mode only (mmit.py:97-100,129-131).
def _label_cfg(tmp_path, dataset, num_classes=10):
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(tmp_path)
    cfg.MODEL.NUM_CLASSES = num_classes
    cfg.TRAIN.DATASET = dataset
    cfg.TEST.DATASET = dataset
    return cfg


def test_mmit_multihot_parse(tmp_path):
    with open(tmp_path / "train.csv", "w") as f:
        f.write("a.mp4 3,7,0\n")
        f.write("b.mp4 5\n")
    cfg = _label_cfg(tmp_path, "mmit")
    ds = build_dataset("mmit", cfg, "train")
    assert len(ds) == 2
    lab0, lab1 = ds._labels[0], ds._labels[1]
    assert lab0.dtype == np.float32 and lab0.shape == (10,)
    np.testing.assert_array_equal(np.nonzero(lab0)[0], [0, 3, 7])
    np.testing.assert_array_equal(np.nonzero(lab1)[0], [5])
    assert lab0.sum() == 3.0  # ones, not counts


def test_activitynet_first_label_only(tmp_path):
    with open(tmp_path / "train.csv", "w") as f:
        f.write("a.mp4 5,9,2\n")
        f.write("b.mp4 1\n")
    cfg = _label_cfg(tmp_path, "activitynet")
    ds = build_dataset("activitynet", cfg, "train")
    assert ds._labels == [5, 1]


def test_val_skip_subsampling(tmp_path):
    # 7 rows, VAL_SKIP=3 -> original row indices {0, 3, 6} survive in val;
    # train is never skipped
    for split in ("train", "val"):
        with open(tmp_path / f"{split}.csv", "w") as f:
            for i in range(7):
                f.write(f"v{i}.mp4 {i}\n")
    cfg = _label_cfg(tmp_path, "mmit")
    cfg.DATA.VAL_SKIP = 3
    val = build_dataset("mmit", cfg, "val")
    assert [np.argmax(lb) for lb in val._labels] == [0, 3, 6]
    train = build_dataset("mmit", cfg, "train")
    assert len(train) == 7

    # activitynet shares the same skip rule (activitynet.py:128-130)
    anet = build_dataset("activitynet", cfg, "val")
    assert anet._labels == [0, 3, 6]


def test_test_skip_subsampling(tmp_path):
    with open(tmp_path / "test.csv", "w") as f:
        for i in range(6):
            f.write(f"v{i}.mp4 {i}\n")
    cfg = _label_cfg(tmp_path, "activitynet")
    cfg.DATA.TEST_SKIP = 2
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    ds = build_dataset("activitynet", cfg, "test")
    # rows {0, 2, 4} survive, each replicated num_clips=2 times
    assert ds._labels == [0, 0, 2, 2, 4, 4]
