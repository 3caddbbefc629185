"""Native preprocessing library: build, parity vs cv2, and speed sanity."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from aicity_action_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_crop_resize_normalize_parity(lib_ok):
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 255, (4, 96, 128, 3), np.uint8)
    mean = [0.45, 0.45, 0.45]
    std = [0.225, 0.225, 0.225]
    roi = (10, 5, 120, 90)
    out = native.crop_resize_normalize(frames, roi, 64, mean, std)
    assert out.shape == (4, 64, 64, 3)
    assert out.dtype == np.float32

    # cv2 reference
    x1, y1, x2, y2 = roi
    ref = np.empty_like(out)
    for i in range(4):
        crop = frames[i, y1:y2, x1:x2]
        r = cv2.resize(crop, (64, 64), interpolation=cv2.INTER_LINEAR)
        ref[i] = (r.astype(np.float32) / 255.0 - mean) / std
    # bilinear conventions match cv2 half-pixel; tolerance ~1 LSB of u8
    np.testing.assert_allclose(out, ref, atol=2.5 / 255 / 0.225)


def test_full_frame_roi(lib_ok):
    rs = np.random.RandomState(1)
    frames = rs.randint(0, 255, (2, 48, 64, 3), np.uint8)
    out = native.crop_resize_normalize(
        frames, (0, 0, 64, 48), 32, [0.0] * 3, [1.0] * 3)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_native_used_in_window_dataset(lib_ok, tmp_path):
    from aicity_action_tpu.pipeline.window_inference import WindowDataset

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(40):
        w.write(np.full((48, 64, 3), i * 3 % 255, np.uint8))
    w.release()
    ds = WindowDataset(path, frame_length=4, frame_stride=4,
                       proposal_stride=16, frame_size=32)
    inputs, t0, t1 = ds[0]
    assert inputs[0].shape == (4, 32, 32, 3)
    assert inputs[0].dtype == np.float32
