"""Parity of data/cv2_transform.py against the reference module.

The reference file (slowfast/datasets/cv2_transform.py) imports only
numpy/cv2/math, so it loads standalone. Every function is driven with the
same np.random seed on both sides; our implementations consume draws in
the same order, so outputs must agree to f32 rounding (the reference does
some math in float64 via in-place updates; we vectorize in float32).
"""

import importlib.util

import numpy as np
import pytest

import aicity_action_tpu.data.cv2_transform as ours


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location(
        "ref_cv2_transform",
        "/root/reference/slowfast/datasets/cv2_transform.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _img_hwc(h=48, w=64, seed=0):
    return np.random.RandomState(seed).rand(h, w, 3).astype(np.float32) * 255


def _clip_hwc(n=4, h=48, w=64, seed=0):
    r = np.random.RandomState(seed)
    return [r.rand(h, w, 3).astype(np.float32) * 255 for _ in range(n)]


def _boxes(n=3, seed=1):
    r = np.random.RandomState(seed)
    b = r.rand(n, 4).astype(np.float32) * 40
    b[:, 2:] += b[:, :2]
    return b


def _cmp(a, b, **kw):
    if isinstance(a, (list, tuple)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            _cmp(x, y, **kw)
    elif a is None:
        assert b is None
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-5, **kw)


def _both(ref, fn_name, *args, seed=7, copy_idx=()):
    """Run ref and ours with identical seeds and cloned mutable args."""

    def clone(a):
        if isinstance(a, np.ndarray):
            return a.copy()
        if isinstance(a, list):
            return [clone(x) for x in a]
        return a

    np.random.seed(seed)
    r = getattr(ref, fn_name)(*[clone(a) for a in args])
    np.random.seed(seed)
    o = getattr(ours, fn_name)(*[clone(a) for a in args])
    return r, o


# ------------------------------------------------------------ deterministic

def test_box_helpers(ref):
    b = _boxes()
    _cmp(ref.clip_boxes_to_image(b.copy(), 30, 40),
         ours.clip_boxes_to_image(b.copy(), 30, 40))
    _cmp(ref.flip_boxes(b.copy(), 64), ours.flip_boxes(b.copy(), 64))
    _cmp(ref.crop_boxes(b.copy(), 5, 7), ours.crop_boxes(b.copy(), 5, 7))
    for h, w in [(48, 64), (64, 48), (50, 50)]:
        _cmp(ref.scale_boxes(32, b.copy(), h, w),
             ours.scale_boxes(32, b.copy(), h, w))
    _cmp(ref.revert_scaled_boxes(32, b.copy(), 480, 640),
         ours.revert_scaled_boxes(32, b.copy(), 480, 640))


def test_scale_and_crops(ref):
    for h, w in [(48, 64), (64, 48), (32, 80), (40, 40)]:
        im = _img_hwc(h, w)
        _cmp(ref.scale(32, im.copy()), ours.scale(32, im.copy()))
        _cmp(ref.center_crop(24, im.copy()), ours.center_crop(24, im.copy()))
    im = _img_hwc()
    _cmp(ref.CHW2HWC(im.transpose(2, 0, 1)),
         ours.CHW2HWC(im.transpose(2, 0, 1)))
    _cmp(ref.HWC2CHW(im), ours.HWC2CHW(im))
    for order in ("CHW", "HWC"):
        x = im.transpose(2, 0, 1) if order == "CHW" else im
        _cmp(ref.pad_image(x.copy(), 4, order),
             ours.pad_image(x.copy(), 4, order))


def test_color_normalization_and_grayscale(ref):
    chw = _img_hwc().transpose(2, 0, 1)
    _cmp(ref.color_normalization(chw.copy(), [100.0, 110.0, 120.0],
                                 [50.0, 55.0, 60.0]),
         ours.color_normalization(chw.copy(), [100.0, 110.0, 120.0],
                                  [50.0, 55.0, 60.0]))
    _cmp(ref.grayscale(chw.copy()), ours.grayscale(chw.copy()))
    _cmp(ref.blend(chw, chw[::-1], 0.3), ours.blend(chw, chw[::-1], 0.3))


# --------------------------------------------------------------- stochastic

def test_short_side_jitter_list(ref):
    clip, boxes = _clip_hwc(), [_boxes(seed=i) for i in range(4)]
    for seed in range(3):
        (ri, rb), (oi, ob) = _both(ref, "random_short_side_scale_jitter_list",
                                   clip, 30, 90, boxes, seed=seed)
        _cmp(ri, oi)
        _cmp(rb, ob)


def test_scale_jitters(ref):
    im, clip = _img_hwc(), _clip_hwc()
    for seed in range(3):
        r, o = _both(ref, "random_scale_jitter", im, 30, 90, seed=seed)
        _cmp(r, o)
        r, o = _both(ref, "random_scale_jitter_list", clip, 30, 90, seed=seed)
        _cmp(r, o)


def test_random_crop_list(ref):
    clip_hwc = _clip_hwc()
    clip_chw = [im.transpose(2, 0, 1) for im in clip_hwc]
    boxes = [_boxes(seed=i) for i in range(4)]
    for seed in range(3):
        (ri, rb), (oi, ob) = _both(ref, "random_crop_list", clip_chw, 24, 0,
                                   "CHW", boxes, seed=seed)
        _cmp(ri, oi)
        _cmp(rb, ob)
        (ri, rb), (oi, ob) = _both(ref, "random_crop_list", clip_hwc, 24, 4,
                                   "HWC", boxes, seed=seed)
        _cmp(ri, oi)
        _cmp(rb, ob)
    # exact-size early return
    small = [im[:24, :24] for im in clip_hwc]
    (ri, rb), (oi, ob) = _both(ref, "random_crop_list", small, 24, 0, "HWC",
                               boxes, seed=0)
    _cmp(ri, oi)


def test_spatial_shift_crop_list(ref):
    for shape in [(48, 64), (64, 48)]:
        clip = _clip_hwc(4, *shape)
        boxes = [_boxes(seed=i) for i in range(4)]
        for pos in (0, 1, 2):
            (ri, rb), (oi, ob) = _both(ref, "spatial_shift_crop_list", 32,
                                       clip, pos, boxes, seed=0)
            _cmp(ri, oi)
            _cmp(rb, ob)


def test_horizontal_flips(ref):
    im_chw = _img_hwc().transpose(2, 0, 1)
    im_hwc = _img_hwc()
    clip = _clip_hwc()
    clip_chw = [im.transpose(2, 0, 1) for im in clip]
    boxes = [_boxes(seed=i) for i in range(4)]
    for seed in range(4):  # cover both flip outcomes
        r, o = _both(ref, "horizontal_flip", 0.5, im_chw, "CHW", seed=seed)
        _cmp(r, o)
        r, o = _both(ref, "horizontal_flip", 0.5, im_hwc, "HWC", seed=seed)
        _cmp(r, o)
        (ri, rb), (oi, ob) = _both(ref, "horizontal_flip_list", 0.5, clip_chw,
                                   "CHW", boxes, seed=seed)
        _cmp(ri, oi)
        _cmp(rb, ob)
        (ri, rb), (oi, ob) = _both(ref, "horizontal_flip_list", 0.5, clip,
                                   "HWC", boxes, seed=seed)
        _cmp(ri, oi)
        _cmp(rb, ob)


def test_random_sized_crops(ref):
    im, clip = _img_hwc(), _clip_hwc()
    for seed in range(4):
        r, o = _both(ref, "random_sized_crop", im, 24, 0.08, seed=seed)
        _cmp(r, o)
        r, o = _both(ref, "random_sized_crop_list", clip, 24, 0.4, seed=seed)
        _cmp(r, o)


def test_color_ops(ref):
    chw = _img_hwc().transpose(2, 0, 1)
    clip = [im.transpose(2, 0, 1) for im in _clip_hwc()]
    for seed in range(3):
        for fn in ("saturation", "brightness", "contrast"):
            r, o = _both(ref, fn, 0.4, chw, seed=seed)
            _cmp(r, o)
        for fn in ("saturation_list", "brightness_list", "contrast_list"):
            r, o = _both(ref, fn, 0.4, clip, seed=seed)
            _cmp(r, o)
        r, o = _both(ref, "color_jitter", chw, 0.4, 0.4, 0.4, seed=seed)
        _cmp(r, o)
        r, o = _both(ref, "color_jitter_list", clip, 0.4, 0.4, 0.4, seed=seed)
        _cmp(r, o)


def test_lighting(ref):
    eigval = [0.225, 0.224, 0.229]
    eigvec = [[-0.5675, 0.7192, 0.4009],
              [-0.5808, -0.0045, -0.8140],
              [-0.5836, -0.6948, 0.4203]]
    chw = _img_hwc().transpose(2, 0, 1)
    clip = [im.transpose(2, 0, 1) for im in _clip_hwc()]
    for seed in range(3):
        r, o = _both(ref, "lighting", chw, 0.1, eigval, eigvec, seed=seed)
        _cmp(r, o)
        r, o = _both(ref, "lighting_list", clip, 0.1, eigval, eigvec,
                     seed=seed)
        _cmp(r, o)
    # alphastd=0 passthrough
    r, o = _both(ref, "lighting", chw, 0.0, eigval, eigvec, seed=0)
    _cmp(r, o)
