"""Numerical oracle for ops/roi_align.py (VERDICT r4 item 2).

The oracle `_roi_align_np` is a straight per-sample transliteration of the
detectron2/torchvision CPU kernel semantics (`ROIAlign_cpu.cpp` /
`roi_align_common.h`, as vendored by detectron2 and used by the reference's
detection head `head_helper.py:78-84`):

  - aligned=True: coords shifted by -0.5; no roi-size floor
  - aligned=False (legacy): roi width/height floored at 1
  - sampling_ratio=0: per-ROI adaptive grid ceil(roi_h/out) x ceil(roi_w/out)
  - bilinear zero rule: y < -1 or y > H (boundary inclusive survival),
    then y<=0 -> 0 and y_low >= H-1 -> y = H-1 clamps
  - count = max(grid_h * grid_w, 1); an empty grid (degenerate box) -> 0

Hand-computed closed-form cases use a linear-ramp image, where bilinear
interpolation is exact and each output bin equals the ramp evaluated at the
average of its sample coordinates — so a +-0.5 offset mutation shifts every
value by 0.5*slope and fails the 1e-5 comparisons below.
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from aicity_action_tpu.ops.roi_align import roi_align  # noqa: E402


def _bilinear_np(img, y, x):
    H, W, _ = img.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(img.shape[-1], img.dtype)
    y = min(max(y, 0.0), H - 1)
    x = min(max(x, 0.0), W - 1)
    y0, x0 = int(math.floor(y)), int(math.floor(x))
    y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    return (img[y0, x0] * (1 - ly) * (1 - lx)
            + img[y0, x1] * (1 - ly) * lx
            + img[y1, x0] * ly * (1 - lx)
            + img[y1, x1] * ly * lx)


def _roi_align_np(features, boxes, out, scale, sampling_ratio=0,
                  aligned=True):
    """Per-sample loop oracle, detectron2 CPU-kernel semantics."""
    N = boxes.shape[0]
    C = features.shape[-1]
    res = np.zeros((N, out, out, C), np.float64)
    offset = 0.5 if aligned else 0.0
    for n in range(N):
        b = int(boxes[n, 0])
        img = features[b].astype(np.float64)
        x1 = boxes[n, 1] * scale - offset
        y1 = boxes[n, 2] * scale - offset
        x2 = boxes[n, 3] * scale - offset
        y2 = boxes[n, 4] * scale - offset
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
        bin_w, bin_h = roi_w / out, roi_h / out
        gh = sampling_ratio if sampling_ratio > 0 else math.ceil(roi_h / out)
        gw = sampling_ratio if sampling_ratio > 0 else math.ceil(roi_w / out)
        count = max(gh * gw, 1)
        for ph in range(out):
            for pw in range(out):
                acc = np.zeros(C, np.float64)
                for iy in range(gh):
                    y = y1 + ph * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        x = x1 + pw * bin_w + (ix + 0.5) * bin_w / gw
                        acc += _bilinear_np(img, y, x)
                res[n, ph, pw] = acc / count
    return res


def _run(features, boxes, out, scale, sampling_ratio=0, aligned=True,
         **kw):
    got = np.asarray(roi_align(
        features.astype(np.float32), boxes.astype(np.float32),
        output_size=out, spatial_scale=scale,
        sampling_ratio=sampling_ratio, aligned=aligned, **kw))
    want = _roi_align_np(features, boxes, out, scale, sampling_ratio,
                         aligned)
    return got, want


def _ramp(H, W, sy=1.0, sx=0.0, c0=0.0):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    return (c0 + sy * yy + sx * xx)[..., None]


class TestClosedForm:
    """Hand-computed cases on linear ramps (bilinear is exact there)."""

    def test_aligned_center_alignment(self):
        # img[y,x] = y over 8x8. Box (x1,y1,x2,y2)=(0,0,4,4), scale=1,
        # out=2, sampling_ratio=1. aligned=True: start=-0.5, bin=2, sample
        # centers at y = -0.5 + (ph + 0.5)*2 = {0.5, 2.5}. Ramp value = y.
        feats = _ramp(8, 8)[None]
        boxes = np.array([[0, 0, 0, 4, 4]], np.float64)
        got, want = _run(feats, boxes, 2, 1.0, sampling_ratio=1)
        np.testing.assert_allclose(
            got[0, :, :, 0], [[0.5, 0.5], [2.5, 2.5]], atol=1e-5)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_legacy_offset_differs_by_half(self):
        # Same box, aligned=False: start=0, samples at y = {1, 3} — the
        # outputs differ from aligned by exactly the 0.5 shift, so a +-0.5
        # offset mutation in the op flips which of these two tests passes.
        feats = _ramp(8, 8)[None]
        boxes = np.array([[0, 0, 0, 4, 4]], np.float64)
        got, want = _run(feats, boxes, 2, 1.0, sampling_ratio=1,
                         aligned=False)
        np.testing.assert_allclose(
            got[0, :, :, 0], [[1.0, 1.0], [3.0, 3.0]], atol=1e-5)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_adaptive_grid_is_per_roi(self):
        # out=2; roi_h=6 -> gh=3 but roi_w=2 -> gw=1: samples average the
        # ramp at y in {0.5+k} per bin (mean = bin center) and a single
        # x sample per bin. With a y-ramp the value is the bin's y-center:
        # bins rows at y = -0.5 + {1.5, 4.5} = {1.0, 4.0}.
        feats = _ramp(8, 8)[None]
        boxes = np.array([[0, 0, 0, 2, 6]], np.float64)
        got, want = _run(feats, boxes, 2, 1.0)
        np.testing.assert_allclose(
            got[0, :, :, 0], [[1.0, 1.0], [4.0, 4.0]], atol=1e-5)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_spatial_scale(self):
        # boxes in input coords, features at stride 4: scale=0.25
        feats = _ramp(4, 4, sy=0.0, sx=1.0)[None]
        boxes = np.array([[0, 0, 0, 16, 16]], np.float64)
        got, want = _run(feats, boxes, 2, 0.25, sampling_ratio=2)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # x-ramp: columns at x = -0.5 + (pw+0.5)*2 = {0.5, 2.5}
        np.testing.assert_allclose(
            got[0, :, :, 0], [[0.5, 2.5], [0.5, 2.5]], atol=1e-5)

    def test_out_of_range_zero_rule(self):
        # constant image = 1; box reaching y in [-4, 0.0] (aligned ->
        # samples at y = -4.5 + {0.5,1.5,2.5,3.5} = {-4,-3,-2,-1}): the
        # samples at y < -1 are zeroed, y = -1 clamps to row 0 (value 1).
        feats = np.ones((1, 4, 4, 1), np.float64)
        boxes = np.array([[0, 1, -4, 2, 0]], np.float64)
        got, want = _run(feats, boxes, 1, 1.0, sampling_ratio=4)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # exactly one of 16 samples survives (y=-1 row, all 4 x in range)
        np.testing.assert_allclose(got[0, 0, 0, 0], 4 / 16, atol=1e-5)

    def test_degenerate_box_empty_grid(self):
        # zero-area box, adaptive grid -> gh=gw=0 -> empty loop -> 0
        feats = np.ones((1, 4, 4, 1), np.float64)
        boxes = np.array([[0, 2, 2, 2, 2]], np.float64)
        got, want = _run(feats, boxes, 2, 1.0)
        np.testing.assert_allclose(got, 0.0, atol=1e-7)
        np.testing.assert_allclose(got, want, atol=1e-7)


class TestPropertyVsOracle:
    """Randomized parity vs the per-sample numpy kernel."""

    @pytest.mark.parametrize("aligned", [True, False])
    @pytest.mark.parametrize("sampling_ratio", [0, 2])
    def test_random_boxes(self, aligned, sampling_ratio):
        rs = np.random.RandomState(0)
        B, H, W, C = 2, 14, 14, 3
        feats = rs.randn(B, H, W, C)
        N = 12
        # boxes in input coords (stride 4 -> 56x56 input), clipped to image
        x1 = rs.uniform(0, 40, N)
        y1 = rs.uniform(0, 40, N)
        boxes = np.stack([
            rs.randint(0, B, N).astype(np.float64),
            x1, y1,
            np.minimum(x1 + rs.uniform(1, 30, N), 56),
            np.minimum(y1 + rs.uniform(1, 30, N), 56),
        ], 1)
        got, want = _run(feats, boxes, 7, 0.25,
                         sampling_ratio=sampling_ratio, aligned=aligned)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_boundary_boxes(self):
        # boxes hugging/overhanging the borders exercise the zero rule and
        # both clamps; includes a sub-pixel box (adaptive grid 1x1)
        rs = np.random.RandomState(1)
        feats = rs.randn(1, 6, 6, 2)
        boxes = np.array([
            [0, -3.0, -3.0, 2.0, 2.0],   # overhangs top-left
            [0, 4.0, 4.0, 9.0, 9.0],     # overhangs bottom-right
            [0, 0.0, 0.0, 6.0, 6.0],     # exact cover
            [0, 2.25, 2.25, 2.75, 2.75],  # sub-pixel
        ], np.float64)
        got, want = _run(feats, boxes, 3, 1.0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_max_samples_cap_matches_when_sufficient(self):
        # explicit cap >= every ROI's adaptive grid -> exact parity
        rs = np.random.RandomState(2)
        feats = rs.randn(1, 8, 8, 1)
        boxes = np.array([[0, 0, 0, 30, 30]], np.float64)  # grid 4x4 @ scale1
        got, want = _run(feats, boxes, 2, 1.0, max_samples=16)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_gradients_finite(self):
        import jax.numpy as jnp

        rs = np.random.RandomState(3)
        feats = jnp.asarray(rs.randn(1, 6, 6, 2), jnp.float32)
        boxes = jnp.asarray([[0, 0.5, 0.5, 5.0, 4.0]], jnp.float32)

        def loss(f):
            return roi_align(f, boxes, output_size=3,
                             spatial_scale=1.0).sum()

        g = jax.grad(loss)(feats)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
