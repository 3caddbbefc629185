"""Post-processing parity vs the reference's own script functions.

`scripts/aicity_inf_graph.py` imports cleanly (numpy/matplotlib/tqdm), so its
`get_chunks` / `aggregate_predictions` / `compute_f1` serve as the oracle.
"""

import importlib.util
import sys

import numpy as np
import pytest

from aicity_action_tpu.pipeline import postprocess as pp


@pytest.fixture(scope="module")
def ref():
    import matplotlib

    matplotlib.use("Agg")
    spec = importlib.util.spec_from_file_location(
        "ref_inf_graph", "/root/reference/scripts/aicity_inf_graph.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_inf_graph"] = mod
    spec.loader.exec_module(mod)
    return mod


def _fake_preds(seed=0, n_windows=30, num_class=6):
    rs = np.random.RandomState(seed)
    preds = []
    for i in range(n_windows):
        t0 = i * 16
        preds.append((t0, t0 + 64, rs.rand(num_class).astype(np.float32)))
    return preds


def test_aggregate_predictions_parity(ref):
    for agg in (np.mean, np.max):
        preds = _fake_preds()
        got = pp.aggregate_predictions(preds, agg, 6)
        want = ref.aggregate_predictions(preds, agg, 6)
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert got.shape[1] == 6


def test_aggregate_predictions_parity_at_scale(ref):
    """10-min-video scale (18k frames, ~1.1k windows) + irregular windows.

    The repo path is a segment-decomposition rewrite (O(W log W + F) vs the
    reference's O(F x W) loops); this pins exact-output parity at the scale
    the speedup matters, including gaps, overlaps and zero-length windows.
    """
    rs = np.random.RandomState(3)
    preds = [
        (t0, t0 + 64, rs.rand(18).astype(np.float32))
        for t0 in range(0, 18000 - 64, 16)
    ]
    # irregular extras: a gap-spanning window, a zero-length window,
    # and windows with negative scores (max path must not clamp at 0)
    preds += [
        (17990, 17990, rs.rand(18).astype(np.float32)),
        (500, 900, -rs.rand(18).astype(np.float32)),
    ]
    for agg in (np.mean, np.max):
        got = pp.aggregate_predictions(preds, agg, 18)
        want = ref.aggregate_predictions(preds, agg, 18)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_get_chunks_parity(ref):
    rs = np.random.RandomState(1)
    for trial in range(20):
        scores = rs.rand(50).astype(np.float32)
        thres = rs.uniform(0.2, 0.8)
        got = pp.get_chunks(scores, thres)
        want = ref.get_chunks(scores, thres)
        assert len(got) == len(want), (trial, thres)
        for g, w in zip(got, want):
            assert g[0] == w[0] and g[1] == w[1] and g[2] == w[2]
            np.testing.assert_allclose(g[3], w[3], rtol=1e-6)


def test_get_chunks_edges():
    # run reaching the last frame closes inclusively
    scores = np.array([0.1, 0.9, 0.9, 0.9])
    chunks = pp.get_chunks(scores, 0.5)
    assert len(chunks) == 1
    start, end, length, mean, _ = chunks[0]
    assert (start, end, length) == (1, 3, 3)
    # reference quirk (kept for parity): a run that STARTS at the very last
    # frame is dropped (start is set, then the loop ends without closing)
    scores2 = np.array([0.1, 0.1, 0.9])
    assert len(pp.get_chunks(scores2, 0.5)) == 0


def test_compute_f1_parity(ref):
    rs = np.random.RandomState(2)
    classes = [1, 2, 3]
    anno_data = {}
    action_chunks = {}
    for u in range(4):
        vid = f"user{u}_1"
        files = [f"{v}_user{u}_1" for v in ("Dash", "Rear", "Right")]
        annos = []
        for c in classes:
            t0 = int(rs.randint(0, 100))
            for f in files:
                annos.append((f, str(u), t0, t0 + 10, c))
        anno_data[vid] = annos
        for f in files:
            chunks = {}
            for c in classes:
                gt_t0 = [a[2] for a in annos if a[-1] == c][0]
                # half the time predict near-GT, half the time off
                if rs.rand() < 0.5:
                    chunks[c] = [(gt_t0 + rs.uniform(-1, 1),
                                  gt_t0 + 10 + rs.uniform(-1, 1), 10, 0.9)]
                else:
                    chunks[c] = [(gt_t0 + 30.0, gt_t0 + 55.0, 25, 0.5)]
            action_chunks[f] = chunks

    for sort_base in ("length", "score"):
        got = pp.compute_f1(anno_data, classes, action_chunks,
                            chunk_sort_base=sort_base, return_pr=True)
        want = ref.compute_f1(anno_data, classes, action_chunks,
                              chunk_sort_base=sort_base, return_pr=True)
        np.testing.assert_allclose(got, want, rtol=1e-9)


def test_threshold_derivation_reductions():
    scores = {
        "Dash_u0_1": np.zeros((300, 4), np.float32),
    }
    scores["Dash_u0_1"][30:60, 2] = 0.8
    anno = {"u0_1": [("Dash_u0_1", "0", 1, 2, 2)]}  # seconds 1-2 = frames 30-60
    thres = pp.derive_thresholds(anno, scores, [2], thres_take="max")
    assert thres[2] == pytest.approx(0.8)
    thres_mean = pp.derive_thresholds(anno, scores, [2], thres_take="mean")
    # mean includes the seeded 0.0 (reference parity)
    assert thres_mean[2] == pytest.approx(0.4)


def test_submission_merge_and_tighten():
    video_views = {"vid1": ["a", "b", "c"]}
    view_chunks = {
        "a": {1: [(10.4, 20.6, 306, 0.9)]},
        "b": {1: [(10.0, 19.0, 270, 0.95)]},
        "c": {},
    }
    rows = pp.merge_views_to_submission(
        video_views, view_chunks, {1: 0.5}, sort_base="length"
    )
    assert rows == [("vid1", 1, round(10.4) + 1.0, round(20.6) - 1.0)]
    rows2 = pp.merge_views_to_submission(
        video_views, view_chunks, {1: 0.5}, sort_base="score"
    )
    assert rows2[0][2] == 11.0 and rows2[0][3] == 18.0
