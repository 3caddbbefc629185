"""Meter semantics tests (TestMeter ensembling, ScalarMeter, get_map)."""

import numpy as np
import pytest

from aicity_action_tpu.utils.meters import ScalarMeter, TestMeter, get_map


def test_scalar_meter_window():
    m = ScalarMeter(window_size=3)
    for v in [1.0, 100.0, 2.0, 3.0, 4.0]:
        m.add_value(v)
    assert m.get_win_median() == 3.0  # window = [2, 3, 4]
    assert m.get_global_avg() == pytest.approx(22.0)


def test_test_meter_sum_ensemble():
    # 2 videos x 3 clips, sum ensemble: video pred = sum of clip scores
    m = TestMeter(num_videos=2, num_clips=3, num_cls=4)
    for clip in range(3):
        preds = np.zeros((2, 4), np.float32)
        preds[0, 1] = 0.4  # video 0 always votes class 1
        preds[1, clip] = 1.0  # video 1 votes a different class each clip
        labels = np.array([1, 0])
        clip_ids = np.array([0 * 3 + clip, 1 * 3 + clip])
        m.update_stats(preds, labels, clip_ids)
    stats = m.finalize_metrics()
    np.testing.assert_allclose(m.video_preds[0], [0, 1.2, 0, 0])
    assert stats["top1_acc"] == pytest.approx(100.0)


def test_test_meter_max_ensemble():
    m = TestMeter(num_videos=1, num_clips=2, num_cls=3,
                  ensemble_method="max")
    m.update_stats(np.array([[0.1, 0.9, 0.0]]), np.array([1]), np.array([0]))
    m.update_stats(np.array([[0.8, 0.2, 0.0]]), np.array([1]), np.array([1]))
    m.finalize_metrics()
    np.testing.assert_allclose(m.video_preds[0], [0.8, 0.9, 0.0])


def test_test_meter_label_mismatch_raises():
    m = TestMeter(num_videos=1, num_clips=2, num_cls=3)
    m.update_stats(np.array([[1, 0, 0.0]]), np.array([0]), np.array([0]))
    with pytest.raises(AssertionError):
        m.update_stats(np.array([[1, 0, 0.0]]), np.array([2]), np.array([1]))


def test_get_map_perfect_and_random():
    labels = np.zeros((6, 3), np.float32)
    labels[:3, 0] = 1
    labels[3:, 1] = 1
    perfect = labels + np.random.RandomState(0).rand(6, 3) * 0.01
    assert get_map(perfect, labels) == pytest.approx(1.0)
    # all-zero-label rows are dropped
    labels2 = labels.copy()
    labels2[5] = 0
    assert 0.0 <= get_map(perfect, labels2) <= 1.0
