"""AVA evaluation parity vs the reference's vendored TF-OD evaluator, plus
ROIAlign and RoI-head tests."""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicity_action_tpu.evaluation import ava_eval
from aicity_action_tpu.ops.roi_align import roi_align

AVA_REF = "/root/reference/slowfast/utils/ava_evaluation"


@pytest.fixture(scope="module")
def ref_eval():
    """Load the vendored TF-OD evaluator as an oracle (numpy-only)."""
    # the vendored code predates numpy 1.20 alias removal
    for alias, typ in [("float", float), ("int", int), ("bool", bool),
                       ("object", object), ("str", str)]:
        if not hasattr(np, alias):
            setattr(np, alias, typ)

    pkg = types.ModuleType("ava_evaluation")
    pkg.__path__ = [AVA_REF]
    sys.modules["ava_evaluation"] = pkg

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"ava_evaluation.{name}", f"{AVA_REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ava_evaluation.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
        return mod

    for name in ["np_box_list", "np_box_ops", "np_box_list_ops", "metrics",
                 "standard_fields", "per_image_evaluation", "label_map_util"]:
        load(name)
    return load("object_detection_evaluation")


def _random_scene(rs, n_gt, n_det, n_cls):
    gt_boxes = np.sort(rs.rand(n_gt, 2, 2), axis=1).transpose(0, 2, 1)
    gt_boxes = gt_boxes.reshape(n_gt, 4)[:, [0, 2, 1, 3]]  # y1 x1 y2 x2 valid
    gt_boxes = np.sort(rs.rand(n_gt, 4), axis=-1)[:, [0, 1, 2, 3]]
    # make well-formed y1<y2, x1<x2
    a = rs.rand(n_gt, 4)
    gt_boxes = np.stack([np.minimum(a[:, 0], a[:, 2]),
                         np.minimum(a[:, 1], a[:, 3]),
                         np.maximum(a[:, 0], a[:, 2]) + 0.05,
                         np.maximum(a[:, 1], a[:, 3]) + 0.05], axis=1)
    gt_labels = rs.randint(1, n_cls + 1, n_gt)
    # detections: jittered gt + noise boxes
    det_boxes = np.concatenate([
        gt_boxes + rs.randn(n_gt, 4) * 0.02,
        np.stack([np.minimum(a2 := rs.rand(n_det, 4), 0.9)[:, 0:1],
                  np.minimum(a2, 0.9)[:, 1:2],
                  np.minimum(a2, 0.9)[:, 0:1] + 0.1,
                  np.minimum(a2, 0.9)[:, 1:2] + 0.1], axis=1)[:, :, 0],
    ])
    det_labels = np.concatenate([gt_labels, rs.randint(1, n_cls + 1, n_det)])
    det_scores = rs.rand(len(det_boxes))
    return gt_boxes, gt_labels, det_boxes, det_labels, det_scores


def test_map_parity_vs_reference(ref_eval):
    sf = sys.modules["ava_evaluation.standard_fields"]
    n_cls = 4
    categories = [{"id": i, "name": f"c{i}"} for i in range(1, n_cls + 1)]
    oracle = ref_eval.PascalDetectionEvaluator(categories,
                                               matching_iou_threshold=0.5)
    mine = ava_eval.PascalDetectionEvaluator(range(1, n_cls + 1), 0.5)

    rs = np.random.RandomState(0)
    for img in range(12):
        gt_b, gt_l, det_b, det_l, det_s = _random_scene(rs, 5, 8, n_cls)
        key = f"img{img}"
        oracle.add_single_ground_truth_image_info(key, {
            sf.InputDataFields.groundtruth_boxes: gt_b.astype(np.float64),
            sf.InputDataFields.groundtruth_classes: gt_l,
            sf.InputDataFields.groundtruth_difficult: np.zeros(len(gt_l), bool),
        })
        oracle.add_single_detected_image_info(key, {
            sf.DetectionResultFields.detection_boxes: det_b.astype(np.float64),
            sf.DetectionResultFields.detection_classes: det_l,
            sf.DetectionResultFields.detection_scores: det_s,
        })
        mine.add_image(gt_b, gt_l, det_b, det_l, det_s)

    ref_metrics = oracle.evaluate()
    my_metrics = mine.evaluate()
    ref_map = ref_metrics["PascalBoxes_Precision/mAP@0.5IOU"]
    my_map = my_metrics["PascalBoxes_Precision/mAP@0.5IOU"]
    np.testing.assert_allclose(my_map, ref_map, atol=1e-6)


def test_csv_and_exclusions(tmp_path):
    gt = tmp_path / "gt.csv"
    gt.write_text(
        "vidA,0902,0.1,0.2,0.5,0.6,3,1\n"
        "vidA,0903,0.3,0.3,0.7,0.8,5,2\n"
    )
    boxes, labels, scores = ava_eval.read_csv(str(gt))
    assert ava_eval.make_image_key("vidA", 902) in boxes
    assert labels["vidA,0902"] == [3]
    # boxes are stored (y1, x1, y2, x2)
    np.testing.assert_allclose(boxes["vidA,0902"][0], [0.2, 0.1, 0.6, 0.5])

    ex = tmp_path / "ex.csv"
    ex.write_text("vidA,0903\n")
    excl = ava_eval.read_exclusions(str(ex))
    assert "vidA,0903" in excl


def test_labelmap_parse(tmp_path):
    pbtxt = tmp_path / "label.pbtxt"
    pbtxt.write_text(
        'item {\n  name: "bend/bow (at the waist)"\n  id: 1\n}\n'
        'item {\n  name: "run/jog"\n  id: 8\n}\n'
    )
    labelmap, ids = ava_eval.read_labelmap(str(pbtxt))
    assert ids == {1, 8}
    assert labelmap[0]["name"] == "bend/bow (at the waist)"


# -------------------------------------------------------------- roi align
def _roi_align_numpy(feat, boxes, out, scale, ns, aligned):
    """Straightforward reference implementation."""
    N = boxes.shape[0]
    H, W, C = feat.shape[1:]
    res = np.zeros((N, out, out, C), np.float32)
    off = 0.5 if aligned else 0.0
    for n in range(N):
        b, x1, y1, x2, y2 = boxes[n]
        b = int(b)
        x1, y1, x2, y2 = (v * scale - off for v in (x1, y1, x2, y2))
        bw, bh = (x2 - x1) / out, (y2 - y1) / out
        for i in range(out):
            for j in range(out):
                acc = np.zeros(C, np.float32)
                for si in range(ns):
                    for sj in range(ns):
                        y = y1 + (i + (si + 0.5) / ns) * bh
                        x = x1 + (j + (sj + 0.5) / ns) * bw
                        if y < -1 or y > H or x < -1 or x > W:
                            continue
                        yc, xc = min(max(y, 0), H - 1), min(max(x, 0), W - 1)
                        y0, x0 = int(np.floor(yc)), int(np.floor(xc))
                        y1_, x1_ = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = yc - y0, xc - x0
                        acc += (
                            feat[b, y0, x0] * (1 - ly) * (1 - lx)
                            + feat[b, y0, x1_] * (1 - ly) * lx
                            + feat[b, y1_, x0] * ly * (1 - lx)
                            + feat[b, y1_, x1_] * ly * lx
                        )
                res[n, i, j] = acc / (ns * ns)
    return res


@pytest.mark.parametrize("aligned", [True, False])
def test_roi_align_vs_numpy(aligned):
    rs = np.random.RandomState(0)
    feat = rs.randn(2, 14, 14, 3).astype(np.float32)
    boxes = np.array([
        [0, 8.0, 8.0, 100.0, 120.0],
        [1, 0.0, 0.0, 224.0, 224.0],
        [0, 32.0, 48.0, 160.0, 200.0],
    ], np.float32)
    out, scale = 7, 1 / 16.0
    got = roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                    output_size=out, spatial_scale=scale,
                    sampling_ratio=2, aligned=aligned)
    want = _roi_align_numpy(feat, boxes, out, scale, 2, aligned)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_roi_head_shapes():
    from aicity_action_tpu.models.roi_head import ResNetRoIHead

    head = ResNetRoIHead(
        num_classes=80, pool_size=((8, 1, 1),), resolution=(7,),
        scale_factor=(16,), act_func="sigmoid",
    )
    feats = [jnp.ones((2, 8, 14, 14, 32))]
    boxes = jnp.asarray([[0, 0, 0, 224, 224], [1, 16, 16, 128, 128]],
                        jnp.float32)
    params = head.init(jax.random.PRNGKey(0), feats, boxes)["params"]
    out = head.apply({"params": params}, feats, boxes)
    assert out.shape == (2, 80)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()
