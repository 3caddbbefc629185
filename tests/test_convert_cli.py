"""Checkpoint-conversion fire drill (tools/convert_checkpoint.py).

Writes a synthetic FULL-SIZE MViT-v2-B 16x4@448 ``.pyth`` with reference
tensor names/format (`/root/reference/slowfast/utils/checkpoint.py:107-139`)
and runs the one-command converter that stands ready for the released
K700/aicity checkpoints: per-tensor report, orbax output loadable by the
test engine, and (at a smaller size) torch logit verification.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from aicity_action_tpu.config import assert_and_infer_cfg, get_cfg  # noqa: E402
from test_model_parity import TorchOracleMViT, tiny_cfg  # noqa: E402

import convert_checkpoint as cc  # noqa: E402


def _write_pyth(cfg, path, epoch=30):
    from aicity_action_tpu.models.mvit import build_mvit_spec

    spec = build_mvit_spec(cfg)
    torch.manual_seed(0)
    oracle = TorchOracleMViT(cfg, spec)
    sd = oracle.reference_state_dict()
    torch.save({"model_state": sd, "epoch": epoch, "cfg": "synthetic"}, path)
    return sd


def test_convert_full_size_mvitv2_b(tmp_path):
    """Full-size fire drill: every model parameter must load, none skipped."""
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml")
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg = assert_and_infer_cfg(cfg)
    cfg.OUTPUT_DIR = str(tmp_path / "out")

    pyth = str(tmp_path / "full_b.pyth")
    _write_pyth(cfg, pyth)

    report = cc.convert(pyth, cfg, cfg.OUTPUT_DIR, None, verify=False)
    assert report["counts"]["shape_mismatched"] == 0, \
        report["shape_mismatched"][:5]
    assert report["counts"]["missing_in_ckpt"] == 0, \
        report["missing_in_ckpt"][:5]
    assert report["counts"]["loaded"] > 150  # B-16 has 16 blocks x ~12 tensors
    assert os.path.exists(report["orbax_path"])
    assert report["epoch"] == 30

    # the orbax output must load through the test-engine path
    import optax

    from aicity_action_tpu.engine.steps import TrainState
    from aicity_action_tpu.models.build import build_model_with_state
    from aicity_action_tpu.utils import checkpoint as cu

    module, params, model_state = build_model_with_state(cfg)
    state = TrainState.create(params, optax.identity(), model_state)
    cfg.TEST.CHECKPOINT_FILE_PATH = report["orbax_path"]
    cfg.TEST.CHECKPOINT_TYPE = "jax"
    state = cu.load_test_checkpoint(cfg, state)
    # one converted weight must equal the source tensor
    w = np.asarray(state.params["head"]["projection"]["bias"])
    ckpt = cc.load_torch_checkpoint(pyth)
    np.testing.assert_allclose(
        w, ckpt["model_state"]["head.projection.bias"].numpy(), atol=0)


def test_convert_and_verify_logits(tmp_path):
    """--verify on a small config: converted JAX logits match the torch
    reference composition to 1e-3 (the BASELINE.json north star)."""
    cfg = tiny_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    pyth = str(tmp_path / "tiny.pyth")
    _write_pyth(cfg, pyth)

    report = cc.convert(pyth, cfg, cfg.OUTPUT_DIR,
                        str(tmp_path / "report.json"), verify=True)
    assert report["verify"]["ok"], report["verify"]
    assert os.path.exists(tmp_path / "report.json")
