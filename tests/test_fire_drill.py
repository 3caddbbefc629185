"""End-to-end released-checkpoint fire drill (tools/fire_drill.py).

Chains the real CLI surfaces — convert -> sliding-window scoring ->
submission -> F1 — in one subprocess, the exact command that runs when the
released K700/aicity ``.pyth`` and A2 videos land (reference target:
F1 = 0.3295, /root/reference/README.md:159). Here a synthetic tiny ``.pyth``
with reference tensor naming and synthetic videos stand in; the assertions
are structural (every stage runs, artifacts appear, F1 is computed) plus
stage-skip resumability.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from test_convert_cli import _write_pyth  # noqa: E402
from test_model_parity import tiny_cfg  # noqa: E402


def _run(cmd, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    return subprocess.run(
        [sys.executable] + cmd, capture_output=True, text=True,
        timeout=timeout, env=env, cwd=REPO,
    )


def test_fire_drill_end_to_end(tmp_path):
    cfg = tiny_cfg()
    cfg.MODEL.ARCH = "mvit"  # single-pathway packing (tiny_cfg leaves the
    # default "slowfast", which would feed MViT a 2-pathway input list)
    cfg.MODEL.NUM_CLASSES = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    yaml_path = tmp_path / "tiny.yaml"
    yaml_path.write_text(cfg.dump())

    pyth = str(tmp_path / "released.pyth")
    _write_pyth(cfg, pyth)

    rs = np.random.RandomState(0)
    for name in ("v0", "v1"):
        w = cv2.VideoWriter(str(tmp_path / f"{name}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
        for _ in range(40):
            w.write(rs.randint(0, 255, (48, 64, 3), np.uint8))
        w.release()
    (tmp_path / "videos.lst").write_text("v0.mp4\nv1.mp4\n")
    (tmp_path / "vids.csv").write_text("video_id,f1,f2,f3\n1,v0,v1,v0\n")
    (tmp_path / "thres.txt").write_text(
        "".join(f"{c} 0.05\n" for c in range(1, 18)))
    # anno rows: file_id.user_id.t0.t1.MP4 label (aicity_inf_graph format)
    (tmp_path / "anno.csv").write_text("v0.u1.0.1.MP4 2\nv1.u1.0.1.MP4 3\n")

    drill = [
        "tools/fire_drill.py",
        "--pyth", pyth, "--cfg", str(yaml_path),
        "--video_lst", str(tmp_path / "videos.lst"),
        "--video_path", str(tmp_path),
        "--vid_csv", str(tmp_path / "vids.csv"),
        "--thres_file", str(tmp_path / "thres.txt"),
        "--out_dir", str(tmp_path / "drill"),
        "--anno_csv", str(tmp_path / "anno.csv"),
        "--skip_verify",
        "--frame_length", "4", "--frame_stride", "2",
        "--proposal_stride", "8", "--frame_size", "32",
        "--batch_size", "4",
    ]
    r = _run(drill)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert os.path.exists(str(tmp_path / "drill" / "submission.txt"))
    assert os.path.exists(str(tmp_path / "drill" / "preds" / "v0.pkl"))

    summary = None
    for line in r.stdout.splitlines():
        if line.startswith("[fire_drill] {"):
            summary = json.loads(line.split(" ", 1)[1])
    assert summary is not None, r.stdout[-2000:]
    assert summary["convert"]["shape_mismatched"] == 0
    assert summary["convert"]["missing_in_ckpt"] == 0
    assert summary["preds"] == 2
    assert "f1" in summary and np.isfinite(summary["f1"])

    # resumability: a second run skips the expensive stages
    r2 = _run(drill, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert r2.stdout.count("skipping") == 2, r2.stdout[-2000:]
