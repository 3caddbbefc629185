"""CLI smoke tests: drive the real tools/ entry points in subprocesses."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_OPTS = [
    "DATA.NUM_FRAMES", "4", "DATA.SAMPLING_RATE", "2",
    "DATA.TRAIN_CROP_SIZE", "32", "DATA.TEST_CROP_SIZE", "32",
    "DATA.TRAIN_JITTER_SCALES", "[40, 48]",
    "MVIT.EMBED_DIM", "16", "MVIT.DEPTH", "2",
    "MVIT.DIM_MUL", "[[1, 2.0]]", "MVIT.HEAD_MUL", "[[1, 2.0]]",
    "MVIT.POOL_Q_STRIDE", "[[1, 1, 2, 2]]",
    "MVIT.POOL_KV_STRIDE_ADAPTIVE", "[1, 2, 2]",
    "MVIT.DROPPATH_RATE", "0.0",
    "MODEL.ACT_CHECKPOINT", "False", "MODEL.NUM_CLASSES", "3",
    "TRAIN.BATCH_SIZE", "8", "TEST.BATCH_SIZE", "8",
    "TEST.NUM_ENSEMBLE_VIEWS", "2", "TEST.NUM_SPATIAL_CROPS", "1",
    "SOLVER.MAX_EPOCH", "1", "SOLVER.WARMUP_EPOCHS", "0.0",
    "TRAIN.EVAL_PERIOD", "1", "TRAIN.CHECKPOINT_PERIOD", "1",
    "TRAIN.CHECKPOINT_TYPE", "jax", "TRAIN.AUTO_RESUME", "False",
    "TPU.COMPUTE_DTYPE", "float32",
    "DATA_LOADER.NUM_WORKERS", "2", "LOG_PERIOD", "1",
]


def _run(cmd, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"  # the host env may pin JAX_PLATFORMS=axon
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    # Hermetic CPU subprocess: drop the axon TPU plugin from PYTHONPATH.
    # With it present, jax's backend init dials the TPU tunnel even under
    # JAX_PLATFORM_NAME=cpu, and a down/slow tunnel hangs the whole test.
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    return subprocess.run(
        [sys.executable] + cmd, capture_output=True, text=True,
        timeout=timeout, env=env, cwd=REPO,
    )


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rs = np.random.RandomState(0)
    for i in range(8):
        w = cv2.VideoWriter(str(d / f"v{i}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
        for _ in range(40):
            w.write(rs.randint(0, 255, (48, 64, 3), np.uint8))
        w.release()
    for split in ("train", "val", "test"):
        with open(d / f"{split}.csv", "w") as f:
            for i in range(8):
                f.write(f"v{i}.mp4 {i % 3}\n")
    return d


def test_run_net_cli(data_dir, tmp_path):
    r = _run([
        "tools/run_net.py",
        "--cfg", "configs/AICITY_MVITV2_B_16x4_448.yaml",
        "OUTPUT_DIR", str(tmp_path / "out"),
        "DATA.PATH_TO_DATA_DIR", str(data_dir),
        "DATA.PATH_PREFIX", str(data_dir),
    ] + TINY_OPTS)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "test_final" in r.stdout + r.stderr
    assert os.path.isdir(str(tmp_path / "out" / "checkpoints"))


def test_temporal_inf_and_postprocess_cli(data_dir, tmp_path):
    lst = tmp_path / "videos.lst"
    lst.write_text("v0.mp4\nv1.mp4\n")
    r = _run([
        "tools/run_temporal_inf.py",
        "--cfg", "configs/AICITY_MVITV2_B_16x4_448.yaml",
        "--video_lst", str(lst), "--video_path", str(data_dir),
        "--out_dir", str(tmp_path / "preds"),
        "--frame_length", "4", "--frame_stride", "2",
        "--proposal_stride", "8", "--frame_size", "32",
        "--batch_size", "4", "--num_workers", "2",
        "OUTPUT_DIR", str(tmp_path / "out2"), "TRAIN.ENABLE", "False",
    ] + TINY_OPTS + ["MODEL.NUM_CLASSES", "18"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(str(tmp_path / "preds" / "v0.pkl"))

    thres = tmp_path / "thres.txt"
    thres.write_text("".join(f"{c} 0.05\n" for c in range(1, 18)))
    vid_csv = tmp_path / "vids.csv"
    vid_csv.write_text("video_id,f1,f2,f3\n1,v0,v1,v0\n")
    r = _run([
        "tools/aicity_inf.py", str(tmp_path / "preds"), str(thres),
        str(vid_csv), str(tmp_path / "submission.txt"),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(str(tmp_path / "submission.txt"))


def test_split_anno_cli(tmp_path):
    anno = tmp_path / "anno.csv"
    anno.write_text(
        "Dash_u_1.100.0.5.MP4 3\nDash_u_1.100.5.9.MP4 -1\n"
        "Dash_u_2.200.0.5.MP4 5\nDash_u_2.200.5.9.MP4 -2\n"
    )
    r = _run(["tools/aicity_split_anno.py", str(anno),
              str(tmp_path / "splits")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(str(tmp_path / "splits" / "splits_1" / "train.csv"))
