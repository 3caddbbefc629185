"""bf16 host-transfer (TPU.BF16_HOST_TRANSFER) and the WindowScorer
phase-split contract (bench artifact plumbing, round 5)."""

import numpy as np

import jax
import jax.numpy as jnp

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.parallel.mesh import cast_for_transfer, host_transfer_dtype


def test_host_transfer_dtype_gating():
    cfg = get_cfg()
    assert cfg.TPU.BF16_HOST_TRANSFER is True  # default on
    # f32 compute: no cast, wire format unchanged
    assert host_transfer_dtype(cfg) is None
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    dt = host_transfer_dtype(cfg)
    assert dt is not None and dt.itemsize == 2
    # opt-out restores f32 wire format
    cfg.TPU.BF16_HOST_TRANSFER = False
    assert host_transfer_dtype(cfg) is None


def test_host_cast_is_bit_identical_to_device_cast():
    """The model's entry op casts f32 inputs to bf16 on device
    (models/mvit.py:893); the host ml_dtypes cast must round identically
    (both round-to-nearest-even) or the transfer would change numerics."""
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    dt = host_transfer_dtype(cfg)

    rs = np.random.RandomState(0)
    # include values straddling rounding boundaries and extremes
    x = np.concatenate([
        rs.randn(4096).astype(np.float32) * 3.0,
        np.asarray([0.0, -0.0, 1.0 + 2 ** -9, 1.0 + 2 ** -8, 65504.0,
                    1e-38, -1e-38], np.float32),
    ])
    host = cast_for_transfer(x, dt)
    dev = np.asarray(jnp.asarray(x).astype(jnp.bfloat16))
    np.testing.assert_array_equal(host.view(np.uint16), dev.view(np.uint16))


def test_cast_for_transfer_leaves_non_f32_alone():
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    dt = host_transfer_dtype(cfg)
    u8 = np.zeros((2, 2), np.uint8)
    assert cast_for_transfer(u8, dt) is u8
    i32 = np.zeros((2,), np.int32)
    assert cast_for_transfer(i32, dt) is i32
    f32 = np.zeros((2,), np.float32)
    assert cast_for_transfer(f32, None) is f32


def test_bf16_input_matches_f32_input_under_bf16_compute():
    """Full tiny-model check: feeding pre-cast bf16 frames produces the
    SAME logits as feeding f32 frames (the model casts at entry either
    way), so the transfer knob cannot change results."""
    from aicity_action_tpu.models.build import build_model

    cfg = get_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    m = cfg.MVIT
    m.EMBED_DIM = 16
    m.DEPTH = 2
    m.PATCH_PADDING = (1, 3, 3)
    m.DIM_MUL = [[1, 2.0]]
    m.HEAD_MUL = [[1, 2.0]]
    m.POOL_KVQ_KERNEL = [3, 3, 3]
    m.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    m.POOL_Q_STRIDE = [[1, 1, 2, 2]]
    m.CLS_EMBED_ON = False
    m.SEP_POS_EMBED = True
    m.CHANNEL_EXPAND_FRONT = True
    m.Q_POOL_ALL = True
    m.Q_POOL_RESIDUAL = True
    module, params = build_model(cfg)

    x = np.random.RandomState(0).randn(2, 4, 32, 32, 3).astype(np.float32)
    dt = host_transfer_dtype(cfg)
    fwd = jax.jit(lambda p, v: module.apply({"params": p}, [v], train=False))
    got_f32 = np.asarray(fwd(params, jnp.asarray(x)))
    got_bf16 = np.asarray(fwd(params, jnp.asarray(cast_for_transfer(x, dt))))
    np.testing.assert_array_equal(got_f32, got_bf16)


def test_window_scorer_phase_split_contract(tmp_path):
    """bench.py publishes scorer.last_timers as the artifact's phase
    split — pin the keys and the decoder-backend provenance field."""
    import cv2

    from aicity_action_tpu.models.build import build_model
    from aicity_action_tpu.parallel.mesh import make_mesh
    from aicity_action_tpu.pipeline.window_inference import (
        WindowDataset, WindowScorer,
    )

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    rs = np.random.RandomState(0)
    for _ in range(40):
        w.write(rs.randint(0, 255, (48, 64, 3), np.uint8))
    w.release()

    cfg = get_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.NUM_CLASSES = 5
    m = cfg.MVIT
    m.EMBED_DIM = 16
    m.DEPTH = 2
    m.PATCH_PADDING = (1, 3, 3)
    m.DIM_MUL = [[1, 2.0]]
    m.HEAD_MUL = [[1, 2.0]]
    m.POOL_KVQ_KERNEL = [3, 3, 3]
    m.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    m.POOL_Q_STRIDE = [[1, 1, 2, 2]]
    m.CLS_EMBED_ON = False
    m.SEP_POS_EMBED = True
    m.CHANNEL_EXPAND_FRONT = True
    m.Q_POOL_ALL = True
    m.Q_POOL_RESIDUAL = True

    mesh = make_mesh(cfg, devices=jax.devices()[:2])
    module, params = build_model(cfg)
    scorer = WindowScorer(module, params, mesh, batch_size=2, num_workers=1)
    assert scorer.last_timers is None
    ds = WindowDataset(path, frame_length=4, frame_stride=4,
                       proposal_stride=16, frame_size=32)
    preds = scorer.score_video(ds)
    assert len(preds) == len(ds)
    t = scorer.last_timers
    assert t is not None
    for key in ("decode", "upload", "dispatch", "drain"):
        assert isinstance(t[key], float), (key, t)
    assert t["decoder"] in ("vdec", "cv2")
    assert t["chunks"] >= 1 and t["calls"] >= 1
