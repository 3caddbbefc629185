"""End-to-end engine tests: train a tiny MViT on synthetic videos over the
8-device CPU mesh, checkpoint, auto-resume, then run the multi-view test
engine."""

import glob
import os

import numpy as np
import pytest

from aicity_action_tpu.config import get_cfg, assert_and_infer_cfg

cv2 = pytest.importorskip("cv2")


def _write_video(path, num_frames, fps=30, size=(64, 48)):
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    assert w.isOpened()
    rs = np.random.RandomState(hash(path) % 2**31)
    for i in range(num_frames):
        w.write(rs.randint(0, 255, (size[1], size[0], 3), np.uint8))
    w.release()


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    vdir = d / "videos"
    vdir.mkdir()
    for i in range(8):
        _write_video(str(vdir / f"v{i}.mp4"), 40 + 4 * i)
    for split in ("train", "val", "test"):
        with open(vdir / f"{split}.csv", "w") as f:
            for i in range(8):
                f.write(f"v{i}.mp4 {i % 3}\n")
    return d


def _tiny_cfg(workdir):
    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(workdir / "out")
    cfg.DATA.PATH_TO_DATA_DIR = str(workdir / "videos")
    cfg.DATA.PATH_PREFIX = str(workdir / "videos")
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [40, 48]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    cfg.MODEL.DROPOUT_RATE = 0.1
    m = cfg.MVIT
    m.EMBED_DIM = 16
    m.DEPTH = 2
    m.PATCH_KERNEL = (3, 7, 7)
    m.PATCH_STRIDE = (2, 4, 4)
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
    m.DROPPATH_RATE = 0.1
    cfg.TRAIN.DATASET = "aicity"
    cfg.TEST.DATASET = "aicity"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.SOLVER.COSINE_END_LR = 0.0
    cfg.SOLVER.OPTIMIZING_METHOD = "adamw"
    cfg.SOLVER.ZERO_WD_1D_PARAM = True
    cfg.SOLVER.CLIP_GRAD_L2NORM = 1.0
    cfg.TRAIN.EVAL_PERIOD = 2
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.LOG_PERIOD = 1
    cfg.MIXUP.ENABLE = True
    return assert_and_infer_cfg(cfg)


def test_train_checkpoint_resume_and_test(workdir):
    from aicity_action_tpu.engine.train_loop import train
    from aicity_action_tpu.engine.test_loop import test

    cfg = _tiny_cfg(workdir)
    state = train(cfg)
    assert int(np.asarray(state.step)) == 2  # 8 videos / batch 8 = 1 it/ep

    ckpts = glob.glob(os.path.join(cfg.OUTPUT_DIR, "checkpoints",
                                   "checkpoint_epoch_*"))
    assert len(ckpts) == 2

    # auto-resume: raising MAX_EPOCH continues from epoch 2
    cfg2 = _tiny_cfg(workdir)
    cfg2.SOLVER.MAX_EPOCH = 3
    state2 = train(cfg2)
    assert int(np.asarray(state2.step)) == 3

    stats = test(cfg2)
    assert "top1_acc" in stats
    assert 0.0 <= stats["top1_acc"] <= 100.0


def test_async_checkpoint_train_and_resume(workdir, tmp_path):
    """TPU.ASYNC_CHECKPOINT: the orbax write runs on the writer thread, the
    drain hooks make it invisible — same checkpoints on disk, auto-resume
    works, and a writer failure surfaces at the next drain point."""
    from aicity_action_tpu.engine.train_loop import train
    from aicity_action_tpu.utils import checkpoint as cu

    cfg = _tiny_cfg(workdir)
    cfg.OUTPUT_DIR = str(tmp_path / "async_out")
    cfg.TPU.ASYNC_CHECKPOINT = True
    state = train(cfg)  # train() drains before returning
    assert cu._pending_save is None
    ckpts = glob.glob(os.path.join(cfg.OUTPUT_DIR, "checkpoints",
                                   "checkpoint_epoch_*"))
    assert len(ckpts) == 2

    cfg2 = _tiny_cfg(workdir)
    cfg2.OUTPUT_DIR = cfg.OUTPUT_DIR
    cfg2.TPU.ASYNC_CHECKPOINT = True
    cfg2.SOLVER.MAX_EPOCH = 3
    state2 = train(cfg2)  # auto-resume scan drains any in-flight write
    assert int(np.asarray(state2.step)) == 3

    # a failed async write raises at the next drain, not silently
    cu._pending_error.append(RuntimeError("disk full"))
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="disk full"):
        cu.wait_for_pending_saves()


def test_multidataset_epoch_driver(workdir):
    """Train a tiny 2-dataset multi-head model for 2 epochs; the epoch
    driver must run Multi_dataset_seq batches through the multi-head step
    and report per-dataset accuracy (reference: tools/train_net.py:155-218
    + meters.py:856-898)."""
    from aicity_action_tpu.engine.train_loop import train
    from aicity_action_tpu.utils.meters import MultiDatasetValMeter

    cfg = _tiny_cfg(workdir)
    cfg.OUTPUT_DIR = str(workdir / "out_multi")
    cfg.MIXUP.ENABLE = False
    cfg.TRAIN.DATASET = "multi_dataset_seq"
    cfg.MODEL.USE_MULTI_HEAD = True
    cfg.MODEL.MULTI_DATASETS = ["kinetics", "aicity"]
    cfg.MODEL.MULTI_REPLICAS = [1, 2]
    cfg.MODEL.MULTI_NUM_CLASSES = [3, 4]
    cfg.MODEL.MULTI_LOSS_FUNCS = ["soft_cross_entropy", "soft_cross_entropy"]
    cfg.MODEL.MULTI_HEAD_ACT = ["softmax", "softmax"]
    cfg.MODEL.MULTI_LOSS_WEIGHTS = [1.0, 1.0]
    cfg.MODEL.MULTI_PATH_TO_DATA_DIR = [str(workdir / "videos")] * 2
    cfg.MODEL.MULTI_PATH_PREFIX = [str(workdir / "videos")] * 2
    cfg.TRAIN.EVAL_PERIOD = 1
    cfg.TRAIN.CHECKPOINT_PERIOD = 10

    state = train(cfg)
    # 8 + 2*8 = 24 samples / batch 8 = 3 iters/epoch x 2 epochs
    assert int(np.asarray(state.step)) == 6

    # multi-head TEST engine: selects the tested dataset's head
    # (reference test_net.py:109-114)
    from aicity_action_tpu.engine.test_loop import test

    cfg.TEST.DATASET = "kinetics"
    cfg.MODEL.NUM_CLASSES = 3  # loader label space of the tested dataset
    stats = test(cfg)
    assert "top1_acc" in stats

    # the per-dataset meter math itself
    meter = MultiDatasetValMeter(1, cfg)
    preds = {
        "kinetics": np.eye(3, dtype=np.float32),
        "aicity": np.zeros((3, 4), np.float32),
    }
    labels = np.zeros((3, 4), np.float32)
    labels[np.arange(3), [0, 1, 0]] = 1.0
    meter.update_stats(preds, labels, np.array([0, 0, 1]))
    stats = meter.log_epoch_stats(0)
    assert stats["dataset_topk"]["kinetics"]["top1_acc"] == 1.0
    assert "aicity" in stats["dataset_topk"]


def test_padded_batch_masks_loss_and_grads(workdir):
    """A short batch padded to the compiled size (with n_valid) must produce
    exactly the loss/grads of the true short batch (reference trains on the
    short batch directly)."""
    import jax
    import jax.numpy as jnp

    from aicity_action_tpu.engine.steps import TrainState, make_train_step
    from aicity_action_tpu.models.build import build_model
    from aicity_action_tpu.solver.optimizer import construct_optimizer

    cfg = _tiny_cfg(workdir)
    cfg.MIXUP.ENABLE = False
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.MVIT.DROPPATH_RATE = 0.0
    module, params = build_model(cfg)
    tx, _ = construct_optimizer(cfg, params, steps_per_epoch=10)

    step = make_train_step(module, tx, cfg.MODEL.LOSS_FUNC,
                           num_classes=cfg.MODEL.NUM_CLASSES)
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    x = rs.randn(4, 4, 32, 32, 3).astype(np.float32)
    y = np.array([0, 1, 2, 0])
    n_valid = 3

    # padded batch: row n_valid.. repeats the last valid row
    xp = np.concatenate([x[:n_valid], np.repeat(x[n_valid - 1:n_valid],
                                                4 - n_valid + 1, axis=0)])[:4]
    yp = np.concatenate([y[:n_valid], np.repeat(y[n_valid - 1:n_valid],
                                                4 - n_valid + 1)])[:4]
    state = TrainState.create(params, tx)
    padded_state, padded_metrics, _ = jax.jit(step)(
        state,
        {"inputs": [jnp.asarray(xp)], "labels": jnp.asarray(yp),
         "n_valid": jnp.int32(n_valid)},
        rng,
    )

    state = TrainState.create(params, tx)
    short_state, short_metrics, _ = jax.jit(step)(
        state,
        {"inputs": [jnp.asarray(x[:n_valid])],
         "labels": jnp.asarray(y[:n_valid])},
        rng,
    )

    np.testing.assert_allclose(float(padded_metrics["loss"]),
                               float(short_metrics["loss"]), rtol=1e-5)
    # parameter updates must match: padding contributed zero gradient
    for pp, sp in zip(jax.tree.leaves(padded_state.params),
                      jax.tree.leaves(short_state.params)):
        # tolerance: Adam normalizes by sqrt(v), amplifying the tiny
        # batch-4-vs-3 matmul tiling differences up to the update scale
        np.testing.assert_allclose(np.asarray(pp), np.asarray(sp),
                                   atol=1e-4, rtol=1e-3)


def test_test_engine_ensembles_views(workdir):
    """All views of one video must land in the same ensemble slot."""
    from aicity_action_tpu.engine.test_loop import test

    cfg = _tiny_cfg(workdir)
    cfg.TRAIN.ENABLE = False
    cfg.TRAIN.AUTO_RESUME = False
    cfg.OUTPUT_DIR = str(workdir / "out_fresh")
    stats = test(cfg)
    assert "top1_acc" in stats


def test_finetune_from_torch_checkpoint(workdir):
    """The released-checkpoint workflow: train() fine-tunes from a reference
    .pyth via TRAIN.CHECKPOINT_FILE_PATH + CHECKPOINT_TYPE=pytorch
    (reference checkpoint.py:504-532 priority). With lr=0 the loaded
    weights must survive the epoch unchanged, proving the conversion fed
    the real training state."""
    import torch

    from aicity_action_tpu.engine.train_loop import train
    from aicity_action_tpu.models.mvit import build_mvit_spec
    from test_model_parity import TorchOracleMViT

    cfg = _tiny_cfg(workdir)
    cfg.OUTPUT_DIR = str(workdir / "out_finetune")
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.SOLVER.BASE_LR = 1e-30  # negligible update; cosine asserts end < base
    cfg.SOLVER.COSINE_END_LR = 0.0
    cfg.MIXUP.ENABLE = False

    torch.manual_seed(3)
    oracle = TorchOracleMViT(cfg, build_mvit_spec(cfg))
    pyth = str(workdir / "pretrained.pyth")
    torch.save({"model_state": oracle.reference_state_dict(), "epoch": 0},
               pyth)
    cfg.TRAIN.CHECKPOINT_FILE_PATH = pyth
    cfg.TRAIN.CHECKPOINT_TYPE = "pytorch"
    cfg.TRAIN.CHECKPOINT_EPOCH_RESET = True

    state = train(cfg)
    got = np.asarray(state.params["head"]["projection"]["bias"])
    want = oracle.reference_state_dict()["head.projection.bias"].numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
