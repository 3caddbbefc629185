"""Long-cycle multigrid driver e2e (reference: upstream slowfast
build_trainer loop; utils/multigrid.py schedule math).

Trains a tiny BN-bearing ResNet with MULTIGRID.LONG_CYCLE over the
schedule's shape changes: the driver must rebuild the loader/step at each
transition, carry the weights over, and keep training with finite loss.
"""

import numpy as np
import pytest

from aicity_action_tpu.config import get_cfg, assert_and_infer_cfg

cv2 = pytest.importorskip("cv2")


def _write_video(path, num_frames, fps=30, size=(64, 48)):
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    assert w.isOpened()
    rs = np.random.RandomState(hash(path) % 2**31)
    for _ in range(num_frames):
        w.write(rs.randint(0, 255, (size[1], size[0], 3), np.uint8))
    w.release()


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mgrid")
    vdir = d / "videos"
    vdir.mkdir()
    for i in range(16):
        _write_video(str(vdir / f"v{i}.mp4"), 40 + 2 * i)
    for split in ("train", "val", "test"):
        with open(vdir / f"{split}.csv", "w") as f:
            for i in range(16):
                f.write(f"v{i}.mp4 {i % 3}\n")
    return d


def _cfg(workdir):
    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(workdir / "out")
    cfg.DATA.PATH_TO_DATA_DIR = str(workdir / "videos")
    cfg.DATA.PATH_PREFIX = str(workdir / "videos")
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [40, 48]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.TRAIN.DATASET = "kinetics"
    cfg.TEST.DATASET = "kinetics"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.TRAIN.EVAL_PERIOD = 100
    cfg.TRAIN.CHECKPOINT_PERIOD = 100
    cfg.TRAIN.AUTO_RESUME = False
    cfg.SOLVER.MAX_EPOCH = 4
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.LR_POLICY = "steps_with_relative_lrs"
    cfg.SOLVER.STEPS = [0, 2, 4]
    cfg.SOLVER.LRS = [1.0, 0.1]
    cfg.SOLVER.GAMMA = 0.1
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.MULTIGRID.EPOCH_FACTOR = 1.0
    # two phases per step: (T/2, S) then (T, S) — T-only reduction keeps
    # the batch multiplier at 2x so the 16-video dataset still yields full
    # batches in the reduced phase
    cfg.MULTIGRID.LONG_CYCLE_FACTORS = [[0.5, 1.0], [1.0, 1.0]]
    cfg.MULTIGRID.BN_BASE_SIZE = 4
    cfg.DATA_LOADER.NUM_WORKERS = 0
    cfg.MIXUP.ENABLE = False
    return assert_and_infer_cfg(cfg)


def test_long_cycle_schedule_and_training(workdir):
    from aicity_action_tpu.engine.train_loop import train
    from aicity_action_tpu.utils.multigrid import (
        MultigridSchedule, get_current_long_cycle_shape)

    cfg = _cfg(workdir)

    # schedule math: phases cover every epoch, shapes interleave
    probe = MultigridSchedule()
    probe_cfg = _cfg(workdir)
    probe_cfg = probe.init_multigrid(probe_cfg)
    assert probe.schedule is not None and len(probe.schedule) >= 2
    shapes = {tuple(get_current_long_cycle_shape(probe.schedule, e))
              for e in range(probe_cfg.SOLVER.MAX_EPOCH)}
    assert len(shapes) >= 2, f"schedule never changes shape: {shapes}"
    # the reduced phase halves T and shrinks S
    ts = sorted(s[1] for s in shapes)
    assert ts[0] < ts[-1]

    # e2e: train through at least one shape transition
    state = train(cfg)
    assert state is not None
    step = int(np.asarray(state.step))
    assert step > 0
    leaf = np.asarray(
        np.ravel(next(iter(
            __import__("jax").tree.leaves(state.params)))))
    assert np.isfinite(leaf).all()


def test_long_cycle_rebuild_carries_weights(workdir):
    """Direct unit check of _long_cycle_rebuild: same-structure trees carry
    params verbatim; the step counter survives."""
    import jax

    from aicity_action_tpu.engine.steps import TrainState
    from aicity_action_tpu.engine.train_loop import _long_cycle_rebuild
    from aicity_action_tpu.models.build import build_model_with_state
    from aicity_action_tpu.solver.optimizer import construct_optimizer

    cfg = _cfg(workdir)
    module, params, model_state = build_model_with_state(cfg)
    tx, _ = construct_optimizer(cfg, params, steps_per_epoch=2)
    state = TrainState.create(params, tx, model_state)
    state = state.replace(step=np.int32(7))

    cfg2 = cfg.clone()
    cfg2.DATA.NUM_FRAMES = 2
    cfg2.TRAIN.BATCH_SIZE = 16

    out = _long_cycle_rebuild(cfg2, state, lambda s: s)
    (module2, state2, loader2, spe2, lr2, mixup2, jtrain2, jeval2) = out
    assert int(np.asarray(state2.step)) == 7
    p_old = jax.tree.leaves(params)[0]
    p_new = jax.tree.leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(p_old), np.asarray(p_new))
    assert loader2.batch_size == 16
