"""Multi-view test engine (reference: tools/test_net.py).

Each video is scored ``NUM_ENSEMBLE_VIEWS × NUM_SPATIAL_CROPS`` times; view
scores are ensembled per video by the TestMeter (sum/max). Batches shard
over the mesh's data axis; predictions return to host for the (tiny)
scatter-add bookkeeping. Multi-host runs gather (preds, labels, index) via
process_allgather (replaces the NCCL all_gather at test_net.py:119-122).
"""

from __future__ import annotations

import pprint

import jax
import numpy as np

from ..data.loader import construct_loader
from ..models.build import build_model_with_state
from ..parallel.mesh import (
    batch_sharding,
    cast_for_transfer,
    host_transfer_dtype,
    init_distributed,
    make_mesh,
    process_allgather,
    replicated,
)
from ..utils import checkpoint as cu
from ..utils.logging import get_logger, setup_logging
from ..utils.meters import TestMeter
from .steps import TrainState, make_eval_step
from .train_loop import _pad_batch

logger = get_logger(__name__)


def test(cfg):
    """Test entry (reference: test_net.py:173-248)."""
    init_distributed(cfg)
    setup_logging(cfg.OUTPUT_DIR)
    np.random.seed(cfg.RNG_SEED)
    if cfg.LOG_CFG and not cfg.TEST.NO_LOG_CONFIG:
        logger.info("Test with config:")
        logger.info(pprint.pformat(cfg.to_dict()))

    mesh = make_mesh(cfg)
    module, params, model_state = build_model_with_state(cfg)

    import optax

    state = TrainState.create(params, optax.identity(), model_state)
    state = cu.load_test_checkpoint(cfg, state)

    loader = construct_loader(cfg, "test")
    dataset = loader.dataset

    if cfg.DETECTION.ENABLE:
        # AVA box testing: frame-mAP via the AVAMeter
        from .detection import make_detection_eval_step
        from .train_loop import eval_epoch_detection

        state = jax.device_put(state, replicated(mesh))
        jitted = jax.jit(make_detection_eval_step(module))
        full_map = eval_epoch_detection(
            cfg, mesh, jitted, state, loader, 0, loader.batch_size)
        return {"map": full_map}

    num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    assert len(dataset) % num_clips == 0

    meter = TestMeter(
        num_videos=dataset.num_videos,
        num_clips=num_clips,
        num_cls=cfg.MODEL.NUM_CLASSES,
        multi_label=cfg.DATA.MULTI_LABEL,
        ensemble_method=cfg.DATA.ENSEMBLE_METHOD,
    )

    if cfg.MODEL.USE_MULTI_HEAD:
        # select the tested dataset's head (reference test_net.py:109-114;
        # MODEL_DIFF_DATA tests on TRAIN.DATASET's head)
        inf_dataset = (cfg.TRAIN.DATASET if cfg.DATA.MODEL_DIFF_DATA
                       else cfg.TEST.DATASET)

        def _mh_eval(params, batch, model_state=None):
            variables = {"params": params, **(model_state or {})}
            out = module.apply(variables, batch["inputs"], None,
                               inf_dataset, train=False)
            return out[inf_dataset]

        jitted_eval = jax.jit(_mh_eval)
    else:
        jitted_eval = jax.jit(make_eval_step(module))
    b_sh = batch_sharding(mesh)
    state = jax.device_put(state, replicated(mesh))

    per_host_batch = loader.batch_size
    in_dtype = host_transfer_dtype(cfg)
    local_preds, local_labels, local_index = [], [], []
    with mesh:
        for batch in loader:
            batch, n_valid = _pad_batch(batch, per_host_batch)
            dev_batch = {
                "inputs": [jax.device_put(cast_for_transfer(x, in_dtype),
                                          b_sh) for x in batch["inputs"]],
            }
            preds = jitted_eval(state.params, dev_batch, state.model_state)
            local_preds.append(
                np.asarray(jax.device_get(preds), np.float32)[:n_valid])
            local_labels.append(batch["labels"][:n_valid])
            local_index.append(batch["index"][:n_valid])

    preds_np = np.concatenate(local_preds)
    labels = np.concatenate(local_labels)
    index = np.concatenate(local_index)
    if cfg.NUM_SHARDS > 1:
        # ONE host gather per epoch (not per batch — per-batch gathers
        # serialize multi-host eval on the slowest host every step).
        preds_np = np.concatenate(process_allgather(preds_np))
        labels = np.concatenate(process_allgather(labels))
        index = np.concatenate(process_allgather(index))
    meter.update_stats(preds_np, labels, index)

    stats = meter.finalize_metrics()
    if cfg.TEST.SAVE_RESULTS_PATH:
        import pickle

        with open(cfg.TEST.SAVE_RESULTS_PATH, "wb") as f:
            pickle.dump([meter.video_preds, meter.video_labels], f)
        logger.info("Saved predictions to %s", cfg.TEST.SAVE_RESULTS_PATH)
    return stats
