"""Contrastive training / retrieval-testing loops.

Reference: tools/train_net_contrastive.py (train, 823-line engine's sibling)
and tools/test_net_contrastive.py (v2t/t2v recall@k, single-view).
"""

from __future__ import annotations

import math
import pprint

import jax
import numpy as np
import optax

from ..data.loader import construct_loader, shuffle_dataset
from ..models.build import build_model
from ..parallel.mesh import batch_sharding, init_distributed, make_mesh, replicated
from ..solver.optimizer import construct_optimizer
from ..utils import checkpoint as cu
from ..utils.logging import get_logger, setup_logging
from ..utils.meters import EpochTimer, TrainMeter
from .contrastive import (
    ContrastiveState,
    make_contrastive_train_step,
    make_feature_step,
    retrieval_metrics,
)
from .train_loop import _pad_batch

logger = get_logger(__name__)


def _put(batch, b_sh):
    out = {
        "inputs": [jax.device_put(x, b_sh) for x in batch["inputs"]],
        "tokens": jax.device_put(batch["tokens"], b_sh),
        "labels": jax.device_put(batch["labels"], b_sh),
    }
    return out


def train_contrastive(cfg):
    init_distributed(cfg)
    setup_logging(cfg.OUTPUT_DIR)
    np.random.seed(cfg.RNG_SEED)
    if cfg.LOG_CFG:
        logger.info("Contrastive train with config:")
        logger.info(pprint.pformat(cfg.to_dict()))

    mesh = make_mesh(cfg)
    module, params = build_model(cfg)
    train_loader = construct_loader(cfg, "train")
    val_loader = construct_loader(cfg, "val")
    steps_per_epoch = max(len(train_loader), 1)

    tx, lr_schedule = construct_optimizer(cfg, params, steps_per_epoch)
    state = ContrastiveState.create(params, tx, use_moco=cfg.TRAIN.USE_MOCO)
    state, start_epoch = cu.load_train_checkpoint(cfg, state)

    step_fn = make_contrastive_train_step(
        module, tx, use_moco=cfg.TRAIN.USE_MOCO,
        moco_momentum=cfg.TRAIN.MOCO_MOMENTUM,
    )
    jitted = jax.jit(step_fn, donate_argnums=0)
    feature_fn = jax.jit(make_feature_step(module))

    b_sh = batch_sharding(mesh)
    state = jax.device_put(state, replicated(mesh))
    rng = jax.device_put(jax.random.PRNGKey(cfg.RNG_SEED), replicated(mesh))

    meter = TrainMeter(steps_per_epoch, cfg)
    timer = EpochTimer()
    per_host_batch = train_loader.batch_size

    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        shuffle_dataset(train_loader, cur_epoch)
        timer.epoch_tic()
        meter.iter_tic()
        with mesh:
            for cur_iter, batch in enumerate(train_loader):
                batch, n_valid = _pad_batch_tokens(batch, per_host_batch)
                dev_batch = _put(batch, b_sh)
                # traced scalar masking padded rows out of the in-batch
                # similarity loss (see make_contrastive_train_step)
                dev_batch["n_valid"] = jax.device_put(
                    np.int32(n_valid), replicated(mesh))
                meter.data_toc()
                state, metrics, _ = jitted(state, dev_batch, rng)
                loss = float(np.asarray(metrics["loss"]))
                if not math.isfinite(loss):
                    raise RuntimeError("ERROR: Got NaN losses")
                lr = float(lr_schedule(int(np.asarray(state.step)) - 1))
                meter.iter_toc()
                meter.update_stats(None, None, loss, lr, n_valid)
                meter.log_iter_stats(cur_epoch, cur_iter)
                meter.iter_tic()
        timer.epoch_toc()
        meter.log_epoch_stats(cur_epoch)
        meter.reset()

        if cu.is_checkpoint_epoch(cfg, cur_epoch):
            cu.save_checkpoint(cfg.OUTPUT_DIR, jax.device_get(state),
                               cur_epoch, cfg,
                               async_write=cfg.TPU.ASYNC_CHECKPOINT)
        if (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0 or (
            cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH
        ):
            eval_contrastive_epoch(cfg, mesh, feature_fn, state, val_loader,
                                   cur_epoch, per_host_batch)
    cu.wait_for_pending_saves()
    return state


def _pad_batch_tokens(batch, size):
    """Pad incl. the tokens field."""
    n = batch["labels"].shape[0]
    if n == size:
        return batch, n
    pad = size - n

    def pad_arr(x):
        return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])

    out = {k: (pad_arr(v) if not isinstance(v, list)
               else [pad_arr(p) for p in v]) for k, v in batch.items()}
    return out, n


def eval_contrastive_epoch(cfg, mesh, feature_fn, state, loader, cur_epoch,
                           per_host_batch):
    """In-batch retrieval recall over the whole val set
    (test_net_contrastive.py:150-160)."""
    vs, ts, ls = [], [], []
    b_sh = batch_sharding(mesh)
    with mesh:
        for batch in loader:
            batch, n_valid = _pad_batch_tokens(batch, per_host_batch)
            dev = _put(batch, b_sh)
            v, t, _ = feature_fn(state.params, dev)
            vs.append(np.asarray(jax.device_get(v), np.float32)[:n_valid])
            ts.append(np.asarray(jax.device_get(t), np.float32)[:n_valid])
            ls.append(batch["labels"][:n_valid])
    stats = retrieval_metrics(
        np.concatenate(vs), np.concatenate(ts), np.concatenate(ls))
    stats["_type"] = "contrastive_val_epoch"
    stats["epoch"] = f"{cur_epoch + 1}/{cfg.SOLVER.MAX_EPOCH}"
    from ..utils.logging import log_json_stats

    log_json_stats(stats)
    return stats


def test_contrastive(cfg, save_features_path: str | None = None):
    """Retrieval test (reference: test_net_contrastive.py:173-226).

    With ``save_features_path`` (TEST.ENABLE_SAVE semantics), the video
    features and item indices are pickled as ``(features [N, D], ids [N])``
    — the format tools/inference_videotext.py consumes.
    """
    init_distributed(cfg)
    setup_logging(cfg.OUTPUT_DIR)
    mesh = make_mesh(cfg)
    module, params = build_model(cfg)
    state = ContrastiveState.create(params, optax.identity())
    state = cu.load_test_checkpoint(cfg, state)
    state = jax.device_put(state, replicated(mesh))

    loader = construct_loader(cfg, "test")
    feature_fn = jax.jit(make_feature_step(module))

    vs, ts, ls, ids = [], [], [], []
    b_sh = batch_sharding(mesh)
    with mesh:
        for batch in loader:
            batch, n_valid = _pad_batch_tokens(batch, loader.batch_size)
            dev = _put(batch, b_sh)
            v, t, _ = feature_fn(state.params, dev)
            vs.append(np.asarray(jax.device_get(v), np.float32)[:n_valid])
            ts.append(np.asarray(jax.device_get(t), np.float32)[:n_valid])
            ls.append(batch["labels"][:n_valid])
            ids.append(batch["index"][:n_valid])
    video_feats = np.concatenate(vs)
    text_feats = np.concatenate(ts)
    labels = np.concatenate(ls)
    stats = retrieval_metrics(video_feats, text_feats, labels)
    stats["_type"] = "contrastive_test"
    from ..utils.logging import log_json_stats

    log_json_stats(stats)

    if save_features_path:
        import pickle

        with open(save_features_path, "wb") as f:
            pickle.dump((video_feats, np.concatenate(ids)), f)
        logger.info("Saved features to %s", save_features_path)
    return stats
