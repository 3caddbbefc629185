"""Training engine (reference: tools/train_net.py).

One process per host drives all local chips: batches are sharded over the
mesh's data axis inside ``jit`` (XLA inserts the gradient all-reduce), the
train step is a single compiled function, and only scalar metrics + logits
come back to the host each iteration.
"""

from __future__ import annotations

import math
import pprint

import jax
import numpy as np

from ..config.defaults import assert_and_infer_cfg  # noqa: F401 (re-export)
from ..data.loader import construct_loader, shuffle_dataset
from ..data.mixup import build_mixup_from_cfg
from ..models.build import build_model_with_state
from ..parallel.mesh import batch_sharding, init_distributed, make_mesh, replicated
from ..solver.optimizer import construct_optimizer
from ..utils import checkpoint as cu
from ..utils.logging import get_logger, setup_logging
from ..utils.meters import EpochTimer, TrainMeter, ValMeter
from .steps import TrainState, make_eval_step, make_train_step

logger = get_logger(__name__)


def _pad_batch(batch: dict, size: int) -> tuple[dict, int]:
    """Pad a short batch to the jit-compiled size (repeat last sample)."""
    n = batch["labels"].shape[0]
    if n == size:
        return batch, n
    pad = size - n

    def pad_arr(x):
        reps = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
        return reps

    out = {
        "inputs": [pad_arr(p) for p in batch["inputs"]],
        "labels": pad_arr(batch["labels"]),
        "index": pad_arr(batch["index"]),
    }
    return out, n


def _errors(preds: np.ndarray, labels: np.ndarray, ks=(1, 5)):
    max_k = min(max(ks), preds.shape[1])
    top = np.argsort(-preds, axis=1)[:, :max_k]
    out = []
    for k in ks:
        k = min(k, preds.shape[1])
        correct = (top[:, :k] == labels[:, None]).any(axis=1)
        out.append((1.0 - correct.mean()) * 100.0)
    return out


def train(cfg):
    """Train entry (reference: train_net.py:621-823)."""
    init_distributed(cfg)
    setup_logging(cfg.OUTPUT_DIR)
    np.random.seed(cfg.RNG_SEED)
    if cfg.LOG_CFG:
        logger.info("Train with config:")
        logger.info(pprint.pformat(cfg.to_dict()))

    mesh = make_mesh(cfg)
    module, params, model_state = build_model_with_state(cfg)

    train_loader = construct_loader(cfg, "train")
    val_loader = construct_loader(cfg, "val")
    steps_per_epoch = max(len(train_loader), 1)

    tx, lr_schedule = construct_optimizer(cfg, params, steps_per_epoch)
    state = TrainState.create(params, tx, model_state)
    state, start_epoch = cu.load_train_checkpoint(cfg, state)

    mixup_fn = build_mixup_from_cfg(cfg)
    train_step = make_train_step(
        module, tx, cfg.MODEL.LOSS_FUNC, mixup_fn=mixup_fn,
        gather_before_loss=cfg.TRAIN.GATHER_BEFORE_LOSS,
    )
    jitted_train = jax.jit(train_step, donate_argnums=0)
    jitted_eval = jax.jit(make_eval_step(module))

    b_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    state = jax.device_put(state, repl)
    rng = jax.device_put(jax.random.PRNGKey(cfg.RNG_SEED), repl)

    train_meter = TrainMeter(steps_per_epoch, cfg)
    val_meter = ValMeter(len(val_loader), cfg)
    epoch_timer = EpochTimer()

    writer = None
    if cfg.TENSORBOARD.ENABLE and jax.process_index() == 0:
        from ..visualization.tensorboard_vis import TensorboardWriter

        writer = TensorboardWriter(cfg)

    per_host_batch = train_loader.batch_size

    def put(batch):
        return {
            "inputs": [jax.device_put(x, b_sh) for x in batch["inputs"]],
            "labels": jax.device_put(batch["labels"], b_sh),
        }

    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        shuffle_dataset(train_loader, cur_epoch)
        epoch_timer.epoch_tic()
        train_meter.iter_tic()

        with mesh:
            for cur_iter, batch in enumerate(train_loader):
                batch, n_valid = _pad_batch(batch, per_host_batch)
                labels_np = batch["labels"]
                dev_batch = put(batch)
                train_meter.data_toc()

                state, metrics, preds = jitted_train(state, dev_batch, rng)
                loss = float(np.asarray(metrics["loss"]))
                if not math.isfinite(loss):
                    raise RuntimeError(
                        f"ERROR: Got NaN/Inf loss at epoch {cur_epoch} "
                        f"iter {cur_iter}"
                    )
                preds_np = np.asarray(
                    jax.device_get(preds), np.float32)[:n_valid]
                if labels_np.ndim == 1:
                    top1, top5 = _errors(preds_np, labels_np[:n_valid])
                else:
                    top1 = top5 = None
                lr = float(lr_schedule(int(np.asarray(state.step)) - 1))
                train_meter.iter_toc()
                train_meter.update_stats(top1, top5, loss, lr, n_valid)
                if writer is not None:
                    scalars = {"Train/loss": loss, "Train/lr": lr}
                    if top1 is not None:
                        scalars["Train/Top1_err"] = top1
                        scalars["Train/Top5_err"] = top5
                    writer.add_scalars(
                        scalars,
                        global_step=cur_epoch * steps_per_epoch + cur_iter,
                    )
                train_meter.log_iter_stats(cur_epoch, cur_iter)
                train_meter.iter_tic()

        epoch_timer.epoch_toc()
        logger.info(
            "Epoch %d took %.2fs (avg %.2fs, median %.2fs)",
            cur_epoch, epoch_timer.last_epoch_time(),
            epoch_timer.avg_epoch_time(), epoch_timer.median_epoch_time(),
        )
        train_meter.log_epoch_stats(cur_epoch)
        train_meter.reset()

        if cu.is_checkpoint_epoch(cfg, cur_epoch):
            cu.save_checkpoint(cfg.OUTPUT_DIR, jax.device_get(state),
                               cur_epoch, cfg)
        if (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0 or (
            cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH
        ):
            eval_epoch(cfg, mesh, jitted_eval, state, val_loader, val_meter,
                       cur_epoch, per_host_batch)

    if writer is not None:
        writer.close()
    logger.info("Training done.")
    return state


def eval_epoch(cfg, mesh, jitted_eval, state, val_loader, val_meter,
               cur_epoch, per_host_batch):
    """Validation pass (reference: train_net.py:339-540)."""
    b_sh = batch_sharding(mesh)
    val_meter.reset()
    with mesh:
        for batch in val_loader:
            batch, n_valid = _pad_batch(batch, per_host_batch)
            dev_batch = {
                "inputs": [jax.device_put(x, b_sh) for x in batch["inputs"]],
            }
            preds = jitted_eval(state.params, dev_batch, state.model_state)
            preds_np = np.asarray(jax.device_get(preds), np.float32)[:n_valid]
            labels = batch["labels"][:n_valid]
            if labels.ndim == 1:
                top1, top5 = _errors(preds_np, labels)
                val_meter.update_stats(top1, top5, n_valid)
            val_meter.update_predictions(preds_np, labels)
    val_meter.log_epoch_stats(cur_epoch)
