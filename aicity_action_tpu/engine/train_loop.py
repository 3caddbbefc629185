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

from ..data.loader import construct_loader, shuffle_dataset
from ..data.mixup import build_mixup_from_cfg
from ..models.build import build_model_with_state
from ..parallel.mesh import (
    batch_sharding, cast_for_transfer, host_transfer_dtype, init_distributed,
    make_mesh, replicated,
)
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
        return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])

    out = {
        k: ([pad_arr(p) for p in v] if isinstance(v, list) else pad_arr(v))
        for k, v in batch.items()
    }
    return out, n


def _errors_mixed(preds: np.ndarray, labels_a: np.ndarray,
                  labels_b: np.ndarray, ks=(1, 5)):
    """Top-k errors under mixup: correct if top-k hits either source label."""
    max_k = min(max(ks), preds.shape[1])
    top = np.argsort(-preds, axis=1)[:, :max_k]
    out = []
    for k in ks:
        k = min(k, preds.shape[1])
        hit = ((top[:, :k] == labels_a[:, None])
               | (top[:, :k] == labels_b[:, None])).any(axis=1)
        out.append((1.0 - hit.mean()) * 100.0)
    return out


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

    multigrid = None
    if cfg.MULTIGRID.LONG_CYCLE or cfg.MULTIGRID.SHORT_CYCLE:
        # long-cycle multigrid driver (upstream slowfast train_net.py's
        # build_trainer loop; dormant in the aicity fork, train_net.py:649)
        from ..utils.multigrid import MultigridSchedule

        if cfg.DETECTION.ENABLE or cfg.MODEL.USE_MULTI_HEAD:
            raise NotImplementedError(
                "multigrid supports the standard classification path only")
        multigrid = MultigridSchedule()
        cfg = multigrid.init_multigrid(cfg)
        if cfg.MULTIGRID.LONG_CYCLE:
            cfg, _ = multigrid.update_long_cycle(cfg, cur_epoch=0)

    mesh = make_mesh(cfg)
    module, params, model_state = build_model_with_state(cfg)

    train_loader = construct_loader(cfg, "train")
    val_loader = construct_loader(cfg, "val")
    steps_per_epoch = max(len(train_loader), 1)

    tx, lr_schedule = construct_optimizer(cfg, params, steps_per_epoch)
    state = TrainState.create(params, tx, model_state)
    state, start_epoch = cu.load_train_checkpoint(cfg, state)

    if (cfg.MODEL.MULTI_ADD_CROSS_PROJ and cfg.MODEL.LOAD_MULTI_PROJ_INIT_FILE
            and start_epoch == 0):
        # word-embedding-similarity warm start for the cross-dataset
        # projections (reference: train_net.py:679-686)
        from ..utils.convert import load_cross_proj_weight

        new_params, n_loaded = load_cross_proj_weight(cfg, state.params)
        state = state.replace(params=new_params)
        logger.info("loaded %d cross-dataset projection weights from %s",
                    n_loaded, cfg.MODEL.LOAD_MULTI_PROJ_INIT_FILE)

    detection = cfg.DETECTION.ENABLE
    multihead = cfg.MODEL.USE_MULTI_HEAD and not detection
    mixup_fn = None
    if detection:
        from .detection import make_detection_eval_step, make_detection_train_step

        train_step = make_detection_train_step(module, tx, cfg.MODEL.LOSS_FUNC)
        jitted_eval = jax.jit(make_detection_eval_step(module))
    elif multihead:
        # multi-dataset multi-head driver (reference: train_net.py:155-218)
        from .steps import make_multihead_eval_step, make_multihead_train_step

        train_step = make_multihead_train_step(
            module, tx,
            datasets=cfg.MODEL.MULTI_DATASETS,
            loss_funcs=cfg.MODEL.MULTI_LOSS_FUNCS,
            loss_weights=cfg.MODEL.MULTI_LOSS_WEIGHTS,
            add_cross_proj=cfg.MODEL.MULTI_ADD_CROSS_PROJ,
            cross_proj_add_to_pred=cfg.MODEL.MULTI_CROSS_PROJ_ADD_TO_PRED,
            proj_loss_func=cfg.MODEL.MULTI_PROJ_LOSS_FUNC,
            proj_loss_weight=cfg.MODEL.MULTI_PROJ_LOSS_WEIGHT,
            use_vicreg=cfg.MODEL.USE_VICREG_LOSS,
            vicreg_weight=cfg.MODEL.VICREG_LOSS_WEIGHT,
        )
        jitted_eval = jax.jit(make_multihead_eval_step(module))
    else:
        mixup_fn = build_mixup_from_cfg(cfg)
        train_step = make_train_step(
            module, tx, cfg.MODEL.LOSS_FUNC, mixup_fn=mixup_fn,
            gather_before_loss=cfg.TRAIN.GATHER_BEFORE_LOSS,
            num_classes=cfg.MODEL.NUM_CLASSES,
            moe_aux_weight=(cfg.MVIT.MOE.AUX_LOSS_WEIGHT
                            if cfg.MVIT.MOE.ENABLE else 0.0),
        )
        jitted_eval = jax.jit(make_eval_step(module))
    jitted_train = jax.jit(train_step, donate_argnums=0)

    b_sh = batch_sharding(mesh)
    repl = replicated(mesh)

    def place_state(s):
        if cfg.SOLVER.OPTIMIZING_METHOD.startswith("zero_"):
            # ZeRO-1: optimizer moments sharded over the data axis
            # (reference zero_sgd/zero_adamw, optimizer.py:142-155,189-199)
            from ..parallel.tp import zero1_state_shardings

            return jax.device_put(s, zero1_state_shardings(mesh, s))
        return jax.device_put(s, repl)

    state = place_state(state)
    rng = jax.device_put(jax.random.PRNGKey(cfg.RNG_SEED), repl)

    train_meter = TrainMeter(steps_per_epoch, cfg)
    if multihead:
        from ..utils.meters import MultiDatasetValMeter

        val_meter = MultiDatasetValMeter(len(val_loader), cfg)
    else:
        val_meter = ValMeter(len(val_loader), cfg)
    epoch_timer = EpochTimer()

    writer = None
    if cfg.TENSORBOARD.ENABLE and jax.process_index() == 0:
        from ..visualization.tensorboard_vis import TensorboardWriter

        writer = TensorboardWriter(cfg)

    per_host_batch = train_loader.batch_size
    in_dtype = host_transfer_dtype(cfg)

    def put(batch):
        out = {
            "inputs": [jax.device_put(cast_for_transfer(x, in_dtype), b_sh)
                       for x in batch["inputs"]],
            "labels": jax.device_put(batch["labels"], b_sh),
        }
        for key in ("boxes", "box_mask", "dataset_idx"):
            if key in batch:
                out[key] = jax.device_put(batch[key], b_sh)
        return out

    if cfg.TRAIN.EVAL_FIRST:
        if multihead:
            eval_epoch_multihead(cfg, mesh, jitted_eval, state, val_loader,
                                 val_meter, start_epoch - 1,
                                 val_loader.batch_size)
        else:
            eval_epoch(cfg, mesh, jitted_eval, state, val_loader, val_meter,
                       start_epoch - 1, val_loader.batch_size)

    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        if multigrid is not None and cfg.MULTIGRID.LONG_CYCLE:
            cfg, changed = multigrid.update_long_cycle(cfg, cur_epoch)
            if changed:
                (module, state, train_loader, steps_per_epoch, lr_schedule,
                 mixup_fn, jitted_train, jitted_eval) = _long_cycle_rebuild(
                    cfg, state, place_state)
                per_host_batch = train_loader.batch_size
                train_meter = TrainMeter(steps_per_epoch, cfg)
        shuffle_dataset(train_loader, cur_epoch)
        epoch_timer.epoch_tic()
        train_meter.iter_tic()

        from ..parallel.prefetch import prefetch_to_device

        def pad_and_put(batch):
            padded, n_valid = _pad_batch(batch, per_host_batch)
            dev = put(padded)
            # traced scalar (not a Python int: that would recompile per
            # distinct n_valid) masking padded rows out of loss + grads
            dev["n_valid"] = jax.device_put(np.int32(n_valid), repl)
            return dev, padded["labels"], n_valid

        # Deferred metric processing: materializing the loss right after
        # dispatch is a full device sync per step — it serializes the host
        # against the device and costs one link RTT per iteration. Results
        # are instead processed RUNAHEAD steps behind the dispatch (device
        # arrays are futures; by the time iter N dispatches, iter
        # N-RUNAHEAD's scalars are already on their way), so the host
        # stays ahead by the same depth the input prefetch runs at. The
        # NaN hard-fail fires at most RUNAHEAD steps late — still within
        # the epoch, before any checkpoint write.
        runahead = max(int(cfg.TPU.PREFETCH_DEPTH), 0)
        host_step = int(np.asarray(state.step))  # one fetch per epoch

        def process(entry):
            cur_it, metrics, preds, labels_np, n_valid, step_at = entry
            loss = float(np.asarray(metrics["loss"]))
            if not math.isfinite(loss):
                raise RuntimeError(
                    f"ERROR: Got NaN/Inf loss at epoch {cur_epoch} "
                    f"iter {cur_it}"
                )
            if not detection and not multihead and labels_np.ndim == 1:
                preds_np = np.asarray(
                    jax.device_get(preds), np.float32)[:n_valid]
                if mixup_fn is not None:
                    # mixup stats: a prediction counts as correct if it
                    # hits either of the two mixed source labels
                    # (reference train_net.py:248-258 top-2 merge);
                    # sample i was mixed with sample B-1-i of the
                    # (padded) batch
                    partners = labels_np[::-1][:n_valid]
                    top1, top5 = _errors_mixed(
                        preds_np, labels_np[:n_valid], partners)
                else:
                    top1, top5 = _errors(preds_np, labels_np[:n_valid])
            else:
                top1 = top5 = None
            lr = float(lr_schedule(step_at))
            train_meter.update_stats(top1, top5, loss, lr, n_valid)
            if writer is not None:
                scalars = {"Train/loss": loss, "Train/lr": lr}
                if top1 is not None:
                    scalars["Train/Top1_err"] = top1
                    scalars["Train/Top5_err"] = top5
                writer.add_scalars(
                    scalars,
                    global_step=cur_epoch * steps_per_epoch + cur_it,
                )
            train_meter.log_iter_stats(cur_epoch, cur_it)

        with mesh:
            prefetched = prefetch_to_device(
                train_loader,
                pad_and_put,
                lookahead=cfg.TPU.PREFETCH_DEPTH,
            )
            pending: list = []
            for cur_iter, (_, (dev_batch, labels_np, n_valid)) in enumerate(
                    prefetched):
                train_meter.data_toc()

                profiling = (cfg.TPU.PROFILE_DIR
                             and jax.process_index() == 0)
                if (profiling
                        and host_step == cfg.TPU.PROFILE_START_STEP):
                    # device trace of a few steady-state steps (the
                    # reference has only wall-clock meters; on TPU the
                    # profiler is free — SURVEY §5.1)
                    jax.profiler.start_trace(cfg.TPU.PROFILE_DIR)
                state, metrics, preds = jitted_train(state, dev_batch, rng)
                if (profiling
                        and host_step == cfg.TPU.PROFILE_START_STEP
                        + cfg.TPU.PROFILE_NUM_STEPS):
                    jax.profiler.stop_trace()
                pending.append(
                    (cur_iter, metrics, preds, labels_np, n_valid,
                     host_step))
                host_step += 1
                if len(pending) > runahead:
                    process(pending.pop(0))
                train_meter.iter_toc()
                train_meter.iter_tic()
            for entry in pending:  # drain: NaN gate before checkpoint/eval
                process(entry)

        epoch_timer.epoch_toc()
        logger.info(
            "Epoch %d took %.2fs (avg %.2fs, median %.2fs)",
            cur_epoch, epoch_timer.last_epoch_time(),
            epoch_timer.avg_epoch_time(), epoch_timer.median_epoch_time(),
        )
        train_meter.log_epoch_stats(cur_epoch)
        train_meter.reset()

        is_ckpt = cu.is_checkpoint_epoch(cfg, cur_epoch)
        is_eval = (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0 or (
            cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH)
        if (cfg.BN.USE_PRECISE_STATS and (is_ckpt or is_eval)
                and state.model_state.get("batch_stats")):
            # recompute BN stats as a true average (train_net.py:784-795)
            from .precise_bn import calculate_and_update_precise_bn

            def bn_batches():
                for b in train_loader:
                    b, _ = _pad_batch(b, per_host_batch)
                    yield [jax.device_put(x, b_sh) for x in b["inputs"]]

            new_ms = calculate_and_update_precise_bn(
                module, state.params, jax.device_get(state.model_state),
                bn_batches(),
                num_batches=min(cfg.BN.NUM_BATCHES_PRECISE, steps_per_epoch),
            )
            state = state.replace(model_state=jax.device_put(new_ms, repl))

        if is_ckpt:
            cu.save_checkpoint(cfg.OUTPUT_DIR, jax.device_get(state),
                               cur_epoch, cfg,
                               async_write=cfg.TPU.ASYNC_CHECKPOINT)
        if is_eval:
            if detection:
                eval_epoch_detection(cfg, mesh, jitted_eval, state,
                                     val_loader, cur_epoch,
                                     val_loader.batch_size)
            elif multihead:
                eval_epoch_multihead(cfg, mesh, jitted_eval, state,
                                     val_loader, val_meter, cur_epoch,
                                     val_loader.batch_size)
            else:
                eval_epoch(cfg, mesh, jitted_eval, state, val_loader,
                           val_meter, cur_epoch, val_loader.batch_size)

    if writer is not None:
        writer.close()
    cu.wait_for_pending_saves()
    logger.info("Training done.")
    return state


def _long_cycle_rebuild(cfg, old_state, place_state):
    """Rebuild the epoch machinery after a long-cycle base-shape change.

    TPU-native equivalent of upstream slowfast's ``build_trainer``
    (tools/train_net.py, multigrid branch): new loader/optimizer/step for
    the new (B, T, S); the MODEL WEIGHTS carry over from the running state
    (the reference round-trips them through the last checkpoint). When the
    BN norm type flips (batchnorm <-> sub_batchnorm) the param trees can
    differ in BN-stat shapes, so the transfer goes through the
    shape-matched merge with normal->sub broadcast; sub->normal falls back
    to fresh stats, which the next precise-BN pass recomputes.
    Optimizer moments restart (new tx over a possibly different tree); the
    global step carries over so the stretched LR schedule stays monotone.
    """
    from ..utils.convert import merge_with_model_params

    module, params, model_state = build_model_with_state(cfg)
    old_params = jax.device_get(old_state.params)
    old_ms = jax.device_get(old_state.model_state)
    if jax.tree.structure(params) == jax.tree.structure(old_params):
        params = old_params
    else:
        params, loaded, _, _ = merge_with_model_params(old_params, params)
        logger.info("long-cycle param transfer: %d kept", len(loaded))
    if isinstance(old_ms, dict) and old_ms.get("batch_stats") \
            and model_state.get("batch_stats"):
        bs, _, _, _ = merge_with_model_params(
            old_ms["batch_stats"], model_state["batch_stats"],
            broadcast_leading=True)
        model_state = dict(model_state)
        model_state["batch_stats"] = bs

    train_loader = construct_loader(cfg, "train")
    steps_per_epoch = max(len(train_loader), 1)
    tx, lr_schedule = construct_optimizer(cfg, params, steps_per_epoch)
    state = TrainState.create(params, tx, model_state)
    state = state.replace(step=jax.device_get(old_state.step))
    state = place_state(state)

    mixup_fn = build_mixup_from_cfg(cfg)
    train_step = make_train_step(
        module, tx, cfg.MODEL.LOSS_FUNC, mixup_fn=mixup_fn,
        gather_before_loss=cfg.TRAIN.GATHER_BEFORE_LOSS,
        num_classes=cfg.MODEL.NUM_CLASSES,
        moe_aux_weight=(cfg.MVIT.MOE.AUX_LOSS_WEIGHT
                        if cfg.MVIT.MOE.ENABLE else 0.0),
    )
    return (module, state, train_loader, steps_per_epoch, lr_schedule,
            mixup_fn, jax.jit(train_step, donate_argnums=0),
            jax.jit(make_eval_step(module)))


def eval_epoch_detection(cfg, mesh, jitted_eval, state, val_loader,
                         cur_epoch, per_host_batch):
    """AVA detection eval: collect per-box (preds, normalized ori_boxes,
    metadata) into the AVAMeter → frame mAP (reference: train_net.py
    DETECTION branch of eval_epoch + test_net.py:98-108)."""
    from ..utils.meters import AVAMeter

    b_sh = batch_sharding(mesh)
    meter = AVAMeter(len(val_loader), cfg, "val")
    meter.video_idx_to_name = val_loader.dataset.video_idx_to_name
    crop = cfg.DATA.TEST_CROP_SIZE
    with mesh:
        for batch in val_loader:
            batch, n_valid = _pad_batch(batch, per_host_batch)
            dev = {
                "inputs": [jax.device_put(x, b_sh) for x in batch["inputs"]],
                "boxes": jax.device_put(batch["boxes"], b_sh),
            }
            preds = np.asarray(jax.device_get(
                jitted_eval(state.params, dev, state.model_state)),
                np.float32)
            M = batch["boxes"].shape[1]
            preds = preds.reshape(-1, M, preds.shape[-1])[:n_valid]
            mask = batch["box_mask"][:n_valid].astype(bool)
            ori = batch["ori_boxes"][:n_valid]
            # normalize to [0, 1] in the ORIGINAL frame (the dataset kept
            # ori_boxes in original pixel coords; metadata carries H, W via
            # the eval gt being normalized already) — AVA gt is normalized,
            # so divide by the original frame size stored per sample
            meta = batch["metadata"][:n_valid]
            hw = batch.get("orig_hw")
            for b in range(preds.shape[0]):
                m = mask[b]
                if not m.any():
                    continue
                boxes_b = ori[b][m]
                if hw is not None:
                    H, W = hw[b]
                    boxes_b = boxes_b / np.asarray([W, H, W, H], np.float32)
                meter.update_stats(preds[b][m], boxes_b, meta[b][m])
    meter.finalize_metrics()
    return meter.full_map


def eval_epoch_multihead(cfg, mesh, jitted_eval, state, val_loader,
                         val_meter, cur_epoch, per_host_batch):
    """Multi-head validation: every head scores the batch; per-dataset
    selection + top-k happen in the MultiDatasetValMeter (reference:
    train_net.py eval_epoch USE_MULTI_HEAD branch + meters.py:856-898)."""
    b_sh = batch_sharding(mesh)
    val_meter.reset()
    with mesh:
        for batch in val_loader:
            batch, n_valid = _pad_batch(batch, per_host_batch)
            dev_batch = {
                "inputs": [jax.device_put(x, b_sh) for x in batch["inputs"]],
            }
            preds = jitted_eval(state.params, dev_batch, state.model_state)
            preds_np = {
                ds: np.asarray(jax.device_get(p), np.float32)[:n_valid]
                for ds, p in preds.items()
            }
            val_meter.update_stats(
                preds_np, batch["labels"][:n_valid],
                batch["dataset_idx"][:n_valid])
    return val_meter.log_epoch_stats(cur_epoch)


def eval_epoch(cfg, mesh, jitted_eval, state, val_loader, val_meter,
               cur_epoch, per_host_batch):
    """Validation pass (reference: train_net.py:339-540)."""
    b_sh = batch_sharding(mesh)
    in_dtype = host_transfer_dtype(cfg)
    val_meter.reset()
    with mesh:
        for batch in val_loader:
            batch, n_valid = _pad_batch(batch, per_host_batch)
            dev_batch = {
                "inputs": [jax.device_put(cast_for_transfer(x, in_dtype),
                                          b_sh) for x in batch["inputs"]],
            }
            preds = jitted_eval(state.params, dev_batch, state.model_state)
            preds_np = np.asarray(jax.device_get(preds), np.float32)[:n_valid]
            labels = batch["labels"][:n_valid]
            if labels.ndim == 1:
                top1, top5 = _errors(preds_np, labels)
                val_meter.update_stats(top1, top5, n_valid)
            val_meter.update_predictions(preds_np, labels)
    val_meter.log_epoch_stats(cur_epoch)
