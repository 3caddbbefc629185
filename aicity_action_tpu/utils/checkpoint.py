"""Checkpoint save/load (reference: slowfast/utils/checkpoint.py).

Orbax-backed with the reference's directory/selection semantics:

- saves per ``TRAIN.CHECKPOINT_PERIOD`` epochs into
  ``OUTPUT_DIR/checkpoints/checkpoint_epoch_{N:05d}`` (naming parity with
  `checkpoint.py:46-54`), master-process only
- auto-resume picks the latest epoch by name (`checkpoint.py:57-71`)
- ``load_train_checkpoint``: auto-resume last > explicit
  ``TRAIN.CHECKPOINT_FILE_PATH`` (`checkpoint.py:504-532`)
- ``load_test_checkpoint``: TEST path > last > TRAIN path
  (`checkpoint.py:466-501`)
- torch ``.pyth`` checkpoints are converted through utils/convert.py with
  shape-matched partial loading (fine-tune semantics, `checkpoint.py:322-347`)
"""

from __future__ import annotations

import os
import re
import threading
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .convert import (
    convert_convnet_state_dict,
    convert_mvit_state_dict,
    flatten_shapes,
    load_c2_checkpoint,
    load_torch_checkpoint,
    merge_with_model_params,
)
from .logging import get_logger

logger = get_logger(__name__)

_NAME_RE = re.compile(r"checkpoint_epoch_(\d+)")


def checkpoint_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "checkpoints")


def checkpoint_path(output_dir: str, epoch: int) -> str:
    return os.path.join(
        checkpoint_dir(output_dir), f"checkpoint_epoch_{epoch:05d}"
    )


# At most one checkpoint write in flight (TPU.ASYNC_CHECKPOINT): the
# device->host pull stays synchronous (donation-safe under jit), only the
# orbax directory write moves off the training thread — the useful split
# on real hosts where the write (disk/GCS) dominates the pull (PCIe).
_pending_save: Optional[threading.Thread] = None
_pending_error: list = []


def wait_for_pending_saves() -> None:
    """Join the in-flight async checkpoint write, re-raising its error.

    Called automatically before any checkpoint scan/load and at the end of
    training; callers embedding save_checkpoint elsewhere should drain
    before reading OUTPUT_DIR."""
    global _pending_save
    t = _pending_save
    if t is not None:
        t.join()
        _pending_save = None
    if _pending_error:
        raise _pending_error.pop()


def get_last_checkpoint(output_dir: str) -> Optional[str]:
    wait_for_pending_saves()
    d = checkpoint_dir(output_dir)
    if not os.path.isdir(d):
        return None
    names = [n for n in os.listdir(d) if _NAME_RE.fullmatch(n)]
    if not names:
        return None
    return os.path.join(d, max(names))


def has_checkpoint(output_dir: str) -> bool:
    return get_last_checkpoint(output_dir) is not None


def is_checkpoint_epoch(cfg, cur_epoch: int) -> bool:
    return (cur_epoch + 1) % cfg.TRAIN.CHECKPOINT_PERIOD == 0 or (
        cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH
    )


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(output_dir: str, state, epoch: int, cfg=None, *,
                    async_write: bool = False) -> str:
    """Master-only save of {params, opt_state, step, epoch}.

    ``async_write`` (TPU.ASYNC_CHECKPOINT): snapshot to host numpy
    synchronously, hand the orbax write to a background thread so the
    next epoch trains through the IO. One write in flight at a time;
    ``wait_for_pending_saves`` drains (and is implied by every checkpoint
    scan/load in this module)."""
    path = checkpoint_path(output_dir, epoch + 1)
    if jax.process_index() != 0:
        return path
    wait_for_pending_saves()
    os.makedirs(checkpoint_dir(output_dir), exist_ok=True)
    payload = {
        "epoch": np.asarray(epoch + 1),
        "step": np.asarray(state.step),
        "params": jax.tree.map(np.asarray, state.params),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "model_state": jax.tree.map(
            np.asarray, getattr(state, "model_state", {})),
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = jax.tree.map(np.asarray, state.ema_params)
    if cfg is not None:
        with open(os.path.join(checkpoint_dir(output_dir),
                               "config.yaml"), "w") as f:
            f.write(cfg.dump())
    if async_write:
        def _write():
            try:
                _checkpointer().save(path, payload, force=True)
                logger.info("Saved checkpoint to %s (async)", path)
            except Exception as e:  # surfaced at the next drain point
                _pending_error.append(e)

        global _pending_save
        _pending_save = threading.Thread(
            target=_write, name="ckpt-writer", daemon=False)
        _pending_save.start()
        return path
    _checkpointer().save(path, payload, force=True)
    logger.info("Saved checkpoint to %s", path)
    return path


_CONVNET_MODELS = ("ResNet", "SlowFast", "X3D")


def load_checkpoint(
    path: str,
    state,
    *,
    convert_from_torch: bool = False,
    epoch_reset: bool = False,
    clear_name_pattern=(),
    inflate: bool = False,
    model_name: str = "MViT",
) -> tuple[Any, int]:
    """Load into a TrainState. Returns (state, epoch).

    torch checkpoints go through the converter with shape-matched partial
    load; orbax checkpoints restore optimizer state unless ``epoch_reset``.
    ``model_name`` routes to the right state_dict converter: MViT/ActionCLIP
    use the transformer map, conv backbones (SlowFast/ResNet/X3D) use the
    conv map with BN running stats → ``batch_stats``. Caffe2 ``.pkl``
    checkpoints go through the c2 name chain first
    (reference ``checkpoint.py:219-287``).
    """
    wait_for_pending_saves()
    if convert_from_torch or path.endswith((".pyth", ".pth", ".pt", ".pkl")):
        if path.endswith(".pkl"):
            sd = load_c2_checkpoint(path)
            ckpt = {}
        else:
            ckpt = load_torch_checkpoint(path)
            sd = ckpt.get("model_state", ckpt)
        if clear_name_pattern:
            sd = {_clear_names(k, clear_name_pattern): v for k, v in sd.items()}
        stats = {}
        if model_name in _CONVNET_MODELS:
            converted, stats, skipped = convert_convnet_state_dict(
                sd, model_shapes=flatten_shapes(state.params))
        else:
            converted, skipped = convert_mvit_state_dict(sd)
        if skipped:
            logger.info("converter skipped %d keys (e.g. %s)",
                        len(skipped), skipped[:5])
        params, loaded, mismatched, missing = merge_with_model_params(
            converted, state.params
        )
        logger.info(
            "torch load: %d loaded, %d shape-mismatched, %d missing",
            len(loaded), len(mismatched), len(missing),
        )
        for k, got, want in mismatched[:10]:
            logger.info("  mismatch %s: ckpt %s vs model %s", k, got, want)
        extra = {}
        if stats and getattr(state, "model_state", None) is not None \
                and state.model_state.get("batch_stats"):
            merged_bs, bs_loaded, bs_mis, _ = merge_with_model_params(
                stats, state.model_state["batch_stats"],
                broadcast_leading=True,
            )
            logger.info("batch_stats load: %d loaded, %d mismatched",
                        len(bs_loaded), len(bs_mis))
            ms = dict(state.model_state)
            ms["batch_stats"] = merged_bs
            extra["model_state"] = ms
        epoch = int(ckpt.get("epoch", 0)) if not epoch_reset else 0
        return state.replace(params=params, **extra), epoch

    payload = _checkpointer().restore(path)
    params = _like(state.params, payload["params"])
    extra = {}
    if payload.get("model_state") and hasattr(state, "model_state"):
        extra["model_state"] = _restore_opt(
            state.model_state, payload["model_state"])
    if payload.get("ema_params") is not None and hasattr(state, "ema_params") \
            and state.ema_params is not None:
        extra["ema_params"] = _restore_opt(
            state.ema_params, payload["ema_params"])
    if epoch_reset:
        return state.replace(params=params, **extra), 0
    opt_state = jax.tree.map(
        lambda a, b: np.asarray(b).astype(a.dtype) if hasattr(a, "dtype") else b,
        state.opt_state,
        _restore_opt(state.opt_state, payload["opt_state"]),
    )
    new_state = state.replace(
        params=params,
        opt_state=opt_state,
        step=np.asarray(payload["step"]),
        **extra,
    )
    return new_state, int(payload["epoch"])


def _like(template, restored):
    flat_t, treedef = jax.tree.flatten(template)
    flat_r = jax.tree.leaves(restored)
    assert len(flat_t) == len(flat_r), (len(flat_t), len(flat_r))
    return jax.tree.unflatten(
        treedef, [np.asarray(r).astype(t.dtype) for t, r in zip(flat_t, flat_r)]
    )


def _restore_opt(template, restored):
    flat_t, treedef = jax.tree.flatten(template)
    flat_r = jax.tree.leaves(restored)
    assert len(flat_t) == len(flat_r)
    return jax.tree.unflatten(treedef, flat_r)


def _clear_names(name: str, patterns) -> str:
    for p in patterns:
        name = name.replace(p, "")
    return name


def load_train_checkpoint(cfg, state) -> tuple[Any, int]:
    """Auto-resume last > TRAIN.CHECKPOINT_FILE_PATH > fresh (epoch 0)."""
    if cfg.TRAIN.AUTO_RESUME and has_checkpoint(cfg.OUTPUT_DIR):
        last = get_last_checkpoint(cfg.OUTPUT_DIR)
        logger.info("Auto-resuming from %s", last)
        state, epoch = load_checkpoint(last, state)
        return state, epoch
    if cfg.TRAIN.CHECKPOINT_FILE_PATH:
        state, epoch = load_checkpoint(
            cfg.TRAIN.CHECKPOINT_FILE_PATH,
            state,
            convert_from_torch=cfg.TRAIN.CHECKPOINT_TYPE == "pytorch",
            epoch_reset=cfg.TRAIN.CHECKPOINT_EPOCH_RESET,
            clear_name_pattern=cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN,
            inflate=cfg.TRAIN.CHECKPOINT_INFLATE,
            model_name=cfg.MODEL.MODEL_NAME,
        )
        return state, epoch
    return state, 0


def load_test_checkpoint(cfg, state):
    """TEST path > last in OUTPUT_DIR > TRAIN path (checkpoint.py:466-501)."""
    if cfg.TEST.CHECKPOINT_FILE_PATH:
        state, _ = load_checkpoint(
            cfg.TEST.CHECKPOINT_FILE_PATH, state,
            convert_from_torch=cfg.TEST.CHECKPOINT_TYPE == "pytorch",
            epoch_reset=True,
            model_name=cfg.MODEL.MODEL_NAME,
        )
    elif has_checkpoint(cfg.OUTPUT_DIR):
        state, _ = load_checkpoint(get_last_checkpoint(cfg.OUTPUT_DIR), state,
                                   epoch_reset=True)
    elif cfg.TRAIN.CHECKPOINT_FILE_PATH:
        state, _ = load_checkpoint(
            cfg.TRAIN.CHECKPOINT_FILE_PATH, state,
            convert_from_torch=cfg.TRAIN.CHECKPOINT_TYPE == "pytorch",
            epoch_reset=True,
            model_name=cfg.MODEL.MODEL_NAME,
        )
    else:
        logger.info("Testing with random initialization (no checkpoint found)")
    return state
