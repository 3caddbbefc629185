"""Deployable video action classifier.

Re-design of the reference's ``VideoActionClassifier``
(`scripts/module_wrapper.py:403-611`), which dispatches between PyTorch
eager, ONNX Runtime (+TensorRT EP) and TorchScript. The TPU-native
equivalents:

- eager = the jitted flax apply (XLA-compiled, cached)
- ONNX/TRT/TorchScript = an ahead-of-time **StableHLO export**
  (``jax.export``): a serialized, self-contained artifact loadable without
  the model-building code, the JAX-native deployment format.

Fixed-batch padding mirrors the reference's ONNX fixed-batch workaround
(`module_wrapper.py:580-596`).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


class VideoActionClassifier:
    """Batched clip scorer with a stable ``inference(frames) -> scores`` API."""

    def __init__(
        self,
        cfg,
        checkpoint_path: str = "",
        *,
        batch_size: int = 8,
        exported_path: str = "",
    ):
        import jax
        import jax.numpy as jnp
        import optax

        from ..engine.steps import TrainState
        from ..models.build import build_model_with_state
        from ..utils import checkpoint as cu

        self.cfg = cfg
        self.batch_size = batch_size
        self._jax = jax
        self._jnp = jnp

        if exported_path:
            self._exported = load_exported(exported_path)
            self._fn = None
            return
        self._exported = None

        module, params, model_state = build_model_with_state(cfg)
        if checkpoint_path:
            cfg.TEST.CHECKPOINT_FILE_PATH = checkpoint_path
        state = TrainState.create(params, optax.identity(), model_state)
        state = cu.load_test_checkpoint(cfg, state)
        self.module = module
        self.params = state.params
        self.model_state = state.model_state
        self.detection = bool(cfg.DETECTION.ENABLE)

        if self.detection:
            # detection checkpoints score whole clips through the RoI head
            # on a synthesized full-frame box per sample
            # (module_wrapper.py:558-576)
            def fwd(p, ms, xs, boxes):
                return module.apply({"params": p, **ms}, xs, boxes,
                                    train=False)
        else:
            def fwd(p, ms, xs):
                return module.apply({"params": p, **ms}, xs, train=False)

        self._fn = jax.jit(fwd)

    # ------------------------------------------------------------- scoring
    def inference(self, frames: Sequence[np.ndarray]) -> np.ndarray:
        """``frames``: list of pathway arrays ``[B, T, H, W, C]`` (numpy).
        Returns ``[B, num_classes]`` scores (eval head activation applied).

        Batches are padded to the compiled ``batch_size`` so a single XLA
        executable serves every call.
        """
        jnp = self._jnp
        b = frames[0].shape[0]
        xs = list(frames)
        if b < self.batch_size:
            pad = self.batch_size - b
            xs = [np.concatenate([x, np.repeat(x[-1:], pad, 0)]) for x in xs]
        elif b > self.batch_size:
            outs = []
            for i in range(0, b, self.batch_size):
                outs.append(self.inference([x[i:i + self.batch_size]
                                            for x in frames]))
            return np.concatenate(outs)

        if self._exported is not None:
            out = self._exported.call(*[jnp.asarray(x) for x in xs])
        elif self.detection:
            H, W = xs[0].shape[2], xs[0].shape[3]
            boxes = np.zeros((self.batch_size, 5), np.float32)
            boxes[:, 0] = np.arange(self.batch_size)
            boxes[:, 3] = W
            boxes[:, 4] = H
            out = self._fn(self.params, self.model_state,
                           [jnp.asarray(x) for x in xs], jnp.asarray(boxes))
        else:
            out = self._fn(self.params, self.model_state,
                           [jnp.asarray(x) for x in xs])
        return np.asarray(self._jax.device_get(out), np.float32)[:b]

    # -------------------------------------------------------------- export
    def export(self, path: str) -> str:
        """Serialize the classifier as a StableHLO artifact
        (the ONNX-export equivalent, `module_wrapper.py:414-426`)."""
        import jax
        from jax import export as jexport

        n_path = (2 if self.cfg.MODEL.ARCH
                  in self.cfg.MODEL.MULTI_PATHWAY_ARCH else 1)
        T = self.cfg.DATA.NUM_FRAMES
        S = self.cfg.DATA.TEST_CROP_SIZE
        alpha = self.cfg.SLOWFAST.ALPHA
        shapes = (
            [(self.batch_size, T, S, S, 3)] if n_path == 1 else
            [(self.batch_size, T // alpha, S, S, 3),
             (self.batch_size, T, S, S, 3)]
        )
        args = [jax.ShapeDtypeStruct(s, self._jnp.float32) for s in shapes]

        params = self.params
        model_state = self.model_state
        module = self.module

        def fwd(*xs):
            return module.apply(
                {"params": params, **model_state}, list(xs), train=False)

        exported = jexport.export(jax.jit(fwd))(*args)
        blob = exported.serialize()
        with open(path, "wb") as f:
            f.write(blob)
        return path


class _ExportedModel:
    def __init__(self, exported):
        self._exported = exported

    def call(self, *xs):
        return self._exported.call(*xs)


def load_exported(path: str) -> _ExportedModel:
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    return _ExportedModel(jexport.deserialize(blob))
