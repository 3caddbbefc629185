"""TensorBoard writer.

Restores the interface of the module the reference *imports but does not
ship* (`tools/train_net.py:22` imports `slowfast.visualization.tensorboard_vis`
which is absent from the repo — SURVEY §0). The call surface is recovered
from the call sites: ``TensorboardWriter(cfg)``, ``add_scalars(dict, step)``
(`train_net.py:309-320`), ``plot_eval(preds, labels, step)``
(`train_net.py:483-497`), ``close()`` (`train_net.py:822-823`).
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.logging import get_logger

logger = get_logger(__name__)


class TensorboardWriter:
    def __init__(self, cfg):
        self.cfg = cfg
        log_dir = cfg.TENSORBOARD.LOG_DIR or os.path.join(
            cfg.OUTPUT_DIR,
            f"runs-{cfg.TRAIN.DATASET}",
        )
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir=log_dir)
        except Exception:  # pragma: no cover - tensorboard optional
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self.writer = SummaryWriter(log_dir=log_dir)
            except Exception:
                logger.warning(
                    "No tensorboard writer backend available; scalars will "
                    "be dropped")
                self.writer = None
        self.class_names = None
        if cfg.TENSORBOARD.CLASS_NAMES_PATH:
            with open(cfg.TENSORBOARD.CLASS_NAMES_PATH) as f:
                import json

                self.class_names = list(json.load(f).keys())
        logger.info("Tensorboard logging to %s", log_dir)

    def add_scalars(self, data_dict: dict, global_step: int | None = None):
        if self.writer is None:
            return
        for key, item in data_dict.items():
            self.writer.add_scalar(key, float(item), global_step)

    def plot_eval(self, preds, labels, global_step: int | None = None):
        """Confusion matrix + per-class histograms when enabled."""
        if self.writer is None:
            return
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        if self.cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE and preds.ndim == 2:
            num_classes = preds.shape[1]
            cm = np.zeros((num_classes, num_classes), np.int64)
            top1 = preds.argmax(axis=1)
            for t, p in zip(labels.astype(int), top1):
                cm[t, p] += 1
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                figsize = self.cfg.TENSORBOARD.CONFUSION_MATRIX.FIGSIZE
                fig, ax = plt.subplots(figsize=figsize)
                ax.imshow(cm, cmap="Blues")
                ax.set_xlabel("Predicted")
                ax.set_ylabel("True")
                self.writer.add_figure("confusion_matrix", fig,
                                       global_step=global_step)
                plt.close(fig)
            except Exception:  # pragma: no cover
                pass

    def add_video(self, tensor, tag="video", global_step=None, fps=4):
        if self.writer is None:
            return
        self.writer.add_video(tag, tensor, global_step=global_step, fps=fps)

    def flush(self):
        if self.writer is not None:
            self.writer.flush()

    def close(self):
        if self.writer is not None:
            self.writer.flush()
            self.writer.close()
