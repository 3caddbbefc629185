#!/usr/bin/env python3
"""Sliding-window scoring of full videos → per-video prediction pickles.

Equivalent of `scripts/run_action_classification_temporal_inf.py`: windows of
``frame_length × frame_stride`` source frames every ``proposal_stride``
frames are scored by the classifier; output pickle per video is a sorted
list of ``(t0, t1, scores[num_class])``.

Usage:
    python tools/run_temporal_inf.py --cfg CFG --video_lst FILE \
        --video_path DIR --out_dir DIR [--checkpoint CKPT] [opts...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--video_lst", required=True,
                   help="file with one video filename per line")
    p.add_argument("--video_path", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--checkpoint", default="",
                   help="overrides TEST.CHECKPOINT_FILE_PATH")
    p.add_argument("--frame_length", type=int, default=16)
    p.add_argument("--frame_stride", type=int, default=4)
    p.add_argument("--proposal_stride", type=int, default=16)
    p.add_argument("--frame_size", type=int, default=448)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--roi", type=float, nargs=4, default=[0.0, 0.0, 1.0, 1.0])
    p.add_argument("--exact_rgb", action="store_true",
                   help="ship RGB chunks instead of I420 (bit-exact with "
                        "the host preprocessing paths; 2x host->device "
                        "bytes — source video is 4:2:0 anyway, so the "
                        "default loses nothing the encoder kept)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    import optax

    from aicity_action_tpu.config import get_cfg, assert_and_infer_cfg
    from aicity_action_tpu.engine.steps import TrainState
    from aicity_action_tpu.models.build import build_model_with_state
    from aicity_action_tpu.parallel.mesh import make_mesh
    from aicity_action_tpu.pipeline.window_inference import (
        WindowDataset, WindowScorer, save_window_predictions,
    )
    from aicity_action_tpu.utils import checkpoint as cu
    from aicity_action_tpu.utils.logging import setup_logging, get_logger

    cfg = get_cfg()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.checkpoint:
        cfg.TEST.CHECKPOINT_FILE_PATH = args.checkpoint
    cfg.DATA.TRAIN_CROP_SIZE = args.frame_size
    cfg.DATA.TEST_CROP_SIZE = args.frame_size
    cfg = assert_and_infer_cfg(cfg)
    setup_logging(cfg.OUTPUT_DIR)
    logger = get_logger(__name__)

    mesh = make_mesh(cfg)
    # build WITH variable collections: BN-bearing backbones need their
    # running stats threaded into the scorer (module_wrapper deploys
    # SlowFast/ResNet the same way); detection checkpoints get whole-frame
    # boxes synthesized per window (module_wrapper.py:558-576)
    module, params, model_state = build_model_with_state(cfg)
    state = TrainState.create(params, optax.identity(), model_state)
    state = cu.load_test_checkpoint(cfg, state)

    scorer = WindowScorer(module, state.params, mesh,
                          batch_size=args.batch_size,
                          num_workers=args.num_workers,
                          model_state=state.model_state,
                          detection=cfg.DETECTION.ENABLE,
                          chroma420=not args.exact_rgb)
    os.makedirs(args.out_dir, exist_ok=True)

    n_path = 2 if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH else 1
    videos = [ln.strip() for ln in open(args.video_lst) if ln.strip()]
    for name in videos:
        stem = os.path.splitext(name)[0]
        out_pkl = os.path.join(args.out_dir, f"{stem}.pkl")
        if os.path.exists(out_pkl):  # per-video resume (saves are atomic)
            logger.info("%s: %s exists, skipping", name, out_pkl)
            continue
        t0 = time.time()
        ds = WindowDataset(
            os.path.join(args.video_path, name),
            frame_length=args.frame_length,
            frame_stride=args.frame_stride,
            proposal_stride=args.proposal_stride,
            frame_size=args.frame_size,
            target_fps=cfg.DATA.TARGET_FPS,
            roi=tuple(args.roi),
            mean=cfg.DATA.MEAN,
            std=cfg.DATA.STD,
            arch_pathways=n_path,
            slowfast_alpha=cfg.SLOWFAST.ALPHA,
            backend=cfg.DATA.DECODING_BACKEND,
        )
        preds = scorer.score_video(ds)
        save_window_predictions(preds, out_pkl)
        dt = time.time() - t0
        logger.info("%s: %d windows in %.1fs (%.2f win/s)",
                    name, len(preds), dt, len(preds) / max(dt, 1e-9))


if __name__ == "__main__":
    main()
