#!/usr/bin/env python3
"""Threshold derivation + F1 evaluation on a labeled split.

Equivalent of `scripts/aicity_inf_graph.py`: derive per-class thresholds as
the mean GT-segment score (min/max/mean reduced), then score the split with
the ±1 s boundary-match F1.
"""

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("anno_csv", help="val.csv with clip rows (clip_id label)")
    p.add_argument("pred_pickle_path")
    p.add_argument("--appendix", default="")
    p.add_argument("--num_class", type=int, default=18)
    p.add_argument("--agg_method", default="avg", choices=["avg", "max"])
    p.add_argument("--thres_take", default="mean",
                   choices=["min", "max", "mean"])
    p.add_argument("--thres_file", default=None)
    p.add_argument("--replace_thres_file", default=None)
    p.add_argument("--use_num_chunk", type=int, default=1)
    p.add_argument("--chunk_sort_base", default="length",
                   choices=["length", "score"])
    p.add_argument("--use_tight_times", action="store_true")
    p.add_argument("--graph_path", default=None,
                   help="write per-(video, class) score-curve PNGs")
    return p.parse_args()


def _plot_curves(anno_data, per_frame, classes, graph_path,
                 video_fps=30.0):
    """Score curves with GT boundaries (reference: aicity_inf_graph.py
    plotting branch, one figure of 3 views per (vid, class))."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(graph_path, exist_ok=True)
    for vid, annos in anno_data.items():
        for action_id in classes:
            anno = [o for o in annos if o[-1] == action_id]
            if not anno:
                continue
            fig, axes = plt.subplots(1, max(len(anno[:3]), 1),
                                     figsize=(20, 9), squeeze=False)
            for i, (file_id, _, t0, t1, _) in enumerate(anno[:3]):
                if file_id not in per_frame:
                    continue
                scores = per_frame[file_id][:, action_id]
                ax = axes[0][i]
                ax.plot(range(len(scores)), scores)
                ax.axvline(x=int(t0 * video_fps), color="orange",
                           linestyle="dashed")
                ax.axvline(x=int(t1 * video_fps), color="orange",
                           linestyle="dashed")
                ax.set_title(f"{file_id} (action {action_id})")
            fig.savefig(os.path.join(
                graph_path, f"{vid}.action_{action_id}.png"))
            plt.close(fig)


def main():
    args = parse_args()
    from aicity_action_tpu.pipeline import postprocess as pp
    from aicity_action_tpu.pipeline.window_inference import (
        load_window_predictions,
    )

    agg = np.mean if args.agg_method == "avg" else np.max
    classes = list(range(1, args.num_class))

    # anno rows: file_id.user_id.t0.t1.MP4 label
    anno_data = defaultdict(list)
    all_files = {}
    for line in open(args.anno_csv):
        video_file, action_class = line.strip().split()
        file_id, user_id, t0, t1, _ = video_file.split(".")
        vid = f"{user_id}_{file_id[-1]}"
        anno_data[vid].append(
            (file_id, user_id, int(t0), int(t1), int(action_class)))
        all_files[file_id] = 1

    per_frame = {}
    for file_id in all_files:
        suffix = f".{args.appendix}.pkl" if args.appendix else ".pkl"
        preds = load_window_predictions(
            os.path.join(args.pred_pickle_path, f"{file_id}{suffix}"))
        per_frame[file_id] = pp.aggregate_predictions(
            preds, agg, args.num_class)

    thresholds = pp.derive_thresholds(
        anno_data, per_frame, classes, thres_take=args.thres_take)

    if args.graph_path:
        _plot_curves(anno_data, per_frame, classes, args.graph_path)

    if args.replace_thres_file:
        for line in open(args.replace_thres_file):
            action_id, score = line.strip().split()
            thresholds[int(action_id)] = float(score)

    if args.thres_file:
        with open(args.thres_file, "w") as f:
            for c in classes:
                f.write(f"{c} {thresholds[c]:.5f}\n")

    action_chunks = {
        file_id: pp.chunks_for_video(
            scores, thresholds,
            use_num_chunk=args.use_num_chunk,
            sort_base=args.chunk_sort_base,
        )
        for file_id, scores in per_frame.items()
    }
    f1, precision, recall = pp.compute_f1(
        anno_data, classes, action_chunks,
        use_num_chunk=args.use_num_chunk,
        chunk_sort_base=args.chunk_sort_base,
        use_tight_times=args.use_tight_times,
        return_pr=True,
    )
    print(f"F1, precision, recall: {f1:.6f} {precision:.6f} {recall:.6f}")


if __name__ == "__main__":
    main()
