#!/usr/bin/env python3
"""Window-prediction pickles + thresholds → challenge submission.

Equivalent of `scripts/aicity_inf.py`: per-frame score aggregation over
overlapping windows, per-class threshold → contiguous chunks, top-1 chunk per
view, cross-view top-1, ±1 s boundary tightening.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("pred_pickle_path")
    p.add_argument("thres_file")
    p.add_argument("vid_csv", help="video_id -> 3 view files csv")
    p.add_argument("output_file")
    p.add_argument("--num_class", type=int, default=18)
    p.add_argument("--agg_method", default="avg", choices=["avg", "max"])
    p.add_argument("--use_num_chunk", type=int, default=1)
    p.add_argument("--chunk_sort_base_single_vid", default="length",
                   choices=["length", "score"])
    p.add_argument("--chunk_sort_base_multi_vid", default="length",
                   choices=["length", "score"])
    return p.parse_args()


def main():
    args = parse_args()
    from aicity_action_tpu.pipeline import postprocess as pp
    from aicity_action_tpu.pipeline.window_inference import (
        load_window_predictions,
    )

    agg = np.mean if args.agg_method == "avg" else np.max

    thresholds = {}
    for line in open(args.thres_file):
        action_id, thres = line.strip().split()
        thresholds[int(action_id)] = float(thres)

    video_views = {}
    all_videos = []
    with open(args.vid_csv) as f:
        for line in f.readlines()[1:]:
            vid, f1, f2, f3 = line.strip().split(",")
            video_views[vid] = [f1, f2, f3]
            all_videos += [f1, f2, f3]

    view_chunks = {}
    for file_id in all_videos:
        preds = load_window_predictions(
            os.path.join(args.pred_pickle_path, f"{file_id}.pkl"))
        per_frame = pp.aggregate_predictions(preds, agg, args.num_class)
        view_chunks[file_id] = pp.chunks_for_video(
            per_frame, thresholds,
            use_num_chunk=args.use_num_chunk,
            sort_base=args.chunk_sort_base_single_vid,
        )

    rows = pp.merge_views_to_submission(
        video_views, view_chunks, thresholds,
        use_num_chunk=args.use_num_chunk,
        sort_base=args.chunk_sort_base_multi_vid,
    )
    print(f"total pred {len(rows)}")
    pp.write_submission(rows, args.output_file)


if __name__ == "__main__":
    main()
