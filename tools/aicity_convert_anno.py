#!/usr/bin/env python3
"""Raw AI City annotations → clip labels + ffmpeg cut commands
(equivalent of scripts/aicity_convert_anno.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("anno_file")
    p.add_argument("video_path")
    p.add_argument("out_anno_file")
    p.add_argument("clip_cmds")
    p.add_argument("target_path")
    p.add_argument("--resolution", default="-2:540")
    args = p.parse_args()

    from aicity_action_tpu.data.decoder import cv2_video_meta
    from aicity_action_tpu.pipeline.anno import convert_annotations

    def video_length(video_file):
        path = os.path.join(args.video_path, video_file)
        if not os.path.exists(path):
            return None
        n, fps = cv2_video_meta(path)
        return n / (fps or 30.0)

    rows = convert_annotations(
        args.anno_file,
        video_length,
        out_anno_file=args.out_anno_file,
        clip_cmds_file=args.clip_cmds,
        video_path=args.video_path,
        target_path=args.target_path,
        resolution=args.resolution,
    )
    print(f"wrote {len(rows)} clip rows to {args.out_anno_file}")


if __name__ == "__main__":
    main()
