#!/usr/bin/env python3
"""Clip-decode throughput benchmark across backends (cv2 / decord / pyav).

Verifies the O(clip) property of selective decoding: clip decode cost must
be (nearly) independent of video length. Generates synthetic videos of the
requested lengths, times one-clip decodes per backend, and prints a JSON
summary. (Reference equivalent: there is none — the reference only
benchmarks full loader throughput via utils/benchmark.py.)

Usage: python tools/benchmark_decode.py [--seconds 60 600] [--reps 5]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aicity_action_tpu.data import decoder  # noqa: E402


def write_video(path: str, seconds: int, fps: int = 30, size=(128, 96)):
    import cv2

    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    assert w.isOpened()
    rs = np.random.RandomState(0)
    base = rs.randint(0, 255, (size[1], size[0], 3), np.uint8)
    for i in range(seconds * fps):
        # cheap deterministic motion so frames compress realistically
        w.write(np.roll(base, i, axis=1))
    w.release()


def available_backends():
    out = ["cv2"]
    if decoder.decord is not None:
        out.append("decord")
    if decoder.av is not None:
        out.append("pyav")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, nargs="+", default=[60, 600])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--num_frames", type=int, default=16)
    ap.add_argument("--sampling_rate", type=int, default=4)
    args = ap.parse_args()

    results = {}
    with tempfile.TemporaryDirectory() as d:
        for sec in args.seconds:
            path = os.path.join(d, f"v{sec}.mp4")
            t0 = time.time()
            write_video(path, sec)
            print(f"# wrote {sec}s video in {time.time() - t0:.1f}s",
                  file=sys.stderr)
            for backend in available_backends():
                # warm once, then time reps random clips
                decoder.decode(path, args.sampling_rate, args.num_frames,
                               clip_idx=0, num_clips=5, backend=backend)
                t0 = time.time()
                for rep in range(args.reps):
                    frames = decoder.decode(
                        path, args.sampling_rate, args.num_frames,
                        clip_idx=rep % 5, num_clips=5, backend=backend)
                    assert frames.shape[0] == args.num_frames
                dt = (time.time() - t0) / args.reps
                results.setdefault(backend, {})[f"{sec}s"] = round(dt * 1e3, 1)

    for backend, per_len in results.items():
        times = list(per_len.values())
        ratio = max(times) / max(min(times), 1e-9)
        print(json.dumps({
            "metric": f"clip_decode_ms[{backend}]",
            **per_len,
            "long_over_short": round(ratio, 2),
        }))


if __name__ == "__main__":
    main()
