"""Video decoding and temporal clip sampling.

Host-CPU stage of the input pipeline (decode is not a TPU op). Re-designs
`/root/reference/slowfast/datasets/decoder.py` and `video_container.py`:

- sampling math (`temporal_sampling`, `get_start_end_idx`) is pure numpy with
  identical semantics (linspace + clamp; fps renormalization to TARGET_FPS)
- backends: OpenCV (always available in this image), decord and PyAV when
  installed (the reference's primary backends); selection mirrors
  ``DATA.DECODING_BACKEND``.

All decoders return uint8 RGB frames ``[T, H, W, 3]``.
"""

from __future__ import annotations

import math
import random
from typing import Optional

import numpy as np

try:  # preferred backend of the reference (README.md:107)
    import decord  # type: ignore
except ImportError:
    decord = None
try:
    import av  # type: ignore
except ImportError:
    av = None
import cv2


def temporal_sampling(
    frames: np.ndarray, start_idx: float, end_idx: float, num_samples: int
) -> np.ndarray:
    """Uniformly sample ``num_samples`` frame indices in [start, end], clamped.

    Same math as the reference (`decoder.py:10-31`) and the inference wrapper
    (`module_wrapper.py:384-397`).
    """
    index = sample_indices(start_idx, end_idx, num_samples, frames.shape[0])
    return frames[index]


def sample_indices(
    start_idx: float, end_idx: float, num_samples: int, video_len: int
) -> np.ndarray:
    index = np.linspace(start_idx, end_idx, num_samples)
    return np.clip(index, 0, video_len - 1).astype(np.int64)


def get_start_end_idx(
    video_size: int,
    clip_size: float,
    clip_idx: int,
    num_clips: int,
    use_offset: bool = False,
    rng: Optional[random.Random] = None,
) -> tuple[float, float]:
    """Clip placement: random (clip_idx == -1) or uniform enumeration
    (reference: decoder.py:34-73)."""
    delta = max(video_size - clip_size, 0)
    if clip_idx == -1:
        r = rng.uniform(0, delta) if rng is not None else random.uniform(0, delta)
        start_idx = r
    elif use_offset:
        if num_clips == 1:
            start_idx = math.floor(delta / 2)
        else:
            start_idx = clip_idx * math.floor(delta / (num_clips - 1))
    else:
        start_idx = delta * clip_idx / num_clips
    end_idx = start_idx + clip_size - 1
    return start_idx, end_idx


def clip_size_in_frames(
    sampling_rate: int, num_frames: int, fps: float, target_fps: float
) -> float:
    """Length of the clip in source frames, renormalized to the target fps
    (reference: decoder.py:476)."""
    return sampling_rate * num_frames / target_fps * fps


# ------------------------------------------------------------- backends
def pyav_decode_stream(container, start_pts, end_pts, stream,
                       buffer_size: int = 0):
    """Decode only frames with pts in ``[start_pts, end_pts]`` by seeking
    near the window start (reference: decoder.py:75-114). Seeks are
    imprecise, so seek a 1024-pts margin early and skip until start_pts."""
    margin = 1024
    seek_offset = max(start_pts - margin, 0)
    container.seek(seek_offset, any_frame=False, backward=True, stream=stream)
    frames = {}
    buffer_count = 0
    max_pts = 0
    for frame in container.decode(stream):
        max_pts = max(max_pts, frame.pts)
        if frame.pts < start_pts:
            continue
        if frame.pts <= end_pts:
            frames[frame.pts] = frame
        else:
            buffer_count += 1
            frames[frame.pts] = frame
            if buffer_count >= buffer_size:
                break
    return [frames[p] for p in sorted(frames)], max_pts


def pyav_decode(
    container,
    sampling_rate: int,
    num_frames: int,
    clip_idx: int,
    num_clips: int = 10,
    target_fps: float = 30.0,
    use_offset: bool = False,
    rng: Optional[random.Random] = None,
) -> tuple[np.ndarray, float, bool]:
    """Selective-seek PyAV decode (reference: decoder.py:253-326).

    When the container header carries duration/frame-count metadata, only
    the clip window is decoded (O(clip), independent of video length);
    otherwise the entire video is decoded. Returns
    ``(frames [T, H, W, 3] uint8, fps, decode_all_video)``.
    """
    stream = container.streams.video[0]
    fps = float(stream.average_rate or 30.0)
    frames_length = stream.frames
    duration = stream.duration

    if duration is None or not frames_length:
        decode_all_video = True
        start_pts, end_pts = 0, math.inf
    else:
        decode_all_video = False
        s, e = get_start_end_idx(
            frames_length,
            clip_size_in_frames(sampling_rate, num_frames, fps, target_fps),
            clip_idx, num_clips, use_offset, rng,
        )
        timebase = duration / frames_length
        start_pts = int(s * timebase)
        end_pts = int(e * timebase)

    video_frames, _ = pyav_decode_stream(container, start_pts, end_pts,
                                         stream)
    frames = np.stack([f.to_rgb().to_ndarray() for f in video_frames])
    return frames, fps, decode_all_video


def _cv2_decode_all(path: str) -> tuple[np.ndarray, float]:
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"cv2 failed to open {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise RuntimeError(f"cv2 decoded 0 frames from {path}")
    return np.stack(frames), fps


def _cv2_decode_indices(path: str, indices: np.ndarray) -> np.ndarray:
    """Sequential decode grabbing only the requested (sorted) indices."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"cv2 failed to open {path}")
    want = np.asarray(indices)
    out: dict[int, np.ndarray] = {}
    need = set(int(i) for i in want)
    last = max(need)
    first = min(need)
    i = 0
    if first > 0:
        # seek so clip cost is O(clip), not O(position-in-video); FFmpeg
        # lands on the prior keyframe and decodes forward internally.
        cap.set(cv2.CAP_PROP_POS_FRAMES, first)
        pos = int(cap.get(cv2.CAP_PROP_POS_FRAMES))
        if pos == first:
            i = first
        else:  # unreliable seek on this codec: rewind and scan
            cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
    while i <= last:
        ok = cap.grab()
        if not ok:
            break
        if i in need:
            ok, frame = cap.retrieve()
            if not ok:
                break
            out[i] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        i += 1
    cap.release()
    if not out:
        raise RuntimeError(f"cv2 decoded 0 frames from {path}")
    # frame-count metadata can overestimate; substitute the nearest decoded
    got = sorted(out)
    def nearest(i):
        i = int(i)
        if i in out:
            return out[i]
        return out[min(got, key=lambda k: abs(k - i))]
    return np.stack([nearest(i) for i in want])


def cv2_video_meta(path: str) -> tuple[int, float]:
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"cv2 failed to open {path}")
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    cap.release()
    return n, fps


def decode(
    path: str,
    sampling_rate: int,
    num_frames: int,
    clip_idx: int = -1,
    num_clips: int = 10,
    target_fps: float = 30.0,
    backend: str = "cv2",
    use_offset: bool = False,
    rng: Optional[random.Random] = None,
) -> np.ndarray:
    """Decode one clip from a video file → uint8 RGB ``[T, H, W, 3]``.

    Dispatch mirrors the reference `decoder.py:391-486`: pick the clip
    placement in fps-renormalized frame space, then batch-fetch the sampled
    indices.
    """
    if backend == "decord" and decord is not None:
        vr = decord.VideoReader(path, num_threads=1)
        fps = float(vr.get_avg_fps() or 30.0)
        video_size = len(vr)
        clip_sz = clip_size_in_frames(sampling_rate, num_frames, fps, target_fps)
        s, e = get_start_end_idx(video_size, clip_sz, clip_idx, num_clips,
                                 use_offset, rng)
        idx = sample_indices(s, e, num_frames, video_size)
        return vr.get_batch(idx).asnumpy()
    if backend == "pyav" and av is not None:
        with av.open(path) as container:
            frames, fps, decode_all = pyav_decode(
                container, sampling_rate, num_frames, clip_idx, num_clips,
                target_fps, use_offset, rng)
        clip_sz = clip_size_in_frames(sampling_rate, num_frames, fps,
                                      target_fps)
        # after selective decode, the window IS the clip (reference
        # decoder.py:466-472: clip_idx=0, num_clips=1 over the window)
        s, e = get_start_end_idx(
            frames.shape[0], clip_sz,
            clip_idx if decode_all else 0,
            num_clips if decode_all else 1,
            use_offset, rng)
        return temporal_sampling(frames, s, e, num_frames)
    # cv2 fallback/primary: read metadata, then selectively grab frames
    video_size, fps = cv2_video_meta(path)
    clip_sz = clip_size_in_frames(sampling_rate, num_frames, fps, target_fps)
    if video_size <= 0:
        frames, fps = _cv2_decode_all(path)
        video_size = frames.shape[0]
        s, e = get_start_end_idx(video_size, clip_sz, clip_idx, num_clips,
                                 use_offset, rng)
        return temporal_sampling(frames, s, e, num_frames)
    s, e = get_start_end_idx(video_size, clip_sz, clip_idx, num_clips,
                             use_offset, rng)
    idx = sample_indices(s, e, num_frames, video_size)
    return _cv2_decode_indices(path, idx)
