import numpy as np, time, sys, os, tempfile
sys.path.insert(0, '/root/repo')
import cv2
from aicity_action_tpu.pipeline.window_inference import WindowDataset

d = tempfile.mkdtemp()
path = os.path.join(d, "v.mp4")
fps, size = 30, (960, 540)
w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
rs = np.random.RandomState(0)
base = rs.randint(0, 255, (size[1], size[0], 3), np.uint8)
for i in range(60*fps):
    w.write(np.roll(base, 7*i, axis=1))
w.release()
print("video written")

# raw decode speed
cap = cv2.VideoCapture(path)
t0 = time.time(); n = 0
while True:
    ok, f = cap.read()
    if not ok: break
    n += 1
t = time.time()-t0
print(f"raw cv2 decode: {n} frames in {t:.1f}s = {n/t:.0f} fps")

# stream_windows consumption (decode + window assembly + preprocess)
ds = WindowDataset(path, frame_size=448)
t0 = time.time(); cnt = 0
for item in ds.stream_windows(raw_u8=True):
    cnt += 1
t = time.time()-t0
print(f"stream_windows(raw_u8): {cnt} windows in {t:.1f}s = {cnt/t:.1f} win/s")
