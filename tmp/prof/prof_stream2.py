import numpy as np, time, sys, os, tempfile
sys.path.insert(0, '/root/repo')
import cv2
from aicity_action_tpu.pipeline.window_inference import WindowDataset
from aicity_action_tpu import native

d = tempfile.mkdtemp(); path = os.path.join(d, "v.mp4")
fps, size = 30, (960, 540)
w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
rs = np.random.RandomState(0)
base = rs.randint(0, 255, (size[1], size[0], 3), np.uint8)
for i in range(30*fps):
    w.write(np.roll(base, 7*i, axis=1))
w.release()

ds = WindowDataset(path, frame_size=448)
import aicity_action_tpu.pipeline.window_inference as wi

# timings
t_decode = t_stack = t_native = 0.0
cap = cv2.VideoCapture(path)
frames_raw = []
t0 = time.time()
while True:
    ok, f = cap.read()
    if not ok: break
    frames_raw.append(f[:, :, ::-1])
t_decode = time.time() - t0
print(f"decode+view: {t_decode:.1f}s for {len(frames_raw)}")

idxs = np.linspace(0, 63, 16).astype(int)
t0 = time.time()
for _ in range(56):
    stack = np.stack([frames_raw[i] for i in idxs])
t_stack = time.time()-t0
print(f"stack x56: {t_stack:.2f}s")
roi = (0, 0, 960, 540)
print("native lib available:", native.crop_resize_u8(stack, roi, 448) is not None)
t0 = time.time()
for _ in range(56):
    u8 = native.crop_resize_u8(stack, roi, 448)
print(f"native crop_resize_u8 x56: {time.time()-t0:.2f}s")
