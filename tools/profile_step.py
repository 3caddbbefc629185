#!/usr/bin/env python3
"""Per-op TPU profile of the flagship forward (and optionally train) step.

Runs the jitted step under ``jax.profiler.trace`` and prints a table of
device time aggregated by HLO op name prefix / category, to drive the MFU
work (VERDICT round-1 item 2). Usage:

    PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_step.py \
        [--train] [--batch 4] [--crop 448] [--top 40]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_forward(batch, crop):
    import jax
    import jax.numpy as jnp

    from aicity_action_tpu.config import get_cfg
    from aicity_action_tpu.models.build import build_model

    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml"
    )
    cfg.DATA.TRAIN_CROP_SIZE = crop
    cfg.DATA.TEST_CROP_SIZE = crop
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    module, params = build_model(cfg)

    def fwd(p, x):
        return module.apply({"params": p}, [x])

    f = jax.jit(fwd)
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 16, crop, crop, 3),
        jnp.bfloat16,
    )
    return f, (params, x)


def build_train(batch, crop):
    import jax
    import jax.numpy as jnp

    from aicity_action_tpu.config import get_cfg
    from aicity_action_tpu.engine.steps import TrainState, make_train_step
    from aicity_action_tpu.models.build import build_model
    from aicity_action_tpu.solver.optimizer import construct_optimizer

    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml"
    )
    cfg.DATA.TRAIN_CROP_SIZE = crop
    cfg.DATA.TEST_CROP_SIZE = crop
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    module, params = build_model(cfg)
    tx, _ = construct_optimizer(cfg, params, steps_per_epoch=100)
    state = TrainState.create(params, tx)
    step = make_train_step(module, tx, cfg.MODEL.LOSS_FUNC,
                           num_classes=cfg.MODEL.NUM_CLASSES)
    f = jax.jit(step, donate_argnums=0)
    batch_d = {
        "inputs": [jnp.asarray(
            np.random.RandomState(0).randn(batch, 16, crop, crop, 3),
            jnp.float32)],
        "labels": jnp.asarray(np.arange(batch) % 18),
    }
    import jax.random as jr

    return f, (state, batch_d, jr.PRNGKey(0))


def parse_trace(trace_dir, top):
    files = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not files:
        print("NO TRACE FILES FOUND", file=sys.stderr)
        return
    with gzip.open(sorted(files)[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # device events: pid whose name mentions TPU / device
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "args" in e
    }
    dev_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "Chip" in n
    }
    by_op = {}
    by_cat = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        args = e.get("args", {}) or {}
        cat = args.get("hlo_category", "?")
        if cat in ("?",) and name.startswith("thread"):
            continue
        # normalize fusion names: strip trailing .N digits
        base = re.sub(r"[.\d]+$", "", name)
        key = (base, cat)
        by_op[key] = by_op.get(key, 0.0) + dur
        by_cat[cat] = by_cat.get(cat, 0.0) + dur
        total += dur
    print(f"\n== total device time: {total:.2f} ms ==")
    print("\n-- by hlo_category --")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:10.3f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {cat}")
    print(f"\n-- top {top} ops --")
    for (name, cat), ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:10.3f} ms  {100 * ms / max(total, 1e-9):5.1f}%  "
              f"[{cat}] {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--crop", type=int, default=448)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dir", default="/tmp/jax_profile")
    args = ap.parse_args()

    import jax

    if args.train:
        f, fargs = build_train(args.batch, args.crop)
        state, batch_d, rng = fargs
        # warm-up (compile); donated state must be re-fed
        t0 = time.time()
        state, m, _ = f(state, batch_d, rng)
        _ = float(np.asarray(m["loss"]))
        print(f"compile+first: {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(args.iters):
            state, m, _ = f(state, batch_d, rng)
        _ = float(np.asarray(m["loss"]))
        wall = (time.time() - t0) / args.iters
        print(f"train step: {wall * 1e3:.1f} ms/step "
              f"({args.batch / wall:.2f} clips/s)")
        os.makedirs(args.dir, exist_ok=True)
        with jax.profiler.trace(args.dir):
            for _ in range(2):
                state, m, _ = f(state, batch_d, rng)
            _ = float(np.asarray(m["loss"]))
    else:
        f, (params, x) = build_forward(args.batch, args.crop)
        t0 = time.time()
        r = f(params, x)
        _ = np.asarray(r.ravel()[0])
        print(f"compile+first: {time.time() - t0:.1f}s")
        import jax.numpy as jnp

        def chain(p, xx, n):
            def body(i, acc):
                preds = f(p, xx * (1 + 1e-6 * acc))
                return preds.mean().astype(xx.dtype)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), xx.dtype))

        cf = jax.jit(chain, static_argnums=2)
        r = cf(params, x, args.iters)
        _ = np.asarray(r)
        t0 = time.time()
        r = cf(params, x, args.iters)
        _ = np.asarray(r)
        wall = (time.time() - t0) / args.iters
        print(f"forward: {wall * 1e3:.1f} ms ({args.batch / wall:.2f} "
              f"clips/s)")
        os.makedirs(args.dir, exist_ok=True)
        with jax.profiler.trace(args.dir):
            r = f(params, x)
            _ = np.asarray(r.ravel()[0])
    parse_trace(args.dir, args.top)


if __name__ == "__main__":
    main()
