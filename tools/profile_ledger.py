#!/usr/bin/env python3
"""Per-op device-time ledger of the jitted flagship forward/train step.

Rebuilds the DESIGN §10/§11b profiling methodology as a committed tool
(earlier rounds kept it in gitignored tmp/ and lost it): trace a few
steady-state iterations with ``jax.profiler``, then aggregate device op
time from the captured xplane via tensorboard_plugin_profile / xprof.

Usage:
    python tools/profile_ledger.py                 # inference bs8 @448
    python tools/profile_ledger.py --train         # train step bs4 @448
    python tools/profile_ledger.py --crop 224 --batch 4 --top 40

Prints a table of (op-category, self-time ms/iter, %), the total device
time per iteration, and the implied clips/s — the inputs for the DESIGN
roofline ledgers.
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _find_trace(logdir: str) -> str:
    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace.json.gz under {logdir}"
    return max(paths, key=os.path.getmtime)


def device_op_table(trace_path: str):
    """Aggregate the device 'XLA Ops' lane of a jax.profiler chrome trace.

    Returns (rows, cat_totals, total_ms): rows of
    (op_base_name, hlo_category, self_time_ms) summed over the trace,
    cat_totals of hlo_category -> ms. The .trace.json.gz is written
    directly by jax.profiler.stop_trace (no xplane conversion needed —
    tensorboard_plugin_profile's pb2 files predate this protobuf)."""
    with gzip.open(trace_path, "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"] if isinstance(tr, dict) else tr
    dev_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and re.search(r"TPU|/device:", e["args"].get("name", ""))
    }
    op_tids = {
        (e["pid"], e["tid"]) for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e["args"].get("name") == "XLA Ops" and e["pid"] in dev_pids
    }
    rows: dict = {}
    cats: dict = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        dur_ms = float(e.get("dur", 0)) / 1000.0
        args = e.get("args") or {}
        cat = args.get("hlo_category", "?")
        # collapse HLO instance ids: fused_computation.123 -> base name
        base = re.sub(r"[.\d]+$", "", e.get("name", "?"))
        key = (base, cat)
        rows[key] = rows.get(key, 0.0) + dur_ms
        cats[cat] = cats.get(cat, 0.0) + dur_ms
        total += dur_ms
    out = [(k[0], k[1], v) for k, v in rows.items()]
    out.sort(key=lambda r: -r[2])
    return out, cats, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--crop", type=int, default=448)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--logdir", default="tmp/prof")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aicity_action_tpu.config import get_cfg
    from aicity_action_tpu.models.build import build_model

    B = args.batch or (4 if args.train else 8)
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml")
    cfg.DATA.TRAIN_CROP_SIZE = args.crop
    cfg.DATA.TEST_CROP_SIZE = args.crop
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"

    if args.train:
        from aicity_action_tpu.data.mixup import build_mixup_from_cfg
        from aicity_action_tpu.engine.steps import TrainState, make_train_step
        from aicity_action_tpu.solver.optimizer import construct_optimizer

        cfg.MODEL.ACT_CHECKPOINT = True
        cfg.MIXUP.ENABLE = True
        module, params = build_model(cfg)
        tx, _ = construct_optimizer(cfg, params, steps_per_epoch=100)
        state = TrainState.create(params, tx)
        step = jax.jit(
            make_train_step(module, tx, cfg.MODEL.LOSS_FUNC,
                            mixup_fn=build_mixup_from_cfg(cfg),
                            num_classes=cfg.MODEL.NUM_CLASSES),
            donate_argnums=0)
        batch = {
            "inputs": [jnp.asarray(np.random.RandomState(0).randn(
                B, 16, args.crop, args.crop, 3), jnp.bfloat16)],
            "labels": jnp.asarray(np.arange(B) % 18),
        }
        rng = jax.random.PRNGKey(0)

        def run_iter(s):
            s, m, _ = step(s, batch, rng)
            return s, m["loss"]

        state, loss = run_iter(state)
        state, loss = run_iter(state)
        _ = float(np.asarray(loss))
        carry = state
    else:
        module, params = build_model(cfg)
        fwd = jax.jit(lambda p, x: module.apply({"params": p}, [x]))
        x = jnp.asarray(np.random.RandomState(0).randn(
            B, 16, args.crop, args.crop, 3), jnp.bfloat16)
        r = fwd(params, x)
        _ = np.asarray(r.ravel()[0])
        carry = None

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    t0 = time.time()
    if args.train:
        for _ in range(args.iters):
            carry, loss = run_iter(carry)
        _ = float(np.asarray(loss))
    else:
        for _ in range(args.iters):
            r = fwd(params, x)
        _ = np.asarray(r.ravel()[0])
    wall = (time.time() - t0) / args.iters
    jax.profiler.stop_trace()

    trace = _find_trace(args.logdir)
    rows, cats, total = device_op_table(trace)
    print(f"# {'train' if args.train else 'inference'} bs={B} "
          f"@{args.crop}: wall {wall * 1000:.1f} ms/iter, device op time "
          f"{total / args.iters:.1f} ms/iter "
          f"({B / wall:.1f} clips/s wall)")
    print(f"# trace: {trace}")
    print("# by hlo_category (ms/iter):")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{ms / args.iters:9.2f}  {100 * ms / total:5.1f}  {cat}")
    print(f"# top ops (ms/iter):")
    for name, cat, ms in rows[:args.top]:
        print(f"{ms / args.iters:9.2f}  {100 * ms / total:5.1f}  "
              f"[{cat[:18]}] {name[:90]}")
    rest = sum(ms for _, _, ms in rows[args.top:])
    print(f"{rest / args.iters:9.2f}  {100 * rest / total:5.1f}  "
          f"(+{len(rows) - args.top} more)")


if __name__ == "__main__":
    main()
