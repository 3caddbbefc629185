#!/usr/bin/env python3
"""One-command released-checkpoint fire drill.

The standing north star (PARITY.md, BASELINE.md) is reproducing the
reference's A2 public-leaderboard F1 = 0.3295
(`/root/reference/README.md:159`) from the released `.pyth` checkpoint +
`public_leaderboard_thres.txt`. The released artifacts do not exist in this
environment; this script is the drill that runs the moment they land,
chaining the real CLI surfaces end to end:

  1. tools/convert_checkpoint.py  — .pyth -> orbax (+ optional torch
     logit verification against the reference's own modules)
  2. tools/run_temporal_inf.py    — sliding-window scoring of every video
     in the list (reference: run_action_classification_temporal_inf.py)
  3. tools/aicity_inf.py          — thresholds -> chunks -> per-video
     top-1 -> cross-view merge -> submission txt (reference: aicity_inf.py)
  4. optional: ±1 s boundary-match F1 against a labeled annotation csv
     (reference: aicity_inf_graph.py:221-286) with an --expect_f1 gate.

Usage:
  python tools/fire_drill.py \
      --pyth k700_16x4_448.pyth \
      --cfg /root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml \
      --video_lst A2_videos.lst --video_path /data/A2 \
      --vid_csv A2_video_ids.csv --thres_file public_leaderboard_thres.txt \
      --out_dir drill/ [--anno_csv val_gt.csv --expect_f1 0.3295] [opts...]

Each stage is a subprocess of the public CLI (the drill exercises exactly
what a user would run); stages already completed in --out_dir are skipped,
so an interrupted drill resumes where it stopped.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tag, cmd):
    print(f"[fire_drill] {tag}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run([sys.executable] + cmd, cwd=REPO)
    dt = time.time() - t0
    if r.returncode != 0:
        print(f"[fire_drill] {tag} FAILED (rc={r.returncode}, {dt:.0f}s)",
              file=sys.stderr)
        sys.exit(r.returncode)
    print(f"[fire_drill] {tag} done in {dt:.0f}s", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--pyth", required=True, help="released torch checkpoint")
    p.add_argument("--cfg", required=True)
    p.add_argument("--video_lst", required=True)
    p.add_argument("--video_path", required=True)
    p.add_argument("--vid_csv", required=True,
                   help="video_id -> 3 view files csv (A2_video_ids.csv)")
    p.add_argument("--thres_file", required=True,
                   help="per-class thresholds (public_leaderboard_thres.txt)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--anno_csv", default="",
                   help="labeled split for local F1 (optional; the A2 GT is "
                        "not public — leaderboard submission measures it)")
    p.add_argument("--expect_f1", type=float, default=None,
                   help="fail unless F1 >= this (e.g. 0.3295 on the split "
                        "the thresholds were derived for)")
    p.add_argument("--skip_verify", action="store_true",
                   help="skip the torch logit verification stage")
    for flag in ("frame_length", "frame_stride", "proposal_stride",
                 "frame_size", "batch_size", "num_workers"):
        p.add_argument(f"--{flag}", default=None,
                       help="forwarded to run_temporal_inf")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="KEY VALUE config overrides forwarded to every stage")
    args = p.parse_args(argv)
    if args.expect_f1 is not None and not args.anno_csv:
        p.error("--expect_f1 requires --anno_csv (the F1 is computed "
                "against a labeled split)")
    inf_flags = []
    for flag in ("frame_length", "frame_stride", "proposal_stride",
                 "frame_size", "batch_size", "num_workers"):
        v = getattr(args, flag)
        if v is not None:
            inf_flags += [f"--{flag}", str(v)]

    out = os.path.abspath(args.out_dir)
    os.makedirs(out, exist_ok=True)
    conv_dir = os.path.join(out, "converted")
    report_path = os.path.join(out, "convert_report.json")
    preds_dir = os.path.join(out, "preds")
    submission = os.path.join(out, "submission.txt")
    summary = {"pyth": args.pyth, "cfg": args.cfg}

    # 1. convert (+verify). A cached report only skips the stage if it
    # already contains what this invocation asks for (a report produced
    # under --skip_verify does not satisfy a verifying rerun).
    report = None
    if os.path.exists(report_path):
        report = json.load(open(report_path))
        if args.skip_verify or "verify" in report:
            print(f"[fire_drill] convert: {report_path} exists, skipping")
        else:
            report = None
    if report is None:
        cmd = ["tools/convert_checkpoint.py", "--pyth", args.pyth,
               "--cfg", args.cfg, "--out", conv_dir,
               "--report", report_path]
        if not args.skip_verify:
            cmd.append("--verify")
        _run("convert", cmd + args.opts)
        report = json.load(open(report_path))
    summary["convert"] = report.get("counts", {})
    orbax_path = report["orbax_path"]
    bad = (summary["convert"].get("shape_mismatched", 0)
           + summary["convert"].get("missing_in_ckpt", 0))
    if bad:
        print(f"[fire_drill] WARNING: {bad} tensors did not load cleanly "
              f"(see {report_path})", file=sys.stderr)
    if "verify" in report:
        summary["verify"] = report["verify"]
        if not report["verify"].get("ok", False):
            # the logit check is the drill's core safeguard: a converted
            # model that diverges from the torch oracle must not silently
            # produce a submission
            print(f"[fire_drill] FAILED: converted logits diverge from the "
                  f"torch oracle ({report['verify']})", file=sys.stderr)
            sys.exit(3)

    # 2. sliding-window scoring of every listed video
    done_marker = os.path.join(preds_dir, ".done")
    if os.path.exists(done_marker):
        print(f"[fire_drill] temporal_inf: {preds_dir} complete, skipping")
    else:
        _run("temporal_inf", [
            "tools/run_temporal_inf.py", "--cfg", args.cfg,
            "--video_lst", args.video_lst, "--video_path", args.video_path,
            "--out_dir", preds_dir, "--checkpoint", orbax_path,
            ] + inf_flags + ["TEST.CHECKPOINT_TYPE", "jax"] + args.opts)
        open(done_marker, "w").write("ok\n")
    summary["preds"] = sum(f.endswith(".pkl") for f in os.listdir(preds_dir))

    # 3. submission with the released thresholds
    _run("submission", [
        "tools/aicity_inf.py", preds_dir, args.thres_file, args.vid_csv,
        submission])
    n_lines = sum(1 for _ in open(submission))
    summary["submission"] = {"path": submission, "lines": n_lines}

    # 4. local F1 when a labeled split is available
    if args.anno_csv:
        cmd = [sys.executable, "tools/aicity_inf_graph.py", args.anno_csv,
               preds_dir, "--replace_thres_file", args.thres_file]
        print(f"[fire_drill] f1: {' '.join(cmd[1:])}", flush=True)
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        sys.stderr.write(r.stderr)
        if r.returncode != 0:
            sys.exit(r.returncode)
        for line in r.stdout.splitlines():
            if line.startswith("F1, precision, recall:"):
                f1, prec, rec = map(float, line.split(":")[1].split())
                summary["f1"] = f1
                summary["precision"] = prec
                summary["recall"] = rec

    print("[fire_drill] " + json.dumps(summary))
    if args.expect_f1 is not None:
        if summary.get("f1") is None:
            print("[fire_drill] --expect_f1 given but no F1 was computed "
                  "(pass --anno_csv)", file=sys.stderr)
            sys.exit(2)
        if summary["f1"] < args.expect_f1:
            print(f"[fire_drill] F1 {summary['f1']} < expected "
                  f"{args.expect_f1}", file=sys.stderr)
            sys.exit(2)


if __name__ == "__main__":
    main()
