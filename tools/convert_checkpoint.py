#!/usr/bin/env python3
"""Convert a reference ``.pyth`` checkpoint to an orbax checkpoint.

One-command fire drill for the released K700/aicity checkpoints
(reference format: ``{"model_state": state_dict, "epoch", ...}``,
`/root/reference/slowfast/utils/checkpoint.py:107-139`):

    python tools/convert_checkpoint.py \
        --pyth checkpoint.pyth \
        --cfg configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml \
        --out converted/ [--report report.json] [--verify]

Produces:
- an orbax checkpoint under ``<out>/checkpoints`` loadable by
  TEST.CHECKPOINT_FILE_PATH / TRAIN.CHECKPOINT_FILE_PATH,
- a per-tensor report (loaded / shape-mismatched / missing / skipped),
- with ``--verify``: a forward logit comparison of the converted model vs
  the SAME weights run through torch reference modules (requires torch and
  ``/root/reference`` importable; both are optional runtime deps).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aicity_action_tpu.config import (  # noqa: E402
    assert_and_infer_cfg, get_cfg,
)
from aicity_action_tpu.utils.convert import (  # noqa: E402
    convert_mvit_state_dict, load_torch_checkpoint, merge_with_model_params,
)


def convert(pyth: str, cfg, out_dir: str, report_path: str | None,
            verify: bool = False, verify_tol: float = 1e-3) -> dict:
    """Convert + report; returns the report dict."""
    import jax

    from aicity_action_tpu.engine.steps import TrainState
    from aicity_action_tpu.models.build import build_model_with_state
    from aicity_action_tpu.utils import checkpoint as cu

    ckpt = load_torch_checkpoint(pyth)
    sd = ckpt.get("model_state", ckpt)
    epoch = int(ckpt.get("epoch", 0))

    module, params, model_state = build_model_with_state(cfg)
    converted, skipped = convert_mvit_state_dict(sd)
    merged, loaded, mismatched, missing = merge_with_model_params(
        converted, params)

    report = {
        "pyth": pyth,
        "epoch": epoch,
        "n_source_tensors": len(sd),
        "loaded": sorted("/".join(k) for k in loaded),
        "shape_mismatched": [
            {"key": "/".join(k), "ckpt_shape": list(got),
             "model_shape": (list(want) if want else None)}
            for k, got, want in mismatched
        ],
        "missing_in_ckpt": sorted("/".join(k) for k in missing),
        "skipped_source_keys": sorted(skipped),
    }
    report["counts"] = {
        "loaded": len(loaded),
        "shape_mismatched": len(mismatched),
        "missing_in_ckpt": len(missing),
        "skipped_source_keys": len(skipped),
    }

    if verify:
        report["verify"] = _verify_logits(cfg, module, merged, model_state,
                                          sd, verify_tol)

    import optax

    state = TrainState.create(params, optax.identity(), model_state)
    state = state.replace(params=jax.tree.map(np.asarray, merged))
    path = cu.save_checkpoint(out_dir, state, max(epoch - 1, 0), cfg)
    report["orbax_path"] = path

    if report_path:
        with open(report_path, "w") as f:
            json.dump(report, f, indent=1)
    return report


def _verify_logits(cfg, module, params, model_state, sd, tol: float) -> dict:
    """Forward the converted model and a reference-torch oracle composed
    from the same state_dict; report the max logit difference."""
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    import torch
    from test_model_parity import TorchOracleMViT

    from aicity_action_tpu.models.mvit import build_mvit_spec

    spec = build_mvit_spec(cfg)
    oracle = TorchOracleMViT(cfg, spec).eval()
    # reference tensor names -> the oracle's own attribute names
    tensors = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        if k.startswith("patch_embed.proj."):
            k = "patch_proj." + k.rsplit(".", 1)[-1]
        elif k.startswith("head.projection."):
            k = "head_proj." + k.rsplit(".", 1)[-1]
        tensors[k] = torch.from_numpy(np.asarray(v))
    missing, unexpected = oracle.load_state_dict(tensors, strict=False)
    assert not missing, f"oracle params not covered: {missing[:5]}"
    rs = np.random.RandomState(0)
    x = rs.randn(1, cfg.DATA.NUM_FRAMES, cfg.DATA.TEST_CROP_SIZE,
                 cfg.DATA.TEST_CROP_SIZE, 3).astype(np.float32)
    with torch.no_grad():  # oracle is NCTHW; the model is channels-last
        ref = oracle(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    got = np.asarray(module.apply(
        {"params": params, **(model_state or {})},
        [jnp.asarray(x)], train=False), np.float32)
    diff = float(np.abs(got - ref).max())
    return {"max_logit_diff": diff, "tol": tol, "ok": bool(diff <= tol)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pyth", required=True)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--report", default=None)
    ap.add_argument("--verify", action="store_true",
                    help="logit-compare vs torch reference modules")
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    cfg = get_cfg()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.TPU.COMPUTE_DTYPE = "float32"  # conversion fidelity first
    cfg = assert_and_infer_cfg(cfg)
    cfg.OUTPUT_DIR = args.out

    report = convert(args.pyth, cfg, args.out, args.report,
                     verify=args.verify, verify_tol=args.tol)
    c = report["counts"]
    print(json.dumps({
        "loaded": c["loaded"],
        "shape_mismatched": c["shape_mismatched"],
        "missing_in_ckpt": c["missing_in_ckpt"],
        "skipped_source_keys": c["skipped_source_keys"],
        "orbax_path": report["orbax_path"],
        **({"verify": report["verify"]} if "verify" in report else {}),
    }))
    if report["counts"]["shape_mismatched"]:
        print("WARNING: shape mismatches (fine-tune partial load semantics);"
              " see --report for details", file=sys.stderr)


if __name__ == "__main__":
    main()
