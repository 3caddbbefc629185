#!/usr/bin/env python3
"""Text→video retrieval over saved ActionCLIP features
(equivalent of tools/inference_videotext.py)."""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--features", required=True,
                   help="pickle of (video_features [N, D], video_ids [N])")
    p.add_argument("--bpe_path", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--top_k", type=int, default=20)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from aicity_action_tpu.config import get_cfg, assert_and_infer_cfg
    from aicity_action_tpu.data.tokenizer import SimpleTokenizer, tokenize
    from aicity_action_tpu.engine.contrastive import ContrastiveState
    from aicity_action_tpu.models.build import build_model
    from aicity_action_tpu.pipeline.zeroshot import retrieve_videos_by_text
    from aicity_action_tpu.utils import checkpoint as cu

    cfg = get_cfg()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.checkpoint:
        cfg.TEST.CHECKPOINT_FILE_PATH = args.checkpoint
    cfg.MODEL.LOAD_VISUAL = False  # text encoder only
    cfg = assert_and_infer_cfg(cfg)

    module, params = build_model(cfg)
    state = ContrastiveState.create(params, optax.identity())
    state = cu.load_test_checkpoint(cfg, state)

    tok = SimpleTokenizer(args.bpe_path)

    @jax.jit
    def encode(tokens):
        return module.apply(
            {"params": state.params}, tokens, train=False,
            method=module.encode_text)

    def encode_text_fn(text):
        ids = tokenize(tok, [text], cfg.CONTRA.CONTEXT_LENGTH)
        return np.asarray(encode(jnp.asarray(ids)))[0]

    with open(args.features, "rb") as f:
        video_features, video_ids = pickle.load(f)

    ranked = retrieve_videos_by_text(
        args.query, video_features, video_ids, encode_text_fn, args.top_k)
    for vid, score in ranked:
        print(f"{vid}\t{score:.4f}")


if __name__ == "__main__":
    main()
