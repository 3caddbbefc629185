#!/usr/bin/env python3
"""Zero-shot classification over saved multi-dataset predictions
(equivalent of tools/inference_zeroshot_cls.py)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("query")
    p.add_argument("dataset_config", help="json with dataset_class_embeddings,"
                   " dataset_vocab_files, dataset_pred_files")
    p.add_argument("pred_path")
    p.add_argument("cls_emb_path")
    p.add_argument("word_emb_file")
    p.add_argument("vocab_path")
    p.add_argument("anno_path", help="file with one video id per line")
    p.add_argument("output_file")
    p.add_argument("--emb_dim", default=300, type=int)
    p.add_argument("--min_simi", default=0.6, type=float)
    p.add_argument("--top_k_cls", default=10, type=int)
    p.add_argument("--top_k_videos", default=20, type=int)
    args = p.parse_args()

    from aicity_action_tpu.pipeline import zeroshot as zs

    cfg = json.load(open(args.dataset_config))
    word_emb = zs.load_word_embeddings(args.word_emb_file)
    q_emb = zs.embed_query(zs.query_words(args.query), word_emb, args.emb_dim)

    class_embs, class_names, preds = {}, {}, {}
    for ds, emb_file in cfg["dataset_class_embeddings"].items():
        class_embs[ds] = np.load(os.path.join(args.cls_emb_path, emb_file))
        vocab_file = os.path.join(args.vocab_path,
                                  cfg["dataset_vocab_files"][ds])
        class_names[ds] = [ln.strip() for ln in open(vocab_file)]
        preds[ds] = np.load(
            os.path.join(args.pred_path, cfg["dataset_pred_files"][ds]))

    kept, weights = zs.class_weights_for_query(
        q_emb, class_embs, class_names,
        min_simi=args.min_simi, top_k_cls=args.top_k_cls)
    print("matched classes:")
    for cid, simi, name, ds, _ in kept:
        print(f"  {cid} ({name}, {ds}): {simi:.3f}")

    fused = zs.fuse_predictions(preds, weights)
    video_ids = [ln.strip() for ln in open(args.anno_path) if ln.strip()]
    ranked = zs.rank_videos(fused, video_ids, args.top_k_videos)
    with open(args.output_file, "w") as f:
        for vid, score in ranked:
            f.write(f"{vid} {score:.6f}\n")
    print(f"wrote top-{len(ranked)} videos to {args.output_file}")


if __name__ == "__main__":
    main()
