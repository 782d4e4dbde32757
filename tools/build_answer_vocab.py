#!/usr/bin/env python
"""Build an answer vocabulary (ans2label json) for open-ended video QA.

The offline companion of the reference's ``ans2label`` input to
``HDVILAVideoQADataset`` (``hd-vila/src/datasets/dataset_video_qa.py:37``):
counts answers over train annotation rows and keeps the top-K as
{answer: index}. Rows outside the vocab evaluate as always-wrong, matching
the reference's treatment of rare answers.

Usage:
    python tools/build_answer_vocab.py train.jsonl --out ans2label.json --top_k 1500
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xpretrain_tpu.utils.basic import load_json, load_jsonl, save_json  # noqa: E402


def build_vocab(rows, top_k: int = 1500, answer_key: str = "answer") -> dict[str, int]:
    counts = collections.Counter(
        str(r[answer_key]) for r in rows if r.get(answer_key) is not None
    )
    return {ans: i for i, (ans, _) in enumerate(counts.most_common(top_k))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("annotation")
    ap.add_argument("--out", required=True)
    ap.add_argument("--top_k", type=int, default=1500)
    ap.add_argument("--answer_key", default="answer")
    args = ap.parse_args()
    rows = (
        load_jsonl(args.annotation)
        if args.annotation.endswith("jsonl")
        else load_json(args.annotation)
    )
    vocab = build_vocab(rows, args.top_k, args.answer_key)
    save_json(vocab, args.out, pretty=True)
    print(f"wrote {len(vocab)} answers -> {args.out}")


if __name__ == "__main__":
    main()
