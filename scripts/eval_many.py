#!/usr/bin/env python
"""Evaluate several checkpoints of ONE architecture in a single process.

Thin loop over run_quality_eval.main: the jitted register fn is traced once
(same model class + shapes), so each additional checkpoint costs only the
12-pair device time (~40 s) instead of a fresh ~6 min compile — the tool for
picking a convergence point from a checkpoint series.

    python scripts/eval_many.py --out-dir /tmp/evals --pairs data_gen/test_pairs.txt \
        models_probs_r3/0060.npz models_probs_r3/0080.npz models_probs_r3/0100.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import run_quality_eval


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("models", nargs="+", help="checkpoints to evaluate")
    p.add_argument("--pairs", default="data_gen/test_pairs.txt")
    p.add_argument("--labels", default="/root/reference/data/labels.npz")
    p.add_argument("--out-dir", default="/tmp/evals")
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    for m in args.models:
        stem = os.path.splitext(os.path.basename(m))[0]
        out = os.path.join(args.out_dir, f"QUALITY_{stem}.json")
        print(f"===== {m} -> {out}", flush=True)
        run_quality_eval.main(["--model", m, "--pairs", args.pairs,
                               "--labels", args.labels, "--out", out])


if __name__ == "__main__":
    main()
