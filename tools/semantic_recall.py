#!/usr/bin/env python3
"""Measure semantic_dedup's cross-cell miss rate (VERDICT r8 #3) —
the one accepted recall trade in the repo that had a stated rationale
but no number.

Method: plant one true near-duplicate twin per corpus vector at
cos = 0.95 exactly (similarity.plant_near_dup_twins — the operating
point of an embedding dedup), then measure
similarity.semantic_pair_recall = the fraction of TRUE near-dup pairs
(quantized cosine >= threshold, brute-force ground truth) whose two
members land in the SAME trained cell, across cell-count geometries:

  - 16        the auto_cells floor (toy-corpus guard)
  - 64        the fixed IVF_CELLS default the pinned oracle mirrors
  - sqrt(N)   the cells="auto" / FAISS sizing the 100 TB story uses
  - 256       an over-partitioned point (finer cells = more splits)

1 - recall is exactly the pair mass SemDeDup forgoes by never
computing cross-cell pairs. Expected shape: recall falls as cells
rise (more boundaries) — the table quantifies the recall cost of the
N^1.5 work optimum so the trade is a number, not a sentence.

Results land in SCALE.md (semantic family section); the pytest floor
is tests/test_recall.py::test_semantic_pair_recall_floor.

Usage: python tools/semantic_recall.py
         [--dirs /root/testdata/sf0.01 /root/testdata/sf0.1]
         [--threshold-q6 350000] [--target-cos 0.95]
         [--out SEMANTIC_RECALL.json]
"""

from __future__ import annotations

import argparse
import json
import math
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="*",
                    default=["/root/testdata/sf0.01",
                             "/root/testdata/sf0.1"])
    ap.add_argument("--threshold-q6", type=int, default=350_000)
    ap.add_argument("--target-cos", type=float, default=0.95)
    ap.add_argument("--out", default="SEMANTIC_RECALL.json")
    args = ap.parse_args()

    from oracle_to_snowflake_etl_spark.operators.similarity import (
        plant_near_dup_twins, semantic_pair_recall)
    from oracle_to_snowflake_etl_spark.session import get_spark
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    spark = get_spark("semantic-recall")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for sf_dir in args.dirs:
        base = load_table(spark, sf_dir, "embeddings")
        corpus = plant_near_dup_twins(base, target_cos=args.target_cos)
        corpus = corpus.persist()
        n = corpus.count()
        sqrt_n = max(16, int(round(math.sqrt(n))))
        for label, cells, nprobe in [
                ("16", 16, 1), ("64", 64, 1),
                (f"sqrt(N)={sqrt_n}", sqrt_n, 1), ("256", 256, 1),
                # the recall buy-back dial (semantic_dedup nprobe=):
                ("64 nprobe=2", 64, 2), ("64 nprobe=4", 64, 4),
                ("256 nprobe=2", 256, 2)]:
            r = semantic_pair_recall(corpus,
                                     threshold_q6=args.threshold_q6,
                                     cells=cells, nprobe=nprobe)
            rec = {"sf_dir": sf_dir, "n_vectors": n, "cells": cells,
                   "nprobe": nprobe, "cells_label": label,
                   "threshold_q6": args.threshold_q6,
                   "target_cos": args.target_cos,
                   "pair_recall": round(r, 4),
                   "cross_cell_miss": round(1 - r, 4)}
            results.append(rec)
            print(f"{sf_dir} n={n} cells={label:>14}: "
                  f"recall={r:.4f} miss={1 - r:.4f}", flush=True)
        corpus.unpersist()

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
