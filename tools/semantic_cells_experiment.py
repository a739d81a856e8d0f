#!/usr/bin/env python3
"""Buy (or bound) the semantic family's next decade (VERDICT r12 Next
#4): semantic_dedup's pair stage is Sum(|cell|^2) ≈ N²/cells, so at the
design dial cells=√N the 5M point rides the N^1.5 slope exactly (312 s,
SCALE_SEMANTIC7.json) and 20M extrapolates to ~40 min. This experiment
holds N=5M and sweeps the cell count ABOVE √N (cells ∝ N^0.55..0.6):
the quadratic term shrinks ∝ 1/cells while the probe-miss rate grows —
each row records (cells, wall, pair-recall) so the trade is measured,
not asserted.

Recall at 5M cannot use brute-force truth over the corpus. The derived
.scaledata corpora are 2000-row replicas of the sf0.1 embeddings at
sparse 1e7 id offsets whose cross-replica similarities are COLLAPSED
by construction (per-replica orthogonal sign flips,
make_scale_data.py), so every true near-dup pair lives inside a
replica and replica 0 IS the original corpus (vec_id < 2000; the
default --replica-max-id 20000 selects exactly it). Pair-recall is
therefore measured exactly on replica 0 — brute-force truth over its
vectors, visibility = sharing ANY probe cell under the FULL 5M
corpus's trained geometry at the same nprobe — i.e. the real
question: how many true pairs does the big-corpus cell partition let
the dedup see.

Usage: python tools/semantic_cells_experiment.py [--dir .scaledata/sf250]
           [--cells 2236 4800 10400] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, ".scaledata",
                                                  "sf250"))
    ap.add_argument("--cells", type=int, nargs="*",
                    default=[2236, 4800, 10400])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--threshold-q6", type=int, default=350_000)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--replica-max-id", type=int, default=20_000)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "SCALE_SEMANTIC_CELLS.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from oracle_to_snowflake_etl_spark.operators.similarity import (
        brute_force_pairs,
        ivf_probe_cells,
        ivf_train_centroids,
        semantic_dedup,
    )
    from oracle_to_snowflake_etl_spark.session import get_spark
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    spark = get_spark("semantic-cells")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, args.dir, "embeddings")
    n = emb.count()

    # brute-force truth over replica 0, computed ONCE (geometry-free)
    rep0 = emb.where(F.col("vec_id") < args.replica_max_id).persist()
    truth = brute_force_pairs(rep0, args.threshold_q6).persist()
    n_truth = truth.count()
    print(f"n={n:,} replica0={rep0.count():,} truth_pairs={n_truth:,}",
          flush=True)

    rows = []
    for cells in args.cells:
        t0 = time.perf_counter()
        cents = ivf_train_centroids(emb, cells=cells,
                                    sample=max(4096, 4 * cells))
        t_train = time.perf_counter() - t0

        best = float("inf")
        survivors = -1
        for _ in range(args.runs):
            t0 = time.perf_counter()
            survivors = semantic_dedup(
                emb, threshold_q6=args.threshold_q6, cells=cells,
                centroids=cents, nprobe=args.nprobe).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()

        assigned = rep0.select(
            F.col("vec_id").alias("_id"),
            ivf_probe_cells(F.col("embedding"), nprobe=args.nprobe,
                            cells=cells, centroids=cents).alias("_pc"))
        ca = assigned.select(F.col("_id").alias("doc_a"),
                             F.col("_pc").alias("ca"))
        cb = assigned.select(F.col("_id").alias("doc_b"),
                             F.col("_pc").alias("cb"))
        n_vis = (truth.join(ca, "doc_a").join(cb, "doc_b")
                 .where(F.arrays_overlap("ca", "cb")).count())
        recall = n_vis / n_truth if n_truth else 1.0
        rows.append({"n": n, "cells": cells, "nprobe": args.nprobe,
                     "t_train": round(t_train, 3),
                     "t_dedup": round(best, 3), "survivors": survivors,
                     "pair_recall_rep0": round(recall, 4),
                     "truth_pairs": n_truth})
        print(f"cells={cells:>6} train={t_train:6.1f}s "
              f"dedup={best:7.1f}s keep={survivors:,} "
              f"recall={recall:.4f}", flush=True)

    with open(args.out, "w") as fh:
        json.dump({"dir": args.dir, "runs": args.runs,
                   "threshold_q6": args.threshold_q6, "rows": rows},
                  fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
