#!/usr/bin/env python3
"""Residual-vs-raw PQ recall at scale on a CLUSTERED corpus — the
regime residual encoding (IVFADC) exists for. The .scaledata corpora
are near-orthogonal random vectors (residual ≈ raw there, measured
parity in SCALE.md), so this generates a deterministic clustered
corpus — K unit centers, Gaussian spread σ, renormalized — at each
size, trains shared per-size geometry (√N cells), and measures
recall@10 vs brute-force ground truth for:

  - raw-PQ IVF (write-free in-memory composed scan),
  - residual-PQ IVF (same centroids, residual codebooks),
  - int8 IVF (the 4x-bytes alternative, same probe sets),

at rescore 3 and 10. Ground truth is brute_force_topk over the same
frame. Everything is fixed-seed numpy → deterministic artifact.

Usage: python tools/ann_residual_recall.py [--sizes 200000 ...]
Writes SCALE_ANN_RESIDUAL.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="*", type=int,
                    default=[200_000, 1_000_000])
    ap.add_argument("--clusters", type=int, default=256)
    ap.add_argument("--sigma", type=float, default=0.15)
    ap.add_argument("--n-queries", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "SCALE_ANN_RESIDUAL.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from oracle_to_snowflake_etl_spark.operators.similarity import (
        ann_ivf_int8_topk,
        ann_ivf_pq_topk,
        brute_force_topk,
        ivf_train_centroids,
        pq_train_codebooks,
    )
    from oracle_to_snowflake_etl_spark.session import get_spark

    spark = get_spark("ann-residual-recall")
    spark.sparkContext.setLogLevel("ERROR")
    d = 64
    rows_out = []
    for n in args.sizes:
        rng = np.random.default_rng(42)
        centers = rng.standard_normal((args.clusters, d))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        lab = rng.integers(0, args.clusters, n)
        X = centers[lab] + args.sigma * rng.standard_normal((n, d))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        emb = spark.createDataFrame(
            [(int(i), [float(x) for x in X[i]]) for i in range(n)],
            "vec_id long, embedding array<float>")
        emb = emb.repartition(32).persist()
        emb.count()
        q = emb.where(F.col("vec_id") < args.n_queries)
        cells = max(16, int(round(math.sqrt(n))))
        cents = ivf_train_centroids(emb, cells=cells)
        books_raw = pq_train_codebooks(emb)
        books_res = pq_train_codebooks(emb, residual_centroids=cents)

        def pairs(df):
            return {(r.query_id, r.neighbor_id) for r in df.collect()}

        truth = pairs(brute_force_topk(emb, q, k=args.k))
        row = {"n": n, "cells": cells, "clusters": args.clusters,
               "sigma": args.sigma, "n_queries": args.n_queries}
        for rs in (3, 10):
            raw = pairs(ann_ivf_pq_topk(emb, q, k=args.k, rescore=rs,
                                        centroids=cents,
                                        codebooks=books_raw))
            res = pairs(ann_ivf_pq_topk(emb, q, k=args.k, rescore=rs,
                                        centroids=cents,
                                        codebooks=books_res,
                                        residual=True))
            i8 = pairs(ann_ivf_int8_topk(emb, q, k=args.k, rescore=rs,
                                         centroids=cents))
            row[f"recall_pq_raw_r{rs}"] = round(
                len(raw & truth) / len(truth), 4)
            row[f"recall_pq_residual_r{rs}"] = round(
                len(res & truth) / len(truth), 4)
            row[f"recall_int8_r{rs}"] = round(
                len(i8 & truth) / len(truth), 4)
        emb.unpersist()
        rows_out.append(row)
        print(row, flush=True)

    with open(args.out, "w") as fh:
        json.dump({"k": args.k, "rows": rows_out}, fh, indent=1,
                  sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
