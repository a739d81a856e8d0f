#!/usr/bin/env python3
"""Measure the gather/full-GEMM gate of the IVF int8 scan kernel on
cell-MIXED batches (VERDICT r12 Wrong #1): when Spark's file packing
stacks MANY small ``cell=`` directories into one task, the old
distinct-cell-count gate (<=16) forced the full N x Q GEMM + mask on
exactly the at-rest layout whose flops the per-cell gather was built to
cut. The round-13 kernel groups any batch by cell with one stable
argsort and gates on AVERAGE SLICE SIZE (rows per distinct cell); this
tool times both branches FORCED (the gate override rides the query
broadcast) on:

- an at-rest many-small-cells index (cells >> 16 per task after file
  packing — every batch is cell-contiguous, slices are the cell size),
- the self-contained in-memory form (random-mixed batches — slices are
  ~batch/cells rows, the regime where thousands of tiny sub-matmuls
  lose to one BLAS GEMM + mask),

and prints the observed rows/cell so ANN_GATHER_MIN_ROWS_PER_CELL can
be set from data. Timings are best-of-N within one process (the
semantic_scale.py discipline).

Usage: python tools/ann_mixed_bench.py [--dir .scaledata/sf100]
           [--cells 4096] [--n-queries 256] [--nprobe 96]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def best_of(n: int, fn) -> tuple[float, object]:
    best, out = float("inf"), None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, ".scaledata",
                                                  "sf100"))
    ap.add_argument("--cells", type=int, default=4096)
    ap.add_argument("--sample", type=int, default=8192)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=256)
    ap.add_argument("--nprobe", type=int, default=96)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "SCALE_ANN_MIXED.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from oracle_to_snowflake_etl_spark.operators.similarity import (
        ann_ivf_int8_topk,
        ivf_train_centroids,
        write_ivf_int8_index,
    )
    from oracle_to_snowflake_etl_spark.session import get_spark
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    spark = get_spark("ann-mixed-bench")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, args.dir, "embeddings")
    n = emb.count()
    t0 = time.perf_counter()
    cents = ivf_train_centroids(emb, cells=args.cells, sample=args.sample)
    t_train = time.perf_counter() - t0
    cells = len(cents)
    q = emb.where(F.col("vec_id") < args.n_queries)

    idx = tempfile.mkdtemp(prefix="ann_mixed_idx_") + "/index"
    t0 = time.perf_counter()
    write_ivf_int8_index(emb, idx, cells=cells, centroids=cents)
    t_build = time.perf_counter() - t0

    # forced branches: gather always (gate=1) vs full GEMM + mask
    # always (gate larger than any batch) vs the shipped default gate
    FORCE_GATHER, FORCE_FALLBACK = 1, 1 << 40
    variants = [("indexed", dict(index_path=idx)),
                ("inmemory", dict(index_path=None))]
    results = {"dir": args.dir, "n": n, "cells": cells,
               "nprobe": args.nprobe, "n_queries": args.n_queries,
               "runs": args.runs, "t_train": round(t_train, 3),
               "t_index_build": round(t_build, 3),
               "rows_per_cell_at_rest": round(n / cells, 1)}
    for label, kw in variants:
        for gname, gate in (("gather", FORCE_GATHER),
                            ("fallback", FORCE_FALLBACK),
                            ("default", None)):
            t, cnt = best_of(
                args.runs,
                lambda kw=kw, gate=gate: ann_ivf_int8_topk(
                    emb, q, k=args.k, nprobe=args.nprobe, cells=cells,
                    centroids=cents, gather_min_rows_per_cell=gate,
                    **kw).count())
            results[f"t_{label}_{gname}"] = round(t, 3)
            results[f"rows_{label}_{gname}"] = cnt
            print(f"{label:9s} {gname:9s} {t:7.2f}s  rows={cnt}",
                  flush=True)
            spark.catalog.clearCache()

    shutil.rmtree(os.path.dirname(idx), ignore_errors=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
