#!/usr/bin/env python3
"""Wall-time decades for the PQ ANN family (VERDICT r14 ask #6):
SCALE_ANN_PQ.json previously measured BYTES AT REST only; this runs
the SCALE_ANN.json protocol (tools/ann_scale.py — derived .scaledata
corpora, best-of-2 within one session, decade ratios comparable only
within the run) for the 8-byte-code path so the storage claim has a
measured wall-time curve and a same-session crossover vs int8:

- ann_pq_topk: flat in-memory ADC scan (encode inside the kernel) —
  the unindexed baseline.
- ann_ivf_pq_topk over a write_pq_index store: probed-partition
  pruning x m-byte codes — the at-rest serving point.
- ann_ivf_int8_topk over a write_ivf_int8_index store built in the
  SAME session under the SAME centroids: the crossover comparison the
  storage trade buys into (PQ reads 8x fewer bytes but pays the ADC
  fold + a wider-error rescore; int8 pays 8x bytes for the exact-int
  GEMM).

Store bytes for both layouts are re-measured per decade, so the r14
bytes-only numbers stay reproducible inside the same file.

Usage: python tools/ann_pq_scale.py [--dirs ...] [--out SCALE_ANN_PQ.json]
"""

from __future__ import annotations

import argparse
import json
import math
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


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="*",
                    default=[os.path.join(REPO, ".scaledata", "sf10"),
                             os.path.join(REPO, ".scaledata", "sf50"),
                             os.path.join(REPO, ".scaledata", "sf100")])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=8)
    ap.add_argument("--nprobe", type=int, default=24)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "SCALE_ANN_PQ.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from oracle_to_snowflake_etl_spark.operators.similarity import (
        ann_ivf_int8_topk,
        ann_ivf_pq_topk,
        ann_pq_topk,
        ivf_train_centroids,
        pq_train_codebooks,
        write_ivf_int8_index,
        write_pq_index,
    )
    from oracle_to_snowflake_etl_spark.session import get_spark
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    spark = get_spark("ann-pq-scale")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for d in args.dirs:
        emb = load_table(spark, d, "embeddings")
        n = emb.count()
        cells = max(16, int(round(math.sqrt(n))))
        t0 = time.perf_counter()
        cents = ivf_train_centroids(emb, cells=cells)
        t_train = time.perf_counter() - t0
        t0 = time.perf_counter()
        books = pq_train_codebooks(emb)
        t_train_pq = time.perf_counter() - t0
        q = emb.where(F.col("vec_id") < args.n_queries)

        t_flat, n_flat = best_of(
            args.runs,
            lambda: ann_pq_topk(emb, q, k=args.k,
                                codebooks=books).count())
        spark.catalog.clearCache()

        tmp = tempfile.mkdtemp(prefix="ann_pq_scale_")
        pq_idx = tmp + "/pq"
        t0 = time.perf_counter()
        write_pq_index(emb, pq_idx, cells=cells, centroids=cents,
                       codebooks=books)
        t_build_pq = time.perf_counter() - t0
        bytes_pq = du(pq_idx)
        t_pq, n_pq = best_of(
            args.runs,
            lambda: ann_ivf_pq_topk(emb, q, k=args.k,
                                    nprobe=args.nprobe,
                                    index_path=pq_idx).count())
        spark.catalog.clearCache()

        i8_idx = tmp + "/i8"
        t0 = time.perf_counter()
        write_ivf_int8_index(emb, i8_idx, cells=cells, centroids=cents)
        t_build_i8 = time.perf_counter() - t0
        bytes_i8 = du(i8_idx)
        t_i8, n_i8 = best_of(
            args.runs,
            lambda: ann_ivf_int8_topk(emb, q, k=args.k,
                                      nprobe=args.nprobe,
                                      centroids=cents,
                                      index_path=i8_idx).count())
        shutil.rmtree(tmp, ignore_errors=True)
        spark.catalog.clearCache()

        rows.append({
            "dir": d, "n": n, "cells": cells, "nprobe": args.nprobe,
            "runs": args.runs,
            "t_train": round(t_train, 3),
            "t_train_pq": round(t_train_pq, 3),
            "t_pq_flat": round(t_flat, 3), "pq_flat_rows": n_flat,
            "t_build_pq": round(t_build_pq, 3), "bytes_pq": bytes_pq,
            "t_pq_indexed": round(t_pq, 3), "pq_rows": n_pq,
            "t_build_int8": round(t_build_i8, 3), "bytes_int8": bytes_i8,
            "t_int8_indexed": round(t_i8, 3), "int8_rows": n_i8,
        })
        print(f"{d:24s} n={n:>9,} cells={cells:>5} "
              f"pq_flat={t_flat:6.2f}s pq_idx={t_pq:6.2f}s "
              f"i8_idx={t_i8:6.2f}s "
              f"bytes pq/i8={bytes_pq/1e6:.1f}/{bytes_i8/1e6:.1f} MB",
              flush=True)

    for prev, cur in zip(rows, rows[1:]):
        for k in ("t_pq_flat", "t_pq_indexed", "t_int8_indexed"):
            cur[f"ratio_{k[2:]}"] = round(cur[k] / max(prev[k], 1e-9), 2)
        print(f"{prev['dir']} -> {cur['dir']}: "
              f"pq_flat x{cur['ratio_pq_flat']}, "
              f"pq_indexed x{cur['ratio_pq_indexed']}, "
              f"int8_indexed x{cur['ratio_int8_indexed']}")

    with open(args.out, "w") as fh:
        json.dump({"k": args.k, "n_queries": args.n_queries,
                   "nprobe": args.nprobe, "runs": args.runs,
                   "rows": rows}, fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
