#!/usr/bin/env python3
"""Measure the streamed serving-index layout end to end at scale:
maintain_ann_index_stream folds N batches into batch=/cell= subdirs, so
a probed scan over the streamed store opens (batches x probed cells)
directories where the flat write_ivf_int8_index layout opens (probed
cells). This tool pins three numbers at one corpus:

- per-batch fold cost (expect ~flat per equal-size batch — the append
  contract on the streaming path),
- probed-query wall over the STREAMED store vs the FLAT store (the
  read penalty of batch fragmentation),
- flatten_streamed_ann_index cost + the query wall after flattening
  (expect == flat; the retirement fold pays once what every query
  would otherwise pay in extra directory opens).

Usage: python tools/ann_stream_bench.py [--dir .scaledata/sf100]
           [--batches 10] [--nprobe 24]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, ".scaledata",
                                                  "sf100"))
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=8)
    ap.add_argument("--nprobe", type=int, default=24)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "SCALE_ANN_STREAM.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from oracle_to_snowflake_etl_spark.operators.similarity import (
        ann_ivf_int8_topk,
        flatten_streamed_ann_index,
        ivf_train_centroids,
        write_ivf_int8_index,
    )
    from oracle_to_snowflake_etl_spark.session import get_spark
    from oracle_to_snowflake_etl_spark.sources.readers import load_table
    from oracle_to_snowflake_etl_spark.streaming.jobs import (
        maintain_ann_index_stream,
    )

    spark = get_spark("ann-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, args.dir, "embeddings")
    n = emb.count()
    cells = max(16, int(round(math.sqrt(n))))
    cents = ivf_train_centroids(emb, cells=cells)
    q = emb.where(F.col("vec_id") < args.n_queries)

    work = tempfile.mkdtemp(prefix="ann_stream_bench_")
    src = work + "/src"
    emb.repartition(args.batches).write.parquet(src)
    streamed, ckp = work + "/streamed", work + "/ckp"
    flat, folded = work + "/flat", work + "/folded"

    t0 = time.perf_counter()
    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    sq = maintain_ann_index_stream(stream, streamed, ckp, centroids=cents)
    sq.awaitTermination(1800)
    t_stream = time.perf_counter() - t0

    t0 = time.perf_counter()
    write_ivf_int8_index(emb, flat, cells=cells, centroids=cents)
    t_flat_build = time.perf_counter() - t0

    t_q_streamed, n1 = best_of(args.runs, lambda: ann_ivf_int8_topk(
        emb, q, k=args.k, nprobe=args.nprobe, centroids=cents,
        index_path=streamed).count())
    t_q_flat, n2 = best_of(args.runs, lambda: ann_ivf_int8_topk(
        emb, q, k=args.k, nprobe=args.nprobe, centroids=cents,
        index_path=flat).count())

    t0 = time.perf_counter()
    n_fold = flatten_streamed_ann_index(spark, streamed, folded)
    t_fold = time.perf_counter() - t0
    t_q_folded, n3 = best_of(args.runs, lambda: ann_ivf_int8_topk(
        emb, q, k=args.k, nprobe=args.nprobe, centroids=cents,
        index_path=folded).count())

    same = (n1 == n2 == n3)
    out = {"dir": args.dir, "n": n, "cells": cells,
           "batches": args.batches, "nprobe": args.nprobe,
           "runs": args.runs,
           "t_stream_fold_total": round(t_stream, 3),
           "t_stream_fold_per_batch": round(t_stream / args.batches, 3),
           "t_flat_build": round(t_flat_build, 3),
           "t_query_streamed": round(t_q_streamed, 3),
           "t_query_flat": round(t_q_flat, 3),
           "t_flatten": round(t_fold, 3), "rows_folded": n_fold,
           "t_query_folded": round(t_q_folded, 3),
           "results_identical": same}
    print(json.dumps(out, indent=1, sort_keys=True))
    assert same, "streamed/flat/folded stores returned different rows"
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    shutil.rmtree(work, ignore_errors=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
