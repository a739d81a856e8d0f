#!/usr/bin/env python3
"""Scale evidence for the round-11 embedding operators over the derived
.scaledata corpora (the semantic_scale.py discipline: timings comparable
across decades of one run, not across hosts):

- ann_int8_topk: the quantized scan is O(N x |queries|) integer GEMM in
  one map pass + a skinny candidate shuffle, so its decade ratio should
  track the scan (~x5, x2 per step / parallelism slack).
- emb_cell_sample (cells=round(sqrt(N)) trained per decade, matching
  the semantic family's dial): one Arrow assignment pass + ONE shuffle
  on cell; decade ratio should also track the scan.

Usage: python tools/ann_scale.py [--dirs ...] [--out SCALE_ANN.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="*",
                    default=[os.path.join(REPO, ".scaledata", "sf10"),
                             os.path.join(REPO, ".scaledata", "sf50"),
                             os.path.join(REPO, ".scaledata", "sf100")])
    ap.add_argument("--fraction", type=float, default=0.25)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_ANN.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from oracle_to_snowflake_etl_spark.operators.similarity import (
        ann_int8_topk,
        emb_cell_sample,
        ivf_train_centroids,
    )
    from oracle_to_snowflake_etl_spark.session import get_spark
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    spark = get_spark("ann-scale")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for d in args.dirs:
        emb = load_table(spark, d, "embeddings")
        n = emb.count()
        cells = max(16, int(round(math.sqrt(n))))
        t0 = time.perf_counter()
        cents = ivf_train_centroids(emb, cells=cells)
        t_train = time.perf_counter() - t0

        q = emb.where(F.col("vec_id") < args.n_queries)
        t0 = time.perf_counter()
        n_ann = ann_int8_topk(emb, q, k=args.k).count()
        t_ann = time.perf_counter() - t0
        spark.catalog.clearCache()

        t0 = time.perf_counter()
        n_kept = emb_cell_sample(emb, args.fraction, cells=cells,
                                 centroids=cents).count()
        t_sample = time.perf_counter() - t0
        spark.catalog.clearCache()

        rows.append({"dir": d, "n": n, "cells": cells,
                     "t_train": round(t_train, 3),
                     "t_ann": round(t_ann, 3), "ann_rows": n_ann,
                     "t_sample": round(t_sample, 3), "kept": n_kept})
        print(f"{d:28s} n={n:>9,} cells={cells:>5} "
              f"train={t_train:6.2f}s ann={t_ann:6.2f}s ({n_ann} rows) "
              f"sample={t_sample:6.2f}s (keep {n_kept:,})", flush=True)

    for prev, cur in zip(rows, rows[1:]):
        for k in ("t_ann", "t_sample"):
            cur[f"ratio_{k[2:]}"] = round(cur[k] / max(prev[k], 1e-9), 2)
        print(f"{prev['dir']} -> {cur['dir']}: "
              f"ann x{cur['ratio_ann']}, sample x{cur['ratio_sample']}")

    with open(args.out, "w") as fh:
        json.dump({"fraction": args.fraction, "k": args.k,
                   "n_queries": args.n_queries, "rows": rows},
                  fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
