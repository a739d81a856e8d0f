#!/usr/bin/env python3
"""Measure append_ivf_int8_index's cost contract (VERDICT r12 Missing
#1 done-criterion): appending a batch into an at-rest int8 index must
cost ∝ BATCH, never ∝ index — the failure mode it replaces is the full
rebuild, whose cost is measured ∝ N (t_index_build 20.7 -> 55.1 s
across 200k -> 2M, SCALE_ANN.json).

Two sweeps in one process (same-host-window discipline):
- fixed batch (sf10's first --batch-n vectors, id-offset so they are
  new rows) appended onto indexes of 200k / 1M / 2M vectors — append
  wall should be FLAT while the index decade grows;
- batch of 0.5x / 1x / 2x the base batch size onto the 2M index —
  append wall should track the batch size.

Also times compact_ivf_int8_index after the appends (∝ fragmented
cells' data).

Usage: python tools/ann_append_bench.py [--batch-n 50000]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dirs", nargs="*",
                    default=[os.path.join(REPO, ".scaledata", "sf10"),
                             os.path.join(REPO, ".scaledata", "sf50"),
                             os.path.join(REPO, ".scaledata", "sf100")])
    ap.add_argument("--batch-dir",
                    default=os.path.join(REPO, ".scaledata", "sf10"))
    ap.add_argument("--batch-n", type=int, default=50_000)
    ap.add_argument("--cells", type=int, default=1024)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "SCALE_ANN_APPEND.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from oracle_to_snowflake_etl_spark.operators.similarity import (
        append_ivf_int8_index,
        compact_ivf_int8_index,
        ivf_train_centroids,
        write_ivf_int8_index,
    )
    from oracle_to_snowflake_etl_spark.session import get_spark
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    spark = get_spark("ann-append-bench")
    spark.sparkContext.setLogLevel("ERROR")

    batch_src = load_table(spark, args.batch_dir, "embeddings")

    # id-offset far above any corpus id: appended rows are NEW. The
    # derived corpora are 2000-row replicas at sparse 1e7 id offsets
    # (make_scale_data.py), so size the batch by limit, not an id range
    def batch_of(n):
        return (batch_src.limit(n)
                .withColumn("vec_id", F.col("vec_id") + F.lit(1 << 40)))

    rows = []
    last_idx = None
    for d in args.index_dirs:
        emb = load_table(spark, d, "embeddings")
        n = emb.count()
        cents = ivf_train_centroids(emb, cells=args.cells,
                                    sample=4 * args.cells)
        idx = tempfile.mkdtemp(prefix="ann_append_idx_") + "/index"
        t0 = time.perf_counter()
        write_ivf_int8_index(emb, idx, cells=args.cells, centroids=cents)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_app = append_ivf_int8_index(batch_of(args.batch_n), idx)
        t_append = time.perf_counter() - t0
        rows.append({"kind": "fixed_batch_vs_index_size", "dir": d,
                     "index_n": n, "batch_n": n_app,
                     "t_index_build": round(t_build, 3),
                     "t_append": round(t_append, 3)})
        print(f"index={n:>9,} build={t_build:6.2f}s "
              f"append({n_app:,})={t_append:6.2f}s", flush=True)
        if d == args.index_dirs[-1]:
            last_idx = idx
        else:
            shutil.rmtree(os.path.dirname(idx), ignore_errors=True)

    # batch-size sweep onto the largest index (already holds 1 append)
    for mult in (0.5, 2.0):
        bn = int(args.batch_n * mult)
        t0 = time.perf_counter()
        n_app = append_ivf_int8_index(
            batch_of(bn).withColumn(
                "vec_id", F.col("vec_id") + F.lit(1 << 41)), last_idx)
        t_append = time.perf_counter() - t0
        rows.append({"kind": "batch_size_vs_append", "dir": "sf100",
                     "batch_n": n_app, "t_append": round(t_append, 3)})
        print(f"batch={n_app:>9,} append={t_append:6.2f}s", flush=True)

    t0 = time.perf_counter()
    n_comp = compact_ivf_int8_index(spark, last_idx, max_files_per_cell=1)
    t_comp = time.perf_counter() - t0
    rows.append({"kind": "compaction", "dir": "sf100",
                 "cells_compacted": n_comp, "t_compact": round(t_comp, 3)})
    print(f"compact cells={n_comp} t={t_comp:6.2f}s", flush=True)
    shutil.rmtree(os.path.dirname(last_idx), ignore_errors=True)

    with open(args.out, "w") as fh:
        json.dump({"cells": args.cells, "batch_n": args.batch_n,
                   "rows": rows}, fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
