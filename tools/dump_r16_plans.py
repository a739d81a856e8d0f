#!/usr/bin/env python3
"""Capture .explain("formatted") for the round-16-touched queries into
plans/r16/<query>_<tag>.txt (tag = before|after):

    python tools/dump_r16_plans.py before /root/repo/plans/r16
    python tools/dump_r16_plans.py after  /root/repo/plans/r16

Mutation queries (purge_*, mm_ingest_*) execute their store builds /
decision collects as a side effect of constructing the returned frame;
the captured plan is the SERVED final frame's — phase-level job-count
changes are documented in OPTIMIZATION_r16.md instead.
"""

from __future__ import annotations

import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: registry entries whose RETURNED frame carries the final served plan
NAMES = [
    "mm_ingest_incremental",
    "mm_ingest_pipeline",
    "purge_ann_index_streamed",
    "mv_hll_refresh",
    "mv_join_hll_refresh",
    "pagerank_supplier_orders",
    "dedup_clusters",
    "dedup_semantic_keep_best",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    tag, outdir = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)

    from oracle_to_snowflake_etl_spark.queries import queries
    from oracle_to_snowflake_etl_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name, df):
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh, redirect_stdout(fh):
            df.explain("formatted")
        print(f"wrote {path}")

    qs = queries()
    for name in NAMES:
        dump(name, qs[name](spark, SF_DIR))


if __name__ == "__main__":
    main()
