#!/usr/bin/env python3
"""Interleaved A/B of pagerank_int's localCheckpoint cadence (VERDICT
r15 #6): checkpoint every round (r5 rule) vs every 2nd / 3rd round.
Same methodology as tools/ab_pagerank.py — alternating arms in one
session, full drain, result-set equality asserted across arms.

Usage: python tools/ab_pagerank_ckpt.py [--sf-dir DIR] [--rounds N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from oracle_to_snowflake_etl_spark.operators.graph import pagerank_int
    from oracle_to_snowflake_etl_spark.session import get_spark
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    spark = get_spark("ab-pagerank-ckpt")
    spark.sparkContext.setLogLevel("ERROR")

    def edges():
        li = load_table(spark, args.sf_dir, "lineitem").where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
        fwd = (li.select((F.col("l_orderkey") * 2).alias("src"),
                         (F.col("l_suppkey") * 2 + 1).alias("dst"))
               .distinct())
        return fwd.unionByName(fwd.select(F.col("dst").alias("src"),
                                          F.col("src").alias("dst")))

    arms = {"ckpt-every-1(r5)": 1, "ckpt-every-2": 2, "ckpt-every-3": 3}
    results: dict[str, list] = {}
    times: dict[str, list[float]] = {k: [] for k in arms}
    pagerank_int(edges(), iterations=3).count()  # warm
    for r in range(args.rounds):
        for name, ce in arms.items():
            t0 = time.perf_counter()
            rows = (pagerank_int(edges(), iterations=3,
                                 checkpoint_every=ce)
                    .orderBy(F.desc("rank_q"), F.asc("node"))
                    .limit(20).collect())
            times[name].append(time.perf_counter() - t0)
            results.setdefault(name, [tuple(x) for x in rows])
            assert results[name] == [tuple(x) for x in rows]
            spark.catalog.clearCache()
        print(f"round {r}: " + "  ".join(
            f"{k}={times[k][-1]:.2f}s" for k in arms), flush=True)
    first = next(iter(results.values()))
    assert all(v == first for v in results.values()), "arms disagree!"
    print("result sets identical across arms")
    print("\n| arm | best | median | all |")
    print("|---|---|---|---|")
    for k in arms:
        ts = sorted(times[k])
        print(f"| {k} | {ts[0]:.2f}s | {ts[len(ts) // 2]:.2f}s | "
              + " ".join(f"{t:.2f}" for t in times[k]) + " |")


if __name__ == "__main__":
    main()
