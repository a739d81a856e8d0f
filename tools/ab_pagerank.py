#!/usr/bin/env python3
"""Interleaved A/B of pagerank_int's iteration-partition sizing rules.

Round-4 changed graph.py's partition sizing from a defaultParallelism
floor to an edge-count-derived rule, and the committed bench moved
2.93s -> 3.97s — inside the documented ~1.55x host-noise band, but the
only code-change suspect. This script settles it the only way host
noise allows: ALTERNATING runs of each candidate within one session
(noise hits all arms equally), best-of-N per arm, full drain per run.

Usage: python tools/ab_pagerank.py [--sf-dir DIR] [--rounds N]
Writes nothing; prints a table to paste into PLANS.md.
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

    spark = get_spark("ab-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    dp = spark.sparkContext.defaultParallelism

    def edges():
        li = load_table(spark, args.sf_dir, "lineitem").where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
        fwd = (li.select((F.col("l_orderkey") * 2).alias("src"),
                         (F.col("l_suppkey") * 2 + 1).alias("dst"))
               .distinct())
        return fwd.unionByName(fwd.select(F.col("dst").alias("src"),
                                          F.col("src").alias("dst")))

    n_edges = edges().count()
    arms: dict[str, int | None] = {
        "edge-derived(r4)": None,  # max(4, n_edges//250k+1)
        f"defaultParallelism(r3)={dp}": dp,
        "fixed-8": 8,
        "fixed-16": 16,
    }
    print(f"sf_dir={args.sf_dir} n_edges={n_edges} "
          f"edge-derived n_parts={max(4, min(1024, n_edges // 250_000 + 1))}")

    best: dict[str, float] = {k: float("inf") for k in arms}
    times: dict[str, list[float]] = {k: [] for k in arms}
    # warm
    pagerank_int(edges(), iterations=3).count()
    for r in range(args.rounds):
        for name, np_ in arms.items():
            t0 = time.perf_counter()
            (pagerank_int(edges(), iterations=3, n_parts=np_)
             .orderBy(F.desc("rank_q"), F.asc("node")).limit(20).count())
            dt = time.perf_counter() - t0
            times[name].append(dt)
            best[name] = min(best[name], dt)
            spark.catalog.clearCache()
        print(f"round {r}: " + "  ".join(
            f"{k}={times[k][-1]:.2f}s" for k in arms), flush=True)

    print("\n| arm | best | median | all |")
    print("|---|---|---|---|")
    for k in arms:
        ts = sorted(times[k])
        med = ts[len(ts) // 2]
        print(f"| {k} | {best[k]:.2f}s | {med:.2f}s | "
              + " ".join(f"{t:.2f}" for t in times[k]) + " |")


if __name__ == "__main__":
    main()
