#!/usr/bin/env python3
"""DuckDB reference bench: run the registry's oracle SQL through
DuckDB at a given SF and report per-query + total seconds, side by side
with the engine's own timings (BENCH_DETAIL.json when present).
Default scope is the WHOLE registry (VERDICT r9 #7 — the 2x bar is
anchored registry-wide, not basket-wide); --priority-only restores the
50-slot basket scope.

Purpose (VERDICT r3 #5): BASELINE.md carries no reference timings, so the
"within 2x of baseline at the same sf" bar needs a concrete, locally
reproducible competitor. DuckDB is the strongest available single-node
one: same parquet inputs, same ANSI SQL the correctness gate already
trusts. Caveats recorded with the numbers in BASELINE.md:

  * DuckDB executes the ORACLE formulation; for queries whose engine
    implementation is deliberately non-SQL (streaming drains, iterative
    label propagation, brute-force-vs-LSH dedup) the oracle is often the
    SEMANTIC SPEC (e.g. an all-pairs join), not the efficient algorithm,
    so per-query ratios can swing both ways. The honest comparison is
    the scan-agg-join families; totals are still reported for context.
  * DuckDB is an embedded columnar engine with no distribution layer;
    Spark pays JVM/task-scheduling overhead per query that amortizes on
    a cluster. At sf0.1 both effects are visible.

Usage: python tools/duckdb_bench.py [--sf-dir DIR] [--runs N]
Writes DUCKDB_BENCH.json and prints one JSON line.
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--timeout", type=float, default=60.0,
                    help="per-run cap in seconds; a capped query records "
                         "the cap as a lower bound")
    ap.add_argument("--priority-only", action="store_true",
                    help="bench only the driver's 50-slot PRIORITY "
                         "basket (the pre-round-10 scope) instead of "
                         "every registry oracle")
    args = ap.parse_args()

    import duckdb

    from oracle_to_snowflake_etl_spark.queries import PRIORITY, oracle_sql
    from tests.harness import TESTDATA_TABLES

    oracles = oracle_sql()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{args.sf_dir}/{t}.parquet'")

    import threading

    names = PRIORITY if args.priority_only else list(oracles)
    timings: dict[str, float] = {}
    skipped: list[str] = []
    timed_out: list[str] = []
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            skipped.append(name)
            continue
        best = float("inf")
        for _ in range(args.runs):
            # several oracles are brute-force SEMANTIC SPECS (all-pairs
            # Jaccard etc.) that DuckDB cannot finish at sf0.1 — cap each
            # run and record the cap as a lower bound
            timer = threading.Timer(args.timeout, con.interrupt)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            except duckdb.Error:
                if name not in timed_out:
                    timed_out.append(name)
                best = min(best, float(args.timeout))
                break
            finally:
                timer.cancel()
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "duckdb_oracle_seconds",
        "value": total,
        "unit": "sec",
        "sf": float(os.path.basename(args.sf_dir.rstrip("/"))
                    .replace("sf", "") or 0.1),
        "n_queries": len(timings),
        "scope": "priority" if args.priority_only else "registry",
        "skipped_no_oracle": skipped,
        "timed_out_lower_bound": timed_out,
        "queries": timings,
    }
    with open(os.path.join(REPO, "DUCKDB_BENCH.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "unit", "sf", "n_queries")}))


if __name__ == "__main__":
    main()
