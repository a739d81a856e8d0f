#!/usr/bin/env python3
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line with per-query seconds.

Each query is fully executed (results drained via a count over the
returned DataFrame after a write-free action) — not just planned.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_to_snowflake_etl_spark.queries import PRIORITY, queries  # noqa: E402
from oracle_to_snowflake_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    # Detail-artifact policy (VERDICT r6 #5, twice-burned): by default
    # the per-query detail goes to a RUN-STAMPED file under bench_runs/
    # (gitignored), so a driver or smoke run can never clobber the
    # committed clean BENCH_DETAIL.json. Updating the canonical artifact
    # is an explicit act: `python bench.py --detail`. `--out PATH`
    # overrides the destination entirely.
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write per-query detail JSON here (default: "
                         "bench_runs/bench_<utc-stamp>_sf<sf>.json)")
    ap.add_argument("--detail", action="store_true",
                    help="ALSO update the canonical BENCH_DETAIL.json "
                         "(the committed clean-run artifact)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = queries()
    # Warm the JVM + parquet footers once so timings measure query
    # execution, not session bootstrap.
    next(iter(qs.values()))(spark, sf_dir).count()

    # Floor calibration (PLANS.md: ±1.55x ambient host noise between
    # bench runs): time the cheapest possible 2-stage Spark job — a
    # parquet count() (served largely from footer metadata, so this
    # bounds per-job SCHEDULING latency, not a minimal data scan) —
    # best-of-3. Every per-query number in this run
    # carries this constant as its lower bound; round-over-round deltas
    # should be read as (query - floor_s), making host-noise shifts
    # attributable instead of looking like engine regressions.
    floor_path = os.path.join(sf_dir, "lineitem.parquet")

    def _measure_floor(runs: int = 3) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            spark.read.parquet(floor_path).count()
            best = min(best, time.perf_counter() - t0)
        return best

    floor_s = _measure_floor()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in sorted(qs.items()):
        # Best of 3 runs: steady-state per-query latency (first run can pay
        # one-time JIT/codegen compilation that a long-lived cluster
        # amortizes away; a third sample halves the odds a host-noise
        # spike lands on both observations of a query).
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # Drain every row (collect on limit-queries is tiny; count
            # forces full execution for the rest).
            df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        total += best
        # Streaming queries leave their memory-sink table registered;
        # drop it so 100+ queries don't accumulate result sets in the
        # driver heap (measured: late-bench timings inflate 2-4x under
        # that GC pressure).
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
        # Release dead DataFrame refs promptly: localCheckpoint blocks
        # (iterative queries) stay pinned in the block manager until
        # Python GC drops the py4j handles and the ContextCleaner runs —
        # without this, queries that FOLLOW an iterative one time 2-3x
        # slower under the leaked memory.
        gc.collect()
        # Invariant: no query may leak a cache into its successors'
        # timings (the round-3 lesson — two leaked MEMORY_AND_DISK
        # shingle caches inflated every later query ~1.4x). clearCache
        # drops catalog-tracked caches; localCheckpoint RDDs are
        # released asynchronously by the ContextCleaner after the
        # gc.collect above, so they are not asserted on here — the
        # catalog cache count must be zero, every query.
        spark.catalog.clearCache()
        n_cached = spark.sparkContext._jsc.getPersistentRDDs().size()
        if n_cached > 10:  # headroom for in-flight async cleanup only
            print(f"WARN {name}: {n_cached} persisted RDDs after clear",
                  file=sys.stderr)

    # Re-measure the floor after the sweep and keep the minimum: the
    # pre-pass can still be paying first-job codegen, and a floor ABOVE
    # the trivial queries' times would invert its meaning.
    floor_s = min(floor_s, _measure_floor())

    # Full per-query detail for local iteration.
    detail = {"total": round(total, 4), "sf": sf,
              "floor_s": round(floor_s, 4), "queries": timings}
    here = os.path.dirname(os.path.abspath(__file__))
    out = args.out
    if out is None:
        stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
        out = os.path.join(here, "bench_runs", f"bench_{stamp}_sf{sf}.json")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(f"detail -> {out}", file=sys.stderr)
    if args.detail:
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)

    # The driver captures only the final ~2000 chars of stdout, so the JSON
    # line must stay well under that. `value` totals ALL queries; the
    # per-query dict reports the PRIORITY (headline) subset — the same 50
    # queries the driver's oracle harness checks. Everything is in
    # BENCH_DETAIL.json.
    headline = {k: round(timings[k], 3) for k in PRIORITY if k in timings}
    # The metric line must ALWAYS emit (the driver parses it from the
    # stdout tail); if the per-query dict ever pushes it past the ~2000
    # char capture window, shed slowest-last entries instead of crashing
    # after all queries have already run.
    while True:
        line = json.dumps({
            "metric": "total_query_seconds",
            "value": round(total, 4),
            "unit": "sec",
            "queries": headline,
            "sf": sf,
            "n_queries": len(timings),
            "floor_s": round(floor_s, 4),
            "runs_per_query": 3,
        })
        if len(line) < 1900 or not headline:
            break
        headline.pop(next(iter(headline)))
    print(line)


if __name__ == "__main__":
    main()
