#!/usr/bin/env python3
"""Measure per-query scaling sf0.1 -> sf1 (one decade) and flag
super-linear operators.

For each registry query: best-of-2 at sf0.1, then best-of-2 at the
derived sf1 (tools/make_scale_data.py), INTERLEAVED per query so slow
host-noise drift cancels in the ratio. Writes SCALE_SWEEP.json
{query: {t_small, t_large, ratio}} and prints the table sorted by
ratio. With 10x data on a 32-thread executor pool, a scan-bound
operator's ideal ratio is ~10/(spare parallelism) and anything paying
mostly the per-job scheduling floor sits near 1; ratios well above
~10-13 (linear x log slack) indicate accidental super-linear work and
get flagged.

Usage: python tools/scale_sweep.py [--small DIR] [--large DIR]
       [--only name ...] [--runs 2]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--large",
                    default=os.path.join(REPO, ".scaledata", "sf1"))
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_SWEEP.json"),
                    help="output JSON (e.g. SCALE_SWEEP2.json for the "
                         "second decade, so --only merges never mix "
                         "decades in one artifact)")
    args = ap.parse_args()

    from oracle_to_snowflake_etl_spark.queries import queries
    from oracle_to_snowflake_etl_spark.session import get_spark

    spark = get_spark("scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    if args.only:
        qs = {k: v for k, v in qs.items() if k in set(args.only)}

    def run_once(fn, sf_dir: str) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        return time.perf_counter() - t0

    def best_of(fn, sf_dir: str, name: str) -> float:
        best = float("inf")
        for _ in range(args.runs):
            best = min(best, run_once(fn, sf_dir))
            try:
                spark.catalog.dropTempView(name)
            except Exception:
                pass
            gc.collect()
            spark.catalog.clearCache()
        return best

    # warm both file indexes
    next(iter(qs.values()))(spark, args.small).count()
    next(iter(qs.values()))(spark, args.large).count()

    results: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        try:
            t_small = best_of(fn, args.small, name)
            t_large = best_of(fn, args.large, name)
            results[name] = {
                "t_small": round(t_small, 3), "t_large": round(t_large, 3),
                "ratio": round(t_large / t_small, 2)}
            print(f"{name:38s} {t_small:7.2f}s {t_large:8.2f}s "
                  f"x{t_large / t_small:6.2f}", flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"{name:38s} ERR {results[name]['err'][:120]}", flush=True)

    out = args.out
    if args.only and os.path.exists(out):
        # targeted re-measure: merge into the committed full sweep
        with open(out) as fh:
            prev = json.load(fh)
        merged = prev.get("results", {})
        merged.update(results)
        results = merged
    with open(out, "w") as fh:
        json.dump({"small": args.small, "large": args.large,
                   "runs": args.runs, "results": results}, fh, indent=1,
                  sort_keys=True)
    ok = [(n, r) for n, r in results.items() if "ratio" in r]
    ok.sort(key=lambda x: -x[1]["ratio"])
    print("\nworst scalers:")
    for n, r in ok[:15]:
        print(f"  {n:38s} x{r['ratio']:6.2f} "
              f"({r['t_small']:.2f}s -> {r['t_large']:.2f}s)")
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
