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
    ap.add_argument("--tight-disk", action="store_true",
                    help="zstd shuffle/spill + compressed RDD storage "
                         "blocks: ~2-3x less scratch disk at ~5-10%% CPU. "
                         "For third-decade (sf100) runs whose shuffle "
                         "spill exceeds local scratch — a cluster has "
                         "per-executor disk; this host has one volume. "
                         "Timings are then not comparable with "
                         "non-tight runs of the SAME artifact.")
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="override spark.sql.shuffle.partitions for the "
                         "whole sweep. The session default (=CPUs) sizes "
                         "partitions for the driver's sf0.1 gate data; a "
                         "third-decade corpus through the same 32 "
                         "partitions puts ~2M exploded documents in one "
                         "task and dies SparkOutOfMemory. Scaling "
                         "partition count with input is the cluster-"
                         "sizing move the session docstring promises "
                         "(AQE coalesces the small-side stages back "
                         "down, so the small leg pays only scheduling "
                         "noise).")
    ap.add_argument("--max-partition-bytes", type=int, default=None,
                    help="override spark.sql.files.maxPartitionBytes. "
                         "Derived single-file tables are zstd parquet "
                         "(~5-10x compression on text): the 128MB "
                         "default yields a handful of scan tasks each "
                         "decompressing GBs. 16-32MB restores scan "
                         "parallelism without touching the artifact.")
    ap.add_argument("--periodic-gc-seconds", type=int, default=None,
                    help="spark.cleaner.periodicGC.interval (default "
                         "30min). Shuffle files are deleted only when "
                         "the ContextCleaner sees their ShuffleDependency "
                         "collected by a DRIVER JVM GC — a 64g heap "
                         "under no memory pressure may not GC for the "
                         "whole sweep, so every leg's shuffle files "
                         "accumulate on the one local volume until the "
                         "disk fills (the sf100 failure mode). 60s "
                         "bounds the backlog to one leg's working set.")
    args = ap.parse_args()

    from oracle_to_snowflake_etl_spark.queries import queries
    from oracle_to_snowflake_etl_spark.session import get_spark

    extra = {}
    if args.tight_disk:
        extra.update({"spark.io.compression.codec": "zstd",
                      "spark.rdd.compress": "true"})
    if args.shuffle_partitions:
        extra["spark.sql.shuffle.partitions"] = str(args.shuffle_partitions)
    if args.max_partition_bytes:
        extra["spark.sql.files.maxPartitionBytes"] = str(
            args.max_partition_bytes)
    if args.periodic_gc_seconds:
        extra["spark.cleaner.periodicGC.interval"] = (
            f"{args.periodic_gc_seconds}s")
    extra = extra or None
    spark = get_spark("scale-sweep", extra_conf=extra)
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
            # Python gc drops the Py4J refs, but the shuffle FILES of
            # the leg just run are freed only after a DRIVER JVM GC
            # lets the ContextCleaner collect the ShuffleDependencies.
            # Force one between legs (outside the timed region) so a
            # large leg starts with the previous legs' scratch space
            # reclaimed instead of stacked under it on the one volume.
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        return best

    # JIT warm on the SMALL dir only (a full-query warm on the large
    # dir would be an entire extra large-scale execution — at sf100
    # that doubled wall-clock and scratch-disk peak); the large dir
    # just needs its FileIndex listed, which a plain count covers.
    next(iter(qs.values()))(spark, args.small).count()
    for f in sorted(os.listdir(args.large)):
        if f.endswith(".parquet"):
            spark.read.parquet(os.path.join(args.large, f)).count()

    out = args.out
    results: dict[str, dict] = {}
    if args.only and os.path.exists(out):
        # targeted re-measure: merge into the committed full sweep
        with open(out) as fh:
            results = json.load(fh).get("results", {})

    def flush_out() -> None:
        # write after EVERY query: a large-scale run that dies (OOM,
        # disk) keeps the rows already measured
        with open(out, "w") as fh:
            json.dump({"small": args.small, "large": args.large,
                       "runs": args.runs, "tight_disk": args.tight_disk,
                       "shuffle_partitions": args.shuffle_partitions,
                       "max_partition_bytes": args.max_partition_bytes,
                       "results": results}, fh, indent=1, sort_keys=True)

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
        flush_out()

    flush_out()
    ok = [(n, r) for n, r in results.items() if "ratio" in r]
    ok.sort(key=lambda x: -x[1]["ratio"])
    print("\nworst scalers:")
    for n, r in ok[:15]:
        print(f"  {n:38s} x{r['ratio']:6.2f} "
              f"({r['t_small']:.2f}s -> {r['t_large']:.2f}s)")
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
