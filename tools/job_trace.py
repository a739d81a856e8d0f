#!/usr/bin/env python3
"""Per-job trace of a single registry query: job id, duration, stage
count, and description for every Spark job the query submits (guide §1
— decide WHERE the jobs go before touching anything). Job counts and
descriptions are noise-free under ambient host contention.

Usage: python tools/job_trace.py <query> [--sf-dir DIR]
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
    ap.add_argument("name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from oracle_to_snowflake_etl_spark.queries import queries
    from oracle_to_snowflake_etl_spark.session import get_spark

    spark = get_spark("job-trace")
    spark.sparkContext.setLogLevel("ERROR")
    store = spark.sparkContext._jsc.sc().statusStore()

    qs = queries()
    fn = qs[args.name]

    def job_ids() -> set[int]:
        it = store.jobsList(None).iterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next().jobId())
        return ids

    # warm (schema caches, JVM)
    from oracle_to_snowflake_etl_spark.sources.readers import load_table
    load_table(spark, args.sf_dir, "orders").count()

    for run in range(args.runs):
        before = job_ids()
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).count()
        dt = time.perf_counter() - t0
        after = job_ids()
        new = sorted(after - before)
        print(f"\n== {args.name} run {run}: {dt:.3f}s, {len(new)} jobs ==")
        it = store.jobsList(None).iterator()
        rows = []
        while it.hasNext():
            j = it.next()
            if j.jobId() not in (after - before):
                continue
            try:
                dur = (j.completionTime().get().getTime()
                       - j.submissionTime().get().getTime()) / 1000.0
            except Exception:
                dur = -1.0
            desc = ""
            try:
                d = j.description()
                if d.isDefined():
                    desc = str(d.get())
            except Exception:
                pass
            if not desc:
                desc = str(j.name())[:140]
            rows.append((j.jobId(), dur, j.numTasks(), desc[:140]))
        for jid, dur, ntasks, desc in sorted(rows):
            print(f"  job {jid:4d}  {dur:7.3f}s  {ntasks:4d} tasks  {desc}")
        try:
            spark.catalog.dropTempView(args.name)
        except Exception:
            pass
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
