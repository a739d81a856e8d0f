#!/usr/bin/env python3
"""One-pass census of every registry query: wall seconds AND Spark job
count (guide §1 "measure first" under ambient host noise — job count is
the noise-free proxy for scheduling-constant-dominated queries at bench
scale). Writes tools-local JSON; prints the top offenders.

Usage: python tools/job_census.py [--sf-dir DIR] [--out PATH]
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/job_census.json")
    args = ap.parse_args()

    from oracle_to_snowflake_etl_spark.queries import queries
    from oracle_to_snowflake_etl_spark.session import get_spark

    spark = get_spark("job-census")
    spark.sparkContext.setLogLevel("ERROR")
    store = spark.sparkContext._jsc.sc().statusStore()

    def jobs() -> int:
        return store.jobsList(None).size()

    qs = queries()
    next(iter(qs.values()))(spark, args.sf_dir).count()  # warm

    out: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        t0, j0 = time.perf_counter(), jobs()
        try:
            fn(spark, args.sf_dir).count()
            out[name] = {"s": round(time.perf_counter() - t0, 3),
                         "jobs": jobs() - j0}
        except Exception as exc:  # noqa: BLE001
            out[name] = {"s": -1.0, "jobs": -1,
                         "err": f"{type(exc).__name__}: {exc}"[:200]}
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
        gc.collect()
        spark.catalog.clearCache()

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    total_j = sum(v["jobs"] for v in out.values() if v["jobs"] > 0)
    total_s = sum(v["s"] for v in out.values() if v["s"] > 0)
    print(f"total: {total_s:.1f}s {total_j} jobs over {len(out)} queries")
    top = sorted(out.items(), key=lambda kv: -kv[1]["jobs"])[:40]
    for k, v in top:
        print(f"{v['jobs']:5d} jobs {v['s']:8.3f}s  {k}")


if __name__ == "__main__":
    main()
