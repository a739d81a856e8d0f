"""Range (interval-containment) join — the second join operator Spark's
surface lacks natively (with operators/asof.py).

point_in_interval_join(points, intervals): every (point, interval) pair
with start <= point < end. Spark plans a raw inequality join as
BroadcastNestedLoopJoin — O(n*m) compares and a broadcast that dies at
scale. The scalable construction is BUCKETING:

    interval -> explode to every coarse time bucket it overlaps
    point    -> its single bucket
    equi-join on bucket -> exact containment filter

Each (point, interval) pair meets EXACTLY once (a point lives in one
bucket), so no dedup pass is needed. Shuffle volume is
O(points + intervals x avg_buckets_per_interval); pick ``bucket_us``
near the typical interval length so that factor stays ~1-2. Skew only
if many intervals stack on one bucket — the same hot-window skew AQE's
skew-join split handles.

The blanket plan test (tests/test_plans.py
test_no_cartesian_or_nested_loop_joins) enforces that this never
regresses to a nested-loop plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floor_bucket(us: Column, bucket_us: int) -> Column:
    """Exact FLOOR division of epoch-µs to a bucket id (matches the
    oracle's ``//`` for pre-epoch values too)."""
    return ((us - ((us % bucket_us) + bucket_us) % bucket_us) / bucket_us) \
        .cast("long")


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           point_col: str, start_col: str, end_col: str,
                           bucket_minutes: int = 7 * 24 * 60) -> DataFrame:
    """Inner join of every point to every interval containing it
    (half-open: start <= point < end). Column sets are passed through
    from both inputs; overlapping intervals yield one row per match.
    """
    bucket_us = bucket_minutes * 60 * 1_000_000
    # cast("timestamp") handles TIMESTAMP_NTZ inputs (unix_micros needs
    # LTZ). Bucket ids only need CONSISTENCY between the two sides, not
    # absolute-epoch correctness: a session-timezone shift moves both
    # sides' buckets identically, and the exact containment filter below
    # compares the original columns.
    p_us = F.unix_micros(F.col(point_col).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence(_floor_bucket(s_us, bucket_us),
                             _floor_bucket(e_us - F.lit(1), bucket_us))))
    pt = points.withColumn("_bkt", _floor_bucket(p_us, bucket_us))
    return (pt.join(iv, "_bkt")
            .where((F.col(point_col) >= F.col(start_col))
                   & (F.col(point_col) < F.col(end_col)))
            .drop("_bkt"))
