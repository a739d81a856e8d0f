"""Slowly-changing-dimension (SCD type 2) versioning from a changelog.

The warehouse pattern the reference's truncate-reload refresh
(SURVEY.md §2.1 S11) cannot express: keep EVERY historical state of a
dimension row with validity intervals, so facts join to the attribute
values that were true at event time.

    changelog (key, ts, attrs...)  ->  (key, attrs..., valid_from,
                                        valid_to)   [valid_to NULL = current]

Built from two window passes over the change stream — no self-joins:
  1. change compression: drop rows whose tracked attributes equal the
     previous row's (lag over (key) ordered by (ts, tiebreak));
  2. interval assembly: valid_to = lead(valid_from) over the surviving
     rows.
Both passes share one partitioning (the key), so the whole operator is
a single shuffle; at 100 TB the changelog is processed partition-
parallel per key with no state beyond the window frame. The tiebreak
column is required, not optional — equal-timestamp changes otherwise
version nondeterministically (the as-of join lesson from round 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(df: DataFrame, key: str, ts_col: str,
                        tiebreak: str, attr_cols: list[str],
                        compress: bool = True) -> DataFrame:
    """Versioned dimension rows from a change stream. Emits validity
    bounds as epoch-µs longs (``valid_from_us``, ``valid_to_us``;
    NULL valid_to = current row)."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    cur = df
    if compress:
        changed = F.lit(False)
        for c in attr_cols:
            changed = changed | ~F.col(c).eqNullSafe(
                F.lag(F.col(c)).over(w))
        first = F.lag(F.col(ts_col)).over(w).isNull()
        cur = (df.withColumn("_keep", first | changed)
               .where(F.col("_keep")).drop("_keep"))
    w2 = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    vf = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (cur.select(key, *attr_cols, vf.alias("valid_from_us"),
                       F.col(tiebreak).alias("_tb"), F.col(ts_col).alias("_ts"))
            .withColumn("valid_to_us",
                        F.lead("valid_from_us").over(
                            Window.partitionBy(key).orderBy("_ts", "_tb")))
            .drop("_tb", "_ts"))
