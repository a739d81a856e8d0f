"""Incremental ("new rows only") load — the reference's only join, J1.

Reference semantics (insert_ads_data.py:30-31; oracle_to_snowflake.py:84-86):
left-join source against the target's key projection with an indicator, keep
``left_only``, i.e. a LEFT ANTI JOIN on the 4-column composite key. Re-runs
are idempotent: second run inserts 0 rows (oracle_to_snowflake.py:87).

Scale strategy (SURVEY.md §7.3): the target key set at 100 TB no longer
broadcasts. ``incremental_delta`` picks the join strategy:
  - small key set  -> broadcast hash anti-join (no shuffle of the big side)
  - large key set  -> shuffled sort-merge anti-join; AQE handles skew.
The broadcast hint is advisory — Spark ignores it if the side exceeds
``spark.sql.maxBroadcastTableSize`` limits, so the fallback is safe.
On a Delta/Iceberg table the same semantics are `MERGE WHEN NOT MATCHED
THEN INSERT`; this module is the pure-Spark strategy that needs no extra
table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import ADS_KEY_COLS

# Rough planner constant: broadcast the key set when its estimated row count
# is under this bound (4 key columns ≈ 40 B/row -> ~400 MB at 10M keys is
# too big; 2M keys ≈ 80 MB fits default executor memory comfortably).
BROADCAST_KEY_ROWS = 2_000_000


def incremental_delta(source: DataFrame, existing_keys: DataFrame,
                      key_cols: list[str] | None = None,
                      broadcast_threshold: int | None = None) -> DataFrame:
    """Rows of ``source`` whose composite key is absent from
    ``existing_keys`` (reference J1).

    ``existing_keys`` may be a full target table; it is pruned to the key
    columns before the join (the reference's manual column pruning at
    oracle_to_snowflake.py:78 — Catalyst would prune anyway, but pruning
    before a broadcast also shrinks the broadcast payload).
    """
    keys = key_cols or ADS_KEY_COLS
    pruned = existing_keys.select(*keys)
    threshold = BROADCAST_KEY_ROWS if broadcast_threshold is None else broadcast_threshold
    # Cheap cardinality probe; for a parquet/Delta target this is
    # metadata-only. At plan-build time we accept one count() action.
    if pruned.isStreaming is False and _estimate_rows(pruned) <= threshold:
        pruned = F.broadcast(pruned)
    return source.join(pruned, on=keys, how="left_anti")


def _estimate_rows(df: DataFrame) -> int:
    try:
        return df.count()
    except Exception:
        return 1 << 62  # unknown -> assume big, don't broadcast


def incremental_append(source: DataFrame, target_path: str,
                       key_cols: list[str] | None = None,
                       partition_by: list[str] | None = None) -> int:
    """Full J1+S7 pipeline against a parquet target dir: compute delta vs
    the current target, append it, return the appended row count (the
    reference logs this count at oracle_to_snowflake.py:87,112).

    First run (no target yet) appends everything.
    """
    spark = source.sparkSession
    keys = key_cols or ADS_KEY_COLS
    try:
        existing = spark.read.parquet(target_path).select(*keys)
        delta = incremental_delta(source, existing, keys)
    except Exception:  # AnalysisException: path does not exist
        delta = source
    # Persist the delta before counting+writing so the anti-join runs once.
    delta = delta.cache()
    n = delta.count()
    if n:
        w = delta.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target_path)
    delta.unpersist()
    return n
