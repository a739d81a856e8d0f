"""Operator-level utilities shared by the dedup/similarity/text family."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input
    has fewer partitions.

    Expensive per-row compute (MinHash signatures, SimHash fingerprints,
    winnowing) over a small parquet file otherwise runs in 1-2 tasks and
    leaves the rest of the cluster idle. On a real 100 TB input the scan
    already has thousands of partitions and this is a no-op — the check
    is on the *plan*, no job is triggered.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
