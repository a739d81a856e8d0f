"""Operator-level utilities shared by the dedup/similarity/text family."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_pairs(banded: DataFrame, bucket_cols: list[str],
                 member_cols: list[str], dedup: bool = True) -> DataFrame:
    """All intra-bucket pairs: groupBy bucket -> collect members ->
    explode the i<j combinations. Output columns: ``{c}_a``/``{c}_b``
    for each member column, pairs deduped on the first member column.
    ``dedup=False`` keeps one row per (pair, bucket) co-occurrence —
    callers that need the co-occurrence COUNT (e.g. shared-shingle
    counting) aggregate it themselves instead of paying dropDuplicates.

    This replaces the LSH band SELF-JOIN: a self-join evaluates the
    (expensive) signature subplan once per side and invites a broadcast
    build of one copy; the group-by form computes signatures ONCE, pays
    ONE shuffle of O(rows x bands), and generates pairs locally inside
    each bucket. Bucket keys are hashes, so buckets stay tiny and the
    quadratic intra-bucket step is bounded by true near-dup cluster
    size — output-sized work, not input-sized.
    """
    first = member_cols[0]
    ms = F.sort_array(F.collect_list(F.struct(*member_cols)))
    inner = ", ".join(
        [f"a.{c} as {c}_a" for c in member_cols]
        + [f"b.{c} as {c}_b" for c in member_cols])
    pair_expr = (
        "flatten(transform(ms, (a, i) -> "
        "transform(slice(ms, i + 2, size(ms) - i - 1), "
        f"b -> struct({inner}))))")
    pairs = (
        banded.groupBy(*bucket_cols).agg(ms.alias("ms"))
        .where(F.size("ms") > 1)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.*")
    )
    if dedup:
        pairs = pairs.dropDuplicates([f"{first}_a", f"{first}_b"])
    return pairs


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
