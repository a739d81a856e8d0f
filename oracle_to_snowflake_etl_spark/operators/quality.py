"""Data-quality constraint checks — the declarative gate an ETL pipeline
runs before publishing a table (uniqueness, not-null, referential
integrity, accepted values), reported as one small violations summary.

The reference validates by row-count reconciliation only
(oracle_to_snowflake.py:118-123, SURVEY.md §5.1); this generalizes that
"count what's wrong" idea to constraint classes, Spark-first:

  - every check is a DataFrame aggregation (no row-at-a-time asserts);
  - all checks UNION into one result, so one action evaluates the whole
    contract — Spark runs the independent branches as parallel stages of
    one job rather than N sequential jobs;
  - each check's shuffle is bounded: uniqueness = hash-agg on the key
    (map-side combine collapses to distinct count), referential = the
    dim side broadcasts or AQE picks SMJ, null/values checks are pure
    scan-aggregates (zero shuffle beyond the final 1-row combines).

At 100 TB: run per-partition (e.g. per ingest day) and only on the
partitions a load touched — the checks compose with partition pruning
because they are plain filters/aggregations over the scanned slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_result(name: str, bad: Column) -> list[Column]:
    return [F.lit(name).alias("check_name"), bad.alias("n_bad")]


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows beyond the first per key (0 = key is unique)."""
    return (df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n"))
            .agg(*_as_result("unique:" + ",".join(cols),
                             F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                             .cast("long"))))


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    return df.agg(*_as_result(
        f"not_null:{col}",
        F.count(F.when(F.col(col).isNull(), 1)).cast("long")))


def check_accepted_values(df: DataFrame, col: str,
                          allowed: list[str]) -> DataFrame:
    arr = F.array(*[F.lit(v) for v in allowed])
    return df.agg(*_as_result(
        f"accepted:{col}",
        F.count(F.when(~F.array_contains(arr, F.col(col)), 1)).cast("long")))


def check_references(child: DataFrame, child_key: str,
                     parent: DataFrame, parent_key: str) -> DataFrame:
    """Orphaned child rows (foreign key with no parent)."""
    orphans = child.select(F.col(child_key)).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key, "left_anti")
    return orphans.agg(*_as_result(
        f"references:{child_key}", F.count(F.lit(1)).cast("long")))


def run_checks(*checks: DataFrame) -> DataFrame:
    """Union the per-check summaries into one (check_name, n_bad) frame —
    a single action evaluates the whole contract."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def observed_write(df: DataFrame, path: str, name: str = "dq",
                   metrics: dict[str, Column] | None = None,
                   mode: str = "overwrite") -> dict:
    """Write ``df`` to parquet while collecting data-quality metrics IN
    THE SAME PASS via ``DataFrame.observe`` — zero extra scans, zero
    extra shuffles (metrics accumulate on executors during the write
    job, like Spark's own task metrics).

    This is the publish-time half of the DQ contract: ``run_checks``
    gates before publish with its own action; ``observed_write`` attaches
    free metrics to the publish action itself — at 100 TB the difference
    is a whole extra table scan.

    Default metrics: row count + per-column null counts. Returns the
    observed metric row as a dict.
    """
    from pyspark.sql import Observation

    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
        for c in df.columns:
            metrics[f"nulls_{c}"] = F.count(F.when(F.col(c).isNull(), 1))
    obs = Observation(name)
    out = df.observe(obs, *[m.alias(k) for k, m in metrics.items()])
    out.write.mode(mode).parquet(path)
    return obs.get


def drift_report(df: DataFrame, group_col: str, in_a: Column, in_b: Column,
                 key_col: str, value_q: Column) -> DataFrame:
    """Side-by-side distribution drift between two slices of one table
    (week-over-week, pre/post backfill, old vs new feed) — the check a
    pipeline runs BEFORE publishing when a contract (run_checks) can
    only say "valid", not "suddenly different".

    Per ``group_col`` group: row counts, distinct ``key_col`` counts,
    and exact integer sums of the pre-quantized ``value_q`` for each
    side, plus deltas. Built as ONE conditional aggregation over ONE
    scan — `sum(when(in_a, ...))` style — so the table is read once; a
    two-scan/self-join formulation would double the 100 TB read and add
    a join shuffle for no information gain. Plan cost: the distinct
    aggregates expand two-phase (Expand + a second Exchange on the
    group key — budget 2, plan-asserted in tests/test_plans.py), the
    price of EXACT per-side key counts; swap in approx_count_distinct
    when estimates suffice and the plan collapses to one exchange. Rows in neither slice
    contribute nothing but still flow through the scan: push a
    combined filter before calling when the slices are narrow (the
    predicate composes with partition pruning).

    All measures are exact integers (counts + integer sums of the
    quantized value), so the report is bit-stable across engines and
    partitionings — same convention as the exact-sum stats family.
    """
    def side(name: str, pred: Column) -> list[Column]:
        return [
            F.count(F.when(pred, 1)).alias(f"n_{name}"),
            F.countDistinct(F.when(pred, F.col(key_col)))
            .alias(f"keys_{name}"),
            F.coalesce(F.sum(F.when(pred, value_q)), F.lit(0))
            .cast("long").alias(f"vsum_{name}"),
        ]

    return (df.groupBy(group_col)
            .agg(*side("a", in_a), *side("b", in_b))
            .withColumn("n_delta", F.col("n_b") - F.col("n_a"))
            .withColumn("vsum_delta", F.col("vsum_b") - F.col("vsum_a")))
