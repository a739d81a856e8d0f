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


def scd2_snapshot(history: DataFrame, at_us: int) -> DataFrame:
    """Dimension TIME TRAVEL: reconstruct the dimension as it stood at
    epoch-µs instant ``at_us`` — one row per key that had a version
    covering that instant (valid_from_us <= at < valid_to_us, NULL
    valid_to = still current). A pure scan-side filter: zero shuffles,
    and on a history table partitioned/sorted by validity the
    predicates prune at the scan. The degenerate empty intervals
    pit_join drops can never match (no instant satisfies t < vt when
    vt == vf <= t), so no extra filter is needed."""
    return history.where(
        (F.col("valid_from_us") <= F.lit(int(at_us)))
        & (F.col("valid_to_us").isNull()
           | (F.lit(int(at_us)) < F.col("valid_to_us"))))


def pit_join(facts: DataFrame, history: DataFrame, key: str,
             fact_ts: str = "ts", attr_cols: list[str] | None = None,
             suffix: str = "_dim") -> DataFrame:
    """POINT-IN-TIME join — every fact row plus the dimension attribute
    values that were true AT THE FACT'S TIMESTAMP: the query SCD2
    history exists to answer (which status/price/tier did this user
    have when this event happened), and the one a plain dimension join
    silently gets wrong by using today's values for yesterday's facts.

    ``history`` is :func:`scd2_from_changelog` output (validity as
    epoch-µs ``valid_from_us``/``valid_to_us``, NULL valid_to =
    current). A fact at time t matches the version with valid_from_us
    <= t < valid_to_us (left semantics: attrs NULL when no version
    covers t — facts before the first version, or in a gap of a
    hand-built history).

    NOT a range join: interval membership against a gapless,
    non-overlapping SCD2 history is exactly a backward as-of join on
    valid_from (the latest version starting at-or-before t), so this
    composes operators/asof.asof_join — ONE shuffle (the union-sort
    window on the key), never an inequality nested loop — then
    null-guards the residual upper bound, which only fires for
    pre-history and gap timestamps. Degenerate empty intervals
    (valid_to == valid_from, produced by equal-timestamp changes) are
    dropped first: they cover no instant, and removing them makes the
    as-of tiebreak at equal valid_from unambiguous.
    """
    from .asof import asof_join

    if attr_cols is None:
        attr_cols = [c for c in history.columns
                     if c not in (key, "valid_from_us", "valid_to_us")]
    if "valid_to_us" in attr_cols:
        # the bound column is joined internally and consumed by the
        # coverage guard; letting it double as an attr would emit a
        # duplicate payload name and an ambiguous guard reference
        raise ValueError("attr_cols must not contain 'valid_to_us' — "
                         "the validity bound is not an attribute")
    hist = history.where(
        F.col("valid_to_us").isNull()
        | (F.col("valid_to_us") > F.col("valid_from_us")))
    # collision-safe temp ts column: facts may legitimately carry
    # "_pit_us", and withColumn would silently overwrite it — then the
    # final facts.columns re-emit hands the caller the shifted value
    # instead of their data (the split_assign_leakage_free pattern)
    tmp = "_pit_us"
    while tmp in facts.columns:
        tmp += "_"
    f = facts.withColumn(
        tmp, F.unix_micros(F.col(fact_ts).cast("timestamp")))
    joined = asof_join(
        f, hist, key, left_ts=tmp, right_ts="valid_from_us",
        payload=attr_cols + ["valid_to_us"], suffix=suffix)
    covered = (F.col(f"valid_to_us{suffix}").isNull()
               | (F.col(tmp) < F.col(f"valid_to_us{suffix}")))
    guarded = [F.when(covered, F.col(f"{c}{suffix}"))
               .alias(f"{c}{suffix}") for c in attr_cols]
    return joined.select(*[F.col(c) for c in facts.columns], *guarded)
