"""Mergeable frequency sketches: count-min over token/key streams.

Companion to the HyperLogLog register sketch (queries/sql_q.py
``sketch_hll_custkey``): HLL answers "how many DISTINCT", count-min
answers "how often does item x occur" with a counter table whose size
is FIXED (d rows x w columns) regardless of stream size. Both share
the engine's sketch design rules:

- counters/registers are md5-derived (functions/hashing.py), so the
  sketch a 1000-executor Spark job builds is bit-identical to the
  DuckDB oracle's — the sketch itself is differentially checkable, not
  just its estimates;
- the sketch is a plain DataFrame, mergeable by the obvious aggregate
  (SUM for count-min counters, MAX for HLL registers) — per-partition
  partials combine map-side, daily sketches union into monthly ones
  with the same aggregate, and the shuffle carries at most d*w rows.

Count-min guarantees: estimate(x) >= true(x) always (hash collisions
only ADD); with w columns the expected overcount is N/w per row and
taking the MIN over d independent rows drives the error to its
Chernoff bound. At 100 TB: the counter table for d=4, w=65536 is 256k
longs (~2 MB) — a broadcastable summary of a trillion-token stream,
built in one pass with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60

#: default geometry: 4 hash rows, 64 columns (test-scale; widen w for
#: production — error ~ N/w)
CMS_D = 4
CMS_W = 64


#: HLL geometry: 256 registers; rho is the 1-based first-one position
#: of the 52-bit hash suffix (53 caps the all-zero suffix)
HLL_M = 256
HLL_RHO_MAX = 53
#: 2^61 — scales the harmonic sum into exact DECIMAL integer arithmetic
HLL_POW = 1 << 61
#: alpha_m * m^2 for m=256, embedded as the same repr-literal in the
#: DuckDB oracle (queries/sql_q.py) so the float math is bit-identical
HLL_ALPHA_M2 = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0


def hll_register_table(items: DataFrame, item_col: str,
                       salt: str = "hll",
                       group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Build the 256-register HyperLogLog table (group_cols..., bucket,
    maxr) over a key column. ONE hash aggregate whose map-side MAX
    partials bound the shuffle at 256 rows per group per input
    partition — the mergeable distinct-count sketch: tables union and
    re-MAX on (group, bucket) (:func:`hll_merge`), so per-day register
    tables roll up into monthly distinct estimates without re-reading
    raw keys. With ``group_cols`` the same pass yields distinct-per-
    group (users per day/cohort) at 256 rows of state per group — the
    shape COUNT(DISTINCT x) GROUP BY g cannot reach without shuffling
    every raw (g, x) pair."""
    h = hash60(F.concat_ws(
        "|", F.lit(salt), F.col(item_col).cast("string")))
    return (items.select(*group_cols, h.alias("h60"))
            .select(*group_cols,
                    (F.col("h60") % HLL_M).alias("bucket"),
                    F.expr("h60 div 256").alias("w"))
            .select(*group_cols, "bucket",
                    F.when(F.col("w") == 0, F.lit(HLL_RHO_MAX))
                     .otherwise(F.lit(HLL_RHO_MAX)
                                - F.length(F.expr("bin(w)")))
                     .alias("rho"))
            .groupBy(*group_cols, "bucket").agg(F.max("rho").alias("maxr")))


def hll_merge(*registers: DataFrame,
              group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Merge register tables: union + elementwise MAX — the property
    that makes HLL a one-pass, any-partitioning, any-granularity
    distinct counter."""
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy(*group_cols, "bucket") \
              .agg(F.max("maxr").alias("maxr"))


def hll_estimate(registers: DataFrame,
                 group_cols: tuple[str, ...] = ()) -> DataFrame:
    """(group_cols..., used, est) estimate rows from a register table
    (one row total without ``group_cols``). The harmonic sum is
    computed as Σ 2^(61-maxr) in exact DECIMAL (absent buckets
    contribute 2^61), so the only float steps are one cast, two
    divisions and (in the small range) one log — performed in the
    same order on both engines.

    Small-range correction (Flajolet et al. 2007 §4): the raw
    harmonic estimator floors at ~alpha*m for near-empty sketches
    (empty buckets dominate the sum), so when raw <= 2.5*m and empty
    buckets remain, the estimate switches to linear counting
    m*ln(m/V) over the V empty buckets — without it a 14-distinct
    group estimates ~190 at m=256 (caught by the mv_hll_refresh
    no-drift test). Mirrored verbatim in every HLL oracle SQL."""
    s = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.expr("cast(shiftleft(cast(1 as bigint), "
                     "cast(61 - maxr as int)) as decimal(38,0))"))
         .alias("t_used"))
    raw = (F.lit(HLL_ALPHA_M2) /
           ((F.col("t_used")
             + (F.lit(HLL_M) - F.col("used")).cast("decimal(38,0)")
             * F.lit(HLL_POW).cast("decimal(38,0)")).cast("double")
            / F.lit(float(HLL_POW))))
    empties = (F.lit(HLL_M) - F.col("used")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("used") < F.lit(HLL_M)),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / empties)
    ).otherwise(raw)
    return s.select(*group_cols, "used", est.alias("est"))


def count_min_table(items: DataFrame, item_col: str = "tok",
                    d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Build the count-min counter table (row, col, cnt) from a stream
    of item occurrences (one input row per occurrence).

    ONE explode (x d) + ONE hash aggregate; map-side partial
    aggregation collapses each input partition to <= d*w counter rows
    before the shuffle, so shuffle volume is O(partitions x d x w) —
    independent of stream length. Merge sketches by unioning counter
    tables and re-aggregating with SUM on (row, col).
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    keyed = items.select(F.col(item_col).alias("_it"), rows)
    # one md5 per (item, row); the % w fold keeps it a single codegen pass
    keyed = keyed.select(
        "row", (hash60(F.concat(F.concat(F.lit("cm"), F.col("row").cast("string"),
                                         F.lit("|")), F.col("_it"))) % w).alias("col"))
    return keyed.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(cms: DataFrame, queries: DataFrame,
                 item_col: str, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Point-estimate each query item's frequency from the counter
    table: MIN over the item's d counters. Adds ``n_est`` to the query
    frame. The join is d rows/query-item against a <= d*w-row counter
    table — AQE broadcasts the sketch side, so estimation never
    shuffles the query frame."""
    keys = queries.select(
        *queries.columns,
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"))
    keys = keys.withColumn(
        "col", (hash60(F.concat(F.concat(F.lit("cm"), F.col("row").cast("string"),
                                         F.lit("|")), F.col(item_col))) % w))
    # LEFT join + coalesce-to-0: a (row,col) cell no stream item hashed
    # to is ABSENT from the counter table, and count-min's answer for a
    # query item with any empty cell is 0 — an inner join would drop
    # the empty cells from the MIN (inflating the estimate) and drop
    # all-cells-empty items from the output entirely
    return (keys.join(F.broadcast(cms), ["row", "col"], "left")
            .groupBy(*queries.columns)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("n_est")))


def approx_group_quantiles(df: DataFrame, value_col: str,
                           group_cols: list[str],
                           probs: list[float] = (0.5, 0.9, 0.99),
                           accuracy: int = 10_000) -> DataFrame:
    """Per-group approximate quantiles — the p50/p90/p99-per-service
    telemetry aggregate — via Spark's built-in Greenwald-Khanna
    ``percentile_approx`` (SIGMOD'01; mergeable summaries, so the
    aggregate partial-combines map-side like any algebraic agg and the
    shuffle is bounded by groups x summary size, never row count).

    This is the 100 TB complement of the EXACT rank quantiles used in
    the oracle-checked queries (text_corpus_quantiles, skew_report):
    exact ranks need a per-group sort/window over every row; the GK
    summary guarantees rank error <= n/accuracy with a summary of
    O(accuracy * log n) — at the default 10^4 that is a 0.01% rank
    band, pytest-bounded against the exact answer in
    tests/test_maintenance.py (no cross-engine value oracle BY
    CONSTRUCTION: DuckDB's approx_quantile is t-digest, a different
    algorithm — same treatment as the CMS/HLL error-bound contracts).

    Returns one row per group with ``q_<prob>`` columns (dots stripped:
    q50, q90, q99 at the defaults).
    """
    aggs = [
        F.percentile_approx(value_col, float(p), accuracy)
        .alias(f"q{round(p * 100)}")
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(*aggs)
