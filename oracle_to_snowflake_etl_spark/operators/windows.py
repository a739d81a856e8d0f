"""Window / analytic operators.

The reference has NO window functions (SURVEY.md §2.8) — these extend the
engine to the full analytic surface a reporting workload needs (running
totals, in-group ranking, gap analysis, moving averages) plus event
sessionization, the canonical streaming-adjacent batch operator.

Determinism rules for differential checking:
  - every ORDER BY inside a window carries a unique tiebreak column;
  - float aggregates inside frames go through DECIMAL
    (functions/exact.py rationale: decimal addition is associative, so
    running/moving sums are bit-identical regardless of execution);
  - ranking/count outputs are integers — no float ambiguity.

Scale notes: a window over PARTITION BY k is one shuffle on k, then a
per-partition sort; skewed partitions (one giant user) are the hot spot
— sessionize notes the mitigation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from ..functions.exact import DEC

#: session gap: a new session starts after 30 idle minutes
SESSION_GAP_MIN = 30


def _dec_sum_over(col: Column, w: WindowSpec) -> Column:
    """Order-independent SUM over a window: decimal in, double out."""
    return F.sum(col.cast(DEC)).over(w).cast("double")


def running_total(df: DataFrame, part: str, order: list[str],
                  val: str, alias: str = "running") -> DataFrame:
    """Cumulative decimal sum of ``val`` per ``part`` in ``order``."""
    w = (Window.partitionBy(part).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(alias, _dec_sum_over(F.col(val), w))


def rank_in_group(df: DataFrame, part: str, measure: str,
                  tiebreak: str) -> DataFrame:
    """rank / dense_rank / row_number by ``measure`` DESC within
    ``part`` (ties broken by ``tiebreak`` for row_number only — rank and
    dense_rank see true ties)."""
    by_measure = Window.partitionBy(part).orderBy(F.desc(measure))
    stable = Window.partitionBy(part).orderBy(F.desc(measure), F.asc(tiebreak))
    return df.select(
        part, tiebreak, measure,
        F.rank().over(by_measure).alias("rnk"),
        F.dense_rank().over(by_measure).alias("drnk"),
        F.row_number().over(stable).alias("rn"),
    )


def moving_avg(df: DataFrame, part: str, order: list[str], val: str,
               n: int = 7, alias: str = "mavg") -> DataFrame:
    """Trailing n-row average: exact decimal sum / exact count, one IEEE
    division — bit-stable across engines and partitionings."""
    w = Window.partitionBy(part).orderBy(*order).rowsBetween(-(n - 1), 0)
    avg = (F.sum(F.col(val).cast(DEC)).over(w).cast("double")
           / F.count(F.lit(1)).over(w))
    return df.withColumn(alias, avg)


def lag_delta(df: DataFrame, part: str, order: list[str], val: str,
              alias: str = "delta") -> DataFrame:
    """Difference between each row's ``val`` and the previous row's, per
    partition (NULL for the first row)."""
    w = Window.partitionBy(part).orderBy(*order)
    return df.withColumn(alias, F.col(val) - F.lag(val, 1).over(w))


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts",
               gap_minutes: int = SESSION_GAP_MIN,
               tiebreak_col: str = "event_id") -> DataFrame:
    """Assign session ids: a session breaks after ``gap_minutes`` idle.

    Two stacked windows over the same (user, ts, tiebreak) sort — Spark
    plans ONE shuffle + ONE sort for both (same partitioning/ordering):
      new_session = ts - lag(ts) > gap (or first event)
      session_id  = running count of breaks
    tiebreak_col: unique column that makes the within-user order total
    (determinism contract in the module docstring) — parameterized so
    the operator works on any events-shaped input, not just one with an
    ``event_id`` column.
    Skew note: one hyperactive user = one giant sorted partition; at
    100 TB pre-split such users by (user, day) first and stitch
    cross-midnight sessions in a second, tiny pass.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(ts_col, 1).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    cum = (Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.withColumn("is_new", is_new) \
                 .withColumn("session_id", F.sum("is_new").over(cum)) \
                 .drop("is_new")


def sessionize_bucketed(events: DataFrame, user_col: str = "user_id",
                        ts_col: str = "ts",
                        gap_minutes: int = SESSION_GAP_MIN,
                        tiebreak_col: str = "event_id",
                        bucket_hours: int = 24) -> DataFrame:
    """The 100 TB form of :func:`sessionize` — identical output, skew
    bounded by events-per-user-per-bucket instead of events-per-user.

    A hyperactive key makes plain sessionize sort one giant (user)
    partition. Here:

      1. events shuffle on (user, time-bucket) — the hot key splits
         across buckets; within-bucket sessionize is the same two
         stacked windows;
      2. a per-(user, bucket) boundary table (min/max ts, session
         count — one row per user-bucket, ~events/avg-bucket-size
         smaller) decides with one tiny (user)-partitioned window pass
         whether each bucket's first session continues the previous
         bucket's last session (gap check across the boundary), and
         assigns each bucket its global session-id base;
      3. the base/merge columns join back on (user, bucket) — the same
         partitioning the big side already has, so no extra shuffle of
         the events.

    Session ids come out numbered chronologically per user, exactly as
    plain sessionize produces (asserted in tests). Works for sessions
    spanning any number of buckets (each consecutive pair merges).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    bucket_us = bucket_hours * 3600 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    bkt = ((us - ((us % bucket_us) + bucket_us) % bucket_us) / bucket_us) \
        .cast("long")
    ev = events.withColumn("_bkt", bkt)

    w = Window.partitionBy(user_col, "_bkt").orderBy(ts_col, tiebreak_col)
    prev_ts = F.lag(ts_col, 1).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    cum = (Window.partitionBy(user_col, "_bkt").orderBy(ts_col, tiebreak_col)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = ev.withColumn("_ls", F.sum(is_new).over(cum))

    bounds = local.groupBy(user_col, "_bkt").agg(
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
        F.max("_ls").alias("_n"))
    wb = Window.partitionBy(user_col).orderBy("_bkt")
    prev_last = F.lag("_last_ts", 1).over(wb)
    merged = F.when(
        prev_last.isNotNull()
        & ((F.unix_micros(F.col("_first_ts")) - F.unix_micros(prev_last))
           <= gap_us),
        F.lit(1)).otherwise(F.lit(0))
    cumb = (Window.partitionBy(user_col).orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1))
    with_m = bounds.withColumn("_m", merged)
    base = F.coalesce(F.sum(F.col("_n") - F.col("_m")).over(cumb), F.lit(0))
    keys = with_m.select(user_col, "_bkt", F.col("_m"), base.alias("_base"))

    out = (local.join(keys, [user_col, "_bkt"])
           .withColumn("session_id", F.col("_base") + F.col("_ls") - F.col("_m"))
           .drop("_bkt", "_ls", "_m", "_base"))
    return out


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts",
                  gap_minutes: int = SESSION_GAP_MIN,
                  tiebreak_col: str = "event_id",
                  value_col: str = "value") -> DataFrame:
    """Per-session rollup: event count, value sum (decimal-exact), span
    in microseconds. The batch mirror of a streaming session window."""
    s = sessionize(events, user_col, ts_col, gap_minutes, tiebreak_col)
    return (
        s.groupBy(user_col, "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col(value_col).cast(DEC)).cast("double").alias("value_sum"),
             (F.max(F.unix_micros(F.col(ts_col)))
              - F.min(F.unix_micros(F.col(ts_col)))).alias("span_us"))
    )


def hypertable_rollup(events: DataFrame,
                      minutes_levels: tuple[int, ...] = (5, 60, 1440),
                      ts_col: str = "ts",
                      value_col: str = "value") -> DataFrame:
    """Multi-resolution continuous-aggregate rollup (the hypertable /
    TimescaleDB continuous-aggregate shape): raw events aggregate ONCE at
    the finest resolution; every coarser level re-aggregates the
    previous level's partials instead of rescanning raw data.

    That hierarchy is exactly why functions/exact.py sums in DECIMAL:
    decimal addition is associative, so sum-of-partial-sums is
    bit-identical to a direct sum over raw rows — the oracle aggregates
    each level straight from raw events and still hash-matches.

    At 100 TB the raw scan happens once; each further level shuffles
    only the previous level's output (|buckets| rows, collapsing by the
    level ratio). Output: (resolution_min, window_id, event_type, n,
    value_sum) stacked over all levels.

    Every coarser level must be a multiple of the previous one.
    """
    for a, b in zip(minutes_levels, minutes_levels[1:]):
        if b % a:
            raise ValueError(f"level {b} not a multiple of {a}")
    base_us = minutes_levels[0] * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    wid = ((us - ((us % base_us) + base_us) % base_us) / base_us).cast("long")
    # finest level: one scan of raw events; value kept as DECIMAL so the
    # re-aggregations above stay exact
    level = (events.groupBy(wid.alias("window_id"), "event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col(value_col).cast(DEC)).alias("_vdec")))
    out = level.select(
        F.lit(minutes_levels[0]).alias("resolution_min"),
        "window_id", "event_type", "n",
        F.col("_vdec").cast("double").alias("value_sum"))
    prev, prev_min = level, minutes_levels[0]
    for mins in minutes_levels[1:]:
        ratio = mins // prev_min
        cw = F.col("window_id")
        coarse = ((cw - ((cw % ratio) + ratio) % ratio) / ratio).cast("long")
        level = (prev.groupBy(coarse.alias("window_id"), "event_type")
                 .agg(F.sum("n").alias("n"), F.sum("_vdec").alias("_vdec")))
        out = out.unionByName(level.select(
            F.lit(mins).alias("resolution_min"),
            "window_id", "event_type", "n",
            F.col("_vdec").cast("double").alias("value_sum")))
        prev, prev_min = level, mins
    return out


def tumbling_counts(events: DataFrame, minutes: int = 5,
                    ts_col: str = "ts",
                    value_col: str = "value") -> DataFrame:
    """Event-time tumbling windows by epoch-µs floor division — the
    deterministic cross-engine window id (Spark's F.window struct and
    DuckDB's time_bucket render differently; an integer bucket id hashes
    identically). Batch mirror of the Structured Streaming windowed
    count (streaming/jobs.py)."""
    bucket_us = minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    # exact FLOOR division on longs: subtract the positive remainder,
    # then the quotient is exact integer division (matches DuckDB `//`
    # for negative pre-epoch values too; `/`+cast truncates toward zero)
    wid = ((us - ((us % bucket_us) + bucket_us) % bucket_us) / bucket_us) \
        .cast("long")
    return (
        events.groupBy(wid.alias("window_id"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col(value_col).cast(DEC)).cast("double").alias("value_sum"))
    )


def gapfill(events: DataFrame, minutes: int = 60,
            key_col: str = "event_type", ts_col: str = "ts",
            value_col: str = "value") -> DataFrame:
    """Time-series gap-fill (the hypertable companion of
    tumbling_counts): bucket per key, GENERATE the missing buckets from
    each key's observed [min, max] span, and carry the last observed
    aggregate forward into the gaps. Returns
    (key, window_id, n, value_sum, filled) — ``n`` is 0 on generated
    rows, ``filled`` marks them, value_sum is the forward-filled carry
    (dashboards/downsamplers want a dense series, not holes).

    Plan shape: one bucket hash-agg; per-key span is a tiny re-agg of
    its OUTPUT (bounded by keys x buckets, not events); the dense axis
    comes from sequence()+explode on the span row — |buckets| generated
    rows per key, no driver loop, no cross join against a calendar
    table; one left join puts observations onto the axis (AQE
    broadcasts the observed side when small); the forward-fill is ONE
    window last(ignorenulls) per key ordered by bucket. Skew note: the
    dense axis is uniform by construction — |span| rows per key — so
    the window partitioning cannot be skewed worse than the span ratio.
    """
    bucket_us = minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    wid = ((us - ((us % bucket_us) + bucket_us) % bucket_us) / bucket_us) \
        .cast("long")
    observed = (events.groupBy(wid.alias("window_id"),
                               F.col(key_col).alias("k"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col(value_col).cast(DEC)).alias("_vdec")))
    spans = (observed.groupBy("k")
             .agg(F.min("window_id").alias("_lo"),
                  F.max("window_id").alias("_hi")))
    axis = spans.select(
        "k", F.explode(F.sequence(F.col("_lo"), F.col("_hi")))
        .alias("window_id"))
    joined = axis.join(observed, ["k", "window_id"], "left")
    w = (Window.partitionBy("k").orderBy("window_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        F.col("k").alias(key_col),
        "window_id",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        F.last("_vdec", ignorenulls=True).over(w).cast("double")
         .alias("value_sum"),
        F.col("n").isNull().alias("filled"))


def ewma_lag(df: DataFrame, part: str, order: list[str], val: str,
             halvings: int = 8, out: str = "ewma") -> Column | DataFrame:
    """Truncated exponentially-weighted moving average with decay 1/2,
    expressed as a fixed LAG sum:

        ewma_i = sum_{j=0..halvings-1}  v_{i-j} * 2^-j   (missing -> 0)

    Two deliberate choices make this bit-reproducible across engines
    (the recursive s_i = a*v + (1-a)*s_{i-1} form is NOT — it
    accumulates engine-ordered float error, and Spark can't express the
    recursion without a sequential pass anyway):
      * decay 1/2: every weight 2^-j is an EXACT binary double, so each
        product rounds identically everywhere;
      * a fixed left-associated sum of COALESCE(lag(v, j), 0)*2^-j
        terms — same expression tree in the oracle SQL, no fold-order
        ambiguity.
    One window sort per partition key, no extra state: the truncation
    (weights below 2^-(halvings-1) dropped) is what bounds the frame —
    the infinite-tail EWMA needs the sequential recursion by definition.
    """
    w = Window.partitionBy(part).orderBy(*order)
    expr = F.col(val).cast("double")
    for j in range(1, halvings):
        expr = expr + F.coalesce(F.lag(F.col(val), j).over(w),
                                 F.lit(0.0)) * F.lit(2.0 ** -j)
    return df.withColumn(out, expr)


def time_weighted_avg(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts", value_col: str = "value",
                      order_cols: list[str] | None = None,
                      scale: int = 1_000_000) -> DataFrame:
    """Per-key TIME-weighted average (TWAP): each observation weighted
    by how long it was the current value — Σ vᵢ·Δtᵢ / Σ Δtᵢ over the
    key's timeline, Δtᵢ = microseconds until the next observation (the
    last observation carries no duration). The right mean for sampled
    state (prices, gauge metrics, account balances): a plain AVG
    over-weights bursts of closely-spaced updates.

    Exactness: value is quantized to an integer (functions/hashing
    quantize convention), durations are integer microseconds, and both
    Σ v_q·Δt and Σ Δt accumulate in DECIMAL(38,0) — so the only float
    steps are two exact-decimal→double casts and ONE division, bit-
    identical across engines and partitionings (the oracle recomputes
    identically). ONE shuffle: the per-key window sort; the aggregate
    reuses its partitioning. Skew = per-key event volume, same bound as
    every per-key window here.
    """
    order_cols = order_cols or [ts_col, "event_id"]
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    us = F.unix_micros(F.col(ts_col))
    dur = F.lead(us).over(w) - us
    vq = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    rows = (events
            .select(key_col, dur.alias("_dur"), vq.alias("_vq"))
            .where(F.col("_dur").isNotNull()))
    agg = rows.groupBy(key_col).agg(
        F.sum((F.col("_vq").cast("decimal(38,0)") * F.col("_dur"))
              .cast("decimal(38,0)")).alias("_num"),
        F.sum(F.col("_dur").cast("decimal(38,0)")).alias("_den"),
        F.count(F.lit(1)).alias("n_intervals"))
    # zero total span (all observations share one timestamp) would be
    # 0/0: Spark floors NaN to 0 while other engines error on the cast
    # — no time elapsed means no time-weighted mean exists, so drop the
    # key (the oracle applies the same HAVING)
    agg = agg.where(F.col("_den") > 0)
    return agg.select(
        key_col, "n_intervals",
        F.col("_den").cast("long").alias("span_us"),
        F.floor(F.col("_num").cast("double") / F.col("_den").cast("double")
                + F.lit(0.5)).cast("long").alias("twap_q6"))


def ohlc_bars(events: DataFrame, minutes: int = 60,
              key_col: str = "event_type", ts_col: str = "ts",
              value_col: str = "value",
              id_col: str = "event_id") -> DataFrame:
    """OHLC downsampling: per (key, time bucket) the Open (first
    value), High, Low, Close (last value) plus count and exact sum —
    the classic financial/metrics bar aggregation. ONE hash aggregate:
    open/close come from MIN/MAX over a (ts_us, id, value) struct
    (lexicographic struct ordering picks the row with the earliest/
    latest (ts, id) and carries its value along — no window sort, no
    first_value), so the whole bar is map-side combinable and the
    shuffle is bounded by |keys| x |buckets|. (ts, id) must be unique
    per row (event ids are), making open/close deterministic on any
    engine and partitioning.
    """
    bucket = minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    g = events.select(
        F.col(key_col), F.expr(f"unix_micros({ts_col}) div {bucket}")
        .alias("window_id"), us.alias("_us"),
        F.col(id_col).alias("_id"), F.col(value_col).alias("_v"))
    edge = F.struct(F.col("_us"), F.col("_id"), F.col("_v"))
    return (g.groupBy(key_col, "window_id")
            .agg(F.min(edge)["_v"].alias("open"),
                 F.max("_v").alias("high"),
                 F.min("_v").alias("low"),
                 F.max(edge)["_v"].alias("close"),
                 F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("_v").cast(DEC)).cast("double")
                  .alias("value_sum")))
