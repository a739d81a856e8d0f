"""Window / analytic query set (operators/windows.py) over orders,
lineitem, and events — running totals, ranking, gaps, moving averages,
sessionization, event-time tumbling windows. Every window ORDER BY has a
unique tiebreak; every float aggregate is decimal-exact; frames are
spelled ROWS explicitly on both sides (the default frame is RANGE, which
engines can disagree on with peer rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import DEC
from ..operators.windows import (
    SESSION_GAP_MIN,
    lag_delta,
    moving_avg,
    rank_in_group,
    running_total,
    hypertable_rollup,
    session_stats,
    tumbling_counts,
)
from ..sources.readers import load_table
from . import register

_DECU = DEC.upper()


@register(
    "w_running_spend",
    f"""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS {_DECU})) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running
    FROM orders
    """)
def q_w_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend in order-date order
    (operators/windows.py running_total)."""
    orders = load_table(spark, sf_dir, "orders")
    out = running_total(orders, "o_custkey", ["o_orderdate", "o_orderkey"],
                        "o_totalprice")
    return out.select("o_orderkey", "o_custkey", "running")


@register(
    "w_rank_orders",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
    """)
def q_w_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number of orders by price within customer
    (operators/windows.py rank_in_group)."""
    orders = load_table(spark, sf_dir, "orders")
    return rank_in_group(orders, "o_custkey", "o_totalprice", "o_orderkey")


@register(
    "w_order_deltas",
    """
    SELECT o_custkey, o_orderkey,
           o_totalprice - lag(o_totalprice, 1) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS delta,
           date_diff('day',
                     lag(o_orderdate, 1) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap_days
    FROM orders
    """)
def q_w_order_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer consecutive-order price delta and day gap via lag
    (operators/windows.py lag_delta)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    out = lag_delta(orders, "o_custkey", ["o_orderdate", "o_orderkey"],
                    "o_totalprice")
    return out.select(
        "o_custkey", "o_orderkey", "delta",
        F.datediff(F.col("o_orderdate"),
                   F.lag("o_orderdate", 1).over(w)).alias("gap_days"))


@register(
    "w_moving_avg7",
    f"""
    SELECT l_orderkey, l_linenumber, l_partkey,
           CAST(SUM(CAST(l_extendedprice AS {_DECU})) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS mavg
    FROM lineitem
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """)
def q_w_moving_avg7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row average extended price per part in ship-date order
    (operators/windows.py moving_avg)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = moving_avg(li, "l_partkey",
                     ["l_shipdate", "l_orderkey", "l_linenumber"],
                     "l_extendedprice", n=7)
    return out.select("l_orderkey", "l_linenumber", "l_partkey", "mavg")


@register(
    "ev_sessions",
    f"""
    WITH s AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {SESSION_GAP_MIN * 60 * 1_000_000}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM s
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {_DECU})) AS DOUBLE) AS value_sum,
           MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us
    FROM numbered
    GROUP BY user_id, session_id
    """)
def q_ev_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization of the events stream + per-session
    rollup (operators/windows.py session_stats) — the batch mirror of a
    streaming session window."""
    events = load_table(spark, sf_dir, "events")
    return session_stats(events)


def _rollup_level_sql(mins: int) -> str:
    bucket = mins * 60 * 1_000_000
    return f"""
    SELECT {mins} AS resolution_min,
           epoch_us(ts) // {bucket} AS window_id,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS {_DECU})) AS DOUBLE) AS value_sum
    FROM events GROUP BY 2, 3"""


@register(
    "ev_hypertable_rollup",
    " UNION ALL ".join(_rollup_level_sql(m) for m in (5, 60, 1440)))
def q_ev_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution continuous aggregate (5m -> 1h -> 1d), each
    coarser level re-aggregated from the previous level's DECIMAL
    partials (operators/windows.hypertable_rollup). The oracle computes
    every level straight from raw events — associative decimal sums make
    the hierarchical and direct forms bit-identical."""
    return hypertable_rollup(load_table(spark, sf_dir, "events"))


@register(
    "ev_tumbling_5m",
    f"""
    SELECT epoch_us(ts) // {5 * 60 * 1_000_000} AS window_id,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS {_DECU})) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """)
def q_ev_tumbling_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute event-time tumbling window counts/sums by type
    (operators/windows.py tumbling_counts) — integer bucket ids hash
    identically across engines."""
    return tumbling_counts(load_table(spark, sf_dir, "events"), minutes=5)


@register(
    "w_ntile_quartiles",
    """
    SELECT o_orderkey, o_orderstatus,
           ntile(4) OVER w AS quartile,
           CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT)
             AS prank_q6,
           CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT)
             AS cdist_q6
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """)
def q_w_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window functions (ntile / percent_rank /
    cume_dist) in one window pass — one shuffle on the partition key,
    one per-partition sort, all three functions share the frame. The
    unique (price, orderkey) order makes bucket boundaries deterministic;
    the rank ratios are quantized like every cross-engine float."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    q6 = lambda c: F.floor(c * 1_000_000 + F.lit(0.5)).cast("long")  # noqa: E731
    return orders.select(
        "o_orderkey", "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        q6(F.percent_rank().over(w)).alias("prank_q6"),
        q6(F.cume_dist().over(w)).alias("cdist_q6"))


@register(
    "w_first_last_nth",
    f"""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(first_value(o_totalprice) OVER w AS {_DECU}) AS DOUBLE)
             AS first_price,
           CAST(CAST(last_value(o_totalprice) OVER w_full AS {_DECU}) AS DOUBLE)
             AS last_price,
           CAST(CAST(nth_value(o_totalprice, 2) OVER w_full AS {_DECU}) AS DOUBLE)
             AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_full AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """)
def q_w_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window functions (first_value / last_value /
    nth_value): per-customer first, latest, and second order value. The
    frames are spelled explicitly because the defaults BITE here —
    last_value over the default frame is just the current row; the
    full-partition frame is what "latest order" means. Both windows
    share one partitioning, so this still plans a single shuffle+sort."""
    orders = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    pr = F.col("o_totalprice")
    d = lambda c: c.cast(DEC).cast("double")  # noqa: E731
    return orders.select(
        "o_orderkey", "o_custkey",
        d(F.first(pr).over(w)).alias("first_price"),
        d(F.last(pr).over(wf)).alias("last_price"),
        d(F.nth_value(pr, 2).over(wf)).alias("second_price"))


@register(
    "ev_gapfill_hourly",
    f"""
    WITH obs AS (
      SELECT (epoch_us(ts) // 3600000000) AS window_id, event_type AS k,
             COUNT(*) AS n,
             SUM(CAST(value AS {_DECU})) AS vdec
      FROM events GROUP BY 1, 2
    ),
    spans AS (SELECT k, MIN(window_id) AS lo, MAX(window_id) AS hi
              FROM obs GROUP BY k),
    axis AS (SELECT k, UNNEST(range(lo, hi + 1)) AS window_id FROM spans)
    SELECT a.k AS event_type, a.window_id,
           CAST(COALESCE(o.n, 0) AS BIGINT) AS n,
           CAST(last_value(o.vdec IGNORE NULLS) OVER (
                  PARTITION BY a.k ORDER BY a.window_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS value_sum,
           o.n IS NULL AS filled
    FROM axis a LEFT JOIN obs o
      ON a.k = o.k AND a.window_id = o.window_id
    """)
def q_ev_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type with forward-filled gaps
    (operators/windows.gapfill) — generate-missing-buckets + carry
    semantics, the op TimescaleDB calls time_bucket_gapfill/locf."""
    from ..operators.windows import gapfill

    return gapfill(load_table(spark, sf_dir, "events"), minutes=60)


_EWMA_TERMS = " + ".join(
    [f"COALESCE(lag(value, {j}) OVER win, 0.0) * {2.0 ** -j!r}"
     for j in range(1, 8)])


@register(
    "ev_ewma_value",
    f"""
    SELECT event_id, user_id,
           value + {_EWMA_TERMS} AS ewma
    FROM events
    WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    """)
def q_ev_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated decay-1/2 EWMA per user (operators/windows.ewma_lag):
    a fixed LAG sum whose weights are exact binary doubles, so the
    smoothed value is bit-reproducible with NO quantization — the
    recursive EWMA form is engine-ordered and unportable by design.
    One window sort, zero extra shuffles."""
    from ..operators.windows import ewma_lag

    events = load_table(spark, sf_dir, "events")
    return ewma_lag(events, "user_id", ["ts", "event_id"], "value",
                    halvings=8).select("event_id", "user_id", "ewma")


@register(
    "w_range_1h_value",
    f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS {_DECU})) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN {60 * 60 * 1_000_000} PRECEDING
                            AND CURRENT ROW) AS DOUBLE) AS sum_1h,
           CAST(COUNT(*) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN {60 * 60 * 1_000_000} PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS n_1h
    FROM events
    """)
def q_w_range_1h_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based window frame (RANGE BETWEEN 1h PRECEDING): trailing
    per-user hourly volume computed by frame scan, not self-join or
    bucket explode — the third frame family next to ROWS and
    session-gap. RANGE frames need a NUMERIC ordering key, so the frame
    orders by epoch-µs; ties (same user, same ts) are frame-identical
    by RANGE semantics on both engines, so no tiebreak is needed —
    peer rows share the frame. One shuffle + one sort per user."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros(F.col("ts")))
         .rangeBetween(-60 * 60 * 1_000_000, 0))
    return events.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double")
        .alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"))


@register(
    "funnel_view_click_purchase",
    """
    WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3 FROM events e
           JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
           GROUP BY e.user_id)
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """)
def q_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel (operators/funnel.py): earliest
    strictly-ordered step times per user in ONE shuffle (sorted-array
    fold) vs the oracle's aggregation-per-step CTE chain (k shuffles) —
    the single-pass form is the 100 TB path and must hash-match the
    per-step spec exactly."""
    from ..operators.funnel import funnel_times

    events = load_table(spark, sf_dir, "events")
    return funnel_times(events, ["view", "click", "purchase"])


@register(
    "ev_twap_user_value",
    """
    WITH d AS (
      SELECT user_id,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur,
             CAST(floor(CAST(value AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS vq
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(CAST(dur AS DECIMAL(38,0))) AS BIGINT) AS span_us,
           CAST(floor(
             CAST(SUM(CAST(CAST(vq AS DECIMAL(38,0)) * dur AS DECIMAL(38,0)))
                  AS DOUBLE)
             / CAST(SUM(CAST(dur AS DECIMAL(38,0))) AS DOUBLE) + 0.5)
           AS BIGINT) AS twap_q6
    FROM d
    WHERE dur IS NOT NULL
    GROUP BY user_id
    HAVING SUM(CAST(dur AS DECIMAL(38,0))) > 0
    """)
def q_ev_twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average event value
    (operators/windows.time_weighted_avg): each value weighted by its
    holding duration — the correct mean for sampled state, where plain
    AVG over-weights update bursts. Integer-microsecond durations and
    quantized values accumulate in exact DECIMAL, so the single final
    division is engine-identical."""
    from ..operators.windows import time_weighted_avg

    events = load_table(spark, sf_dir, "events")
    return time_weighted_avg(events)


@register(
    "w_anomaly_daily_revenue",
    """
    WITH daily AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1),
    win AS (
      SELECT day, cents,
             SUM(CAST(cents AS DECIMAL(38,0))) OVER w AS s,
             SUM(CAST(cents AS DECIMAL(19,0))
                 * CAST(cents AS DECIMAL(19,0))) OVER w AS ssq,
             COUNT(*) OVER w AS n
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 27 PRECEDING AND CURRENT ROW))
    SELECT day,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           CAST(n AS BIGINT) AS n_win,
           CASE WHEN n >= 14 AND
                     (CAST(ssq AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                        / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) > 0
                THEN CAST(floor(
                  (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  / sqrt((CAST(ssq AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
                  * 1000 + 0.5) AS BIGINT)
           END AS z_q3
    FROM win
    """)
def q_w_anomaly_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly score on the daily revenue series: each
    day's z-score against the trailing 28-day mean/stddev — the metric-
    monitoring query a warehouse runs on its own load volumes. Exactness
    across engines: daily revenue is integer cents, the window sums
    Σx and Σx² accumulate in DECIMAL, and the float steps (two
    divisions, one sqrt, fixed order) are IEEE-identical; warmup days
    (n<14) and zero-variance windows yield NULL on both sides."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = (orders
             .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
             .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                        .cast("long")).alias("cents")))
    w = Window.orderBy("day").rowsBetween(-27, 0)
    c19 = F.col("cents").cast("decimal(19,0)")
    win = daily.select(
        "day", "cents",
        F.sum(F.col("cents").cast("decimal(38,0)")).over(w).alias("s"),
        F.sum(c19 * c19).over(w).alias("ssq"),
        F.count(F.lit(1)).over(w).alias("n"))
    s_d = F.col("s").cast("double")
    ssq_d = F.col("ssq").cast("double")
    n_d = F.col("n").cast("double")
    var = (ssq_d - s_d * s_d / n_d) / (n_d - F.lit(1.0))
    z = (F.col("cents").cast("double") - s_d / n_d) / F.sqrt(var)
    return win.select(
        "day",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("revenue"),
        F.col("n").cast("long").alias("n_win"),
        F.when((F.col("n") >= 14) & (var > 0),
               F.floor(z * 1000 + F.lit(0.5)).cast("long"))
         .alias("z_q3"))


@register(
    "ev_ohlc_hourly",
    f"""
    SELECT event_type,
           epoch_us(ts) // {60 * 60 * 1_000_000} AS window_id,
           (min(struct_pack(u := epoch_us(ts), i := event_id,
                            v := value))).v AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           (max(struct_pack(u := epoch_us(ts), i := event_id,
                            v := value))).v AS close,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS {_DECU})) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """)
def q_ev_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type (operators/windows.ohlc_bars):
    open/close via lexicographic struct MIN/MAX — one map-combinable
    hash aggregate, no window sort — with exact DECIMAL sums; the
    oracle mirrors the struct trick with struct_pack."""
    from ..operators.windows import ohlc_bars

    return ohlc_bars(load_table(spark, sf_dir, "events"), minutes=60)


@register(
    "ev_cohort_retention",
    """
    WITH activity AS (
      SELECT DISTINCT user_id,
             year(ts) * 12 + month(ts) - 1 AS midx
      FROM events),
    cohorts AS (
      SELECT user_id, MIN(midx) AS cohort_idx FROM activity GROUP BY 1),
    pairs AS (
      SELECT c.cohort_idx, a.midx - c.cohort_idx AS month_offset,
             a.user_id
      FROM activity a JOIN cohorts c USING (user_id)),
    sizes AS (
      SELECT cohort_idx, COUNT(*) AS n_cohort FROM cohorts GROUP BY 1)
    SELECT p.cohort_idx, p.month_offset,
           COUNT(DISTINCT p.user_id) AS n_active,
           n_cohort,
           CAST(floor(CAST(COUNT(DISTINCT p.user_id) AS DOUBLE)
                      / CAST(n_cohort AS DOUBLE) * 1000000 + 0.5)
                AS BIGINT) AS retention_q6
    FROM pairs p JOIN sizes USING (cohort_idx)
    GROUP BY p.cohort_idx, p.month_offset, n_cohort
    """)
def q_ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity month
    (integer month index year*12+month-1 — exact on both engines),
    fraction still active at each month offset. Shuffles are bounded by
    |users| (the distinct-activity and cohort aggregates) then by
    |cohorts x offsets|; the cohort-size dimension broadcasts. The
    per-cell retention ratio is one quantized double division."""
    events = load_table(spark, sf_dir, "events")
    midx = (F.year("ts") * 12 + F.month("ts") - 1).alias("midx")
    activity = events.select("user_id", midx).distinct()
    cohorts = activity.groupBy("user_id").agg(
        F.min("midx").alias("cohort_idx"))
    pairs = (activity.join(cohorts, "user_id")
             .select("cohort_idx",
                     (F.col("midx") - F.col("cohort_idx"))
                     .alias("month_offset"), "user_id"))
    sizes = cohorts.groupBy("cohort_idx").agg(
        F.count(F.lit(1)).alias("n_cohort"))
    agg = (pairs.groupBy("cohort_idx", "month_offset")
           .agg(F.countDistinct("user_id").alias("n_active"))
           .join(F.broadcast(sizes), "cohort_idx"))
    return agg.select(
        "cohort_idx", "month_offset", "n_active", "n_cohort",
        F.floor(F.col("n_active").cast("double")
                / F.col("n_cohort").cast("double") * 1_000_000 + 0.5)
         .cast("long").alias("retention_q6"))
