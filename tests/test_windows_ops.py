"""Window-operator unit tests: parameterized column names (the operators
must work on ANY events-shaped input, not just one with event_id/value
columns) and exact floor-division bucket semantics for pre-epoch
timestamps (DuckDB's ``//`` floors; a truncating division would diverge).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.operators.windows import (
    session_stats,
    sessionize,
    sessionize_bucketed,
    tumbling_counts,
)

UTC = datetime.timezone.utc


def _renamed_events(spark):
    rows = [
        # uid 1: two events 10 min apart (one session), then 40 min gap
        (1, datetime.datetime(2026, 8, 1, 10, 0, tzinfo=UTC), 101, 1.5, "click"),
        (1, datetime.datetime(2026, 8, 1, 10, 10, tzinfo=UTC), 102, 2.5, "view"),
        (1, datetime.datetime(2026, 8, 1, 10, 50, tzinfo=UTC), 103, 4.0, "click"),
        # uid 2: single event
        (2, datetime.datetime(2026, 8, 1, 9, 0, tzinfo=UTC), 201, 7.0, "view"),
    ]
    return spark.createDataFrame(
        rows, "uid long, tstamp timestamp, eid long, amount double, event_type string")


def test_sessionize_renamed_columns(spark):
    out = sessionize(_renamed_events(spark), user_col="uid", ts_col="tstamp",
                     tiebreak_col="eid").collect()
    sess = {r.eid: r.session_id for r in out}
    assert sess[101] == 1 and sess[102] == 1  # within the 30-min gap
    assert sess[103] == 2                      # 40-min idle -> new session
    assert sess[201] == 1


def test_session_stats_renamed_columns(spark):
    out = session_stats(_renamed_events(spark), user_col="uid",
                        ts_col="tstamp", tiebreak_col="eid",
                        value_col="amount").collect()
    by_key = {(r.uid, r.session_id): r for r in out}
    s11 = by_key[(1, 1)]
    assert s11.n_events == 2
    assert s11.value_sum == 4.0
    assert s11.span_us == 10 * 60 * 1_000_000
    assert by_key[(1, 2)].n_events == 1
    assert by_key[(2, 1)].value_sum == 7.0


def test_tumbling_floor_semantics_pre_epoch(spark):
    """Bucket ids must FLOOR, not truncate toward zero: an event before
    1970 lands in a negative bucket exactly like DuckDB's ``//``."""
    rows = [
        (datetime.datetime(1969, 12, 31, 23, 58, tzinfo=UTC), "click", 1.0),
        (datetime.datetime(1970, 1, 1, 0, 2, tzinfo=UTC), "click", 1.0),
        (datetime.datetime(1970, 1, 1, 0, 7, tzinfo=UTC), "view", 1.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    got = {(r.window_id, r.event_type): r.n
           for r in tumbling_counts(df, minutes=5).collect()}
    bucket = 5 * 60 * 1_000_000
    exp_pre = int(datetime.datetime(1969, 12, 31, 23, 58,
                                    tzinfo=UTC).timestamp() * 1_000_000) // bucket
    assert exp_pre == -1  # python // floors, the contract to match
    assert got[(-1, "click")] == 1
    assert got[(0, "click")] == 1
    assert got[(1, "view")] == 1


def test_sessionize_bucketed_equals_plain_on_testdata(spark, sf_dir):
    """The skew-safe (user, bucket) pre-split + stitch must reproduce
    plain sessionize's ids EXACTLY on the real events table."""
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    plain = sessionize(ev).select("event_id", "session_id")
    bucketed = sessionize_bucketed(ev).select("event_id", "session_id")
    assert plain.exceptAll(bucketed).count() == 0
    assert bucketed.exceptAll(plain).count() == 0


def test_sessionize_bucketed_stitches_cross_boundary_sessions(spark):
    """A session spanning three 1-hour buckets (events 20 min apart over
    2.5 h) must stitch into ONE session; a later isolated event starts
    session 2."""
    base = datetime.datetime(2026, 8, 1, 9, 50, tzinfo=UTC)
    rows = [(1, base + datetime.timedelta(minutes=20 * i), 100 + i, 1.0)
            for i in range(8)]                      # 09:50 .. 12:10
    rows.append((1, base + datetime.timedelta(hours=6), 200, 1.0))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double")
    out = sessionize_bucketed(df, bucket_hours=1).collect()
    sess = {r.event_id: r.session_id for r in out}
    assert all(sess[100 + i] == 1 for i in range(8))
    assert sess[200] == 2
    # and it agrees with plain sessionize on the same input
    plain = {r.event_id: r.session_id for r in sessionize(df).collect()}
    assert sess == plain


def test_tumbling_value_col_renamed(spark):
    rows = [(datetime.datetime(2026, 8, 1, 0, 1, tzinfo=UTC), "click", 2.25),
            (datetime.datetime(2026, 8, 1, 0, 2, tzinfo=UTC), "click", 0.75)]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, amt double")
    out = tumbling_counts(df, minutes=5, value_col="amt").collect()
    assert len(out) == 1 and out[0].n == 2 and out[0].value_sum == 3.0


def test_twap_single_shuffle_and_reduces_to_avg(spark, sf_dir):
    """TWAP plans ONE exchange (the groupBy reuses the window's hash
    partitioning), and with UNIFORM durations it degenerates to the
    plain mean of the non-final observations — the sanity anchor."""
    from oracle_to_snowflake_etl_spark.operators.windows import (
        time_weighted_avg,
    )
    from oracle_to_snowflake_etl_spark.plans.inspect import exchange_count
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    events = load_table(spark, sf_dir, "events")
    out = time_weighted_avg(events)
    assert exchange_count(out) <= 1

    # uniform-duration anchor: equally spaced synthetic timeline
    rows = [(1, i, float(10 + i)) for i in range(5)]
    df = spark.createDataFrame(rows, "user_id long, sec long, value double") \
        .select("user_id", F.timestamp_seconds(F.col("sec") * 60).alias("ts"),
                F.col("sec").alias("event_id"), "value")
    got = time_weighted_avg(df).collect()[0]
    # last value (14.0) carries no duration; mean of 10..13 = 11.5
    assert got.twap_q6 == 11_500_000
    assert got.n_intervals == 4
