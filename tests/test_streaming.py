"""Structured Streaming facade tests (SURVEY.md §7.4): the J1
incremental pattern as an AvailableNow stream (idempotent across runs,
dedup within and across batches), the watermarked window agg equals its
batch twin, and the custom stateful operator counts correctly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.datagen import ads_data
from oracle_to_snowflake_etl_spark.schemas import ADS_DATA, ADS_KEY_COLS
from oracle_to_snowflake_etl_spark.sources.readers import load_table
from oracle_to_snowflake_etl_spark.streaming.jobs import (
    incremental_append_stream,
    read_ads_stream,
    user_running_stats,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    tgt = tmp_path / "tgt"
    ckp = tmp_path / "ckp"
    src.mkdir()
    return str(src), str(tgt), str(ckp)


def _run_stream(spark, src, tgt, ckp):
    q = incremental_append_stream(read_ads_stream(spark, src), tgt, ckp)
    q.awaitTermination(120)
    return spark.read.schema(ADS_DATA).parquet(tgt)


def test_incremental_stream_dedups_and_is_idempotent(spark, dirs):
    src, tgt, ckp = dirs
    data = ads_data(spark, num_campaigns=2, edge_rows=False)
    half = data.where(F.col("campaign_id") == 1)

    # batch 1: first campaign
    half.write.mode("append").parquet(src)
    out1 = _run_stream(spark, src, tgt, ckp)
    assert out1.count() == half.count()

    # batch 2: FULL data (overlaps batch 1) + a duplicated file of it ->
    # within-batch dedup + cross-run anti-join must both kick in
    data.write.mode("append").parquet(src)
    data.write.mode("append").parquet(src)
    out2 = _run_stream(spark, src, tgt, ckp)
    assert out2.count() == data.count()
    assert out2.select(*ADS_KEY_COLS).distinct().count() == data.count()

    # run 3 with nothing new: no growth
    out3 = _run_stream(spark, src, tgt, ckp)
    assert out3.count() == data.count()


def test_windowed_counts_match_batch(spark, tmp_path):
    """Stream (AvailableNow over the events parquet) == batch groupBy —
    the strongest equivalence check available without a live source."""
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "ev")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream, window="5 minutes")
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("win_counts")

    expected = (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )
    diff = got.select("w_start", "event_type", "n").exceptAll(expected)
    assert diff.count() == 0
    assert got.count() == expected.count()


def test_user_running_stats_state(spark, tmp_path):
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "ev2")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    out = user_running_stats(stream)
    q = (out.writeStream.format("memory").queryName("user_stats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # final state per user (last update wins) must equal the batch count
    got = (spark.table("user_stats")
           .groupBy("user_id").agg(F.max("n_events").alias("n_events")))
    expected = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
