"""Python Data Source API (sources/pysource.py): the custom connector
must be partition-parallel and emit identical rows for ANY partition
count (the datagen determinism discipline applied to a source)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.sources.pysource import (
    register_python_sources,
)


def _read(spark, rows, parts):
    register_python_sources(spark)
    return (spark.read.format("eventsynth")
            .option("rows", rows).option("partitions", parts).load())


def test_eventsynth_partition_parallel(spark):
    df = _read(spark, 10_000, 8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 10_000
    assert df.select("event_id").distinct().count() == 10_000


def test_eventsynth_deterministic_across_partitionings(spark):
    a = _read(spark, 5_000, 2)
    b = _read(spark, 5_000, 7)
    fp = lambda d: d.agg(  # noqa: E731
        F.sum(F.hash("event_id", "user_id", "value")).alias("h"),
        F.count(F.lit(1)).alias("n")).first()
    assert fp(a) == fp(b)


def test_eventsynth_composes_with_engine_ops(spark):
    """The Python source is a normal DataFrame underneath: aggregation,
    filters, joins all apply."""
    df = _read(spark, 2_000, 4)
    top = (df.where(F.col("value") > 100.0)
           .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
           .orderBy(F.desc("n"), "user_id").limit(5))
    assert top.count() == 5
