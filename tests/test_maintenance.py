"""Lakehouse-maintenance operator tests: small-files compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.sources.readers import compact_parquet


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    src = spark.range(0, 20_000).withColumn("v", F.col("id") * 2)
    # simulate an incremental-append mess: 40 tiny files
    src.repartition(40).write.parquet(path)
    import os
    n_before = len([f for f in os.listdir(path) if f.startswith("part-")])
    assert n_before >= 40
    before = src.groupBy().agg(F.sum("v").alias("s")).collect()[0].s
    n_after = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert n_after < n_before and n_after >= 1
    back = spark.read.parquet(path)
    assert back.count() == 20_000
    assert back.groupBy().agg(F.sum("v").alias("s")).collect()[0].s == before
