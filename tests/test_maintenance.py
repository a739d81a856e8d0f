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


def test_write_partitioned_prunes_partitions(spark, tmp_path):
    """A filter on the partition column must resolve as PartitionFilters
    (directory pruning at planning time), and the layout must produce
    one file per partition value, not tasks x partitions."""
    import os

    from oracle_to_snowflake_etl_spark.plans.inspect import partition_filters
    from oracle_to_snowflake_etl_spark.sources.readers import write_partitioned

    path = str(tmp_path / "part")
    src = spark.range(0, 10_000).select(
        (F.col("id") % 7).alias("day"), F.col("id").alias("v"))
    write_partitioned(src, path, ["day"], sort_cols=["v"])
    # one directory per day, one data file per directory
    days = [d for d in os.listdir(path) if d.startswith("day=")]
    assert len(days) == 7
    for d in days:
        files = [f for f in os.listdir(os.path.join(path, d))
                 if f.startswith("part-")]
        assert len(files) == 1, f"{d}: {files}"
    back = spark.read.parquet(path)
    one = back.where(F.col("day") == 3)
    pf = partition_filters(one)
    assert any("day" in f for f in pf), pf
    assert one.count() == 10_000 // 7 + (1 if 3 < 10_000 % 7 else 0)
    # pruning is real: only day=3's single file is actually scanned
    # (inputFiles() lists the pre-pruning relation, so ask the executed
    # scan which files produced rows)
    scanned = [r.f for r in
               one.select(F.input_file_name().alias("f")).distinct().collect()]
    assert len(scanned) == 1 and "day=3" in scanned[0]


def test_approx_sketches_within_bounds(spark, sf_dir):
    """approx_count_distinct must land within its configured 2% rsd
    (generously 3x) of exact; approx_percentile within 5% of the exact
    median. This is the correctness contract an approximate scale-path
    offers — bounds, not equality."""
    from oracle_to_snowflake_etl_spark.queries import queries

    rows = queries()["approx_order_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_custs - r.exact_custs) <= max(3, 0.06 * r.exact_custs), r
        assert abs(r.approx_p50 - r.exact_p50) <= 0.05 * abs(r.exact_p50), r
