"""Generator property tests (SURVEY.md §5.1 invariants, §5.2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.datagen import ads_data


def test_cardinality_and_key_uniqueness(spark):
    df = ads_data(spark, num_campaigns=5, edge_rows=False)
    assert df.count() == 5 * 5 * 3 * 60
    assert df.select("campaign_id", "adset_id", "creative_id", "dt") \
             .distinct().count() == 4500


def test_reference_invariants(spark):
    """generate_ads_data.py:22-25 bounds hold for every row."""
    df = ads_data(spark, num_campaigns=5, edge_rows=False)
    bad = df.where(
        ~F.col("impressions").between(500, 5000)
        | (F.col("clicks") < 0)
        | (F.col("clicks") > F.floor(F.col("impressions") * 0.2))
        | ~F.col("spend").between(10.0, 200.0)
        | (F.col("conversions") < 0)
        | (F.col("conversions") > F.col("clicks"))
    )
    assert bad.count() == 0


def test_deterministic_across_partitioning(spark):
    """hash-derived uniforms: same values no matter how the cross
    product is partitioned (F.rand would fail this)."""
    a = ads_data(spark, num_campaigns=3, edge_rows=False)
    b = ads_data(spark, num_campaigns=3, edge_rows=False).repartition(17)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
