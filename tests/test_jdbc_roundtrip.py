"""REAL execution of the JDBC adapters (S4-S7) against embedded Derby.

Spark bundles the Derby jars (its Hive-metastore backend), which makes a
genuine in-process JDBC database available without any external service:
these tests run the actual partition-parallel scan, the batched sink,
and the S6 key-projection pushdown subquery over the wire — not just the
option construction (tests/test_jdbc_options.py covers that half).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.sources.jdbc import (
    key_projection_subquery,
    read_jdbc,
    write_jdbc,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _fingerprint(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("s_id"),
        F.sum("v").alias("s_v")).first()


def test_jdbc_write_then_full_scan(spark, tmp_path):
    """S5/S7 batched sink + S4 full-table scan, value-compared."""
    url = _url(tmp_path)
    src = spark.range(0, 10_000).select(
        "id", (F.col("id") % 97).alias("v"))
    write_jdbc(src, url, "ADS", mode="overwrite", driver=DRIVER,
               batch_size=1_000)
    back = read_jdbc(spark, url, "ADS", driver=DRIVER)
    assert _fingerprint(back) == _fingerprint(src)


def test_jdbc_partitioned_scan_matches_single_stream(spark, tmp_path):
    """S4 at scale: the ranged scan must open numPartitions concurrent
    range queries AND return exactly the single-stream row set."""
    url = _url(tmp_path)
    src = spark.range(0, 5_000).select("id", (F.col("id") % 7).alias("v"))
    write_jdbc(src, url, "P", mode="overwrite", driver=DRIVER)
    ranged = read_jdbc(spark, url, "P", driver=DRIVER,
                       partition_column="id", lower_bound=0,
                       upper_bound=5_000, num_partitions=8)
    assert ranged.rdd.getNumPartitions() == 8
    assert _fingerprint(ranged) == _fingerprint(src)


def test_jdbc_key_projection_subquery_pushdown(spark, tmp_path):
    """S6: the key-projection subquery must evaluate REMOTELY — only the
    projected, pre-filtered keys cross the wire."""
    url = _url(tmp_path)
    src = spark.range(0, 1_000).select("id", (F.col("id") % 10).alias("v"))
    write_jdbc(src, url, "K", mode="overwrite", driver=DRIVER)
    # Spark's JDBC writer creates case-preserved (quoted) columns, so the
    # remote subquery must quote them too — identifier quoting is a
    # dialect concern that belongs to the caller-supplied SQL fragments.
    sub = key_projection_subquery("K", ['"id"'], predicate='"v" = 3')
    keys = read_jdbc(spark, url, sub, driver=DRIVER)
    assert keys.columns == ["id"]
    got = sorted(r.id for r in keys.collect())
    assert got == [i for i in range(1_000) if i % 10 == 3]


def test_reference_flagship_cross_system_incremental(spark, tmp_path):
    """The reference's flagship scenario (oracle_to_snowflake.py) run on
    REAL JDBC end to end: scan the remote source, anti-join against the
    target's keys, append only the delta, batched sink back over JDBC —
    idempotent across runs, exactly-once effect per key."""
    from oracle_to_snowflake_etl_spark.operators.incremental import (
        incremental_delta,
    )

    url = _url(tmp_path)
    key = ["id"]

    def run_sync() -> int:
        src = read_jdbc(spark, url, "SRC", driver=DRIVER)
        try:
            existing = read_jdbc(spark, url, "TGT", driver=DRIVER) \
                .select(*key)
        except Exception:
            existing = None  # first run: target doesn't exist yet
        delta = src if existing is None else \
            incremental_delta(src, existing, key)
        delta = delta.cache()
        n = delta.count()
        if n:
            write_jdbc(delta, url, "TGT", mode="append", driver=DRIVER)
        delta.unpersist()
        return n

    day1 = spark.range(0, 500).select("id", (F.col("id") % 5).alias("v"))
    write_jdbc(day1, url, "SRC", mode="overwrite", driver=DRIVER)
    assert run_sync() == 500

    # day 2: source grows by 200 rows, overlapping keys re-extracted
    day2 = spark.range(0, 700).select("id", (F.col("id") % 5).alias("v"))
    write_jdbc(day2, url, "SRC", mode="overwrite", driver=DRIVER)
    assert run_sync() == 200  # only the new keys cross the wire back

    # day 3: nothing new -> no-op
    assert run_sync() == 0
    tgt = read_jdbc(spark, url, "TGT", driver=DRIVER)
    assert tgt.count() == 700
    assert tgt.select("id").distinct().count() == 700
