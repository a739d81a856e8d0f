"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
config block is what we would ship to a 1000-executor cluster — everything
scale-critical (AQE, adaptive shuffle partition coalescing, skew-join
handling, broadcast thresholds) is enabled here rather than hand-tuned
per-query.

Reference lifecycle being replaced: single-threaded client with blocking DB
round-trips (reference oracle_to_snowflake.py:29-33, SURVEY.md §3.4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Databases mirroring the reference's three-layer namespace
# (reference transform_staging.py:20-21, SURVEY.md §1.5).
NAMESPACES = ("staging", "production", "public_rpt")


def get_spark(app_name: str = "oracle_to_snowflake_etl_spark",
              master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the SparkSession.

    All settings are cluster-safe defaults, not local-only hacks:
      - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
        and dynamic broadcast-join conversion (SURVEY.md §4.2).
      - shuffle.partitions: a baseline; AQE coalesces down. At 100 TB this
        would be raised (or left to AQE's advisory target) — partition count
        scales with input, not hardcoded per query.
      - UTC session timezone: deterministic date semantics across engines.
      - Arrow enabled: vectorized toPandas()/pandas_udf transfer.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # Partition-dir listing below this count happens driver-side
        # (milliseconds of FS RPCs) instead of as a distributed Spark
        # job that pays a full scheduling round-trip; the default (32)
        # forces a listing JOB for every partitioned ANN/MV store read
        # (48+ cell dirs). At 100 TB a table with >1024 partition dirs
        # re-engages the parallel path automatically — this moves the
        # crossover, it does not disable the mechanism. Env-tunable.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                os.environ.get("SPARK_GRAFT_PART_DISCOVERY_THRESHOLD",
                               "1024"))
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type — read as long, convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate synthesizes `size(arr) > 0` from every
        # explode; predicate pushdown then inlines the generator's input
        # expression into that filter BELOW the projections, so an
        # expensive array pipeline (shingling, MinHash folds, UDF codes)
        # is recomputed per row — measured 12x on 3-gram shingling. The
        # rule only saves skipping empty arrays; exclude it.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def bootstrap_catalog(spark: SparkSession) -> None:
    """Idempotently create the medallion namespaces (reference S12:
    ``CREATE SCHEMA IF NOT EXISTS`` at transform_staging.py:20-21)."""
    for db in NAMESPACES:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
