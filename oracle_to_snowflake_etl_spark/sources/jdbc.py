"""JDBC scans & sinks (reference S4-S7, SURVEY.md §2.1).

The reference moves rows with a single-threaded cursor: full-table
fetchall from Oracle (oracle_to_snowflake.py:29-36), per-row INSERT into
Oracle (insert_ads_data.py:35-50), executemany into Snowflake
(oracle_to_snowflake.py:104-110). Spark replaces all three with
partition-parallel JDBC:

  - scans split on a numeric partition column into numPartitions
    concurrent range queries (each executor opens its own connection);
  - predicates/column pruning push into the remote engine via Catalyst
    (a ``.select(keys)`` becomes ``SELECT keys FROM t`` remotely —
    the reference's manual key-projection S6 for free);
  - writes batch ``batchsize`` rows per round-trip per partition.

No JDBC driver jars ship in this environment, so these are exercised by
plan construction only; the call sites raise Spark's own clear error if
the driver class is absent. The local pipeline runs on parquet via the
same DataFrame contracts (SURVEY.md §7.2 build order #6: adapters behind
an interface; the pipeline code doesn't know which is underneath).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: reference DSNs (reference .env.example semantics — values come from env)
ORACLE_URL_TEMPLATE = "jdbc:oracle:thin:@//{host}:{port}/{service}"
SNOWFLAKE_URL_TEMPLATE = "jdbc:snowflake://{account}.snowflakecomputing.com"


def read_jdbc(spark: SparkSession, url: str, table: str, *,
              user: str | None = None, password: str | None = None,
              driver: str | None = None,
              partition_column: str | None = None,
              lower_bound: int | None = None, upper_bound: int | None = None,
              num_partitions: int = 16,
              fetch_size: int = 10_000,
              options: dict | None = None) -> DataFrame:
    """Partition-parallel JDBC scan (reference S4's `SELECT * FROM
    ADS_DATA` without the client-RAM fetchall cliff at
    oracle_to_snowflake.py:33).

    ``table`` may be a table name or a pushdown subquery alias:
    ``"(SELECT c1, c2 FROM t WHERE dt > DATE '2026-01-01') src"``.
    With ``partition_column`` (numeric/date) the scan issues
    ``num_partitions`` concurrent range queries; without it the scan is
    single-stream (correct, not fast — fine for small dims).
    """
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("fetchsize", fetch_size))
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC scan needs lower_bound/upper_bound "
                "(run MIN/MAX once remotely and pass them in)")
        reader = (reader
                  .option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(df: DataFrame, url: str, table: str, *,
               mode: str = "append",
               user: str | None = None, password: str | None = None,
               driver: str | None = None,
               batch_size: int = 10_000,
               options: dict | None = None) -> None:
    """Batched parallel JDBC sink (reference S5/S7: the 45k single-row
    round-trips of insert_ads_data.py:35-50 become
    ceil(rows/batch_size) statements per partition, all partitions
    concurrent — the ``write_pandas``/bulk path README.md:346 wishes
    for, native to the engine)."""
    writer = (df.write.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("batchsize", batch_size)
              .mode(mode))
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    if driver is not None:
        writer = writer.option("driver", driver)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()
