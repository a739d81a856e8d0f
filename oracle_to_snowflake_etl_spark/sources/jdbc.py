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
    the reference's manual key-projection S6 for free, and
    :func:`key_projection_subquery` builds the explicit form);
  - writes batch ``batchsize`` rows per round-trip per partition.

No Oracle/Snowflake driver jars ship in this environment, but Spark
bundles embedded Derby — tests/test_jdbc_roundtrip.py executes the
batched sink, the partition-parallel ranged scan, and the S6 pushdown
subquery against a real JDBC database in-process; the option
construction is additionally unit-tested driver-free
(tests/test_jdbc_options.py). The local pipeline runs on parquet via the
same DataFrame contracts (SURVEY.md §7.2 build order #6: adapters behind
an interface; the pipeline code doesn't know which is underneath).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: reference DSNs (reference .env.example semantics — values come from env)
ORACLE_URL_TEMPLATE = "jdbc:oracle:thin:@//{host}:{port}/{service}"
SNOWFLAKE_URL_TEMPLATE = "jdbc:snowflake://{account}.snowflakecomputing.com"


def resolve_jdbc_env(prefix: str, env: dict[str, str] | None = None,
                     template: str | None = None) -> dict[str, str]:
    """The reference's ``.env`` config resolution (oracle_to_snowflake.py
    :12-25 reads ORACLE_USER/ORACLE_PASSWORD/ORACLE_HOST/... via
    python-dotenv), engine-side: collect ``{PREFIX}_*`` connection vars
    from the environment into the kwargs :func:`jdbc_scan_options` /
    ``jdbc_write_options`` take, formatting a DSN template when the
    needed fields are present.

    Recognized vars (all optional; absent keys are simply omitted so the
    caller's explicit kwargs win): ``{PREFIX}_URL``, ``{PREFIX}_USER``,
    ``{PREFIX}_PASSWORD``, ``{PREFIX}_DRIVER``, plus the template fields
    ``{PREFIX}_HOST``/``{PREFIX}_PORT``/``{PREFIX}_SERVICE`` (Oracle
    form) and ``{PREFIX}_ACCOUNT`` (Snowflake form). An explicit
    ``{PREFIX}_URL`` beats a formatted template. Credentials stay out of
    code and logs exactly as the reference intends — this function never
    prints, and the returned dict is passed straight to the JDBC reader.

    >>> resolve_jdbc_env("ORACLE", {"ORACLE_HOST": "db", "ORACLE_PORT":
    ...     "1521", "ORACLE_SERVICE": "XE", "ORACLE_USER": "scott"},
    ...     template=ORACLE_URL_TEMPLATE)
    {'url': 'jdbc:oracle:thin:@//db:1521/XE', 'user': 'scott'}
    """
    import os

    env = os.environ if env is None else env
    get = lambda k: env.get(f"{prefix}_{k}")  # noqa: E731
    out: dict[str, str] = {}
    url = get("URL")
    if url is None and template is not None:
        fields = {"host": get("HOST"), "port": get("PORT"),
                  "service": get("SERVICE"), "account": get("ACCOUNT")}
        needed = [f for f in ("host", "port", "service", "account")
                  if "{%s}" % f in template]
        if needed and all(fields[f] is not None for f in needed):
            url = template.format(**{f: fields[f] for f in needed})
    if url is not None:
        out["url"] = url
    for key, opt in (("USER", "user"), ("PASSWORD", "password"),
                     ("DRIVER", "driver")):
        val = get(key)
        if val is not None:
            out[opt] = val
    return out


def key_projection_subquery(table: str, cols: list[str],
                            predicate: str | None = None,
                            alias: str = "src") -> str:
    """Reference S6 (oracle_to_snowflake.py:78): the explicit remote
    key-projection scan as a pushdown subquery for ``dbtable`` — only
    ``cols`` travel over the wire, optionally pre-filtered remotely."""
    where = f" WHERE {predicate}" if predicate else ""
    return f"(SELECT {', '.join(cols)} FROM {table}{where}) {alias}"


def jdbc_scan_options(url: str, table: str, *,
                      user: str | None = None, password: str | None = None,
                      driver: str | None = None,
                      partition_column: str | None = None,
                      lower_bound: int | None = None,
                      upper_bound: int | None = None,
                      num_partitions: int = 16,
                      fetch_size: int = 10_000,
                      options: dict | None = None) -> dict[str, str]:
    """Pure option builder for a partition-parallel JDBC scan — separated
    from the reader so the partitioning/pushdown logic is unit-testable
    without a driver jar."""
    out: dict[str, str] = {
        "url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    if user is not None:
        out["user"] = user
    if password is not None:
        out["password"] = password
    if driver is not None:
        out["driver"] = driver
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC scan needs lower_bound/upper_bound "
                "(run MIN/MAX once remotely and pass them in)")
        out.update({
            "partitionColumn": partition_column,
            "lowerBound": str(lower_bound),
            "upperBound": str(upper_bound),
            "numPartitions": str(num_partitions),
        })
    out.update({k: str(v) for k, v in (options or {}).items()})
    return out


def jdbc_write_options(url: str, table: str, *,
                       user: str | None = None, password: str | None = None,
                       driver: str | None = None,
                       batch_size: int = 10_000,
                       options: dict | None = None) -> dict[str, str]:
    """Pure option builder for the batched JDBC sink."""
    out: dict[str, str] = {
        "url": url, "dbtable": table, "batchsize": str(batch_size)}
    if user is not None:
        out["user"] = user
    if password is not None:
        out["password"] = password
    if driver is not None:
        out["driver"] = driver
    out.update({k: str(v) for k, v in (options or {}).items()})
    return out


def read_jdbc(spark: SparkSession, url: str, table: str,
              **kwargs) -> DataFrame:
    """Partition-parallel JDBC scan (reference S4's `SELECT * FROM
    ADS_DATA` without the client-RAM fetchall cliff at
    oracle_to_snowflake.py:33).

    ``table`` may be a table name or a pushdown subquery alias
    (:func:`key_projection_subquery`). With ``partition_column``
    (numeric/date) the scan issues ``num_partitions`` concurrent range
    queries; without it the scan is single-stream (correct, not fast —
    fine for small dims).
    """
    return (spark.read.format("jdbc")
            .options(**jdbc_scan_options(url, table, **kwargs))
            .load())


def write_jdbc(df: DataFrame, url: str, table: str, *,
               mode: str = "append", **kwargs) -> None:
    """Batched parallel JDBC sink (reference S5/S7: the 45k single-row
    round-trips of insert_ads_data.py:35-50 become
    ceil(rows/batch_size) statements per partition, all partitions
    concurrent — the ``write_pandas``/bulk path README.md:346 wishes
    for, native to the engine)."""
    (df.write.format("jdbc")
     .options(**jdbc_write_options(url, table, **kwargs))
     .mode(mode)
     .save())
