"""The reference's three entry points as composable Spark jobs
(SURVEY.md §3): A incremental cross-system ETL, B in-warehouse SQL
transform, C analytics — re-hosted on the Spark SQL catalog.

Namespace mapping (SURVEY.md §1.5): STAGING.ADS_DATA_STG ->
staging.ads_data_stg; PRODUCTION.CAMPAIGN_DAILY_METRICS ->
production.campaign_daily_metrics; PUBLIC...VIEW ->
public_rpt.campaign_daily_metrics_view (``public`` is reserved-ish in
some catalogs; the suffix keeps it portable).

What used to be three network boundaries + client RAM materialization
(reference oracle_to_snowflake.py fetchall at :33) is now one lazy plan
per job; the only driver-side values are the reconciliation counts the
reference prints at every hop (SURVEY.md §5.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.kpis import with_kpis
from .operators.analytics import creative_perf, ctr_trend, top_spenders
from .operators.incremental import incremental_delta
from .operators.transform import normalize_ads_df
from .schemas import ADS_DATA, ADS_KEY_COLS
from .session import bootstrap_catalog

STAGING_TABLE = "staging.ads_data_stg"
CURATED_TABLE = "production.campaign_daily_metrics"
REPORT_VIEW = "public_rpt.campaign_daily_metrics_view"

_DDL_COLS = ", ".join(
    f"{f.name} {f.dataType.simpleString()}" for f in ADS_DATA.fields)


def ensure_staging_table(spark: SparkSession,
                         table: str = STAGING_TABLE) -> None:
    """Reference S8 idempotent DDL (oracle_to_snowflake.py:63-74;
    README.md:202-218): CREATE IF NOT EXISTS, swallowing nothing — the
    catalog handles existence natively (no ORA-955 dance)."""
    bootstrap_catalog(spark)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({_DDL_COLS}) USING parquet")


def incremental_load(spark: SparkSession, source: DataFrame,
                     table: str = STAGING_TABLE) -> int:
    """Entry point A (reference oracle_to_snowflake.py; SURVEY.md §3.1):
    normalize -> anti-join against the target's key projection (J1) ->
    append only never-seen keys. Returns the inserted count (the
    reconciliation number the reference logs at :87/:112).

    Idempotent: a second run with the same source inserts 0 rows.
    """
    ensure_staging_table(spark, table)
    src = normalize_ads_df(source)
    existing_keys = spark.table(table).select(*ADS_KEY_COLS)
    delta = incremental_delta(src, existing_keys, ADS_KEY_COLS)
    # Two actions on one plan: count + append. The count is the ONLY
    # driver-side materialization in the whole pipeline.
    n = delta.count()
    if n:
        delta.write.mode("append").insertInto(table)
    return n


def transform_to_curated(spark: SparkSession,
                         staging_table: str = STAGING_TABLE,
                         curated_table: str = CURATED_TABLE,
                         view: str = REPORT_VIEW) -> int:
    """Entry point B (reference transform_staging.py; SURVEY.md §3.2):
    CTAS the curated KPI table (S9) + CREATE OR REPLACE VIEW (S10).
    Catalyst now runs the parse/analyze/optimize/execute lifecycle that
    Snowflake provided. Returns the curated row count (S9's check)."""
    bootstrap_catalog(spark)
    curated = with_kpis(spark.table(staging_table))
    curated.write.mode("overwrite").saveAsTable(curated_table)
    spark.sql(f"CREATE OR REPLACE VIEW {view} AS SELECT * FROM {curated_table}")
    return spark.table(curated_table).count()


def full_refresh(spark: SparkSession,
                 staging_table: str = STAGING_TABLE,
                 curated_table: str = CURATED_TABLE) -> int:
    """Reference S11 truncate-reload alternative (README.md:377-385):
    INSERT OVERWRITE instead of drop/CTAS — same result, keeps table
    metadata/grants stable."""
    curated = with_kpis(spark.table(staging_table))
    curated.write.mode("overwrite").insertInto(curated_table)
    return spark.table(curated_table).count()


def analytics_bundle(spark: SparkSession, anchor: str,
                     view: str = REPORT_VIEW) -> dict[str, DataFrame]:
    """Entry point C (reference notebook cells 3-5; SURVEY.md §3.3): the
    three reporting queries over the public view, anchor parameterized
    (no wall-clock CURRENT_DATE — SURVEY.md §7.3)."""
    metrics = spark.table(view)
    return {
        "top_spenders": top_spenders(metrics, anchor),
        "ctr_trend": ctr_trend(metrics),
        "creative_perf": creative_perf(metrics),
    }


def analyze_table(spark: SparkSession, table: str,
                  columns: list[str] | None = None) -> dict[str, str]:
    """Collect catalog statistics after publishing a table — the step
    that turns the cost-based optimizer on for everything downstream:
    row counts / sizes drive join-side selection and broadcast
    decisions from METADATA instead of runtime guesses, and column
    min/max/ndv feed join reordering. (AQE corrects at runtime from
    actual shuffle sizes; stats let the FIRST plan be right — at 100 TB
    the difference is a re-planned stage vs a correct initial one.)
    Returns the stats the catalog now holds, for logging/asserts.
    """
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS "
                  f"FOR COLUMNS {', '.join(columns)}")
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    return {r.col_name: r.data_type for r in rows
            if r.col_name in ("Statistics",)}


def drop_all(spark: SparkSession) -> None:
    """Test/support helper: tear down pipeline objects (idempotent)."""
    spark.sql(f"DROP VIEW IF EXISTS {REPORT_VIEW}")
    for t in (CURATED_TABLE, STAGING_TABLE):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
