"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `yashydv110/oracle-to-snowflake-etl` ETL
pipeline (see SURVEY.md), re-expressed Spark-first.

Layout (SURVEY.md §7.1):
  session      SparkSession factory + catalog bootstrap
  schemas      explicit StructTypes (reference §1.3: never inferSchema in prod paths)
  datagen      deterministic distributed ads_data generator (reference S13)
  sources/     scans & sinks: parquet/csv/jdbc + idempotent DDL (S1-S12)
  operators/   transforms, incremental load, analytics, dedup, similarity, text
  functions/   scalar function surface + Snowflake-dialect SQL shim (F1-F11)
  plans/       plan-inspection helpers (pushdown/broadcast assertions)
  streaming/   Structured Streaming facade for the incremental pattern (§7.4)
  pipeline     the reference's entry points A/B/C as composable jobs
"""

__version__ = "0.1.0"
