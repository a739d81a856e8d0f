"""Explicit StructTypes for every table the engine touches.

The reference declares schemas via DDL and never infers in production paths
(reference README.md:107-116, SURVEY.md §1.3); we mirror that rule: every
read goes through one of these StructTypes, never ``inferSchema``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference fact table (reference README.md:107-116 Oracle DDL;
# oracle_to_snowflake.py:63-74 Snowflake staging DDL). SURVEY.md §1.1.
# ---------------------------------------------------------------------------

ADS_DATA = T.StructType([
    T.StructField("campaign_id", T.LongType()),
    T.StructField("adset_id", T.LongType()),
    T.StructField("creative_id", T.LongType()),
    T.StructField("dt", T.DateType()),
    T.StructField("impressions", T.LongType()),
    T.StructField("clicks", T.LongType()),
    T.StructField("spend", T.DoubleType()),
    T.StructField("conversions", T.LongType()),
])

# Composite logical key (reference insert_ads_data.py:30-31,
# oracle_to_snowflake.py:84-86 — enforced by anti-join, never a constraint).
ADS_KEY_COLS = ["campaign_id", "adset_id", "creative_id", "dt"]

# Curated table = ADS_DATA + 4 derived KPI doubles
# (reference transform_staging.py:26-38).
CAMPAIGN_DAILY_METRICS = T.StructType(
    ADS_DATA.fields + [
        T.StructField("ctr", T.DoubleType()),
        T.StructField("cpm", T.DoubleType()),
        T.StructField("cpc", T.DoubleType()),
        T.StructField("cpa", T.DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/; TESTDATA.md). Parquet carries
# its own schema; these StructTypes document the expected shape and are used
# to validate reads.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType()),
    T.StructField("l_partkey", T.LongType()),
    T.StructField("l_suppkey", T.LongType()),
    T.StructField("l_linenumber", T.IntegerType()),
    T.StructField("l_quantity", T.DoubleType()),
    T.StructField("l_extendedprice", T.DoubleType()),
    T.StructField("l_discount", T.DoubleType()),
    T.StructField("l_tax", T.DoubleType()),
    T.StructField("l_returnflag", T.StringType()),
    T.StructField("l_linestatus", T.StringType()),
    T.StructField("l_shipdate", T.TimestampType()),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
    T.StructField("o_orderdate", T.TimestampType()),
    T.StructField("o_orderpriority", T.StringType()),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])
