"""Migration-parity tests: the reference's VERBATIM SQL and file naming.

The single most reference-faithful demo the engine has: take the exact
SQL strings a reference user runs today (transform_staging.py:24-46 CTAS
+ view; README.md:394-418 notebook queries), push them through
functions/sqlshim, and get the same rows the DataFrame-API pipeline
produces on the same fixture. Plus the S2 versioned-filename rule
(generate_ads_data.py:48-52): date-stamped CSVs suffixed A, B, C… that
never overwrite.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark import pipeline as P
from oracle_to_snowflake_etl_spark.datagen import ads_data
from oracle_to_snowflake_etl_spark.functions.kpis import with_kpis
from oracle_to_snowflake_etl_spark.functions.sqlshim import (
    rewrite_snowflake_sql,
    run_snowflake_sql,
)
from oracle_to_snowflake_etl_spark.operators.analytics import (
    creative_perf,
    ctr_trend,
    top_spenders,
)
from oracle_to_snowflake_etl_spark.sources.readers import (
    read_csv_latest,
    versioned_csv_path,
    write_csv_versioned,
)
from oracle_to_snowflake_etl_spark.schemas import ADS_DATA

# --- the reference's SQL, verbatim -----------------------------------------

# transform_staging.py:24-40
CTAS_SQL = """
CREATE OR REPLACE TABLE PRODUCTION.CAMPAIGN_DAILY_METRICS AS
SELECT
    CAMPAIGN_ID,
    ADSET_ID,
    CREATIVE_ID,
    DT,
    IMPRESSIONS,
    CLICKS,
    SPEND,
    CONVERSIONS,
    IFF(NULLIF(IMPRESSIONS,0) IS NULL, 0, CLICKS/IMPRESSIONS::FLOAT) AS CTR,
    IFF(NULLIF(IMPRESSIONS,0) IS NULL, 0, (SPEND/IMPRESSIONS)*1000) AS CPM,
    IFF(NULLIF(CLICKS,0) IS NULL, 0, SPEND/CLICKS) AS CPC,
    IFF(NULLIF(CONVERSIONS,0) IS NULL, 0, SPEND/CONVERSIONS) AS CPA
FROM STAGING.ADS_DATA_STG;
"""

# transform_staging.py:43-46
VIEW_SQL = """
CREATE OR REPLACE VIEW PUBLIC_RPT.CAMPAIGN_DAILY_METRICS_VIEW AS
SELECT * FROM PRODUCTION.CAMPAIGN_DAILY_METRICS;
"""

# README.md:394-418 / analytics_reports.ipynb cells 3-5
Q_TOP_SPEND = """
SELECT CAMPAIGN_ID, SUM(SPEND) AS TOTAL_SPEND
FROM ETL_DB.CURATED.CAMPAIGN_DAILY_METRICS
WHERE DT >= DATEADD('day', -14, CURRENT_DATE)
GROUP BY CAMPAIGN_ID
ORDER BY TOTAL_SPEND DESC
LIMIT 10;
"""
Q_CTR_TREND = """
SELECT DT, AVG(CTR) AS AVG_CTR
FROM ETL_DB.CURATED.CAMPAIGN_DAILY_METRICS
GROUP BY DT
ORDER BY DT;
"""
Q_CREATIVE = """
SELECT CREATIVE_ID, SUM(IMPRESSIONS) AS IMPS, SUM(CLICKS) AS CLKS, AVG(CPC) AS AVG_CPC
FROM ETL_DB.CURATED.CAMPAIGN_DAILY_METRICS
GROUP BY CREATIVE_ID
ORDER BY IMPS DESC
LIMIT 10;
"""

#: the reference's notebook names -> our catalog (pipeline.py namespace map)
TABLE_MAP = {"ETL_DB.CURATED.CAMPAIGN_DAILY_METRICS": P.CURATED_TABLE}


@pytest.fixture(scope="module")
def staged(spark):
    P.drop_all(spark)
    src = ads_data(spark, num_campaigns=4, num_days=20)
    P.incremental_load(spark, src)
    yield spark
    P.drop_all(spark)


def _pdf(df):
    p = df.toPandas()
    p.columns = [c.lower() for c in p.columns]
    return p[sorted(p.columns)]


def _assert_same_rows(sql_df, api_df, sort_cols, exact=False):
    a, b = _pdf(sql_df), _pdf(api_df)
    assert list(a.columns) == list(b.columns)
    a = a.sort_values(sort_cols).reset_index(drop=True)
    b = b.sort_values(sort_cols).reset_index(drop=True)
    assert len(a) == len(b)
    for c in a.columns:
        if a[c].dtype.kind == "f" and not exact:
            # notebook aggregates: the shim runs IEEE double SUM/AVG, the
            # operators sum in DECIMAL (functions/exact.py) — equal to
            # rounding, not bitwise
            assert a[c].values == pytest.approx(b[c].values, rel=1e-9, nan_ok=True)
        else:
            assert a[c].equals(b[c]), f"column {c} differs"


def test_rewrite_shapes():
    out = rewrite_snowflake_sql(
        "SELECT IFF(A DIFF, 1, 2), X::FLOAT, Y::NUMBER(10,2), "
        "DATEADD('week', 2, D), TO_DATE(S, 'YYYY-MM-DD') FROM T")
    assert "IF(A DIFF, 1, 2)" in out
    assert "CAST(X AS DOUBLE)" in out
    assert "CAST(Y AS DECIMAL(10,2))" in out
    assert "DATE_ADD(D, 7 * (2))" in out
    assert "TO_DATE(S, 'yyyy-MM-dd')" in out
    assert "DIFF" in out  # word boundary respected


def test_ctas_verbatim_matches_dataframe_pipeline(staged):
    """transform_staging.py's CTAS through the shim == with_kpis, row for
    row and bit for bit (per-row arithmetic, no aggregation)."""
    spark = staged
    run_snowflake_sql(spark, CTAS_SQL)
    run_snowflake_sql(spark, VIEW_SQL)
    sql_out = spark.table(P.CURATED_TABLE)
    api_out = with_kpis(spark.table(P.STAGING_TABLE))
    cols = [F.col(c).alias(c.lower()) for c in sorted(sql_out.columns)]
    assert sql_out.select(*cols).exceptAll(api_out.select(*cols)).count() == 0
    assert api_out.select(*cols).exceptAll(sql_out.select(*cols)).count() == 0
    # the view the reference creates on top reports the same count
    assert spark.table(P.REPORT_VIEW).count() == sql_out.count()


def test_notebook_queries_verbatim(staged):
    """README.md:394-418 run unmodified (modulo the catalog name map) and
    match the operator implementations on the same curated table."""
    spark = staged
    run_snowflake_sql(spark, CTAS_SQL)
    metrics = spark.table(P.CURATED_TABLE)
    # cell 3 anchors on wall-clock CURRENT_DATE; give the operator the
    # same anchor (both sides evaluate "today" within this test run)
    anchor = datetime.date.today().isoformat()
    _assert_same_rows(run_snowflake_sql(spark, Q_TOP_SPEND, TABLE_MAP),
                      top_spenders(metrics, anchor), ["campaign_id"])
    _assert_same_rows(run_snowflake_sql(spark, Q_CTR_TREND, TABLE_MAP),
                      ctr_trend(metrics).withColumnRenamed("avg_ctr", "avg_ctr"),
                      ["dt"])
    _assert_same_rows(run_snowflake_sql(spark, Q_CREATIVE, TABLE_MAP),
                      creative_perf(metrics)
                      .withColumnRenamed("total_impressions", "imps")
                      .withColumnRenamed("total_clicks", "clks"),
                      ["creative_id"])


# --- S2: versioned file naming ---------------------------------------------

def test_versioned_csv_never_overwrites(spark, tmp_path):
    """generate_ads_data.py:48-52: first write of the day is …A.csv, the
    rerun bumps to …B.csv; read_csv_latest picks the newest letter."""
    d = str(tmp_path)
    df1 = ads_data(spark, 2, 1, 1, 2, edge_rows=False)
    df2 = ads_data(spark, 3, 1, 1, 2, edge_rows=False)
    p1 = write_csv_versioned(df1, d, date_str="2026-08-13")
    p2 = write_csv_versioned(df2, d, date_str="2026-08-13")
    assert p1.endswith("ads_data_2026-08-13A.csv")
    assert p2.endswith("ads_data_2026-08-13B.csv")
    # the next candidate path keeps bumping
    assert versioned_csv_path(d, "2026-08-13").endswith("C.csv")
    # both files exist (no overwrite), latest wins on read
    back = read_csv_latest(spark, d, ADS_DATA)
    assert back.count() == df2.count()
    assert back.count() != df1.count()
