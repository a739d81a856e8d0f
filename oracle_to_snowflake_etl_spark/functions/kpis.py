"""The reference's derived-metric contract (SURVEY.md §2.2 semantics note).

Reference transform_staging.py:35-38 computes, in Snowflake dialect:

    CTR = IFF(NULLIF(IMPRESSIONS,0) IS NULL, 0, CLICKS/IMPRESSIONS::FLOAT)
    CPM = IFF(NULLIF(IMPRESSIONS,0) IS NULL, 0, (SPEND/IMPRESSIONS)*1000)
    CPC = IFF(NULLIF(CLICKS,0)      IS NULL, 0, SPEND/CLICKS)
    CPA = IFF(NULLIF(CONVERSIONS,0) IS NULL, 0, SPEND/CONVERSIONS)

Two semantics we must preserve exactly:
  (a) denominator 0 OR NULL both yield 0 (NULLIF(NULL,0) IS NULL is true);
  (b) division is real (non-integer) division; final KPI type is double.

Everything here is pure Column expressions — JVM-side, whole-stage-codegen
eligible, zero Python UDFs (SURVEY.md §2.10: no UDFs needed for parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def safe_ratio(num: Column, den: Column, scale: float = 1.0) -> Column:
    """``IFF(NULLIF(den,0) IS NULL, 0, num/den * scale)`` as a Spark column.

    NULL-or-zero denominator -> 0.0 (reference guard, SURVEY.md P10/P11).
    """
    return (
        F.when(den.isNull() | (den == 0), F.lit(0.0))
        .otherwise((num / den) * F.lit(scale))
        .cast("double")
    )


def kpi_columns(impressions: Column, clicks: Column, spend: Column,
                conversions: Column) -> dict[str, Column]:
    return {
        "ctr": safe_ratio(clicks, impressions),
        "cpm": safe_ratio(spend, impressions, scale=1000.0),
        "cpc": safe_ratio(spend, clicks),
        "cpa": safe_ratio(spend, conversions),
    }


def with_kpis(df: DataFrame,
              impressions: str = "impressions", clicks: str = "clicks",
              spend: str = "spend", conversions: str = "conversions") -> DataFrame:
    """Append the 4 KPI columns to an ads_data-shaped DataFrame
    (reference transform_staging.py:24-40 CTAS body)."""
    return df.withColumns(
        kpi_columns(F.col(impressions), F.col(clicks), F.col(spend), F.col(conversions))
    )
