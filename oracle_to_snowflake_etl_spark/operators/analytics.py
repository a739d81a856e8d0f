"""The reference's analytics surface (SURVEY.md §2.4-2.5) as reusable ops.

Reference queries (analytics_reports.ipynb cells 3-5; README.md:394-418):
  A1+O1  top-10 campaigns by SUM(SPEND) over the last 14 days
  A2+O2  daily AVG(CTR) trend ordered by DT
  A3+O1  per-creative SUM(IMPRESSIONS), SUM(CLICKS), AVG(CPC), top-10

Physical notes (why this shape scales, SURVEY.md §4):
  - groupBy().agg() plans HashAggregateExec with partial (map-side) + final
    phases — the shuffle carries one row per (partition × group), not per
    input row.
  - orderBy(...).limit(k) plans TakeOrderedAndProject — a distributed
    top-k (per-partition heap + driver merge), never a global sort.
  - All aggregates offered in exact (decimal-sum) form for reproducible
    results across partitionings (functions/exact.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import DEC_RATIO, davg, dsum


def top_n_by(df: DataFrame, group_cols: list[str], measure: Column,
             measure_name: str, n: int = 10,
             tiebreak: list[str] | None = None) -> DataFrame:
    """Reference A1+O1 (top-10 campaigns by spend): group → aggregate →
    deterministic top-N. Tie-break on the group key so the result set is
    stable across engines and partitionings."""
    agg = df.groupBy(*group_cols).agg(measure.alias(measure_name))
    order = [F.desc(measure_name)] + [F.asc(c) for c in (tiebreak or group_cols)]
    return agg.orderBy(*order).limit(n)


def trend(df: DataFrame, time_col: Column, time_name: str,
          aggs: dict[str, Column]) -> DataFrame:
    """Reference A2+O2 (daily AVG(CTR) ordered by day)."""
    agg = df.groupBy(time_col.alias(time_name)).agg(
        *[c.alias(name) for name, c in aggs.items()])
    return agg.orderBy(time_name)


def top_spenders(metrics: DataFrame, anchor_date: str, n: int = 10,
                 days: int = 14) -> DataFrame:
    """Notebook cell 3 verbatim semantics on the curated ads table:
    SELECT CAMPAIGN_ID, SUM(SPEND) AS TOTAL_SPEND
    WHERE DT >= DATEADD('day',-14,CURRENT_DATE) GROUP BY 1
    ORDER BY TOTAL_SPEND DESC LIMIT 10  (anchor parameterized: §7.3)."""
    recent = metrics.filter(
        F.col("dt") >= F.date_sub(F.to_date(F.lit(anchor_date)), days))
    return top_n_by(recent, ["campaign_id"], dsum("spend"), "total_spend", n)


def ctr_trend(metrics: DataFrame) -> DataFrame:
    """Notebook cell 4: SELECT DT, AVG(CTR) AS AVG_CTR GROUP BY DT ORDER BY DT."""
    return trend(metrics, F.col("dt"), "dt",
                 {"avg_ctr": davg("ctr", dec=DEC_RATIO)})


def creative_perf(metrics: DataFrame, n: int = 10) -> DataFrame:
    """Notebook cell 5: per-creative SUM(IMPRESSIONS), SUM(CLICKS), AVG(CPC)
    ordered by total impressions desc, top-10."""
    agg = metrics.groupBy("creative_id").agg(
        F.sum("impressions").alias("total_impressions"),
        F.sum("clicks").alias("total_clicks"),
        davg("cpc", "avg_cpc", dec=DEC_RATIO),
    )
    return agg.orderBy(F.desc("total_impressions"), F.asc("creative_id")).limit(n)
