"""S13: the reference's synthetic ads-data generator, distributed.

Reference (generate_ads_data.py:8-42; README.md:141-172): 4-level nested
Python loop over campaign x adset x creative x day with random metrics
under invariants clicks <= 0.2*impressions, conversions <= clicks,
10 <= spend <= 200. Our port (FIXTURES.md §1):

  - the cross product is built with `spark.range` + `explode(sequence)`
    — fully distributed, no driver-side loop;
  - randomness is NOT `F.rand()`: rand(seed) is seeded per-partition, so
    values change with partitioning/parallelism. Instead each metric is
    a 60-bit md5 hash of (key columns + salt) mapped to a uniform
    (functions/hashing.hash60) — bit-identical on any cluster layout,
    which makes generated fixtures usable as golden inputs;
  - days are anchored at a FIXED date (FIXTURES.md: 2026-08-01), never
    wall-clock, so date-window queries stay deterministic (SURVEY.md
    §7.3);
  - the four KPI edge rows (zero/NULL denominators) are appended for the
    P10/P11 zero-guard tests.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import hash60
from .schemas import ADS_DATA

ANCHOR_DT = "2026-08-01"

#: generator defaults (reference generate_ads_data.py:8-11): 50x5x3x60 = 45k rows
N_CAMPAIGNS, N_ADSETS, N_CREATIVES, N_DAYS = 50, 5, 3, 60

_H_RANGE = float(1 << 60)

EDGE_ROWS = [
    # (campaign, adset, creative, dt, impressions, clicks, spend, conversions)
    (9001, 1, 1, _dt.date(2026, 8, 1), 0, 0, 50.0, 0),       # all KPIs 0
    (9002, 1, 1, _dt.date(2026, 8, 1), 1000, 0, 50.0, 0),    # ctr 0, cpm > 0
    (9003, 1, 1, _dt.date(2026, 8, 1), 1000, 200, 0.0, 0),   # cpa 0, cpc 0.0
    (9004, 1, 1, _dt.date(2026, 8, 1), None, None, None, None),  # NULLs -> 0
]


def _uniform(salt: str) -> Column:
    """U[0,1) from the row's composite key + salt — the distributed,
    partitioning-independent replacement for random.uniform."""
    key = F.concat_ws(
        "|", F.col("campaign_id"), F.col("adset_id"), F.col("creative_id"),
        F.date_format("dt", "yyyy-MM-dd"), F.lit(salt))
    return hash60(key).cast("double") / F.lit(_H_RANGE)


def _uniform_int(salt: str, lo: Column | int, hi: Column | int) -> Column:
    """Uniform integer in [lo, hi] (inclusive), like random.randint."""
    lo_c = F.lit(lo) if isinstance(lo, int) else lo
    hi_c = F.lit(hi) if isinstance(hi, int) else hi
    return (lo_c + F.floor(_uniform(salt) * (hi_c - lo_c + 1))).cast("long")


def ads_data(spark: SparkSession,
             num_campaigns: int = N_CAMPAIGNS, num_adsets: int = N_ADSETS,
             num_creatives: int = N_CREATIVES, num_days: int = N_DAYS,
             anchor: str = ANCHOR_DT, edge_rows: bool = True) -> DataFrame:
    """The reference generator as one lazy distributed plan.

    Invariants preserved exactly (generate_ads_data.py:22-25):
      impressions ~ U{500..5000}
      clicks      ~ U{0..floor(0.2*impressions)}
      spend       ~ round(U[10,200], 2)
      conversions ~ U{0..clicks}
    """
    base = (
        spark.range(1, num_campaigns + 1).select(F.col("id").alias("campaign_id"))
        .select("campaign_id",
                F.explode(F.sequence(F.lit(1), F.lit(num_adsets))).alias("adset_id"))
        .select("campaign_id", "adset_id",
                F.explode(F.sequence(F.lit(1), F.lit(num_creatives))).alias("creative_id"))
        .select("campaign_id", "adset_id", "creative_id",
                F.explode(F.sequence(F.lit(0), F.lit(num_days - 1))).alias("day_off"))
        .select("campaign_id", "adset_id", "creative_id",
                F.date_sub(F.to_date(F.lit(anchor)), F.col("day_off")).alias("dt"))
    )
    impressions = _uniform_int("imp", 500, 5000)
    with_imp = base.withColumn("impressions", impressions)
    clicks = _uniform_int("clk", 0, F.floor(F.col("impressions") * 0.2))
    with_clk = with_imp.withColumn("clicks", clicks)
    spend = F.round(F.lit(10.0) + _uniform("spd") * F.lit(190.0), 2)
    conversions = _uniform_int("cnv", 0, F.col("clicks"))
    out = (with_clk
           .withColumn("spend", spend)
           .withColumn("conversions", conversions)
           .select(*[f.name for f in ADS_DATA.fields]))
    if edge_rows:
        out = out.unionByName(spark.createDataFrame(EDGE_ROWS, ADS_DATA))
    return out
