"""Reference-parity query set (SURVEY.md §2), transposed onto the
TPC-H-ish testdata (FIXTURES.md §5 mapping: ads_data -> lineitem/orders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DEC, davg, dsum
from ..functions.hashing import duck_hash60_sql
from ..functions.kpis import safe_ratio
from ..operators.analytics import top_n_by, trend
from ..operators.incremental import incremental_delta
from ..sources.readers import load_table
from . import register

# Fixed anchor: max(o_orderdate) in the driver testdata (all SFs share the
# generator; see SURVEY.md §7.3 on anchoring "last 14 days").
ANCHOR = "2001-08-01"
ANCHOR_MINUS_14 = "2001-07-18"

@register(
    "kpi_derive",
    f"""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount)            AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           CASE WHEN coalesce(l_discount, 0) = 0 THEN 0
                ELSE (l_tax / l_discount) * 1.0 END      AS tax_over_disc
    FROM lineitem
    """)
def q_kpi_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference KPI contract (transform_staging.py:35-38; SURVEY.md §2.2
    P2/P10/P11, F1-F4): per-row derived ratio columns with the
    zero-or-NULL-denominator -> 0 guard, transposed onto lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))
         * (1 + F.col("l_tax"))).alias("charge"),
        safe_ratio(F.col("l_tax"), F.col("l_discount")).alias("tax_over_disc"),
    )


@register(
    "top_spenders_14d",
    f"""
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS {DEC.upper()})) AS DOUBLE) AS total_spend
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{ANCHOR_MINUS_14} 00:00:00'
    GROUP BY o_custkey
    ORDER BY total_spend DESC, o_custkey ASC
    LIMIT 10
    """)
def q_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Notebook cell 3 (README.md:396-401): top-10 by 14-day spend —
    filter -> hash-agg -> TakeOrderedAndProject (SURVEY.md A1+O1+P8)."""
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.filter(F.col("o_orderdate") >= F.lit(f"{ANCHOR_MINUS_14} 00:00:00").cast("timestamp"))
    return top_n_by(recent, ["o_custkey"], dsum("o_totalprice"), "total_spend", 10)


@register(
    "daily_trend",
    f"""
    SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_dt,
           CAST(SUM(CAST(l_discount AS {DEC.upper()})) AS DOUBLE) / COUNT(l_discount)
               AS avg_disc,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ship_dt
    ORDER BY ship_dt
    """)
def q_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Notebook cell 4 (README.md:405-409): daily AVG trend ordered by day
    (SURVEY.md A2+O2, F9 date cast)."""
    li = load_table(spark, sf_dir, "lineitem")
    return trend(
        li, F.date_format("l_shipdate", "yyyy-MM-dd"), "ship_dt",
        {"avg_disc": davg("l_discount"), "n_items": F.count(F.lit(1))},
    )


@register(
    "creative_perf_topk",
    f"""
    SELECT l_partkey,
           CAST(SUM(CAST(l_quantity AS {DEC.upper()})) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {DEC.upper()})) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_discount AS {DEC.upper()})) AS DOUBLE) / COUNT(l_discount)
               AS avg_disc
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY sum_qty DESC, l_partkey ASC
    LIMIT 10
    """)
def q_creative_perf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Notebook cell 5 (README.md:413-418): multi-aggregate group + top-10
    (SURVEY.md A3+O1)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_partkey").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        davg("l_discount", "avg_disc"),
    )
    return agg.orderBy(F.desc("sum_qty"), F.asc("l_partkey")).limit(10)


@register(
    "incremental_anti",
    """
    SELECT l.l_orderkey, l.l_linenumber, strftime(l.l_shipdate, '%Y-%m-%d') AS ship_dt
    FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem t
        WHERE t.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND t.l_orderkey = l.l_orderkey AND t.l_linenumber = l.l_linenumber
    )
    """)
def q_incremental_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference J1 (oracle_to_snowflake.py:84-86): composite-key LEFT ANTI
    join of source vs already-loaded target keys. Target here = the
    pre-1998 subset; delta = everything not yet seen."""
    li = load_table(spark, sf_dir, "lineitem")
    target_keys = li.filter(
        F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_linenumber")
    delta = incremental_delta(li, target_keys, ["l_orderkey", "l_linenumber"])
    return delta.select(
        "l_orderkey", "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_dt"))


@register(
    "count_recon",
    """
    SELECT 'orders' AS tbl, COUNT(*) AS n FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    UNION ALL SELECT 'events', COUNT(*) FROM events
    """)
def q_count_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A4 row-count reconciliation (SURVEY.md §5.1) at every
    pipeline hop, plus UNION ALL (set-op surface, SURVEY.md §2.6)."""
    parts = []
    for tbl in ("orders", "lineitem", "customer", "events"):
        parts.append(load_table(spark, sf_dir, tbl)
                     .agg(F.count(F.lit(1)).alias("n"))
                     .select(F.lit(tbl).alias("tbl"), "n"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@register(
    "project_rename_format",
    """
    SELECT o_orderkey AS order_id,
           upper(o_orderpriority) AS priority,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day
    FROM orders
    """)
def q_project_rename_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY.md P2/P4/P7/F8: explicit projection, rename, and the
    date->string boundary format ('yyyy-MM-dd')."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.upper("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
    )


@register(
    "revenue_by_nation",
    f"""
    SELECT n.n_name,
           CAST(SUM(CAST(o.o_totalprice AS {DEC.upper()})) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name ASC
    """)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join surface beyond J1 (SURVEY.md §2.3 note): fact-dim joins with
    broadcast dims — customer and nation are small; the orders side never
    shuffles for the join."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        orders
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(dsum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "recon_fingerprint_lineitem",
    f"""
    WITH canon AS (
      SELECT {duck_hash60_sql(
          "concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey, "
          "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT), "
          "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT), "
          "CAST(floor(l_discount * 10000 + 0.5) AS BIGINT), "
          "CAST(floor(l_tax * 10000 + 0.5) AS BIGINT), "
          "l_returnflag, l_linestatus, epoch_us(l_shipdate))")} AS h
      FROM lineitem)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS xor60,
           CAST(SUM(CAST(h AS HUGEINT)) AS VARCHAR) AS sum60
    FROM canon
    """)
def q_recon_fingerprint_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level migration reconciliation (operators/recon.py): the
    reference's row-count check upgraded to a full-table content
    fingerprint — count + XOR + exact SUM of per-row 60-bit hashes over
    a CANONICAL projection (ids raw, floats quantized, dates epoch-µs).
    Commutative folds make it partitioning/engine-independent: DuckDB
    computing the same triple over the same parquet IS the migration
    parity check. One scan, no shuffle."""
    from ..operators.recon import table_fingerprint

    li = load_table(spark, sf_dir, "lineitem")
    cols = [
        F.col("l_orderkey"), F.col("l_linenumber"),
        F.col("l_partkey"), F.col("l_suppkey"),
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"),
        F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("long"),
        F.floor(F.col("l_tax") * 10000 + F.lit(0.5)).cast("long"),
        F.col("l_returnflag"), F.col("l_linestatus"),
        # l_shipdate is TIMESTAMP_NTZ in the parquet; the session TZ is
        # pinned UTC, so the cast is value-preserving on both engines
        F.unix_micros(F.col("l_shipdate").cast("timestamp")),
    ]
    return table_fingerprint(li, cols)
