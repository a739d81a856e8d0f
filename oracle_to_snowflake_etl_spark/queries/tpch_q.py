"""TPC-H-classic query shapes on the driver testdata — the canonical
OLAP plans (multi-predicate scan-agg, join-filter-topk, selective-filter
sum) that exercise pushdown, partial aggregation, and distributed top-k
together. Published TPC-H text is the spec; columns are adapted to the
driver's slimmer schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DEC, davg, dsum, qsum
from ..sources.readers import load_table
from . import register

_DECU = DEC.upper()


@register(
    "tpch_q1_pricing",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {_DECU})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {_DECU})) AS DOUBLE) AS sum_base,
           CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc,
           CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                               * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
               AS sum_charge,
           CAST(SUM(CAST(l_quantity AS {_DECU})) AS DOUBLE) / COUNT(l_quantity)
               AS avg_qty,
           CAST(SUM(CAST(l_discount AS {_DECU})) AS DOUBLE) / COUNT(l_discount)
               AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: one scan, multi-expression partial+final
    hash agg — the canonical whole-stage-codegen benchmark query."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate")
                 <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"),
             dsum("l_extendedprice", "sum_base"),
             qsum(disc, "sum_disc"),
             qsum(charge, "sum_charge"),
             davg("l_quantity", "avg_qty"),
             davg("l_discount", "avg_disc"),
             F.count(F.lit(1)).alias("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_priority",
    f"""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: selective dim filter (broadcast) ->
    fact join -> agg -> top-10. The segment filter prunes customers
    before broadcast, so the lineitem side never shuffles for joins."""
    c = load_table(spark, sf_dir, "customer") \
        .where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(qsum(revenue, "revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier",
    f"""
    SELECT n.n_name,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name ASC
    """)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local supplier volume: the 6-table join. Dims
    (region->nation->supplier) broadcast outward-in so the lineitem scan
    never shuffles for them; the fact-to-fact lineitem<->orders join and
    the customer attach are left to AQE (broadcast at small SF, SMJ at
    scale). The local-supplier predicate c_nationkey = s_nationkey rides
    the customer join."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation") \
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    s = load_table(spark, sf_dir, "supplier") \
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey)
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(qsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "tpch_q6_forecast",
    f"""
    SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue: four conjunctive predicates, all pushed
    to the parquet scan, one global agg — the pushdown litmus test."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24))
        .agg(qsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
             F.count(F.lit(1)).alias("n"))
    )


@register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """)
def q_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS decorrelates to a
    LEFT SEMI join on l_orderkey with the correlated inequality as the
    join condition — one shuffle pair, no subquery-per-row. The slim
    lineitem has no commit/receipt dates, so the 'late line' predicate is
    adapted to l_shipdate > o_orderdate (same correlated-EXISTS plan
    shape as spec Q4)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")))
    sel = window.join(
        li, (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")), "left_semi")
    return (sel.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


@register(
    "tpch_q13_cust_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey AS ck, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """)
def q_tpch_q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join with a join-side filter (spec filters on comment pattern; the
    slim schema filters o_orderpriority), two-level aggregation. The
    first agg keys on c_custkey — near-unique, so partial agg does
    little, but the second agg collapses to |distinct counts| rows; the
    outer join preserves zero-order customers (COUNT of a NULL column
    = 0, not 1)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (cust.join(
        orders.where(F.col("o_orderpriority") != "1-URGENT"),
        cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@register(
    "tpch_q18_large_orders",
    f"""
    SELECT c_name, ck AS c_custkey, ok AS o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_date,
           CAST(CAST(o_totalprice AS {_DECU}) AS DOUBLE) AS total_price,
           CAST(SUM(CAST(l_quantity AS {_DECU})) AS DOUBLE) AS sum_qty
    FROM (SELECT c_name, c.c_custkey AS ck, o.o_orderkey AS ok,
                 o_orderdate, o_totalprice, l_quantity
          FROM customer c
          JOIN orders o ON c.c_custkey = o.o_custkey
          JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
    WHERE ok IN (SELECT l_orderkey FROM lineitem
                 GROUP BY l_orderkey
                 HAVING SUM(CAST(l_quantity AS {_DECU})) > 95)
    GROUP BY c_name, ck, ok, o_orderdate, o_totalprice
    ORDER BY total_price DESC, ok
    LIMIT 100
    """)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): the IN-subquery
    (orders whose total quantity exceeds a threshold) decorrelates to a
    LEFT SEMI join against a grouped-HAVING aggregate; the threshold is
    scaled to the slim data's quantity range (1..50, avg ~4 lines/order
    => 95 keeps a selective tail as spec Q18 intends). Aggregate-then-
    semi-join means the big lineitem table is aggregated ONCE on its
    natural key before any join fans out."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # ONE lineitem pass: the HAVING aggregate already computes each
    # qualifying order's total quantity, which IS the query's final
    # sum_qty (grouping by order key makes the outer re-aggregation a
    # per-order identity) — so the classic re-join-lineitem-and-
    # re-aggregate shape does a second 60M-row scan for a value it
    # threw away. Keep _tq, broadcast the tiny qualifying set (selective
    # BY CONSTRUCTION — the threshold keeps a ~1e-4 tail at any scale;
    # pinned rather than AQE-derived because at the sf10 second decade
    # the aggregate's measured size sat on the broadcast boundary and
    # the strategy coin-flipped a 14s<->123s swing, SCALE.md ‡), and
    # join orders+customer to it map-side: lineitem is scanned once and
    # never shuffled past its own aggregate.
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_tq"))
           .where(F.col("_tq") > 95))
    joined = (orders.join(F.broadcast(big),
                          F.col("o_orderkey") == F.col("l_orderkey"))
              .join(cust, F.col("c_custkey") == F.col("o_custkey")))
    return (joined
            .select("c_name", "c_custkey", "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
                    F.col("o_totalprice").cast(DEC).cast("double")
                     .alias("total_price"),
                    F.col("_tq").cast("double").alias("sum_qty"))
            .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
            .limit(100))


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000
                               + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
             AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS yr,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, yr
    ORDER BY supp_nation, cust_nation, yr
    """)
def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): the 5-way star — fact joined
    through two independent dimension CHAINS (supplier->nation,
    orders->customer->nation) with a symmetric nation-pair predicate.
    Dims broadcast (nation twice under different aliases), so the
    lineitem side never shuffles until the final small group-by; the
    nation-pair filter applies at the broadcast-join probes, not as a
    post-join filter over the full fact. Revenue uses the quantized
    integer-sum convention (computed products drift per-engine under
    decimal casts)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("_sk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("_ck"),
                       F.col("n_name").alias("cust_nation"))
    j = (li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
         .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
         .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
         .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
         .join(F.broadcast(n1), F.col("_sk") == F.col("s_nationkey"))
         .join(F.broadcast(n2), F.col("_ck") == F.col("c_nationkey"))
         .where(((F.col("supp_nation") == "NATION_3")
                 & (F.col("cust_nation") == "NATION_7"))
                | ((F.col("supp_nation") == "NATION_7")
                   & (F.col("cust_nation") == "NATION_3"))))
    rev_q = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 10000 + F.lit(0.5)).cast("long")
    return (j.select("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("yr"),
                     rev_q.alias("_rq"))
            .groupBy("supp_nation", "cust_nation", "yr")
            .agg((F.sum("_rq").cast("double") / 10000.0).alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "yr"))
