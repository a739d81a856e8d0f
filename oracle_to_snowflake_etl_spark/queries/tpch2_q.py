"""TPC-H decorrelation suite: the remaining classic shapes (Q2, Q8-Q12,
Q14-Q17, Q19-Q22) adapted to the driver's slim star schema.

The slim schema has no ``partsupp`` table and no
shipmode/commitdate/receiptdate/phone columns, so the partsupp-shaped
queries (Q2/Q11/Q16/Q20) use ``lineitem`` as the part<->supplier bridge
and the text/date predicates are mapped onto available columns. Every
adaptation preserves the PLAN SHAPE the spec query exists to exercise —
correlated scalar MIN (Q2), conditional-ratio agg (Q8/Q14), scalar
subquery in HAVING (Q11), COUNT DISTINCT + NOT IN (Q16), correlated AVG
(Q17), disjunctive pushdown (Q19), grouped-HAVING IN (Q20), double
correlated EXISTS/NOT EXISTS (Q21), anti-join + scalar AVG filter (Q22).

Cross-engine exactness follows functions/exact.py: computed money sums
are quantized-integer folds (qsum), raw-column sums go through decimal
(dsum), and every THRESHOLD comparison against an average or fraction is
cross-multiplied in exact integers instead of compared in floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DEC, dsum, qsum
from ..sources.readers import load_table
from . import register

_DECU = DEC.upper()

#: quantized revenue expressions, shared across the suite
_REV_Q_SQL = ("CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)"
              " AS BIGINT)")


def _rev_q() -> F.Column:
    return F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                   * 10000 + F.lit(0.5)).cast("long")


@register(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH cost AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(CAST(floor(l_extendedprice / l_quantity * 10000 + 0.5)
                      AS BIGINT)) AS ucost_q
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE')
    SELECT CAST(CAST(s_acctbal AS {_DECU}) AS DOUBLE) AS acctbal,
           s_name, n_name, p_partkey,
           CAST(ucost_q AS DOUBLE) / 10000.0 AS unit_cost
    FROM part JOIN cost ON p_partkey = pk JOIN eu ON sk = s_suppkey
    WHERE p_type = 'LARGE' AND p_size <= 5
      AND ucost_q = (SELECT MIN(c2.ucost_q) FROM cost c2
                     JOIN eu e2 ON c2.sk = e2.s_suppkey
                     WHERE c2.pk = p_partkey)
    ORDER BY acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): correlated scalar MIN
    subquery per part. No partsupp table, so supply cost is derived
    from the lineitem bridge: MIN quantized unit price per
    (part, supplier). The correlated MIN decorrelates to a grouped MIN
    re-joined on partkey — each side aggregated before the join, so the
    join inputs are bounded by |parts|x|suppliers|, not lineitems. The
    region dim chain broadcasts; the part filter broadcasts as a
    semi-join key set."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    eu = (supp.join(F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(region.where(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    ucost = F.floor(F.col("l_extendedprice") / F.col("l_quantity")
                    * 10000 + F.lit(0.5)).cast("long")
    cost = (li.groupBy("l_partkey", "l_suppkey")
            .agg(F.min(ucost).alias("ucost_q")))
    tgt = part.where((F.col("p_type") == "LARGE") & (F.col("p_size") <= 5)) \
              .select("p_partkey")
    cost_eu = (cost.join(F.broadcast(tgt),
                         F.col("l_partkey") == F.col("p_partkey"), "left_semi")
               .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey")))
    best = (cost_eu.groupBy(F.col("l_partkey").alias("_bpk"))
            .agg(F.min("ucost_q").alias("_best")))
    return (cost_eu.join(F.broadcast(best),
                         (F.col("l_partkey") == F.col("_bpk"))
                         & (F.col("ucost_q") == F.col("_best")))
            .select(F.col("s_acctbal").cast(DEC).cast("double").alias("acctbal"),
                    "s_name", "n_name",
                    F.col("l_partkey").alias("p_partkey"),
                    (F.col("ucost_q").cast("double") / 10000.0)
                    .alias("unit_cost"))
            .orderBy(F.desc("acctbal"), F.asc("n_name"), F.asc("s_name"),
                     F.asc("p_partkey"))
            .limit(100))


@register(
    "tpch_q8_market_share",
    f"""
    SELECT yr,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol_q
                              ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(vol_q) AS BIGINT) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             n2.n_name AS supp_nation, {_REV_Q_SQL} AS vol_q
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n1.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
    GROUP BY yr ORDER BY yr
    """)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): conditional-ratio
    aggregation — one nation's share of regional volume per year. Both
    numerator and denominator are exact integer sums of the SAME
    quantized volume, so the single final division is bit-identical
    cross-engine. All seven dims broadcast; lineitem shuffles once for
    the year group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = nation.select(F.col("n_nationkey").alias("_ck"), "n_regionkey")
    n2 = nation.select(F.col("n_nationkey").alias("_sk"),
                       F.col("n_name").alias("supp_nation"))
    j = (li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
         .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
         .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
         .join(F.broadcast(n1), F.col("_ck") == F.col("c_nationkey"))
         .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
         .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
         .join(F.broadcast(n2), F.col("_sk") == F.col("s_nationkey")))
    vol = _rev_q()
    return (j.select(F.year("o_orderdate").cast("long").alias("yr"),
                     "supp_nation", vol.alias("vol_q"))
            .groupBy("yr")
            .agg((F.sum(F.when(F.col("supp_nation") == "NATION_5",
                               F.col("vol_q")).otherwise(F.lit(0)))
                  .cast("double")
                  / F.sum("vol_q").cast("double")).alias("mkt_share"))
            .orderBy("yr"))


@register(
    "tpch_q9_product_profit",
    """
    SELECT n_name, yr,
           CAST(CAST(SUM(amount_q) AS BIGINT) AS DOUBLE) / 10000.0
             AS sum_profit
    FROM (
      SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(floor((l_extendedprice * (1 - l_discount)
                         - 0.1 * p_retailprice * l_quantity) * 10000 + 0.5)
                  AS BIGINT) AS amount_q
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%widget%')
    GROUP BY n_name, yr
    ORDER BY n_name, yr DESC
    """)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier-nation
    per year over a part-name LIKE filter. No partsupp, so supply cost
    is modeled as 10% of p_retailprice per unit — the expression keeps
    the spec's (revenue - cost*qty) form and the join DAG (part filter
    broadcast into the fact, dims broadcast, one group-by shuffle).
    Profit can be negative; floor(x+0.5) round-half-up is sign-consistent
    on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity"))
    amount_q = F.floor(amount * 10000 + F.lit(0.5)).cast("long")
    j = (li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
         .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
         .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
         .join(orders, F.col("o_orderkey") == F.col("l_orderkey")))
    return (j.select("n_name", F.year("o_orderdate").cast("long").alias("yr"),
                     amount_q.alias("amount_q"))
            .groupBy("n_name", "yr")
            .agg((F.sum("amount_q").cast("double") / 10000.0)
                 .alias("sum_profit"))
            .orderBy(F.asc("n_name"), F.desc("yr")))


@register(
    "tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           CAST(CAST(SUM({_REV_Q_SQL}) AS BIGINT) AS DOUBLE) / 10000.0
             AS revenue,
           CAST(CAST(c_acctbal AS {_DECU}) AS DOUBLE) AS acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): quarter of orders x returned
    lines, revenue per customer, top-20. The returnflag + date filters
    push to the scans; customer/nation broadcast; the grouped agg keys
    on custkey so partial agg bounds the shuffle at |customers|;
    TakeOrderedAndProject caps the result."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    j = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
         .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")))
    return (j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg((F.sum(_rev_q()).cast("double") / 10000.0).alias("revenue"))
            .select("c_custkey", "c_name", "revenue",
                    F.col("c_acctbal").cast(DEC).cast("double").alias("acctbal"),
                    "n_name")
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


@register(
    "tpch_q11_important_stock",
    f"""
    WITH v AS (
      SELECT l_partkey AS pk,
             CAST(SUM({_REV_Q_SQL}) AS BIGINT) AS vq
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_1'
      GROUP BY l_partkey)
    SELECT pk AS p_partkey, CAST(vq AS DOUBLE) / 10000.0 AS value
    FROM v
    WHERE vq * 1000 > (SELECT CAST(SUM(vq) AS BIGINT) FROM v)
    ORDER BY value DESC, p_partkey
    """)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value with a scalar
    subquery in HAVING (value > fraction of TOTAL value). No partsupp,
    so value is one nation's shipped revenue per part. The scalar total
    is an agg-of-agg broadcast back over the per-part rows (one extra
    tiny exchange, no recompute of the base agg — Spark reuses it via
    the same child plan); the fraction compare is integer
    cross-multiplied (vq*1000 > total) so no float threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_1")
    v = (li.join(F.broadcast(supp.join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"))),
            F.col("l_suppkey") == F.col("s_suppkey"))
         .groupBy(F.col("l_partkey").alias("pk"))
         .agg(F.sum(_rev_q()).alias("vq")))
    total = v.agg(F.sum("vq").alias("_tot"))
    return (v.crossJoin(F.broadcast(total))
            .where(F.col("vq") * 1000 > F.col("_tot"))
            .select(F.col("pk").alias("p_partkey"),
                    (F.col("vq").cast("double") / 10000.0).alias("value"))
            .orderBy(F.desc("value"), F.asc("p_partkey")))


@register(
    "tpch_q12_ship_priority_classes",
    """
    SELECT l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate > o_orderdate
    GROUP BY l_linestatus ORDER BY l_linestatus
    """)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-class priority counts): fact-to-fact
    join with a cross-table inequality (shipped after ordering — the
    slim stand-in for commit<receipt) and CASE-conditional counts. The
    l_linestatus column stands in for the absent l_shipmode. AQE picks
    the join strategy; the conditional SUMs fold in one partial agg."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, (F.col("o_orderkey") == F.col("l_orderkey"))
                    & (F.col("l_shipdate") > F.col("o_orderdate")))
            .groupBy(F.col("l_linestatus").alias("ship_class"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("ship_class"))


@register(
    "tpch_q14_promo_revenue",
    f"""
    SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_q ELSE 0 END)
                     AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(rev_q) AS BIGINT) AS DOUBLE) * 100.0
             AS promo_revenue
    FROM (SELECT p_type, {_REV_Q_SQL} AS rev_q
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00')
    """)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of one month's revenue
    from PROMO-type parts. Single broadcast join, single global agg;
    numerator/denominator are integer sums of the same quantized
    revenue, divided once (then scaled) — deterministic cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    part = load_table(spark, sf_dir, "part")
    rev = _rev_q()
    return (li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .select("p_type", rev.alias("rev_q"))
            .agg((F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_q"))
                        .otherwise(F.lit(0))).cast("double")
                  / F.sum("rev_q").cast("double") * 100.0)
                 .alias("promo_revenue")))


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey, CAST(SUM({_REV_Q_SQL}) AS BIGINT) AS rq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(rq AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE rq = (SELECT MAX(rq) FROM rev)
    ORDER BY s_suppkey
    """)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the revenue-view + scalar-MAX pattern.
    The per-supplier agg is computed once; the MAX is an agg-of-agg
    broadcast joined back on the integer revenue (exact equality — a
    float== here would be engine-dependent). Supplier dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_q()).alias("rq"))
    mx = rev.agg(F.max("rq").alias("_mx"))
    return (rev.join(F.broadcast(mx), F.col("rq") == F.col("_mx"))
            .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
            .select("s_suppkey", "s_name",
                    (F.col("rq").cast("double") / 10000.0)
                    .alias("total_revenue"))
            .orderBy("s_suppkey"))


@register(
    "tpch_q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier count per part attributes): COUNT
    DISTINCT over a NOT IN-excluded supplier set, grouped by part
    attributes. No partsupp, so the lineitem bridge supplies the
    (part, supplier) pairs; the excluded set (spec: complaint comments;
    here: negative account balance) anti-joins as a broadcast. NOT IN
    is safe as an anti-join because s_suppkey is non-nullable; a
    nullable NOT IN column would need the null-aware form."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (li.join(F.broadcast(bad),
                    F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"),
                     F.asc("p_type"), F.asc("p_size")))


@register(
    "tpch_q17_small_qty_revenue",
    f"""
    WITH pa AS (
      SELECT l_partkey AS pk, COUNT(*) AS cnt,
             CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS sq
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l_extendedprice AS {_DECU})) AS DOUBLE) / 7.0
             AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pk = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
      AND 5 * CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) * cnt < sq
    """)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): the correlated-AVG
    query — lines whose quantity is below 20% of their part's average.
    Decorrelates to a per-part (count, sum) agg re-joined on partkey;
    the avg compare is cross-multiplied in quantized integers
    (5*qty*cnt < sum  <=>  qty < 0.2*avg) so both engines evaluate the
    SAME exact integer predicate — a float 0.2*avg threshold would
    flake on ties. The part filter semi-prunes the agg input too: at
    scale, aggregate only partkeys that can survive (spec semantics
    keep the inner query per-part, so filtering by the broadcast part
    set first is plan-equivalent and much smaller)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM"))
    qq = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    pruned = li.join(F.broadcast(part.select("p_partkey")),
                     F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    pa = (pruned.groupBy(F.col("l_partkey").alias("pk"))
          .agg(F.count(F.lit(1)).alias("cnt"), F.sum(qq).alias("sq")))
    return (pruned.join(F.broadcast(pa), F.col("l_partkey") == F.col("pk"))
            .where(F.lit(5) * qq * F.col("cnt") < F.col("sq"))
            .agg((F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                  / 7.0).alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n")))


@register(
    "tpch_q19_disjunctive_rev",
    f"""
    SELECT CAST(CAST(SUM({_REV_Q_SQL}) AS BIGINT) AS DOUBLE) / 10000.0
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
           AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
           AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
           AND p_size BETWEEN 1 AND 15)
    """)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three OR
    branches mixing part and lineitem columns. Catalyst extracts the
    common implied predicate p_brand IN (...) for pushdown into the
    part scan and keeps the cross-table disjunction as the join filter
    — the pattern this query exists to test."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (((F.col("p_brand") == "Brand#12") & q.between(1, 11)
             & F.col("p_size").between(1, 5))
            | ((F.col("p_brand") == "Brand#23") & q.between(10, 20)
               & F.col("p_size").between(1, 10))
            | ((F.col("p_brand") == "Brand#34") & q.between(20, 30)
               & F.col("p_size").between(1, 15)))
    return (li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .where(cond)
            .agg(qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                      "revenue"),
                 F.count(F.lit(1)).alias("n")))


@register(
    "tpch_q20_part_promotion",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 5000)
    ORDER BY s_suppkey
    """)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): IN over a
    grouped-HAVING subquery — suppliers who moved >50 units of some
    red part in a year (spec compares to partsupp availqty; the slim
    form uses a fixed threshold on the same grouped sum). Decorrelates
    to aggregate-then-LEFT SEMI; the tiny supplier dim is the probe
    side, so the semi-join broadcasts the aggregated key set."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    supp = load_table(spark, sf_dir, "supplier")
    qq = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    qual = (li.join(F.broadcast(part.select("p_partkey")),
                    F.col("l_partkey") == F.col("p_partkey"), "left_semi")
            .groupBy("l_suppkey", "l_partkey")
            .agg(F.sum(qq).alias("_sq"))
            .where(F.col("_sq") > 5000)
            .select("l_suppkey"))
    return (supp.join(qual, F.col("s_suppkey") == F.col("l_suppkey"),
                      "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


@register(
    "tpch_q21_waiting_supplier",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the double
    correlated EXISTS / NOT EXISTS. Instead of two self-joins of
    lineitem (the naive decorrelation — two extra fact shuffles plus a
    pernicious many-to-many blowup on multi-line orders), both
    existence tests collapse into ONE per-order aggregate: distinct
    supplier count and distinct returning-supplier count. For a row
    with returnflag='R': EXISTS(other supplier) <=> nsupp >= 2, and
    NOT EXISTS(other supplier with 'R') <=> nrsupp = 1 (this row's own
    supplier is a returning one). One agg + one join on l_orderkey
    replaces two correlated subqueries — same rows, half the shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F")
    # only 'F'-status orders are ever examined, so the per-order agg
    # runs over the semi-pruned lineitems — plan-equivalent (the EXISTS
    # tests are per-order) and it shrinks both agg and join inputs by
    # the order-status selectivity
    li_f = li.join(orders.select("o_orderkey"),
                   F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
    ostats = (li_f.groupBy(F.col("l_orderkey").alias("_ok"))
              .agg(F.countDistinct("l_suppkey").alias("_ns"),
                   F.countDistinct(F.when(F.col("l_returnflag") == "R",
                                          F.col("l_suppkey"))).alias("_nr")))
    return (li_f.where(F.col("l_returnflag") == "R")
            .join(ostats, F.col("_ok") == F.col("l_orderkey"))
            .where((F.col("_ns") >= 2) & (F.col("_nr") == 1))
            .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(100))


@register(
    "tpch_q22_global_sales_opp",
    f"""
    WITH pos AS (
      SELECT CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS sq,
             COUNT(*) AS cnt
      FROM customer WHERE c_acctbal > 0.0)
    SELECT n_name AS cntry, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS {_DECU})) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey, pos
    WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * cnt > sq
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
    GROUP BY n_name ORDER BY n_name
    """)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers with no recent activity. Every testdata customer has
    orders, so the spec's 'no orders at all' NOT EXISTS becomes 'no
    orders since 2000-06' — same anti-join plan against a filtered,
    projected key set. The scalar AVG gate is integer cross-multiplied
    (bal*cnt > sum <=> bal > avg) against a broadcast one-row agg;
    the spec's phone-prefix grouping maps to the nation dim."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    bal_q = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    pos = (cust.where(F.col("c_acctbal") > 0.0)
           .agg(F.sum(bal_q).alias("sq"), F.count(F.lit(1)).alias("cnt")))
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")) \
        .select("o_custkey")
    return (cust.crossJoin(F.broadcast(pos))
            .where(bal_q * F.col("cnt") > F.col("sq"))
            .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("cntry"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
                 .alias("totacctbal"))
            .orderBy("cntry"))
