"""General SQL-surface query set: set operations, grouping sets,
DISTINCT aggregates, semi/anti subqueries, outer joins, pivot-style
conditional aggregation, string functions, and the as-of join
(operators/asof.py, verified against DuckDB's native ASOF JOIN).

The reference needs none of these (SURVEY.md §2.6/2.8 'Absent') — they
complete the engine's join/aggregate surface so reference users can grow
into them without leaving the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DEC, dsum
from ..operators.asof import asof_join
from ..operators.rangejoin import point_in_interval_join
from ..operators.merge import merge_upsert
from ..sources.readers import load_table
from . import register

_DECU = DEC.upper()


@register(
    "set_ops",
    """
    WITH recent AS (SELECT o_custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'),
    big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    SELECT 'union' AS op, o_custkey FROM (
        SELECT DISTINCT o_custkey FROM recent
        UNION SELECT o_custkey FROM big)
    UNION ALL
    SELECT 'intersect', o_custkey FROM (
        SELECT DISTINCT o_custkey FROM recent
        INTERSECT SELECT o_custkey FROM big)
    UNION ALL
    SELECT 'except', o_custkey FROM (
        SELECT DISTINCT o_custkey FROM recent
        EXCEPT SELECT o_custkey FROM big)
    """)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (distinct semantics) over two customer
    populations, labeled and stacked."""
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    big = orders.where(F.col("o_totalprice") > 200000).select("o_custkey")
    parts = [
        ("union", recent.union(big).distinct()),
        ("intersect", recent.intersect(big)),   # INTERSECT DISTINCT
        ("except", recent.subtract(big)),       # EXCEPT DISTINCT
    ]
    out = None
    for label, df in parts:
        piece = df.select(F.lit(label).alias("op"), "o_custkey")
        out = piece if out is None else out.unionAll(piece)
    return out


@register(
    "rollup_revenue",
    f"""
    SELECT coalesce(n_name, '<all>') AS nation,
           coalesce(CAST(year(o_orderdate) AS VARCHAR), '<all>') AS yr,
           CAST(SUM(CAST(o_totalprice AS {_DECU})) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP(n_name, year(o_orderdate))
    """)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, year) revenue: subtotal + grand-total rows,
    NULL grouping slots made explicit so both engines hash alike."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    j = (orders
         .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
         .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey))
    return (
        j.rollup("n_name", F.year("o_orderdate").alias("_yr"))
        .agg(dsum("o_totalprice", "revenue"),
             F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("n_name", F.lit("<all>")).alias("nation"),
            F.coalesce(F.col("_yr").cast("string"), F.lit("<all>")).alias("yr"),
            "revenue", "n_orders")
    )


@register(
    "distinct_aggs",
    f"""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           CAST(SUM(DISTINCT CAST(l_quantity AS {_DECU})) AS DOUBLE) AS sum_dist_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """)
def q_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one group — Spark plans the
    expand+two-phase distinct aggregation automatically."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.sum_distinct(F.col("l_quantity").cast(DEC)).cast("double")
         .alias("sum_dist_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "anti_semi_customers",
    """
    SELECT c.c_custkey, c.c_name,
           CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                THEN 'active' ELSE 'inactive' END AS status
    FROM customer c
    """)
def q_anti_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join as one labeled projection (EXISTS subquery
    shape): left_semi finds active customers, left_anti the rest."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    active = (customer.join(orders, customer.c_custkey == orders.o_custkey,
                            "left_semi")
              .select("c_custkey", "c_name", F.lit("active").alias("status")))
    inactive = (customer.join(orders, customer.c_custkey == orders.o_custkey,
                              "left_anti")
                .select("c_custkey", "c_name", F.lit("inactive").alias("status")))
    return active.unionAll(inactive)


@register(
    "outer_join_counts",
    f"""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS {_DECU})) AS DOUBLE) AS spend
    FROM customer c
    LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """)
def q_outer_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + per-customer rollup: zero-order customers keep a
    row with n_orders=0 and NULL spend."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = customer.join(orders, orders.o_custkey == customer.c_custkey, "left_outer")
    return j.groupBy("c_custkey", "c_name").agg(
        F.count("o_orderkey").alias("n_orders"),
        dsum("o_totalprice", "spend"),
    )


@register(
    "pivot_priority_status",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders
    GROUP BY o_orderpriority
    """)
def q_pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot orders: status columns per priority row (conditional
    aggregation — the engine-portable pivot form)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(*[
        F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(f"n_{s.lower()}")
        for s in ("F", "O", "P")
    ])


@register(
    "string_funcs",
    """
    SELECT c_custkey,
           upper(c_name) AS uname,
           length(c_name) AS name_len,
           replace(c_name, '#', '-') AS dashed,
           substr(c_name, 1, 8) AS prefix,
           concat(c_name, ':', c_mktsegment) AS tagged,
           split_part(c_name, '#', 2) AS num_part
    FROM customer
    """)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: upper/length/replace/substr/concat/
    split_part over customer names."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("tagged"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("num_part"),
    )


@register(
    "merge_upsert_orders",
    """
    WITH source AS (
      SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    ),
    kept AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM source s
                        WHERE s.o_orderkey = o.o_orderkey)
    )
    SELECT * FROM source UNION ALL SELECT * FROM kept
    """)
def q_merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert (operators/merge.py): a "correction feed" (2000+ orders,
    price restated 2x) merged over the full table — source wins on key
    collision, untouched target rows survive. The format-agnostic MERGE."""
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    source = (load_table(spark, sf_dir, "orders")
              .where(F.col("o_orderdate")
                     >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
              .select("o_orderkey", "o_custkey",
                      (F.col("o_totalprice") * 2).alias("o_totalprice")))
    return merge_upsert(source, orders, ["o_orderkey"])


@register(
    "salted_agg_status",
    f"""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS {_DECU})) AS DOUBLE) AS total_price,
           MIN(o_custkey) AS min_cust,
           MAX(o_custkey) AS max_cust
    FROM orders
    GROUP BY o_orderstatus
    """)
def q_salted_agg_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over the LOW-CARDINALITY, highly
    skewed o_orderstatus key (operators/skew.py): the hot key fans out
    across 32 salt buckets before the final combine. The oracle is the
    PLAIN group-by — salting must be semantically invisible (decimal
    sums associative, counts/extrema combinable)."""
    from ..operators.skew import salted_agg

    orders = load_table(spark, sf_dir, "orders")
    return salted_agg(
        orders, ["o_orderstatus"], salt_col="o_orderkey", buckets=32,
        sum_cols={"o_totalprice": "total_price"},
        min_cols={"o_custkey": "min_cust"},
        max_cols={"o_custkey": "max_cust"})


@register(
    "salted_agg_auto_status",
    f"""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS {_DECU})) AS DOUBLE) AS total_price,
           MIN(o_custkey) AS min_cust,
           MAX(o_custkey) AS max_cust
    FROM orders
    GROUP BY o_orderstatus
    """)
def q_salted_agg_auto_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-REPORT-DRIVEN salted aggregation (operators/skew.py
    salted_agg_auto): the exact-rank skew report runs on a
    deterministic 10% row sample and DECIDES the salt bucket count —
    measure, then salt, instead of guessing. o_orderstatus is
    near-uniform on the bench corpus, so the measured decision is
    buckets=1 (plain single hash-agg, no insurance stage); the salted
    branch is exercised by synthetic hot-key fixtures in
    tests/test_edge_cases.py. Oracle: the plain GROUP BY — the
    decision must be semantically invisible either way."""
    from ..operators.skew import salted_agg_auto

    orders = load_table(spark, sf_dir, "orders")
    return salted_agg_auto(
        orders, ["o_orderstatus"], salt_col="o_orderkey",
        sum_cols={"o_totalprice": "total_price"},
        min_cols={"o_custkey": "min_cust"},
        max_cols={"o_custkey": "max_cust"})


@register(
    "range_join_promo",
    """
    WITH promo AS (
      SELECT o_orderkey AS promo_id, o_orderdate AS s,
             o_orderdate + INTERVAL 7 DAY AS e
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 20
    )
    SELECT l.l_orderkey, l.l_linenumber, p.promo_id
    FROM lineitem l
    JOIN promo p ON l.l_shipdate >= p.s AND l.l_shipdate < p.e
    """)
def q_range_join_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join: attribute each lineitem
    shipment to every top-20-order promo week containing it
    (operators/rangejoin.py). A raw inequality join would plan
    BroadcastNestedLoopJoin; the bucketed construction is an equi-join
    on coarse time buckets + exact filter, one shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    promos = (orders
              .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(20)
              .select(F.col("o_orderkey").alias("promo_id"),
                      F.col("o_orderdate").alias("_s"),
                      (F.col("o_orderdate")
                       + F.expr("INTERVAL 7 DAYS")).alias("_e")))
    points = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    joined = point_in_interval_join(points, promos, "l_shipdate", "_s", "_e",
                                    bucket_minutes=7 * 24 * 60)
    return joined.select("l_orderkey", "l_linenumber", "promo_id")


@register(
    "asof_click_attribution",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'
    ),
    views AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
    )
    SELECT v.user_id, v.event_id,
           c.event_id AS click_id, c.value AS click_value
    FROM views v
    ASOF LEFT JOIN clicks c
      ON v.user_id = c.user_id AND v.ts >= c.ts
    """)
def q_asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): attribute each view to the user's
    latest click at-or-before it. Spark has no native as-of join; ours
    is the one-shuffle union-sort construction, and DuckDB's native
    ASOF JOIN is the oracle."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click") \
                   .select("user_id", "ts", "event_id", "value")
    views = events.where(F.col("event_type") == "view") \
                  .select("user_id", "ts", "event_id")
    out = asof_join(views, clicks, key="user_id",
                    payload=["event_id", "value"], suffix="_c")
    return out.select(
        "user_id", "event_id",
        F.col("event_id_c").alias("click_id"),
        F.col("value_c").alias("click_value"))


@register(
    "cube_status_priority",
    f"""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS {_DECU})) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING() disambiguation (the ROLLUP sibling of
    rollup_revenue): all four grouping sets in one pass — Spark expands
    the sets map-side, so the shuffle is one hash-agg over the expanded
    keys, not four scans."""
    from ..functions.exact import dsum

    orders = load_table(spark, sf_dir, "orders")
    return (orders.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("o_totalprice", "total_price"),
                 (F.grouping("o_orderstatus") * 2
                  + F.grouping("o_orderpriority")).alias("gid"))
            .select(
                F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
                F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
                "gid", "n", "total_price"))


@register("approx_order_stats", None)  # rows-only: sketch outputs are
# implementation-defined (HLL++ / KLL internals differ per engine), so no
# cross-engine value oracle exists BY CONSTRUCTION; the pytest asserts
# error bounds against exact values instead (tests/test_maintenance.py).
def q_approx_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate-aggregation surface for 100 TB interactive use:
    approx_count_distinct (HyperLogLog++, one pass, fixed memory) and
    approx_percentile (KLL-style sketch) vs their exact forms, which
    need a full distinct shuffle / sort respectively. Output includes
    both approx and exact so the error is visible in the result."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_custs"),
        F.countDistinct("o_custkey").alias("exact_custs"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("approx_p50"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"))


@register(
    "corr_subquery_premium",
    """
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(28,4)) AS DOUBLE) AS price
    FROM orders o
    WHERE 2 * CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)
            * (SELECT COUNT(*) FROM orders o2
               WHERE o2.o_custkey = o.o_custkey)
          > 3 * (SELECT CAST(SUM(CAST(floor(o2.o_totalprice * 10000 + 0.5)
                                      AS BIGINT)) AS BIGINT)
                 FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """)
def q_corr_subquery_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries ("orders priced >1.5x their
    customer's average"), run through spark.sql to exercise Catalyst's
    decorrelation: each correlated aggregate rewrites to a grouped
    aggregate joined on the correlation key — set-based plans, never a
    per-row subquery execution (plan-asserted: no nested-loop join).
    The comparison is pure integer arithmetic (quantized cents,
    cross-multiplied 2*price*n > 3*sum) so both engines decide each row
    exactly — a float AVG here would be partition-order-dependent."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(28,4)) AS DOUBLE) AS price
        FROM orders_v o
        WHERE 2 * CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)
                * (SELECT COUNT(*) FROM orders_v o2
                   WHERE o2.o_custkey = o.o_custkey)
              > 3 * (SELECT SUM(CAST(floor(o2.o_totalprice * 10000 + 0.5)
                                     AS BIGINT))
                     FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
    """)


@register(
    "dq_orders_contract",
    """
    SELECT 'unique:o_orderkey' AS check_name,
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_bad
    FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'not_null:o_totalprice',
           CAST(COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'accepted:o_orderstatus',
           CAST(COUNT(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 END)
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'references:o_custkey', CAST(COUNT(*) AS BIGINT)
    FROM (SELECT o_custkey FROM orders
          WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
    """)
def q_dq_orders_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orders table's publish contract (operators/quality.py):
    key uniqueness, not-null, accepted status values, and referential
    integrity against customer — one unioned summary, one action. The
    testdata satisfies the contract, so every n_bad is 0; the oracle
    recomputes each count independently in SQL."""
    from ..operators.quality import (
        check_accepted_values,
        check_not_null,
        check_references,
        check_unique,
        run_checks,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return run_checks(
        check_unique(orders, ["o_orderkey"]),
        check_not_null(orders, "o_totalprice"),
        check_accepted_values(orders, "o_orderstatus", ["F", "O", "P"]),
        check_references(orders, "o_custkey", customer, "c_custkey"))


@register(
    "salted_join_nation",
    f"""
    SELECT o_orderkey, n_name,
           CAST(CAST(o_totalprice AS {_DECU}) AS DOUBLE) AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    ORDER BY o_orderkey
    """)
def q_salted_join_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join (operators/skew.salted_join): the big side
    salts on its row id, the small side replicates x buckets, the hot
    key spreads over ``buckets`` tasks. The oracle is the PLAIN join —
    salting must be semantically invisible, same contract as
    salted_agg_status."""
    from ..operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer") \
        .join(F.broadcast(load_table(spark, sf_dir, "nation")),
              F.col("c_nationkey") == F.col("n_nationkey")) \
        .select("c_custkey", "n_name")
    j = salted_join(orders.withColumnRenamed("o_custkey", "c_custkey"),
                    cust, ["c_custkey"], "o_orderkey", buckets=16)
    return (j.select("o_orderkey", "n_name",
                     F.col("o_totalprice").cast(DEC).cast("double")
                     .alias("total_price"))
            .orderBy("o_orderkey"))


@register(
    "scd2_user_status",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_et
      FROM events),
    changes AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE prev_et IS NULL OR event_type <> prev_et)
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS valid_to_us
    FROM changes
    """)
def q_scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 versioning from a changelog (operators/scd.py): the
    events stream becomes a per-user status-history dimension — change
    compression then validity intervals, two window passes sharing ONE
    partitioning (single shuffle). valid_to NULL = current state."""
    from ..operators.scd import scd2_from_changelog

    events = load_table(spark, sf_dir, "events")
    return scd2_from_changelog(events, "user_id", "ts", "event_id",
                               ["event_type"])


#: fixed snapshot instant for scd2_snapshot_status: 2024-01-15 12:00 UTC,
#: mid-range of the events table's January-2024 span
_SNAP_US = 1_705_320_000_000_000


@register(
    "scd2_snapshot_status",
    f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_et
      FROM events),
    changes AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE prev_et IS NULL OR event_type <> prev_et),
    hist AS (
      SELECT user_id, event_type,
             epoch_us(ts) AS valid_from_us,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS valid_to_us
      FROM changes)
    SELECT user_id, event_type, valid_from_us, valid_to_us
    FROM hist
    WHERE valid_from_us <= {_SNAP_US}
      AND (valid_to_us IS NULL OR {_SNAP_US} < valid_to_us)
    """)
def q_scd2_snapshot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension TIME TRAVEL (operators/scd.scd2_snapshot): the per-user
    status dimension reconstructed as it stood at a fixed past instant
    (2024-01-15 12:00 UTC) — one covering version per user, pure
    scan-side filter, zero shuffles beyond the history build. Oracle:
    the same interval predicate on the recursive-window history."""
    from ..operators.scd import scd2_from_changelog, scd2_snapshot

    events = load_table(spark, sf_dir, "events")
    hist = scd2_from_changelog(events, "user_id", "ts", "event_id",
                               ["event_type"])
    return scd2_snapshot(hist, _SNAP_US)


@register(
    "pit_join_purchases",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_et
      FROM events),
    changes AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE prev_et IS NULL OR event_type <> prev_et),
    hist AS (
      SELECT user_id, event_type,
             epoch_us(ts) AS vf,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS vt
      FROM changes),
    hist2 AS (SELECT * FROM hist WHERE vt IS NULL OR vt > vf),
    facts AS (
      SELECT event_id, user_id, ts - INTERVAL 30 MINUTE AS fts
      FROM events WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id, epoch_us(f.fts) AS pit_us,
           h.event_type AS status_dim
    FROM facts f LEFT JOIN hist2 h
      ON f.user_id = h.user_id
     AND h.vf <= epoch_us(f.fts)
     AND (h.vt IS NULL OR epoch_us(f.fts) < h.vt)
    """)
def q_pit_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME temporal join (operators/scd.pit_join): each
    purchase event, time-shifted 30 minutes back (so pre-history
    timestamps exercise the NULL guard), joined to the user's SCD2
    status version valid AT that instant — the which-attributes-were-
    true-at-event-time query a plain dimension join silently answers
    with today's values. ONE shuffle: interval membership against
    gapless SCD2 history is a backward as-of join on valid_from plus a
    residual upper-bound guard, never an inequality nested loop.
    Oracle: brute-force interval LEFT JOIN."""
    from ..operators.scd import pit_join, scd2_from_changelog

    events = load_table(spark, sf_dir, "events")
    hist = scd2_from_changelog(events, "user_id", "ts", "event_id",
                               ["event_type"])
    facts = (events.where(F.col("event_type") == "purchase")
             .select("event_id", "user_id",
                     (F.col("ts") - F.expr("INTERVAL 30 MINUTES"))
                     .alias("fts")))
    out = pit_join(facts, hist, "user_id", fact_ts="fts",
                   attr_cols=["event_type"], suffix="_dim")
    return out.select("event_id", "user_id",
                      F.unix_micros(F.col("fts")).alias("pit_us"),
                      F.col("event_type_dim").alias("status_dim"))


from ..operators.zorder import zorder_sql, zorder_value  # noqa: E402

_Z_CUST = "o_custkey & 65535"
_Z_PRICE = "(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) >> 8) & 65535"


@register(
    "zorder_orders",
    f"""
    SELECT o_orderkey,
           {zorder_sql([_Z_CUST, _Z_PRICE])} AS zval
    FROM orders
    """)
def q_zorder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton Z-values over (custkey, price-bucket)
    (operators/zorder.py) — the multi-column clustering key behind
    OPTIMIZE ZORDER, checked value-for-value (pure integer bit math,
    engine-independent). The layout benefit (per-file footer ranges
    tighten on BOTH columns) is measured in test_maintenance.py."""
    orders = load_table(spark, sf_dir, "orders")
    pc = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return orders.select(
        "o_orderkey",
        zorder_value([F.col("o_custkey").bitwiseAND(F.lit(65535)),
                      F.shiftright(pc, 8).bitwiseAND(F.lit(65535))])
        .alias("zval"))


from ..operators.graph import bipartite_edges_sql, pagerank_int  # noqa: E402


@register("pagerank_supplier_orders", bipartite_edges_sql(iterations=3, k=20))
def q_pagerank_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PageRank (operators/graph.py) over the orders<->suppliers
    bipartite graph (one shipping year), 3 fixed iterations, top-20. All-integer
    recurrence -> bit-identical to the DuckDB unrolled-CTE oracle on any
    partitioning; the float form would drift per iteration and be
    uncheckable. The numeric fixed-point twin of dedup_clusters'
    transitive closure."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    fwd = (li.select((F.col("l_orderkey") * 2).alias("src"),
                     (F.col("l_suppkey") * 2 + 1).alias("dst"))
           .distinct())
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"),
                                       F.col("src").alias("dst")))
    ranks = pagerank_int(edges, iterations=3)
    return (ranks.orderBy(F.desc("rank_q"), F.asc("node")).limit(20))


@register(
    "set_ops_all",
    """
    WITH recent AS (SELECT o_custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'),
    big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    SELECT 'intersect_all' AS op, o_custkey FROM (
        SELECT o_custkey FROM recent
        INTERSECT ALL SELECT o_custkey FROM big)
    UNION ALL
    SELECT 'except_all', o_custkey FROM (
        SELECT o_custkey FROM recent
        EXCEPT ALL SELECT o_custkey FROM big)
    """)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicity
    min / difference per key — the multiset complement of set_ops'
    distinct forms. Spark plans both as a single aggregate computing
    per-side counts, never a join explosion."""
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    big = orders.where(F.col("o_totalprice") > 200000).select("o_custkey")
    parts = [
        ("intersect_all", recent.intersectAll(big)),
        ("except_all", recent.exceptAll(big)),
    ]
    out = None
    for label, df in parts:
        piece = df.select(F.lit(label).alias("op"), "o_custkey")
        out = piece if out is None else out.unionAll(piece)
    return out


@register(
    "grouping_sets_revenue",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS {_DECU})) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the irregular-lattice form ROLLUP/CUBE
    can't express (two independent single-column groupings + grand
    total, no pairwise cells). GROUPING() ids disambiguate real NULLs
    from subtotal NULLs. Spark expands the sets in ONE pass (Expand +
    single hash agg), not one scan per set. GROUPING SETS has no
    DataFrame API, so this is a spark.sql surface."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS revenue,
               COUNT(*) AS n,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                    AS BIGINT) AS gid
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@register(
    "fuzzy_name_pairs",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a JOIN customer b
      ON substr(a.c_name, 1, 17) = substr(b.c_name, 1, 17)
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching (operators/entity.py): name pairs
    within a prefix block at edit distance <= 1 — BLOCK -> PAIR ->
    SCORE, the only shape edit-distance matching survives at scale (the
    oracle's self-join is the semantic spec; the engine runs the
    group-collect pair generator, one shuffle, output-bounded)."""
    from ..operators.entity import blocked_fuzzy_pairs

    cust = load_table(spark, sf_dir, "customer")
    return blocked_fuzzy_pairs(cust, "c_custkey", "c_name",
                               F.substring(F.col("c_name"), 1, 17))


@register(
    "asof_next_purchase",
    """
    WITH purchases AS (
      -- pre-reduce to ONE row per (user_id, ts), keeping the greatest
      -- (event_id, value) payload: DuckDB's ASOF tie-pick among
      -- equal-timestamp matches is unspecified, so the oracle pins the
      -- same winner the engine's tie convention produces
      SELECT user_id, ts, event_id, value
      FROM (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC, value DESC) AS rn
        FROM events WHERE event_type = 'purchase')
      WHERE rn = 1
    ),
    clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    )
    SELECT c.user_id, c.event_id,
           p.event_id AS purchase_id, p.value AS purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """)
def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators/asof.asof_join_forward): attach to
    each click the user's NEXT purchase at-or-after it — the
    look-ahead direction DuckDB expresses natively as
    ``ASOF ... ON l.ts <= r.ts``, which is the oracle."""
    from ..operators.asof import asof_join_forward

    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase") \
                      .select("user_id", "ts", "event_id", "value")
    clicks = events.where(F.col("event_type") == "click") \
                   .select("user_id", "ts", "event_id")
    out = asof_join_forward(clicks, purchases, key="user_id",
                            payload=["event_id", "value"], suffix="_p")
    return out.select(
        "user_id", "event_id",
        F.col("event_id_p").alias("purchase_id"),
        F.col("value_p").alias("purchase_value"))


@register(
    "cdc_apply_changes",
    """
    WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    ch AS (
      SELECT o_orderkey, 1 AS seq, 'U' AS op, o_orderstatus,
             o_totalprice + 1.0 AS p
      FROM orders WHERE o_orderkey % 10 < 3
      UNION ALL
      SELECT o_orderkey, 2,
             CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END,
             o_orderstatus, o_totalprice + 2.0
      FROM orders WHERE o_orderkey % 10 < 3),
    latest AS (
      SELECT * FROM ch
      QUALIFY row_number() OVER (
          PARTITION BY o_orderkey ORDER BY seq DESC, op DESC) = 1)
    SELECT * FROM t
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, p AS o_totalprice
    FROM latest WHERE op != 'D'
    """)
def q_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog fold (operators/merge.apply_changes — the APPLY
    CHANGES INTO shape): a deterministic two-version changelog over 30%
    of orders (v1 updates price+1, v2 updates price+2 or deletes every
    third key); the highest sequence wins per key, deletes drop the
    key, untouched keys pass through. Oracle: the same fold in SQL."""
    from ..operators.merge import apply_changes

    orders = load_table(spark, sf_dir, "orders")
    target = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    base = orders.where(F.col("o_orderkey") % 10 < 3)
    ch1 = base.select(
        "o_orderkey", F.lit(1).alias("seq"), F.lit("U").alias("op"),
        "o_orderstatus", (F.col("o_totalprice") + 1.0).alias("o_totalprice"))
    ch2 = base.select(
        "o_orderkey", F.lit(2).alias("seq"),
        F.when(F.col("o_orderkey") % 3 == 0, "D").otherwise("U").alias("op"),
        "o_orderstatus", (F.col("o_totalprice") + 2.0).alias("o_totalprice"))
    return apply_changes(target, ch1.unionByName(ch2),
                         key_cols=["o_orderkey"], seq_col="seq")


@register(
    "share_of_total_by_nation",
    f"""
    WITH r AS (
      SELECT n.n_name AS nation,
             CAST(SUM(CAST(o.o_totalprice AS {_DECU})) AS DOUBLE) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name)
    SELECT nation, rev,
           CAST(floor(rev / CAST(SUM(CAST(rev AS DECIMAL(28,4))) OVER () AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS share_q6
    FROM r
    """)
def q_share_of_total_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue share of the global total
    via an unpartitioned window over the (tiny) aggregate — the share
    computation never touches the fact table a second time. Numerator
    and denominator are exact decimal sums cast once, so the quantized
    share is engine-identical."""
    from ..functions.exact import dsum

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (orders.join(cust, orders.o_custkey == cust.c_custkey)
           .join(F.broadcast(nation),
                 cust.c_nationkey == nation.n_nationkey)
           .groupBy(F.col("n_name").alias("nation"))
           .agg(dsum("o_totalprice", "rev")))
    from pyspark.sql import Window as _W
    # decimal window sum: double addition is order-dependent across
    # partitionings; the decimal fold is exact, so the quantized share
    # can never flip at a rounding boundary
    total = F.sum(F.col("rev").cast(DEC)).over(_W.partitionBy()) \
        .cast("double")
    return rev.select(
        "nation", "rev",
        F.floor(F.col("rev") / total * 1_000_000 + 0.5).cast("long")
        .alias("share_q6"))


@register(
    "recursive_key_depth",
    """
    WITH RECURSIVE keys AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 4000),
    r(k, depth) AS (
      SELECT k, 0 FROM keys
      WHERE k // 2 NOT IN (SELECT k FROM keys)
      UNION ALL
      SELECT c.k, r.depth + 1
      FROM keys c JOIN r ON c.k // 2 = r.k)
    SELECT depth, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k
    FROM r GROUP BY depth
    """)
def q_recursive_key_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE on the SQL surface (Spark 4's WITH RECURSIVE):
    root-distance over the implicit binary-tree hierarchy parent(k) =
    k div 2 restricted to existing order keys — roots are keys whose
    parent is absent; each key has exactly one parent, so the recursion
    terminates in O(log max_key) rounds. The declarative twin of the
    DataFrame-loop iteration in operators/graph.py (which remains the
    scale path: a loop controls per-round checkpointing and partition
    sizing; the CTE delegates both to the engine). Oracle: the same
    recursion in DuckDB."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_rec_orders")
    return spark.sql("""
        WITH RECURSIVE keys AS (
          SELECT o_orderkey AS k FROM _rec_orders WHERE o_orderkey <= 4000),
        r(k, depth) AS (
          SELECT k, 0 FROM keys
          WHERE k div 2 NOT IN (SELECT k FROM keys)
          UNION ALL
          SELECT c.k, r.depth + 1
          FROM keys c JOIN r ON c.k div 2 = r.k)
        SELECT depth, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k
        FROM r GROUP BY depth
    """)


@register(
    "mv_incremental_refresh",
    f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS {_DECU})) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(o_totalprice AS {_DECU})) AS DOUBLE) / COUNT(*)
               AS avg_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
       OR o_orderkey % 13 <> 0
    GROUP BY 1, 2
    """)
def q_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (operators/mv.py): a
    (month, priority) revenue view built over pre-2000 orders is folded
    forward with a changelog — post-2000 orders arrive as inserts, every
    13th pre-2000 key is deleted (before-image carried, the CDC
    contract) — WITHOUT rescanning the fact table: one hash aggregate
    over view-partials ∪ signed-delta-partials, groups reaching count 0
    drop. DECIMAL sums make the folded result bitwise-equal to the
    oracle's from-scratch GROUP BY over the final state — the defining
    property of correct incremental maintenance. At 100 TB: refresh
    cost is O(|delta| + |groups|) vs the reference's full truncate-
    reload re-aggregation (transform_staging.py:24-46)."""
    from ..operators.mv import build_agg_view, incremental_agg_refresh

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"))
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")
    keys = ["month", "o_orderpriority"]
    sums = {"sum_price_dec": "o_totalprice"}
    mv0 = build_agg_view(orders.where(F.col("o_orderdate") < cutoff),
                         keys, sums)
    inserts = orders.where(F.col("o_orderdate") >= cutoff) \
                    .withColumn("op", F.lit("I"))
    deletes = orders.where((F.col("o_orderdate") < cutoff)
                           & (F.col("o_orderkey") % 13 == 0)) \
                    .withColumn("op", F.lit("D"))
    refreshed = incremental_agg_refresh(
        mv0, inserts.unionByName(deletes), keys, sums)
    return refreshed.select(
        "month", "o_orderpriority", "n",
        F.col("sum_price_dec").cast("double").alias("sum_price"),
        (F.col("sum_price_dec").cast("double") / F.col("n"))
        .alias("avg_price"))


@register(
    "mv_join_refresh",
    f"""
    SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
           o.o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o.o_totalprice AS {_DECU})) AS DOUBLE)
               AS sum_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
       OR o.o_orderkey % 13 <> 0
    GROUP BY 1, 2
    """)
def q_mv_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-VIEW incremental maintenance (operators/mv.py
    incremental_join_agg_refresh — VERDICT r13 Missing #4): a
    (nation, priority) revenue view over orders ⋈ customer built from
    pre-2000 facts is folded forward with a fact changelog — post-2000
    inserts, every 13th pre-2000 key deleted with its before-image —
    by joining the DELTA rows to the broadcast dim and applying the
    signed union+hash-agg fold; the fact table is never rescanned and
    the dim is read once per fold. The oracle is the from-scratch
    join + GROUP BY over the final fact state — fold-equals-rebuild,
    bitwise (DECIMAL partials). The no-drift pytest
    (tests/test_mv.py) pins untouched groups byte-stable across
    repeated folds."""
    from ..operators.mv import (
        build_join_agg_view,
        incremental_join_agg_refresh,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority",
        "o_totalprice")
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("nationkey"))
    fact = orders.withColumnRenamed("o_custkey", "c_custkey")
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")
    keys = ["nationkey", "o_orderpriority"]
    sums = {"sum_price_dec": "o_totalprice"}
    mv0 = build_join_agg_view(fact.where(F.col("o_orderdate") < cutoff),
                              dim, ["c_custkey"], keys, sums)
    inserts = fact.where(F.col("o_orderdate") >= cutoff) \
                  .withColumn("op", F.lit("I"))
    deletes = fact.where((F.col("o_orderdate") < cutoff)
                         & (F.col("o_orderkey") % 13 == 0)) \
                  .withColumn("op", F.lit("D"))
    refreshed = incremental_join_agg_refresh(
        mv0, inserts.unionByName(deletes), dim, ["c_custkey"],
        keys, sums)
    return refreshed.select(
        "nationkey", "o_orderpriority", "n",
        F.col("sum_price_dec").cast("double").alias("sum_price"))


@register(
    "mv_join_dim_refresh",
    f"""
    SELECT CASE WHEN c.c_custkey % 7 = 3
                THEN CAST(c.c_nationkey AS BIGINT) + 100
                ELSE CAST(c.c_nationkey AS BIGINT) END AS nationkey,
           o.o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o.o_totalprice AS {_DECU})) AS DOUBLE)
               AS sum_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """)
def q_mv_join_dim_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIM-side incremental maintenance of a join-aggregate view
    (operators/mv.py incremental_join_agg_refresh_dim): the
    (nation, priority) revenue view is built over ALL facts with the
    original customer dim, then every 7th customer "moves nation"
    (nationkey + 100) and the move is folded as the classic signed
    dim-update delta — each affected fact contributes one 'D' partial
    under the old nation and one 'I' under the new, through ONE
    key-semi-scoped fact scan; no group is re-aggregated. The oracle
    is the from-scratch join + GROUP BY under the UPDATED dim —
    fold-equals-rebuild for dimension churn, the edge fact-side IVM
    cannot express."""
    from ..operators.mv import (
        build_join_agg_view,
        incremental_join_agg_refresh_dim,
    )

    fact = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey",
        "o_orderpriority", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("nationkey"))
    keys = ["nationkey", "o_orderpriority"]
    sums = {"sum_price_dec": "o_totalprice"}
    mv0 = build_join_agg_view(fact, cust, ["c_custkey"], keys, sums)
    movers = cust.where(F.col("c_custkey") % 7 == 3)
    changes = (movers.withColumn("op", F.lit("D"))
               .unionByName(movers.withColumn(
                   "nationkey", F.col("nationkey") + 100)
                   .withColumn("op", F.lit("I"))))
    refreshed = incremental_join_agg_refresh_dim(
        mv0, changes, fact, ["c_custkey"], keys, sums)
    return refreshed.select(
        "nationkey", "o_orderpriority", "n",
        F.col("sum_price_dec").cast("double").alias("sum_price"))


# ---- HyperLogLog register sketch: m=256 buckets over 60-bit md5
# hashes. Both engines build the IDENTICAL register table (same hash,
# same bucket split, same first-one rank), so the whole sketch — not
# just its estimate — is deterministic and the single-row summary is
# hash-checked. rho = 53 - len(bin(w)) is the 1-based first-one
# position of the 52-bit hash suffix (53 for the all-zero suffix);
# scaling the harmonic sum by 2^61 turns it into exact DECIMAL integer
# arithmetic, so the only float ops are one cast, two divisions and a
# multiply, performed in the same order on both engines.
_HLL_H = ("CAST(('0x' || substr(md5('hll' || '|' || "
          "CAST(o_custkey AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT")
_POW61 = 1 << 61
#: alpha_256 * m^2 — embedded as the same repr-literal on both sides
_ALPHA_M2 = repr(0.7213 / (1.0 + 1.079 / 256.0) * 65536.0)
#: the raw harmonic estimator and its small-range correction
#: (Flajolet et al. 2007 §4, linear counting over the V empty buckets
#: when raw <= 2.5m) — the same expression, in the same float order,
#: as operators/sketch.hll_estimate; shared by every HLL oracle
_HLL_RAW = (f"{_ALPHA_M2} / (CAST(t_used + CAST(256 - used AS "
            f"DECIMAL(38,0)) * {_POW61} AS DOUBLE) / {_POW61}.0)")
_HLL_EST = (f"CASE WHEN {_HLL_RAW} <= 2.5 * 256 AND used < 256 "
            f"THEN 256.0 * ln(256.0 / CAST(256 - used AS DOUBLE)) "
            f"ELSE {_HLL_RAW} END")


@register(
    "sketch_hll_custkey",
    f"""
    WITH h AS (SELECT {_HLL_H} AS h60 FROM orders),
    reg AS (
      SELECT h60 % 256 AS bucket,
             MAX(CASE WHEN h60 // 256 = 0 THEN 53
                      ELSE 53 - length(bin(h60 // 256)) END) AS maxr
      FROM h GROUP BY 1),
    s AS (
      SELECT COUNT(*) AS used,
             SUM(CAST((1::BIGINT << (61 - maxr)) AS DECIMAL(38,0))) AS t_used
      FROM reg),
    est AS (
      SELECT used,
             {_HLL_EST} AS est
      FROM s),
    exact AS (SELECT COUNT(DISTINCT o_custkey) AS exact_n FROM orders)
    SELECT CAST(256 AS BIGINT) AS m,
           CAST(used AS BIGINT) AS used_buckets,
           CAST(floor(est + 0.5) AS BIGINT) AS est_n,
           exact_n,
           CAST(floor(abs(est - CAST(exact_n AS DOUBLE))
                      / CAST(exact_n AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
               AS err_ppm
    FROM est, exact
    """)
def q_sketch_hll_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog distinct-count sketch (m=256) over order
    custkeys, plus its error vs the exact distinct count. The register
    table is a 256-row MAX aggregate — the 100 TB story: per-partition
    register partials merge by elementwise MAX, so a global distinct
    count costs a 256-row shuffle instead of shuffling every raw key
    the way COUNT(DISTINCT) must (and unlike approx_count_distinct's
    opaque binary sketch, these registers are a queryable table that
    unions across days/tables by the same MAX). md5-derived hashes make
    Spark's registers bit-identical to the DuckDB oracle's, so the
    estimate — a pure function of the registers via exact 2^61-scaled
    DECIMAL arithmetic — hash-matches too."""
    from ..operators.sketch import hll_estimate, hll_register_table

    orders = load_table(spark, sf_dir, "orders")
    est = hll_estimate(hll_register_table(orders, "o_custkey"))
    exact = orders.agg(F.countDistinct("o_custkey").alias("exact_n"))
    return est.crossJoin(exact).select(
        F.lit(256).cast("long").alias("m"),
        F.col("used").cast("long").alias("used_buckets"),
        F.floor(F.col("est") + 0.5).cast("long").alias("est_n"),
        "exact_n",
        F.floor(F.abs(F.col("est") - F.col("exact_n").cast("double"))
                / F.col("exact_n").cast("double") * 1000000 + 0.5)
         .cast("long").alias("err_ppm"))


@register(
    "sketch_hll_by_month",
    f"""
    WITH h AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month, {_HLL_H} AS h60
      FROM orders),
    reg AS (
      SELECT month, h60 % 256 AS bucket,
             MAX(CASE WHEN h60 // 256 = 0 THEN 53
                      ELSE 53 - length(bin(h60 // 256)) END) AS maxr
      FROM h GROUP BY 1, 2),
    s AS (
      SELECT month, COUNT(*) AS used,
             SUM(CAST((1::BIGINT << (61 - maxr)) AS DECIMAL(38,0))) AS t_used
      FROM reg GROUP BY month),
    est AS (
      SELECT month, used,
             {_HLL_EST} AS est
      FROM s),
    exact AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             COUNT(DISTINCT o_custkey) AS exact_n
      FROM orders GROUP BY 1)
    SELECT month, CAST(used AS BIGINT) AS used_buckets,
           CAST(floor(est + 0.5) AS BIGINT) AS est_n, exact_n
    FROM est JOIN exact USING (month)
    """)
def q_sketch_hll_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers PER MONTH from grouped HLL registers
    (operators/sketch.hll_register_table with group_cols) — the shape
    COUNT(DISTINCT x) GROUP BY g cannot reach at scale without
    shuffling every raw (g, x) pair: here state is 256 register rows
    per group, partials merge by MAX, and monthly tables roll up to
    yearly by the same merge. Registers and estimates are engine-
    identical (md5 hashing + exact-DECIMAL harmonic sums); exact
    counts joined per month expose the per-group error."""
    from ..operators.sketch import hll_estimate, hll_register_table

    orders = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"), "o_custkey")
    est = hll_estimate(
        hll_register_table(orders, "o_custkey", group_cols=("month",)),
        ("month",))
    exact = orders.groupBy("month").agg(
        F.countDistinct("o_custkey").alias("exact_n"))
    return est.join(exact, "month").select(
        "month", F.col("used").cast("long").alias("used_buckets"),
        F.floor(F.col("est") + 0.5).cast("long").alias("est_n"),
        "exact_n")


@register(
    "mv_hll_refresh",
    f"""
    WITH final_fact AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month, o_custkey
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
         OR o_orderkey % 13 <> 0),
    h AS (SELECT month, {_HLL_H} AS h60 FROM final_fact),
    reg AS (
      SELECT month, h60 % 256 AS bucket,
             MAX(CASE WHEN h60 // 256 = 0 THEN 53
                      ELSE 53 - length(bin(h60 // 256)) END) AS maxr
      FROM h GROUP BY 1, 2),
    s AS (
      SELECT month, COUNT(*) AS used,
             SUM(CAST((1::BIGINT << (61 - maxr)) AS DECIMAL(38,0))) AS t_used
      FROM reg GROUP BY month),
    est AS (
      SELECT month, used,
             {_HLL_EST} AS est
      FROM s),
    exact AS (
      SELECT month, COUNT(DISTINCT o_custkey) AS exact_n
      FROM final_fact GROUP BY 1)
    SELECT month, CAST(used AS BIGINT) AS used_buckets,
           CAST(floor(est + 0.5) AS BIGINT) AS est_n, exact_n
    FROM est JOIN exact USING (month)
    """)
def q_mv_hll_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained DISTINCT-COUNT view (operators/mv.py
    incremental_distinct_refresh, VERDICT r14 Missing #3): distinct
    customers per month kept as mergeable HLL registers — a
    (month, pre-2000) view folds forward post-2000 INSERTS by
    register MAX-merge (idempotent: fold == rebuild bitwise, never a
    fact rescan) while pre-2000 DELETES (every 13th key,
    non-subtractable from a sketch by construction) route their
    touched months to a delta-scoped re-sketch of the final fact
    state. The oracle is the from-scratch grouped HLL of the final
    state (identical md5 registers + exact-DECIMAL harmonic sums —
    the sketch_hll_by_month mirror), with exact COUNT(DISTINCT)
    joined so the sketch's error stays visible. At 100 TB the view is
    256 rows/group of state and a refresh is O(|delta| + touched
    groups) — COUNT(DISTINCT) GROUP BY month over the fact would
    shuffle every raw (month, custkey) pair per refresh."""
    from ..operators.mv import (
        build_distinct_view,
        incremental_distinct_refresh,
    )
    from ..operators.sketch import hll_estimate

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"))
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")
    mv0 = build_distinct_view(
        orders.where(F.col("o_orderdate") < cutoff), ["month"],
        "o_custkey")
    inserts = orders.where(F.col("o_orderdate") >= cutoff) \
                    .withColumn("op", F.lit("I"))
    deletes = orders.where((F.col("o_orderdate") < cutoff)
                           & (F.col("o_orderkey") % 13 == 0)) \
                    .withColumn("op", F.lit("D"))
    final_fact = orders.where((F.col("o_orderdate") >= cutoff)
                              | (F.col("o_orderkey") % 13 != 0))
    refreshed = incremental_distinct_refresh(
        mv0, inserts.unionByName(deletes), ["month"], "o_custkey",
        fact=final_fact)
    est = hll_estimate(refreshed, ("month",))
    exact = final_fact.groupBy("month").agg(
        F.countDistinct("o_custkey").alias("exact_n"))
    return est.join(exact, "month").select(
        "month", F.col("used").cast("long").alias("used_buckets"),
        F.floor(F.col("est") + 0.5).cast("long").alias("est_n"),
        "exact_n")


@register(
    "mv_join_hll_refresh",
    f"""
    WITH final_fact AS (
      SELECT o_orderkey, o_custkey
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
         OR o_orderkey % 13 <> 0),
    joined AS (
      SELECT c.c_nationkey, f.o_custkey
      FROM final_fact f JOIN customer c ON f.o_custkey = c.c_custkey),
    h AS (SELECT c_nationkey, {_HLL_H} AS h60 FROM joined),
    reg AS (
      SELECT c_nationkey, h60 % 256 AS bucket,
             MAX(CASE WHEN h60 // 256 = 0 THEN 53
                      ELSE 53 - length(bin(h60 // 256)) END) AS maxr
      FROM h GROUP BY 1, 2),
    s AS (
      SELECT c_nationkey, COUNT(*) AS used,
             SUM(CAST((1::BIGINT << (61 - maxr)) AS DECIMAL(38,0))) AS t_used
      FROM reg GROUP BY c_nationkey),
    est AS (
      SELECT c_nationkey, used,
             {_HLL_EST} AS est
      FROM s),
    exact AS (
      SELECT c_nationkey, COUNT(DISTINCT o_custkey) AS exact_n
      FROM joined GROUP BY 1)
    SELECT c_nationkey, CAST(used AS BIGINT) AS used_buckets,
           CAST(floor(est + 0.5) AS BIGINT) AS est_n, exact_n
    FROM est JOIN exact USING (c_nationkey)
    """)
def q_mv_join_hll_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained JOIN-distinct-count view (operators/mv
    incremental_join_distinct_refresh — the build_join_agg_view
    composition with the HLL register representation): distinct
    active customers per NATION, where the nation comes from the
    customer dim and the activity from the orders fact. A pre-2000
    view folds post-2000 inserts by register MAX-merge through the
    broadcast dim join (fold == rebuild bitwise, fact never
    rescanned) while pre-2000 deletes route their touched nations to
    a re-sketch of the final fact state through the SAME join. The
    oracle is the from-scratch grouped HLL of the final joined state
    with exact COUNT(DISTINCT) joined per nation — the mv_hll_refresh
    contract lifted over a star join."""
    from ..operators.mv import (
        build_join_distinct_view,
        incremental_join_distinct_refresh,
    )
    from ..operators.sketch import hll_estimate

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate",
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_custkey"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")
    keys, item, on = ["c_nationkey"], "o_custkey", ["c_custkey"]
    mv0 = build_join_distinct_view(
        orders.where(F.col("o_orderdate") < cutoff), cust, on, keys,
        item)
    inserts = orders.where(F.col("o_orderdate") >= cutoff) \
                    .withColumn("op", F.lit("I"))
    deletes = orders.where((F.col("o_orderdate") < cutoff)
                           & (F.col("o_orderkey") % 13 == 0)) \
                    .withColumn("op", F.lit("D"))
    final_fact = orders.where((F.col("o_orderdate") >= cutoff)
                              | (F.col("o_orderkey") % 13 != 0))
    refreshed = incremental_join_distinct_refresh(
        mv0, inserts.unionByName(deletes), cust, on, keys, item,
        fact=final_fact)
    est = hll_estimate(refreshed, ("c_nationkey",))
    exact = (final_fact.join(F.broadcast(cust), on, "inner")
             .groupBy("c_nationkey")
             .agg(F.countDistinct(item).alias("exact_n")))
    return est.join(exact, "c_nationkey").select(
        "c_nationkey",
        F.col("used").cast("long").alias("used_buckets"),
        F.floor(F.col("est") + 0.5).cast("long").alias("est_n"),
        "exact_n")


@register(
    "cdc_snapshot_diff",
    """
    WITH old_s AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    new_s AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 17 = 0),
    j AS (
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
             o.o_orderkey AS ok, n.o_orderkey AS nk,
             o.o_orderstatus AS o_st, o.o_totalprice AS o_pr,
             n.o_orderstatus AS n_st, n.o_totalprice AS n_pr
      FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey)
    SELECT k AS o_orderkey,
           CASE WHEN ok IS NULL THEN 'I'
                WHEN nk IS NULL THEN 'D' ELSE 'U' END AS op,
           CAST(1 AS INT) AS seq,
           CASE WHEN nk IS NOT NULL THEN n_st ELSE o_st END AS o_orderstatus,
           CASE WHEN nk IS NOT NULL THEN n_pr ELSE o_pr END AS o_totalprice
    FROM j
    WHERE NOT (ok IS NOT NULL AND nk IS NOT NULL
               AND o_st IS NOT DISTINCT FROM n_st
               AND o_pr IS NOT DISTINCT FROM n_pr)
    """)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff CDC derivation (operators/merge.snapshot_diff, the
    inverse of apply_changes): given two full table states — deletes
    (every 13th key), price updates (every 11th doubled), inserts
    (every 17th re-keyed) — emit exactly the I/U/D changelog that
    replays one into the other; output bounded by true change volume.
    The apply_changes and MV-refresh roundtrips are pytest-asserted;
    this oracle checks the derived changelog row-for-row."""
    from ..operators.merge import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    new_s = (orders.where(F.col("o_orderkey") % 13 != 0)
             .withColumn("o_totalprice",
                         F.when(F.col("o_orderkey") % 11 == 0,
                                F.col("o_totalprice") * 2)
                          .otherwise(F.col("o_totalprice")))
             .unionByName(
                 orders.where(F.col("o_orderkey") % 17 == 0).select(
                     (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                     "o_orderstatus", "o_totalprice")))
    return snapshot_diff(orders, new_s, ["o_orderkey"])


@register(
    "mv_minmax_refresh",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS {_DECU})) AS DOUBLE) AS sum_price,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
       OR o_orderkey % 13 <> 0
    GROUP BY 1
    """)
def q_mv_minmax_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-aggregate MV maintenance: COUNT/SUM fold incrementally
    (operators/mv.incremental_agg_refresh — additive), while MIN/MAX —
    which deletes break (the runner-up is gone from the view) — are
    repaired by delta_scoped_recompute: re-aggregate ONLY the groups
    the changelog touches, reading just those groups' fact rows
    (partition/bucket pruning at rest), then join the two halves.
    Oracle: a from-scratch GROUP BY over the final state — proving the
    composed maintenance lands exactly on the rebuild, the contract
    that makes partial recomputation trustworthy."""
    from ..operators.merge import merge_upsert
    from ..operators.mv import (build_agg_view, delta_scoped_recompute,
                                incremental_agg_refresh)

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")
    keys = ["o_orderpriority"]
    sums = {"sum_dec": "o_totalprice"}
    old = orders.where(F.col("o_orderdate") < cutoff)
    inserts = orders.where(F.col("o_orderdate") >= cutoff) \
                    .withColumn("op", F.lit("I"))
    deletes = old.where(F.col("o_orderkey") % 13 == 0) \
                 .withColumn("op", F.lit("D"))
    changes = inserts.unionByName(deletes)
    # additive half: fold the changelog into the stored view
    additive = incremental_agg_refresh(
        build_agg_view(old, keys, sums), changes, keys, sums)
    # non-additive half: the view STORES min/max; recompute only the
    # groups the changelog touches from the final fact state (at rest:
    # that scan prunes to those groups) and UPSERT over the stored rows
    # — untouched groups keep their old min/max instead of being
    # inner-joined away (they would vanish if the delta skipped them)
    mm_aggs = [F.max("o_totalprice").alias("max_price"),
               F.min("o_totalprice").alias("min_price")]
    mm_view = old.groupBy(*keys).agg(*mm_aggs)
    final_fact = orders.where(
        (F.col("o_orderdate") >= cutoff) | (F.col("o_orderkey") % 13 != 0))
    recomputed = delta_scoped_recompute(
        final_fact, changes.select(*keys), keys, mm_aggs)
    minmax = merge_upsert(recomputed, mm_view, keys)
    return (additive.join(minmax, keys)
            .select("o_orderpriority", "n",
                    F.col("sum_dec").cast("double").alias("sum_price"),
                    "max_price", "min_price"))


#: Benford leading-digit probabilities log10(1+1/d), embedded as the
#: same repr-literals in both engines
import math as _math

_BENFORD = {d: repr(_math.log10(1 + 1 / d)) for d in range(1, 10)}
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD.items())


@register(
    "dq_benford_totalprice",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    n AS (SELECT COUNT(*) AS total FROM digits)
    SELECT digit, COUNT(*) AS n,
           CAST(floor(CAST(COUNT(*) AS DOUBLE) / CAST(total AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS share_q6,
           CAST(floor(CAST((CASE digit {_BENFORD_CASE} END) AS DOUBLE) * 1000000 + 0.5)
                AS BIGINT) AS benford_q6
    FROM digits, n
    GROUP BY digit, total
    """)
def q_dq_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford leading-digit audit on order totals — the forensic
    data-quality check for fabricated or truncated monetary data:
    observed first-digit shares next to the Benford expectation
    log10(1+1/d) (embedded as identical literals on both engines).
    One digit-extraction scan + a 9-row aggregate; the total rides a
    1-row cross (in effect a broadcast scalar). Interpretation stays
    with the caller — uniform generated prices are EXPECTED to deviate
    (deviation detection working as intended)."""
    orders = load_table(spark, sf_dir, "orders")
    digits = (orders.where(F.col("o_totalprice") >= 1)
              .select(F.substring(F.floor("o_totalprice").cast("bigint")
                                  .cast("string"), 1, 1)
                      .cast("long").alias("digit")))
    from pyspark.sql import Window as _W

    total = F.sum(F.count(F.lit(1))).over(_W.partitionBy())
    agg = digits.groupBy("digit").agg(
        F.count(F.lit(1)).alias("n"), total.alias("_total"))
    benford = None
    for d, p in _BENFORD.items():
        cond = F.col("digit") == d
        benford = (F.when(cond, F.lit(float(p))) if benford is None
                   else benford.when(cond, F.lit(float(p))))
    return agg.select(
        "digit", "n",
        F.floor(F.col("n").cast("double") / F.col("_total").cast("double")
                * 1_000_000 + 0.5).cast("long").alias("share_q6"),
        F.floor(benford * 1_000_000 + 0.5).cast("long").alias("benford_q6"))


@register(
    "stat_corr_qty_price",
    """
    WITH q AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
      FROM lineitem),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,0))
                      * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(19,0))
                      * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(19,0))
                      * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS syy
      FROM q)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(floor((n * sxy - sx * sy)
                      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                      * 1000000 + 0.5) AS BIGINT) AS corr_q6
    FROM s
    """)
def q_stat_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price over lineitem,
    computed from EXACT integer sums (Σx, Σy, Σxy, Σx², Σy² accumulate
    in DECIMAL after quantizing the money column to cents) with a
    fixed-order float finish — engine-identical, unlike corr()'s
    streaming covariance whose update order differs per engine. One
    map-combined scan aggregate; at 100 TB this is the cheapest
    possible statistic (no shuffle beyond the 1-row combine)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
         .cast("long").alias("y"))
    d19 = "decimal(19,0)"
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19))
         .cast("double").alias("sxy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19))
         .cast("double").alias("sxx"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19))
         .cast("double").alias("syy"))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                 * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")))
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.floor(num / den * 1_000_000 + F.lit(0.5)).cast("long")
         .alias("corr_q6"))


@register(
    "skew_report_custkey",
    """
    WITH counts AS (
      SELECT CAST(o_custkey AS VARCHAR) AS key, COUNT(*) AS cnt
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT key, cnt,
             row_number() OVER (ORDER BY cnt ASC, key ASC) AS rn,
             COUNT(*) OVER () AS nk
      FROM counts),
    s AS (
      SELECT MAX(nk) AS n_keys, MAX(cnt) AS max_cnt,
             (max(struct_pack(c := cnt, k := key))).k AS top_key,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * nk) AS BIGINT)
                      THEN cnt END) AS p50_cnt,
             MAX(CASE WHEN rn = CAST(ceil(0.9 * nk) AS BIGINT)
                      THEN cnt END) AS p90_cnt,
             MAX(CASE WHEN rn = CAST(ceil(0.99 * nk) AS BIGINT)
                      THEN cnt END) AS p99_cnt
      FROM ranked)
    SELECT n_keys, max_cnt, top_key, p50_cnt, p90_cnt, p99_cnt,
           CAST(floor(CAST(max_cnt AS DOUBLE) / CAST(p50_cnt AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS max_over_p50_q6
    FROM s
    """)
def q_skew_report_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis (operators/skew.skew_report) for
    orders.o_custkey: distinct keys, max and exact-rank p50/p90/p99
    per-key counts, the heaviest key, and the max/median ratio that
    decides salting vs AQE-split BEFORE a job ships — the measurement
    step the skew fixes assume. Quantiles are percentile_disc-style
    exact rank picks, engine-identical."""
    from ..operators.skew import skew_report

    return skew_report(load_table(spark, sf_dir, "orders"), ["o_custkey"])


@register(
    "stat_trend_daily_revenue",
    """
    WITH daily AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS x,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
      FROM orders GROUP BY 1),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,0))
                      * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(19,0))
                      * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx
      FROM daily)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
                      + 0.5) AS BIGINT) AS slope_cents_per_day,
           CAST(floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                      / n + 0.5) AS BIGINT) AS intercept_cents
    FROM s
    """)
def q_stat_trend_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS trend of daily revenue: slope (cents/day) and intercept from
    the closed-form least-squares solution over exact integer sums
    (epoch-day x, cents y; Σx/Σy/Σxy/Σx² in DECIMAL, fixed-order float
    finish) — the deterministic what-direction-is-revenue-going
    companion to w_anomaly_daily_revenue's where-did-it-spike. One
    daily aggregate + a 1-row fold; no shuffle beyond them."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        (F.unix_micros(F.col("o_orderdate").cast("timestamp"))
         / F.lit(86_400_000_000))
        .cast("long").alias("x"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                   .cast("long")).alias("y")))
    d19 = "decimal(19,0)"
    s = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19))
         .cast("double").alias("sxy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19))
         .cast("double").alias("sxx"))
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return s.select(
        F.col("n").cast("long").alias("n_days"),
        F.floor(slope + F.lit(0.5)).cast("long")
         .alias("slope_cents_per_day"),
        F.floor((F.col("sy") - slope * F.col("sx")) / F.col("n")
                + F.lit(0.5)).cast("long").alias("intercept_cents"))


@register(
    "stat_gini_customer_revenue",
    """
    WITH cust AS (
      SELECT o_custkey,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents ASC, o_custkey ASC) AS i,
             COUNT(*) OVER () AS n
      FROM cust),
    s AS (
      SELECT CAST(MAX(n) AS DOUBLE) AS n,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(i AS DECIMAL(19,0))
                      * CAST(cents AS DECIMAL(19,0))) AS DOUBLE) AS siy
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(floor((2.0 * siy / (n * sy) - (n + 1.0) / n)
                      * 1000000 + 0.5) AS BIGINT) AS gini_q6
    FROM s
    """)
def q_stat_gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers — the
    single-number inequality measure behind every 'top X% of customers
    drive Y% of revenue' claim, computed from the closed-form
    G = 2·Σ(i·yᵢ)/(n·Σy) − (n+1)/n over revenue ranked ascending.
    Integer-cents revenue, DECIMAL-exact Σy and Σ(i·y), fixed-order
    float finish; the rank window runs over the per-customer aggregate
    (bounded by |customers|), never raw orders."""
    from pyspark.sql import Window as _W

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
              .cast("long")).alias("cents"))
    w = _W.orderBy(F.asc("cents"), F.asc("o_custkey"))
    ranked = cust.select(
        "cents", F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(_W.partitionBy()).alias("n"))
    d19 = "decimal(19,0)"
    s = ranked.agg(
        F.max("n").cast("double").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
         .alias("sy"),
        F.sum(F.col("i").cast(d19) * F.col("cents").cast(d19))
         .cast("double").alias("siy"))
    gini = (F.lit(2.0) * F.col("siy") / (F.col("n") * F.col("sy"))
            - (F.col("n") + F.lit(1.0)) / F.col("n"))
    return s.select(
        F.col("n").cast("long").alias("n_customers"),
        F.floor(gini * 1_000_000 + F.lit(0.5)).cast("long")
         .alias("gini_q6"))


@register(
    "drift_weekly_events",
    """
    SELECT event_type,
           COUNT(*) FILTER (ts >= TIMESTAMP '2024-01-01 00:00:00'
                        AND ts <  TIMESTAMP '2024-01-08 00:00:00') AS n_a,
           COUNT(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-01 00:00:00'
                                AND ts <  TIMESTAMP '2024-01-08 00:00:00'
                               THEN user_id END) AS keys_a,
           CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-01 00:00:00'
                                   AND ts < TIMESTAMP '2024-01-08 00:00:00'
                  THEN CAST(floor(value * 10000 + 0.5) AS BIGINT) END), 0)
                AS BIGINT) AS vsum_a,
           COUNT(*) FILTER (ts >= TIMESTAMP '2024-01-08 00:00:00'
                        AND ts <  TIMESTAMP '2024-01-15 00:00:00') AS n_b,
           COUNT(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-08 00:00:00'
                                AND ts <  TIMESTAMP '2024-01-15 00:00:00'
                               THEN user_id END) AS keys_b,
           CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-08 00:00:00'
                                   AND ts < TIMESTAMP '2024-01-15 00:00:00'
                  THEN CAST(floor(value * 10000 + 0.5) AS BIGINT) END), 0)
                AS BIGINT) AS vsum_b,
           (COUNT(*) FILTER (ts >= TIMESTAMP '2024-01-08 00:00:00'
                         AND ts <  TIMESTAMP '2024-01-15 00:00:00')
            - COUNT(*) FILTER (ts >= TIMESTAMP '2024-01-01 00:00:00'
                           AND ts <  TIMESTAMP '2024-01-08 00:00:00'))
             AS n_delta,
           (CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-08 00:00:00'
                                    AND ts < TIMESTAMP '2024-01-15 00:00:00'
                  THEN CAST(floor(value * 10000 + 0.5) AS BIGINT) END), 0)
                 AS BIGINT)
            - CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-01 00:00:00'
                                      AND ts < TIMESTAMP '2024-01-08 00:00:00'
                  THEN CAST(floor(value * 10000 + 0.5) AS BIGINT) END), 0)
                 AS BIGINT)) AS vsum_delta
    FROM events
    GROUP BY event_type
    """)
def q_drift_weekly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week drift report per event_type
    (operators/quality.drift_report): counts, distinct users, and exact
    quantized value sums for two adjacent weeks plus deltas — the
    publish-gate complement of dq_orders_contract ("valid" vs "suddenly
    different"). ONE conditional-aggregation scan, one hash-agg shuffle;
    quantization uses the repo-wide floor(x*1e4+0.5) convention so both
    engines sum identical integers."""
    from ..operators.quality import drift_report

    ev = load_table(spark, sf_dir, "events")
    in_a = ((F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-08").cast("timestamp")))
    in_b = ((F.col("ts") >= F.lit("2024-01-08").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-15").cast("timestamp")))
    vq = F.floor(F.col("value") * 10_000 + F.lit(0.5)).cast("long")
    return drift_report(ev, "event_type", in_a, in_b, "user_id", vq)


from ..functions.hashing import duck_hash60_sql, hash60  # noqa: E402


@register(
    "purge_propagation",
    f"""
    WITH params AS (
      SELECT GREATEST(1, CAST(ceil(COUNT(*) / {500_000}.0) AS BIGINT)) AS m
      FROM orders),
    sampled AS (
      SELECT o.* FROM orders o, params p WHERE o.o_orderkey % p.m = 0),
    corpus AS (
      SELECT o_orderkey AS key, CAST(year(o_orderdate) AS BIGINT) AS part,
             o_custkey AS val
      FROM sampled),
    fp AS (
      SELECT o_orderkey AS key, o_orderkey % 8 AS part,
             {duck_hash60_sql("CAST(o_orderkey AS VARCHAR)", "fp|")} AS val
      FROM sampled),
    doomed AS (SELECT key FROM corpus WHERE part = 2001 OR key % 97 = 0)
    SELECT 'corpus' AS store, key, part, val FROM corpus
    WHERE key NOT IN (SELECT key FROM doomed)
    UNION ALL
    SELECT 'fp' AS store, key, part, val FROM fp
    WHERE key NOT IN (SELECT key FROM doomed)
    """)
def q_purge_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compliance purge, cross-engine-checked end to end
    (operators/merge.py purge_keys_everywhere): a year-partitioned
    corpus store AND a derived fingerprint store (different key column,
    different bucket layout — forgetting a document must also forget
    the data ABOUT it) are materialized, one forget request fans out
    over both, and the COMBINED read-back final state is the result.
    The oracle is the from-scratch anti-join over the same inputs — the
    merge_upsert_orders pattern for mutations.

    The request empties the corpus store's part=2001 directory
    entirely, so the FileSystem-delete edge is under the hard signal:
    dynamic partition overwrite never rewrites a directory it has no
    rows for, and without the explicit removal the purged year's files
    would silently survive — and show up here as extra rows against
    the oracle. The key list is request-sized (contract-capped at
    PURGE_MAX_KEYS; ~1/97 of keys plus one partial year), and purge
    cost is ∝ the affected partitions' data, never table size.

    The stores are built from a DETERMINISTIC key-modulus sample whose
    modulus scales with row count (m = ceil(n / 500k), identity at the
    test scale factors) so the doomed set — ~1/10 of the store (the
    partial year dominates) — stays under the PURGE_MAX_KEYS contract
    at ANY sf instead of raising around sf~6.5 (ADVICE r12); the
    oracle computes the same m from the same COUNT(*)."""
    import tempfile

    from ..operators.merge import purge_keys_everywhere

    orders = load_table(spark, sf_dir, "orders")
    m = max(1, -(-orders.count() // 500_000))
    orders = orders.where(F.col("o_orderkey") % m == 0)
    corpus = orders.select(
        F.col("o_orderkey").alias("key"),
        F.year("o_orderdate").cast("long").alias("part"),
        F.col("o_custkey").alias("val"))
    fp = orders.select(
        F.col("o_orderkey").alias("doc"),
        (F.col("o_orderkey") % 8).alias("bucket"),
        hash60(F.col("o_orderkey").cast("string"), "fp|").alias("fpv"))
    base = tempfile.mkdtemp(prefix="purge_prop_")
    cpath, fpath = base + "/corpus", base + "/fp"
    # the two store writes and the doomed-key collect share no state
    # (all derive from the in-memory orders projection) — overlap them
    # as concurrent driver-thread jobs (guide §2.6) instead of three
    # sequential stage chains (r15)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as ex:
        fc = ex.submit(lambda: corpus.repartition(8, "part")
                       .write.partitionBy("part").parquet(cpath))
        ff = ex.submit(lambda: fp.repartition(8, "bucket")
                       .write.partitionBy("bucket").parquet(fpath))
        fk = ex.submit(lambda: [r.key for r in
                                corpus.where((F.col("part") == 2001)
                                             | (F.col("key") % 97 == 0))
                                .select("key").collect()])
        keys = fk.result()
        fc.result()
        ff.result()
    purge_keys_everywhere(spark, [
        # corpus partitions on YEAR — not derivable from the key, so
        # the locate step is the (column-pruned, pushed) scan
        {"path": cpath, "key_col": "key", "partition_cols": ["part"]},
        # the fp store's bucket IS key % 8: the derived-partition
        # shortcut computes touched buckets arithmetically and the
        # locate scan reads only those partitions (purge_keys
        # docstring's split cost contract)
        {"path": fpath, "key_col": "doc", "partition_cols": ["bucket"],
         "partition_of": lambda k: (k % 8,)},
    ], keys)
    c2 = spark.read.parquet(cpath).select(
        F.lit("corpus").alias("store"), F.col("key"),
        F.col("part").cast("long").alias("part"), F.col("val"))
    f2 = spark.read.parquet(fpath).select(
        F.lit("fp").alias("store"), F.col("doc").alias("key"),
        F.col("bucket").cast("long").alias("part"),
        F.col("fpv").alias("val"))
    return c2.unionByName(f2)
