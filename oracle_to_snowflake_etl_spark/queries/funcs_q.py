"""Scalar-function surface beyond the reference's seven functions
(SURVEY.md §2.7 'Absent'): JSON extraction, date-part/truncation
functions, and math functions. Transcendentals (ln/exp) are quantized at
1e-6 — libm implementations differ in the last ulp; sqrt/abs/floor/ceil
are IEEE-exact and compared raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from . import register


@register(
    "json_props",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    """)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props payload column
    (get_json_object — the semi-structured column surface)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k"), (k % 10).alias("k_mod"))


@register(
    "date_parts",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           quarter(o_orderdate) AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3mo
    FROM orders
    """)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction, month truncation/boundaries, and month
    arithmetic (F5/F6 generalized) — all boundary dates emitted as ISO
    strings (DATE columns render differently across fetch paths)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3mo"),
    )


@register(
    "math_funcs",
    """
    SELECT o_orderkey,
           abs(o_totalprice - 150000) AS centered,
           sqrt(o_totalprice) AS root,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS k_floor,
           CAST(ceil(o_totalprice / 1000) AS BIGINT) AS k_ceil,
           CAST(o_orderkey AS BIGINT) % 7 AS key_mod,
           CAST(floor(ln(o_totalprice) * 1000000 + 0.5) AS BIGINT) AS ln_q6,
           CAST(floor(exp(o_totalprice / 600000) * 1000000 + 0.5) AS BIGINT) AS exp_q6
    FROM orders
    """)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function surface: abs/sqrt/floor/ceil/mod raw (IEEE-exact),
    ln/exp quantized at 1e-6 (libm ulp differences)."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")

    def q6(c):
        return F.floor(c * 1_000_000 + F.lit(0.5)).cast("long")

    return o.select(
        "o_orderkey",
        F.abs(p - 150000).alias("centered"),
        F.sqrt(p).alias("root"),
        F.floor(p / 1000).alias("k_floor"),
        F.ceil(p / 1000).alias("k_ceil"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        q6(F.log(p)).alias("ln_q6"),
        q6(F.exp(p / 600000)).alias("exp_q6"),
    )


@register(
    "array_funcs_portfolio",
    """
    WITH per_cust AS (
      SELECT o_custkey,
             list_reverse_sort(list(CAST(floor(o_totalprice * 10000 + 0.5)
                                         AS BIGINT))) AS arr
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           len(arr) AS n_orders,
           CAST(arr[1] AS BIGINT) AS max_q4,
           CAST(list_sum(arr[1:3]) AS BIGINT) AS top3_sum_q4,
           CAST(len(list_filter(arr, x -> x > 2000000000)) AS BIGINT)
             AS n_over_200k
    FROM per_cust
    """)
def q_array_funcs_portfolio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array/HOF surface as an aggregation target: per-customer
    price portfolio via collect_list -> sort_array(desc) (collect order
    is nondeterministic, the sort canonicalizes it) -> slice/fold/filter.
    Prices quantized before collection so every downstream op is integer
    arithmetic — exact on both engines. One hash-agg shuffle; the array
    ops run in codegen over grouped rows."""
    orders = load_table(spark, sf_dir, "orders")
    q = F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5)).cast("long")
    arr = F.sort_array(F.collect_list(q), asc=False)
    base = orders.groupBy("o_custkey").agg(arr.alias("arr"))
    return base.select(
        "o_custkey",
        F.size("arr").alias("n_orders"),
        F.element_at("arr", 1).alias("max_q4"),
        F.aggregate(F.slice("arr", 1, 3), F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("top3_sum_q4"),
        F.size(F.filter("arr", lambda x: x > 2_000_000_000))
         .cast("long").alias("n_over_200k"))


@register(
    "agg_argmax_median",
    """
    SELECT o_orderpriority,
           arg_max(o_orderkey, pq) AS max_order,
           arg_min(o_orderkey, pq) AS min_order,
           CAST(median(pc) AS DOUBLE) AS median_price_c
    FROM (SELECT o_orderpriority, o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                   * 4294967296 + o_orderkey AS pq
          FROM orders)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)
def q_agg_argmax_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional aggregates: MAX_BY/MIN_BY (argmax/argmin) and exact
    MEDIAN per group. The ordering key packs (quantized price, orderkey)
    into ONE bigint — max_by on a non-unique ordering column is
    nondeterministic on ties in BOTH engines, so determinism is made
    structural, not assumed. Median of an even count is the midpoint
    average: one (a+b)/2 double division, identical cross-engine when
    computed over exact integer cents."""
    o = load_table(spark, sf_dir, "orders")
    pc = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    pq = pc * F.lit(4294967296).cast("long") + F.col("o_orderkey")
    return (o.select("o_orderpriority", "o_orderkey", pc.alias("pc"),
                     pq.alias("pq"))
            .groupBy("o_orderpriority")
            .agg(F.max_by("o_orderkey", "pq").alias("max_order"),
                 F.min_by("o_orderkey", "pq").alias("min_order"),
                 F.median("pc").cast("double").alias("median_price_c"))
            .orderBy("o_orderpriority"))


@register(
    "unpivot_flag_metrics",
    f"""
    WITH w AS (
      SELECT l_returnflag AS rf,
             CAST(SUM(CAST(l_quantity AS {{DECU}})) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS DOUBLE) AS n_lines
      FROM lineitem GROUP BY l_returnflag)
    SELECT rf, 'sum_qty' AS metric, sum_qty AS val FROM w
    UNION ALL
    SELECT rf, 'n_lines' AS metric, n_lines AS val FROM w
    ORDER BY rf, metric
    """.replace("{DECU}", "DECIMAL(28,4)"))
def q_unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT (melt): a grouped wide aggregate relaid as
    (key, metric, value) rows — the inverse of pivot_priority_status.
    Spark's unpivot is a zero-shuffle projection (each input row fans
    out to |metrics| rows in place); the oracle is the equivalent
    UNION ALL."""
    from ..functions.exact import dsum

    li = load_table(spark, sf_dir, "lineitem")
    wide = (li.groupBy(F.col("l_returnflag").alias("rf"))
            .agg(dsum("l_quantity", "sum_qty"),
                 F.count(F.lit(1)).cast("double").alias("n_lines")))
    return (wide.unpivot(["rf"], ["sum_qty", "n_lines"], "metric", "val")
            .orderBy("rf", "metric"))


@register(
    "udtf_token_counts",
    """
    SELECT doc_id, tok, COUNT(*) AS n
    FROM (SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z]{4,}')) AS tok
          FROM documents WHERE doc_id % 10 = 0)
    GROUP BY doc_id, tok
    """)
def q_udtf_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (SURVEY.md §2.10): a @udtf table function
    (functions/udtfs.TokenCounts) called via SQL LATERAL — 0..N output
    rows per document. The oracle computes the same (doc_id, tok, n)
    set with regexp unnest + GROUP BY. Deliberately run on a 10%
    document slice: UDTFs are the Python slow path; the JVM-side twin
    of this computation at full scale is vocab_heavy_hitters
    (explode(split()) + groupBy)."""
    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    (load_table(spark, sf_dir, "documents")
     .where(F.col("doc_id") % 10 == 0)
     .select("doc_id", "text")
     .createOrReplaceTempView("_docs_udtf"))
    return spark.sql("""
        SELECT d.doc_id, t.tok, t.n
        FROM _docs_udtf d, LATERAL token_counts(d.text) t
    """)


@register(
    "variant_props",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.k') AS k_str
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json once into a
    VariantType value, then typed variant_get extractions — the
    binary-encoded, parse-once successor to per-path get_json_object
    string re-parsing (json_props is the legacy twin). At 100 TB the
    difference compounds: N extractions re-parse the JSON N times with
    get_json_object but once with VARIANT."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    out = ev.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k"),
        F.variant_get(v, "$.k", "string").alias("k_str"))
    return out.where(F.col("k") >= 50)


@register(
    "hist_order_totals",
    """
    SELECT LEAST(GREATEST(CAST(floor(o_totalprice / 30000.0) AS BIGINT),
                          0), 19) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """)
def q_hist_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (20 x 30k buckets, clamped
    tails) — the single-pass profiling aggregate behind data-exploration
    bucket charts. The bucket id is explicit floor arithmetic rather
    than width_bucket so both engines evaluate the identical double
    expression; one hash-agg shuffle bounded by bucket count."""
    orders = load_table(spark, sf_dir, "orders")
    b = F.least(F.greatest(
        F.floor(F.col("o_totalprice") / 30000.0).cast("long"),
        F.lit(0)), F.lit(19))
    return (orders.groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("o_totalprice").alias("lo"),
                 F.max("o_totalprice").alias("hi")))
