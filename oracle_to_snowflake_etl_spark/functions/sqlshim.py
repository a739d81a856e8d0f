"""Snowflake-dialect → Spark SQL shim (SURVEY.md §4.3).

The reference ships its transforms as Snowflake SQL strings
(transform_staging.py:24-46; notebook cells 3-5). Users migrating from the
reference can run those strings through :func:`rewrite_snowflake_sql` and
hand the result to ``spark.sql``. Only the dialect surface the reference
actually uses is rewritten (SURVEY.md §2.7 F1-F7):

    IFF(c,a,b)                 -> IF(c,a,b)          (Spark builtin)
    NULLIF(x,y)                -> NULLIF(x,y)        (already ANSI; passthrough)
    x::FLOAT / x::NUMBER(..)   -> CAST(x AS DOUBLE / DECIMAL(..))
    DATEADD('day',n,d)         -> DATE_ADD(d, n)     (also week/month/year)
    CURRENT_DATE               -> CURRENT_DATE       (passthrough)
    TO_DATE(s,'YYYY-MM-DD')    -> TO_DATE(s,'yyyy-MM-dd')

Table names migrate too: ``table_map`` rewrites the reference's
qualified names (e.g. ``ETL_DB.CURATED.CAMPAIGN_DAILY_METRICS`` →
``production.campaign_daily_metrics``) so notebook SQL runs verbatim
against the Spark catalog laid out by pipeline.py.

:func:`run_snowflake_sql` executes a rewritten statement, handling the
one DDL shape Spark's v1 catalog lacks: ``CREATE OR REPLACE TABLE … AS``
becomes DROP IF EXISTS + CTAS (``CREATE OR REPLACE VIEW`` is native).

This is a pragmatic regex rewriter for the reference's SQL shapes, not a
full parser — by design (the reference's entire dialect surface is seven
functions).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_TYPE_MAP = {
    "FLOAT": "DOUBLE",
    "NUMBER": "DECIMAL(38,10)",
    "VARCHAR": "STRING",
}


def _rewrite_cast(m: re.Match) -> str:
    expr, typ = m.group(1), m.group(2).upper()
    inner = m.group(3)
    if typ == "NUMBER" and inner:
        target = f"DECIMAL{inner}"
    else:
        target = _TYPE_MAP.get(typ, typ)
    return f"CAST({expr} AS {target})"


def _rewrite_dateadd(m: re.Match) -> str:
    unit = m.group(1).lower().rstrip("s")
    n, d = m.group(2).strip(), m.group(3).strip()
    if unit == "day":
        return f"DATE_ADD({d}, {n})"
    if unit == "week":
        return f"DATE_ADD({d}, 7 * ({n}))"
    if unit == "month":
        return f"ADD_MONTHS({d}, {n})"
    if unit in ("year", "yr"):
        return f"ADD_MONTHS({d}, 12 * ({n}))"
    raise ValueError(f"unsupported DATEADD unit: {unit}")


def _rewrite_date_fmt(m: re.Match) -> str:
    fmt = m.group(2)
    fmt = fmt.replace("YYYY", "yyyy").replace("DD", "dd")  # MM is shared
    return f"TO_DATE({m.group(1)}, '{fmt}')"


def rewrite_snowflake_sql(sql: str, table_map: dict[str, str] | None = None) -> str:
    """Rewrite the reference's Snowflake-dialect constructs to Spark SQL.

    table_map: case-insensitive qualified-name substitutions applied
    first, e.g. ``{"ETL_DB.CURATED.CAMPAIGN_DAILY_METRICS":
    "production.campaign_daily_metrics"}``.
    """
    out = sql
    for src, dst in (table_map or {}).items():
        out = re.sub(re.escape(src), dst, out, flags=re.IGNORECASE)
    # IFF -> IF (word-boundary so DIFF etc. survive)
    out = re.sub(r"\bIFF\s*\(", "IF(", out, flags=re.IGNORECASE)
    # expr::TYPE and expr::NUMBER(p,s)  — expr is a conservative token/paren run
    out = re.sub(
        r"([A-Za-z_][\w.]*|\([^()]*\))\s*::\s*([A-Za-z]+)\s*(\(\s*\d+\s*,\s*\d+\s*\))?",
        _rewrite_cast, out)
    # DATEADD('day', n, d)
    out = re.sub(
        r"\bDATEADD\s*\(\s*'(\w+)'\s*,\s*([^,]+),\s*([^)]+)\)",
        _rewrite_dateadd, out, flags=re.IGNORECASE)
    # TO_DATE(x, 'YYYY-MM-DD') format-string casing
    out = re.sub(
        r"\bTO_DATE\s*\(\s*([^,]+),\s*'([^']+)'\s*\)",
        _rewrite_date_fmt, out, flags=re.IGNORECASE)
    return out


_CORT_RE = re.compile(
    r"^\s*CREATE\s+OR\s+REPLACE\s+TABLE\s+([\w.]+)\s+AS\s+(.*)$",
    re.IGNORECASE | re.DOTALL)


def run_snowflake_sql(spark: SparkSession, sql: str,
                      table_map: dict[str, str] | None = None) -> DataFrame:
    """Rewrite and execute one reference statement against Spark.

    ``CREATE OR REPLACE TABLE t AS q`` (transform_staging.py:25) is v2-
    catalog-only in Spark SQL, so it runs as DROP TABLE IF EXISTS +
    ``CREATE TABLE t USING parquet AS q`` — same observable result on
    the session catalog. Everything else (queries, CREATE OR REPLACE
    VIEW) executes as rewritten.
    """
    out = rewrite_snowflake_sql(sql, table_map).strip().rstrip(";")
    m = _CORT_RE.match(out)
    if m:
        target, query = m.group(1), m.group(2)
        spark.sql(f"DROP TABLE IF EXISTS {target}")
        return spark.sql(f"CREATE TABLE {target} USING parquet AS {query}")
    return spark.sql(out)
