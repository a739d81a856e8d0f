"""Local mirror of the driver's differential harness (SURVEY.md §5.2.1):
run a registry query in Spark and its oracle SQL in DuckDB over the same
parquet, then compare row count, column names, and an order-insensitive
value hash.
"""

from __future__ import annotations

import math

import duckdb

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _canon_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return repr(v)
    return str(v)


def canon_rows(pdf) -> tuple[int, list[str], list[tuple]]:
    """(row_count, sorted column names, sorted canonicalized rows)."""
    import pandas as pd

    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        rows.append(tuple(_canon_cell(v) if not (isinstance(v, float) and pd.isna(v))
                          else "<NULL>" for v in tup))
    rows.sort()
    return len(rows), cols, rows


def compare(spark_df, oracle_pdf) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    spark_pdf = spark_df.toPandas()
    n_s, cols_s, rows_s = canon_rows(spark_pdf)
    n_o, cols_o, rows_o = canon_rows(oracle_pdf)
    problems = []
    if cols_s != cols_o:
        problems.append(f"columns differ: spark={cols_s} oracle={cols_o}")
    if n_s != n_o:
        problems.append(f"row count differs: spark={n_s} oracle={n_o}")
    if not problems and rows_s != rows_o:
        diffs = [i for i, (a, b) in enumerate(zip(rows_s, rows_o)) if a != b]
        sample = [(rows_s[i], rows_o[i]) for i in diffs[:3]]
        problems.append(f"{len(diffs)} differing rows; first: {sample}")
    return problems
