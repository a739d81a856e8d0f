"""Differential check of every registered query against the DuckDB oracle,
at sf0.001 for speed (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from oracle_to_snowflake_etl_spark.queries import oracle_sql, queries
from tests.harness import compare, duckdb_run

NAMES = sorted(queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = queries()[name]
    sdf = fn(spark, sf_dir)
    sql = oracle_sql().get(name)
    if sql is None:
        assert sdf.count() >= 0  # rows-only check, mirrors the driver
        return
    problems = compare(sdf, duckdb_run(sql, sf_dir))
    assert not problems, f"{name}: " + "; ".join(problems)
