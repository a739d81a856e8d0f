"""Named query registry: every operator from SURVEY.md §2 plus the
training-data extension surface (SURVEY.md §7.5), as
(Spark callable, DuckDB oracle SQL) pairs on the driver's testdata tables.

Contract (repo __spark_entry__.py): callable(spark, sf_dir) -> DataFrame;
oracle SQL runs on DuckDB over the same parquet with tables pre-registered
as views. Column names are aliased identically on both sides; every
floating-point aggregate uses the exact decimal-sum form
(functions/exact.py) so value hashes match bitwise regardless of
partitioning.

Determinism rules used throughout:
  - date anchors are fixed literals (SURVEY.md §7.3: no wall-clock
    CURRENT_DATE; testdata orders span 1995-01-01..2001-08-01);
  - every top-k orders by (measure DESC, key ASC) so ties are stable;
  - double arithmetic keeps the same operation order on both sides;
  - content hashes are md5-derived (functions/hashing.py) so both engines
    agree bit-for-bit.

Query modules register themselves via the :func:`register` decorator; the
imports at the bottom of this file trigger registration.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, sql)
        return fn
    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# Registration imports (order = display order in CORRECTNESS report).
from . import reference  # noqa: E402,F401
from . import dedup_q  # noqa: E402,F401
from . import similarity_q  # noqa: E402,F401
from . import text_q  # noqa: E402,F401
from . import multimodal_q  # noqa: E402,F401
from . import window_q  # noqa: E402,F401
from . import sql_q  # noqa: E402,F401
from . import tpch_q  # noqa: E402,F401
from . import tpch2_q  # noqa: E402,F401
from . import funcs_q  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
from . import sampling_q  # noqa: E402,F401

# Re-export the flagship for __spark_entry__.entry().
from .reference import q_top_spenders  # noqa: E402,F401
