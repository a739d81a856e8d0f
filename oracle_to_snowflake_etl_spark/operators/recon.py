"""Migration reconciliation: value-level table fingerprints.

The reference validates its Oracle->Snowflake load by comparing row
counts (oracle_to_snowflake.py:100-104, the A4 recon generalized by
queries/reference.q_count_recon). A count catches dropped batches; it
misses value corruption, duplicated rows, and column drift. This module
is the value-level upgrade: a one-row fingerprint any two engines can
compute independently over "the same" table and compare byte-for-byte.

    fingerprint = (n_rows,
                   XOR  of per-row 60-bit content hashes,
                   SUM  of per-row hashes, exact decimal)

Both folds are commutative+associative, so the result is independent of
partitioning, join order, or engine — the property that makes this a
cross-system migration check rather than a dump-and-diff. XOR alone
cancels on even-multiplicity duplicates (two identical rows XOR to
nothing); the exact SUM restores multiset sensitivity. Together with the
count, any single-row insertion/deletion/mutation changes the triple.

At 100 TB this is ONE scan, no shuffle (a global partial+final agg of
three 16-byte accumulators) — run it on source and target after a
migration window and compare three values.

Caller contract: pass CANONICAL columns (strings, integers, quantized
floats, epoch-µs timestamps — functions/hashing conventions). Raw
doubles/timestamps render differently across engines; canonicalization
is where cross-engine byte-equality is decided, so it stays explicit at
the call site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60


def row_hash(cols: list[Column | str], sep: str = "|") -> Column:
    """60-bit hash of the canonical row rendering (NULL -> empty field,
    concat_ws's shared convention on both engines)."""
    rendered = [F.col(c).cast("string") if isinstance(c, str)
                else c.cast("string") for c in cols]
    return hash60(F.concat_ws(sep, *rendered))


def table_fingerprint(df: DataFrame, cols: list[Column | str]) -> DataFrame:
    """One row: (n_rows, xor60, sum60) over the canonical columns.
    ``sum60`` is emitted as a string — a 38-digit decimal round-trips
    pandas/Arrow as an opaque object; the string form is comparison-
    stable everywhere."""
    h = row_hash(cols)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(h).alias("xor60"),
        F.sum(h.cast("decimal(38,0)")).cast("string").alias("sum60"))
