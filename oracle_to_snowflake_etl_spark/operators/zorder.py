"""Z-order (Morton) clustering: multi-column data-skipping layout.

``sortWithinPartitions`` gives row-group min/max locality on ONE leading
column (sources/readers.write_partitioned); queries filtering the second
sort column still read everything. Interleaving the bits of several
columns into one Z-value and range-sorting by it gives every
participating column partial locality: a range predicate on ANY of them
skips most files/row-groups via parquet footer stats. This is the
plain-parquet form of Delta/Iceberg OPTIMIZE ZORDER BY.

The interleave is pure 64-bit integer arithmetic (shift/mask/or), so it
is bit-identical on every engine — the differential harness checks the
Z-values themselves against DuckDB. Caller contract: inputs must already
be NON-NEGATIVE integers below 2**bits (rank/quantize/clamp first —
normalization is a data decision, kept at the call site like
recon's canonicalization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` bounded ints, LSB-first:
    bit i of column j lands at output bit i*ncols + j. ncols*bits must
    stay <= 62 (signed-long safe)."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = c.cast("long")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + j)
    return z


def zorder_sql(exprs: list[str], bits: int = 16) -> str:
    """DuckDB mirror of :func:`zorder_value` — generated from the same
    column list so both expression trees stay in lockstep."""
    n = len(exprs)
    terms = []
    for j, e in enumerate(exprs):
        for i in range(bits):
            terms.append(f"(((CAST({e} AS BIGINT) >> {i}) & 1)"
                         f" << {i * n + j})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(df: DataFrame, path: str, zcols: list[Column],
                   bits: int = 16, num_files: int = 16,
                   mode: str = "overwrite") -> None:
    """Write parquet range-clustered by the Z-value of ``zcols``:
    repartitionByRange on z (contiguous Z-ranges per file — range, not
    hash: hash partitioning would scatter neighboring Z-values and
    destroy the locality being bought) then sort within each file, so
    parquet footer min/max on EVERY participating column is tight.
    The Z-column itself is dropped — it exists to order the write."""
    z = zorder_value(zcols, bits).alias("_z")
    (df.withColumn("_z", z)
       .repartitionByRange(num_files, F.col("_z"))
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode(mode).parquet(path))


def rank16(col: Column, lo: int, hi: int, bits: int = 16) -> Column:
    """Linear-rank normalization onto [0, 2**bits): the required prep
    for zorder_value — raw columns with unequal ranges let the wider
    column's high bits dominate the interleave (the Z-curve degenerates
    to a plain sort on that column), and masking instead of scaling
    WRAPS values, destroying locality entirely. Bounds come from table
    stats (one agg); integer arithmetic end-to-end."""
    span = max(hi - lo, 1)
    x = (col.cast("long") - F.lit(lo)) * F.lit((1 << bits) - 1)
    return F.least(F.greatest(x / F.lit(span), F.lit(0)).cast("long"),
                   F.lit((1 << bits) - 1)).cast("long")
