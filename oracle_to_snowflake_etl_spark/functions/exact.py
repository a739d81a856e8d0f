"""Exact (order-independent) aggregation helpers.

Floating-point SUM is order-dependent; on a distributed engine the partial
aggregation order differs run-to-run and engine-to-engine, so a double SUM
can differ from a single-threaded oracle in the last ulp. For any
aggregate whose result must be *bitwise* reproducible (differential
checking, incremental re-runs, audit reconciliation — the reference's
row-count prints at SURVEY.md §5.1 generalized to value-level), sum in
DECIMAL: casting a double to DECIMAL(p,s) rounds deterministically, decimal
addition is exact and associative, and the result is identical regardless
of partitioning. The cost is a wider shuffle row — acceptable for audit
aggregates; plain double sums remain available where last-ulp drift is
fine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 4 keeps 2-decimal money inputs exact while bounding width.
# Bit-parity constraint: the cross-engine render of the final decimal as
# double is single-rounded (hence identical) only while the SCALED
# integer fits 2^53 — totals up to ~9e11 at scale 4. A wider scale
# (e.g. 12) silently breaks parity on ~1e8 money sums: the scaled value
# passes 2^53 and the two engines' int->double paths round differently
# by one ulp (observed on revenue_by_nation et al.).
DEC = "decimal(28,4)"

# For AVERAGES of COMPUTED full-precision ratios (ctr ~ 0.1, cpc):
# scale 4 quantizes each element at 1e-4 — a visible 1e-5-level bias on
# AVG(ctr). Scale 12 keeps the per-element error at 5e-13. Not for
# money sums (see the 2^53 note above); per-group ratio sums stay small
# enough for parity, and these averages feed reports, not hash gates.
DEC_RATIO = "decimal(38,12)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM over a double column via decimal: result cast
    back to double for a stable output schema."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def qsum(col: Column | str, alias: str | None = None,
         scale: int = 10_000) -> Column:
    """Order-independent SUM of a COMPUTED float expression.

    dsum's double->decimal cast is exact for raw 2-decimal inputs, but a
    computed product (price * (1-disc)) has a full double mantissa and
    engines disagree on the cast's rounding mode (half-up vs half-even)
    — per-row ulps that accumulate across millions of rows. Quantizing
    explicitly (floor(x*scale + 0.5) -> bigint, the
    functions/hashing.quantize_sql convention) makes the rounding rule
    part of the query: integer sums are exact, one final division.
    """
    c = F.col(col) if isinstance(col, str) else col
    q = F.floor(c * scale + F.lit(0.5)).cast("long")
    out = F.sum(q).cast("double") / F.lit(float(scale))
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None,
         dec: str = DEC) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in double.

    Computed as cast(sum_dec as double) / count so both operands are
    bit-identical on any engine; a single double division is then IEEE-
    deterministic. Pass ``dec=DEC_RATIO`` when averaging a computed
    full-precision ratio column (DEC's scale 4 would quantize it).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(dec)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out
