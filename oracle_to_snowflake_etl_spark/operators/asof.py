"""As-of join — an operator Spark's join surface lacks natively.

asof_join(left, right): for every left row, attach the most recent right
row of the same key with right.ts <= left.ts (backward direction; the
trades/quotes classic).

Implementation is the scalable union-sort trick, NOT a theta-join:

    tag rows (side=0 right, side=1 left) -> unionByName ->
    one window over (key) ordered by (ts, side, payload struct) ->
    last(right-payload struct, ignorenulls) carries the latest right row
    forward onto each left row -> filter side=1.

Cost: ONE shuffle + ONE sort over |left|+|right| — the same price as a
plain sort-merge join, with none of the range-predicate blowup
(an inequality join in Spark plans BroadcastNestedLoop: O(n*m) compares
and a broadcast that dies at scale). Ordering (ts, side) makes ties
deterministic: a right row at exactly left.ts IS visible to that left
row (<= semantics, matching DuckDB's ASOF JOIN which the differential
harness uses as the oracle).

Atomicity: the right payload travels as ONE struct through a single
last(ignorenulls=True). Carrying each payload column independently (the
v1 design) could stitch together columns from *different* right rows
when the newest right row holds a NULL in one column — a silent
divergence from real ASOF semantics.

Determinism: among right rows tied on (key, ts) the window order falls
back to the payload struct itself (field-wise struct comparison), so
the greatest payload row wins — stable across partitionings and runs
with no reliance on input order or on any particular id column existing.

Skew note: one hyperactive key = one giant sorted partition; mitigate at
100 TB by range-bucketing ts within key (join each bucket with the last
right row of the previous bucket appended).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              payload: list[str] | None = None,
              suffix: str = "_r") -> DataFrame:
    """Backward as-of join. Returns every ``left`` row plus the payload
    columns of the latest ``right`` row at-or-before its timestamp
    (NULL when no right row precedes it).

    payload: right columns to carry (default: all non-key, non-ts).
    """
    if payload is None:
        payload = [c for c in right.columns if c not in (key, right_ts)]

    l_tagged = left.withColumn("_side", F.lit(1)) \
                   .withColumn("_ts", F.col(left_ts))
    r_tagged = (right.select(
        F.col(key), F.col(right_ts).alias("_ts"),
        F.struct(*[F.col(c) for c in payload]).alias("_rpay"))
        .withColumn("_side", F.lit(0)))

    # left rows get _rpay = NULL via allowMissingColumns
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # side=0 sorts before side=1 at equal ts -> right rows at exactly
    # left.ts are visible (<= semantics); _rpay breaks right-right ties.
    w = (Window.partitionBy(key).orderBy("_ts", "_side", "_rpay")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = merged.withColumn(
        "_carry", F.last("_rpay", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_carry.{c}").alias(f"{c}{suffix}") for c in payload]
    return carried.where(F.col("_side") == 1).select(*out_cols)


def asof_join_forward(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str = "ts", right_ts: str = "ts",
                      payload: list[str] | None = None,
                      suffix: str = "_r") -> DataFrame:
    """FORWARD as-of join: every ``left`` row plus the payload of the
    EARLIEST ``right`` row at-or-after its timestamp (NULL when none
    follows) — "next event" attribution (click -> next purchase,
    sensor reading -> next maintenance).

    Same union-sort construction and cost as :func:`asof_join` (one
    shuffle + one sort), with the scan direction reversed: the window
    orders ts DESCENDING so ``last(ignorenulls)`` carries the nearest
    FOLLOWING right row backward onto each left row. Tie conventions
    mirror the backward form: a right row at exactly left.ts is visible
    (>= semantics, DuckDB's ``ON l.ts <= r.ts`` ASOF), and equal-(key,
    ts) right rows resolve to the greatest payload struct.
    """
    if payload is None:
        payload = [c for c in right.columns if c not in (key, right_ts)]

    l_tagged = left.withColumn("_side", F.lit(1)) \
                   .withColumn("_ts", F.col(left_ts))
    r_tagged = (right.select(
        F.col(key), F.col(right_ts).alias("_ts"),
        F.struct(*[F.col(c) for c in payload]).alias("_rpay"))
        .withColumn("_side", F.lit(0)))
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # desc ts scan: at equal ts, side=0 first keeps the right row visible
    # to the left row; ascending _rpay makes the greatest payload the
    # last one seen among right ties (the backward form's convention).
    w = (Window.partitionBy(key)
         .orderBy(F.col("_ts").desc(), "_side", "_rpay")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = merged.withColumn(
        "_carry", F.last("_rpay", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_carry.{c}").alias(f"{c}{suffix}") for c in payload]
    return carried.where(F.col("_side") == 1).select(*out_cols)
