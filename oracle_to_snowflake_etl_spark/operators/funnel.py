"""Funnel / sequence analysis: earliest strictly-ordered step times.

The product-analytics staple: for each user, when did they first reach
step 1 (e.g. 'view'), then step 2 STRICTLY AFTER step 1, then step 3
after step 2. The naive form is one aggregation + join per step (the
oracle SQL's CTE chain — k shuffles for k steps, each over the user
key). The engine form folds the user's time-sorted event array ONCE:

    groupBy(user) -> sort_array(collect_list(struct(ts, type)))
                  -> aggregate(fold: advance the step cursor)

ONE shuffle regardless of funnel depth. The fold is order-deterministic
(array sorted by (ts, tiebreak); all values exact integers), so results
hash-match the CTE-chain spec on any engine. Per-user event counts
bound the collected array — the same per-key-volume caveat as
sessionize, with the same bucketed escape hatch if a key is hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 tiebreak: str = "event_id") -> DataFrame:
    """(user, t1..tk epoch-µs, NULL = step not reached). Rows only for
    users who reached step 1."""
    k = len(steps)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(user_col).alias("user"),
        F.struct(us.alias("us"), F.col(tiebreak).alias("tb"),
                 F.col(type_col).alias("et")).alias("e"))
    arr = F.sort_array(F.collect_list("e"))
    # accumulator: array of k nullable step times; cursor = first null
    zero = F.array(*[F.lit(None).cast("long") for _ in range(k)])

    def step_fold(acc, e):
        # find the first unreached step; claim it if this event matches
        # that step's type and is strictly after the previous step time
        out = acc
        for i, s in enumerate(steps):
            prev_ok = (F.lit(True) if i == 0
                       else F.element_at(acc, i).isNotNull()
                       & (e["us"] > F.element_at(acc, i)))
            claim = (F.element_at(acc, i + 1).isNull()
                     & (e["et"] == F.lit(s)) & prev_ok)
            out = F.when(claim,
                         F.concat(F.slice(acc, 1, i),
                                  F.array(e["us"]),
                                  F.slice(acc, i + 2, k - i - 1))
                         ).otherwise(out)
        return out

    folded = F.aggregate(arr, zero, step_fold)
    out = ev.groupBy("user").agg(folded.alias("t"))
    cols = [F.col("user").alias(user_col)] + [
        F.element_at("t", i + 1).alias(f"t{i + 1}") for i in range(k)]
    return out.select(*cols).where(F.col("t1").isNotNull())
