"""Skew mitigation: salted two-phase aggregation.

A groupBy on a skewed key sends every row of the hot key to ONE reduce
task — the straggler that dominates wall-clock at 100 TB. AQE's
skew-join split handles skewed JOINS; for a skewed AGGREGATION over
high-row-count keys the classic fix is salting:

    phase 1: groupBy(keys + salt)  — the hot key fans out over
             ``buckets`` reduce tasks, each aggregating a slice;
    phase 2: groupBy(keys)         — combine the per-salt partials
             (a tiny input: |distinct keys| x buckets rows).

Only ALGEBRAIC aggregates survive two-phase combining. This module
wires the ones the engine uses — count, decimal sum, min, max — and
derives avg as final sum/count. Results are IDENTICAL to the direct
aggregation (decimal addition is associative; counts/extrema trivially
combine), which the differential harness verifies outright: the oracle
for the salted query is the plain GROUP BY.

Note Spark's own hash aggregation already does map-side partial
aggregation, which absorbs most key skew when upstream partitions are
uniform. Salting earns its keep when the data arrives ALREADY
PARTITIONED BY THE HOT KEY (e.g. post-join on that key, or a bucketed
source) — then map-side combine sees whole-key partitions and the
final shuffle still concentrates. The salt column is derived from a
uniform hash of the full row id, never rand() (determinism contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import DEC
from ..functions.hashing import hash60


def _salt_str(salt_col: str) -> Column:
    """NULL-total string form of the salt column: hash60(NULL) is NULL,
    which would give NULL-salted rows on the big side of
    :func:`salted_join` (NULL never equals the small side's exploded
    salts — silently DROPPED from an inner join the plain join keeps)
    and silently exclude NULL-id rows from :func:`choose_salt_buckets`'
    sample. Coalescing to '' keeps the hash total: every row gets a
    real bucket; results stay identical to the unsalted form."""
    return F.coalesce(F.col(salt_col).cast("string"), F.lit(""))


def salted_agg(df: DataFrame, keys: list[str], salt_col: str,
               buckets: int = 32,
               count_alias: str = "n",
               sum_cols: dict[str, str] | None = None,
               min_cols: dict[str, str] | None = None,
               max_cols: dict[str, str] | None = None) -> DataFrame:
    """Two-phase salted aggregation over ``keys``.

    salt_col: any column with distinct-ish values per row (a row id);
    the salt is hash60(salt_col) % buckets — deterministic, uniform.
    sum_cols/min_cols/max_cols: {input_col: output_alias}.
    """
    sum_cols = sum_cols or {}
    min_cols = min_cols or {}
    max_cols = max_cols or {}
    salt = (hash60(_salt_str(salt_col)) % buckets).alias("_salt")
    phase1 = (
        df.groupBy(*keys, salt)
        .agg(F.count(F.lit(1)).alias("_pn"),
             *[F.sum(F.col(c).cast(DEC)).alias(f"_ps_{c}") for c in sum_cols],
             *[F.min(c).alias(f"_pmin_{c}") for c in min_cols],
             *[F.max(c).alias(f"_pmax_{c}") for c in max_cols])
    )
    return (
        phase1.groupBy(*keys)
        .agg(F.sum("_pn").alias(count_alias),
             *[F.sum(f"_ps_{c}").cast("double").alias(a)
               for c, a in sum_cols.items()],
             *[F.min(f"_pmin_{c}").alias(a) for c, a in min_cols.items()],
             *[F.max(f"_pmax_{c}").alias(a) for c, a in max_cols.items()])
    )


def salted_join(big: DataFrame, small: DataFrame, keys: list[str],
                salt_col: str, buckets: int = 16,
                how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the BIG side, replicate the small side.

    A shuffled join on a skewed key concentrates the hot key's rows in
    one task. AQE's skew-join split fixes this AFTER a shuffle exists;
    when the plan must avoid concentrating in the first place (or AQE's
    split is defeated — e.g. the skewed side arrives bucketed), the
    classic rewrite:

        big:   salt = hash(row id) % buckets          (one new column)
        small: explode to all ``buckets`` salt values  (x buckets rows)
        join on keys + salt                            (hot key now
                                                        spreads over
                                                        ``buckets`` tasks)

    The small side must actually be small — its shuffle volume
    multiplies by ``buckets``. Results are row-identical to the plain
    join (each big row meets each matching small row exactly once, at
    exactly one salt), which the differential harness checks against a
    plain-SQL join oracle. Inner/left joins only: the replicated small
    side would need per-salt existence logic for right/full outer.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = (hash60(_salt_str(salt_col)) % buckets)
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long")
                                     for i in range(buckets)])))
    return b.join(s, keys + ["_salt"], how).drop("_salt")


def choose_salt_buckets(df: DataFrame, keys: list[str], salt_col: str,
                        sample_fraction: float = 0.1,
                        skew_threshold: float = 8.0,
                        max_buckets: int = 256) -> int:
    """The measurement→decision wire between :func:`skew_report` and
    :func:`salted_agg`: diagnose key skew on a deterministic row sample
    and return the salt bucket count a two-phase aggregation should use
    (1 = don't salt).

    Sample: hash60('autosalt:' + salt_col) % 1000 < fraction*1000 — a
    per-row deterministic Bernoulli (same rows every run, partitioning-
    independent), so the decision itself is reproducible, unlike
    ``df.sample()``'s seed-per-partition draw. The sampled
    :func:`skew_report` is collected as ONE row (metadata-sized).

    Rule: ratio = max per-key count / median per-key count (both from
    the sample; the ratio is scale-invariant under uniform row
    sampling). Below ``skew_threshold`` salting would add a combine
    stage for nothing — return 1. At or above it, return
    ceil(max_cnt/p50_cnt) capped at ``max_buckets``: enough buckets
    that the hot key's per-task slice shrinks to roughly a MEDIAN
    key's volume — more buckets would multiply phase-2 rows (and, for
    :func:`salted_join`, small-side replication) with no straggler
    left to fix.

    Cost: one pass over fraction*|df| rows + a distinct-keys-bounded
    agg — run it where you'd otherwise guess. At 100 TB sample 0.1-1%
    (hot keys at straggler scale are present in any uniform sample;
    a key too rare to sample is too small to straggle).
    """
    if not 0.001 <= sample_fraction <= 1.0:
        # %1000 Bernoulli granularity: int(f*1000) == 0 below 0.001
        # makes the sample deterministically empty, silently degrading
        # every call to the full-frame fallback scan. Fail loudly.
        raise ValueError(
            f"sample_fraction must be in [0.001, 1.0] (1/1000 hash "
            f"granularity), got {sample_fraction!r}")
    sample = df.where(
        (hash60(_salt_str(salt_col), prefix="autosalt:")
         % 1000) < int(sample_fraction * 1000))
    rep = skew_report(sample.select(*keys), keys).collect()[0]
    if rep.n_keys is None or rep.n_keys == 0:
        # Empty sample ≠ uniform frame: a small-but-skewed df can
        # legitimately draw zero rows at low fractions. Fall back to
        # the FULL-frame report (still distinct-keys-bounded) so the
        # no-salt decision is a measured decision, never a no-data one.
        rep = skew_report(df.select(*keys), keys).collect()[0]
        if rep.n_keys is None or rep.n_keys == 0:
            return 1  # genuinely empty frame: nothing to straggle
    ratio = rep.max_cnt / max(rep.p50_cnt, 1)
    if ratio < skew_threshold:
        return 1
    import math

    return min(max_buckets, math.ceil(ratio))


def salted_agg_auto(df: DataFrame, keys: list[str], salt_col: str,
                    sample_fraction: float = 0.1,
                    skew_threshold: float = 8.0,
                    max_buckets: int = 256,
                    count_alias: str = "n",
                    sum_cols: dict[str, str] | None = None,
                    min_cols: dict[str, str] | None = None,
                    max_cols: dict[str, str] | None = None) -> DataFrame:
    """:func:`salted_agg` with the bucket count DECIDED by
    :func:`choose_salt_buckets` instead of guessed: measure on a
    sample, salt only when the exact-rank report says the key is hot,
    size the salt to the measured ratio. When the decision is "not
    skewed" the plan is the PLAIN single hash-aggregation — no phase-2
    combine stage paid as insurance. Either branch produces results
    identical to the direct GROUP BY (the oracle for
    salted_agg_auto_status, same contract as salted_agg_status);
    the decision function itself is pytest-covered on synthetic hot-key
    and uniform fixtures (tests/test_edge_cases.py).

    On the bench corpus every natural key is near-uniform, so the
    registered query takes (and thereby exercises) the measured
    no-salt branch; the salted branch is driven by the synthetic
    fixtures.
    """
    sum_cols = sum_cols or {}
    min_cols = min_cols or {}
    max_cols = max_cols or {}
    buckets = choose_salt_buckets(df, keys, salt_col, sample_fraction,
                                  skew_threshold, max_buckets)
    if buckets > 1:
        return salted_agg(df, keys, salt_col, buckets, count_alias,
                          sum_cols, min_cols, max_cols)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(count_alias),
             *[F.sum(F.col(c).cast(DEC)).cast("double").alias(a)
               for c, a in sum_cols.items()],
             *[F.min(c).alias(a) for c, a in min_cols.items()],
             *[F.max(c).alias(a) for c, a in max_cols.items()])
    )


def skew_report(df: DataFrame, key_cols: list[str],
                quantiles: tuple[float, ...] = (0.5, 0.9, 0.99)) -> DataFrame:
    """One-row skew diagnosis for a prospective join/agg key: distinct
    key count, max per-key row count, the heaviest key (rendered as a
    string), exact count quantiles, and the max/median ratio that
    decides whether this key needs salting or AQE skew-split BEFORE the
    job ships. This is the measurement step behind operators/skew's
    fixes — salt when the report says so, not when the job falls over.

    Quantiles are EXACT rank picks (percentile_disc convention: the
    value at ceil(q*n) in count order, ties by key string) — engine-
    identical, no interpolation. Plan: one hash-agg bounded by distinct
    keys, then windows/aggregates over the (small) per-key count table;
    the raw table is scanned once.
    """
    from pyspark.sql import Window as _W

    key_str = F.concat_ws("|", *[F.col(c).cast("string")
                                 for c in key_cols])
    counts = (df.select(key_str.alias("key"))
              .groupBy("key").agg(F.count(F.lit(1)).alias("cnt")))
    w = _W.orderBy(F.asc("cnt"), F.asc("key"))
    ranked = counts.select(
        "key", "cnt", F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(_W.partitionBy()).alias("nk"))
    q_aggs = []
    for q in quantiles:
        name = f"p{int(q * 100)}_cnt"
        q_aggs.append(F.max(F.when(
            F.col("rn") == F.ceil(F.lit(float(q)) * F.col("nk")),
            F.col("cnt"))).alias(name))
    top = F.struct(F.col("cnt"), F.col("key"))
    agg = ranked.agg(
        F.max("nk").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.max(top)["key"].alias("top_key"),
        *q_aggs)
    return agg.select(
        "n_keys", "max_cnt", "top_key",
        *[f"p{int(q * 100)}_cnt" for q in quantiles],
        F.floor(F.col("max_cnt").cast("double")
                / F.col(f"p{int(quantiles[0] * 100)}_cnt").cast("double")
                * 1_000_000 + F.lit(0.5)).cast("long")
         .alias("max_over_p50_q6"))
