"""Deterministic sampling & split assignment for training-data pipelines.

``df.sample()`` / ``F.rand(seed)`` are seeded PER PARTITION: the selected
rows change with partitioning, parallelism, and file layout — useless for
reproducible corpus construction. Every operator here derives its
randomness from a 60-bit md5 hash of (salt | stable key), the same
contract as datagen.py and functions/hashing.py:

  - identical results on any cluster layout, any partitioning, both
    engines (the DuckDB oracle embeds the same formula);
  - adding/removing OTHER rows never flips a row's fate (per-row
    decision, no global state);
  - different salts give independent samples from the same corpus.

All decisions are single codegen-stage column expressions: zero
shuffles, zero Python. At 100 TB a sample is a scan with a cheap
predicate — filter-pushdown-friendly and restartable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60

_H_RANGE = float(1 << 60)


def _unit(key: Column, salt: str) -> Column:
    """U[0,1) from (salt | key) — partitioning-independent."""
    return hash60(F.concat_ws("|", F.lit(salt), key.cast("string"))) \
        .cast("double") / F.lit(_H_RANGE)


def hash_sample(df: DataFrame, fraction: float, key_col: str,
                salt: str = "sample") -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``key_col``.

    The same (key, salt) is kept or dropped forever — rerunning the
    pipeline, repartitioning, or growing the corpus never changes an
    existing row's membership (the property incremental training-data
    builds need).
    """
    return df.where(_unit(F.col(key_col), salt) < fraction)


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str, key_col: str,
                      salt: str = "strat",
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language rates when
    rebalancing a corpus). Strata not listed get ``default_fraction``."""
    frac = None
    for stratum, f in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        frac = (F.when(cond, F.lit(f)) if frac is None
                else frac.when(cond, F.lit(f)))
    frac = frac.otherwise(F.lit(default_fraction)) if frac is not None \
        else F.lit(default_fraction)
    return df.where(_unit(F.col(key_col), salt) < frac)


def split_assign(df: DataFrame, key_col: str,
                 weights: dict[str, float] | None = None,
                 salt: str = "split",
                 out_col: str = "split") -> DataFrame:
    """Assign every row a deterministic train/val/test label by hash
    interval: weights {"train": .98, "val": .01, "test": .01} partition
    [0,1). Keys are assigned once and forever — no leakage between
    splits across pipeline reruns, the invariant eval sets depend on.
    Labels are checked in sorted order with cumulative bounds.
    """
    weights = weights or {"test": 0.01, "train": 0.98, "val": 0.01}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = _unit(F.col(key_col), salt)
    expr = None
    hi = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        hi += w
        expr = (F.when(u < hi, F.lit(name)) if expr is None
                else expr.when(u < hi, F.lit(name)))
    last = items[-1][0]
    expr = expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)
    return df.withColumn(out_col, expr)


def split_assign_leakage_free(df: DataFrame, clusters: DataFrame,
                              key_col: str,
                              weights: dict[str, float] | None = None,
                              salt: str = "split",
                              out_col: str = "split") -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    the split boundary: rows are hashed by their near-dup CLUSTER
    representative, not their own key, so every member of a cluster
    lands in the same split — per-row :func:`split_assign` would put a
    document in train and its 0.9-Jaccard twin in test, silently
    inflating eval scores (the standard contamination failure
    text_decontaminate guards against BENCHMARKS; this guards the
    pipeline's own eval split).

    ``clusters`` is the (doc, keep_id) output of
    operators/dedup.dedup_clusters over any near-dup pair source;
    unclustered keys fall back to themselves via one left join. Plan
    regimes: the join carries TWO LONGS per row, so even the shuffle
    form is a key-only exchange, never document payloads; when the
    cluster map is small AQE converts it to broadcast at runtime, and
    at web scale (10-30% dup rates make the map a constant fraction of
    corpus keys — beyond broadcast) the sort-merge form is the correct
    plan. Determinism contract is inherited: same key set + salt =>
    same assignment forever, regardless of partitioning.
    """
    # collision-safe temp column (df may legitimately carry "_rep"), and
    # a DETERMINISTIC one-row-per-doc reduction guards the join's
    # fan-out invariant: a pair source that yields duplicate — or
    # conflicting — (doc, keep_id) rows must not duplicate corpus rows
    # through the left join, and which representative wins must not
    # depend on partition order (dropDuplicates keeps an arbitrary
    # row; MIN keeps the same one forever, preserving the module's
    # same-input-same-assignment contract)
    tmp = "_rep"
    while tmp in df.columns:
        tmp += "_"
    rep = (clusters.groupBy(F.col("doc").alias(key_col))
           .agg(F.min("keep_id").alias(tmp)))
    joined = (df.join(rep, key_col, "left")
              .withColumn(tmp, F.coalesce(F.col(tmp), F.col(key_col))))
    return split_assign(joined, tmp, weights, salt, out_col).drop(tmp)


def weighted_sample(df: DataFrame, weight_col: str, key_col: str,
                    salt: str = "wsample",
                    max_weight: int | None = None) -> DataFrame:
    """Weight-proportional Bernoulli sample: P(keep) = w / w_max, for an
    INTEGER weight column (quality score, token count, …) — the corpus
    rebalancer that keeps high-quality documents preferentially while
    staying per-row deterministic (same guarantees as hash_sample).

    The membership test is exact integer arithmetic — no float ever:

        keep  iff  h * w_max < w * 2^60        (h = 60-bit hash, U[0,2^60))

    Both sides fit DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), so the
    decision is bit-identical across engines and partitionings; a float
    formulation (h/2^60 < w/w_max) would diverge in the last ulp right
    at the acceptance boundary.

    ``max_weight=None`` computes w_max with a 1-row aggregate broadcast
    back onto the scan (one extra tiny job, no shuffle of the fact);
    pass it explicitly when known (e.g. a documented score ceiling) to
    keep the sample a pure single-scan predicate.
    """
    h = hash60(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")))
    # decimal(18,0): weights up to 10^18 stay exact (a 12,0 cast would
    # overflow to NULL under non-ANSI mode for weights >= 10^12 and
    # silently drop every row); the keep product h(20,0) * wmax(18,0)
    # still fits decimal(38,0)
    if max_weight is None:
        wmax = df.agg(F.max(weight_col).cast("decimal(18,0)").alias("_wmax"))
        out = df.crossJoin(F.broadcast(wmax))
    else:
        out = df.withColumn("_wmax", F.lit(int(max_weight)).cast("decimal(18,0)"))
    keep = (h.cast("decimal(20,0)") * F.col("_wmax")
            < F.col(weight_col).cast("decimal(20,0)")
            * F.lit(1 << 60).cast("decimal(20,0)"))
    return out.where(keep).drop("_wmax")


def minmax_scale_by_group(df: DataFrame, group_col: str, value_col: str,
                          id_col: str) -> DataFrame:
    """Per-group min-max scaling via **applyInPandas** (grouped-map
    Arrow UDF) — the API surface for per-group Python that genuinely
    needs the whole group in memory (sklearn-style fit/transform,
    per-key model scoring). Returns (id, group, scaled_q6).

    Scaling picked deliberately for cross-engine exactness: min/max are
    order-independent (unlike float sums), and the scale is ONE double
    division + quantize, so a SQL window oracle reproduces it bitwise
    — the differential harness can value-check an applyInPandas
    operator end to end.

    Scale shape: one shuffle on the group key; each group must fit one
    executor's memory (true by construction for per-language stats;
    NOT true for groupBy(nothing) — that is what scan-aggregates are
    for). Prefer built-in window functions when the transform is
    expressible there; this exists for when it is not, and the
    window-expressible scaling doubles as its oracle.
    """
    import pandas as pd

    out_schema = (f"{id_col} long, {group_col} string, scaled_q6 long")

    def scale(pdf: "pd.DataFrame") -> "pd.DataFrame":
        v = pdf[value_col].astype("float64")
        lo, hi = v.min(), v.max()
        span = hi - lo
        if span == 0:
            q = pd.Series([0] * len(v))
        else:
            import numpy as np
            q = np.floor((v - lo) / span * 1_000_000 + 0.5).astype("int64")
        return pd.DataFrame({id_col: pdf[id_col],
                             group_col: pdf[group_col],
                             "scaled_q6": q})

    return df.groupBy(group_col).applyInPandas(scale, schema=out_schema)


def sample_n_per_group(df: DataFrame, n: int, group_col: str, key_col: str,
                       salt: str = "npg") -> DataFrame:
    """Deterministic fixed-size-per-group sample: keep exactly
    min(n, |group|) rows per group, chosen by hash order — the bounded
    alternative to fractional stratified_sample when downstream needs a
    HARD per-group budget (eval slices, per-language caps, debugging
    samples).

    Same determinism contract as the rest of the module: membership
    depends only on (salt, key), so reruns and repartitionings agree.
    Unlike a true reservoir it is also STABLE under corpus growth for
    the kept set's ORDER — but not membership: a new row can hash below
    an existing member and displace it (fixed-size budgets make that
    unavoidable; fractional hash_sample is the no-displacement option).

    One window shuffle on the group key; skew bounded by group size —
    at 100 TB pre-aggregate pathological groups or cap with a
    WHERE-hash prefilter before the window.
    """
    w = Window.partitionBy(group_col).orderBy(
        _unit(F.col(key_col), salt).asc(), F.col(key_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= n).drop("_rn"))


def shard_assign(df: DataFrame, key_col: str, n_shards: int,
                 salt: str = "shard") -> DataFrame:
    """Deterministic global shuffle into training shards: every row gets
    a ``shard`` in [0, n_shards) and a ``pos`` (0-based position within
    its shard), both functions of (salt, key) only — the
    write-training-data step of a corpus pipeline, where examples must
    be (a) globally shuffled so batches are i.i.d.-ish, (b) bit-
    reproducible run-to-run, and (c) split into equal-ish shards for
    parallel loaders.

    shard  = hash60(salt:key) mod n_shards   (uniform, partitioning-proof)
    pos    = rank of the row's hash within its shard (ties by key)

    Plan: ONE Exchange on ``shard`` + a per-shard sort (the window) —
    exactly the physical work a shuffled shard writer must do, nothing
    more. To materialize, ``df.write.partitionBy("shard")`` or
    ``repartition(n_shards, "shard").sortWithinPartitions("pos")`` so
    each output file IS a shard in hash (i.e. shuffled) order. At 100 TB
    pick n_shards so a shard ~ a few GB; the hash keys are uniform so
    no shard skews. Re-sharding to a different n_shards re-deals every
    row (hash mod changes) — version the salt instead when appending
    (salt per snapshot keeps old shards immutable).
    """
    h = hash60(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")))
    out = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % n_shards).cast("int"))
    w = Window.partitionBy("shard").orderBy(
        F.col("_h").asc(), F.col(key_col).asc())
    return (out.withColumn("pos", F.row_number().over(w) - 1)
            .drop("_h"))


def write_shards(df: DataFrame, path: str, key_col: str, n_shards: int,
                 salt: str = "shard") -> None:
    """Materialize :func:`shard_assign`'s deterministic global shuffle
    as a training-ready parquet layout: ``shard=K/`` directories, ONE
    file per shard, rows stored in shuffled (hash) order — so a data
    loader can stream shard files sequentially and read globally-
    shuffled examples with zero seek logic.

    ``repartitionByRange(n_shards, "shard")`` puts each of the n
    distinct shard ids in its own physical partition (plain hash
    repartition would murmur-hash the ids and birthday-collide several
    shards into one task, idling the rest), and
    ``sortWithinPartitions("shard", "pos")`` fixes the in-file order;
    partitionBy writes each as its directory. One shuffle + one sort —
    the same two steps :func:`shard_assign` already plans, now with a
    writer attached. At 100 TB pick n_shards for a few GB per file;
    hash-uniform keys mean no shard skews and the write parallelizes
    across exactly n_shards tasks.
    """
    out = shard_assign(df, key_col, n_shards, salt)
    (out.repartitionByRange(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite").partitionBy("shard").parquet(path))


def mixture_sample(df: DataFrame, mix_col: str, key_col: str,
                   weights: dict[str, float],
                   salt: str = "mix",
                   measure_col: str | None = None) -> DataFrame:
    """Deterministic MIXTURE resampling: subsample so the corpus's
    expected composition over ``mix_col`` matches ``weights`` (a target
    distribution over sources/languages/domains — how training mixes
    are actually specified; pass ``measure_col`` to target TOKEN/byte
    mass instead of document count), while keeping as much data as
    possible:
    the binding stratum is kept whole and everything else downsamples
    around it.

        T      = min_s n_s / w_s      (largest feasible total)
        rate_s = w_s * T / n_s        (<= 1, = 1 for the binding s)

    Strata not in ``weights`` are dropped (weight 0). Per-row
    membership is the module's hash contract — reruns, repartitioning
    and corpus growth never flip an existing row (growth DOES adjust
    rates: recompute against current counts; pin ``salt`` per snapshot
    for stable membership within one build).

    Plan: the fact is scanned ONCE with a broadcast-joined per-stratum
    rate (two tiny aggregates: counts, then the 1-row min) — zero fact
    shuffles. Rates are derived in a fixed float op order ((w*T)/n) so
    the acceptance boundary is bit-identical on any engine.
    """
    w_expr = None
    for name, w in sorted(weights.items()):
        cond = F.col(mix_col) == name
        w_expr = (F.when(cond, F.lit(float(w))) if w_expr is None
                  else w_expr.when(cond, F.lit(float(w))))
    w_expr = w_expr.otherwise(F.lit(None))
    # stratum mass: row count by default, or a measure column's sum —
    # training mixes are usually specified over TOKEN mass, and with a
    # per-row Bernoulli rate the expected kept mass from stratum s is
    # rate_s * mass_s = w_s * T exactly, so the token-weighted target
    # composition holds in expectation with the same machinery
    mass = (F.count(F.lit(1)) if measure_col is None
            else F.sum(F.col(measure_col)))
    counts = (df.groupBy(mix_col).agg(mass.alias("_n"))
              .withColumn("_w", w_expr).where(F.col("_w").isNotNull()))
    # T = min over strata via an unpartitioned window on the TINY rate
    # frame (one row per stratum) — same float op order as the oracle's
    # MIN CTE, and no join node at all (a 1-row crossJoin would plan
    # BroadcastNestedLoopJoin and trip the no-nested-loop invariant)
    t = F.min(F.col("_n").cast("double") / F.col("_w")) \
         .over(Window.partitionBy())
    rates = counts.select(
        mix_col,
        ((F.col("_w") * t) / F.col("_n").cast("double")).alias("_rate"))
    u = _unit(F.col(key_col), salt)
    return (df.join(F.broadcast(rates), mix_col)
            .where(u < F.col("_rate")).drop("_rate"))
