"""Deterministic-sampling query set (operators/sampling.py) over the
documents table — per-row value-level oracles (the membership decision
itself is checked, not just counts), since reproducible corpus
construction is exactly the property being claimed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import duck_hash60_sql
from ..operators.sampling import hash_sample, split_assign, stratified_sample
from ..sources.readers import load_table
from . import register

_H_RANGE = float(1 << 60)

#: per-language resampling rates for the stratified query (rebalance a
#: multilingual corpus: keep every zh doc, downsample en hard)
STRAT_FRACTIONS = {"en": 0.25, "de": 0.8, "zh": 1.0}
SPLIT_WEIGHTS = {"test": 0.1, "train": 0.8, "val": 0.1}


def _duck_unit(salt: str, key_expr: str) -> str:
    h = duck_hash60_sql(f"'{salt}' || '|' || CAST({key_expr} AS VARCHAR)")
    return f"(CAST({h} AS DOUBLE) / {_H_RANGE!r})"


@register(
    "sample_docs_20pct",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_duck_unit('sample', 'doc_id')} < 0.2
    """)
def q_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% document sample keyed on doc_id — same rows on
    any partitioning, any rerun (operators/sampling.hash_sample)."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, 0.2, "doc_id").select("doc_id", "lang")


@register(
    "sample_stratified_lang",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_duck_unit('strat', 'doc_id')} <
          CASE lang WHEN 'de' THEN 0.8 WHEN 'en' THEN 0.25
                    WHEN 'zh' THEN 1.0 ELSE 0.0 END
    """)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic resampling (corpus rebalancing:
    keep zh, downsample en to 25%, drop unlisted languages)."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, STRAT_FRACTIONS, "lang", "doc_id") \
        .select("doc_id", "lang")


@register(
    "split_assign_docs",
    f"""
    SELECT doc_id,
           CASE WHEN {_duck_unit('split', 'doc_id')} < 0.1 THEN 'test'
                WHEN {_duck_unit('split', 'doc_id')} < 0.9 THEN 'train'
                ELSE 'val' END AS split
    FROM documents
    """)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row train/val/test assignment by hash interval — keys keep
    their split forever (no eval leakage across pipeline reruns). The
    oracle checks every row's label, not just the split sizes."""
    docs = load_table(spark, sf_dir, "documents")
    return split_assign(docs, "doc_id", SPLIT_WEIGHTS).select("doc_id", "split")


@register(
    "grouped_minmax_scale",
    """
    SELECT doc_id, lang,
           CASE WHEN MAX(n_chars) OVER (PARTITION BY lang)
                     = MIN(n_chars) OVER (PARTITION BY lang) THEN 0
                ELSE CAST(floor(
                  (CAST(n_chars AS DOUBLE) - MIN(n_chars) OVER (PARTITION BY lang))
                  / (CAST(MAX(n_chars) OVER (PARTITION BY lang) AS DOUBLE)
                     - MIN(n_chars) OVER (PARTITION BY lang))
                  * 1000000 + 0.5) AS BIGINT)
           END AS scaled_q6
    FROM documents
    """)
def q_grouped_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language min-max scaling of document length through
    applyInPandas (operators/sampling.minmax_scale_by_group) — the
    grouped-map Arrow surface, value-checked against a pure-SQL window
    oracle (min/max are order-independent, so the Python path and the
    window path agree bitwise)."""
    from ..operators.sampling import minmax_scale_by_group

    docs = load_table(spark, sf_dir, "documents")
    return minmax_scale_by_group(docs, "lang", "n_chars", "doc_id")


_H60 = duck_hash60_sql("'wsample' || '|' || CAST(doc_id AS VARCHAR)")


@register(
    "sample_weighted_nchars",
    f"""
    SELECT doc_id, lang, n_chars
    FROM documents,
         (SELECT MAX(n_chars) AS wmax FROM documents)
    WHERE CAST({_H60} AS HUGEINT) * wmax
          < CAST(n_chars AS HUGEINT) * 1152921504606846976
    """)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional deterministic sampling (P(keep) =
    n_chars / max(n_chars), operators/sampling.weighted_sample): longer
    documents kept preferentially. The membership test is exact integer
    arithmetic (DECIMAL(38) / HUGEINT) so the per-row decision — not
    just the rate — is identical across engines; the oracle checks every
    row's fate."""
    from ..operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "n_chars", "doc_id") \
        .select("doc_id", "lang", "n_chars")


_NPG_U = _duck_unit("npg", "doc_id")


@register(
    "sample_n_per_lang",
    f"""
    SELECT doc_id, lang
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY lang ORDER BY {_NPG_U} ASC, doc_id ASC) <= 25
    """)
def q_sample_n_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HARD per-group budget (operators/sampling.
    sample_n_per_group): exactly min(25, |group|) documents per
    language, chosen by hash order — per-row membership checked by the
    identical window in the oracle."""
    from ..operators.sampling import sample_n_per_group

    docs = load_table(spark, sf_dir, "documents")
    return sample_n_per_group(docs, 25, "lang", "doc_id") \
        .select("doc_id", "lang")


_SHARD_H = duck_hash60_sql("'shard' || '|' || CAST(doc_id AS VARCHAR)")


@register(
    "shard_assign_docs",
    f"""
    SELECT doc_id,
           CAST({_SHARD_H} % 8 AS INTEGER) AS shard,
           CAST(row_number() OVER (
               PARTITION BY {_SHARD_H} % 8
               ORDER BY {_SHARD_H} ASC, doc_id ASC) - 1 AS BIGINT) AS pos
    FROM documents
    """)
def q_shard_assign_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment (operators/sampling.
    shard_assign): every document gets a shard in [0,8) and a 0-based
    position in hash (i.e. globally shuffled) order — the reproducible
    write-training-data step; one Exchange on shard + per-shard sort,
    which is the minimum physical work a shuffled shard writer can do.
    The oracle recomputes every row's (shard, pos) with the identical
    md5-derived hash."""
    from ..operators.sampling import shard_assign

    docs = load_table(spark, sf_dir, "documents")
    out = shard_assign(docs, "doc_id", 8)
    return out.select("doc_id", "shard", F.col("pos").cast("long").alias("pos"))


#: target training-mix over languages for the mixture query
MIX_WEIGHTS = {"de": 0.1, "en": 0.5, "es": 0.1, "fr": 0.1, "zh": 0.2}

_MIX_U = _duck_unit("mix", "doc_id")
_MIX_VALUES = ", ".join(f"('{k}', {float(v)!r})"
                        for k, v in sorted(MIX_WEIGHTS.items()))


@register(
    "mixture_sample_langs",
    f"""
    WITH w(lang, wt) AS (VALUES {_MIX_VALUES}),
    n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    r0 AS (SELECT n.lang, wt, n, CAST(n AS DOUBLE) / wt AS q
           FROM n JOIN w USING (lang)),
    t AS (SELECT MIN(q) AS tmax FROM r0),
    r AS (SELECT lang, (wt * tmax) / CAST(n AS DOUBLE) AS rate FROM r0, t)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN r USING (lang)
    WHERE {_MIX_U} < rate
    """)
def q_mixture_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mix resampling (operators/sampling.
    mixture_sample): subsample so the language composition matches the
    target weights (en 50%, zh 20%, de/es/fr 10%) while keeping the
    binding language whole — the data-mixing step of a training
    pipeline. One fact scan with broadcast per-stratum rates; the
    oracle recomputes every row's fate with the identical hash and
    rate arithmetic."""
    from ..operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(docs, "lang", "doc_id", MIX_WEIGHTS) \
        .select("doc_id", "lang")


@register(
    "mixture_sample_token_mass",
    f"""
    WITH w(lang, wt) AS (VALUES {_MIX_VALUES}),
    n AS (SELECT lang, SUM(n_chars) AS n FROM documents GROUP BY lang),
    r0 AS (SELECT n.lang, wt, n, CAST(n AS DOUBLE) / wt AS q
           FROM n JOIN w USING (lang)),
    t AS (SELECT MIN(q) AS tmax FROM r0),
    r AS (SELECT lang, (wt * tmax) / CAST(n AS DOUBLE) AS rate FROM r0, t)
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN r USING (lang)
    WHERE {_MIX_U} < rate
    """)
def q_mixture_sample_token_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix resampling over TOKEN/char MASS rather than document
    count (operators/sampling.mixture_sample with measure_col): per-row
    Bernoulli at rate_s keeps an expected w_s * T of stratum s's
    character mass — the unit real mixes are specified in (a stratum of
    few huge docs and one of many small docs now weigh correctly).
    Same zero-fact-shuffle plan; per-row fate oracle."""
    from ..operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(docs, "lang", "doc_id", MIX_WEIGHTS,
                          measure_col="n_chars") \
        .select("doc_id", "lang", "n_chars")


_GK_H = duck_hash60_sql("'gk' || '|' || CAST(doc_id AS VARCHAR)")


@register(
    "sample_global_topk_hash",
    f"""
    SELECT doc_id, lang
    FROM documents
    ORDER BY {_GK_H} ASC, doc_id ASC
    LIMIT 50
    """)
def q_sample_global_topk_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic FIXED-SIZE global sample: the 50 documents with the
    smallest salted hash — the reservoir-free exact-k corpus sample
    (eval subsets, debug slices). Plans TakeOrderedAndProject
    (per-partition heaps of 50, no global sort, no shuffle of the
    corpus) — at 100 TB this is a scan plus 50-row merges. Unlike
    hash_sample's fractional cut, k is exact; unlike a reservoir, the
    selection is partitioning- and rerun-stable (a new doc displaces at
    most one member)."""
    from ..functions.hashing import hash60

    docs = load_table(spark, sf_dir, "documents")
    h = hash60(F.concat_ws("|", F.lit("gk"), F.col("doc_id").cast("string")))
    return (docs.select("doc_id", "lang", h.alias("_h"))
            .orderBy(F.asc("_h"), F.asc("doc_id")).limit(50)
            .drop("_h"))


# Leakage-free split: reuses dedup_q's recursive-CTE clusters oracle so
# the per-row assignment contract (every cluster member shares its
# representative's split) is value-checked end to end.
from .dedup_q import _CLUSTERS_SQL  # noqa: E402

_LF_REP = "COALESCE(c.keep_id, d.doc_id)"
_LF_U = _duck_unit('split', _LF_REP)


@register(
    "split_leakage_free",
    f"""
    SELECT d.doc_id,
           CASE WHEN {_LF_U} < 0.1 THEN 'test'
                WHEN {_LF_U} < 0.9 THEN 'train'
                ELSE 'val' END AS split
    FROM documents d
    LEFT JOIN ({_CLUSTERS_SQL}) c ON d.doc_id = c.doc
    """)
def q_split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-safe train/val/test assignment
    (operators/sampling.split_assign_leakage_free): rows are hashed by
    their near-dup CLUSTER representative (MinHash-LSH pairs ->
    dedup_clusters), so a document and its 0.9-Jaccard twin can never
    straddle the eval boundary — the split-level complement of
    text_decontaminate's benchmark guard. Unclustered docs (the
    majority) hash by their own id, making this a strict refinement of
    split_assign_docs: identical labels except inside near-dup
    clusters. Oracle: the recursive-reachability cluster CTE joined
    back per row."""
    from ..operators.dedup import dedup_clusters, minhash_lsh_pairs
    from ..operators.sampling import split_assign_leakage_free

    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(minhash_lsh_pairs(docs))
    return (split_assign_leakage_free(docs, clusters, "doc_id",
                                      SPLIT_WEIGHTS)
            .select("doc_id", "split"))
