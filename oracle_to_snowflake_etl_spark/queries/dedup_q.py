"""Dedup query set (SURVEY.md §7.5 north-star; operators/dedup.py) over the
``documents`` table, each with a full value-level DuckDB oracle.

The oracles re-express the exact same md5-derived hash pipeline in DuckDB
SQL (functions/hashing.py cross-engine contract), so MinHash signatures,
SimHash fingerprints, and Jaccard scores match bit-for-bit — not just
row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.hashing import duck_hash60_sql
from ..operators.dedup import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    _affine_constants,
    SIMHASH_BITS,
    SIMHASH_CHUNK_BITS,
    SIMHASH_CHUNKS,
    SIMHASH_MAX_HAMMING,
    dedup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..sources.readers import load_table
from . import register

# DuckDB fragments mirroring operators/dedup.py tokenize/shingle exactly:
# tokens = regex-split on runs of spaces after trim; shingles = distinct
# space-joined 3-gram windows, empty when < 3 tokens.
_DUCK_TOKS = "regexp_split_to_array(trim(text), ' +')"
_DUCK_SHINGLES = f"""
    list_distinct(
      CASE WHEN len({_DUCK_TOKS}) >= 3
           THEN list_transform(range(1, len({_DUCK_TOKS}) - 1),
                  i -> {_DUCK_TOKS}[i] || ' ' || {_DUCK_TOKS}[i+1] || ' ' || {_DUCK_TOKS}[i+2])
           ELSE [] END)
"""


@register(
    "dedup_exact",
    f"""
    SELECT text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM (SELECT doc_id, {duck_hash60_sql('text')} AS text_hash FROM documents)
    GROUP BY text_hash
    """)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: 60-bit content-hash groupBy with deterministic keeper
    (operators/dedup.py exact_dedup)."""
    return exact_dedup(load_table(spark, sf_dir, "documents"))


_NGRAM_JACCARD_SQL = f"""
    WITH docs AS (SELECT doc_id AS doc, {_DUCK_SHINGLES} AS sh FROM documents)
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
             AS jaccard
    FROM docs a JOIN docs b ON a.doc < b.doc
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
            >= 0.5
    """


@register("dedup_ngram_jaccard", _NGRAM_JACCARD_SQL)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL 3-gram-shingle Jaccard >= 0.5 pairs via the lossless
    All-Pairs/PPJoin prefix filter + exact array_intersect rescore
    (operators/dedup.ngram_jaccard_pairs). Because the prefix filter is
    exact-recall, the oracle is BRUTE-FORCE all-pairs Jaccard — the
    semantic ground truth, not a mirror of the algorithm."""
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


@register("dedup_ngram_jaccard_scale", _NGRAM_JACCARD_SQL)
def q_dedup_ngram_jaccard_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact-Jaccard prefix-filter operator on the SCALE-SAFE path
    (scale_safe=True): document frequency via groupBy partial-agg +
    join-back instead of a COUNT window partitioned on the shingle hash
    — the formulation whose per-task input stays bounded when one
    boilerplate shingle covers a large corpus fraction (hot-key window
    hazard, operators/dedup.py ngram_jaccard_pairs docstring). Same
    brute-force all-pairs oracle: both paths must produce identical
    pairs and scores."""
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"),
                               scale_safe=True)


@register("dedup_ngram_jaccard_auto", _NGRAM_JACCARD_SQL)
def q_dedup_ngram_jaccard_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scale_safe="auto": the engine DECIDES window vs partial-agg from
    a deterministic corpus sample (operators/dedup.choose_dedup_scale_path
    — est. exploded-row volume + hot-shingle fraction vs the measured
    sf0.1↔sf1 crossover, VERDICT r6 #1) instead of making the caller
    know their regime. On the bench corpus the sample says "small,
    uniform" so this exercises decision + window branch end-to-end;
    the partial-agg branch is driven by the 30%-hot fixture
    (tests/test_plans.py test_auto_scale_safe_decision). Same
    brute-force oracle — the decision moves the plan, never the answer."""
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"),
                               scale_safe="auto")


_MH_A, _MH_B = _affine_constants()
_MH_A_LIT = "[" + ", ".join(str(a) for a in _MH_A) + "]"
_MH_B_LIT = "[" + ", ".join(str(b) for b in _MH_B) + "]"


_MINHASH_PAIRS_SQL = f"""
    WITH sigs AS (
      SELECT doc,
             list_transform(range(1, {MINHASH_K + 1}), j ->
               list_min(list_transform(h32s,
                 h -> (({_MH_A_LIT}[j] * h + {_MH_B_LIT}[j])
                       & {(1 << 60) - 1}))) ) AS sig
      FROM (SELECT doc_id AS doc,
                   list_transform({_DUCK_SHINGLES},
                     s -> ({duck_hash60_sql('s')} & {(1 << 32) - 1})) AS h32s,
                   {_DUCK_SHINGLES} AS shingles
            FROM documents)
      WHERE len(shingles) > 0
    ),
    banded AS (
      SELECT doc, sig, b AS band,
             array_to_string(sig[b*{LSH_ROWS}+1 : b*{LSH_ROWS}+{LSH_ROWS}], '_') AS key
      FROM sigs, (SELECT UNNEST(range(0, {LSH_BANDS})) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
                      a.sig AS sig_a, b.sig AS sig_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
    )
    SELECT doc_a, doc_b,
           CAST(list_sum(list_transform(range(1, {MINHASH_K + 1}),
                i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) AS DOUBLE)
             / {MINHASH_K} AS est_jaccard
    FROM cand
    WHERE CAST(list_sum(list_transform(range(1, {MINHASH_K + 1}),
                i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) AS DOUBLE)
             / {MINHASH_K} >= 0.5
    """


@register("dedup_minhash_lsh", _MINHASH_PAIRS_SQL)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + 4x4 banded LSH candidate pairs scored by estimated
    Jaccard (operators/dedup.py minhash_lsh_pairs) — the 100 TB dedup
    path: shuffle volume O(docs x bands), independent of text length."""
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


#: batch split point for the incremental-dedup query: docs below are the
#: standing corpus (signature index precomputed), docs at/above are the
#: newly-ingested batch
_INC_SPLIT = 400


@register(
    "dedup_incremental_minhash",
    f"""
    WITH full_pairs AS ({_MINHASH_PAIRS_SQL})
    SELECT * FROM full_pairs WHERE doc_b >= {_INC_SPLIT}
    """)
def q_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new ingest batch (doc_id >= {split}) against
    the standing corpus's precomputed MinHash signature index — corpus
    text is never re-shingled; per-ingest cost is O(batch), not
    O(corpus) (operators/dedup.minhash_lsh_pairs_incremental). Oracle:
    the FULL corpus LSH run restricted to pairs whose greater member is
    new — incremental must equal rebuild-from-scratch minus
    corpus-internal pairs, the defining no-drift property of an
    incremental index."""
    from ..operators.dedup import (minhash_lsh_pairs_incremental,
                                   with_minhash_signature)
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    corpus_sigs = with_minhash_signature(
        docs.where(F.col("doc_id") < _INC_SPLIT))
    new_batch = docs.where(F.col("doc_id") >= _INC_SPLIT)
    return minhash_lsh_pairs_incremental(new_batch, corpus_sigs)


# The recursive CTE computes full reachability over the (symmetrized)
# near-dup edge list and takes the minimum reachable id — the exact
# semantics the Spark side's iterative min-label propagation converges
# to, so even an ITERATIVE graph algorithm gets a value-level oracle.
_CLUSTERS_SQL = f"""
    WITH RECURSIVE pairs AS ({_MINHASH_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc
    )
    SELECT doc, MIN(r) AS keep_id FROM reach GROUP BY doc
    """


@register("dedup_clusters", _CLUSTERS_SQL)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup pairs resolved into connected components with a
    minimum-id keeper (operators/dedup.py dedup_clusters) — the
    pairs->clusters->survivor step of a dedup pipeline, and the engine's
    iterative-algorithm surface (driver-looped min-label propagation,
    one output-bounded shuffle per round)."""
    pairs = minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))
    return dedup_clusters(pairs)


@register(
    "dedup_simhash",
    f"""
    WITH hashed AS (
      SELECT doc_id AS doc,
             list_transform({_DUCK_TOKS}, t -> {duck_hash60_sql("'sh:' || t")}) AS th
      FROM documents
    ),
    fps AS (
      SELECT doc,
             CAST(list_sum(list_transform(range(0, {SIMHASH_BITS}), j ->
               CASE WHEN list_sum(list_transform(th,
                          h -> ((h >> j) & 1) * 2 - 1)) > 0
                    THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT)
               END)) AS BIGINT) AS fp
      FROM hashed
    ),
    chunks AS (
      SELECT doc, fp, c AS chunk,
             (fp >> (c * {SIMHASH_CHUNK_BITS})) & {(1 << SIMHASH_CHUNK_BITS) - 1} AS cv
      FROM fps, (SELECT UNNEST(range(0, {SIMHASH_CHUNKS})) AS c)
    )
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
                    bit_count(xor(a.fp, b.fp)) AS hamming
    FROM chunks a
    JOIN chunks b ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc < b.doc
    WHERE bit_count(xor(a.fp, b.fp)) <= {SIMHASH_MAX_HAMMING}
    """)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash near-dup pairs at Hamming <= 3, candidates via
    lossless 15-bit chunk banding (operators/dedup.py simhash_pairs)."""
    return simhash_pairs(load_table(spark, sf_dir, "documents"))


def _containment_oracle_sql(batch_pred: str = "TRUE") -> str:
    """Brute-force ordered-pairs containment oracle, shared by the
    full/incremental/drop scenarios so the threshold and shingle
    expression live in ONE place; ``batch_pred`` restricts the
    contained (a) side."""
    c = "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh)"
    return f"""
    WITH docs AS (SELECT doc_id AS doc, {_DUCK_SHINGLES} AS sh FROM documents)
    SELECT a.doc AS doc_a, b.doc AS doc_b, {c} AS containment
    FROM docs a JOIN docs b ON a.doc != b.doc
    WHERE {batch_pred}
      AND len(a.sh) > 0 AND len(b.sh) > 0
      AND {c} >= 0.8
    """


@register("dedup_containment", _containment_oracle_sql())
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup (operators/dedup.
    containment_pairs): ordered pairs where >= 80% of A's shingles also
    appear in B — doc-in-doc duplication symmetric Jaccard misses. The
    contained side uses the lossless prefix filter; the containing side
    indexes fully; oracle is brute-force ordered-pairs containment."""
    from ..operators.dedup import containment_pairs

    return containment_pairs(load_table(spark, sf_dir, "documents"))


@register("dedup_containment_scale", _containment_oracle_sql())
def q_dedup_containment_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup on the SCALE-SAFE path (scale_safe=True): both
    shingle-hash-partitioned windows replaced — DF via groupBy
    partial-agg + join-back, the containing-side membership bound via
    distinct + left-semi join (operators/dedup.py containment_pairs
    docstring). Same brute-force ordered-pairs oracle as
    dedup_containment: the two paths must agree exactly."""
    from ..operators.dedup import containment_pairs

    return containment_pairs(load_table(spark, sf_dir, "documents"),
                             scale_safe=True)


@register("dedup_containment_incr",
          _containment_oracle_sql(f"a.doc >= {_INC_SPLIT}"))
def q_dedup_containment_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental containment at ingest (operators/dedup.
    containment_pairs_incremental): which NEW documents (doc_id >=
    {split}) are >=80% contained in the standing corpus's stored
    shingle index or a batch sibling — boilerplate detection per drop,
    O(batch + prefix-hit index + matches). Oracle: brute-force ordered
    containment restricted to contained-side-new."""
    from pyspark.sql import functions as F

    from ..operators.dedup import (containment_pairs_incremental,
                                   shingled_docs)

    docs = load_table(spark, sf_dir, "documents")
    corpus_idx = shingled_docs(docs.where(F.col("doc_id") < _INC_SPLIT))
    newb = docs.where(F.col("doc_id") >= _INC_SPLIT)
    return containment_pairs_incremental(newb, corpus_idx)


#: realistic-drop batch selector: every 25th doc_id => batch is exactly
#: 4% of the corpus at any scale factor. The _INC_SPLIT scenario above
#: deliberately makes the batch 92% of the corpus at sf0.1 (a stated
#: stress upper bound, SCALE.md); this scenario measures the claimed
#: steady-state O(batch) per-ingest cost at a drop size an actual
#: pipeline would see.
_DROP_MOD = 25


@register("dedup_containment_drop",
          _containment_oracle_sql(f"a.doc % {_DROP_MOD} = 0"))
def q_dedup_containment_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental containment at a REALISTIC drop size: batch = the 4%
    of documents with doc_id % {mod} == 0, corpus = the other 96% (whose
    stored shingle index is reused, text never re-read). Same operator as
    dedup_containment_incr (operators/dedup.containment_pairs_incremental);
    this entry exists to MEASURE the per-ingest cost at steady-state
    batch:corpus proportions instead of the 92%-of-corpus stress
    scenario. Finding (SCALE.md): end-to-end both scenarios are
    dominated by the in-query index build the oracle requires; the
    production marginal cost (pre-materialized index) is 3.1s at sf0.1
    scaling x1.6/decade — the compact-index scan term. Oracle:
    brute-force ordered containment restricted to
    contained-side-in-batch."""
    from pyspark.sql import functions as F

    from ..operators.dedup import (containment_pairs_incremental,
                                   shingled_docs)

    docs = load_table(spark, sf_dir, "documents")
    corpus_idx = shingled_docs(docs.where(F.col("doc_id") % _DROP_MOD != 0))
    newb = docs.where(F.col("doc_id") % _DROP_MOD == 0)
    return containment_pairs_incremental(newb, corpus_idx)


@register(
    "dedup_ngram_jaccard_incr",
    _NGRAM_JACCARD_SQL
    + f" AND (a.doc % {_DROP_MOD} = 0 OR b.doc % {_DROP_MOD} = 0)")
def q_dedup_ngram_jaccard_incr(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Incremental exact-Jaccard near-dup at ingest (operators/dedup.py
    ngram_jaccard_pairs_incremental — round 10): a 4% document drop's
    shingles matched against the standing corpus's STORED shingle index
    (shingled_docs output, text never re-read) plus batch siblings,
    through the shared symmetric-prefix-filter core
    (jaccard_pairs_incremental_from_index) that also powers the video
    and audio modality incrementals. Completes the text family's
    incremental set: exact hash (ingest_batch), MinHash, containment,
    and now exact Jaccard. Oracle: brute-force all-pairs Jaccard
    restricted to pairs with at least one new side (no-drift)."""
    from pyspark.sql import functions as F

    from ..operators.dedup import (ngram_jaccard_pairs_incremental,
                                   shingled_docs)

    docs = load_table(spark, sf_dir, "documents")
    corpus_idx = shingled_docs(docs.where(F.col("doc_id") % _DROP_MOD != 0))
    newb = docs.where(F.col("doc_id") % _DROP_MOD == 0)
    return ngram_jaccard_pairs_incremental(newb, corpus_idx)
