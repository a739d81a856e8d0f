"""Text-analysis query set (operators/textstats.py) over ``documents``,
each with a full value-level DuckDB oracle.

DuckDB mirror notes:
  - regexp_replace needs the 'g' flag (Spark replaces all by default);
  - lambda indexes are 1-based (Spark 0-based);
  - integer list sums go through CAST(list_sum(..) AS DOUBLE) — integer
    addition is order-independent so fold order doesn't matter there;
  - floats that feed comparisons are computed with identical expression
    trees on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import duck_hash60_sql
from ..operators.textstats import (
    BPE_RE,
    LANG_MARKERS,
    WINNOW_K,
    WINNOW_W,
    lang_id_df,
    quality_features,
    quality_score,
    winnow_fingerprints,
)
from ..sources.readers import load_table
from . import register

_TOKS = "regexp_split_to_array(trim(text), ' +')"

PACK_BUDGET = 4096


def _duck_markers(lang: str) -> str:
    return "[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"


def _duck_stop_ratio(lang: str = "en") -> str:
    return (f"CAST(len(list_filter({_TOKS}, "
            f"t -> list_contains({_duck_markers(lang)}, t))) AS DOUBLE) "
            f"/ len({_TOKS})")


@register(
    "text_quality_features",
    f"""
    SELECT doc_id,
           length(text) AS n_chars_m,
           len({_TOKS}) AS n_toks,
           len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe,
           CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE)
             / len({_TOKS}) AS mean_tok_len,
           CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
             / length(text) AS alpha_ratio,
           {_duck_stop_ratio()} AS stop_ratio
    FROM documents
    """)
def q_text_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features in one codegen pass
    (operators/textstats.py quality_features)."""
    return quality_features(load_table(spark, sf_dir, "documents"))


def _duck_lang_id_sql() -> str:
    score_exprs = {
        lang: (f"(CAST(len(list_filter(toks, t -> list_contains("
               f"{_duck_markers(lang)}, t))) AS DOUBLE) / len(toks))")
        for lang in sorted(LANG_MARKERS)
    }
    g = "greatest(" + ", ".join(f"s_{lang}" for lang in sorted(LANG_MARKERS)) + ")"
    picks = " ".join(
        f"WHEN s_{lang} = {g} THEN '{lang}'" for lang in sorted(LANG_MARKERS))
    scores = ", ".join(f"{e} AS s_{lang}" for lang, e in score_exprs.items())
    return f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    scored AS (SELECT doc_id, lang, {scores} FROM t)
    SELECT doc_id, lang,
           CASE WHEN {g} <= 0 THEN 'und' {picks} END AS lang_pred
    FROM scored
    """


@register("text_lang_id", _duck_lang_id_sql())
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID (operators/textstats.py lang_id_df): argmax
    marker-hit ratio, alphabetical tiebreak, 'und' when nothing hits.
    Returned next to the table's recorded ``lang`` for inspection."""
    docs = load_table(spark, sf_dir, "documents")
    return lang_id_df(docs, keep=("lang",))


@register(
    "text_quality_filter",
    f"""
    WITH feats AS (
      SELECT doc_id,
             len({_TOKS}) AS n_toks,
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
               / length(text) AS alpha_ratio,
             {_duck_stop_ratio()} AS stop_ratio
      FROM documents
    )
    SELECT doc_id,
           CAST(floor((
             (CASE WHEN n_toks BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
              + alpha_ratio
              + least(stop_ratio * 4.0, 1.0)) / 3.0) * 1000000 + 0.5)
             AS BIGINT) AS quality_q6
    FROM feats
    WHERE CAST(floor((
             (CASE WHEN n_toks BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
              + alpha_ratio
              + least(stop_ratio * 4.0, 1.0)) / 3.0) * 1000000 + 0.5)
             AS BIGINT) >= 400000
    """)
def q_text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (quantized 1e-6) with a keep-threshold —
    the shape of a training-data quality gate
    (operators/textstats.py quality_score)."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_score(docs).where(F.col("quality_q6") >= 400_000)


@register(
    "text_winnow_fp",
    f"""
    WITH g AS (
      SELECT doc_id,
             CASE WHEN length(text) >= {WINNOW_K}
                  THEN list_transform(range(1, length(text) - {WINNOW_K} + 2),
                         i -> {duck_hash60_sql(f"substr(text, i, {WINNOW_K})")})
                  ELSE [] END AS hashes
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CASE WHEN len(hashes) >= {WINNOW_W}
                  THEN list_distinct(list_transform(
                         range(1, len(hashes) - {WINNOW_W} + 2),
                         s -> list_min(hashes[s : s + {WINNOW_W} - 1])))
                  ELSE [] END AS fps
      FROM g
    )
    SELECT doc_id, UNNEST(fps) AS fp FROM m
    """)
def q_text_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (k=8 char grams, window 4): the classic
    document-fingerprint set, exploded one row per retained hash
    (operators/textstats.py winnow_fingerprints)."""
    return winnow_fingerprints(load_table(spark, sf_dir, "documents"))


#: shared DuckDB CTE mirroring winnow_fingerprints (same shape as the
#: text_winnow_fp oracle above) — substring-level dedup oracles build on it
_WINNOW_CTE = f"""
    WITH g AS (
      SELECT doc_id,
             CASE WHEN length(text) >= {WINNOW_K}
                  THEN list_transform(range(1, length(text) - {WINNOW_K} + 2),
                         i -> {duck_hash60_sql(f"substr(text, i, {WINNOW_K})")})
                  ELSE [] END AS hashes
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CASE WHEN len(hashes) >= {WINNOW_W}
                  THEN list_distinct(list_transform(
                         range(1, len(hashes) - {WINNOW_W} + 2),
                         s -> list_min(hashes[s : s + {WINNOW_W} - 1])))
                  ELSE [] END AS fps
      FROM g
    ),
    fp AS (SELECT doc_id, UNNEST(fps) AS fp FROM m)
"""


@register(
    "text_repeated_spans",
    _WINNOW_CTE + """
    SELECT fp, COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM fp
    GROUP BY fp
    HAVING COUNT(DISTINCT doc_id) >= 2
    """)
def q_text_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated spans: winnowing fingerprints shared by
    >= 2 distinct documents (any shared substring of k+w-1 = 11 chars
    is guaranteed to surface) — substring-level duplication that
    doc-level near-dup ops miss (operators/textstats.py
    repeated_spans; Lee et al. 2021 motivation). One map-combined hash
    aggregate over the fingerprint stream."""
    from ..operators.textstats import repeated_spans

    return repeated_spans(load_table(spark, sf_dir, "documents"))


@register(
    "text_span_dup_ratio",
    _WINNOW_CTE + """
    , nd AS (SELECT fp, COUNT(DISTINCT doc_id) AS _nd FROM fp GROUP BY fp)
    SELECT fp.doc_id, COUNT(*) AS n_fp,
           CAST(SUM(CASE WHEN nd._nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           CAST(SUM(CASE WHEN nd._nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_ratio
    FROM fp JOIN nd USING (fp)
    GROUP BY fp.doc_id
    """)
def q_text_span_dup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document span-duplication ratio: fraction of a doc's
    fingerprints found in at least one other document — the
    boilerplate-heaviness score a corpus gate thresholds
    (operators/textstats.py span_dup_ratio). Fingerprint pass + one
    (fp -> doc count) hash-agg joined back + one per-doc aggregate."""
    from ..operators.textstats import span_dup_ratio

    return span_dup_ratio(load_table(spark, sf_dir, "documents"))


@register(
    "text_pack_bins",
    f"""
    WITH toks AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{BPE_RE}')) AS n_tok
      FROM documents
    )
    SELECT doc_id, n_tok,
           CAST(FLOOR(COALESCE(SUM(n_tok) OVER (
                  ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / {PACK_BUDGET}) AS BIGINT) AS bin
    FROM toks
    """)
def q_text_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: documents in doc_id order accumulate
    BPE-ish token counts; bin = floor(exclusive-prefix / budget) — the
    sequential packer as ONE window cumsum (operators/textstats.py
    pack_bins). Per-row bin assignments value-checked."""
    from ..operators.textstats import pack_bins

    return pack_bins(load_table(spark, sf_dir, "documents"), PACK_BUDGET)


@register(
    "text_corpus_quantiles",
    """
    WITH ranked AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           MAX(n) AS n_docs,
           MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                    THEN n_chars END) AS p50_chars,
           MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                    THEN n_chars END) AS p90_chars
    FROM ranked
    GROUP BY lang
    """)
def q_text_corpus_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language length quantiles by explicit rank selection
    (rn == ceil(q*n) over a deterministic sort) — the same definition on
    both engines, immune to quantile-interpolation drift between
    implementations. One shuffle on lang."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    ranked = docs.select(
        "lang", "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"))
    pick = lambda q: F.max(F.when(
        F.col("rn") == F.ceil(q * F.col("n")).cast("long"),
        F.col("n_chars")))
    return (ranked.groupBy("lang")
            .agg(F.max("n").alias("n_docs"),
                 pick(F.lit(0.5)).alias("p50_chars"),
                 pick(F.lit(0.9)).alias("p90_chars")))


_Q6 = lambda e: f"CAST(floor(({e}) * 1000000 + 0.5) AS BIGINT)"  # noqa: E731

@register(
    "text_repetition",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM u GROUP BY doc_id, tok),
    m AS (SELECT doc_id, MAX(cnt) AS top FROM c GROUP BY doc_id),
    b AS (SELECT doc_id,
                 CASE WHEN len(toks) >= 2
                      THEN list_transform(range(1, len(toks)),
                             i -> toks[i] || ' ' || toks[i+1])
                      ELSE [] END AS bis
          FROM t)
    SELECT t.doc_id,
           len(t.toks) AS n_toks,
           {_Q6("CAST(m.top AS DOUBLE) / len(t.toks)")} AS top_tok_q6,
           {_Q6("CAST(len(list_distinct(t.toks)) AS DOUBLE) / len(t.toks)")}
             AS distinct_q6,
           CASE WHEN len(b.bis) = 0 THEN 0
                ELSE {_Q6("CAST(len(b.bis) - len(list_distinct(b.bis)) AS DOUBLE) / len(b.bis)")}
           END AS dup_bigram_q6
    FROM t JOIN m ON t.doc_id = m.doc_id JOIN b ON t.doc_id = b.doc_id
    """)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (operators/textstats.py
    repetition_features): max-token-multiplicity via a sorted-array fold,
    distinct-token and duplicate-bigram ratios — all per-row codegen, no
    explode/shuffle (the DuckDB oracle uses the exploded groupBy form,
    which is exactly the shape the Spark side avoids)."""
    from ..operators.textstats import repetition_features

    return repetition_features(load_table(spark, sf_dir, "documents"))


_DECON_SHS = """
    list_distinct(CASE WHEN len(toks) >= 3
         THEN list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [] END)
"""

@register(
    "text_decontaminate",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_DECON_SHS} AS shs FROM t),
    ev AS (SELECT DISTINCT unnest(shs) AS sh FROM sh WHERE doc_id % 50 = 0),
    tr AS (SELECT doc_id, len(shs) AS n_shingles, unnest(shs) AS sh
           FROM sh WHERE doc_id % 50 <> 0)
    SELECT tr.doc_id, tr.n_shingles, COUNT(*) AS n_hits,
           {_Q6("CAST(COUNT(*) AS DOUBLE) / tr.n_shingles")} AS overlap_q6
    FROM tr JOIN ev ON tr.sh = ev.sh
    GROUP BY tr.doc_id, tr.n_shingles
    """)
def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/textstats.py decontaminate):
    training docs sharing 3-gram shingles with a stand-in eval set
    (doc_id % 50 == 0). Eval shingle set is broadcast; the corpus side
    never shuffles."""
    from ..operators.textstats import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 50 == 0)
    tr = docs.where(F.col("doc_id") % 50 != 0)
    return decontaminate(tr, ev)


@register(
    "pii_redact_contacts",
    """
    WITH synth AS (
      SELECT c_custkey,
             'reach ' || c_name || ' at ' || lower(c_name) || '@corp.example'
               || ' or +1-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               AS contact
      FROM customer)
    SELECT c_custkey,
           regexp_replace(
             regexp_replace(contact,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted,
           len(regexp_extract_all(contact,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(contact,
               '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS n_phones
    FROM synth
    """)
def q_pii_redact_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/textstats.py redact_pii) over a
    deterministically SYNTHESIZED contact string (the slim testdata has
    no phone/comment columns — the synthesis is the fixture, the
    redaction operator is the product). Patterns are RE2-compatible
    literals shared verbatim with the DuckDB oracle."""
    from ..operators.textstats import redact_pii

    cust = load_table(spark, sf_dir, "customer")
    contact = F.concat(
        F.lit("reach "), F.col("c_name"), F.lit(" at "),
        F.lower(F.col("c_name")), F.lit("@corp.example or +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"))
    base = cust.select("c_custkey", contact.alias("contact"))
    red, n_e, n_p = redact_pii(F.col("contact"))
    return base.select("c_custkey", red.alias("redacted"),
                       n_e.alias("n_emails"), n_p.alias("n_phones"))


@register(
    "vocab_heavy_hitters",
    f"""
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok ASC
    LIMIT 20
    """)
def q_vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 token frequencies (operators/textstats.py
    vocab_top_k): map-side partial agg absorbs hot-token skew, top-k is
    TakeOrderedAndProject with a total order."""
    from ..operators.textstats import vocab_top_k

    return vocab_top_k(load_table(spark, sf_dir, "documents"), 20)


_QUALITY_Q6 = f"""
    CAST(floor((
      (CASE WHEN len({_TOKS}) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
       + CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
           / length(text)
       + least({_duck_stop_ratio()} * 4.0, 1.0)) / 3.0) * 1000000 + 0.5)
      AS BIGINT)
"""

@register(
    "corpus_prep_pipeline",
    f"""
    WITH keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM documents
      GROUP BY {duck_hash60_sql('text')}
    ),
    surv AS (
      SELECT d.* FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
    ),
    gated AS (
      SELECT doc_id, text FROM surv
      WHERE {_QUALITY_Q6} >= 400000
        AND (CAST({duck_hash60_sql("'split' || '|' || CAST(doc_id AS VARCHAR)")}
             AS DOUBLE) / {float(1 << 60)!r}) >= 0.1
        AND (CAST({duck_hash60_sql("'split' || '|' || CAST(doc_id AS VARCHAR)")}
             AS DOUBLE) / {float(1 << 60)!r}) < 0.9
    ),
    toks AS (
      SELECT doc_id, len(regexp_extract_all(text, '{BPE_RE}')) AS n_tok
      FROM gated
    )
    SELECT doc_id, n_tok,
           CAST(FLOOR(COALESCE(SUM(n_tok) OVER (
                  ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / {PACK_BUDGET}) AS BIGINT) AS bin
    FROM toks
    """)
def q_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end training-corpus pipeline
    (operators/textstats.py corpus_prep): exact dedup -> quality gate ->
    train-split selection -> context-window packing, value-checked as
    ONE query. This is the composability proof — the same operators that
    pass their individual oracles compose into a pipeline that passes a
    single end-to-end oracle."""
    from ..operators.textstats import corpus_prep

    return corpus_prep(load_table(spark, sf_dir, "documents"),
                       budget_tokens=PACK_BUDGET)


from ..operators.retrieval import bm25_oracle_sql, bm25_topk  # noqa: E402

_BM25_TERMS = ["spark", "hash", "merge"]


@register("text_bm25_topk", bm25_oracle_sql(_BM25_TERMS, k=20))
def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rational-idf BM25 top-20 for a fixed query-term set
    (operators/retrieval.py): corpus stats fold to ONE broadcast row,
    scoring is pure projection, top-k is TakeOrderedAndProject — the
    corpus is scanned twice and never shuffled. The oracle SQL is
    GENERATED from the same term list, so both expression trees stay in
    lockstep by construction."""
    return bm25_topk(load_table(spark, sf_dir, "documents"), _BM25_TERMS, k=20)


@register(
    "lateral_token_positions",
    f"""
    SELECT doc_id,
           unnest(list_transform({_TOKS},
                  (x, i) -> struct_pack(pos := CAST(i - 1 AS INT),
                                        tok := x)),
                  recursive := true)
    FROM documents
    WHERE doc_id < 20
    """)
def q_lateral_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/UDTF surface: POSEXPLODE — one row per (position,
    token) — the lateral-view table function every tokenization
    pipeline leans on. Spark plans a Generate node inside the scan
    stage (zero shuffle); the oracle is DuckDB's recursive struct
    unnest (its lambda index is 1-based, Spark's posexplode 0-based)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    from ..operators.textstats import tokens as _toks

    return docs.select(
        "doc_id",
        F.posexplode(_toks(F.col("text"))).alias("pos", "tok"))


_CMS_H = duck_hash60_sql("'cm' || CAST(r AS VARCHAR) || '|' || tok")


@register(
    "sketch_cms_tokens",
    f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    rows_ AS (SELECT unnest(range(0, 4)) AS r),
    cms AS (
      SELECT r, {_CMS_H} % 64 AS col, COUNT(*) AS cnt
      FROM toks, rows_
      GROUP BY 1, 2),
    top AS (
      SELECT tok, COUNT(*) AS n_true
      FROM toks GROUP BY tok
      ORDER BY n_true DESC, tok ASC LIMIT 20),
    keys_ AS (
      SELECT tok, n_true, r, {_CMS_H} % 64 AS col
      FROM top, rows_)
    SELECT tok, n_true, MIN(cnt) AS n_est
    FROM keys_ JOIN cms USING (r, col)
    GROUP BY tok, n_true
    """)
def q_sketch_cms_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (operators/sketch.py): a 4x64 counter
    table over the corpus token stream, estimating the exact top-20
    tokens' frequencies via MIN over each token's 4 counters. The
    mergeable-frequency twin of sketch_hll_custkey: counters merge by
    SUM, the table is fixed-size regardless of stream length, and the
    md5-derived hashing makes every counter — and so every estimate —
    bit-identical to the oracle's. Overcount-only error (est >= true,
    pytest-asserted) is the count-min contract."""
    from ..operators.sketch import cms_estimate, count_min_table
    from ..operators.textstats import tokens, vocab_top_k

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    cms = count_min_table(toks)
    top = vocab_top_k(docs, 20).withColumnRenamed("n", "n_true")
    return cms_estimate(cms, top, "tok")


from .dedup_q import _INC_SPLIT, _MINHASH_PAIRS_SQL  # noqa: E402
# ONE copy of the cross-engine sharding formula and the ingest split —
# a drifting duplicate would silently leave this oracle on an old
# convention while shard_assign_docs moves on
from .sampling_q import _SHARD_H as _ING_SHARD_H  # noqa: E402

_ING_SPLIT = _INC_SPLIT


@register(
    "ingest_batch_pipeline",
    f"""
    WITH newb AS (SELECT * FROM documents WHERE doc_id >= {_ING_SPLIT}),
    nh AS (
      SELECT doc_id, text, {duck_hash60_sql('text')} AS h FROM newb),
    ch AS (
      SELECT DISTINCT {duck_hash60_sql('text')} AS h
      FROM documents WHERE doc_id < {_ING_SPLIT}),
    exact_ok AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text, h,
               row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM nh)
      WHERE rn = 1 AND h NOT IN (SELECT h FROM ch)),
    pairs AS ({_MINHASH_PAIRS_SQL}),
    near_drop AS (
      SELECT DISTINCT doc_b AS doc_id FROM pairs
      WHERE doc_b >= {_ING_SPLIT}),
    surv AS (
      SELECT doc_id FROM exact_ok
      WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)
        AND {_QUALITY_Q6} >= 400000)
    SELECT doc_id,
           CAST({_ING_SHARD_H} % 8 AS INTEGER) AS shard,
           CAST(row_number() OVER (
               PARTITION BY {_ING_SHARD_H} % 8
               ORDER BY {_ING_SHARD_H} ASC, doc_id ASC) - 1 AS BIGINT) AS pos
    FROM surv
    """)
def q_ingest_batch_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL sibling of corpus_prep_pipeline
    (operators/ingest.ingest_batch): a new ingest batch
    (doc_id >= {split}) accept-filtered against the standing corpus —
    exact dedup vs the corpus hash index, near-dup vs the MinHash
    signature index (greedy drop), quality gate, shard assignment —
    value-checked end to end as ONE oracle. Every stage costs
    O(batch + matches); the corpus contributes only its indexes."""
    from ..operators.ingest import ingest_batch

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") < _ING_SPLIT)
    newb = docs.where(F.col("doc_id") >= _ING_SPLIT)
    return ingest_batch(corpus, newb)


@register(
    "text_familiarity",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS total FROM vocab)
    SELECT doc_id, COUNT(*) AS n_toks,
           CAST(SUM(cnt) AS BIGINT) AS sum_freq,
           CAST(floor(CAST(CAST(SUM(cnt) AS DECIMAL(38,0)) AS DOUBLE)
                      / CAST(COUNT(*) * total AS DOUBLE)
                      * 1000000000 + 0.5) AS BIGINT) AS fam_q9
    FROM toks JOIN vocab USING (tok), tot
    GROUP BY doc_id, total
    """)
def q_text_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-familiarity scoring (operators/textstats.
    familiarity_scores): each document's mean corpus token frequency —
    the exact-integer cousin of unigram-logprob quality scoring (high =
    boilerplate-leaning vocabulary, low = rare), kept in rational
    arithmetic precisely because float log() is where engines drift.
    Two map-combined aggregates + one vocab join; the corpus-total
    scalar rides an unpartitioned window over the bounded vocab frame,
    never a driver probe."""
    from ..operators.textstats import familiarity_scores

    return familiarity_scores(load_table(spark, sf_dir, "documents"))


@register(
    "source_health_report",
    f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) - COUNT(DISTINCT {duck_hash60_sql('text')})
                AS BIGINT) AS dup_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(len(regexp_split_to_array(trim(text), ' +')))
                AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY source
    """)
def q_source_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus governance report — the triage table a
    web-scale pipeline reads before deciding mixture weights or
    dropping a feed: volume (docs/chars/tokens), exact-duplicate rate
    (60-bit content hash, same convention as dedup_exact), and language
    spread, per `source`. All measures are exact integers (counts and
    integer sums — order-independent, hash-stable across engines and
    partitionings). ONE hash-agg shuffle on source; distinct-aggregates
    expand map-side like any multi-distinct group."""
    from ..functions.hashing import hash60

    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), " +"))
    return (docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct(hash60(F.col("text"))))
        .cast("long").alias("dup_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum(toks).cast("long").alias("total_tokens")))


@register(
    "text_chunk_windows",
    """
    WITH t AS (SELECT doc_id,
                      regexp_split_to_array(trim(text), ' +') AS toks
               FROM documents),
    c AS (SELECT doc_id, toks,
                 GREATEST(1, CAST(ceil((len(toks) - 16) / 48.0) AS BIGINT))
                   AS nc
          FROM t),
    e AS (SELECT doc_id, toks, UNNEST(range(0, nc)) AS chunk_id FROM c)
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           array_to_string(toks[chunk_id*48+1 : chunk_id*48+64], ' ')
             AS chunk_text,
           CAST(len(toks[chunk_id*48+1 : chunk_id*48+64]) AS INT)
             AS n_tokens
    FROM e
    """)
def q_text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document chunking
    (operators/textstats.chunk_documents): 64-token windows with
    16-token overlap (stride 48), final chunk keeps its natural length,
    every doc yields >= 1 chunk. The SPLIT-long-docs complement of
    text_pack_bins' PACK-short-docs; one codegen pass ending in a
    single explode, zero shuffles. Oracle checks every chunk's exact
    text and token count."""
    from ..operators.textstats import chunk_documents

    return chunk_documents(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_keep_best",
    f"""
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
    ),
    clusters AS (SELECT doc, MIN(r) AS keep_id FROM reach GROUP BY doc),
    scored AS (
      SELECT c.doc, c.keep_id, {_QUALITY_Q6} AS q
      FROM clusters c JOIN documents ON documents.doc_id = c.doc
    ),
    winners AS (
      SELECT doc FROM (
        SELECT doc, ROW_NUMBER() OVER (
            PARTITION BY keep_id ORDER BY q DESC, doc ASC) AS rn
        FROM scored) t
      WHERE rn = 1
    ),
    dropped AS (
      SELECT doc FROM clusters
      WHERE doc NOT IN (SELECT doc FROM winners)
    )
    SELECT d.* FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc FROM dropped)
    """)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor selection (operators/dedup.
    cluster_representatives): MinHash near-dup pairs -> connected
    components -> each cluster keeps its HIGHEST-quality member
    (quality_q6_expr composite, min-id tiebreak) instead of the min-id
    keeper — the "keep the cleanest duplicate" policy a training-data
    pipeline wants when crawl order and copy quality are uncorrelated.
    The quality expression is evaluated only for cluster members (the
    near-dup-bounded subset), never corpus-wide; the oracle re-derives
    the same winner per component via recursive reachability + the
    identical quantized quality formula."""
    from ..operators.dedup import (cluster_representatives,
                                   dedup_clusters, minhash_lsh_pairs)
    from ..operators.textstats import quality_q6_expr

    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(minhash_lsh_pairs(docs))
    return cluster_representatives(docs, clusters,
                                   quality_q6_expr(F.col("text")))


from .dedup_q import _NGRAM_JACCARD_SQL  # noqa: E402


@register(
    "dedup_ngram_keep_best",
    f"""
    WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc
    ),
    clusters AS (SELECT doc, MIN(r) AS keep_id FROM reach GROUP BY doc),
    scored AS (
      SELECT c.doc, c.keep_id, {_QUALITY_Q6} AS q
      FROM clusters c JOIN documents ON documents.doc_id = c.doc
    ),
    winners AS (
      SELECT doc FROM (
        SELECT doc, ROW_NUMBER() OVER (
            PARTITION BY keep_id ORDER BY q DESC, doc ASC) AS rn
        FROM scored) t
      WHERE rn = 1
    ),
    dropped AS (
      SELECT doc FROM clusters
      WHERE doc NOT IN (SELECT doc FROM winners)
    )
    SELECT d.* FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc FROM dropped)
    """)
def q_dedup_ngram_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-CALL keep-best dedup driver (operators/dedup.
    ngram_jaccard_dedup with keep="best" — VERDICT r8 #7): exact
    n-gram-Jaccard pairs -> connected components -> quality arg-max
    survivor, composed inside the operator so pipelines stop
    hand-wiring the three-step dance. Oracle: brute-force all-pairs
    Jaccard + recursive reachability + the identical quantized quality
    formula, winner per component by q DESC, doc ASC (NULLS LAST
    matches the engine's -inf coalesce)."""
    from ..operators.dedup import ngram_jaccard_dedup
    from ..operators.textstats import quality_q6_expr

    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_dedup(docs, keep="best",
                               score=quality_q6_expr(F.col("text")))
