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
