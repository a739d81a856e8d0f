"""Lexical retrieval over the corpus: TF-IDF / BM25 scoring and top-k.

The missing sibling of the similarity operators (operators/similarity.py
covers the embedding side): score every document against a FIXED small
query-term set with corpus-statistics weighting and return the top-k.

Scale shape — the part that matters at 100 TB:
  * per-doc term frequencies are pure projection over the scan (array
    ``filter`` on the token array — no explode, no shuffle);
  * ALL corpus statistics (N, total doc length, per-term document
    frequencies) fold into ONE global aggregate — a single exchange down
    to one row, broadcast back over the corpus;
  * scoring is again pure projection; the top-k is
    ``TakeOrderedAndProject`` (per-partition heaps), never a global sort.
  So the corpus is scanned exactly twice (stats pass + scoring pass) and
  never shuffled. An inverted-index variant only wins when queries
  arrive continuously against a static corpus; for pipeline-style "score
  everything once" passes, the two-scan form is optimal.

Cross-engine determinism: BM25's log-idf is NOT reproducible across
engines (libm vs java.lang.Math disagree in the last ulp), so the
checked operator uses the RATIONAL idf (N - df + 0.5)/(df + 0.5) — the
Robertson/Sparck-Jones odds WITHOUT the log. Per term this is a strictly
monotone transform of the classic weight (single-term rankings are
identical); the multi-term sum weights rare terms more steeply than
Okapi. Every input to the score is an exact integer from the stats row,
the arithmetic is a fixed left-associated expression tree mirrored in
the oracle SQL, and the emitted score is quantized at 1e-6 — bitwise
reproducible on any engine and any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_topk(df: DataFrame, terms: list[str], k: int = 20,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """Top-k documents by rational-idf BM25 over ``terms``.

    Returns (id_col, score_q6, <tf_term columns>) ordered by
    (score_q6 DESC, id tiebreak). ``score_q6`` is the BM25 score
    quantized at 1e-6.
    """
    toked = df.select(F.col(id_col).alias("doc"),
                      tokens(F.col(text_col)).alias("toks"))
    per_doc = toked.select(
        "doc", F.size("toks").alias("dl"),
        *[_tf(F.col("toks"), t).alias(f"tf_{i}")
          for i, t in enumerate(terms)])
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(terms))])
    scored = per_doc.crossJoin(F.broadcast(stats))
    # avgdl and every idf come from exact integers; the per-term score
    # and the left-associated final sum use one fixed expression tree,
    # mirrored token-for-token in the oracle SQL.
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = ((F.col("n_docs") - F.col(f"df_{i}")).cast("double") + 0.5) \
            / (F.col(f"df_{i}").cast("double") + 0.5)
        denom = tf + k1 * (1 - b + b * F.col("dl") / avgdl)
        score = score + idf * (tf * (k1 + 1)) / denom
    out = scored.select(
        F.col("doc").alias(id_col),
        F.floor(score * 1_000_000 + F.lit(0.5)).cast("long")
        .alias("score_q6"),
        *[F.col(f"tf_{i}").alias(f"tf_{t}") for i, t in enumerate(terms)])
    return (out.where(F.col("score_q6") > 0)
            .orderBy(F.desc("score_q6"), F.asc(id_col))
            .limit(k))


def bm25_oracle_sql(terms: list[str], k: int = 20,
                    k1: float = BM25_K1, b: float = BM25_B,
                    toks_sql: str = "regexp_split_to_array(trim(text), ' +')"
                    ) -> str:
    """The DuckDB mirror of :func:`bm25_topk` — generated from the same
    term list so both expression trees stay in lockstep by construction."""
    tf_cols = ", ".join(
        f"len(list_filter({toks_sql}, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms))
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{i}" for i in range(len(terms)))
    score = "0.0"
    for i in range(len(terms)):
        idf = (f"((CAST(n_docs - df_{i} AS DOUBLE) + 0.5)"
               f" / (CAST(df_{i} AS DOUBLE) + 0.5))")
        denom = (f"(CAST(tf_{i} AS DOUBLE)"
                 f" + {k1!r} * (1 - {b!r} + {b!r} * dl"
                 f" / (CAST(sum_dl AS DOUBLE) / n_docs)))")
        score = (f"({score} + {idf}"
                 f" * (CAST(tf_{i} AS DOUBLE) * ({k1!r} + 1)) / {denom})")
    out_tfs = ", ".join(f"tf_{i} AS \"tf_{t}\""
                        for i, t in enumerate(terms))
    return f"""
    WITH per_doc AS (
      SELECT doc_id AS doc, len({toks_sql}) AS dl, {tf_cols}
      FROM documents),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl, {df_cols}
      FROM per_doc)
    SELECT doc AS doc_id,
           CAST(floor({score} * 1000000 + 0.5) AS BIGINT) AS score_q6,
           {out_tfs}
    FROM per_doc, stats
    WHERE CAST(floor({score} * 1000000 + 0.5) AS BIGINT) > 0
    ORDER BY score_q6 DESC, doc_id
    LIMIT {k}
    """
