"""Incremental corpus ingest: the composed batch-accept pipeline.

corpus_prep (operators/textstats.py) is the BOOTSTRAP shape — clean a
whole corpus once. A production training pipeline is incremental: a
new crawl/drop arrives, and the question is which of ITS documents to
accept against everything already ingested, at a cost proportional to
the batch. This module composes the engine's incremental primitives
into that accept decision:

  1. exact dedup — drop a new doc whose 60-bit content hash already
     exists in the corpus, or whose hash a smaller-id batch sibling
     claims (anti-join vs the corpus HASH INDEX — text never re-read —
     plus a per-hash min within the batch);
  2. near-dup — operators/dedup.minhash_lsh_pairs_incremental against
     the corpus SIGNATURE index; greedy drop policy: a new doc is
     dropped if it pairs with any corpus doc or a smaller-id batch doc.
     Greedy is deliberately conservative on chains (a-b-c drops b AND
     c): deterministic, single-pass, SQL-expressible — run
     dedup_clusters instead when exact one-per-component retention
     matters more than pipeline cost;
  3. quality gate — textstats.quality_q6_expr as a mid-stream filter
     (no join);
  4. shard assignment — sampling.shard_assign over the survivors, so
     the accepted batch lands loader-ready.

Every stage is O(|batch| + matches): the corpus contributes only its
hash/signature indexes (longs per doc). The whole composition is
value-checked end to end by the ingest_batch_pipeline oracle query —
the incremental sibling of corpus_prep_pipeline's bootstrap oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from .dedup import minhash_lsh_pairs_incremental, with_minhash_signature
from .sampling import shard_assign
from .textstats import quality_q6_expr


def ingest_batch(corpus: DataFrame, new_batch: DataFrame,
                 corpus_sigs: DataFrame | None = None,
                 corpus_hashes: DataFrame | None = None,
                 quality_threshold_q6: int = 400_000,
                 n_shards: int = 8,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Accept-filter a new document batch against the standing corpus;
    returns the accepted docs as (doc_id, shard, pos) — loader-ready.

    ``corpus_hashes`` / ``corpus_sigs`` are the persisted indexes
    ((hash) and (doc, sig) respectively); when omitted they are derived
    from ``corpus`` here, which is the correctness contract — at scale
    you pass the stored tables and corpus text is never touched.
    """
    nh = new_batch.select(F.col(id_col), F.col(text_col),
                          hash60(F.col(text_col)).alias("_h"))
    ch = (corpus_hashes if corpus_hashes is not None
          else corpus.select(hash60(F.col(text_col)).alias("_h")).distinct())
    no_corpus_dup = nh.join(ch, "_h", "left_anti")
    batch_min = no_corpus_dup.groupBy("_h").agg(F.min(id_col).alias(id_col))
    exact_ok = no_corpus_dup.join(batch_min, ["_h", id_col], "left_semi") \
                            .drop("_h")

    sigs = (corpus_sigs if corpus_sigs is not None
            else with_minhash_signature(corpus, text_col, id_col))
    pairs = minhash_lsh_pairs_incremental(new_batch, sigs,
                                          text_col=text_col, id_col=id_col)
    new_ids = new_batch.select(F.col(id_col))
    # drop the NEW member of every pair: doc_b when new (covers
    # new-new, where greater drops, and corpus<new), else doc_a (the
    # corpus-id-greater-than-batch-id layout)
    p_b_new = pairs.join(new_ids.withColumnRenamed(id_col, "doc_b"),
                         "doc_b", "left_semi")
    p_a_only = pairs.join(new_ids.withColumnRenamed(id_col, "doc_b"),
                          "doc_b", "left_anti")
    near_drop = (p_b_new.select(F.col("doc_b").alias(id_col))
                 .unionByName(p_a_only.select(F.col("doc_a").alias(id_col)))
                 .distinct())
    survivors = (exact_ok.join(near_drop, id_col, "left_anti")
                 .where(quality_q6_expr(F.col(text_col))
                        >= quality_threshold_q6))
    return shard_assign(survivors, id_col, n_shards) \
        .select(id_col, "shard", F.col("pos").cast("long").alias("pos"))
