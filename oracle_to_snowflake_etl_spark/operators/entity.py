"""Entity resolution: blocked fuzzy matching on string keys.

The record-linkage step of a warehouse migration (same customers spelled
differently across systems) and of training-data curation (near-identical
source names/titles). All-pairs edit distance is O(n²) and never runs at
scale; the standard shape is BLOCK -> PAIR -> SCORE:

  1. BLOCK: a cheap deterministic key (prefix, phonetic code, length
     bucket) partitions candidates; only intra-block pairs are scored.
  2. PAIR: operators/util.bucket_pairs — one shuffle on the block key,
     pairs generated locally inside each block (output-bounded).
  3. SCORE: levenshtein (JVM codegen on both engines) with a distance
     cap as the join predicate.

Recall is bounded by the blocking key (a typo INSIDE the blocked prefix
escapes the block — standard ER caveat; production stacks several keys
and unions the candidates). Blocking keys must bound block size: a
q-gram or soundex key over heavy-tailed names needs a frequency cap,
exactly like ngram_jaccard_pairs' DF cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import bucket_pairs


def blocked_fuzzy_pairs(df: DataFrame, id_col: str, name_col: str,
                        block: Column, max_dist: int = 1) -> DataFrame:
    """(id_a, id_b, name_a, name_b, dist): intra-block pairs with
    levenshtein(name_a, name_b) <= max_dist, id_a < id_b."""
    src = df.select(F.col(id_col).alias("eid"),
                    F.col(name_col).alias("ename"),
                    block.alias("blk"))
    pairs = bucket_pairs(src, ["blk"], ["eid", "ename"])
    dist = F.levenshtein("ename_a", "ename_b")
    return (pairs.where(dist <= max_dist)
            .select(F.col("eid_a").alias("id_a"),
                    F.col("eid_b").alias("id_b"),
                    F.col("ename_a").alias("name_a"),
                    F.col("ename_b").alias("name_b"),
                    dist.alias("dist")))
