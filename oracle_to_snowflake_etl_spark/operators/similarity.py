"""Similarity search over an embedding column (array<float>).

Two paths per SURVEY.md §7.5 / BASELINE.json "similarity search":

  brute_force_topk   exact cosine top-k: broadcast the (small) query set,
                     one scan of the corpus, per-query top-k via window
                     rank — the correctness baseline.
  srp_band_pairs /   signed-random-projection LSH: 32-bit hyperplane
  embedding_near_dups codes banded 4x8 — the scale path. Candidates =
                     band-key collisions (same machinery as text
                     MinHash-LSH in operators/dedup.py), then exact
                     cosine rescoring of candidates only.

Scale design (100 TB story):
  - Brute force is O(|corpus| x |queries|) dot products but ZERO
    shuffles when queries are broadcast: the corpus scan computes all
    similarities map-side and the per-query top-k is a window over
    query_id (queries are few; each partition is small).
  - SRP-LSH shuffle volume is O(corpus x bands) band keys,
    independent of dimensionality; code computation is array HOFs over
    a *precomputed literal* hyperplane matrix inside whole-stage
    codegen — no shuffle, no UDF, no per-row hashing.
  - Hyperplanes are NOT random at runtime: plane j, dim d has a
    deterministic md5-derived weight in [-1, 1) computed once at
    plan-build time (same formula as functions/hashing.hash60), so
    results are reproducible run-to-run/engine-to-engine — and the
    DuckDB oracle embeds the *identical* literal matrix.

Determinism contract (differential testing): dot products and norms are
sequential left-folds over array order; both engines produce bitwise-
identical doubles from identical inputs. Final scores are quantized to
1e-6 (functions/hashing.quantize_sql convention) so ranking ties break
identically by id.

The reference has no vector ops (SURVEY.md §2.7 'Absent'); this module is
north-star extension surface.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# SRP-LSH geometry: 32 hyperplanes -> 32-bit code, 4 bands x 8 bits
# (256 values/band: buckets stay fine-grained enough that candidate
# generation doesn't degenerate to all-pairs).
SRP_PLANES = 32
SRP_BANDS = 4
SRP_BITS_PER_BAND = 8

#: embedding dimensionality of the driver testdata
DEFAULT_DIMS = 64

#: quantization scale for cross-engine-stable similarity scores
Q_SCALE = 1_000_000


@lru_cache(maxsize=None)
def plane_weights(planes: int = SRP_PLANES, dims: int = DEFAULT_DIMS) -> tuple:
    """Deterministic hyperplane matrix, weight[j][d] in [-1, 1):
    md5('p{j}:{d}') first 15 hex chars / 2^60 * 2 - 1 — the Python mirror
    of functions/hashing.hash60, evaluated once at plan-build time."""
    return tuple(
        tuple(
            int(hashlib.md5(f"p{j}:{d}".encode()).hexdigest()[:15], 16)
            / float(1 << 60) * 2.0 - 1.0
            for d in range(dims))
        for j in range(planes))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double — bit-deterministic.

    zip_with multiply then left-fold add, all inside codegen; the fold
    order is the array order on every engine, so the result is
    bit-identical regardless of partitioning.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))


def quantize(x: Column, scale: int = Q_SCALE) -> Column:
    """floor(x*scale + 0.5) as bigint — the cross-engine score hash
    (functions/hashing.quantize_sql mirror)."""
    return F.floor(x * scale + F.lit(0.5)).cast("long")


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k per query: broadcast-crossJoin the query set
    against the corpus, no shuffle on the corpus side; rank per query.

    Returns (query_id, neighbor_id, sim_q6) with sim quantized at 1e-6.
    Self-matches are excluded (query_id != neighbor_id).
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                quantize(cosine(F.col("q_vec"), F.col("c_vec"))).alias("sim_q6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_q6"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim_q6")
    )


def srp_code(vec: Column, planes: int = SRP_PLANES,
             dims: int = DEFAULT_DIMS) -> Column:
    """Signed-random-projection code: bit j set iff dot(vec, plane_j) > 0.

    The plane matrix is a literal in the plan (broadcast with the task
    binary at scale); per row this is planes x dims multiply-adds inside
    one codegen stage — no shuffle, no UDF, no per-row hashing.
    """
    ws = plane_weights(planes, dims)

    def bit(j: int) -> Column:
        wj = F.array(*[F.lit(w) for w in ws[j]])
        # transform's 0-based element index is the dimension number
        # (DuckDB's lambda index is 1-based — the oracle uses w[i]).
        proj = F.aggregate(
            F.transform(vec, lambda x, i: x.cast("double")
                        * F.element_at(wj, i + F.lit(1))),
            F.lit(0.0), lambda acc, v: acc + v)
        return F.when(proj > 0, F.lit(1 << j).cast("long")) \
                .otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for j in range(planes):
        out = out + bit(j)
    return out


def with_srp_code(df: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    return df.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("vec"),
                     srp_code(F.col(vec_col)).alias("code"))


def srp_band_pairs(df: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   bands: int = SRP_BANDS,
                   bits: int = SRP_BITS_PER_BAND) -> DataFrame:
    """Candidate pairs whose SRP codes collide in >= 1 band, rescored with
    exact quantized cosine. Returns (doc_a, doc_b, sim_q6).

    The band self-join is the only shuffle: O(corpus x bands) rows.
    """
    coded = with_srp_code(df, vec_col, id_col)
    mask = (1 << bits) - 1
    chunks = coded.select(
        "doc", "vec",
        F.posexplode(F.array(*[
            F.expr(f"(code >> {b * bits}) & {mask}") for b in range(bands)
        ])).alias("band", "bv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
                F.col("a.vec").alias("vec_a"), F.col("b.vec").alias("vec_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand.select(
        "doc_a", "doc_b",
        quantize(cosine(F.col("vec_a"), F.col("vec_b"))).alias("sim_q6"))


def embedding_near_dups(df: DataFrame, threshold_q6: int = 350_000,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: SRP-LSH candidates filtered
    at quantized cosine >= threshold (default 0.35 — the testdata
    embeddings are near-orthogonal, max pairwise cosine ~0.51). The
    vector-space sibling of operators/dedup.py (SURVEY.md §7.5
    'embedding-cosine near-dup')."""
    pairs = srp_band_pairs(df, vec_col, id_col)
    return pairs.where(F.col("sim_q6") >= threshold_q6)
