"""cluster_representatives: quality-aware dedup survivor selection."""
from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.operators.dedup import (
    cluster_representatives,
    dedup_clusters,
    minhash_lsh_pairs,
)
from oracle_to_snowflake_etl_spark.operators.textstats import quality_q6_expr


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keeps_highest_scoring_member_not_min_id(spark):
    # cluster {1,2,3}: doc 3 has the highest planted score; doc 9 alone
    docs = _docs(spark, [(1, "a"), (2, "b"), (3, "c"), (9, "solo")])
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc long, keep_id long")
    score = F.when(F.col("doc_id") == 3, F.lit(100)).otherwise(F.lit(1))
    surv = cluster_representatives(docs, clusters, score)
    assert {r.doc_id for r in surv.collect()} == {3, 9}


def test_tie_breaks_to_min_id(spark):
    docs = _docs(spark, [(5, "x"), (7, "x"), (6, "x")])
    clusters = spark.createDataFrame(
        [(5, 5), (6, 5), (7, 5)], "doc long, keep_id long")
    surv = cluster_representatives(docs, clusters, F.lit(1))
    assert {r.doc_id for r in surv.collect()} == {5}


def test_partition_invariant_one_survivor_per_cluster(spark, sf_dir):
    """On real data: survivors = (docs - clustered) + one per cluster,
    and every survivor is its own cluster's quality arg-max."""
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(minhash_lsh_pairs(docs))
    surv = cluster_representatives(docs, clusters,
                                   quality_q6_expr(F.col("text")))
    n_docs = docs.count()
    n_clustered = clusters.count()
    n_clusters = clusters.select("keep_id").distinct().count()
    assert surv.count() == n_docs - n_clustered + n_clusters
    # each cluster's survivor has the max quality (min id on ties)
    scored = (docs.join(clusters, docs.doc_id == clusters.doc)
              .select("doc", "keep_id",
                      quality_q6_expr(F.col("text")).alias("q")))
    best = {r.keep_id: (r.nq, r.doc) for r in
            (scored.groupBy("keep_id")
             .agg(F.min(F.struct((-F.col("q")).alias("nq"),
                                 F.col("doc").alias("doc"))).alias("w"))
             .select("keep_id", F.col("w.nq").alias("nq"),
                     F.col("w.doc").alias("doc")).collect())}
    surv_ids = {r.doc_id for r in surv.select("doc_id").collect()}
    for keep_id, (_, doc) in best.items():
        assert doc in surv_ids


def test_null_score_never_wins(spark):
    """A NULL-scored member must rank LAST, not first: without the
    coalesce, struct-min's nulls-first ordering made 'unknown quality'
    beat every known score and diverged from SQL's NULLS LAST
    (ADVICE r8)."""
    docs = _docs(spark, [(1, "a"), (2, "b"), (3, "c")])
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc long, keep_id long")
    # doc 1 (the min id) scores NULL; doc 3 has the best real score
    score = (F.when(F.col("doc_id") == 3, F.lit(100))
             .when(F.col("doc_id") == 2, F.lit(1)))
    surv = cluster_representatives(docs, clusters, score)
    assert {r.doc_id for r in surv.collect()} == {3}
    # all-NULL cluster: falls back to the min-id keeper via the tiebreak
    surv2 = cluster_representatives(docs, clusters, F.lit(None))
    assert {r.doc_id for r in surv2.collect()} == {1}


def test_empty_clusters_identity(spark):
    docs = _docs(spark, [(1, "a"), (2, "b")])
    clusters = spark.createDataFrame([], "doc long, keep_id long")
    surv = cluster_representatives(docs, clusters, F.lit(1))
    assert {r.doc_id for r in surv.collect()} == {1, 2}


def test_one_call_drivers_match_hand_wired(spark, sf_dir):
    """ngram_jaccard_dedup / containment_dedup (VERDICT r8 #7) must
    equal the hand-wired pairs -> dedup_clusters ->
    cluster_representatives (or min-id drop) dance exactly, for both
    keep policies."""
    from oracle_to_snowflake_etl_spark.operators.dedup import (
        containment_dedup,
        containment_pairs,
        ngram_jaccard_dedup,
        ngram_jaccard_pairs,
    )
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    q = quality_q6_expr(F.col("text"))
    for one_call, pairs_fn in ((ngram_jaccard_dedup, ngram_jaccard_pairs),
                               (containment_dedup, containment_pairs)):
        clusters = dedup_clusters(pairs_fn(docs))
        want_best = {r.doc_id for r in cluster_representatives(
            docs, clusters, q).select("doc_id").collect()}
        got_best = {r.doc_id for r in one_call(
            docs, keep="best", score=q).select("doc_id").collect()}
        assert got_best == want_best, one_call.__name__
        want_first = {r.doc_id for r in docs.join(
            clusters.where(F.col("doc") != F.col("keep_id"))
            .select(F.col("doc").alias("doc_id")),
            "doc_id", "left_anti").select("doc_id").collect()}
        got_first = {r.doc_id for r in one_call(
            docs).select("doc_id").collect()}
        assert got_first == want_first, one_call.__name__


def test_semantic_keep_best_one_survivor_per_component(spark, sf_dir):
    """semantic_dedup(keep='best'): exactly one survivor per same-cell
    near-dup component, and it is the score arg-max; keep='first'
    (default) keeps the documented local lower-id-neighbor semantics
    unchanged."""
    from oracle_to_snowflake_etl_spark.operators.similarity import (
        semantic_dedup,
    )
    from oracle_to_snowflake_etl_spark.operators.similarity_snapshot import (
        IVF_SNAPSHOT,
        IVF_SNAPSHOT_CELLS,
    )
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    import pytest

    embs = load_table(spark, sf_dir, "embeddings")
    # score favoring the HIGHEST id — the exact opposite of min-id, so
    # any cluster >1 distinguishes the policies
    surv_best = semantic_dedup(embs, threshold_q6=200_000,
                               cells=IVF_SNAPSHOT_CELLS,
                               centroids=IVF_SNAPSHOT, keep="best",
                               score=F.col("vec_id"))
    surv_first = semantic_dedup(embs, threshold_q6=200_000,
                                cells=IVF_SNAPSHOT_CELLS,
                                centroids=IVF_SNAPSHOT)
    n_best, n_first = surv_best.count(), surv_first.count()
    n = embs.count()
    assert n_best <= n_first <= n  # CC merges at least as much
    if n_best < n:  # clusters exist: max-id wins somewhere min-id can't
        best_ids = {r.vec_id for r in surv_best.select("vec_id").collect()}
        first_ids = {r.vec_id for r in surv_first.select("vec_id").collect()}
        assert best_ids != first_ids
    with pytest.raises(ValueError, match="keep"):
        semantic_dedup(embs, keep="best")  # score missing
    with pytest.raises(ValueError, match="score"):
        semantic_dedup(embs, score=F.lit(1))  # keep='first' + score


def test_semantic_multiprobe_supersets_drops(spark, sf_dir):
    """semantic_dedup(nprobe=2): the pair space is a strict superset of
    single-assign (every same-argmax-cell pair also shares probe cell
    #1), so survivors(nprobe=2) ⊆ survivors(nprobe=1); and the planted
    cos-0.95 twin recall must strictly improve (the measured buy-back,
    SCALE.md round-9 table)."""
    from oracle_to_snowflake_etl_spark.operators.similarity import (
        plant_near_dup_twins,
        semantic_dedup,
        semantic_pair_recall,
    )
    from oracle_to_snowflake_etl_spark.operators.similarity_snapshot import (
        IVF_SNAPSHOT,
        IVF_SNAPSHOT_CELLS,
    )
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    s1 = {r.vec_id for r in semantic_dedup(
        embs, threshold_q6=200_000, cells=IVF_SNAPSHOT_CELLS,
        centroids=IVF_SNAPSHOT, nprobe=1).select("vec_id").collect()}
    s2 = {r.vec_id for r in semantic_dedup(
        embs, threshold_q6=200_000, cells=IVF_SNAPSHOT_CELLS,
        centroids=IVF_SNAPSHOT, nprobe=2).select("vec_id").collect()}
    assert s2 <= s1
    planted = plant_near_dup_twins(embs)
    r1 = semantic_pair_recall(planted, threshold_q6=350_000, cells=64,
                              nprobe=1)
    r2 = semantic_pair_recall(planted, threshold_q6=350_000, cells=64,
                              nprobe=2)
    assert r2 > r1


def test_clusters_driver_and_distributed_paths_agree(spark):
    """The size-gated union-find path (round 11) must return exactly
    the distributed min-label loop's (doc, keep_id) set — pinned on a
    graph with a long chain (the loop's worst O(diameter) case), a
    separate triangle, and an isolated pair."""
    from oracle_to_snowflake_etl_spark.operators.dedup import (
        dedup_clusters,
    )

    chain = [(i, i + 1) for i in range(10, 25)]          # 15-edge chain
    tri = [(100, 101), (101, 102), (100, 102)]
    pairs = spark.createDataFrame(
        chain + tri + [(7, 3)], "doc_a long, doc_b long")
    fast = {(r.doc, r.keep_id) for r in dedup_clusters(pairs).collect()}
    slow = {(r.doc, r.keep_id) for r in
            dedup_clusters(pairs, driver_max_edges=0).collect()}
    assert fast == slow
    assert (24, 10) in fast and (102, 100) in fast and (7, 3) in fast


def test_clusters_string_ids_both_paths(spark):
    """Non-long doc ids (string content hashes are a legal id space)
    must survive BOTH component paths with the input dtype preserved —
    the union-find path derives its output schema from the pairs frame
    instead of hardcoding long (ADVICE r11), and min-root union is
    lexicographic exactly like the loop's F.least."""
    from oracle_to_snowflake_etl_spark.operators.dedup import (
        dedup_clusters,
    )

    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")],
        "doc_a string, doc_b string")
    fast_df = dedup_clusters(pairs)
    assert [f.dataType.simpleString() for f in fast_df.schema.fields] \
        == ["string", "string"]
    fast = {(r.doc, r.keep_id) for r in fast_df.collect()}
    slow = {(r.doc, r.keep_id) for r in
            dedup_clusters(pairs, driver_max_edges=0).collect()}
    assert fast == slow
    assert ("d", "b") in fast and ("y", "x") in fast
