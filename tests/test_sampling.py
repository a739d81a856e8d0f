"""Property tests for deterministic sampling (operators/sampling.py):
the claims that make it usable for corpus construction — membership is
independent of partitioning and of what OTHER rows exist — are asserted
directly, not assumed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.operators.sampling import (
    hash_sample,
    split_assign,
    stratified_sample,
)
from oracle_to_snowflake_etl_spark.sources.readers import load_table


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_sample_is_partitioning_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = _ids(hash_sample(docs, 0.2, "doc_id"))
    b = _ids(hash_sample(docs.repartition(17, "lang"), 0.2, "doc_id"))
    c = _ids(hash_sample(docs.coalesce(1), 0.2, "doc_id"))
    assert a == b == c and a  # same rows under any layout


def test_sample_membership_survives_corpus_growth(spark, sf_dir):
    """A row's fate depends only on (key, salt): sampling half the corpus
    then the whole corpus agrees on the shared rows."""
    docs = load_table(spark, sf_dir, "documents")
    half = docs.where(F.col("doc_id") % 2 == 0)
    full_sample = _ids(hash_sample(docs, 0.3, "doc_id"))
    half_sample = _ids(hash_sample(half, 0.3, "doc_id"))
    assert half_sample == {i for i in full_sample if i % 2 == 0}


def test_different_salts_are_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = _ids(hash_sample(docs, 0.5, "doc_id", salt="s1"))
    b = _ids(hash_sample(docs, 0.5, "doc_id", salt="s2"))
    assert a != b  # astronomically unlikely to coincide if independent


def test_split_assign_partitions_every_row_once(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = split_assign(docs, "doc_id",
                       {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(docs, "doc_id", {"train": 0.5})


def test_stratified_respects_zero_default(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, {"zh": 1.0}, "lang", "doc_id")
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"zh"}
    n_zh = docs.where(F.col("lang") == "zh").count()
    assert out.count() == n_zh  # fraction 1.0 keeps every zh doc


def test_shard_assign_partitions_every_row_once(spark, sf_dir):
    """shard_assign is a partition of the corpus: every doc appears
    exactly once, shards cover [0, n), positions are dense 0..|shard|-1."""
    from oracle_to_snowflake_etl_spark.operators.sampling import shard_assign

    docs = load_table(spark, sf_dir, "documents")
    out = shard_assign(docs, "doc_id", 8).select("doc_id", "shard", "pos")
    rows = out.collect()
    assert len(rows) == docs.count()
    assert len({r.doc_id for r in rows}) == len(rows)
    assert {r.shard for r in rows} <= set(range(8))
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))


def test_shard_assign_is_partitioning_independent(spark, sf_dir):
    from oracle_to_snowflake_etl_spark.operators.sampling import shard_assign

    docs = load_table(spark, sf_dir, "documents")
    x = {(r.doc_id, r.shard, r.pos) for r in
         shard_assign(docs, "doc_id", 8).collect()}
    y = {(r.doc_id, r.shard, r.pos) for r in
         shard_assign(docs.repartition(17, "lang"), "doc_id", 8).collect()}
    assert x == y and x


def test_shard_assign_balance(spark, sf_dir):
    """Hash sharding is near-uniform: no shard exceeds 2x the ideal size
    on the 500-doc corpus (loose bound — guards gross skew only)."""
    from oracle_to_snowflake_etl_spark.operators.sampling import shard_assign

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    sizes = {r.shard: r.c for r in
             shard_assign(docs, "doc_id", 8).groupBy("shard")
             .agg(F.count("*").alias("c")).collect()}
    assert all(c <= 2 * n / 8 for c in sizes.values())


def test_write_shards_layout_and_order(spark, sf_dir, tmp_path):
    """write_shards produces shard=K dirs, one data file each, rows in
    pos order inside every file, and the union re-reads losslessly."""
    import glob

    from oracle_to_snowflake_etl_spark.operators.sampling import (
        shard_assign,
        write_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    write_shards(docs, path, "doc_id", 8)

    dirs = sorted(glob.glob(path + "/shard=*"))
    assert len(dirs) == 8
    for d in dirs:
        files = [f for f in glob.glob(d + "/*.parquet")]
        assert len(files) == 1, d
        pdf = spark.read.parquet(d).select("pos").toPandas()
        assert list(pdf["pos"]) == sorted(pdf["pos"])

    back = spark.read.parquet(path)
    expect = shard_assign(docs, "doc_id", 8)
    assert back.count() == expect.count()
    assert {(r.doc_id, r.shard, r.pos) for r in
            back.select("doc_id", "shard", "pos").collect()} == \
        {(r.doc_id, r.shard, r.pos) for r in
         expect.select("doc_id", "shard", "pos").collect()}


def test_mixture_sample_hits_target_composition(spark):
    """mixture_sample keeps the binding stratum whole and lands every
    other stratum within binomial noise of its target share; unlisted
    strata drop entirely."""
    from oracle_to_snowflake_etl_spark.operators.sampling import (
        mixture_sample,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    weights = {"en": 0.5, "zh": 0.2, "de": 0.3}
    out = mixture_sample(docs, "lang", "doc_id", weights)
    got = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) <= set(weights)  # es/fr dropped
    n_in = {r.lang: r.n for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    t_max = min(n_in[s] / w for s, w in weights.items())
    binding = min(weights, key=lambda s: n_in[s] / weights[s])
    assert got[binding] == n_in[binding]  # kept whole
    total = sum(got.values())
    for s, w in weights.items():
        # expected share w with ~sqrt noise; loose 10-point tolerance
        assert abs(got[s] / total - w) < 0.10, (s, got, t_max)


def test_leakage_free_split_contracts(spark, sf_dir):
    """The two defining properties: (1) every near-dup cluster's members
    share ONE split label — no pair can straddle train/test; (2) strict
    refinement — docs outside any cluster get exactly the label plain
    split_assign gives them."""
    from oracle_to_snowflake_etl_spark.operators.dedup import (
        dedup_clusters, minhash_lsh_pairs)
    from oracle_to_snowflake_etl_spark.operators.sampling import (
        split_assign_leakage_free)

    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(minhash_lsh_pairs(docs))
    out = split_assign_leakage_free(docs, clusters, "doc_id") \
        .select("doc_id", "split")

    labels = {r.doc_id: r.split for r in out.collect()}
    assert set(labels) == {r.doc_id for r in docs.collect()}

    cl = {r.doc: r.keep_id for r in clusters.collect()}
    assert cl, "fixture must contain near-dup clusters"
    by_rep: dict[int, set[str]] = {}
    for doc, rep in cl.items():
        by_rep.setdefault(rep, set()).add(labels[doc])
    assert all(len(s) == 1 for s in by_rep.values()), by_rep

    plain = {r.doc_id: r.split
             for r in split_assign(docs, "doc_id").select(
                 "doc_id", "split").collect()}
    unclustered = set(labels) - set(cl)
    assert unclustered
    assert all(labels[d] == plain[d] for d in unclustered)


def test_cell_sample_proportional_budget_and_stability(spark, sf_dir):
    """emb_cell_sample keeps EXACTLY ceil(frac x |cell|) rows per
    pinned-snapshot cell (the mass-ratio-preserving property Bernoulli
    lacks), and the kept set is partitioning-independent."""
    import math

    from oracle_to_snowflake_etl_spark.operators.similarity import (
        emb_cell_sample,
        ivf_cell,
    )
    from oracle_to_snowflake_etl_spark.queries.similarity_q import (
        IVF_SNAPSHOT,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    kept = emb_cell_sample(emb, 0.25, centroids=IVF_SNAPSHOT)
    per_cell = {r.cell: r.n for r in
                kept.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    totals = {r.cell: r.n for r in
              emb.select(ivf_cell(F.col("embedding"),
                                  centroids=IVF_SNAPSHOT).alias("cell"))
              .groupBy("cell").agg(F.count("*").alias("n")).collect()}
    assert per_cell  # non-degenerate
    for cell, n in totals.items():
        assert per_cell.get(cell, 0) == math.ceil(0.25 * n)
    a = {r.vec_id for r in kept.collect()}
    b = {r.vec_id for r in
         emb_cell_sample(emb.repartition(13, "label"), 0.25,
                         centroids=IVF_SNAPSHOT).collect()}
    assert a == b


def test_cell_sample_fraction_contract(spark, sf_dir):
    from oracle_to_snowflake_etl_spark.operators.similarity import (
        emb_cell_sample,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="fraction"):
        emb_cell_sample(emb, 0.0)
    with pytest.raises(ValueError, match="fraction"):
        emb_cell_sample(emb, 1.5)
