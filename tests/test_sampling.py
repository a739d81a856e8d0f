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
