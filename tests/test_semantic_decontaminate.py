"""Embedding-space eval decontamination (operators/similarity.py
semantic_decontaminate / semantic_contamination_report): planted-leak
effectiveness (exact recall — no cell-boundary excuse), empty-eval
identity, the drop/report exact partition, and the broadcast-cap guard.
The registry mirrors (decontaminate_semantic[_report] vs their DuckDB
oracles) are covered by test_differential.py.

All deterministic: the 'leaked' eval docs are exact scaled copies of
train vectors (cosine == 1 bitwise), the clean corpus's max pairwise
cosine is ~0.51 << the 0.90 threshold.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.operators.similarity import (
    semantic_contamination_report,
    semantic_decontaminate,
)
from oracle_to_snowflake_etl_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"
LEAK_Q6 = 900_000  # corpus max pairwise cos ~0.51; planted leaks are 1.0
N_LEAK = 6  # vec_id % 97 == 3 members of the ~600-row sf0.001 corpus


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def leaky_eval(emb):
    """Eval suite = N_LEAK scaled copies of train vectors (cos == 1
    against their originals, bitwise: scaling by 2 is exact in
    float32/64) plus the train rows they leak from, identified by id."""
    return (emb.where(F.col("vec_id") % 97 == 3).limit(N_LEAK)
            .select(F.col("vec_id").alias("leak_src"),
                    F.transform("embedding",
                                lambda x: x * F.lit(2.0)).alias("embedding")))


def test_planted_leaks_all_dropped_exact_recall(spark, emb, leaky_eval):
    """Every train row whose exact copy sits in the eval suite is
    dropped — recall 1.0 by construction (broadcast compare is
    exhaustive; contrast semantic_dedup's documented cross-cell miss)
    — and nothing else is (clean cos ~0.51 << 0.90)."""
    leak_ids = {r["leak_src"] for r in leaky_eval.select("leak_src").collect()}
    assert len(leak_ids) == N_LEAK
    survivors = semantic_decontaminate(emb, leaky_eval,
                                       threshold_q6=LEAK_Q6)
    kept = {r["vec_id"] for r in survivors.select("vec_id").collect()}
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert kept == all_ids - leak_ids


def test_report_partitions_train_exactly(spark, emb, leaky_eval):
    """survivors ∪ report ids == train ids, disjoint; report scores sit
    at the planted cos==1 point (q6 == 1_000_000)."""
    survivors = semantic_decontaminate(emb, leaky_eval, threshold_q6=LEAK_Q6)
    report = semantic_contamination_report(emb, leaky_eval,
                                           threshold_q6=LEAK_Q6)
    rep = report.collect()
    kept = {r["vec_id"] for r in survivors.select("vec_id").collect()}
    flagged = {r["vec_id"] for r in rep}
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert kept | flagged == all_ids
    assert not (kept & flagged)
    assert all(r["max_sim_q6"] == 1_000_000 for r in rep)


def test_empty_eval_is_identity(spark, emb):
    empty = emb.where(F.lit(False))
    assert semantic_decontaminate(emb, empty).exceptAll(emb).count() == 0
    assert emb.exceptAll(semantic_decontaminate(emb, empty)).count() == 0
    rep = semantic_contamination_report(emb, empty)
    assert rep.count() == 0
    assert rep.columns == ["vec_id", "max_sim_q6"]


def test_eval_cap_raises(spark, emb):
    with pytest.raises(ValueError, match="max_eval_rows"):
        semantic_decontaminate(emb, emb, max_eval_rows=5)
