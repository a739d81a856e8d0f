"""Degenerate-input edge cases: every operator a long-running pipeline
calls unattended must behave on EMPTY inputs (first run of an
incremental job, a quiet ingest window, a filter that matches nothing)
— no crashes, no phantom rows, correct schemas. These paths never show
up in the oracle queries (testdata is never empty), so they get their
own tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _empty_like(df):
    return df.where(F.lit(False))


def test_mv_refresh_empty_delta_is_identity(spark):
    """First/quiet refresh: an empty changelog must return the view
    unchanged (same rows, same schema)."""
    from oracle_to_snowflake_etl_spark.operators.mv import (
        build_agg_view,
        incremental_agg_refresh,
    )

    orders = load_table(spark, SF, "orders")
    keys, sums = ["o_orderpriority"], {"s": "o_totalprice"}
    mv = build_agg_view(orders, keys, sums)
    empty = _empty_like(orders).withColumn("op", F.lit("I"))
    out = incremental_agg_refresh(mv, empty, keys, sums)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, mv.collect()))


def test_mv_refresh_empty_view_bootstraps_from_delta(spark):
    """Bootstrapping: refreshing an EMPTY view with an insert changelog
    equals building the view from those rows."""
    from oracle_to_snowflake_etl_spark.operators.mv import (
        build_agg_view,
        incremental_agg_refresh,
    )

    orders = load_table(spark, SF, "orders")
    keys, sums = ["o_orderpriority"], {"s": "o_totalprice"}
    mv0 = build_agg_view(_empty_like(orders), keys, sums)
    ins = orders.withColumn("op", F.lit("I"))
    out = incremental_agg_refresh(mv0, ins, keys, sums)
    expect = build_agg_view(orders, keys, sums)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, expect.collect()))


def test_shard_assign_empty(spark):
    from oracle_to_snowflake_etl_spark.operators.sampling import shard_assign

    docs = _empty_like(load_table(spark, SF, "documents"))
    out = shard_assign(docs, "doc_id", 8)
    assert out.count() == 0
    assert {"shard", "pos"} <= set(out.columns)


def test_incremental_minhash_empty_batch_and_empty_corpus(spark):
    from oracle_to_snowflake_etl_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
        with_minhash_signature,
    )

    docs = load_table(spark, SF, "documents")
    sigs = with_minhash_signature(docs)
    # empty batch vs full corpus: nothing new -> no pairs
    assert minhash_lsh_pairs_incremental(
        _empty_like(docs), sigs).count() == 0
    # full batch vs empty corpus index: pure within-batch dedup
    from oracle_to_snowflake_etl_spark.operators.dedup import minhash_lsh_pairs
    inc = minhash_lsh_pairs_incremental(
        docs, with_minhash_signature(_empty_like(docs)))
    full = minhash_lsh_pairs(docs)
    assert sorted(map(tuple, inc.collect())) == \
        sorted(map(tuple, full.collect()))


def test_cms_empty_stream(spark):
    from oracle_to_snowflake_etl_spark.operators.sketch import (
        cms_estimate,
        count_min_table,
    )

    docs = load_table(spark, SF, "documents")
    toks = _empty_like(docs).select(F.col("text").alias("tok"))
    cms = count_min_table(toks)
    assert cms.count() == 0
    # estimating against an empty sketch: every cell is absent, and
    # absent cells count 0 — so each query item gets n_est=0 (not a
    # vanished row: an empty stream genuinely contains 0 of everything)
    some = docs.limit(3).select(F.col("text").alias("tok"))
    got = cms_estimate(cms, some, "tok").collect()
    assert len(got) == 3 and all(r.n_est == 0 for r in got)


def test_dedup_clusters_empty_pairs(spark):
    from oracle_to_snowflake_etl_spark.operators.dedup import dedup_clusters

    empty_pairs = (load_table(spark, SF, "documents")
                   .select(F.col("doc_id").alias("doc_a"),
                           F.col("doc_id").alias("doc_b"))
                   .where(F.lit(False)))
    assert dedup_clusters(empty_pairs).count() == 0


def test_apply_changes_empty_changelog(spark):
    from oracle_to_snowflake_etl_spark.operators.merge import apply_changes

    orders = load_table(spark, SF, "orders") \
        .select("o_orderkey", "o_totalprice")
    empty = orders.select(
        "o_orderkey", F.lit(1).alias("seq"), F.lit("U").alias("op"),
        "o_totalprice").where(F.lit(False))
    out = apply_changes(orders, empty, ["o_orderkey"], "seq")
    assert out.count() == orders.count()


def test_choose_salt_buckets_decision_paths(spark):
    """The skew-report→salt wire (operators/skew.choose_salt_buckets):
    a uniform key must decide buckets=1 (don't pay the combine stage),
    a hot key must size the salt to the measured max/median ratio
    (capped), and salted_agg_auto must produce the exact plain-GROUP-BY
    result on BOTH branches."""
    from oracle_to_snowflake_etl_spark.operators.skew import (
        choose_salt_buckets,
        salted_agg_auto,
    )

    # uniform: 100 keys x 100 rows -> ratio 1 -> don't salt
    uni = spark.range(0, 10_000).select(
        F.col("id").alias("rid"), (F.col("id") % 100).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"))
    assert choose_salt_buckets(uni, ["k"], "rid") == 1

    # hot: one key holds 90% of rows, 100 tail keys share the rest
    # -> sampled max/p50 ratio ~ 9000/10 -> capped at max_buckets
    hot = spark.range(0, 10_000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") < 9_000, F.lit(0))
        .otherwise(1 + F.col("id") % 100).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"))
    b = choose_salt_buckets(hot, ["k"], "rid", max_buckets=64)
    assert b == 64  # ratio >> cap -> cap
    b2 = choose_salt_buckets(hot, ["k"], "rid", max_buckets=10_000)
    assert 8 <= b2 <= 2_000  # ~ sampled max/p50, uncapped

    # both branches equal the plain GROUP BY, exactly
    for df in (uni, hot):
        got = {tuple(r) for r in salted_agg_auto(
            df, ["k"], "rid", sum_cols={"v": "sv"}).collect()}
        want = {tuple(r) for r in
                df.groupBy("k").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("v").cast("decimal(28,6)"))
                    .cast("double").alias("sv")).collect()}
        assert got == want


def test_salt_null_and_empty_sample_paths(spark):
    """ADVICE r7 hardening: (a) NULL salt-column rows must neither be
    dropped from salted_join (hash60(NULL) is NULL — never equal to the
    replicated salts) nor excluded from choose_salt_buckets' sample;
    (b) a sample too small to draw any rows must fall back to a
    full-frame skew report, not silently decide "uniform"."""
    from oracle_to_snowflake_etl_spark.operators.skew import (
        choose_salt_buckets,
        salted_join,
    )

    # (a) join parity with NULL row-ids on the big side
    big = spark.range(0, 1_000).select(
        (F.col("id") % 5).alias("k"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id")).alias("rid"))
    small = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("tag"))
    got = {tuple(r) for r in
           salted_join(big, small, ["k"], "rid", buckets=4).collect()}
    want = {tuple(r) for r in big.join(small, ["k"]).collect()}
    assert got == want  # NULL-rid rows survive with a real bucket

    # (a) decision sees NULL-id rows: ALL ids NULL + one hot key ->
    # without the coalesce the sample is empty and the answer is a
    # silent 1; with it the hot key is measured
    hot_null = spark.range(0, 10_000).select(
        F.lit(None).cast("long").alias("rid"),
        F.when(F.col("id") < 9_000, F.lit(0))
        .otherwise(1 + F.col("id") % 100).alias("k"))
    assert choose_salt_buckets(hot_null, ["k"], "rid",
                               sample_fraction=1.0) > 1

    # (b) empty-sample fallback: 200 rows at 0.1% draw nothing, the
    # full-frame report still sees the 90%-hot key
    tiny_hot = spark.range(0, 200).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") < 180, F.lit(0))
        .otherwise(F.col("id")).alias("k"))
    assert choose_salt_buckets(tiny_hot, ["k"], "rid",
                               sample_fraction=0.001) > 1
    # genuinely empty frame -> 1, no crash
    assert choose_salt_buckets(tiny_hot.where("rid < 0"), ["k"], "rid",
                               sample_fraction=0.001) == 1


def test_pit_join_temp_col_collision_and_bound_guard(spark):
    """ADVICE r7: facts legitimately carrying a '_pit_us' column must
    get it back UNSHIFTED (the fixed temp name used to be silently
    overwritten and re-emitted), and attr_cols containing the validity
    bound itself must be rejected, not emitted twice."""
    import pytest as _pytest

    from oracle_to_snowflake_etl_spark.operators.scd import pit_join

    hist = spark.createDataFrame(
        [(1, 0, 1_000_000, "old"), (1, 1_000_000, None, "new")],
        "k long, valid_from_us long, valid_to_us long, status string")
    facts = spark.createDataFrame(
        [(1, "1970-01-01 00:00:00.5", 777), (1, "1970-01-01 00:00:01.5", 888)],
        "k long, ts string, _pit_us long")
    out = {(r["_pit_us"], r["status_dim"]) for r in
           pit_join(facts, hist, "k").collect()}
    # the caller's _pit_us values come back verbatim, attrs are correct
    assert out == {(777, "old"), (888, "new")}

    with _pytest.raises(ValueError, match="valid_to_us"):
        pit_join(facts.drop("_pit_us"), hist, "k",
                 attr_cols=["status", "valid_to_us"])


def test_sample_fraction_granularity_validation(spark):
    """The %1000 hash-Bernoulli samplers have 1/1000 granularity:
    int(f*1000) == 0 below 0.001 would make the sample
    DETERMINISTICALLY empty on an arbitrarily large frame — in
    choose_salt_buckets silently degrading every call to the
    full-frame fallback scan, in the dedup auto-decision silently
    forcing the window path on exactly the corpus sizes auto exists
    for. Both now reject sub-granularity fractions loudly (round-8
    ADVICE items)."""
    import pytest as _pytest

    from oracle_to_snowflake_etl_spark.operators.dedup import (
        choose_dedup_scale_path,
    )
    from oracle_to_snowflake_etl_spark.operators.skew import (
        choose_salt_buckets,
    )

    df = spark.range(0, 10).select(
        F.col("id").alias("rid"), (F.col("id") % 3).alias("k"))
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string")

    for bad in (0.0005, 0.0, -0.1, 1.5):
        with _pytest.raises(ValueError, match="sample_fraction"):
            choose_salt_buckets(df, ["k"], "rid", sample_fraction=bad)
        with _pytest.raises(ValueError, match="sample_fraction"):
            choose_dedup_scale_path(docs, sample_fraction=bad)


def test_dedup_auto_empty_sample_full_frame_fallback(spark):
    """A tiny-but-hot corpus that draws ZERO docs at the minimum
    sample fraction must still get a MEASURED decision: the dedup
    auto-path falls back to full-frame stats (mirroring
    choose_salt_buckets), so the 30%-hot-shingle fixture picks the
    partial-agg path even when the 0.1% sample is empty — and a
    genuinely empty corpus returns the window default without
    crashing."""
    from oracle_to_snowflake_etl_spark.operators.dedup import (
        choose_dedup_scale_path,
    )

    n, hot = 400, 120
    hot_df = spark.createDataFrame(
        [(i, ("hot hot hot " if i < hot else "")
          + f"a{i} b{i} c{i} d{i} e{i}") for i in range(n)],
        "doc_id long, text string")
    # 400 docs at 0.1% -> expected 0.4 sampled docs; the deterministic
    # hash draw happens to select none, exercising the fallback. Guard
    # the premise so a testdata change can't silently skip the branch.
    from oracle_to_snowflake_etl_spark.functions.hashing import hash60
    sampled = hot_df.where(
        (hash60(F.col("doc_id").cast("string"), prefix="dedupauto:")
         % 1000) < 1).count()
    assert sampled == 0, "fixture premise: the 0.1% sample is empty"
    assert choose_dedup_scale_path(hot_df, sample_fraction=0.001) is True
    assert choose_dedup_scale_path(
        hot_df.where("doc_id < 0"), sample_fraction=0.001) is False


def test_scale_safe_rejects_unknown_strings(spark):
    """scale_safe is bool | "auto"; any OTHER string used to fall
    through `if scale_safe:` and silently take the partial-agg path —
    a plan the caller didn't ask for (round-8 ADVICE). All three
    prefix-filter dedups now raise."""
    import pytest as _pytest

    from oracle_to_snowflake_etl_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_incremental,
        ngram_jaccard_pairs,
        shingled_docs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string")
    for bad in ("Auto", "window", "no"):
        with _pytest.raises(ValueError, match="scale_safe"):
            ngram_jaccard_pairs(docs, scale_safe=bad)
        with _pytest.raises(ValueError, match="scale_safe"):
            containment_pairs(docs, scale_safe=bad)
        with _pytest.raises(ValueError, match="scale_safe"):
            containment_pairs_incremental(docs, shingled_docs(docs),
                                          scale_safe=bad)
