"""Structured Streaming facade tests (SURVEY.md §7.4): the J1
incremental pattern as an AvailableNow stream (idempotent across runs,
dedup within and across batches), the watermarked window agg equals its
batch twin, and the custom stateful operator counts correctly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.datagen import ads_data
from oracle_to_snowflake_etl_spark.schemas import ADS_DATA, ADS_KEY_COLS
from oracle_to_snowflake_etl_spark.sources.readers import load_table
from oracle_to_snowflake_etl_spark.streaming.jobs import (
    incremental_append_stream,
    read_ads_stream,
    user_running_stats,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    tgt = tmp_path / "tgt"
    ckp = tmp_path / "ckp"
    src.mkdir()
    return str(src), str(tgt), str(ckp)


def _run_stream(spark, src, tgt, ckp):
    q = incremental_append_stream(read_ads_stream(spark, src), tgt, ckp)
    q.awaitTermination(120)
    return spark.read.schema(ADS_DATA).parquet(tgt)


def test_incremental_stream_dedups_and_is_idempotent(spark, dirs):
    src, tgt, ckp = dirs
    data = ads_data(spark, num_campaigns=2, edge_rows=False)
    half = data.where(F.col("campaign_id") == 1)

    # batch 1: first campaign
    half.write.mode("append").parquet(src)
    out1 = _run_stream(spark, src, tgt, ckp)
    assert out1.count() == half.count()

    # batch 2: FULL data (overlaps batch 1) + a duplicated file of it ->
    # within-batch dedup + cross-run anti-join must both kick in
    data.write.mode("append").parquet(src)
    data.write.mode("append").parquet(src)
    out2 = _run_stream(spark, src, tgt, ckp)
    assert out2.count() == data.count()
    assert out2.select(*ADS_KEY_COLS).distinct().count() == data.count()

    # run 3 with nothing new: no growth
    out3 = _run_stream(spark, src, tgt, ckp)
    assert out3.count() == data.count()


def test_windowed_counts_match_batch(spark, tmp_path):
    """Stream (AvailableNow over the events parquet) == batch groupBy —
    the strongest equivalence check available without a live source."""
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "ev")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream, window="5 minutes")
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("win_counts")

    expected = (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )
    diff = got.select("w_start", "event_type", "n").exceptAll(expected)
    assert diff.count() == 0
    assert got.count() == expected.count()


def test_user_running_stats_state(spark, tmp_path):
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "ev2")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    out = user_running_stats(stream)
    q = (out.writeStream.format("memory").queryName("user_stats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # final state per user (last update wins) must equal the batch count
    got = (spark.table("user_stats")
           .groupBy("user_id").agg(F.max("n_events").alias("n_events")))
    expected = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data semantics, end to end: a row older than the watermark
    arriving after its window was EVICTED must be dropped, not
    re-aggregated (append mode would otherwise emit the same window
    twice). Three files processed as ordered micro-batches
    (maxFilesPerTrigger=1, mtimes forced): seed the window; advance the
    watermark past its end so it finalizes and emits; then send a late
    row into the dead window. A watermark is a *bound*, not an eager
    filter — late data arriving while state is still live MAY still
    count (observed), so the drop is only guaranteed one batch after
    eviction; that is the case this pins down."""
    import os
    import time as _t
    from datetime import datetime

    from pyspark.sql import types as T

    src = tmp_path / "late_src"
    src.mkdir()
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])

    def mk(rows):
        return spark.createDataFrame(
            [(r, "click", 1.0) for r in rows], schema)

    t = lambda m: datetime(2024, 1, 1, 10, m)  # noqa: E731
    batches = {
        # two rows in [10:00,10:05) + a 10:30 row -> watermark 10:20
        "b1": [t(0), t(4), t(30)],
        # next batch runs AT watermark 10:20 -> the 10:00 window (end
        # 10:05) is evicted and emitted with n=2
        "b2": [t(31)],
        # late row at 10:02 targets the dead window -> dropped by the
        # watermark (numRowsDroppedByWatermark) instead of resurrecting it
        "b3": [t(2), t(32)],
    }
    now = _t.time()
    for i, (d, rows) in enumerate(batches.items()):
        mk(rows).coalesce(1).write.mode("append").parquet(str(src / d))
        for f in os.listdir(src / d):
            os.utime(src / d / f, (now + i * 10, now + i * 10))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("pathGlobFilter", "*.parquet")
              .parquet(str(src / "*")))
    agg = windowed_event_counts(stream)
    q = (agg.writeStream.format("memory").queryName("late_demo")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    dropped = sum(
        s["numRowsDroppedByWatermark"]
        for p in q.recentProgress for s in p["stateOperators"])
    got = sorted((r.w_start.minute, r.n)
                 for r in spark.table("late_demo").collect())
    # exactly one emission of the sealed window, without the late row,
    # and the late row is accounted as dropped — not silently lost
    assert got == [(0, 2)], got
    assert dropped == 1, dropped


def test_drop_duplicates_within_watermark_bounds_state(spark, tmp_path):
    """The production-bounded form of streaming dedup: duplicates within
    the watermark horizon are suppressed, and keys older than the
    watermark are EVICTED from state — a duplicate arriving after
    eviction is treated as new (the documented trade vs the unbounded
    dropDuplicates in distinct_event_pairs). This pins the semantics and
    confirms state actually shrinks."""
    import os
    import time as _t
    from datetime import datetime

    from pyspark.sql import types as T

    src = tmp_path / "dd_src"
    src.mkdir()
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])

    t = lambda m: datetime(2024, 1, 1, 10, m)  # noqa: E731
    batches = {
        # key 1 twice inside one batch -> in-horizon dup suppressed
        "b1": [(1, t(0)), (1, t(1)), (2, t(2))],
        # advance the watermark far past key 1's expiry (ts + 10 min
        # delay). Eviction is lazy — expired keys leave the map at the
        # END of the batch that runs under the advanced watermark — so
        # b3 is the batch where key 1's state actually goes away...
        "b2": [(3, t(40))],
        "b3": [(4, t(42))],
        # ...and only now is a key-1 duplicate treated as NEW output
        "b4": [(1, t(43))],
    }
    now = _t.time()
    for i, (d, rows) in enumerate(batches.items()):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(str(src / d))
        for f in os.listdir(src / d):
            os.utime(src / d / f, (now + i * 10, now + i * 10))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("pathGlobFilter", "*.parquet")
              .parquet(str(src / "*")))
    dedup = (stream.withWatermark("ts", "10 minutes")
             .dropDuplicatesWithinWatermark(["k"]))
    q = (dedup.writeStream.format("memory").queryName("dd_demo")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r.k, r.ts.minute)
                 for r in spark.table("dd_demo").collect())
    # key 1 emitted TWICE: once at 10:00 (dup at 10:01 suppressed), and
    # again at 10:43 after its state aged out past the watermark
    assert got == [(1, 0), (1, 43), (2, 2), (3, 40), (4, 42)], got
    final_state = q.recentProgress[-1]["stateOperators"][0]["numRowsTotal"]
    # state must NOT hold all six input keys' rows — eviction happened
    assert final_state <= 3, final_state


def test_user_running_stats_tws_matches_batch(spark, tmp_path):
    """transformWithStateInPandas twin of user_running_stats must equal
    the batch aggregate. Skipped where protobuf (the API's state
    protocol dependency) is not installed — the applyInPandasWithState
    twin covers the arbitrary-state contract there."""
    import pytest as _pytest

    _pytest.importorskip("google.protobuf")
    from oracle_to_snowflake_etl_spark.streaming.jobs import (
        ROCKSDB_PROVIDER_CONFS,
        drain_to_memory,
        read_events_stream,
        user_running_stats_tws,
    )

    stream = read_events_stream(spark, SF)
    got = drain_to_memory(user_running_stats_tws(stream), "tws_stats",
                          output_mode="update",
                          extra_confs=ROCKSDB_PROVIDER_CONFS)
    batch = (load_table(spark, SF, "events").groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.max(F.unix_micros("ts")).alias("last_seen_us")))
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_stream_left_outer_emits_after_eviction(spark, tmp_path):
    """LEFT OUTER stream-stream join semantics, end to end: a matched
    pair emits as soon as both sides arrive; an UNMATCHED left row can
    only emit (with NULL right side) after the watermark passes its
    join horizon — the engine must prove no future match is possible.
    Ordered micro-batches (maxFilesPerTrigger=1) drive the watermark."""
    import os
    import time as _t
    from datetime import datetime

    from pyspark.sql import types as T

    src = tmp_path / "sj_src"
    src.mkdir()
    schema = T.StructType([
        T.StructField("side", T.StringType()),
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    t = lambda m: datetime(2024, 1, 1, 10, m)  # noqa: E731
    batches = {
        # left key 1 (will match) + left key 2 (never matches)
        "b1": [("l", 1, t(0)), ("l", 2, t(1))],
        # right for key 1 inside the 10-min horizon -> inner emission
        "b2": [("r", 1, t(5))],
        # watermark pushers on BOTH sides: the join's global watermark is
        # the MIN of the two sides', so each side needs far-future rows
        # to advance it past key 2's horizon end (10:01 + 10 min range
        # + 10 min delay); pusher keys are disjoint so they never match
        "b3": [("l", 9, t(50)), ("r", 7, t(50))],
        "b4": [("l", 8, t(55)), ("r", 6, t(55))],
    }
    now = _t.time()
    for i, (d, rows) in enumerate(batches.items()):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(str(src / d))
        for f in os.listdir(src / d):
            os.utime(src / d / f, (now + i * 10, now + i * 10))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("pathGlobFilter", "*.parquet")
              .parquet(str(src / "*")))
    left = (stream.where("side = 'l'")
            .select(F.col("k").alias("lk"), F.col("ts").alias("lts"))
            .withWatermark("lts", "10 minutes"))
    right = (stream.where("side = 'r'")
             .select(F.col("k").alias("rk"), F.col("ts").alias("rts"))
             .withWatermark("rts", "10 minutes"))
    joined = left.join(
        right,
        F.expr("lk = rk AND rts >= lts AND rts <= lts + INTERVAL 10 MINUTES"),
        "left_outer")
    q = (joined.writeStream.format("memory").queryName("sj_outer")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.lk, r.rk) for r in spark.table("sj_outer").collect()}
    # key 1 matched; key 2 emitted with NULL right only after eviction
    assert (1, 1) in got, got
    assert (2, None) in got, got


def test_stream_mv_maintenance_matches_batch(spark, tmp_path):
    """foreachBatch MV maintenance: after draining an insert stream in
    several micro-batches, the parquet view equals a from-scratch batch
    aggregate of everything ingested — and a re-run with no new data
    changes nothing (replay/no-op safety via the _APPLIED_BATCH
    marker)."""
    from oracle_to_snowflake_etl_spark.operators.mv import build_agg_view
    from oracle_to_snowflake_etl_spark.streaming.jobs import (
        maintain_agg_view_stream,
    )

    src = tmp_path / "mv_src"
    tgt = str(tmp_path / "mv_tgt")
    ckp = str(tmp_path / "mv_ckp")
    src.mkdir()

    schema = "k string, v double"
    rows1 = [("a", 1.0), ("a", 2.0), ("b", 10.0)]
    rows2 = [("a", 4.0), ("c", 7.0)]
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))

    def run():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        q = maintain_agg_view_stream(stream, tgt, ckp, ["k"], {"s": "v"})
        q.awaitTermination(120)

    run()
    all_rows = spark.createDataFrame(rows1, schema)
    expect1 = {tuple(r) for r in
               build_agg_view(all_rows, ["k"], {"s": "v"}).collect()}
    assert {tuple(r) for r in spark.read.parquet(tgt).collect()} == expect1

    # second file arrives -> folded incrementally (separate batch)
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    run()
    all_rows = spark.createDataFrame(rows1 + rows2, schema)
    expect2 = {tuple(r) for r in
               build_agg_view(all_rows, ["k"], {"s": "v"}).collect()}
    assert {tuple(r) for r in spark.read.parquet(tgt).collect()} == expect2

    # drain again with nothing new: view unchanged
    run()
    assert {tuple(r) for r in spark.read.parquet(tgt).collect()} == expect2


def test_stream_mv_replay_skips_committed_batch(spark, tmp_path):
    """Direct replay-guard check: invoking the fold with an already-
    applied batch id must be a no-op (at-least-once foreachBatch +
    additive fold would otherwise double-count)."""
    from oracle_to_snowflake_etl_spark.streaming.jobs import (
        maintain_agg_view_stream,
    )

    src = tmp_path / "rp_src"
    tgt = str(tmp_path / "rp_tgt")
    ckp = str(tmp_path / "rp_ckp")
    src.mkdir()
    schema = "k string, v double"
    spark.createDataFrame([("a", 1.0)], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = maintain_agg_view_stream(stream, tgt, ckp, ["k"], {"s": "v"})
    q.awaitTermination(120)
    before = {tuple(r) for r in spark.read.parquet(tgt).collect()}

    # simulate the at-least-once replay: re-run batch id 0 by hand
    # through a fresh query on the same target with a FRESH checkpoint
    # (forces the source to re-deliver everything as batch 0)
    ckp2 = str(tmp_path / "rp_ckp2")
    stream2 = spark.readStream.schema(schema).parquet(str(src))
    q2 = maintain_agg_view_stream(stream2, tgt, ckp2, ["k"], {"s": "v"})
    q2.awaitTermination(120)
    after = {tuple(r) for r in spark.read.parquet(tgt).collect()}
    assert after == before


def test_streaming_ingest_loop_self_maintaining_index(spark, tmp_path):
    """The full streaming corpus-ingest loop: three document drops pass
    through foreachBatch ingest; later batches dedup against what
    EARLIER batches accepted (exact + near-dup via the accumulated
    hash/signature indexes), and a no-new-data re-run changes nothing."""
    import os
    import time as _t

    from oracle_to_snowflake_etl_spark.streaming.jobs import (
        ingest_documents_stream,
    )

    base = ("the quick brown fox jumps over the lazy dog and then "
            "it runs far away to the old stone house near the river")
    texts = {
        0: base,
        1: "a completely different story about the sea and the tall "
           "ships that sail upon it every day with the wind behind them",
        2: "in the city the people walk along the wide streets and "
           "the lights of the shops shine on them through the evening",
        3: base,                                  # exact dup of 0
        4: base.replace("river", "meadow"),       # near-dup of 0
        5: "counting numbers one two three four five six seven eight "
           "nine ten and the sum of them all is a fine round number",
        6: "counting numbers one two three four five six seven eight "
           "nine ten and the sum of them all is a fine round total",
        7: "yet another tale where the mountain stands alone in the "
           "north and the snow falls on it through the long winter",
    }
    drops = [(0, 1, 2), (3, 4, 5), (6, 7)]
    src = tmp_path / "ing_src"
    src.mkdir()
    acc = str(tmp_path / "ing_acc")
    idx = str(tmp_path / "ing_idx")
    ckp = str(tmp_path / "ing_ckp")
    now = _t.time()
    seen: set = set()
    for i, ids in enumerate(drops):
        rows = [(d, texts[d]) for d in ids]
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(str(src))
        # pin THIS drop's new file to a strictly increasing mtime so
        # maxFilesPerTrigger=1 delivers drops in order
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in seen:
                os.utime(src / f, (now + i * 10, now + i * 10))
                seen.add(f)

    def run():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        q = ingest_documents_stream(stream, acc, idx, ckp)
        q.awaitTermination(180)

    run()
    accepted = {r.doc_id for r in
                spark.read.parquet(acc).select("doc_id").collect()}
    # 3 exact-dups accepted 0; 4 near-dups it; 6 near-dups 5 (accepted
    # one batch earlier) — the index carried that knowledge forward
    assert accepted == {0, 1, 2, 5, 7}, accepted
    sig_docs = {r.doc for r in
                spark.read.parquet(f"{idx}/sigs").select("doc").collect()}
    assert sig_docs == accepted

    run()  # no new files: nothing changes
    accepted2 = {r.doc_id for r in
                 spark.read.parquet(acc).select("doc_id").collect()}
    assert accepted2 == accepted


def test_static_dim_cache_loads_once_across_batches(spark, tmp_path):
    """StaticDimCache + enrich_with_static_foreach: the dimension's
    full plan runs ONCE for the whole stream (loads == 1 across
    multiple micro-batches) with no cadence, and exactly once per
    batch at refresh_every_batches=1 — the measured x7/decade
    static-reload slope reduced to a cadence choice. Results must
    equal the batch join either way."""
    from oracle_to_snowflake_etl_spark.streaming.jobs import (
        StaticDimCache,
        enrich_with_static_foreach,
    )

    events = load_table(spark, SF, "events") \
        .select("event_id", "user_id", "event_type")
    src = str(tmp_path / "enr_src")
    # two files + maxFilesPerTrigger=1 -> two micro-batches
    events.where("event_id % 2 = 0").coalesce(1).write.parquet(src)
    events.where("event_id % 2 = 1").coalesce(1).write.mode("append") \
        .parquet(src)

    dim = (events.groupBy("user_id")
           .agg((F.count(F.lit(1)) / 10).cast("long").alias("tier")))
    expected = events.join(dim, "user_id") \
        .select("event_id", "user_id", "event_type", "tier")

    got = []

    def sink(df, batch_id):
        got.append(df.select("event_id", "user_id", "event_type",
                             "tier").collect())

    for every, want_loads in ((None, 1), (1, 2)):
        cache = StaticDimCache(lambda: dim, refresh_every_batches=every)
        got.clear()
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = enrich_with_static_foreach(stream, cache, "user_id", sink)
        q.awaitTermination(120)
        assert len(got) == 2, "fixture premise: two micro-batches"
        assert cache.loads == want_loads
        rows = {tuple(r) for b in got for r in b}
        assert rows == {tuple(r) for r in expected.collect()}
        cache.close()


def test_static_dim_cache_refresh_picks_up_changes(spark):
    """refresh() swaps the snapshot (new loads, old unpersisted);
    get() without cadence keeps returning the pinned one."""
    from oracle_to_snowflake_etl_spark.streaming.jobs import StaticDimCache

    state = {"v": 1}
    cache = StaticDimCache(
        lambda: spark.createDataFrame([(1, state["v"])], "k long, v long"))
    assert cache.get(0).collect()[0]["v"] == 1
    state["v"] = 2
    assert cache.get(5).collect()[0]["v"] == 1  # pinned, no cadence
    assert cache.refresh().collect()[0]["v"] == 2
    assert cache.loads == 2
    cache.close()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="refresh_every_batches"):
        StaticDimCache(lambda: None, refresh_every_batches=0)


def test_streaming_embedding_ingest_prunes_by_stored_probe_cells(
        spark, tmp_path):
    """ingest_embeddings_stream with hand-built one-hot centroids:
    near-dups of earlier-SEEN vectors are rejected across drops, batch
    siblings dedup by min-id, the stored index carries each row's
    probe-cell array (the round-11 pruning column), and a no-new-data
    re-run changes nothing."""
    import os
    import time as _t

    from oracle_to_snowflake_etl_spark.streaming.jobs import (
        ingest_embeddings_stream,
    )

    # 4 one-hot centroids in R^4: assignment is unambiguous, twins
    # (0.9 ei + 0.1 ej) stay in cell i with cos ~0.994 to ei and
    # ~0.11 to ej (below the 0.35 operating point)
    cents = tuple(tuple(1.0 if i == j else 0.0 for j in range(4))
                  for i in range(4))
    e = [[1.0 if i == j else 0.0 for j in range(4)] for i in range(4)]

    def twin(i, j):
        return [0.9 * a + 0.1 * b for a, b in zip(e[i], e[j])]

    vecs = {0: e[0], 1: e[1],
            2: twin(0, 1), 3: e[2],            # 2 near-dups seen 0
            4: twin(1, 0), 5: e[3], 6: twin(3, 2)}  # 4 dups 1; 6 dups 5
    drops = [(0, 1), (2, 3), (4, 5, 6)]
    src = tmp_path / "emb_src"
    src.mkdir()
    acc = str(tmp_path / "emb_acc")
    idx = str(tmp_path / "emb_idx")
    ckp = str(tmp_path / "emb_ckp")
    now = _t.time()
    seen: set = set()
    for i, ids in enumerate(drops):
        rows = [(v, vecs[v]) for v in ids]
        spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
            .coalesce(1).write.mode("append").parquet(str(src))
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in seen:
                os.utime(src / f, (now + i * 10, now + i * 10))
                seen.add(f)

    def run():
        stream = (spark.readStream
                  .schema("vec_id long, embedding array<float>")
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        q = ingest_embeddings_stream(stream, acc, idx, ckp,
                                     centroids=cents, cells=4)
        q.awaitTermination(180)

    run()
    kept = spark.read.parquet(acc)
    accepted = {r.vec_id for r in kept.select("vec_id").collect()}
    assert accepted == {0, 1, 3, 5}, accepted
    # index = every SEEN row, each with its probe-cell pruning array
    index = spark.read.parquet(idx)
    assert {r.vec_id for r in index.select("vec_id").collect()} == set(vecs)
    assert all(r._cells for r in index.select("_cells").collect())

    run()  # no new files: nothing changes, no double-append
    kept2 = spark.read.parquet(acc)
    assert {r.vec_id for r in kept2.select("vec_id").collect()} == accepted
    assert kept2.count() == kept.count()


def test_maintain_ann_index_stream_serves_and_replays(spark, tmp_path):
    """maintain_ann_index_stream: embedding drops folded through the
    foreachBatch loop build a batch=/cell= store that the probed scan
    (ann_ivf_int8_topk index_path form) serves EXACTLY like the
    in-memory form over the full corpus; a no-new-data re-run changes
    nothing (overwrite-subdirectory exactly-once); resuming with a
    foreign centroid matrix raises on the _meta md5."""
    import os
    import time as _t

    import pytest as _pt
    from pyspark.sql import functions as F

    from oracle_to_snowflake_etl_spark.operators.similarity import (
        ann_ivf_int8_topk,
        ivf_train_centroids,
    )
    from oracle_to_snowflake_etl_spark.sources.readers import load_table
    from oracle_to_snowflake_etl_spark.streaming.jobs import (
        maintain_ann_index_stream,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = ivf_train_centroids(emb, cells=8)
    src = tmp_path / "ann_src"
    src.mkdir()
    now = _t.time()
    seen: set = set()
    for i, half in enumerate((emb.where(F.col("vec_id") % 2 == 0),
                              emb.where(F.col("vec_id") % 2 == 1))):
        half.coalesce(1).write.mode("append").parquet(str(src))
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in seen:
                os.utime(src / f, (now + i * 10, now + i * 10))
                seen.add(f)
    idx = str(tmp_path / "ann_idx")
    ckp = str(tmp_path / "ann_ckp")
    schema = spark.read.parquet(str(src)).schema

    def run(centroids=cents, checkpoint=ckp):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        q = maintain_ann_index_stream(stream, idx, checkpoint, centroids)
        q.awaitTermination(180)

    run()
    assert os.path.isdir(os.path.join(idx, "_centroids"))
    assert os.path.isdir(os.path.join(idx, "_meta"))

    q5 = emb.where(F.col("vec_id") < 5)
    mem = {tuple(r) for r in
           ann_ivf_int8_topk(emb, q5, k=10, centroids=cents).collect()}
    idx_res = {tuple(r) for r in ann_ivf_int8_topk(
        emb, q5, k=10, centroids=cents, index_path=idx).collect()}
    assert idx_res == mem and len(idx_res) == 5 * 10

    run()  # replay with no new data: nothing changes
    idx_res2 = {tuple(r) for r in ann_ivf_int8_topk(
        emb, q5, k=10, centroids=cents, index_path=idx).collect()}
    assert idx_res2 == idx_res

    foreign = tuple(tuple(x + 0.25 for x in row) for row in cents)
    with _pt.raises(Exception, match="centroid md5|version a new"):
        run(centroids=foreign, checkpoint=str(tmp_path / "ann_ckp2"))

    # compacting or batch-appending into a LIVE streamed store breaks
    # its replay contract / mixes layouts — both must refuse with
    # direction, not silently no-op or corrupt
    from oracle_to_snowflake_etl_spark.operators.similarity import (
        append_ivf_int8_index,
        compact_ivf_int8_index,
    )

    with _pt.raises(ValueError, match="STREAMED"):
        compact_ivf_int8_index(spark, idx)
    with _pt.raises(ValueError, match="STREAMED"):
        append_ivf_int8_index(emb.limit(3), idx)

    # retirement: flatten -> identical results, one file per cell,
    # geometry travels, and the flat store is appendable/compactable
    from oracle_to_snowflake_etl_spark.operators.similarity import (
        flatten_streamed_ann_index,
        read_ivf_centroids,
    )

    flat = str(tmp_path / "ann_flat")
    n = flatten_streamed_ann_index(spark, idx, flat)
    assert n == emb.count()
    assert read_ivf_centroids(spark, flat) == cents
    flat_res = {tuple(r) for r in ann_ivf_int8_topk(
        emb, q5, k=10, centroids=cents, index_path=flat).collect()}
    assert flat_res == idx_res
    assert compact_ivf_int8_index(spark, flat, max_files_per_cell=1) == 0
    append_ivf_int8_index(
        emb.limit(2).withColumn("vec_id", F.col("vec_id") + 10_000),
        flat)  # flat store accepts appends again
