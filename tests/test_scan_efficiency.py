"""Read-path efficiency proofs: the scan must SKIP data, not just carry
pushed-filter annotations.

test_maintenance.test_zorder_layout_tightens_both_columns asserts the
WRITE side (tight per-row-group footer stats); these tests close the
loop on the READ side — Spark's vectorized parquet reader must turn
those stats into actually-not-materialized rows, and AQE's runtime
bloom filter must inject into a selective shuffle join. Both are the
mechanisms the 100 TB story leans on (SCALE.md): a filter that prunes
nothing at read time is just metadata.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _scan_output_rows(df) -> int:
    """Sum of numOutputRows over the executed plan's file-scan leaves
    (run an action first). With row-group skipping, this is the count
    of rows the reader MATERIALIZED — far below table rows when footer
    min/max prunes."""
    import re

    plan = df._jdf.queryExecution().executedPlan()
    total = 0
    it = plan.collectLeaves().iterator()
    while it.hasNext():
        leaf = it.next()
        if "FileSourceScan" not in leaf.getClass().getName():
            continue
        m = leaf.metrics().get("numOutputRows")
        if not m.isEmpty():
            total += m.get().value()
    # defensive: the py4j path above is version-coupled; fall back to
    # parsing the metrics out of the string form if the API moved
    if total == 0:
        s = plan.toString()
        total = sum(int(x) for x in
                    re.findall(r"number of output rows: (\d+)", s))
    return total


def test_sorted_layout_skips_row_groups_at_read(spark, tmp_path):
    """A range predicate on the SORT column of a sorted-write table must
    materialize only the matching row groups' rows — reading all rows
    and filtering after would be a silent 100x regression at scale.
    Control: the same predicate on a shuffled layout materializes
    (nearly) everything, proving the skip comes from the layout, not
    the predicate."""
    n = 400_000
    base = spark.range(n).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"))

    sorted_path = str(tmp_path / "sorted")
    (base.repartition(1).sortWithinPartitions("k").write
     .option("parquet.block.size", 256 * 1024)  # many small row groups
     .parquet(sorted_path))
    shuffled_path = str(tmp_path / "shuffled")
    (base.withColumn("r", F.pmod(F.xxhash64("k"), 1000))
     .repartition(1).sortWithinPartitions("r").drop("r").write
     .option("parquet.block.size", 256 * 1024)
     .parquet(shuffled_path))

    pred = (F.col("k") >= 1000) & (F.col("k") < 3000)

    # collect() (not count()): the action must run THIS DataFrame's own
    # QueryExecution or its scan metrics never populate
    s = spark.read.parquet(sorted_path).where(pred)
    assert len(s.collect()) == 2000
    srows = _scan_output_rows(s)
    u = spark.read.parquet(shuffled_path).where(pred)
    assert len(u.collect()) == 2000
    urows = _scan_output_rows(u)

    # sorted layout: materialized rows bounded by a few row groups;
    # shuffled layout: the same predicate touches ~every row group
    assert srows < n // 10, f"sorted scan materialized {srows}/{n}"
    assert urows > n // 2, f"shuffled control unexpectedly skipped: {urows}"


def _stages_after(spark, watermark: int) -> tuple[int, int, int, int]:
    """(shuffle-write records, shuffle-write bytes, spilled bytes, max
    stage id) summed over
    stages with stageId > watermark — the same numbers the Spark UI's
    stage page shows, read via AppStatusStore so multi-job operators
    (iterative clusters, checkpointing dedups, composed pipelines) are
    measured in FULL, not just the final job's plan metrics. Summing
    only stages NEWER than the watermark makes the measurement immune
    to the store's retainedStages eviction: an evicted OLD stage would
    otherwise shrink the after-snapshot and corrupt a snapshot-delta
    (stages submitted during the measured query are never the eviction
    victims — eviction takes the oldest first)."""
    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = jvm.java.util.Collections.emptyList()
    qarr = gw.new_array(jvm.double, 0)
    it = store.stageList(empty, False, False, qarr, empty).iterator()
    sr = sw = sp = 0
    max_id = watermark
    while it.hasNext():
        s = it.next()
        sid = s.stageId()
        max_id = max(max_id, sid)
        if sid <= watermark:
            continue
        sr += s.shuffleWriteRecords()
        sw += s.shuffleWriteBytes()
        sp += s.memoryBytesSpilled() + s.diskBytesSpilled()
    return sr, sw, sp, max_id


#: recorded executed shuffle-write RECORDS at sf0.01. Records, not
#: bytes: byte counts move with Spark version, shuffle codec, AQE
#: coalescing and row-encoding details, so a byte budget trips on
#: engine/config upgrades with no real volume change — record counts
#: are a property of the QUERY (how many rows crossed an exchange) and
#: survive those. Re-record procedure: run this test; each failure
#: message prints the observed count — paste it here when the change
#: is an intended plan improvement, never to silence an unexplained
#: growth.
SHUFFLE_BUDGETS = {
    "dedup_ngram_jaccard": 39_058,
    "dedup_containment": 79_474,
    "dedup_containment_incr": 11_981,
    "dedup_containment_drop": 2_681,
    "dedup_clusters": 3_487,
    "ingest_batch_pipeline": 1_435,
}


def test_heavy_query_shuffle_volume_budgets(spark):
    """Executed-METRICS budgets for the heaviest queries: plan-shape
    tests catch operator regressions but not VOLUME regressions (the
    round-3 cache leak shipped with unchanged plan shapes and showed up
    only in bench). Each heavy query's total executed shuffle-write
    records at sf0.01 must stay within ±50% of its recorded budget —
    above catches a fattened shuffle (lost partial-agg, lost prefix
    pruning, fan-out join), below catches work silently not happening
    (a leaked cache serving a stage that should have run). Spill
    budget is zero: nothing at this scale may spill at all."""
    import gc

    from oracle_to_snowflake_etl_spark.queries import queries

    spark.catalog.clearCache()
    qs = queries()
    sf = "/root/testdata/sf0.01"
    _, _, _, watermark = _stages_after(spark, -1)
    for name, budget in SHUFFLE_BUDGETS.items():
        gc.collect()
        qs[name](spark, sf).count()
        dsr, dsw, dsp, watermark = _stages_after(spark, watermark)
        spark.catalog.clearCache()
        assert dsp == 0, f"{name} spilled {dsp} bytes at sf0.01"
        assert budget * 0.5 <= dsr <= budget * 1.5, \
            f"{name}: shuffle-write {dsr} records ({dsw} bytes) " \
            f"vs budget {budget}"


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """AQE's runtime bloom filter: a selective dim filter on the build
    side of a shuffle join must inject a BloomFilterMightContain
    predicate into the fact side's scan stage, so non-joining fact rows
    die before the shuffle instead of traveling through it — the
    runtime complement of static predicate pushdown, and the mechanism
    that keeps fact-fact joins affordable when the selective predicate
    lives on the other table. Thresholds are lowered so local-size
    tables exercise the 100 TB code path."""
    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        # force a shuffle join: a broadcast join already prunes via the
        # broadcast relation, bloom adds nothing there
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(0, 500_000).select(
            F.pmod(F.col("id"), 10_000).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"))
        dim = (spark.range(0, 10_000)
               .select(F.col("id").alias("k"),
                       F.pmod(F.col("id"), 97).alias("grp"))
               .where(F.col("grp") == 0))  # ~1% selective
        joined = fact.join(dim, "k")
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
        # and it actually runs: 104 surviving dim keys (0,97,...,9991)
        # x 50 fact rows per key
        assert joined.count() == 104 * 50
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
