"""Merge / upsert — the J1 incremental generalized to updates.

The reference only ever INSERTS never-seen keys (J1). Real staging
pipelines also need upsert: new keys inserted AND existing keys updated
with fresh values. Without a transactional table format, the pure-Spark
construction is:

    merged = source ∪ (target ∖ source-by-key)

i.e. every target row whose key is NOT in the source (one left_anti)
unioned with the entire source — source rows win on key collision.
Cost: one shuffle-or-broadcast anti-join + a union (no shuffle). On
Delta/Iceberg the same call becomes MERGE WHEN MATCHED UPDATE / WHEN NOT
MATCHED INSERT; this module keeps the engine format-agnostic
(SURVEY.md §4.3).

``merge_upsert`` is deterministic even with duplicate source keys if the
caller dedups first (``dropDuplicates(keys)``) — we do NOT hide that
choice, because which duplicate wins is business logic.

Delta/Iceberg position (SURVEY.md §4.3): the transactional `MERGE INTO`
variant IS wired (:func:`merge_upsert_delta`, same semantics — source
wins on key collision) but gated on delta-spark being importable
(:func:`delta_available`), which it is not in this build environment
(no package installs). The DataFrame construction remains the always-
available form; plain ``merge_upsert`` rewrites the full target (no
file-level pruning), and ``merge_upsert_partitioned`` recovers the
file-pruning half on a Hive-partitioned table by scoping the
read+rewrite to the partitions the source touches (dynamic partition
overwrite; untouched partitions byte-identical). The gated pytest
(tests/test_maintenance.py) asserts merge_upsert_delta ==
merge_upsert row-for-row whenever the package is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .incremental import incremental_delta


def merge_upsert(source: DataFrame, target: DataFrame,
                 key_cols: list[str]) -> DataFrame:
    """Upsert semantics as a pure DataFrame expression: all of ``source``
    plus the ``target`` rows whose key the source does not touch."""
    kept = incremental_delta(target, source.select(*key_cols), key_cols)
    return source.unionByName(kept)


def delta_available() -> bool:
    """True when delta-spark (Python package + jars) is importable —
    the gate for :func:`merge_upsert_delta`. False in this build
    environment (no package installs, SURVEY.md §4.3); true on a
    cluster with Delta on the classpath."""
    try:
        import delta  # noqa: F401
        return True
    except ImportError:
        return False


def merge_upsert_delta(source: DataFrame, target_path: str,
                       key_cols: list[str]) -> DataFrame:
    """The at-scale form of J1/upsert (SURVEY.md §1.4, §4.3): a
    transactional Delta ``MERGE INTO`` with the SAME semantics as
    :func:`merge_upsert` (source wins on key collision, untouched keys
    pass through) — plus what the parquet construction cannot give:
    ACID commit, concurrent-writer isolation, and data-file skipping on
    the merge condition instead of whole-partition rewrites.

    Requires delta-spark (:func:`delta_available`); tests gate on it
    (tests/test_maintenance.py) and the semantics contract is asserted
    against :func:`merge_upsert` whenever the package is present. The
    merge condition uses plain ``=`` deliberately: the anti-join form
    treats NULL keys as matching NOTHING (a NULL-keyed target row
    survives and a NULL-keyed source row appends), and ``=`` reproduces
    exactly that, where a null-safe ``<=>`` would instead pair NULL
    with NULL — updating rows the anti-join keeps, and aborting with
    Delta's multiple-source-rows-matched error when two source rows
    carry NULL keys.
    """
    from delta.tables import DeltaTable  # gated import (delta_available)

    spark = source.sparkSession
    tbl = DeltaTable.forPath(spark, target_path)
    # backtick-quoted so key columns with spaces/dots/reserved words
    # build a valid condition, matching the DataFrame form's tolerance
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in key_cols)
    (tbl.alias("t").merge(source.alias("s"), cond)
     .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
    return spark.read.format("delta").load(target_path)


def merge_upsert_partitioned(source: DataFrame, target_path: str,
                             key_cols: list[str],
                             partition_cols: list[str]) -> list[tuple]:
    """Partition-scoped upsert onto a Hive-partitioned parquet table:
    only the partitions the ``source`` touches are read, merged
    (source wins on key collision — :func:`merge_upsert` semantics) and
    rewritten via dynamic partition overwrite; every other partition's
    files are never opened, never rewritten (byte-identical on disk —
    pytest-asserted in tests/test_maintenance.py).

    This is the no-table-format answer to Delta's ``MERGE`` file
    pruning: at 100 TB, upserting one day into a date-partitioned
    table costs one day's read + rewrite, not a full-table rewrite
    (contrast :func:`merge_upsert`, which is partition-agnostic and
    rewrites everything it is given). Assumes the usual partitioned-
    upsert invariant: a key's partition-column values are immutable (a
    row never migrates between partitions) — the same assumption a
    Delta MERGE with a partition-pruning predicate encodes.

    The touched-partition set is collected to the driver — bounded by
    the number of affected PARTITIONS (a handful of days), never by
    rows — and turned into a literal IN-filter, so the target scan
    prunes at PLANNING time (PartitionFilters, no file listing outside
    the touched directories). Returns the touched partition tuples.
    """
    spark = source.sparkSession
    touched = [tuple(r) for r in
               source.select(*partition_cols).distinct().collect()]
    if not touched:
        return []
    target = spark.read.parquet(target_path)
    scoped = target.where(_partition_predicate(touched, partition_cols))
    merged = merge_upsert(source, scoped, key_cols)
    from ..sources.readers import overwrite_partitions_dynamic

    overwrite_partitions_dynamic(merged.select(*target.columns),
                                 target_path, partition_cols)
    return touched


def _partition_predicate(touched: list[tuple], partition_cols: list[str]):
    """Literal IN/OR filter over partition-column tuples — planning-time
    partition pruning (PartitionFilters on the scan), no join."""
    if len(partition_cols) == 1:
        return F.col(partition_cols[0]).isin([t[0] for t in touched])
    pred = F.lit(False)
    for t in touched:
        clause = F.lit(True)
        for c, v in zip(partition_cols, t):
            clause = clause & (F.col(c) == F.lit(v))
        pred = pred | clause
    return pred


def apply_changes_partitioned(changes: DataFrame, target_path: str,
                              key_cols: list[str], seq_col: str,
                              partition_cols: list[str],
                              op_col: str = "op") -> list[tuple]:
    """Partition-scoped CDC application: :func:`apply_changes` semantics
    (highest-seq change wins; 'D' deletes; untouched keys pass through)
    executed only within the partitions the changelog touches, rewritten
    via dynamic partition overwrite — the CDC analog of
    :func:`merge_upsert_partitioned`, same partition-immutable-key
    invariant, same cost contract (∝ changed partitions, never table
    size). The changelog must carry the partition columns. Returns the
    touched partition tuples.

    Emptied-partition edge (deletes can do what upserts cannot): if the
    changelog deletes EVERY row of a partition, the merged frame has no
    rows there, dynamic overwrite never rewrites that directory, and the
    deleted data would silently survive — so partitions that end up
    empty are removed explicitly through the Hadoop FileSystem API
    (pytest-covered). Partition values are formatted as plain
    ``col=value`` path segments (ints/strings); values needing Hive
    URL-escaping are out of scope here.
    """
    spark = changes.sparkSession
    touched = [tuple(r) for r in
               changes.select(*partition_cols).distinct().collect()]
    if not touched:
        return []
    target = spark.read.parquet(target_path)
    scoped = target.where(_partition_predicate(touched, partition_cols))
    merged = apply_changes(scoped, changes.drop(*[
        c for c in partition_cols if c not in target.columns]),
        key_cols, seq_col, op_col)
    from ..sources.readers import overwrite_partitions_dynamic

    # BEFORE the overwrite: merged's lineage reads the current target
    # files, which the overwrite replaces — executing it afterwards
    # throws FAILED_READ_FILE on the very files it rewrote
    written = {tuple(r) for r in
               merged.select(*partition_cols).distinct().collect()}
    overwrite_partitions_dynamic(merged.select(*target.columns),
                                 target_path, partition_cols)
    emptied = [t for t in touched if t not in written]
    if emptied:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for t in emptied:
            seg = "/".join(f"{c}={v}" for c, v in zip(partition_cols, t))
            p = jvm.org.apache.hadoop.fs.Path(f"{target_path}/{seg}")
            p.getFileSystem(hconf).delete(p, True)
    return touched


def apply_changes(target: DataFrame, changes: DataFrame,
                  key_cols: list[str], seq_col: str,
                  op_col: str = "op") -> DataFrame:
    """CDC changelog application (the APPLY CHANGES INTO shape): fold a
    stream of keyed (op, seq, payload) change rows onto a snapshot.

    Contract per key: the change with the HIGHEST sequence wins — 'D'
    deletes the key, anything else ('I'/'U') replaces the row with the
    change's payload; keys the changelog never mentions pass through
    untouched. Ties on seq resolve by (op desc, payload desc) struct
    comparison, so out-of-order and duplicate delivery produce the same
    final state (the idempotent-replay property CDC consumers need).

    Plan: ONE window (row_number over key, ordered by seq desc) reduces
    the changelog to its per-key head — the changelog, not the target,
    pays the sort, and it is output-bounded by |distinct changed keys|.
    The target pays exactly one anti-join against those keys (AQE
    broadcasts them when small) plus a shuffle-free union. At 100 TB
    this is the same cost profile as merge_upsert; on Delta/Iceberg the
    equivalent is MERGE with whenMatchedDelete/Update/whenNotMatchedInsert.
    """
    from pyspark.sql import Window

    payload_cols = [c for c in changes.columns
                    if c not in (*key_cols, seq_col, op_col)]
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(seq_col).desc(), F.col(op_col).desc(),
                  F.struct(*payload_cols).desc()))
    latest = (changes.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1).drop("_rn", seq_col))
    untouched = target.join(latest.select(*key_cols), key_cols, "left_anti")
    upserts = (latest.where(F.col(op_col) != "D").drop(op_col)
               .select(*target.columns))
    return untouched.unionByName(upserts)


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  op_col: str = "op", form: str = "latest") -> DataFrame:
    """Derive the CDC changelog that transforms snapshot ``old`` into
    snapshot ``new`` — the INVERSE of :func:`apply_changes`, for
    sources that only hand you full table states (the reference's
    Oracle extract is exactly that): diff once, then ship/apply the
    (typically tiny) changelog instead of the table.

    Shapes (same key+payload columns as the snapshots):
      form="latest"  one row per changed key — 'I' (new-only, new
                     payload), 'D' (old-only, old payload), 'U'
                     (payload differs, NEW payload). Feed to
                     :func:`apply_changes`; the roundtrip
                     apply_changes(old, diff) == new is pytest-asserted.
      form="pair"    updates become the D(old payload) + I(new payload)
                     pair — the before-image convention
                     operators/mv.incremental_agg_refresh needs; its
                     roundtrip refresh(view(old), diff) == view(new) is
                     pytest-asserted too.

    Plan: ONE full-outer join on the keys (the only construction that
    sees inserts, deletes and updates in a single pass). A full-outer
    cannot broadcast, so both snapshots shuffle — at 100 TB store
    snapshots BUCKETED on the keys and the join runs zero-exchange;
    unchanged keys are dropped by a null-safe struct compare, so the
    output is bounded by the true change volume. Emitted ``seq`` is a
    constant 1: a single diff is one atomic generation (chain diffs by
    passing increasing seqs to apply_changes).
    """
    payload_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(*key_cols, F.struct(*payload_cols).alias("_old"))
    n = new.select(*key_cols, F.struct(*payload_cols).alias("_new"))
    j = o.join(n, key_cols, "full_outer")
    changed = j.where(~F.col("_old").eqNullSafe(F.col("_new")))
    ins = changed.where(F.col("_old").isNull()).select(
        *key_cols, F.lit("I").alias(op_col), F.col("_new").alias("_p"))
    dels = changed.where(F.col("_new").isNull()).select(
        *key_cols, F.lit("D").alias(op_col), F.col("_old").alias("_p"))
    upd = changed.where(F.col("_old").isNotNull() & F.col("_new").isNotNull())
    if form == "latest":
        ups = upd.select(*key_cols, F.lit("U").alias(op_col),
                         F.col("_new").alias("_p"))
        out = ins.unionByName(dels).unionByName(ups)
    elif form == "pair":
        ups = (upd.select(*key_cols, F.lit("D").alias(op_col),
                          F.col("_old").alias("_p"))
               .unionByName(upd.select(*key_cols, F.lit("I").alias(op_col),
                                       F.col("_new").alias("_p"))))
        out = ins.unionByName(dels).unionByName(ups)
    else:
        raise ValueError(f"unknown form: {form!r}")
    return out.select(*key_cols, op_col, F.lit(1).alias("seq"),
                      *[F.col(f"_p.{c}").alias(c) for c in payload_cols])


#: contract cap on a purge request — compliance requests are
#: metadata-sized; a corpus-sized key set is a reprocessing job
PURGE_MAX_KEYS = 100_000

#: key-count threshold between the literal IN predicate (pushes into
#: the parquet scan — right for a handful of keys) and a broadcast
#: semi/anti join (a literal In expression grows one Catalyst branch
#: PER KEY: a ~14k-key purge measured 35 s of mostly plan/codegen at
#: sf0.1 vs ~4 s through the join form, and a 100k-key In would be
#: worse — while a broadcast hash set is O(1) per probed row)
PURGE_ISIN_MAX = 64


def _purge_key_frames(spark, tbl: DataFrame, keys: list, key_col: str):
    """(touched-rows frame, kept-predicate applier) for one purge:
    below :data:`PURGE_ISIN_MAX` both are literal IN predicates;
    above, the keys become a 1-column broadcast frame probed via
    left_semi / left_anti joins. NULL ``key_col`` rows are never
    purged on either path (no compliance request names NULL; the anti
    join keeps them naturally, the predicate path keeps them
    explicitly)."""
    if len(keys) <= PURGE_ISIN_MAX:
        pred = F.col(key_col).isin(keys)
        return (lambda df: df.where(pred),
                lambda df: df.where(F.col(key_col).isNull() | ~pred))
    from pyspark.sql.types import StructField, StructType

    kdf = spark.createDataFrame(
        [(k,) for k in keys],
        StructType([StructField(key_col, tbl.schema[key_col].dataType)]))
    return (lambda df: df.join(F.broadcast(kdf), key_col, "left_semi"),
            lambda df: df.join(F.broadcast(kdf), key_col, "left_anti"))


def purge_keys(spark, path: str, keys, key_col: str,
               partition_cols: list[str],
               max_keys: int = PURGE_MAX_KEYS,
               partition_of=None, detail: bool = False):
    """Compliance delete (right-to-be-forgotten) on one partitioned
    parquet store: remove every row whose ``key_col`` is in ``keys``,
    rewriting ONLY the partitions that contain at least one such row.
    Returns the number of rows removed — or, with ``detail=True``, the
    tuple ``(removed, touched, emptied)`` where ``touched``/``emptied``
    are the partition tuples the purge rewrote / fully removed (the
    scoping a caller with derived per-partition state needs:
    purge_ann_index_keys cleans up ONLY batch dirs this purge emptied,
    never a concurrent writer's brand-new ones — ADVICE r14).

    Cost contract, split honestly (the two steps scale differently):
    the REWRITE is ∝ the affected partitions' data, never table size —
    dynamic partition overwrite; untouched partitions' files are never
    opened for write (byte-identical on disk, pytest-pinned). LOCATING
    the affected partitions is one column-pruned, filter-pushed scan —
    O(table I/O) in general; when the partition key is DERIVABLE from
    the purge key, pass ``partition_of`` (key -> partition-value tuple,
    e.g. ``lambda k: (k % 8,)`` for a bucket-hashed store) and the
    candidate partitions are computed arithmetically from the capped
    key list, so the locate scan reads ONLY those partitions and the
    WHOLE purge is ∝ affected partitions (derived == scanned result,
    pytest-pinned). ``partition_of`` MUST be the same mapping that
    assigned partitions at write time: a wrong mapping silently leaves
    keys outside the candidate partitions unpurged — when in doubt,
    omit it (the scanned path is always correct, just O(table) to
    locate). A partition fully EMPTIED by the purge is removed
    through the FileSystem API — the apply_changes_partitioned edge:
    dynamic overwrite never rewrites a directory it has no rows for,
    so without this the purged data would silently survive.

    ``keys`` is driver-side and contract-capped (compliance requests
    are metadata-sized lists of ids; ``None`` keys are rejected — no
    request names NULL, and a NULL literal would three-value the isin
    predicate); a handful of keys rides the scan
    as a pushed IN predicate, larger requests as a broadcast
    semi/anti join (:func:`_purge_key_frames` — a literal In grows one
    Catalyst branch per key and measured 35 s of plan/codegen at ~14k
    keys where the join form takes ~4 s). Use
    :func:`purge_keys_everywhere` to propagate one
    request across a corpus AND its derived stores — forgetting a
    document must also forget its fingerprints.

    SINGLE-WRITER assumption (stated because the r15 arithmetic made
    it load-bearing): the hit/row counts, the dynamic overwrite, and
    the FS delete of fully-emptied partition dirs all read/modify the
    same store state — a concurrent writer between the two count
    collects and the overwrite could make ``written``/``emptied``
    wrong (same assumption the pre-r15 five-action form made, now
    concentrated in fewer reads). Purges are idempotent, so the
    recovery from a violated assumption is to re-run the purge.
    """
    keys = list(keys)
    if len(keys) > max_keys:
        raise ValueError(
            f"purge request has {len(keys)} keys > max_keys={max_keys}: "
            f"corpus-sized deletions are a reprocessing job (anti-join "
            f"rewrite), not a compliance purge.")
    if any(k is None for k in keys):
        # no compliance request names NULL (the _purge_key_frames
        # contract) — and a None key would poison the isin path's
        # predicate into three-valued NULL for every non-matching row,
        # so rows would be neither hit nor kept and the partition
        # bookkeeping below would drift (ADVICE r15). Fail loudly.
        raise ValueError("purge_keys: keys must not contain None — "
                         "NULL rows are never purge targets.")
    if not keys:
        return (0, [], []) if detail else 0
    from ..sources.readers import overwrite_partitions_dynamic

    tbl = spark.read.parquet(path)
    if partition_of is not None:
        # derived-partition shortcut: the candidate set comes from the
        # (contract-capped) key list, zero scan; the hit/locate pass
        # below then reads ONLY these partitions (partition pruning),
        # never the table — keys absent from the store simply find no
        # rows, so the result is identical to the scanned path
        cand = sorted({(t if isinstance(t, tuple) else (t,))
                       for t in (partition_of(k) for k in keys)})
        tbl = tbl.where(_partition_predicate(cand, partition_cols))
    hit, keep = _purge_key_frames(spark, tbl, keys, key_col)
    # Locate + size in TWO jobs instead of four (r15 optimization —
    # guide §1.2 "distributed algorithm first": the kept anti-join was
    # previously executed three times — count, partition-distinct, and
    # the write — and the scoped store twice more; every extra action
    # re-reads the affected partitions and pays a full job's scheduling
    # constant, which dominates a purge whose rewrite is
    # partition-scoped by design):
    #   1. per-partition HIT counts over the (pushed-filter / broadcast
    #      semi-join) locate scan — yields `touched`, and `removed` as
    #      sum(hits) (identical arithmetic to n_before - n_kept: every
    #      hit row is in scoped, NULL keys never hit on either path);
    #   2. per-partition ROW counts of only the touched partitions —
    #      a partition is fully emptied iff hits == rows, and `written`
    #      (the dynamic overwrite's output set) is exactly the touched
    #      partitions with rows > hits.
    # The kept frame is then computed exactly ONCE, inside the write.
    hstats = (hit(tbl).groupBy(*partition_cols)
              .agg(F.count(F.lit(1)).alias("_nh")).collect())
    n_pc = len(partition_cols)
    touched = [tuple(r)[:n_pc] for r in hstats]
    if not touched:
        return (0, [], []) if detail else 0
    hits = {tuple(r)[:n_pc]: r["_nh"] for r in hstats}
    scoped = tbl.where(_partition_predicate(touched, partition_cols))
    rows = {tuple(r)[:n_pc]: r["_nb"] for r in
            scoped.groupBy(*partition_cols)
            .agg(F.count(F.lit(1)).alias("_nb")).collect()}
    kept = keep(scoped)
    # the write executes while the old files are still present (commit
    # replaces them only at job end — the apply_changes_partitioned
    # pattern); counts above were taken from the same pre-write state
    overwrite_partitions_dynamic(kept, path, partition_cols)
    written = {t for t in touched if rows[t] > hits[t]}
    emptied = [t for t in touched if t not in written]
    if emptied:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for t in emptied:
            seg = "/".join(f"{c}={v}"
                           for c, v in zip(partition_cols, t))
            p = jvm.org.apache.hadoop.fs.Path(f"{path}/{seg}")
            p.getFileSystem(hconf).delete(p, True)
    removed = sum(hits.values())
    return (removed, touched, emptied) if detail else removed


def purge_keys_everywhere(spark, stores: list[dict], keys,
                          max_keys: int = PURGE_MAX_KEYS) -> dict[str, int]:
    """Propagate one forget request across a corpus AND every derived
    store that carries traces of it — the part naive deletes miss: a
    stored MinHash signature, ahash fingerprint, shingle index row, or
    cell-assigned embedding of a forgotten document is still data ABOUT
    the document. Each store dict names {path, key_col, partition_cols}
    plus an optional ``partition_of`` (key -> partition tuple: the
    derived-partition locate shortcut of :func:`purge_keys` for
    bucket-hashed stores). Key columns differ per store: the corpus
    keys on doc_id, a dedup signature index on doc, a media index on
    media_id — same id space, different column names. Returns
    {path: rows_removed}; stores with no trace report 0 rather than
    erroring, so one request fans out over a heterogeneous store list
    idempotently (re-running a purge is a no-op).

    A store dict with ``kind: "ann_index"`` routes through
    ``operators.similarity.purge_ann_index_keys`` instead — the
    layout-aware ANN wrapper (flat vs live streamed batch=/cell=
    detection, replay-durability tombstones, childless-batch cleanup;
    ``key_col``/``partition_cols`` are implied by the index layout and
    must be omitted) — so ONE forget request covers the corpus, the
    fingerprint/signature stores, AND the serving ANN indexes in a
    single call.

    Failure semantics under the concurrent fan-out (r15; documented
    per ADVICE r15): per-store purges run in parallel, so when one
    store raises, OTHER stores' purges may already have completed
    (the old sequential form stopped at the failing store). That is
    recoverable by construction — purges are idempotent, so re-running
    the whole request after fixing the failing store converges. Store
    paths must be DISTINCT and non-nested (checked below): two dynamic
    overwrites racing on overlapping paths would corrupt both."""
    from concurrent.futures import ThreadPoolExecutor

    import os as _os

    norm = [_os.path.normpath(st["path"]).rstrip("/") for st in stores]
    for i, a in enumerate(norm):
        for b in norm[i + 1:]:
            if a == b or a.startswith(b + "/") or b.startswith(a + "/"):
                raise ValueError(
                    f"purge_keys_everywhere: store paths {a!r} and "
                    f"{b!r} overlap — the concurrent per-store purges "
                    f"would race two dynamic overwrites on the same "
                    f"files. List each store exactly once, non-nested.")

    def one(st) -> int:
        if st.get("kind") == "ann_index":
            from .similarity import purge_ann_index_keys

            if "key_col" in st or "partition_cols" in st:
                raise ValueError(
                    f"store {st['path']}: kind='ann_index' derives "
                    f"key_col/partition_cols from the index layout — "
                    f"omit them (a mismatch would silently purge the "
                    f"wrong column).")
            return purge_ann_index_keys(
                spark, st["path"], keys, max_keys=max_keys)
        return purge_keys(
            spark, st["path"], keys, st["key_col"],
            st["partition_cols"], max_keys=max_keys,
            partition_of=st.get("partition_of"))

    # the per-store purges touch DISJOINT paths and share no state —
    # run them as concurrent driver-thread jobs (guide §2.6) so one
    # store's locate-scan tail back-fills with the next store's work
    # instead of serializing the fan-out; results keyed by path, order
    # deterministic (r15). 2-3 in flight is the guide's sweet spot.
    with ThreadPoolExecutor(max_workers=min(3, max(1, len(stores)))) as ex:
        counts = list(ex.map(one, stores))
    return {st["path"]: n for st, n in zip(stores, counts)}
