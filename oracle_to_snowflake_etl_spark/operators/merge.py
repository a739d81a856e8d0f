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

Delta/Iceberg position (SURVEY.md §4.3, stated explicitly): delta-spark
is NOT installable in this build environment (no package installs), so
the transactional `MERGE INTO` variant is not wired. This DataFrame
construction is the supported form; it rewrites the full target (no
file-level pruning), which a table format's MERGE would avoid. On a
cluster with Delta/Iceberg on the classpath, replace a
``merge_upsert(...).write`` with:

    target_tbl.alias("t").merge(source.alias("s"), "<key equi-pred>")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()

— semantics identical to this module (source wins on key collision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .incremental import incremental_delta


def merge_upsert(source: DataFrame, target: DataFrame,
                 key_cols: list[str]) -> DataFrame:
    """Upsert semantics as a pure DataFrame expression: all of ``source``
    plus the ``target`` rows whose key the source does not touch."""
    kept = incremental_delta(target, source.select(*key_cols), key_cols)
    return source.unionByName(kept)
