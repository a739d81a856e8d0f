#!/usr/bin/env python3
"""Phase-level wall-clock profiling of the mutation-heavy registry
queries (purge_* / ingest) — guide §1: decide WHERE the time goes
before touching anything. Replicates each query body with timers
around its phases; prints a table. Not a correctness tool.

Usage: python tools/profile_phases.py purge_ann_index purge_propagation ...
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    """Phase timer + Spark JOB counter (job count is the noise-free
    metric on a host with ambient contention: scheduling constants
    dominate these mutation queries, so fewer jobs == faster even when
    wall-clock samples are noisy)."""

    def __init__(self, spark=None):
        self.rows = []
        self.spark = spark
        self.t0 = time.perf_counter()
        self.j0 = self._jobs()

    def _jobs(self):
        if self.spark is None:
            return 0
        try:
            return (self.spark.sparkContext._jsc.sc()
                    .statusStore().jobsList(None).size())
        except Exception:
            return 0

    def mark(self, label):
        t, j = time.perf_counter(), self._jobs()
        self.rows.append((label, t - self.t0, j - self.j0))
        self.t0, self.j0 = t, j

    def report(self, name):
        print(f"\n== {name} ==")
        tot, jt = 0.0, 0
        for label, dt, dj in self.rows:
            print(f"  {dt:7.3f}s  {dj:3d} jobs  {label}")
            tot += dt
            jt += dj
        print(f"  {tot:7.3f}s  {jt:3d} jobs  TOTAL")


def profile_purge_ann_index(spark):
    from oracle_to_snowflake_etl_spark.operators.merge import purge_keys
    from oracle_to_snowflake_etl_spark.operators.similarity import (
        ann_ivf_int8_topk, write_ivf_int8_index)
    from oracle_to_snowflake_etl_spark.queries.similarity_q import (
        IVF_SNAPSHOT, N_QUERIES, TOP_K, _purge_ann_modulus)
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    t = T(spark)
    emb = load_table(spark, SF_DIR, "embeddings")
    path = tempfile.mkdtemp(prefix="prof_purge_") + "/index"
    t.mark("setup")
    write_ivf_int8_index(emb, path, centroids=IVF_SNAPSHOT)
    t.mark("write_ivf_int8_index")
    mod = _purge_ann_modulus(emb.count())
    t.mark("emb.count for modulus")
    keys = [r.vec_id for r in
            emb.where(F.col("vec_id") % mod == 11).select("vec_id").collect()]
    t.mark(f"keys collect ({len(keys)} keys)")
    purge_keys(spark, path, keys, "neighbor_id", ["cell"])
    t.mark("purge_keys")
    out = ann_ivf_int8_topk(emb, emb.where(F.col("vec_id") < N_QUERIES),
                            k=TOP_K, rescore=3, centroids=IVF_SNAPSHOT,
                            index_path=path)
    out.count()
    t.mark("probed scan + count")
    t.report("purge_ann_index")


def profile_purge_ann_index_streamed(spark):
    from oracle_to_snowflake_etl_spark.operators.similarity import (
        ann_ivf_int8_topk, purge_ann_index_keys)
    from oracle_to_snowflake_etl_spark.queries.streaming_q import (
        _ANN_N_QUERIES, _ANN_TOP_K, _IVF_SNAPSHOT, _await_or_raise)
    from oracle_to_snowflake_etl_spark.queries.similarity_q import (
        _purge_ann_modulus)
    from oracle_to_snowflake_etl_spark.sources.readers import load_table
    from oracle_to_snowflake_etl_spark.streaming.jobs import (
        maintain_ann_index_stream)

    t = T(spark)
    emb = load_table(spark, SF_DIR, "embeddings")
    work = tempfile.mkdtemp(prefix="prof_spurge_")
    src, path, ckp = f"{work}/src", f"{work}/index", f"{work}/ckp"
    t.mark("setup")
    for half in (emb.where(F.col("vec_id") % 2 == 0),
                 emb.where(F.col("vec_id") % 2 == 1)):
        half.coalesce(1).write.mode("append").parquet(src)
    t.mark("src writes (2x coalesce(1))")
    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = maintain_ann_index_stream(stream, path, ckp,
                                  centroids=_IVF_SNAPSHOT)
    _await_or_raise(q, 300)
    t.mark("stream fold (2 micro-batches)")
    mod = _purge_ann_modulus(emb.count())
    keys = [r.vec_id for r in
            emb.where(F.col("vec_id") % mod == 11)
            .select("vec_id").collect()]
    t.mark(f"count + keys collect ({len(keys)})")
    purge_ann_index_keys(spark, path, keys)
    t.mark("purge_ann_index_keys")
    out = ann_ivf_int8_topk(emb, emb.where(F.col("vec_id") < _ANN_N_QUERIES),
                            k=_ANN_TOP_K, rescore=3,
                            centroids=_IVF_SNAPSHOT, index_path=path)
    out.count()
    t.mark("probed scan + count")
    t.report("purge_ann_index_streamed")


def profile_purge_propagation(spark):
    from oracle_to_snowflake_etl_spark.functions.hashing import hash60
    from oracle_to_snowflake_etl_spark.operators.merge import (
        purge_keys_everywhere)
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    t = T(spark)
    orders = load_table(spark, SF_DIR, "orders")
    m = max(1, -(-orders.count() // 500_000))
    t.mark("orders.count for modulus")
    orders = orders.where(F.col("o_orderkey") % m == 0)
    corpus = orders.select(
        F.col("o_orderkey").alias("key"),
        F.year("o_orderdate").cast("long").alias("part"),
        F.col("o_custkey").alias("val"))
    fp = orders.select(
        F.col("o_orderkey").alias("doc"),
        (F.col("o_orderkey") % 8).alias("bucket"),
        hash60(F.col("o_orderkey").cast("string"), "fp|").alias("fpv"))
    base = tempfile.mkdtemp(prefix="prof_pprop_")
    cpath, fpath = base + "/corpus", base + "/fp"
    corpus.repartition(8, "part").write.partitionBy("part").parquet(cpath)
    t.mark("corpus store write")
    fp.repartition(8, "bucket").write.partitionBy("bucket").parquet(fpath)
    t.mark("fp store write")
    keys = [r.key for r in
            corpus.where((F.col("part") == 2001)
                         | (F.col("key") % 97 == 0))
            .select("key").collect()]
    t.mark(f"keys collect ({len(keys)})")
    purge_keys_everywhere(spark, [
        {"path": cpath, "key_col": "key", "partition_cols": ["part"]},
        {"path": fpath, "key_col": "doc", "partition_cols": ["bucket"],
         "partition_of": lambda k: (k % 8,)},
    ], keys)
    t.mark("purge_keys_everywhere (2 stores)")
    c2 = spark.read.parquet(cpath).select(
        F.lit("corpus").alias("store"), F.col("key"),
        F.col("part").cast("long").alias("part"), F.col("val"))
    f2 = spark.read.parquet(fpath).select(
        F.lit("fp").alias("store"), F.col("doc").alias("key"),
        F.col("bucket").cast("long").alias("part"),
        F.col("fpv").alias("val"))
    c2.unionByName(f2).count()
    t.mark("read-back union + count")
    t.report("purge_propagation")


PROFILES = {
    "purge_ann_index": profile_purge_ann_index,
    "purge_ann_index_streamed": profile_purge_ann_index_streamed,
    "purge_propagation": profile_purge_propagation,
}


def main():
    from oracle_to_snowflake_etl_spark.session import get_spark

    names = sys.argv[1:] or list(PROFILES)
    spark = get_spark("profile-phases")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM like bench.py does
    from oracle_to_snowflake_etl_spark.sources.readers import load_table
    load_table(spark, SF_DIR, "orders").count()
    for n in names:
        PROFILES[n](spark)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
