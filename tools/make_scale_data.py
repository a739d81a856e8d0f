#!/usr/bin/env python3
"""Derive a larger scale factor from the driver's sf0.1 testdata by
replication with per-replica key offsets — for SCALING MEASUREMENT only
(tools/scale_sweep.py), never for correctness runs (the driver's
generated parquet stays the only correctness input).

Design: each replica i gets offset i*OFF added to every entity-key
column, making it an independent sub-database — join selectivities,
group cardinalities per key, and date ranges are preserved, so a query
over N replicas does N times the work of one replica (the scaling shape
a 10x bigger TPC-H would have). Two columns need more than an offset:

- documents.text: copied verbatim, every near-dup/shingle/minhash
  operator would find each document's 9 twins — pair output would grow
  QUADRATICALLY in replica count, measuring an artifact of the
  replication instead of the operator. Replicas i>0 therefore prefix
  every token with 'r{i}': token-injective (within-replica duplicate
  structure and length distribution preserved) while cross-replica
  shingle sets become disjoint — pair counts scale linearly.
- embeddings.embedding: same issue in cosine space. Replicas i>0 apply
  a deterministic per-replica diagonal ±1 sign flip: an orthogonal
  transform, so ALL within-replica inner products (and norms) are
  preserved exactly, while cross-replica similarities collapse to
  noise at dim=64.

nation/region (global dims every replica shares) are copied once,
unchanged.

Usage: python tools/make_scale_data.py [--replicas 10] [--out DIR]
Default out: <repo>/.scaledata/sf1 (gitignored).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: per-replica key offset — larger than any sf0.1 key space
OFF = 10_000_000

#: entity-key columns to offset, per table (nationkey/regionkey excluded:
#: those reference the shared global dims)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO, ".scaledata", "sf1"))
    ap.add_argument("--tables", nargs="*", default=None,
                    help="subset of tables to derive (default: all) — "
                         "e.g. --tables documents for a dedup-only "
                         "third-decade spot check without paying the "
                         "full lineitem replication on disk")
    ap.add_argument("--off", type=int, default=OFF,
                    help="per-replica key offset; when chaining (src is "
                         "itself a derived corpus) pass a value larger "
                         "than the src's max key so replicas never "
                         "collide")
    ap.add_argument("--flip-salt", type=int, default=0,
                    help="salts the embedding sign-flip pattern; when "
                         "chaining from a derived corpus, replica i's "
                         "default pattern equals the src's replica-i "
                         "pattern and the double flip would resurrect "
                         "exact duplicates of the base vectors — any "
                         "nonzero salt decorrelates the two derivations")
    args = ap.parse_args()

    import glob
    import shutil

    from pyspark.sql import functions as F

    from oracle_to_snowflake_etl_spark.session import get_spark
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    spark = get_spark("make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    def write_single_file(df, t: str) -> None:
        """Mirror the driver's layout EXACTLY: one plain FILE named
        <t>.parquet — streaming readers glob on that name
        (streaming/jobs.read_events_stream pathGlobFilter), so a
        directory-shaped table would silently stream zero files."""
        tmp = os.path.join(args.out, f"_tmp_{t}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(args.out, f"{t}.parquet")
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        shutil.move(part, dst)
        shutil.rmtree(tmp)

    for t in ("region", "nation"):
        if args.tables is not None and t not in args.tables:
            continue
        write_single_file(load_table(spark, args.src, t), t)
        print(f"{t}: copied")

    for t, keys in KEY_COLS.items():
        if args.tables is not None and t not in args.tables:
            continue
        base = load_table(spark, args.src, t)
        parts = []
        for i in range(args.replicas):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * args.off))
            if i > 0 and t == "customer":
                # same reason as documents.text below: verbatim-copied
                # name STRINGS put all 10 replicas in the same fuzzy-
                # matching prefix block (pairs would grow quadratically
                # in replicas); a replica-distinct FIXED-WIDTH prefix
                # ("C01".."C99", 3 chars replacing 3) keeps name lengths
                # — and so prefix-block sizes and pair counts — scaling
                # linearly for any replica count up to 100
                if i > 99:
                    raise ValueError("c_name prefix is 2-digit fixed "
                                     "width; >99 replicas would change "
                                     "name lengths and reintroduce the "
                                     "block-inflation artifact")
                df = df.withColumn(
                    "c_name",
                    F.concat(F.lit(f"C{i:02d}"),
                             F.substring(F.col("c_name"), 4, 1_000)))
            if i > 0 and t == "documents":
                toks = F.split(F.trim(F.col("text")), " +")
                df = df.withColumn(
                    "text",
                    F.array_join(
                        F.transform(toks,
                                    lambda x: F.concat(F.lit(f"r{i}"), x)),
                        " "))
                df = df.withColumn("n_chars", F.length("text"))
            if i > 0 and t == "embeddings":
                # deterministic diagonal sign flip per (replica, dim)
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: (x * F.when(
                            F.pmod(F.xxhash64(
                                F.lit(i * 1000
                                      + args.flip_salt * 1_000_003)
                                + j), 2) == 0,
                            F.lit(1.0)).otherwise(F.lit(-1.0))
                        ).cast("float")))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if t == "events":
            # match the round-3+ testdata physical shape (timestamp[us]
            # NTZ) so stream/batch readers take the same probe branch
            out = out.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        write_single_file(out, t)
        n = spark.read.parquet(os.path.join(args.out, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")

    print(f"done -> {args.out}")


if __name__ == "__main__":
    main()
