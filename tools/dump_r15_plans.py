#!/usr/bin/env python3
"""Capture .explain("formatted") for the round-15-touched queries into
plans/r15/<query>_<tag>.txt (tag = before|after). Run from the repo
whose code should produce the plans:

    python tools/dump_r15_plans.py after /root/repo/plans/r15
    (cd /tmp/before_checkout && python tools/dump_r15_plans.py before \
        /root/repo/plans/r15)

Mutation queries (purge_*, mm_ingest_*) execute their store builds as a
side effect of constructing the returned frame; the captured plan is the
SERVED final frame's — phase-level changes are documented in
OPTIMIZATION_r15.md instead.
"""

from __future__ import annotations

import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: registry entries whose RETURNED frame carries the real lazy plan
NAMES = [
    "ann_ivf_int8_topk",
    "tpch_q5_local_supplier",
    "purge_ann_index",
    "purge_propagation",
    "purge_ann_index_streamed",
    "mm_ingest_incremental",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    tag, outdir = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)

    from oracle_to_snowflake_etl_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_incremental,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_incremental,
        shingled_docs,
    )
    from oracle_to_snowflake_etl_spark.queries import queries
    from oracle_to_snowflake_etl_spark.session import get_spark
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name, df):
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh, redirect_stdout(fh):
            df.explain("formatted")
        print(f"wrote {path}")

    docs = load_table(spark, SF_DIR, "documents")
    from pyspark.sql import functions as F

    drop = docs.where(F.col("doc_id") % 25 == 0)
    corpus_sh = shingled_docs(docs.where(F.col("doc_id") % 25 != 0))
    # the registry queries' operators in their LAZY (materialize=False)
    # form — the registered entries return a localCheckpoint'ed frame
    # whose plan is just the RDD scan, which would hide the shape
    dump("dedup_ngram_jaccard",
         ngram_jaccard_pairs(docs, materialize=False, scale_safe=False))
    dump("dedup_ngram_jaccard_scale",
         ngram_jaccard_pairs(docs, materialize=False, scale_safe=True))
    dump("dedup_ngram_jaccard_incr",
         ngram_jaccard_pairs_incremental(drop, corpus_sh))
    dump("dedup_containment",
         containment_pairs(docs, materialize=False, scale_safe=False))
    dump("dedup_containment_incr",
         containment_pairs_incremental(drop, corpus_sh))

    qs = queries()
    for name in NAMES:
        dump(name, qs[name](spark, SF_DIR))


if __name__ == "__main__":
    main()
