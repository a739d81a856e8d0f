#!/usr/bin/env python3
"""Phase-level profile of mm_ingest_incremental / mm_ingest_pipeline —
replicates the query bodies SERIALLY with per-phase job counts + wall
seconds so every job is attributable (guide §1). Not a correctness tool.

Usage: python tools/profile_mm.py [incr|pipeline]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

sys.path.insert(0, os.path.join(REPO, "tools"))
from profile_phases import T  # noqa: E402


def profile_incr(spark):
    from pyspark import StorageLevel

    from oracle_to_snowflake_etl_spark.operators.dedup import (
        _auto_scale_safe, dedup_clusters, cluster_representatives,
        shingled_docs)
    from oracle_to_snowflake_etl_spark.operators.multimodal import (
        MEDIA_MIN_BYTES, ahash_fps, ahash_pairs_incremental, audio_docs,
        audio_neardup_pairs_incremental, audio_window_index, byte_stats,
        frame_docs, media_from_documents, video_frame_index,
        video_neardup_pairs_incremental)
    from oracle_to_snowflake_etl_spark.queries.multimodal_q import (
        _MM_DROP_MOD, _MM_MIN_BYTES)
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    t = T(spark)
    media = media_from_documents(load_table(spark, SF_DIR, "documents"))
    corpus = media.where(F.col("media_id") % _MM_DROP_MOD != 0)
    newb = media.where(F.col("media_id") % _MM_DROP_MOD == 0)
    cstats = byte_stats(corpus).where(F.col("n_bytes") >= _MM_MIN_BYTES)
    cgated = corpus.join(cstats.select("media_id"), "media_id")
    image_fps = ahash_fps(cgated.where(F.col("kind") == "image"))
    video_index = video_frame_index(cgated.where(F.col("kind") == "video"))
    audio_index = audio_window_index(cgated.where(F.col("kind") == "audio"))
    t.mark("plan setup")
    for name, f in (("image_fps", image_fps), ("video_index", video_index),
                    ("audio_index", audio_index)):
        f.persist(StorageLevel.MEMORY_AND_DISK).count()
        t.mark(f"index build: {name}")

    # ---- media_ingest_incremental body, serialized ----
    new_media = newb
    stats = byte_stats(new_media).where(F.col("n_bytes") >= MEDIA_MIN_BYTES)
    catalog = (new_media.select("media_id", "kind")
               .join(stats.select("media_id", "n_bytes"), "media_id")
               .persist(StorageLevel.MEMORY_AND_DISK))
    catalog.count()
    t.mark("catalog gate count")
    gated = new_media.join(catalog.select("media_id"), "media_id")
    bids = catalog.select("media_id")
    img_fps = ahash_fps(gated.where(F.col("kind") == "image")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    vid_sh = shingled_docs(frame_docs(
        gated.where(F.col("kind") == "video"))) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    aud_sh = shingled_docs(audio_docs(
        gated.where(F.col("kind") == "audio"))) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    img_fps.count()
    t.mark("stage img_fps")
    vid_safe = _auto_scale_safe(vid_sh)
    t.mark("stage vid_sh + decision")
    aud_safe = _auto_scale_safe(aud_sh)
    t.mark("stage aud_sh + decision")

    pair_frames = {}
    pair_frames["image"] = ahash_pairs_incremental(
        gated.where(F.col("kind") == "image"), image_fps, new_fps=img_fps)
    pair_frames["video"] = video_neardup_pairs_incremental(
        gated.where(F.col("kind") == "video"), video_index,
        scale_safe=vid_safe, batch_shingles=vid_sh)
    pair_frames["audio"] = audio_neardup_pairs_incremental(
        gated.where(F.col("kind") == "audio"), audio_index,
        scale_safe=aud_safe, batch_shingles=aud_sh)
    t.mark("pair plan setup (lazy)")

    outs = []
    for kind, a_col, b_col, keep in (
            ("image", "media_a", "media_b", "best"),
            ("video", "doc_a", "doc_b", "first"),
            ("audio", "doc_a", "doc_b", "first")):
        pairs = pair_frames[kind]
        cat_k = catalog.where(F.col("kind") == kind)
        p = (pairs.select(F.col(a_col).alias("pa"),
                          F.col(b_col).alias("pb"))
             .join(bids.select(F.col("media_id").alias("pa"),
                               F.lit(True).alias("_na")), "pa", "left")
             .join(bids.select(F.col("media_id").alias("pb"),
                               F.lit(True).alias("_nb")), "pb", "left")
             .persist(StorageLevel.MEMORY_AND_DISK))
        p.count()
        t.mark(f"{kind}: pair flag count")
        hit = (p.where(F.col("_nb").isNull())
               .select(F.col("pa").alias("doc"))
               .unionByName(p.where(F.col("_na").isNull())
                            .select(F.col("pb").alias("doc")))
               .distinct())
        bb = (p.where(F.col("_na").isNotNull() & F.col("_nb").isNotNull())
              .select(F.col("pa").alias("doc_a"),
                      F.col("pb").alias("doc_b")))
        clusters = dedup_clusters(bb)
        t.mark(f"{kind}: dedup_clusters")
        tainted = (clusters.join(hit, "doc", "left_semi")
                   .select("keep_id").distinct())
        taint_members = (clusters.join(tainted, "keep_id", "left_semi")
                         .select("doc"))
        drop0 = (hit.unionByName(taint_members).distinct()
                 .withColumnRenamed("doc", "media_id"))
        rest = cat_k.join(drop0, "media_id", "left_anti")
        if keep == "first":
            losers = (clusters.where(F.col("doc") != F.col("keep_id"))
                      .select(F.col("doc").alias("media_id")))
            out = rest.join(losers, "media_id", "left_anti")
        else:
            out = cluster_representatives(rest, clusters, F.col("n_bytes"),
                                          id_col="media_id")
        outs.append(out.localCheckpoint(eager=True))
        t.mark(f"{kind}: decision localCheckpoint")
        p.unpersist()
    res = (outs[0].unionByName(outs[1]).unionByName(outs[2])
           .select("media_id", "kind", "n_bytes"))
    n = res.count()
    t.mark(f"final union count ({n} rows)")
    t.report("mm_ingest_incremental (serialized)")


def main():
    from oracle_to_snowflake_etl_spark.session import get_spark
    from oracle_to_snowflake_etl_spark.sources.readers import load_table

    spark = get_spark("profile-mm")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF_DIR, "documents").count()
    profile_incr(spark)


if __name__ == "__main__":
    main()
