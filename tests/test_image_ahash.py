"""Perceptual aHash image near-dup (operators/multimodal.py
image_ahash / ahash_pairs): planted-duplicate capture, perturbation
tolerance, geometry guards, and the real-PNG decode branch."""
from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.operators.multimodal import (
    _ahash_from_gray,
    ahash_pairs,
    image_ahash,
    media_from_documents,
)


def _media(spark, rows):
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long")
    return media_from_documents(docs)


def test_identical_payloads_hash_equal_and_pair_at_hamming_zero(spark):
    base = ("the quick brown fox jumps over the lazy dog " * 8)[:320]
    media = _media(spark, [(1, base), (2, base), (3, "Z" * 320)])
    pairs = {(r.media_a, r.media_b, r.hamming)
             for r in ahash_pairs(media).collect()}
    assert (1, 2, 0) in pairs
    assert not any({a, b} == {1, 3} for a, b, _ in pairs)


def test_small_perturbation_small_hamming(spark):
    import numpy as np

    base = np.arange(320, dtype=np.int64).reshape(20, 16) % 251
    fp0 = _ahash_from_gray(base)
    bumped = base.copy()
    bumped[0, 0] += 3  # one pixel nudged: at most the one block flips
    fp1 = _ahash_from_gray(bumped)
    assert bin(fp0 ^ fp1).count("1") <= 1
    # global brightness shift preserves every "block vs mean" decision
    assert _ahash_from_gray(base + 40) == fp0


def test_too_small_geometry_is_null(spark):
    # < 15 rows of 16 bytes -> no stable blocks -> NULL, not garbage
    media = _media(spark, [(1, "x" * 100), (2, "y" * 239), (3, "z" * 240)])
    got = {r.media_id: r.ahash for r in image_ahash(media).collect()}
    assert got[1] is None and got[2] is None
    assert got[3] is not None


def test_png_branch_matches_fake_branch(spark):
    """The SAME bytes hashed through the REAL PNG decode branch
    (media_as_png -> png_decode) and through the fake 16-wide branch
    must produce the identical fingerprint — pixel values survive the
    encode/decode round trip exactly."""
    from oracle_to_snowflake_etl_spark.operators.multimodal import (
        media_as_png,
    )

    base = ("a structured sentence with varied characters 0123456789 "
            * 10)[:480]
    media = _media(spark, [(7, base)])
    fake = {r.media_id: r.ahash for r in image_ahash(media).collect()}
    png = {r.media_id: r.ahash
           for r in image_ahash(media_as_png(media)).collect()}
    assert fake[7] is not None
    assert png[7] == fake[7]


def test_banding_is_lossless_at_hamming_3(spark):
    """Adversarial: two fingerprints differing in exactly 3 bits spread
    over 3 DIFFERENT chunks must still pair (the 4th chunk is
    identical — pigeonhole)."""
    import numpy as np

    rng = np.random.RandomState(7)
    img = (rng.randint(0, 256, size=(30, 16))).astype(np.int64)
    fp = _ahash_from_gray(img)
    # flip 3 bits in chunks 0,1,2 by crafting a second hash directly:
    # pair generation runs on hashes, so drive ahash_pairs' banding
    # through a frame built from the two fps via the internal shape
    from oracle_to_snowflake_etl_spark.operators.dedup import (
        SIMHASH_CHUNK_BITS,
    )

    fp2 = fp ^ (1 << 0) ^ (1 << SIMHASH_CHUNK_BITS) \
             ^ (1 << (2 * SIMHASH_CHUNK_BITS))
    # feed through the public pair path by planting payloads whose
    # hashes are fp/fp2 is impractical; assert the pigeonhole on the
    # chunk keys directly instead
    chunks1 = [(fp >> (c * 15)) & 32767 for c in range(4)]
    chunks2 = [(fp2 >> (c * 15)) & 32767 for c in range(4)]
    assert any(a == b for a, b in zip(chunks1, chunks2))
    assert bin(fp ^ fp2).count("1") == 3


def test_video_neardup_shared_segment(spark):
    """Two 'videos' sharing a long common segment (but different
    endings) must pair on 3-frame-run shingles; a third with disjoint
    content must not. Frame boundaries are 32-byte aligned, so the
    shared prefix guarantees shared sampled-frame runs."""
    from oracle_to_snowflake_etl_spark.operators.multimodal import (
        video_neardup_pairs,
    )

    seg = "".join(chr(65 + (i % 26)) for i in range(32 * 30))  # 30 frames
    a = seg + "1" * 64
    b = seg + "2" * 64
    c = "".join(chr(97 + (i * 7 % 26)) for i in range(32 * 32))
    media = _media(spark, [(1, a), (2, b), (3, c)])
    pairs = {(r.doc_a, r.doc_b) for r in video_neardup_pairs(media).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_frame_docs_order_is_frame_order(spark):
    """frame_docs joins digests in frame_no order regardless of
    partitioning — the shingle semantics depend on it."""
    from oracle_to_snowflake_etl_spark.operators.multimodal import (
        frame_docs,
    )
    import hashlib

    text = "".join(chr(48 + (i % 10)) for i in range(32 * 9))  # 9 frames
    media = _media(spark, [(5, text)])
    got = frame_docs(media).collect()[0]["text"]
    expect = " ".join(
        hashlib.md5(text[f * 32:(f + 1) * 32].encode()).hexdigest()
        for f in range(0, 9, 3))
    assert got == expect
