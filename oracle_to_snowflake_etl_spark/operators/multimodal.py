"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §7.5 / BASELINE.json "multimodal columns").

Model: media rows are (media_id, kind, payload: binary, meta: struct).
Decode / feature-extract run as **Arrow-batched mapInPandas** — the
correct Spark shape for per-blob Python work: executors stream
RecordBatches into pandas, Python sees columnar zero-copy buffers, and
the operator parallelizes per partition with no shuffle.

Image decode is REAL for PNG via a pure-stdlib codec (zlib + struct;
``png_decode``/``png_encode`` below) — no imaging library needed, and
the mm_image_png_roundtrip oracle value-checks the decoded
width/height/mean end-to-end. Other formats (JPEG etc.) stay gated
behind a PIL import-try; audio/video decode remains out of scope. A
DETERMINISTIC FAKE path (byte-level numpy stats, md5 frame ids)
covers non-image payloads and is value-checked against DuckDB where
the payload derives from ASCII text (byte == char there).

Scale notes:
  - mapInPandas keeps blobs inside Arrow buffers end-to-end; tune
    spark.sql.execution.arrow.maxRecordsPerBatch for big payloads so a
    batch fits executor memory (default 10k rows is sized for ~KB blobs;
    at 100 TB of images you'd drop it to ~64-256).
  - All feature outputs that feed differential checks are integer sums
    (byte_sum, byte_sqsum) — order-independent and bit-exact, no float
    accumulation ambiguity.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: bytes per sampled "frame" and sampling stride (every Nth frame)
FRAME_SIZE = 32
FRAME_STEP = 3

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]), True),
])

BYTE_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("byte_sum", T.LongType(), True),
    T.StructField("byte_sqsum", T.LongType(), True),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_no", T.LongType(), False),
    T.StructField("frame_bytes", T.LongType(), False),
    T.StructField("frame_md5", T.StringType(), False),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_px", T.DoubleType(), True),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the driver's ``documents`` table into the media model:
    payload = UTF-8 bytes of the text, kind derived from the source id
    (src{N}: N%3 -> image/audio/video). Real pipelines would read blobs
    from object storage with `spark.read.format("binaryFile")` — the
    downstream operators only see (id, kind, payload, meta) either way."""
    kind = (F.substring("source", 4, 10).cast("int") % 3)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(kind == 0, "image").when(kind == 1, "audio")
         .otherwise("video").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("lang"), F.col("source"), F.col("n_chars"),
        ).alias("meta"),
    )


def byte_stats(media: DataFrame) -> DataFrame:
    """Per-payload byte statistics via Arrow-batched mapInPandas:
    (media_id, n_bytes, byte_sum, byte_sqsum). Integer outputs — exact
    and order-independent, so the differential harness can value-check
    the whole Python path."""
    import numpy as np
    import pandas as pd

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None))
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                rows.append((mid, len(arr), int(arr.sum()),
                             int((arr * arr).sum())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_bytes", "byte_sum", "byte_sqsum"])

    return media.select("media_id", "payload") \
                .mapInPandas(stats, schema=BYTE_STATS_SCHEMA)


def frame_sample(media: DataFrame, frame_size: int = FRAME_SIZE,
                 step: int = FRAME_STEP) -> DataFrame:
    """Sample every ``step``-th fixed-size byte chunk ("frame") of each
    payload: (media_id, frame_no, frame_bytes, frame_md5). The video
    frame-sampling shape — chunking + per-chunk digest — over Arrow
    batches; md5 gives a compact frame identity both engines can check."""
    import hashlib

    import pandas as pd

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = len(payload) // frame_size
                for fno in range(0, n_frames, step):
                    chunk = payload[fno * frame_size:(fno + 1) * frame_size]
                    rows.append((mid, fno, len(chunk),
                                 hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_no", "frame_bytes", "frame_md5"])

    return media.select("media_id", "payload") \
                .mapInPandas(frames, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec (zlib + struct + zlib.crc32) — makes the "real"
# image-decode branch capability-real in a container with no imaging
# libraries. Scope: 8-bit greyscale (color type 0) and RGB (color type
# 2), non-interlaced — the fixtures this repo generates; anything else
# raises ValueError and image_features falls through to its gates.
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_encode(img, filter_type: int = 0) -> bytes:
    """Minimal PNG writer for fixtures: 8-bit, greyscale (h x w array)
    or RGB (h x w x 3), non-interlaced, one IDAT, every scanline
    filtered with ``filter_type`` (0..4 — non-zero types exist so the
    decoder's unfilter paths are testable against a known image)."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        h, w, ch, ctype = a.shape[0], a.shape[1], 1, 0
        flat = a
    elif a.ndim == 3 and a.shape[2] == 3:
        h, w, ch, ctype = a.shape[0], a.shape[1], 3, 2
        flat = a.reshape(h, w * 3)
    else:
        raise ValueError("expected h x w (grey) or h x w x 3 (RGB)")
    # PNG filters are functions of the RAW (unfiltered) neighbor bytes,
    # so ENCODING vectorizes fully — no sequential dependency (unlike
    # decoding filters 1/3/4, which need reconstructed bytes). This is
    # the hot path: the mm_image_png_roundtrip driver query encodes
    # every corpus byte through here.
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter {filter_type}")
    raw = bytearray()
    lines = flat.astype(np.int64)
    prev_rows = np.vstack([np.zeros((1, w * ch), dtype=np.int64),
                           lines[:-1]])
    left = np.zeros_like(lines)
    left[:, ch:] = lines[:, :-ch]
    upleft = np.zeros_like(lines)
    upleft[:, ch:] = prev_rows[:, :-ch]
    if filter_type == 0:
        out = lines
    elif filter_type == 1:
        out = (lines - left) % 256
    elif filter_type == 2:
        out = (lines - prev_rows) % 256
    elif filter_type == 3:
        out = (lines - (left + prev_rows) // 2) % 256
    else:  # Paeth, elementwise
        p = left + prev_rows - upleft
        pa, pb, pc = (np.abs(p - left), np.abs(p - prev_rows),
                      np.abs(p - upleft))
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, prev_rows, upleft))
        out = (lines - pred) % 256
    out8 = out.astype(np.uint8)
    for y in range(h):
        raw.append(filter_type)
        raw.extend(out8[y].tobytes())

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def png_decode(payload: bytes):
    """Minimal PNG reader (stdlib only): returns (width, height,
    ndarray) — h x w uint8 for greyscale, h x w x 3 for RGB. Handles
    all five scanline filters; rejects (ValueError) interlacing,
    palettes, alpha, and non-8-bit depths — out-of-scope formats fail
    loudly instead of decoding wrong."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    # Contract: EVERY malformed input raises ValueError — a corrupt or
    # truncated payload bearing the PNG magic would otherwise surface
    # struct.error (short IHDR) or zlib.error (damaged IDAT), escape
    # image_features' except-ValueError fall-through, and kill the
    # whole Spark task instead of yielding null features.
    try:
        while pos + 8 <= len(payload):
            (ln,), tag = struct.unpack(">I", payload[pos:pos + 4]), \
                payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + ln]
            pos += 12 + ln
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt, interlace = \
                    struct.unpack(">IIBBBBB", data)
                if depth != 8 or ctype not in (0, 2) or interlace != 0:
                    raise ValueError(
                        f"unsupported PNG (depth={depth}, color={ctype}, "
                        f"interlace={interlace})")
                ch = 1 if ctype == 0 else 3
            elif tag == b"IDAT":
                idat.extend(data)
            elif tag == b"IEND":
                break
        if w is None:
            raise ValueError("no IHDR")
        raw = zlib.decompress(bytes(idat))
    except (struct.error, zlib.error) as exc:
        raise ValueError(f"malformed PNG: {exc}") from exc
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("bad IDAT length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).astype(np.int64)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prev) % 256
        else:
            rec = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a_ = int(rec[i - ch]) if i >= ch else 0
                b_ = int(prev[i])
                c_ = int(prev[i - ch]) if i >= ch else 0
                x = int(line[i])
                if ft == 1:
                    rec[i] = (x + a_) % 256
                elif ft == 3:
                    rec[i] = (x + (a_ + b_) // 2) % 256
                elif ft == 4:
                    rec[i] = (x + _paeth(a_, b_, c_)) % 256
                else:
                    raise ValueError(f"bad filter byte {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    if ch == 3:
        return w, h, out.reshape(h, w, 3)
    return w, h, out


def image_features(media: DataFrame, fake_width: int = 16) -> DataFrame:
    """Decode images and emit (width, height, mean pixel).

    Three branches per payload, most-capable first:
      1. REAL stdlib PNG decode (``png_decode``) when the payload
         carries the PNG signature — width/height from IHDR, mean over
         every decoded sample (all channels), exact integer sum / count
         so the value is differentially checkable (the
         mm_image_png_roundtrip oracle does exactly that).
      2. PIL, when importable, for other real formats (JPEG etc.) —
         absent in this container, import-try gated.
      3. The deterministic FAKE decoder otherwise: payload reinterpreted
         as a row-major uint8 greyscale image of width ``fake_width``
         (truncating the ragged tail) — keeps the plumbing (mapInPandas
         signature, struct schema, Arrow batches) testable on text-
         derived payloads, which can never carry the (non-ASCII) PNG
         magic.
    """
    import numpy as np
    import pandas as pd

    try:  # pragma: no cover - not available in this container
        from PIL import Image
        have_pil = True
    except ImportError:
        have_pil = False

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None))
                    continue
                is_png = bytes(payload[:8]) == PNG_MAGIC
                if is_png:
                    try:
                        w, h, arr = png_decode(bytes(payload))
                        rows.append(
                            (mid, w, h,
                             int(arr.astype(np.int64).sum()) / arr.size))
                        continue
                    except ValueError:
                        # out-of-codec-scope PNG (palette, alpha,
                        # 16-bit, interlaced): fall through to PIL when
                        # present, else nulls below — a real-but-
                        # undecodable image must not be reinterpreted
                        # by the fake grayscale path (silent garbage
                        # features) nor kill the query
                        pass
                if have_pil:  # pragma: no cover - PIL-bearing clusters
                    import io

                    arr = np.asarray(Image.open(io.BytesIO(bytes(payload))))
                    rows.append((mid, arr.shape[1], arr.shape[0],
                                 int(arr.astype(np.int64).sum()) / arr.size))
                    continue
                if is_png:
                    rows.append((mid, None, None, None))
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                h = len(arr) // fake_width
                if h == 0:
                    rows.append((mid, None, None, None))
                    continue
                img = arr[: h * fake_width].reshape(h, fake_width)
                # exact integer sum / exact count -> one IEEE division:
                # bit-identical to the DuckDB oracle (np.mean's pairwise
                # float summation would not be)
                rows.append((mid, fake_width, h,
                             int(img.astype(np.int64).sum()) / img.size))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "mean_px"])

    return media.select("media_id", "payload") \
                .mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


def media_as_png(media: DataFrame, width: int = 16) -> DataFrame:
    """Re-encode each payload's bytes as a REAL PNG: the byte stream
    becomes a ``width``-wide 8-bit greyscale image (ragged tail
    truncated; payloads shorter than one row are dropped). Exists so a
    differential oracle can reach the real decode branch — pixel
    values equal the original bytes, so DuckDB can predict
    width/height/mean with codepoint arithmetic while Spark runs the
    full encode→decode round trip through Arrow batches."""
    import pandas as pd

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])

    def encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                h = len(arr) // width
                if h == 0:
                    continue
                img = arr[: h * width].reshape(h, width)
                rows.append((mid, png_encode(img)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return media.select("media_id", "payload") \
                .mapInPandas(encode, schema=out_schema)


#: aHash geometry: 15 row-blocks x 4 col-blocks = 60 bits — deliberately
#: the repo's hash60/SimHash width, so the SAME lossless 4x15-bit chunk
#: banding (pigeonhole: hamming <= 3 => >= 1 identical chunk) generates
#: candidates for image near-dup exactly as simhash_pairs does for text.
AHASH_ROW_BLOCKS = 15
AHASH_COL_BLOCKS = 4

AHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("ahash", T.LongType(), True),
])


def _ahash_from_gray(img) -> int | None:
    """60-bit average hash of a 2-D integer image: truncate to
    15*(h//15) rows x 4*(w//4) cols, sum each of the 15x4 blocks, and
    set bit k = r*4+c iff 60*block_sum_k > total_sum. ALL-INTEGER by
    construction (the mean comparison is cross-multiplied, never a
    float division), so any engine that can sum the same pixels
    computes the identical fingerprint — the cross-engine discipline
    of functions/hashing.py applied to perceptual hashing. Returns
    None when the image has fewer than 15 rows or 4 cols (no stable
    geometry to hash)."""
    import numpy as np

    h, w = img.shape
    hb, wb = h // AHASH_ROW_BLOCKS, w // AHASH_COL_BLOCKS
    if hb == 0 or wb == 0:
        return None
    t = img[: AHASH_ROW_BLOCKS * hb, : AHASH_COL_BLOCKS * wb].astype(np.int64)
    blocks = t.reshape(AHASH_ROW_BLOCKS, hb, AHASH_COL_BLOCKS, wb) \
              .sum(axis=(1, 3))
    total = int(blocks.sum())
    fp = 0
    for r in range(AHASH_ROW_BLOCKS):
        for c in range(AHASH_COL_BLOCKS):
            if 60 * int(blocks[r, c]) > total:
                fp |= 1 << (r * AHASH_COL_BLOCKS + c)
    return fp


def image_ahash(media: DataFrame, fake_width: int = 16) -> DataFrame:
    """(media_id, ahash): 60-bit perceptual average-hash per image —
    the image-space analog of with_simhash. Same three decode branches
    as :func:`image_features` (real PNG -> png_decode; PIL when
    importable; deterministic fake ``fake_width``-wide grayscale
    otherwise); color images hash the per-pixel CHANNEL SUM (no
    division — integers all the way down). Undecodable or
    too-small-to-block payloads emit NULL, like image_features' nulls.

    A brightness-threshold aHash is the standard cheap image near-dup
    fingerprint (resize-and-compare family); bit k answers "is block k
    brighter than the image average", which survives re-encoding and
    minor edits — exactly the invariance a crawl-dedup pass wants.
    """
    import numpy as np
    import pandas as pd

    try:  # pragma: no cover - not available in this container
        from PIL import Image
        have_pil = True
    except ImportError:
        have_pil = False

    def hashes(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None))
                    continue
                is_png = bytes(payload[:8]) == PNG_MAGIC
                img = None
                if is_png:
                    try:
                        _, _, arr = png_decode(bytes(payload))
                        img = (arr.astype(np.int64).sum(axis=2)
                               if arr.ndim == 3 else arr)
                    except ValueError:
                        img = None  # real-but-undecodable: NULL below
                elif have_pil:  # pragma: no cover - PIL-bearing clusters
                    import io

                    arr = np.asarray(Image.open(io.BytesIO(bytes(payload))))
                    img = (arr.astype(np.int64).sum(axis=2)
                           if arr.ndim == 3 else arr)
                else:
                    arr = np.frombuffer(payload, dtype=np.uint8)
                    h = len(arr) // fake_width
                    if h > 0:
                        img = arr[: h * fake_width].reshape(h, fake_width)
                rows.append((mid, None if img is None
                             else _ahash_from_gray(img)))
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    return media.select("media_id", "payload") \
                .mapInPandas(hashes, schema=AHASH_SCHEMA)


def ahash_pairs(media: DataFrame, max_hamming: int = 3,
                fake_width: int = 16) -> DataFrame:
    """Image near-duplicate pairs: (media_a, media_b, hamming) with
    Hamming(ahash_a, ahash_b) <= max_hamming. Candidates via the same
    lossless 4x15-bit chunk banding as text SimHash (pigeonhole:
    hamming <= 3 forces an identical chunk), exact bit_count(xor)
    verification — shuffle volume O(images x 4) band keys, never an
    image cross-join, and payload bytes never shuffle at all (the hash
    is computed in the map pass; only (id, 60-bit fp) moves)."""
    from .dedup import SIMHASH_CHUNK_BITS, SIMHASH_CHUNKS
    from .util import bucket_pairs

    fps = image_ahash(media, fake_width=fake_width) \
        .where(F.col("ahash").isNotNull()) \
        .withColumnRenamed("media_id", "doc") \
        .withColumnRenamed("ahash", "fp")
    chunks = fps.select(
        "doc", "fp",
        F.posexplode(F.array(*[
            F.expr(f"(fp >> {c * SIMHASH_CHUNK_BITS})"
                   f" & {(1 << SIMHASH_CHUNK_BITS) - 1}")
            for c in range(SIMHASH_CHUNKS)])).alias("chunk", "cv"))
    return (
        bucket_pairs(chunks, ["chunk", "cv"], ["doc", "fp"])
        .select(F.col("doc_a").alias("media_a"),
                F.col("doc_b").alias("media_b"),
                F.expr("bit_count(fp_a ^ fp_b)").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def frame_docs(media: DataFrame) -> DataFrame:
    """(doc_id, text): each media payload reduced to its SAMPLED FRAME
    DIGEST SEQUENCE — frame_sample's md5s in frame order, space-joined.
    This is the standard video-dedup reduction: a video becomes a
    "document" whose tokens are content-addressed frame fingerprints,
    and every text set-similarity operator (Jaccard, containment,
    MinHash) applies verbatim to the video modality. One hash shuffle
    on media_id (the per-media digest collect); payload bytes die in
    frame_sample's map pass — only 32-char digests move."""
    frames = frame_sample(media)
    return (frames.groupBy("media_id")
            .agg(F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(
                        F.struct("frame_no", "frame_md5"))),
                    lambda s: s["frame_md5"]),
                " ").alias("text"))
            .select(F.col("media_id").alias("doc_id"), "text"))


def video_neardup_pairs(media: DataFrame,
                        threshold: float = 0.3) -> DataFrame:
    """Video near-duplicate pairs: 3-frame-run shingle Jaccard >=
    ``threshold`` over the sampled frame-digest sequence — literally
    operators/dedup.ngram_jaccard_pairs on :func:`frame_docs` output,
    so the candidate generation inherits the lossless All-Pairs prefix
    filter and its scale contract unchanged. Temporal-order sensitive
    BY DESIGN: a shingle is a run of 3 consecutive sampled frames, so
    two videos match on shared SEGMENTS (re-encodes, trims, recuts
    with common footage), not on a bag of frames."""
    from .dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(frame_docs(media), threshold=threshold)
