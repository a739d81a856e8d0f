"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §7.5 / BASELINE.json "multimodal columns").

Model: media rows are (media_id, kind, payload: binary, meta: struct).
Decode / feature-extract run as **Arrow-batched mapInPandas** — the
correct Spark shape for per-blob Python work: executors stream
RecordBatches into pandas, Python sees columnar zero-copy buffers, and
the operator parallelizes per partition with no shuffle.

The container has no image/audio libraries, so the real decoders are
gated behind import-try (NotImplementedError with a clear message);
a DETERMINISTIC FAKE path (byte-level numpy stats, md5 frame ids)
exercises the full plumbing — schema, partitioning, UDF signature,
Arrow batch shape — and is value-checked against DuckDB where the
payload derives from ASCII text (byte == char there).

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


def image_features(media: DataFrame, fake_width: int = 16) -> DataFrame:
    """Decode images and emit (width, height, mean pixel).

    Real path requires PIL — not in this container — and raises
    NotImplementedError per the stub contract. The deterministic FAKE
    decoder treats the payload as a row-major uint8 grayscale image of
    width ``fake_width`` (truncating the ragged tail), so the plumbing
    (mapInPandas signature, struct schema, Arrow batches) runs and is
    testable end-to-end.
    """
    import numpy as np
    import pandas as pd

    try:  # pragma: no cover - not available in this container
        from PIL import Image  # noqa: F401
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
                if have_pil:
                    # Real decode would be:
                    #   img = Image.open(io.BytesIO(payload))
                    #   arr = np.asarray(img)
                    raise NotImplementedError(
                        "real image decode not wired in this environment; "
                        "fake decoder is the supported path here")
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
