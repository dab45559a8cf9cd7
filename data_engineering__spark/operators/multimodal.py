"""Multimodal binary columns (SURVEY §2.12 L5 + EXT mandate).

Images/audio/video are opaque ``binary`` columns + typed metadata structs.
The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual codecs (PIL/ffmpeg/librosa) are
NOT in this container, so the decode kernels are clearly-marked deterministic
fakes behind the same interface (swap the kernel, keep the plan).

Scale notes:
- binary payloads ride in parquet/Arrow pages; NEVER groupBy/shuffle on a
  binary body — shuffle metadata + content hash instead, join bodies back by
  id afterwards.
- decode/feature-extract runs in ``mapInPandas``: one Arrow batch per call,
  bounded memory via ``spark.sql.execution.arrow.maxRecordsPerBatch``;
  repartition upstream so batches are even (media sizes are heavy-tailed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),      # image | audio | video
    T.StructField("mime_type", T.StringType(), True),
    T.StructField("content", T.BinaryType(), True),         # opaque payload
    T.StructField("meta", T.StructType([                    # typed metadata
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),
    T.StructField("content_sha", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """L5 source: ``binaryFile`` scan → (path, modificationTime, length,
    content). Path/length predicates push down; content is lazily read."""
    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", glob).load(path))


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no codec libs in container):
    payload bytes are a seeded function of media_id, so every test run and
    every executor sees identical data."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3 + 1).cast("int")).alias("modality"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.encode(F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256),
                 "utf-8").cast("binary").alias("content"),
    )
    return df.withColumn("meta", F.struct(
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        (F.col("media_id") * 1000).alias("duration_ms"),
        F.lit(16000).alias("sample_rate")))


def _decode_kernel(content: bytes, modality: str) -> list[float]:
    """STUB DECODE KERNEL — deterministic fake.

    Real deployment: PIL.Image.open / librosa.load / pyav frame-sample here.
    Those libraries are not installed in this container, so we derive a
    deterministic 8-dim "feature" from the payload bytes. The UDF interface,
    batch shape, and schema are exactly what the real kernel would use.
    """
    if content is None:
        # MEDIA_SCHEMA declares content nullable; FEATURE_SCHEMA allows a
        # NULL feature — a null payload degrades to a null feature row
        # instead of failing the whole mapInPandas stage.
        return None
    acc = [0.0] * 8
    for i, byte in enumerate(content[:256]):
        acc[i % 8] += float(byte)
    return [round(v / 255.0, 6) for v in acc]


def extract_features(media: DataFrame) -> DataFrame:
    """L5 feature extraction over ``mapInPandas`` (1→1 rows, Arrow-batched).

    The pandas function receives an iterator of record batches — constant
    memory regardless of partition size. Binary bodies never shuffle: this
    is a map-only stage.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "content_sha": pdf["content"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest() if b is not None else None),
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                "feature": [
                    _decode_kernel(bytes(c) if c is not None else None, m)
                    for c, m in zip(pdf["content"], pdf["modality"])
                ],
            })
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """L5 video frame-sampling PLAN: 1→N row expansion computed from typed
    metadata (duration), with the frame DECODE left to the stubbed kernel.
    The expansion itself is codegen (sequence + explode) — the expensive
    part at scale is planned correctly even with a fake decoder."""
    frames = F.sequence(F.lit(0), F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
    return (media.filter(F.col("modality") == "video")
            .select("media_id", F.explode(frames).alias("frame_idx"))
            .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms))


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """L5 image resize over ``mapInPandas`` — STUB KERNEL (real deployment:
    ``PIL.Image.resize`` / cv2; not installed in this container). The fake
    is deterministic (digest of payload + target dims) so tests pin the
    plumbing: same MEDIA_SCHEMA out, ``meta.width/height`` rewritten to the
    target, non-image rows pass through untouched, NULL payload → NULL
    payload (stage survives).

    Scale: map-only (no shuffle of binary bodies); output payload size is
    bounded by the target dims in the real kernel, so this stage SHRINKS
    the data — run it before any wide op that carries content."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"{width}x{height}".encode()
        for pdf in batches:
            is_img = pdf["modality"] == "image"
            pdf = pdf.copy()
            pdf["content"] = [
                (hashlib.sha256(bytes(c) + tag).digest()
                 if img and c is not None else c)
                for c, img in zip(pdf["content"], is_img)]
            pdf["meta"] = [
                ({**m, "width": width, "height": height} if img and m is not None
                 else m)
                for m, img in zip(pdf["meta"], is_img)]
            yield pdf

    return media.mapInPandas(run, schema=media.schema)
