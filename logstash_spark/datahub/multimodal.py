"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata struct
(mime, width/height or sample_rate/duration, source).  The Spark-side
plumbing — schema, partition sizing, Arrow batch shape, mapInPandas
signatures — is real and tested; the actual codec step is STUBBED behind
`decode_stub` (the image/audio libraries are not in this container): it
raises NotImplementedError unless `fake=True`, in which case it produces a
deterministic fake feature vector from the bytes (so downstream pipelines
and tests are runnable end to end).

Design notes for 100 TB:
 * binary payloads dominate row size -> repartition by target batch bytes
   before mapInPandas so each Arrow batch holds ~64 MB of payload;
 * decode is the rare legitimately-Python stage: mapInPandas with Arrow
   transfer, one python worker per core, no per-row overhead;
 * metadata-only queries must never touch the payload column: keep payload
   in its own column so Parquet column pruning skips the bytes entirely.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mime", StringType()),
    StructField("meta", StructType([
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ])),
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mime", StringType()),
    # double (not float32): keeps the stub's h/255.0 values exactly
    # reproducible by the SQL oracle
    StructField("feat", ArrayType(DoubleType())),
    StructField("payload_sha", StringType()),
])


def synthesize_media(df: DataFrame, id_col: str, text_col: str,
                     mime: str = "image/fake") -> DataFrame:
    """Build a media table from any text table: payload = utf8 bytes of the
    text (deterministic stand-in for real image bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(mime).alias("mime"),
        F.struct(
            F.length(text_col).cast("long").alias("width"),
            F.lit(1).cast("long").alias("height"),
            F.lit(1).cast("long").alias("n_frames"),
        ).alias("meta"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_stub(payload: bytes, fake: bool) -> list[float]:
    """STUB decode/feature-extract.  Real deployment plugs a PIL/ffmpeg
    decode here; this container has neither, so `fake=True` derives a
    deterministic 8-dim feature from the payload hash."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this environment; pass fake=True for the deterministic stub")
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(media: DataFrame, fake: bool = True,
                     batch_target_rows: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    The per-batch function is vectorized over the pandas column (list
    comprehension over a batch, not a per-row UDF call); payload bytes ship
    once via Arrow."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            # re-chunk to batch_target_rows: Arrow ships whatever batch
            # size the scan produced, and with multi-MB payloads a big
            # batch would hold (rows x payload) in memory at once —
            # bounding the slice bounds peak executor memory
            for lo in range(0, len(pdf), batch_target_rows):
                chunk = pdf.iloc[lo:lo + batch_target_rows]
                feats = [decode_stub(p, fake) for p in chunk["payload"]]
                shas = [hashlib.sha256(p or b"").hexdigest()
                        for p in chunk["payload"]]
                yield pd.DataFrame({
                    "media_id": chunk["media_id"],
                    "mime": chunk["mime"],
                    "feat": feats,
                    "payload_sha": shas,
                })

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: explode n_frames into frame indices and keep
    every_n-th — payload stays unexploded (pruned) until decode time."""
    return (
        media.select("media_id", "mime",
                     F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1))
                     .alias("frame_idx"))
        .filter(F.pmod("frame_idx", F.lit(every_n)) == 0)
    )
