"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata struct
(mime, width/height or sample_rate/duration, source).  The Spark-side
plumbing — schema, partition sizing, Arrow batch shape, mapInPandas
signatures — is real and tested.  The decode step has two paths:

* **real** (``fake=False``): a genuine pure-stdlib image decoder for PNG
  (zlib inflate + full scanline unfiltering, filter types 0-4, color types
  0/2/3/4/6 at bit depth 8) and binary PPM (P6), producing pixel-statistics
  feature vectors.  Formats needing external codecs (JPEG/WebP/audio/video)
  yield a null feature (data-level failure, never a job-level crash) — in a
  real deployment a PIL/ffmpeg decode slots into the same batch function.
* **fake** (``fake=True``): a deterministic hash-derived feature so the
  DuckDB oracle can reproduce the gate query without a PNG decoder.

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


def decode_stub(payload: bytes, fake: bool) -> list[float] | None:
    """Decode/feature-extract one payload.

    ``fake=True``: deterministic 8-dim hash feature (oracle-reproducible).
    ``fake=False``: real decode via :func:`decode_image` (PNG/PPM); formats
    this container cannot decode (JPEG/audio/video need external codecs)
    return None — a data-level null feature, not a job failure."""
    if fake:
        h = hashlib.sha256(payload or b"").digest()
        return [b / 255.0 for b in h[:8]]
    img = decode_image(payload)
    return image_features(img) if img is not None else None


# ---------------------------------------------------------------------------
# real decode: pure-stdlib PNG + PPM (no external codec libraries)
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (bit depth 8, no interlace)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int):
    """Undo PNG scanline filtering (spec §6: None/Sub/Up/Average/Paeth).

    Per-row numpy where the filter allows (None/Up are whole-row ops, Sub
    is a per-residue-class cumulative sum); Average/Paeth are inherently
    sequential per byte.  This runs inside the Arrow-batched decode, so the
    Python cost is per image, amortized over the batch."""
    import numpy as np

    stride = width * bpp
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8,
                            offset=pos + 1, count=stride).copy()
        pos += 1 + stride
        if ftype == 0:                               # None
            pass
        elif ftype == 1:                             # Sub
            for c in range(bpp):
                np.add.accumulate(row[c::bpp], out=row[c::bpp], dtype=np.uint8)
        elif ftype == 2:                             # Up
            row += prev
        elif ftype == 3:                             # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:                             # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(out[y - 1, x - bpp]) if (x >= bpp and y > 0) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = row
        prev = row
    return out


def decode_png(payload: bytes):
    """Pure-stdlib PNG decode -> uint8 pixel array (H, W, C).

    Supports bit depth 8, color types 0/2/3/4/6, no interlace — the shapes
    every screenshot/thumbnail pipeline emits.  Raises ValueError on
    malformed data; returns the pixel array on success."""
    import struct as _struct
    import zlib

    import numpy as np

    if not payload or not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, ihdr, idat, plte = len(_PNG_MAGIC), None, [], None
    while pos + 8 <= len(payload):
        length, ctype = _struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length                           # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = _struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG shape (depth={depth} color={color} "
            f"interlace={interlace}); supported: depth 8, color 0/2/3/4/6, "
            f"no interlace")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    bpp = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    px = _png_unfilter(raw, width, height, bpp).reshape(height, width, bpp)
    if color == 3:                                   # palette -> RGB
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
    return px


def decode_ppm(payload: bytes):
    """Binary PPM (P6) decode -> uint8 pixel array (H, W, 3)."""
    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: P6 <width> <height> <maxval> then one whitespace byte
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":             # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                         # single ws after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    need = width * height * 3
    if len(payload) - pos < need:
        raise ValueError("truncated PPM")
    return np.frombuffer(payload, dtype=np.uint8, offset=pos,
                         count=need).reshape(height, width, 3)


def decode_image(payload: bytes):
    """Magic-byte dispatch -> pixel array, or None when the format needs a
    codec this container lacks or the data is malformed."""
    if not payload:
        return None
    try:
        if payload.startswith(_PNG_MAGIC):
            return decode_png(payload)
        if payload.startswith(b"P6"):
            return decode_ppm(payload)
    except Exception:        # malformed image is a DATA problem (zlib.error,
        return None          # ValueError, IndexError...) — null, don't crash
    return None


def image_features(px) -> list[float]:
    """8-dim pixel-statistics feature from a (H, W, C) uint8 array:
    [width, height, channels, mean, std, dark fraction (<64),
    bright fraction (>192), mean |horizontal gradient|] — all intensity
    stats over the luminance plane, normalized to [0, 1] where bounded."""
    import numpy as np

    h, w, c = px.shape
    lum = px[:, :, :3].mean(axis=2) if c >= 3 else px[:, :, 0].astype("f8")
    grad = float(np.abs(np.diff(lum, axis=1)).mean()) if w > 1 else 0.0
    return [float(w), float(h), float(c),
            float(lum.mean()) / 255.0, float(lum.std()) / 255.0,
            float((lum < 64).mean()), float((lum > 192).mean()),
            grad / 255.0]


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
