"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference ingests binary image buffers (Buffer ≤10 MB,
image-recognition.controller.ts:83-93) and decodes rasters via Jimp
(code-reader.service.ts:22-30).  At pipeline scale the same shape is an
opaque ``binary`` column with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``.

Decode support is tiered by what a container without codec libraries can
honestly do:

- **uncompressed rasters are REALLY decoded** in pure Python/numpy:
  binary PPM (netpbm ``P6``) and 24-bit BI_RGB BMP — header parse, pixel
  extraction, Rec.601 mean luma (``_decode_ppm`` / ``_decode_bmp``);
- compressed formats (JPEG/PNG) and audio/video remain STUBBED behind a
  deterministic fake seeded from the payload hash (``_decode_stub``) —
  swap for PIL/pyav in production.  The Spark-side plumbing (schema,
  batch shape, partitioning, UDF signature, per-row error isolation) is
  identical for both tiers and is what's under test.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources import load

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField("declared_w", IntegerType(), True),
        StructField("declared_h", IntegerType(), True),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("sha", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("error", StringType(), True),
    ]
)


def media_table(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic media table derived from documents: payload = utf-8
    bytes of the text (an opaque blob as far as the pipeline cares), typed
    metadata from doc columns."""
    docs = load(spark, sf, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        (F.col("n_chars") % 640 + 16).cast("int").alias("declared_w"),
        (F.col("n_chars") % 480 + 16).cast("int").alias("declared_h"),
    )


# Rec.601 luma weights (the classic Y' = 0.299R + 0.587G + 0.114B)
_LUMA = np.array([0.299, 0.587, 0.114])


def _decode_ppm(payload: bytes) -> dict:
    """Real decode of a binary netpbm PPM (``P6``): ASCII header of three
    integers (width, height, maxval; '#' comments allowed), one whitespace
    byte, then w*h RGB triplets.  Pure Python/numpy — no codec library."""
    tokens: list[int] = []
    i = 2  # past the P6 magic
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    w, h, maxval = tokens
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM maxval {maxval}")
    data = payload[i + 1 : i + 1 + w * h * 3]  # single whitespace after maxval
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    return {
        "width": w,
        "height": h,
        "mean_luma": float((px.astype(np.float64) @ _LUMA).mean() / maxval),
        "n_frames": 1,
    }


def _decode_bmp(payload: bytes) -> dict:
    """Real decode of an uncompressed 24-bit BI_RGB Windows BMP:
    BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), bottom-up BGR rows
    padded to 4-byte boundaries."""
    import struct

    off, hsz = struct.unpack_from("<I", payload, 10)[0], struct.unpack_from("<I", payload, 14)[0]
    if hsz < 40:
        raise ValueError(f"unsupported BMP header size {hsz}")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    height = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(payload) < off + stride * height:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=off
    ).reshape(height, stride)[:, : w * 3]
    px = rows.reshape(height, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h > 0:
        px = px[::-1]  # bottom-up storage order
    return {
        "width": w,
        "height": height,
        "mean_luma": float((px.astype(np.float64) @ _LUMA).mean() / 255.0),
        "n_frames": 1,
    }


def _decode(payload: bytes, media_type: str, w: int, h: int) -> dict:
    """Tiered dispatcher: real pure-Python decode for uncompressed rasters
    (magic-sniffed — PPM needs 'P6'+whitespace, BMP needs 'BM' plus a file
    size field matching the payload, so prose bytes can't false-positive),
    deterministic stub for everything else.  A payload that CLAIMS a real
    format but fails to parse surfaces as a decode error — never silently
    downgraded to the stub."""
    if payload[:2] == b"P6" and payload[2:3].isspace():
        return _decode_ppm(payload)
    if payload[:2] == b"BM" and len(payload) >= 54:
        import struct

        if struct.unpack_from("<I", payload, 2)[0] == len(payload):
            return _decode_bmp(payload)
    return _decode_stub(payload, media_type, w, h)


def _decode_stub(payload: bytes, media_type: str, w: int, h: int) -> dict:
    """Deterministic fake decode: derives pixel stats from the payload hash.
    In production this is PIL.Image.open / soundfile / pyav frame sampling —
    NotImplementedError-equivalent stub per the container's library set."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    digest = hashlib.sha256(payload).digest()
    rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
    mean_luma = float(rng.mean() / 255.0)
    n_frames = 1 if media_type == "image" else int(digest[0]) + 1
    return {"width": int(w), "height": int(h), "mean_luma": mean_luma, "n_frames": n_frames}


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for r in pdf.itertuples(index=False):
            payload = bytes(r.payload) if r.payload is not None else b""
            row = {
                "media_id": int(r.media_id),
                "media_type": r.media_type,
                "n_bytes": len(payload),
                "sha": hashlib.sha256(payload).hexdigest()[:16],
                "width": None,
                "height": None,
                "mean_luma": None,
                "n_frames": None,
                "error": None,
            }
            try:  # per-row isolation, mirroring the branch isolation rule
                feat = _decode(payload, r.media_type, r.declared_w, r.declared_h)
                row.update(feat)
            except Exception as e:
                row["error"] = f"decode_failed: {e}"
            out.append(row)
        yield pd.DataFrame(out, columns=[f.name for f in FEATURES.fields])


def media_features(spark: SparkSession, sf: str) -> DataFrame:
    """Binary decode/feature-extract over mapInPandas (Arrow batches)."""
    return media_table(spark, sf).mapInPandas(_extract_batches, schema=FEATURES)


def media_meta_sql(spark: SparkSession, sf: str) -> DataFrame:
    """The SQL-checkable half of the multimodal plumbing: byte length +
    content hash + type tagging of the binary column (no stubbed decode)."""
    m = media_table(spark, sf)
    return m.select(
        "media_id",
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.substring(F.sha2("payload", 256), 1, 16).alias("sha"),
        "declared_w",
        "declared_h",
    ).orderBy("media_id")
