"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference ingests binary image buffers (Buffer ≤10 MB,
image-recognition.controller.ts:83-93) and decodes rasters via Jimp
(code-reader.service.ts:22-30).  At pipeline scale the same shape is an
opaque ``binary`` column with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``.

The image/audio codec libraries are not in this container, so the decode
step is STUBBED behind a deterministic fake (seeded from the payload hash)
— the Spark-side plumbing (schema, batch shape, partitioning, UDF
signature) is real and tested; swap ``_decode_stub`` for a PIL/ffmpeg call
in production.
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
                feat = _decode_stub(payload, r.media_type, r.declared_w, r.declared_h)
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
