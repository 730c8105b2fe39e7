"""Multimodal binary plumbing: the mapInPandas decode/feature path must be
deterministic, schema-stable, and per-row error-isolated (the stubbed decode
stands in for PIL/ffmpeg — the Spark-side contract is what's under test)."""

from pyspark.sql import functions as F

from ocr_mini_service_spark.operators import multimodal


def test_media_features_deterministic_and_total(spark, sf_dir):
    feats = multimodal.media_features(spark, sf_dir)
    n_docs = multimodal.media_table(spark, sf_dir).count()
    rows1 = {r["media_id"]: r for r in feats.collect()}
    rows2 = {r["media_id"]: r for r in feats.collect()}
    assert len(rows1) == n_docs
    assert rows1 == rows2  # stub decode is deterministic across runs

    ok = [r for r in rows1.values() if r["error"] is None]
    assert len(ok) == sum(1 for r in rows1.values() if r["n_bytes"] > 0)
    for r in ok:
        assert r["width"] is not None and r["height"] is not None
        assert 0.0 <= r["mean_luma"] <= 1.0
        assert (r["n_frames"] == 1) == (r["media_type"] == "image")


def test_media_features_error_isolation(spark):
    """An empty payload fails decode but the row completes with metadata +
    error (mirrors the reference's branch isolation,
    image-recognition.service.ts:164-173)."""
    bad = spark.createDataFrame(
        [(1, b"", "image", 32, 32), (2, b"x", "audio", 32, 32)],
        schema=multimodal.MEDIA,
    )
    out = {r["media_id"]: r for r in
           bad.mapInPandas(multimodal._extract_batches, schema=multimodal.FEATURES).collect()}
    assert out[1]["error"] and "decode_failed" in out[1]["error"]
    assert out[1]["sha"] is not None  # metadata half still produced
    assert out[2]["error"] is None and out[2]["n_frames"] >= 1
