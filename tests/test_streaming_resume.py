"""Incremental (Structured Streaming) drain + checkpoint resume, and the
batch manifest resume path: no duplicates, no missing turns (SURVEY §5.2
item 4)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ocr_mini_service_spark.manifest import bucket_expr, committed_buckets, run_with_manifest
from ocr_mini_service_spark.schema import TRANSCRIPTS
from ocr_mini_service_spark.streaming import run_incremental
from ocr_mini_service_spark.synth import gen_transcripts


@pytest.fixture(scope="module")
def pdfs():
    df = gen_transcripts(300, seed=7)
    return df.iloc[:150], df.iloc[150:]


def test_streaming_availablenow_resume(spark, tmp_path, pdfs):
    first, second = pdfs
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(inp)
    pq.write_table(pa.Table.from_pandas(first, preserve_index=False), f"{inp}/a.parquet")

    run_incremental(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == len(first)

    # new file arrives; same checkpoint → only the delta is processed
    pq.write_table(pa.Table.from_pandas(second, preserve_index=False), f"{inp}/b.parquet")
    run_incremental(spark, inp, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == len(first) + len(second)
    # no duplicates
    assert got.select("conv_id", "turn_idx").distinct().count() == len(first) + len(second)


def test_manifest_partial_then_resume(spark, tmp_path, pdfs):
    """Simulated crash: first run covers only half the buckets (input
    pre-filtered), second run with resume completes the rest; the final table
    is complete and duplicate-free."""
    first, second = pdfs
    import pandas as pd

    full_pd = pd.concat([first, second], ignore_index=True)
    full = spark.createDataFrame(full_pd, schema=TRANSCRIPTS)
    out = str(tmp_path / "mout")
    n_buckets = 8

    partial = full.withColumn("b", bucket_expr(n_buckets)).filter(F.col("b") < 4).drop("b")
    stats1 = run_with_manifest(spark, partial, out, n_buckets=n_buckets)
    assert 0 < stats1["buckets_done"] <= 4
    assert committed_buckets(spark, out) == set(range(0, 4)) & committed_buckets(spark, out)

    stats2 = run_with_manifest(spark, full, out, n_buckets=n_buckets, resume=True)
    assert stats2["buckets_skipped"] == stats1["buckets_done"]

    got = spark.read.parquet(out)
    assert got.count() == len(full_pd)
    assert got.select("conv_id", "turn_idx").distinct().count() == len(full_pd)
