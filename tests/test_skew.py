"""Skew handling (north rule: "salted repartitioning for skewed long
conversations"; SURVEY.md §4.2): a pathologically long conversation must
spread over multiple buckets — bounded by SALT_FACTOR — instead of
serializing one task, while short conversations stay co-located (≤ their
turn count, typically a handful of buckets)."""

from pyspark.sql import functions as F

from ocr_mini_service_spark.manifest import SALT_FACTOR, bucket_expr
from ocr_mini_service_spark.synth import gen_transcripts


def test_long_conversation_spreads_over_salted_buckets(spark):
    pdf = gen_transcripts(5000, edge_cases=False)  # conv 0 has 1000 turns (Zipf head)
    df = spark.createDataFrame(pdf).withColumn("bucket", bucket_expr(64))
    per_conv = (
        df.groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"), F.countDistinct("bucket").alias("n_buckets"))
        .collect()
    )
    big = [r for r in per_conv if r["n_turns"] >= 500]
    assert big, "fixture should contain a long conversation"
    for r in big:
        # spread: enough buckets that no single task owns the conversation...
        assert r["n_buckets"] >= SALT_FACTOR // 2, r
        # ...but bounded by the salt factor (co-location survives)
        assert r["n_buckets"] <= SALT_FACTOR, r
    small = [r for r in per_conv if r["n_turns"] <= 4]
    for r in small:
        assert r["n_buckets"] <= r["n_turns"], r


def test_bucket_load_is_balanced(spark):
    pdf = gen_transcripts(20000)
    df = spark.createDataFrame(pdf).withColumn("bucket", bucket_expr(64))
    counts = [r["n"] for r in df.groupBy("bucket").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 64
    mean = sum(counts) / len(counts)
    # no serializing hot bucket: the 4000-turn skew conversation (20% of all
    # rows) lands on ~SALT_FACTOR buckets, so the worst bucket stays within a
    # small multiple of the mean (AQE additionally splits residual skew)
    assert max(counts) < 2.5 * mean, (max(counts), mean)
