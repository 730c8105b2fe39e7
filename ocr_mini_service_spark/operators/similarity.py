"""Similarity search over the embeddings table (array<float> column).

Quantized-integer scoring: components are quantized to round(x*1000) so dot
products are exact 64-bit integer sums — order-independent, so Spark and
DuckDB (and any execution order) agree bit-for-bit, and top-k ranking is fully
deterministic with the (score desc, vec_id asc) tiebreak.

Scale path: brute force is O(Q·N) with Q broadcast — right up to ~10^5
queries; beyond that the LSH-bucketed variant joins on sign-random-projection
buckets so each query only scores its bucket collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import ordered
from ..sources import load

N_QUERIES = 5
TOP_K = 5


def _qdot(a, b):
    """Exact integer dot product of two quantized float arrays."""
    prod = F.zip_with(
        a,
        b,
        lambda x, y: F.round(x.cast("double") * 1000).cast("long")
        * F.round(y.cast("double") * 1000).cast("long"),
    )
    return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, v: acc + v)


def ann_bruteforce_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force top-k by quantized dot product: queries (vec_id < N)
    broadcast-cross-joined against the corpus."""
    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("v"))
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "neighbor_id",
        _qdot(F.col("q"), F.col("v")).alias("score"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "score")
        .transform(lambda df: ordered(df, "query_id", "rank"))
    )


def ann_lsh_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Sign-projection LSH bucketing (the ANN scale path): bucket id = sign
    bits of 4 deterministic pseudo-random hyperplanes (components derived from
    a rolling arithmetic sequence, so the oracle reproduces them); neighbors
    are scored only within the query's bucket."""
    emb = load(spark, sf, "embeddings")

    def plane_dot(vec, p):
        # hyperplane p component i = ((i*a_p + b_p) mod 97) - 48  (deterministic ints)
        a, b = [(17, 3), (29, 11), (41, 23), (53, 31)][p]
        prod = F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, i: F.round(x.cast("double") * 1000).cast("long")
            * ((i * a + b) % 97 - 48),
        )
        return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, v: acc + v)

    def bucket(vec):
        bits = [F.when(plane_dot(vec, p) >= 0, F.lit(2**p)).otherwise(F.lit(0)) for p in range(4)]
        out = bits[0]
        for t in bits[1:]:
            out = out + t
        return out.cast("int")

    tagged = emb.select("vec_id", "embedding", bucket(F.col("embedding")).alias("bucket"))
    queries = tagged.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"), "bucket"
    )
    scored = tagged.alias("c").join(F.broadcast(queries).alias("qq"), "bucket").filter(
        F.col("query_id") != F.col("vec_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _qdot(F.col("q"), F.col("embedding")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "score")
        .transform(lambda df: ordered(df, "query_id", "rank"))
    )


def array_stats(spark: SparkSession, sf: str) -> DataFrame:
    """A1 min/max-over-array aggregation (code bbox from polygon points,
    code-reader.service.ts:64-71) + exact quantized component sum."""
    emb = load(spark, sf, "embeddings")
    qsum = F.aggregate(
        F.transform("embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return emb.select(
        "vec_id",
        F.array_min("embedding").cast("double").alias("emb_min"),
        F.array_max("embedding").cast("double").alias("emb_max"),
        F.size("embedding").alias("dim"),
        qsum.alias("qsum"),
    ).orderBy("vec_id")


def _vecs_with_mutants(spark: SparkSession, sf: str) -> DataFrame:
    """embeddings ∪ deterministic near-duplicate mutants (first component
    nudged by +0.01, id offset 1_000_000) — guarantees real cosine-near-dup
    positives on the synthetic corpus (mirrors dedup._docs_with_mutants)."""
    emb = load(spark, sf, "embeddings").select("vec_id", "embedding")
    mutants = emb.filter(F.col("vec_id") % 3 == 1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") + F.lit(0.01)).otherwise(
                x.cast("double")
            ),
        ).alias("embedding"),
    )
    return emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")).unionByName(mutants)


def embedding_cosine_dups(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup detection (the training-pipeline dedup
    modality): candidate pairs via sign-projection LSH buckets (never
    all-pairs), scored by exact-integer quantized dot + norms, kept at
    cosine ≥ 0.99.  LSH recall caveat applies by design — identical to the
    production trade-off."""

    def plane_dot(vec, p):
        a, b = [(17, 3), (29, 11), (41, 23), (53, 31)][p]
        prod = F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, i: F.round(x.cast("double") * 1000).cast("long")
            * ((i * a + b) % 97 - 48),
        )
        return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, v: acc + v)

    def bucket(vec):
        bits = [F.when(plane_dot(vec, p) >= 0, F.lit(2**p)).otherwise(F.lit(0)) for p in range(4)]
        out = bits[0]
        for t in bits[1:]:
            out = out + t
        return out.cast("int")

    qnorm = F.aggregate(
        F.transform("embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v * v,
    )
    tagged = _vecs_with_mutants(spark, sf).select(
        "vec_id", "embedding", bucket(F.col("embedding")).alias("bucket"), qnorm.alias("n2")
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        _qdot(F.col("a.embedding"), F.col("b.embedding")).alias("dot"),
        F.col("a.n2").alias("na2"),
        F.col("b.n2").alias("nb2"),
    )
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(
                F.col("dot") / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))), 4
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.99)
        .transform(lambda df: ordered(df, "vec_a", "vec_b"))
    )
