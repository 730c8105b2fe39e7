"""Similarity search over the embeddings table (array<float> column).

Quantized-integer scoring: components are quantized to round(x*1000) so dot
products are exact 64-bit integer sums — order-independent, so Spark and
DuckDB (and any execution order) agree bit-for-bit, and top-k ranking is fully
deterministic with the (score desc, vec_id asc) tiebreak.

Candidate generation is **banded multi-table sign-LSH** (the standard
OR-construction): B_BANDS independent tables of R_BITS sign-random-projection
bits each; a pair is a candidate iff it collides in >= 1 band.  Bucket count
per band is 2^R_BITS — a tunable that grows with corpus size (R ≈
log2(N / target_bucket_size)), unlike a fixed-plane scheme whose bucket count
is a constant and whose per-bucket pair join degenerates to O(N²/const) at
scale.  Each band-bucket's candidate list is capped at K_CAP ids (smallest
vec_ids kept — deterministic); drops are queryable via ``lsh_bucket_stats``
(no silent caps).  Recall math at cosine >= 0.99 (θ <= 8.1°, p_bit ≈ 0.955):
per-band collide = p_bit^R ≈ 0.69, any-of-B = 1-(1-0.69)^4 ≈ 0.991.

The hyperplanes are deterministic integer vectors (component i of plane p is
((i*a_p + b_p) mod 97) - 48), so a SQL oracle reproduces every bucket id
exactly; plane tagging runs as one numpy integer matmul per Arrow batch
(a 2^R-bucket projection is a matrix product — the documented
UDF-when-builtins-can't-win exception; exact integer math, no parity risk).

Scale path notes: brute force is O(Q·N) with Q broadcast — right up to ~10^5
queries; beyond that the banded LSH variant joins on (band, bucket) so each
query only scores its bucket collisions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from . import ordered
from ..sources import load

N_QUERIES = 5
TOP_K = 5

# banded sign-LSH config (see module docstring).  B*R hyperplanes total;
# band t owns planes [t*R_BITS, (t+1)*R_BITS).
B_BANDS = 4
R_BITS = 8
K_CAP = 256

# the round-1 4-plane parameters stay the first four so plane identities are
# stable across configs
_LEGACY_PLANES = [(17, 3), (29, 11), (41, 23), (53, 31)]


def plane_params(p: int) -> tuple[int, int]:
    """Deterministic (a, b) for hyperplane p: component i = ((i*a + b) % 97) - 48."""
    if p < len(_LEGACY_PLANES):
        return _LEGACY_PLANES[p]
    return (17 + 12 * p, 3 + 8 * p)


def _q1000(mat):
    """Quantize float components to round-HALF-AWAY-FROM-ZERO(x*1000) int64.
    np.round is HALF_EVEN, which diverges from Spark's F.round (HALF_UP =
    away from zero) and DuckDB's round() on exact .5 ties (e.g. the dyadic
    float 0.0625 -> 62.5 -> 62 vs 63), so every quantization path — UDFs,
    Catalyst folds, SQL oracles — must use the same away-from-zero rule."""
    import numpy as np

    scaled = mat * 1000.0
    return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)


_TAG = StructType(
    [
        StructField("bks", ArrayType(IntegerType()), False),
        StructField("n2", LongType(), False),
    ]
)


@pandas_udf(_TAG)
def _tag_bands(emb: pd.Series) -> pd.DataFrame:
    """Per-vector band buckets + quantized squared norm, one integer matmul
    per Arrow batch: q (n×d int64) @ P (d×(B*R)) → sign bits → R-bit bucket id
    per band.  Exact integer arithmetic end-to-end (mirrored by SQL oracles)."""
    import numpy as np

    mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
    q = _q1000(mat)
    dim = q.shape[1]
    i = np.arange(dim, dtype=np.int64)
    planes = np.stack(
        [
            (i * a + b) % 97 - 48
            for a, b in (plane_params(p) for p in range(B_BANDS * R_BITS))
        ],
        axis=1,
    )  # d × (B*R)
    bits = (q @ planes >= 0).astype(np.int64)  # n × (B*R)
    weights = 1 << np.arange(R_BITS, dtype=np.int64)
    buckets = np.stack(
        [bits[:, t * R_BITS : (t + 1) * R_BITS] @ weights for t in range(B_BANDS)],
        axis=1,
    ).astype(np.int32)  # n × B
    n2 = (q * q).sum(axis=1)
    return pd.DataFrame({"bks": list(buckets), "n2": n2})


@pandas_udf(LongType())
def _pair_qdot(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact quantized integer dot product of two embedding columns,
    vectorized over the batch (value-identical to the F.zip_with/F.aggregate
    fold, which Catalyst interprets per element)."""
    import numpy as np

    qa = _q1000(np.stack([np.asarray(v, dtype=np.float64) for v in a]))
    qb = _q1000(np.stack([np.asarray(v, dtype=np.float64) for v in b]))
    return pd.Series((qa * qb).sum(axis=1))


@pandas_udf(LongType())
def _pair_qdist(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact quantized integer squared L2 distance (IVF assignment metric)."""
    import numpy as np

    qa = _q1000(np.stack([np.asarray(v, dtype=np.float64) for v in a]))
    qb = _q1000(np.stack([np.asarray(v, dtype=np.float64) for v in b]))
    d = qa - qb
    return pd.Series((d * d).sum(axis=1))


def _qdot(a, b):
    """Exact integer dot product of two quantized float arrays (native
    Catalyst fold form — used where the pair count is small)."""
    prod = F.zip_with(
        a,
        b,
        lambda x, y: F.round(x.cast("double") * 1000).cast("long")
        * F.round(y.cast("double") * 1000).cast("long"),
    )
    return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, v: acc + v)


def _tagged(vecs: DataFrame) -> DataFrame:
    """vec_id, embedding, n2, exploded (band, bucket) rows."""
    t = vecs.select("vec_id", "embedding", _tag_bands("embedding").alias("t")).select(
        "vec_id", "embedding", F.col("t.bks").alias("bks"), F.col("t.n2").alias("n2")
    )
    return t


def _band_rows(tagged: DataFrame) -> DataFrame:
    return tagged.select(
        "vec_id", F.posexplode("bks").alias("band", "bucket")
    )


def _capped_buckets(band_rows: DataFrame, cap: int = K_CAP) -> DataFrame:
    """(band, bucket) → sorted candidate id list, capped at ``cap`` (smallest
    ids kept — deterministic) with the pre-cap size retained for drop stats."""
    return (
        band_rows.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("vec_id")).alias("all_ids"))
        .select(
            "band",
            "bucket",
            F.size("all_ids").alias("n_ids"),
            F.slice("all_ids", 1, cap).alias("ids"),
        )
    )


def lsh_bucket_stats(spark: SparkSession, sf: str, cap: int = K_CAP) -> DataFrame:
    """No-silent-caps audit: per-band bucket count, max bucket size, and how
    many candidate slots the K_CAP guard dropped."""
    rows = _band_rows(_tagged(_vecs_with_mutants(spark, sf)))
    b = _capped_buckets(rows, cap)
    out = b.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.max("n_ids").alias("max_bucket"),
        F.sum(F.greatest(F.col("n_ids") - cap, F.lit(0))).alias("n_dropped"),
    )
    return ordered(out, "band")


def _pairs_from_buckets(capped: DataFrame) -> DataFrame:
    """All a<b pairs within each capped band bucket, deduped across bands."""
    pairs = capped.filter(F.size("ids") > 1).select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size("ids")),
                        lambda y: F.struct(x.alias("vec_a"), y.alias("vec_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.vec_a", "p.vec_b").distinct()


def _brute_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Unordered exact top-k (the ground truth ``ann_recall_audit`` grades
    the approximate families against — composition happens here, above the
    presentation-only ``ordered()`` funnel)."""
    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("v"))
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "neighbor_id",
        _pair_qdot(F.col("q"), F.col("v")).alias("score"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def ann_bruteforce_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force top-k by quantized dot product: queries (vec_id < N)
    broadcast-cross-joined against the corpus."""
    return ordered(_brute_topk(spark, sf), "query_id", "rank")


def _lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Banded sign-LSH ANN (the scale path): a neighbor is scored iff it
    shares >= 1 of the query's B band buckets — bucket-join candidate
    generation, never all-pairs, with the bucket space (B × 2^R) sized by
    config rather than fixed."""
    emb = load(spark, sf, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    tagged = _tagged(emb)
    rows = _band_rows(tagged)
    qrows = rows.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    cands = (
        rows.join(F.broadcast(qrows), ["band", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qemb = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    cemb = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("v"))
    scored = (
        cands.join(F.broadcast(qemb), "query_id")
        .join(cemb, "neighbor_id")
        .select("query_id", "neighbor_id", _pair_qdot(F.col("q"), F.col("v")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def ann_lsh_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered presentation wrapper over ``_lsh_topk`` (semantics and scale
    notes there)."""
    return ordered(_lsh_topk(spark, sf), "query_id", "rank")


N_CENTROIDS = 16
N_PROBE = 2


def _ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-flat ANN (the second scale-path family, complementing the banded
    LSH): a small coarse-quantizer codebook partitions the corpus into
    inverted lists; a query scores only the lists of its N_PROBE nearest
    centroids.  At scale the codebook is k-means-trained and broadcast —
    here the centroids are a deterministic seed subset (vec_id < N_CENTROIDS)
    so a SQL oracle reproduces the whole structure; the join shapes
    (broadcast codebook -> assignment, equi-join on list id -> probe) are
    exactly the production ones.  Assignment metric: exact quantized integer
    squared L2, tie -> smaller centroid id; scoring: exact integer dot."""
    emb = load(spark, sf, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    cent = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    ranked = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cid",
            _pair_qdist(F.col("embedding"), F.col("cemb")).alias("d"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("d").asc(), F.col("cid").asc())
            ),
        )
    )
    lists = ranked.filter(F.col("rn") == 1).select("vec_id", "cid")
    probes = ranked.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("rn") <= N_PROBE)
    ).select(F.col("vec_id").alias("query_id"), "cid")
    cands = (
        lists.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qemb = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    cemb2 = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("v"))
    scored = (
        cands.join(F.broadcast(qemb), "query_id")
        .join(cemb2, "neighbor_id")
        .select("query_id", "neighbor_id", _pair_qdot(F.col("q"), F.col("v")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered presentation wrapper over ``_ivf_topk`` (semantics and scale
    notes there)."""
    return ordered(_ivf_topk(spark, sf), "query_id", "rank")


def ann_recall_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k calibration of BOTH approximate ANN families (banded
    sign-LSH and IVF) against exact brute-force ground truth — the audit
    every production ANN deployment runs before trusting an index (compare
    FAISS's recall-vs-nprobe sweeps): per family and query, how many of
    the true top-k neighbors the approximate search recovered, as exact
    integer counts and basis points.  Like ``lsh_jaccard_verify`` /
    ``minhash_jaccard_estimate`` for the dedup stack, this makes the
    approximation error of the ANN stack a driver-checked VALUE, not a
    claim.

    Scale shape: all three sides are the already-audited topk plans (brute
    force is vs the broadcast N_QUERIES query set only, never all-pairs);
    the ground truth is k×N_QUERIES rows — driver-query-sized — so it is
    localCheckpointed once and reused by all four consumers; each
    comparison is a (query_id, neighbor_id)-keyed semi-join of two
    k-row-per-query frames plus one keyed aggregation — asymptotically
    free next to the searches it grades."""
    truth = (
        _brute_topk(spark, sf).select("query_id", "neighbor_id").localCheckpoint()
    )
    base = truth.groupBy("query_id").agg(F.count("*").cast("long").alias("k"))
    parts = []
    for family, topk_fn in (("ivf", _ivf_topk), ("lsh", _lsh_topk)):
        approx = topk_fn(spark, sf).select("query_id", "neighbor_id")
        hits = (
            truth.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count("*").cast("long").alias("n_hit"))
        )
        parts.append(
            base.join(hits, "query_id", "left")
            .select(
                F.lit(family).alias("family"),
                "query_id",
                "k",
                F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            )
            .select(
                "family",
                "query_id",
                "k",
                "n_hit",
                F.expr("(n_hit * 10000) div k").alias("recall_bp"),
            )
        )
    return ordered(parts[0].unionByName(parts[1]), "family", "query_id")


N_KMEANS = 8


def kmeans_step(spark: SparkSession, sf: str) -> DataFrame:
    """One Lloyd (k-means) iteration over the embedding corpus — the
    iterative-training primitive behind the IVF codebook (``ann_ivf_topk``
    consumes exactly such centroids): assign every vector to its nearest of
    N_KMEANS seed centroids (exact quantized-integer squared L2, tie ->
    smaller centroid id), then recompute each centroid as the component mean
    of its assigned vectors.

    Scale shape: the codebook is tiny and broadcast (assignment is a
    narrow broadcast-nested-loop over K rows, no shuffle); the update is one
    keyed (cid, pos) groupBy with map-side partial sums after a posexplode
    fan-out of dim rows per vector — the same skew-free reduction as
    ``label_centroids``.  Component sums are quantized ints so the means are
    order-independent and exact across engines.  A full k-means run is this
    step iterated with the returned centroids broadcast back in."""
    emb = load(spark, sf, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    cent = emb.filter(F.col("vec_id") < N_KMEANS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    best = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cid",
            _pair_qdist(F.col("embedding"), F.col("cemb")).alias("d"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("d").asc(), F.col("cid").asc())
            ),
        )
        .filter(F.col("rn") == 1)
    )
    comp = best.select(
        "cid",
        F.posexplode(
            F.transform(
                "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
            )
        ).alias("pos", "q"),
    )
    agg = comp.groupBy("cid", "pos").agg(
        F.count("*").alias("n_assigned"),
        F.sum("q").alias("qsum"),
    )
    out = agg.select(
        "cid",
        "pos",
        "n_assigned",
        F.round(F.col("qsum") / F.col("n_assigned") / 1000.0, 6).alias("centroid"),
    )
    return ordered(out, "cid", "pos")


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
    emb = load(spark, sf, "embeddings").select("vec_id", "embedding").repartition(
        spark.sparkContext.defaultParallelism
    )
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
    modality): candidate pairs via banded multi-table sign-LSH buckets (never
    all-pairs; capped buckets, see module docstring), scored by exact-integer
    quantized dot + norms, kept at cosine >= 0.99.  LSH recall caveat applies
    by design — identical to the production trade-off."""
    vecs = _vecs_with_mutants(spark, sf)
    tagged = _tagged(vecs)
    pairs = _pairs_from_buckets(_capped_buckets(_band_rows(tagged)))
    a = tagged.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("n2").alias("na2")
    )
    b = tagged.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("n2").alias("nb2")
    )
    scored = (
        pairs.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _pair_qdot(F.col("ea"), F.col("eb"))
                / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))),
                4,
            ).alias("cosine"),
        )
    )
    return (
        scored.filter(F.col("cosine") >= 0.99)
        .transform(lambda df: ordered(df, "vec_a", "vec_b"))
    )


# semantic decontamination: cosine threshold against the benchmark overlay
SEMDECON_BASE = 1_000_000  # id offset of the benchmark overlay (mutants)
SEMDECON_COS = 0.98


def semantic_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic decontamination: flag training vectors whose
    embedding is cosine-near (>= SEMDECON_COS) some held-out benchmark
    vector — the embedding-space analog of ``corpus.decontaminate``'s
    n-gram overlap, catching paraphrased benchmark leakage that exact
    n-grams miss.  The deterministic mutant overlay (vec_id >=
    SEMDECON_BASE, see ``_vecs_with_mutants``) plays the benchmark set, so
    the synthetic corpus has guaranteed positives: every mutant's source
    vector must be flagged at cosine ~= 1.

    Scale shape: candidates come from the banded sign-LSH band join — the
    benchmark side (fixed size at any corpus scale) is broadcast, so the
    unbounded training side never shuffles to be vetted; scoring is the
    exact quantized-int dot over the candidate pairs only.  Same recall
    caveat as every LSH path, by design (audited via ``lsh_bucket_stats``)."""
    # the tagged corpus feeds FOUR subtrees (band rows, both scoring sides,
    # and the train roster); localCheckpoint materializes the scan+UDF
    # pipeline once instead of re-evaluating it per subtree (vectors + band
    # tags are a narrow sliver of the corpus — at 10^12 scale this is the
    # signature table a production run would persist anyway).  eager=False:
    # materialize at the first ACTION, so merely building the plan (plan
    # reports, bench setup) costs no Spark job
    tagged = _tagged(_vecs_with_mutants(spark, sf)).localCheckpoint(eager=False)
    rows = _band_rows(tagged)
    is_test = F.col("vec_id") >= SEMDECON_BASE
    trows = rows.filter(is_test).select(
        F.col("vec_id").alias("test_id"), "band", "bucket"
    )
    cands = (
        rows.filter(~is_test)
        .join(F.broadcast(trows), ["band", "bucket"])
        .select(F.col("vec_id").alias("train_id"), "test_id")
        .distinct()
    )
    # scoring side of the benchmark: ONLY the fixed-size test split is
    # broadcast (broadcasting unfiltered `tagged` would ship the whole
    # training corpus — the exact failure mode the docstring rules out)
    t = tagged.filter(is_test).select(
        F.col("vec_id").alias("test_id"), F.col("embedding").alias("te"),
        F.col("n2").alias("tn2"),
    )
    tr = tagged.select(
        F.col("vec_id").alias("train_id"), F.col("embedding").alias("re"),
        F.col("n2").alias("rn2"),
    )
    scored = (
        cands.join(F.broadcast(t), "test_id")
        .join(tr, "train_id")
        .select(
            "train_id",
            "test_id",
            F.round(
                _pair_qdot(F.col("re"), F.col("te"))
                / (F.sqrt(F.col("rn2")) * F.sqrt(F.col("tn2"))),
                4,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= SEMDECON_COS)
    )
    hits = scored.groupBy("train_id").agg(
        F.count("*").alias("n_near_test"),
        F.max("cosine").alias("max_cosine"),
    )
    train = tagged.filter(~is_test).select(F.col("vec_id").alias("train_id"))
    out = train.join(hits, "train_id", "left").select(
        F.col("train_id").alias("vec_id"),
        F.coalesce("n_near_test", F.lit(0)).cast("long").alias("n_near_test"),
        F.coalesce("max_cosine", F.lit(0.0)).alias("max_cosine"),
        (F.coalesce("n_near_test", F.lit(0)) > 0).cast("int").alias("contaminated"),
    )
    return ordered(out, "vec_id")


def label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding centroid — the vector aggregation a training
    pipeline runs for cluster summaries / class prototypes.  posexplode
    fans each vector into (label, pos, component) rows; one keyed groupBy
    (label, pos) with map-side partial sums does the reduction — narrow,
    skew-free, and dim-parallel at any corpus size.  Components are summed
    as quantized ints (round(x*1000)) so the result is order-independent
    and exact across engines; the centroid divides back to a double."""
    emb = load(spark, sf, "embeddings")
    comp = emb.select(
        "label",
        F.posexplode(
            F.transform(
                "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
            )
        ).alias("pos", "q"),
    )
    cent = comp.groupBy("label", "pos").agg(
        F.count("*").alias("n_vectors"),
        F.sum("q").alias("qsum"),
    )
    out = cent.select(
        "label",
        "pos",
        "n_vectors",
        F.round(F.col("qsum") / F.col("n_vectors") / 1000.0, 6).alias("centroid"),
    )
    return ordered(out, "label", "pos")


def embedding_hygiene(
    spark: SparkSession, sf: str, table: DataFrame | None = None
) -> DataFrame:
    """Vector-store hygiene audit — the validation pass a pipeline runs
    before indexing embeddings: per label, the vector count, vectors with
    any non-finite/null component, zero-norm vectors (undefined cosine),
    and the dimension envelope (min = max ⇔ the store is rectangular).
    Norms are exact integers (quantized x1000 squared sums, the same rule
    as every similarity operator here), so the audit is bit-stable.

    Semantics on degenerate inputs (pinned cross-engine by
    tests/test_similarity.py over synthetic bad vectors): a vector with
    ANY null/NaN component counts ONLY as bad — its norm is undefined, so
    it is excluded from the zero-norm count (a null component would
    otherwise poison the fold into a fake zero).

    Scale shape: one scan, per-row array folds (cheap — no input
    repartition, unlike the heavy-compute knn operators), one keyed
    aggregation with map-side combine on the label key — the audit table
    is label-sized.  ``table`` — an alternative embeddings frame (tests
    inject degenerate vectors through it)."""
    # the per-component guard (not try_cast) keeps NaN from aborting the
    # fold under ANSI semantics AND matches the oracle's CASE exactly
    q = "CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)"
    term = (
        "CASE WHEN x IS NULL OR isnan(CAST(x AS DOUBLE)) THEN CAST(0 AS BIGINT) "
        f"ELSE {q} * {q} END"
    )
    src = load(spark, sf, "embeddings") if table is None else table
    per = src.filter(F.col("embedding").isNotNull()).select(
        "label",
        F.size("embedding").alias("dim"),
        F.expr(
            f"COALESCE(aggregate(transform(embedding, x -> {term}),"
            f" CAST(0 AS BIGINT), (acc, v) -> acc + v), 0)"
        ).alias("norm2_q"),
        F.expr(
            "CAST(exists(embedding, x -> x IS NULL OR isnan(CAST(x AS DOUBLE))) AS INT)"
        ).alias("bad"),
    )
    out = per.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum("bad").cast("long").alias("n_bad_component"),
        F.sum(((F.col("bad") == 0) & (F.col("norm2_q") == 0)).cast("long")).alias(
            "n_zero_norm"
        ),
        F.min("dim").alias("min_dim"),
        F.max("dim").alias("max_dim"),
    )
    return ordered(out, "label")


# ---------------------------------------------------------------------------
# SemDeDup + hard-negative mining (round-4 session 7)
# ---------------------------------------------------------------------------

SEMDEDUP_COS = 0.95     # intra-cluster near-dup threshold (Abbas et al. 2023)
SEMDEDUP_CAP = 256      # per-cluster pair-generation cap (scale guard)


def semdedup_prune(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup that
    only ever compares WITHIN k-means clusters — the trick that turns an
    O(n^2) cosine-dedup into per-cluster work.  Assignment reuses the IVF
    coarse-quantizer shape (broadcast codebook, exact quantized integer L2,
    tie -> smaller centroid id); within each cluster, capped pairs are
    scored by exact integer dot + float norms (the `embedding_cosine_dups`
    convention) and a vector is PRUNED when a same-cluster neighbor with a
    smaller id sits at cosine >= SEMDEDUP_COS (min-id survivor, the
    deterministic stand-in for the paper's keep-low-centroid-sim rule).
    Runs over the mutant-overlaid corpus so true positives exist.

    Scale shape: broadcast codebook crossJoin (codebook rows, not corpus,
    bound the fan-out) -> one vec-keyed window for argmin -> per-cluster
    self-join BOUNDED by SEMDEDUP_CAP (row_number cap, same posture as
    `_capped_buckets`) -> aggregation back to vectors.  No corpus-wide
    pair generation anywhere."""
    vecs = _vecs_with_mutants(spark, sf)
    n2 = F.expr(
        "aggregate(transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)"
        " * CAST(round(x * 1000) AS BIGINT)), CAST(0 AS BIGINT),"
        " (acc, v) -> acc + v)"
    )
    vecs = vecs.select("vec_id", "embedding", n2.alias("n2"))
    cent = vecs.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    assigned = (
        vecs.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "embedding", "n2", "cid",
            _pair_qdist(F.col("embedding"), F.col("cemb")).alias("d"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("d").asc(), F.col("cid").asc())
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "d")
    )
    # one assignment evaluation shared by pairs + sizes; eager=False so
    # merely building the plan (plan reports, bench setup) costs no job
    assigned = assigned.localCheckpoint(eager=False)
    capped = assigned.withColumn(
        "crn",
        F.row_number().over(Window.partitionBy("cid").orderBy(F.col("vec_id").asc())),
    ).filter(F.col("crn") <= SEMDEDUP_CAP)
    a = capped.select(
        "cid", F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
        F.col("n2").alias("na2"),
    )
    b = capped.select(
        "cid", F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
        F.col("n2").alias("nb2"),
    )
    dups = (
        a.join(b, "cid")
        .filter(F.col("va") < F.col("vb"))
        .select(
            "cid", "va", "vb",
            F.round(
                _pair_qdot(F.col("ea"), F.col("eb"))
                / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))),
                4,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= SEMDEDUP_COS)
    )
    # per-vector tallies: tau-neighbor count (either side), pruned if any
    # smaller-id neighbor
    nbrs = (
        dups.select(F.col("va").alias("vec_id"), F.lit(0).alias("smaller"))
        .unionByName(dups.select(F.col("vb").alias("vec_id"), F.lit(1).alias("smaller")))
        .groupBy("vec_id")
        .agg(
            F.count("*").cast("int").alias("n_tau_nbrs"),
            F.max("smaller").cast("int").alias("pruned"),
        )
    )
    sizes = assigned.groupBy("cid").agg(F.count("*").cast("int").alias("cluster_n"))
    out = (
        assigned.select("vec_id", "cid")
        .join(nbrs, "vec_id", "left")
        .join(F.broadcast(sizes), "cid")
        .select(
            "vec_id", "cid", "cluster_n",
            F.coalesce(F.col("n_tau_nbrs"), F.lit(0)).cast("int").alias("n_tau_nbrs"),
            F.coalesce(F.col("pruned"), F.lit(0)).cast("int").alias("pruned"),
        )
    )
    return ordered(out, "vec_id")


def ann_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for contrastive training (the retrieval-pipeline
    companion of ANN search): for each query vector, the TOP_K most similar
    corpus vectors carrying a DIFFERENT label — the negatives that sit
    closest to the decision boundary.  Exact quantized-integer scoring over
    a broadcast query set (the audited brute shape); at scale the corpus
    side swaps to the banded-LSH candidate generator unchanged.

    Scale shape: corpus crossJoin broadcast(queries) — fan-out bounded by
    the query-set size, label filter applied before the score window."""
    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("v"),
        F.col("label").alias("neg_label"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("neg_label") != F.col("qlabel"))
        .select(
            "query_id", "neighbor_id", "neg_label",
            _pair_qdot(F.col("qv"), F.col("v")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "neg_label", "score")
    )
    return ordered(out, "query_id", "rank")


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the embedding-COMPRESSION scale path
# ---------------------------------------------------------------------------

# Jégou, Douze & Schmid 2011 ("Product Quantization for Nearest Neighbor
# Search"): split the D-dim space into PQ_M subspaces, quantize each
# subvector against a per-subspace codebook of PQ_K centroids, and search
# with asymmetric distance computation (ADC) — the query stays exact, each
# corpus vector costs PQ_M small-int codes (here 16 four-bit codes — 8
# bytes — for a 64-dim vector: 32x compression), and distances are PQ_M
# table lookups.  At
# 100 TB this is what makes billion-vector indexes fit in executor memory
# (FAISS's IVFADC is IVF lists over exactly these codes).  Codebooks are
# k-means-trained in production (``kmeans_step`` is the primitive); here
# they are the deterministic seed subset (vec_id < PQ_K), same convention
# as the IVF coarse quantizer, so a SQL oracle reproduces every code.
PQ_M = 16  # subspaces
PQ_SUB = 4  # dims per subspace (embeddings are 64-dim across the sf ladder)
PQ_K = 16  # codes per subspace codebook (4-bit codes: 64 floats -> 8 bytes)


def _qdist_fold(a, b):
    """Exact integer squared L2 of two quantized float arrays as a native
    Catalyst fold (the distance twin of ``_qdot`` — used on PQ_SUB-length
    subvectors where a pandas UDF round-trip would cost more than the
    PQ_SUB=4-element fold)."""
    diff = F.zip_with(
        a,
        b,
        lambda x, y: F.round(x.cast("double") * 1000).cast("long")
        - F.round(y.cast("double") * 1000).cast("long"),
    )
    return F.aggregate(
        diff, F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )


def _subspaces(df: DataFrame, id_col: str, out_id: str) -> DataFrame:
    """(id, subspace, sub) rows: one PQ_SUB-length slice per subspace (one
    posexplode over an M-element array of slices — single narrow pass)."""
    slices = F.array(
        *[F.slice("embedding", m * PQ_SUB + 1, PQ_SUB) for m in range(PQ_M)]
    )
    return df.select(
        F.col(id_col).alias(out_id), F.posexplode(slices).alias("subspace", "sub")
    )


def _pq_codebook(emb: DataFrame) -> DataFrame:
    """(subspace, code, csub) — the deterministic seed codebook
    (subvector m of seed vector c quantizes subspace m's code c)."""
    return _subspaces(
        emb.filter(F.col("vec_id") < PQ_K), "vec_id", "code"
    ).select("subspace", "code", F.col("sub").alias("csub"))


def _pq_encoded(emb: DataFrame) -> DataFrame:
    """Per-(vector, subspace) nearest-code assignment: exact quantized
    integer squared L2, tie -> smaller code.  The argmin is a keyed
    aggregation (min over a (d, code) struct — map-side combinable, the
    ``line_dedup`` keeper shape), never a window over the corpus."""
    cands = _subspaces(emb, "vec_id", "vec_id").join(
        F.broadcast(_pq_codebook(emb)), "subspace"
    )
    best = (
        cands.select(
            "vec_id",
            "subspace",
            F.struct(
                _qdist_fold(F.col("sub"), F.col("csub")).alias("d"),
                F.col("code").alias("code"),
            ).alias("dc"),
        )
        .groupBy("vec_id", "subspace")
        .agg(F.min("dc").alias("dc"))
    )
    return best.select(
        "vec_id",
        "subspace",
        F.col("dc.code").alias("code"),
        F.col("dc.d").alias("d"),
    )


def pq_encode(spark: SparkSession, sf: str) -> DataFrame:
    """PQ encoding of the embedding corpus: for every vector and subspace,
    the assigned code and its exact quantized squared-L2 residual distance.
    PQ_M rows per vector — the compressed representation an IVFADC index
    stores instead of the raw floats."""
    emb = load(spark, sf, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    return ordered(_pq_encoded(emb), "vec_id", "subspace")


def _pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """ADC top-k: per (query, subspace, code) partial distances form a
    broadcast lookup table (N_QUERIES x PQ_M x PQ_K rows — query-sized,
    never corpus-sized); each corpus vector's approximate distance is the
    sum of its PQ_M table entries.  One broadcast equi-join on
    (subspace, code) plus one keyed aggregation — the corpus is scanned
    once as codes, its floats never touched (the whole point of PQ)."""
    emb = load(spark, sf, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    codebook = _pq_codebook(emb)
    qsubs = _subspaces(
        emb.filter(F.col("vec_id") < N_QUERIES), "vec_id", "query_id"
    )
    dtab = qsubs.join(F.broadcast(codebook), "subspace").select(
        "query_id",
        "subspace",
        "code",
        _qdist_fold(F.col("sub"), F.col("csub")).alias("dpart"),
    )
    encoded = _pq_encoded(emb).select("vec_id", "subspace", "code")
    adist = (
        encoded.join(F.broadcast(dtab), ["subspace", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dpart").alias("adist"), F.count("*").alias("n_sub"))
        # a vector scores only when every subspace contributed (self-joins
        # filtered above can never partially match; belt-and-braces guard)
        .filter(F.col("n_sub") == PQ_M)
        .drop("n_sub")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        adist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "adist")
    )


def ann_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered presentation wrapper over ``_pq_topk`` (semantics and scale
    notes there)."""
    return ordered(_pq_topk(spark, sf), "query_id", "rank")


def _brute_l2_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Exact top-k by quantized squared L2 over the broadcast query set —
    the ground truth for the PQ/ADC audit (ADC approximates L2 distances,
    so grading it against the dot-product truth of ``_brute_topk`` would
    conflate metric mismatch with quantization loss)."""
    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _pair_qdist(F.col("q"), F.col("embedding")).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "dist")
    )


def _recall_audit(spark: SparkSession, sf: str, approx: DataFrame, family: str) -> DataFrame:
    """Recall@k of an approximate top-k frame against exact brute-force
    squared-L2 ground truth: per query, how many true top-k neighbors the
    approximate search recovered, as exact counts and basis points.  The
    truth frame feeds two consumers (the k base and the hit semi-join), so
    it is localCheckpointed once."""
    truth = (
        _brute_l2_topk(spark, sf)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    base = truth.groupBy("query_id").agg(F.count("*").cast("long").alias("k"))
    hits = (
        truth.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    out = (
        base.join(hits, "query_id", "left")
        .select(
            F.lit(family).alias("family"),
            "query_id",
            "k",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        )
        .select(
            "family",
            "query_id",
            "k",
            "n_hit",
            F.expr("(n_hit * 10000) div k").alias("recall_bp"),
        )
    )
    return ordered(out, "family", "query_id")


def ann_pq_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of the PQ/ADC search — the compression counterpart of
    ``ann_recall_audit`` (same audit shape, separate query so the
    already-driver-checked ivf/lsh audit rows stay byte-identical)."""
    return _recall_audit(spark, sf, _pq_topk(spark, sf), "pq")


# ---------------------------------------------------------------------------
# IVFADC — coarse quantizer + residual PQ codes (the FAISS production shape)
# ---------------------------------------------------------------------------

# Jégou et al. 2011 §IV: the inverted-file system stores, per corpus vector,
# its coarse list id plus the PQ codes of the RESIDUAL (vector minus coarse
# centroid); a query probes its N_PROBE nearest lists and scores each list's
# members with a per-list ADC table over the residual codebook.  This is the
# composition of the two audited pieces above (``_ivf_topk``'s coarse
# assignment, ``pq_encode``'s subspace quantization) and the index layout
# billion-vector deployments actually ship.  All arithmetic happens in the
# quantized-integer domain (round(x*1000)), so residuals are exact int64
# vectors and every code and distance is engine-independent.
#
# Residual codebook seeds: vectors [N_CENTROIDS, N_CENTROIDS + PQ_K) — the
# first PQ_K vectors that are NOT coarse centroids (a centroid's own
# residual is the zero vector, which would collapse the codebook).
IVFADC_CB_LO = N_CENTROIDS


def _q_arr(col):
    """Quantize a float array column to int64 components (the array twin of
    the scalar rule in ``_q1000``/``_qdot``)."""
    return F.transform(col, lambda x: F.round(x.cast("double") * 1000).cast("long"))


def _iqdist_fold(a, b):
    """Exact squared L2 between two ALREADY-INTEGER array columns."""
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(diff, F.lit(0).cast("long"), lambda acc, v: acc + v * v)


def _int_subspaces(df: DataFrame, arr_col: str, keep: list[str]) -> DataFrame:
    """(keep..., subspace, sub) rows over an integer-array column."""
    slices = F.array(
        *[F.slice(arr_col, m * PQ_SUB + 1, PQ_SUB) for m in range(PQ_M)]
    )
    return df.select(*keep, F.posexplode(slices).alias("subspace", "sub"))


def _coarse_assigned(emb: DataFrame) -> DataFrame:
    """(vec_id, qv, cid, cqv): each vector with its quantized components and
    nearest coarse centroid (exact integer squared L2, tie -> smaller cid).
    Argmin is the map-side-combinable min-struct aggregation, carrying the
    centroid components through the struct so the residual subtraction
    needs no second join."""
    q = emb.select("vec_id", _q_arr("embedding").alias("qv"))
    cent = q.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cqv")
    )
    best = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "qv",
            F.struct(
                _iqdist_fold(F.col("qv"), F.col("cqv")).alias("d"),
                F.col("cid").alias("cid"),
                F.col("cqv").alias("cqv"),
            ).alias("dc"),
        )
        .groupBy("vec_id")
        .agg(F.min("dc").alias("dc"), F.first("qv").alias("qv"))
    )
    return best.select(
        "vec_id", "qv", F.col("dc.cid").alias("cid"), F.col("dc.cqv").alias("cqv")
    )


def _residual_codebook(assigned: DataFrame) -> DataFrame:
    """(subspace, code, csub): residual-space codebook from the seed band
    [IVFADC_CB_LO, IVFADC_CB_LO + PQ_K); code = vec_id - IVFADC_CB_LO."""
    seeds = assigned.filter(
        (F.col("vec_id") >= IVFADC_CB_LO) & (F.col("vec_id") < IVFADC_CB_LO + PQ_K)
    ).select(
        (F.col("vec_id") - IVFADC_CB_LO).alias("code"),
        F.zip_with("qv", "cqv", lambda x, y: x - y).alias("r"),
    )
    return _int_subspaces(seeds, "r", ["code"]).select(
        "subspace", "code", F.col("sub").alias("csub")
    )


def ivfadc_encode(spark: SparkSession, sf: str) -> DataFrame:
    """The IVFADC index payload: per vector its coarse list id and, per
    subspace, the residual PQ code (nearest residual-codebook entry by
    exact integer squared L2, tie -> smaller code).  PQ_M rows per
    vector; this plus the two small codebooks IS the index an executor
    holds at scale — the raw floats are never needed again."""
    emb = load(spark, sf, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    # the assignment feeds both the residual codebook and the residual
    # projection inside _ivfadc_encoded; Spark shares no subtrees, so
    # evaluate the corpus x N_CENTROIDS argmin once (same discipline as
    # _ivfadc_topk)
    assigned = _coarse_assigned(emb).localCheckpoint(eager=True)
    return ordered(_ivfadc_encoded(assigned), "vec_id", "subspace")


def _ivfadc_encoded(assigned: DataFrame) -> DataFrame:
    """Unordered residual-code assignment over a (possibly checkpointed)
    coarse-assignment frame — shared by ``ivfadc_encode`` and
    ``_ivfadc_topk`` so the search evaluates the assignment ONCE."""
    cb = _residual_codebook(assigned)
    res = assigned.select(
        "vec_id", "cid", F.zip_with("qv", "cqv", lambda x, y: x - y).alias("r")
    )
    cands = _int_subspaces(res, "r", ["vec_id", "cid"]).join(
        F.broadcast(cb), "subspace"
    )
    best = (
        cands.select(
            "vec_id",
            "cid",
            "subspace",
            F.struct(
                _iqdist_fold(F.col("sub"), F.col("csub")).alias("d"),
                F.col("code").alias("code"),
            ).alias("dc"),
        )
        .groupBy("vec_id", "subspace")
        .agg(F.first("cid").alias("cid"), F.min("dc").alias("dc"))
    )
    return best.select(
        "vec_id", "cid", "subspace", F.col("dc.code").alias("code"),
        F.col("dc.d").alias("d"),
    )


def _ivfadc_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVFADC search: a query probes its N_PROBE nearest coarse lists; per
    probed list it builds the residual ADC table (query-minus-that-centroid
    vs the residual codebook: N_QUERIES x N_PROBE x PQ_M x PQ_K rows —
    query-sized, broadcast); each list member's approximate distance is the
    sum of its PQ_M table entries.  One broadcast equi-join on
    (cid, subspace, code) + one keyed aggregation over the probed lists'
    codes — never the whole corpus, never any floats.

    The coarse-assignment frame feeds five consumers (codebook, queries,
    centroids, the encode pass, the probe step); Spark shares no subtrees,
    so it is localCheckpointed once — the same one-evaluation discipline as
    ``lsh_jaccard_verify``."""
    emb = load(spark, sf, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    assigned = _coarse_assigned(emb).localCheckpoint(eager=True)
    cb = _residual_codebook(assigned)
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    cent = assigned.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("ccqv")
    )
    probed = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "cid",
            "ccqv",
            "qqv",
            _iqdist_fold(F.col("qqv"), F.col("ccqv")).alias("d"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("d").asc(), F.col("cid").asc()
                )
            ),
        )
        .filter(F.col("rn") <= N_PROBE)
        .select(
            "query_id", "cid", F.zip_with("qqv", "ccqv", lambda x, y: x - y).alias("rq")
        )
    )
    dtab = _int_subspaces(probed, "rq", ["query_id", "cid"]).join(
        F.broadcast(cb), "subspace"
    ).select(
        "query_id",
        "cid",
        "subspace",
        "code",
        _iqdist_fold(F.col("sub"), F.col("csub")).alias("dpart"),
    )
    enc = _ivfadc_encoded(assigned).select("vec_id", "cid", "subspace", "code")
    adist = (
        enc.join(F.broadcast(dtab), ["cid", "subspace", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dpart").alias("adist"), F.count("*").alias("n_sub"))
        .filter(F.col("n_sub") == PQ_M)
        .drop("n_sub")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        adist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "adist")
    )


def ann_ivfadc_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered presentation wrapper over ``_ivfadc_topk`` (semantics and
    scale notes there)."""
    return ordered(_ivfadc_topk(spark, sf), "query_id", "rank")


def ann_ivfadc_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of IVFADC (same audit shape as ``ann_pq_recall``; losses
    here compound list pruning AND code quantization, so this row minus
    the PQ row isolates what probing costs)."""
    return _recall_audit(spark, sf, _ivfadc_topk(spark, sf), "ivfadc")


IN_BATCH = 32  # inbatch_collision_audit: contrastive-training batch size


def inbatch_collision_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Contrastive-training false-negative audit: with the standard
    contiguous dataloader batching (batch = vec_id div IN_BATCH), count
    per batch the same-label pairs — each is a FALSE negative under the
    in-batch-negatives objective (the 'negative' shares the anchor's
    label).  The table that decides whether batches need label-aware
    de-collision before embedding training.

    Scale shape: two keyed aggregations — (batch, label) sizes with
    map-side combine, then per-batch pair counts k*(k-1)/2 in exact
    integer arithmetic; nothing quadratic, output batch-bounded."""
    vecs = load(spark, sf, "embeddings").select(
        F.expr(f"vec_id div {IN_BATCH}").alias("batch"), "label"
    )
    kl = vecs.groupBy("batch", "label").agg(F.count("*").alias("k"))
    out = kl.groupBy("batch").agg(
        F.sum("k").alias("n_vecs"),
        F.sum(F.expr("k * (k - 1) div 2")).alias("n_collisions"),
    )
    return ordered(out, "batch")
