"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard.  All expressed with native Spark SQL functions
(shingling, hashing, banding, self-joins) — deterministic arithmetic hashes so
DuckDB oracles can reproduce every stage bit-for-bit.

Scale notes: every stage is a narrow map or an equi-join on a hash key.
Near-dup candidate generation goes through LSH band buckets (join key =
(band_id, band_hash)) — never an all-pairs product; at 10^12 docs the band
join shuffles only bucket-colliding pairs, and AQE's skew-join splitting
handles hot buckets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from . import ordered
from ..sources import load

MOD = 1_000_000_007
BASE = 31
# 4 independent affine hashes (a*h+b) mod MOD for the minhash signature;
# a*h < 1000 * 1e9+7 < 2^63 — no overflow wrap anywhere.
MINHASH_AB = [(131, 7), (269, 89), (421, 241), (607, 389)]
SHINGLE = 3

# Hot-bucket guards (no unbounded per-bucket arrays at scale):
# DEDUP_CAP — max docs considered per LSH band bucket (smallest doc_ids kept,
#   deterministic; a mass-duplicated doc otherwise materializes its whole
#   cluster in one row and explodes k² pairs in one task).  Drops are
#   queryable via ``lsh_drop_stats`` — no silent caps.
# DF_MAX — shingle document-frequency cutoff for the n-gram Jaccard
#   representation (standard practice: a stop-phrase shingle shared by 10^6
#   docs is pure pair-explosion noise).  Both are far above the synthetic
#   corpus' observed maxima (bucket<=40, DF<=34 at sf0.1), so small-scale
#   results are unchanged; tests/test_dedup_scale.py pins the adversarial
#   hot-bucket behavior.
DEDUP_CAP = 256
DF_MAX = 256


def _hash_one(s):
    """Rolling hash of one string column expression, in pure Catalyst
    (reference expression for the vectorized form below; used where only one
    hash per row is computed)."""
    chars = F.transform(F.sequence(F.lit(1), F.length(s)), lambda i: F.ascii(F.substring(s, i, 1)))
    return F.aggregate(
        chars, F.lit(0).cast("long"), lambda acc, c: F.pmod(acc * BASE + c, F.lit(MOD))
    )


def _roll(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * BASE + ord(ch)) % MOD
    return acc


@pandas_udf(ArrayType(LongType()))
def _hash_shingles(sh: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) rolling hash of a shingle array column —
    value-identical to ``F.transform(arr, _hash_one)``, but ~20× faster: the
    nested higher-order-function fold is interpreted per element by Catalyst,
    while this runs one Arrow batch per task (the UDF-only-when-built-ins-
    can't-win exception: same per-char fold, no per-row Python at the JVM
    boundary).  A numpy position-sweep variant was benchmarked and LOST to
    this C-level-ord loop at shingle lengths (~20 chars): the per-position
    mask/gather overhead exceeds the loop cost; the oracle-parity hash is not
    the dedup bottleneck (see ``minhash_signatures_fast`` for the
    xxhash64-based scale path)."""
    return sh.apply(lambda lst: None if lst is None else [_roll(x) for x in lst])


@pandas_udf(LongType())
def _hash_string(s: pd.Series) -> pd.Series:
    """Vectorized rolling hash of a plain string column (simhash path)."""
    return s.map(lambda x: None if x is None else _roll(x))


def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: canonical = min doc_id per md5."""
    docs = load(spark, sf, "documents")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies"))
        .orderBy("canonical_id")
    )


def _docs_with_mutants(spark: SparkSession, sf: str) -> DataFrame:
    """documents ∪ deterministic near-duplicate mutants (first 12 chars
    dropped, id+1_000_000) — guarantees the near-dup operators have real work
    and real positives to find on the synthetic corpus.

    The input repartition fans the scan out to full parallelism: the small
    single-file testdata scan yields only 1-2 splits, which would otherwise
    cap every downstream narrow stage (shingling, hashing) at 2 tasks; at
    real scale the table has enough splits and the exchange is cheap noise
    relative to the shingle stages it parallelizes."""
    docs = (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    mutants = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.substring("text", 13, 1_000_000).alias("text"),
    ).filter(F.col("doc_id") % 3 == 1)  # a third of docs get a mutant
    return docs.unionByName(mutants)


def _minhash_sigs(spark: SparkSession, sf: str) -> DataFrame:
    """Unordered minhash core (building block).  No orderBy here: a sort
    means a RangePartitioner sampling pass that re-evaluates this whole
    (shingle+hash) pipeline a second time.

    The has-shingles guard is expressed on the RAW text (>= SHINGLE words ⇔
    non-empty shingle array) rather than as ``size(sh) > 0``: Catalyst pushes
    filters through exchanges by substituting projection aliases, so a filter
    on the UDF output would clone the entire shingle+hash evaluation BELOW
    the input repartition — running it once per row on the unparallelized
    scan side and again above (measured 2× wall-clock on sf0.1)."""
    corpus = _docs_with_mutants(spark, sf)
    has_shingles = F.size(F.split(F.trim(F.col("text")), r"\s+")) >= SHINGLE
    hashed = _with_words(corpus.filter(has_shingles)).select(
        "doc_id", _hash_shingles(_shingles()).alias("sh")
    )
    return _sigs_from_hashed(hashed)


def _sigs_from_hashed(hashed: DataFrame) -> DataFrame:
    """Signatures from a (doc_id, sh) shingle-hash frame — split out so a
    caller that also consumes the shingle arrays directly can evaluate the
    expensive hash UDF ONCE (localCheckpoint the hashed frame, derive both
    views from it)."""
    cols = [
        F.array_min(
            F.transform("sh", lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MOD)))
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    return hashed.select("doc_id", *cols)


def minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash: shingle → rolling hash → per-doc min under 4 affine hashes."""
    return ordered(_minhash_sigs(spark, sf), "doc_id")


def _with_words(corpus: DataFrame) -> DataFrame:
    """Materialize the split words array in its own projection.  Building
    shingles directly over the split() EXPRESSION would inline a full
    re-split into every element_at call inside the transform lambda —
    O(words²) per doc (measured 3-4× on sf0.1); as a multi-use non-cheap
    alias the array survives CollapseProject and each element_at is O(1)."""
    return corpus.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w"))


def _shingles(words_col: str = "w"):
    words = F.col(words_col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (SHINGLE - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1), F.element_at(words, i + 2)
        ),
    )


def _lsh_buckets(
    spark: SparkSession, sf: str, sigs: DataFrame | None = None
) -> DataFrame:
    """(band_id, h1, h2) → sorted doc_id list with pre-cap size (building
    block for pairs and for the drop-stats audit).  ``sigs`` — a previously
    materialized signature frame (pass it when the caller also consumes the
    signatures directly, so the minhash pipeline is evaluated once)."""
    sigs = _minhash_sigs(spark, sf) if sigs is None else sigs
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band_id"), F.col("m0").alias("h1"), F.col("m1").alias("h2")),
                F.struct(F.lit(1).alias("band_id"), F.col("m2").alias("h1"), F.col("m3").alias("h2")),
            )
        ).alias("b"),
    ).select("doc_id", "b.band_id", "b.h1", "b.h2")
    # bucket-collect + in-array pair explosion: one shuffle on the band key
    # and ONE evaluation of the minhash pipeline (a self-join would
    # re-evaluate it per side); emitted pairs are identical (all a<b within
    # a bucket, deduped across bands).  The hot-bucket cap bounds the array
    # and the in-row k² explosion (smallest doc_ids kept — deterministic,
    # mirrored by ROW_NUMBER <= cap in the SQL oracle).
    return (
        bands.groupBy("band_id", "h1", "h2")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("all_ds"))
        .select(
            "band_id",
            "h1",
            "h2",
            F.size("all_ds").alias("n_docs"),
            F.slice("all_ds", 1, DEDUP_CAP).alias("ds"),
        )
    )


def lsh_drop_stats(spark: SparkSession, sf: str) -> DataFrame:
    """No-silent-caps audit for the MinHash-LSH bucket cap."""
    b = _lsh_buckets(spark, sf)
    out = b.groupBy("band_id").agg(
        F.count("*").alias("n_buckets"),
        F.max("n_docs").alias("max_bucket"),
        F.sum(F.greatest(F.col("n_docs") - DEDUP_CAP, F.lit(0))).alias("n_dropped"),
    )
    return ordered(out, "band_id")


def _lsh_pairs(
    spark: SparkSession, sf: str, sigs: DataFrame | None = None
) -> DataFrame:
    """Unordered distinct candidate pairs (building block — also the edge
    list for ``dedup_clusters``)."""
    buckets = _lsh_buckets(spark, sf, sigs).filter(F.size("ds") > 1)
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ds",
                    lambda x, i: F.transform(
                        F.slice(F.col("ds"), i + 2, F.size("ds")),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def lsh_candidate_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash-LSH banding: 2 bands × 2 rows; candidate pair ⇔ equal band
    hash in ≥1 band.  Self-equi-join on (band_id, h1, h2) — bucket join, not
    an all-pairs product; buckets capped at DEDUP_CAP (see _lsh_buckets)."""
    return ordered(_lsh_pairs(spark, sf), "doc_a", "doc_b")


MUTANT_BASE = 1_000_000  # id offset of the mutant overlay (= the "new batch")


def dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-crawl admission: dedup a NEW batch of documents against
    the EXISTING corpus index plus earlier arrivals in the same batch — the
    production shape where yesterday's corpus is already deduped and only
    today's crawl needs vetting.  The deterministic mutant overlay
    (doc_id >= MUTANT_BASE, see ``_docs_with_mutants``) plays the new batch;
    the base documents are the index.  A new doc is admitted iff it has no
    LSH candidate partner in the index and none among smaller-id batch docs
    (first-come-first-kept within the batch).

    Scale shape: identical to ``lsh_candidate_pairs`` (band-bucket join,
    capped buckets) — in production the index side joins from its
    PRECOMPUTED signature table, so per-batch cost is O(batch + collisions),
    never a rescan of the corpus; the admission itself is one keyed
    aggregation over the pair list.  Candidate pairs (doc_a < doc_b) encode
    priority directly: partners of new doc d appear exactly as doc_b = d."""
    batch = _docs_with_mutants(spark, sf).filter(
        F.col("doc_id") >= MUTANT_BASE
    ).select("doc_id")
    hits = (
        _lsh_pairs(spark, sf)
        .filter(F.col("doc_b") >= MUTANT_BASE)
        .groupBy(F.col("doc_b").alias("doc_id"))
        .agg(
            F.sum((F.col("doc_a") < MUTANT_BASE).cast("long")).alias("n_index_dups"),
            F.sum((F.col("doc_a") >= MUTANT_BASE).cast("long")).alias("n_batch_dups"),
        )
    )
    out = batch.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_index_dups", F.lit(0)).cast("long").alias("n_index_dups"),
        F.coalesce("n_batch_dups", F.lit(0)).cast("long").alias("n_batch_dups"),
        (
            (F.coalesce("n_index_dups", F.lit(0)) == 0)
            & (F.coalesce("n_batch_dups", F.lit(0)) == 0)
        ).cast("int").alias("admitted"),
    )
    return ordered(out, "doc_id")


def _cc_min_label(edges: DataFrame, max_iter: int) -> tuple[DataFrame, int]:
    """Connected components by iterative min-label propagation over a
    SYMMETRIC edge list (both orientations present).  Each round is one hash
    join + min-aggregate, all JVM-side; rounds ≈ graph diameter.  Returns
    ``(labels(id,label), rounds_used)``.

    The driver-side loop is a fixpoint coordinator, not a data path: per
    round it reads ONE aggregated long (sum of labels, strictly decreasing
    until convergence).  ``localCheckpoint`` truncates the iterative lineage
    so the plan does not double each round.  Exhausting ``max_iter`` without
    the exact fixpoint RAISES — wrong-but-plausible labels must never leave
    this function silently (a chain-shaped dup graph with diameter >
    max_iter would otherwise mislabel with no error)."""
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for rounds in range(1, max_iter + 1):
        prop = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "label"
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:  # labels only decrease -> exact fixpoint test
            return labels, rounds
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected-components min-label propagation did not reach its "
        f"fixpoint within max_iter={max_iter} rounds (graph diameter too "
        f"large) — raise max_iter or use algo='star' (O(log n) rounds)"
    )


def _cc_star(edges: DataFrame, max_iter: int) -> tuple[DataFrame, int]:
    """Connected components by the alternating large-star / small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", ACM SoCC 2014) — the scale path for high-diameter graphs:
    O(log n) rounds vs O(diameter) for min-label propagation, with the SAME
    per-round shuffle shapes (one groupBy-min + one equi-join per phase).

    large-star: every neighbor v > u is rewired to m(u) = min(N(u) ∪ {u});
    small-star: with edges oriented src > dst, every smaller neighbor (and u
    itself) is rewired to min(N(u)).  The fixpoint is a star forest with
    each component's min node at the center, read off as the label map.
    Convergence test is exact (edge-set equality); per round that is two
    small actions — at 10^12 edges swap in a hash-sum comparison.

    Takes the same symmetric edge list as ``_cc_min_label``; returns
    ``(labels(id,label), rounds_used)``."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    converged = False
    rounds = 0
    for rounds in range(1, max_iter + 1):
        # large-star (on the bidirectional view; output is oriented src>dst
        # by construction: emitted (v, m) always has v > u >= m)
        b = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m = (
            b.groupBy("src")
            .agg(F.min("dst").alias("mn"))
            .select("src", F.least("mn", F.col("src")).alias("m"))
        )
        large = (
            b.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # small-star (input already oriented src > dst)
        mo = large.groupBy("src").agg(F.min("dst").alias("m"))
        nbr = large.join(mo, "src").select(F.col("dst").alias("v"), "m")
        slf = mo.select(F.col("src").alias("v"), "m")
        small = (
            nbr.unionByName(slf)
            .filter(F.col("v") != F.col("m"))
            .select(
                F.greatest("v", "m").alias("src"),
                F.least("v", "m").alias("dst"),
            )
            .distinct()
            .localCheckpoint()
        )
        if small.count() == e.count() and small.exceptAll(e).isEmpty():
            e = small
            converged = True
            break
        e = small
    if not converged:
        raise RuntimeError(
            f"connected-components star algorithm did not converge within "
            f"max_iter={max_iter} rounds"
        )
    # star forest: every non-root points at its component min; roots (and
    # isolated incident nodes, impossible here but cheap to cover) label
    # themselves
    nonroot = e.select(F.col("src").alias("id"), F.col("dst").alias("label"))
    incident = edges.select(F.col("src").alias("id")).distinct()
    labels = incident.join(nonroot, "id", "left").select(
        "id", F.coalesce("label", F.col("id")).alias("label")
    )
    return labels, rounds


def _clusters_frame(
    spark: SparkSession,
    sf: str,
    max_iter: int = 20,
    algo: str = "minlabel",
) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the LSH
    candidate-pair graph.  cluster_id = min doc_id of the component;
    singletons map to themselves.

    ``algo='minlabel'`` (default, rounds ≈ diameter — tiny for near-dup
    blobs) or ``'star'`` (large-star/small-star, O(log n) rounds — the
    choice for chain-shaped graphs); both share the join/agg skeleton and
    produce identical labels (pinned by tests/test_dedup_scale.py).

    Scale shape: the iteration runs over the EDGE-INCIDENT subgraph only —
    a node with no candidate pair can never change label, so singletons
    (the overwhelming majority of a deduped corpus) never ride through the
    per-round shuffles; they are joined back once at the end with
    cluster_id = doc_id, size = 1.  Per-round cost is O(E), not O(V).

    In a production run this frame is MATERIALIZED once (a labels table)
    and downstream steps — ``dedup_survivors``, membership filters — read
    it instead of re-deriving the clustering (pass it via their
    ``clusters=`` parameter)."""
    corpus = _docs_with_mutants(spark, sf)
    pairs = _lsh_pairs(spark, sf)
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()

    cc = _cc_star if algo == "star" else _cc_min_label
    labels, _ = cc(edges, max_iter)

    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    clustered = labels.join(sizes, "label").select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cid"),
        F.col("cluster_size").alias("csz"),
    )
    out = corpus.select("doc_id").join(clustered, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cid", F.col("doc_id")).alias("cluster_id"),
        F.coalesce("csz", F.lit(1)).cast("long").alias("cluster_size"),
    )
    return out


def dedup_clusters(
    spark: SparkSession,
    sf: str,
    max_iter: int = 20,
    algo: str = "minlabel",
) -> DataFrame:
    """Presentation-ordered wrapper over ``_clusters_frame`` (the driver
    query); composed consumers (``dedup_survivors``, ``curation_funnel_v3``)
    take the unordered frame to avoid a single-partition sort mid-DAG."""
    return ordered(_clusters_frame(spark, sf, max_iter, algo), "doc_id")


def _ngram_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Unordered n-gram Jaccard pair core (building block — consumed by
    ``ngram_jaccard_pairs`` and the cross-family agreement audit)."""
    corpus = _docs_with_mutants(spark, sf)
    sh = (
        _with_words(corpus).select("doc_id", F.explode(_shingles()).alias("s"))
        .filter(F.col("s") != "")
        .distinct()
    )
    # one groupBy on the shingle key yields DF counts, the denominators, and
    # the intersection buckets; df > DF_MAX buckets are dropped wholesale
    buckets_all = sh.groupBy("s").agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
    kept_b = buckets_all.filter(F.size("ds") <= DF_MAX)
    sizes = (
        kept_b.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_sh"))
    )
    buckets = kept_b.filter(F.size("ds") > 1)
    inter = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ds",
                        lambda x, i: F.transform(
                            F.slice(F.col("ds"), i + 2, F.size("ds")),
                            lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.6)
    )


def ngram_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """n-gram Jaccard near-dup: pairs sharing ≥1 distinct shingle, scored
    |A∩B| / |A∪B|, kept at ≥ 0.6.  Intersection via exploded-shingle
    equi-join (scalable formulation — pair generation bounded by shared
    shingles, not |docs|²).

    Shingles with document frequency > DF_MAX are dropped from the
    REPRESENTATION (both intersection and sizes — standard stop-shingle
    practice): a shingle shared by 10^6 docs is pure pair-explosion noise,
    and without the cutoff its bucket materializes the whole cluster in one
    row and explodes k² pairs in one task.  The sizes are derived from the
    same DF-filtered buckets (one evaluation of the shingle pipeline feeds
    both intersection and denominators)."""
    return ordered(_ngram_pairs(spark, sf), "doc_a", "doc_b")


# ---------------------------------------------------------------------------
# xxhash64 production variants — the scale path.  The rolling-hash pandas UDF
# above exists for DuckDB-oracle bit-parity; these keep the identical
# banding/bucketing architecture but hash shingles with F.xxhash64 (JVM-side,
# vectorized, zero Python workers in the whole query).  Exposed as rows-only
# driver queries (hash values are engine-specific by construction, so there
# is no cross-engine oracle to match — architecture is pinned by the shared
# capped-bucket machinery and tests/test_dedup_scale.py).
# ---------------------------------------------------------------------------


def _minhash_sigs_fast(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _docs_with_mutants(spark, sf)
    has_shingles = F.size(F.split(F.trim(F.col("text")), r"\s+")) >= SHINGLE
    sh = _with_words(corpus.filter(has_shingles)).select(
        "doc_id", _shingles().alias("sh")
    )
    cols = [
        F.array_min(
            F.transform("sh", lambda s: F.xxhash64(F.lit(i), s))
        ).alias(f"m{i}")
        for i in range(len(MINHASH_AB))
    ]
    return sh.select("doc_id", *cols)


def minhash_signatures_fast(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash signatures with seeded xxhash64 per hash function — no Python
    worker anywhere in the plan."""
    return ordered(_minhash_sigs_fast(spark, sf), "doc_id")


def lsh_candidate_pairs_fast(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash-LSH banding over the xxhash64 signatures; identical band /
    capped-bucket / pair-explosion machinery as the oracle-parity variant."""
    sigs = _minhash_sigs_fast(spark, sf)
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band_id"), F.col("m0").alias("h1"), F.col("m1").alias("h2")),
                F.struct(F.lit(1).alias("band_id"), F.col("m2").alias("h1"), F.col("m3").alias("h2")),
            )
        ).alias("b"),
    ).select("doc_id", "b.band_id", "b.h1", "b.h2")
    buckets = (
        bands.groupBy("band_id", "h1", "h2")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("all_ds"))
        .select(F.slice("all_ds", 1, DEDUP_CAP).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ds",
                    lambda x, i: F.transform(
                        F.slice(F.col("ds"), i + 2, F.size("ds")),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return ordered(pairs.select("p.doc_a", "p.doc_b").distinct(), "doc_a", "doc_b")


def simhash_docs_fast(spark: SparkSession, sf: str) -> DataFrame:
    """16-bit SimHash over xxhash64 shingle hashes (JVM-side end to end)."""
    corpus = _docs_with_mutants(spark, sf)
    sh = _with_words(corpus).select("doc_id", F.explode(_shingles()).alias("s")).filter(
        F.col("s") != ""
    )
    h = sh.select("doc_id", F.xxhash64("s").alias("h"))
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(16)
        ]
    )
    fp = None
    for j in range(16):
        term = F.when(F.col(f"b{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return ordered(bit_sums.select("doc_id", fp.cast("long").alias("simhash")), "doc_id")


def _simhash_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Unordered per-doc SimHash fingerprints (building block)."""
    corpus = _docs_with_mutants(spark, sf)
    sh = _with_words(corpus).select("doc_id", F.explode(_shingles()).alias("s")).filter(
        F.col("s") != ""
    )
    h = sh.select("doc_id", _hash_string(F.col("s")).alias("h"))
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(16)
        ]
    )
    fp = None
    for j in range(16):
        term = F.when(F.col(f"b{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return bit_sums.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_docs(spark: SparkSession, sf: str) -> DataFrame:
    """16-bit SimHash over shingle hashes: bit_j = sign(Σ ±1 by bit j of each
    shingle hash); fingerprint = Σ 2^j over positive bits."""
    return ordered(_simhash_frame(spark, sf), "doc_id")


def dedup_survivors(
    spark: SparkSession, sf: str, clusters: DataFrame | None = None
) -> DataFrame:
    """End of the dedup pipeline: collapse every duplicate cluster to its
    canonical member and report how many near-duplicates were dropped.

    The canonical doc IS the cluster label (min doc_id of the component),
    so survivorship is a narrow ``doc_id == cluster_id`` filter over the
    cluster labels — no shuffle of its own.  This is the step a
    training-data curation run actually materializes: the kept corpus plus
    an audit count of removals (no silent drops).

    ``clusters`` — a previously materialized ``dedup_clusters`` frame (the
    production path: cluster once, persist the labels table, filter it
    here; never re-derive the clustering per consumer).  Omitted in the
    standalone driver query, which derives it inline."""
    cl = clusters if clusters is not None else _clusters_frame(spark, sf)
    out = cl.filter(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id",
        (F.col("cluster_size") - 1).cast("long").alias("n_dupes_removed"),
    )
    return ordered(out, "doc_id")


JACCARD_MIN_BP = 6_000  # verification floor: exact Jaccard >= 0.60


def lsh_jaccard_verify(spark: SparkSession, sf: str) -> DataFrame:
    """Candidate verification — the second half of the production MinHash
    pipeline: LSH banding RECALLS candidate pairs cheaply (with false
    positives by design), then each candidate is CONFIRMED by the exact
    Jaccard similarity of the two documents' distinct shingle-hash sets.
    Mirrors the reference's two-phase accept shape (cheap admission test,
    then the real computation; src/ocr/preprocess.service.ts admission →
    kernel) applied to dedup.

    Scale shape: the pair list is bounded by the banded-LSH bucket cap, and
    per-pair cost is O(|sh_a| + |sh_b|) array intersection — two hash joins
    on doc id bring the (doc_id, shingle-set) arrays to the pairs; no
    all-pairs product anywhere.  In a real run `pairs` is the materialized
    candidates table and the shingle arrays come from the signature store
    rather than being re-derived.

    The shingle-hash UDF pass feeds THREE subtrees (both join sides and
    the signature/pair derivation), so the hashed frame is evaluated once
    behind a localCheckpoint and everything derives from it."""
    corpus = _docs_with_mutants(spark, sf)
    has_shingles = F.size(F.split(F.trim(F.col("text")), r"\s+")) >= SHINGLE
    hashed = (
        _with_words(corpus.filter(has_shingles))
        .select("doc_id", _hash_shingles(_shingles()).alias("raw_sh"))
        .localCheckpoint()
    )
    pairs = _lsh_pairs(
        spark, sf, sigs=_sigs_from_hashed(hashed.select("doc_id", F.col("raw_sh").alias("sh")))
    )
    hashed = hashed.select("doc_id", F.array_distinct("raw_sh").alias("sh"))
    a = hashed.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = hashed.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    sized = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_inter"),
            (F.size("sh_a") + F.size("sh_b")).cast("long").alias("n_total"),
        )
    )
    out = sized.select(
        "doc_a",
        "doc_b",
        "n_inter",
        (F.col("n_total") - F.col("n_inter")).alias("n_union"),
        F.expr("(n_inter * 10000) div (n_total - n_inter)").alias("jaccard_bp"),
    ).withColumn(
        "verified", (F.col("jaccard_bp") >= JACCARD_MIN_BP).cast("int")
    )
    return ordered(out, "doc_a", "doc_b")


def minhash_jaccard_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """Estimator calibration for the MinHash pipeline: for every LSH
    candidate pair, the signature-agreement Jaccard ESTIMATE (fraction of
    agreeing MinHash positions — the textbook unbiased estimator) next to
    the EXACT shingle-set Jaccard that ``lsh_jaccard_verify`` computes.
    This is the query a curation run uses to pick the verification
    threshold: how much does the cheap estimate disagree with truth on
    real candidates?

    Scale shape: signatures are a fixed-width row per doc (the signature
    store), so both joins bring O(1)-width rows to the capped pair list by
    doc-id hash join; the exact side reuses the verify computation.  All
    outputs are exact integers (basis points via ``div``)."""
    # the signature frame feeds THREE consumers (the LSH pair derivation
    # and both join sides); Spark does not dedupe shared subtrees, so it
    # is localCheckpointed once — driver-query-sized (one fixed-width row
    # per doc), the same pattern as semantic_decontaminate
    sigs = _minhash_sigs(spark, sf).localCheckpoint()
    pairs = _lsh_pairs(spark, sf, sigs)
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(len(MINHASH_AB))]
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(len(MINHASH_AB))]
    )
    # ONE agreement-count formula, shared verbatim with the DuckDB oracle —
    # both output columns derive from it (two hand-built variants would
    # desynchronize on edit)
    nm = n_match_sql("a", "b")
    out = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(f"CAST({nm} AS BIGINT)").alias("n_match"),
            F.expr(f"({nm} * 10000) div {len(MINHASH_AB)}").alias("est_jaccard_bp"),
        )
    )
    return ordered(out, "doc_a", "doc_b")


def n_match_sql(pa: str, pb: str) -> str:
    """Signature-agreement count as a SQL fragment over ``{pa}i``/``{pb}i``
    columns — shared verbatim by the Spark expression above and the DuckDB
    oracle so both engines evaluate the identical integer formula."""
    return "(" + " + ".join(
        f"(CASE WHEN {pa}{i} = {pb}{i} THEN 1 ELSE 0 END)" for i in range(len(MINHASH_AB))
    ) + ")"


WINNOW_W = 4  # winnowing window: min-hash selected per W consecutive k-grams


def winnowing_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): over the sequence of k-gram hashes,
    slide a window of WINNOW_W and record the minimum hash of each window
    (leftmost on ties); the distinct selected (position, hash) set is the
    document's fingerprint.  Guarantees any shared run of >= W + k - 1
    words is detected while storing ~2/(W+1) of the hashes — the
    density/recall trade the paper proves, and the standard local
    fingerprint for plagiarism/near-dup detection.

    Scale shape: per-doc array work only (the window scan is a transform
    over the materialized shingle-hash array — O(n·W) per doc, no shuffle
    until the final explode-distinct on the doc key); the fingerprint
    store is ~2n/(W+1) rows per doc, never quadratic."""
    corpus = _docs_with_mutants(spark, sf)
    has_shingles = F.size(F.split(F.trim(F.col("text")), r"\s+")) >= SHINGLE
    hashed = _with_words(corpus.filter(has_shingles)).select(
        "doc_id", _hash_shingles(_shingles()).alias("sh")
    )
    w = WINNOW_W
    # two-stage transform so the window slice is bound ONCE per position
    # (a single transform would re-evaluate F.slice three times — inside
    # array_position and twice via array_min; nested transforms materialize
    # the w-element slice in the inner pass and the outer pass only reads
    # it, ~3× less array churn on the hottest per-doc loop)
    windows = F.transform(
        F.sequence(F.lit(1), F.size("sh") - (w - 1)),
        lambda i: F.struct(i.alias("i"), F.slice("sh", i, w).alias("win")),
    )
    sel = hashed.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("sh") >= w,
                F.array_distinct(
                    F.transform(
                        windows,
                        lambda s: F.struct(
                            (
                                s["i"]
                                + F.array_position(s["win"], F.array_min(s["win"]))
                                - 1
                            ).cast("long").alias("pos"),
                            F.array_min(s["win"]).alias("fp"),
                        ),
                    )
                ),
            ).otherwise(F.array().cast("array<struct<pos:long,fp:long>>"))
        ).alias("s"),
    ).select("doc_id", "s.pos", "s.fp")
    return ordered(sel, "doc_id", "pos", "fp")


WIN_W = 36  # char-window width for exact-substring dedup
WIN_S = 6  # stride; divides the 12-char mutant offset so overlay dups align


def substring_dupes(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring duplication report (the ExactSubstr signal of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better",
    re-shaped from suffix arrays to a distributed window-hash): every doc is
    cut into overlapping WIN_W-char windows at stride WIN_S; a window that
    occurs verbatim in >= 2 distinct documents marks a shared span.  Per
    doc: total windows, shared windows, and the first shared offset — the
    span a curation run would clip.

    Scale shape: explode -> distinct (window, doc) -> window-keyed count
    (map-side combine collapses boilerplate windows) -> window-keyed join
    back -> doc-keyed sum.  Every shuffle is on a natural key; the window
    frequency table is bounded by distinct content, not corpus size.  At
    10^12 turns the window string itself would be xxhash64-compressed
    before the shuffle (identical plan shape); the driver query keeps raw
    strings so the DuckDB oracle shares the exact key.  Suffix arrays find
    arbitrary-length repeats; strided fixed windows trade that for a
    shuffle-only plan and detect any repeat >= WIN_W + WIN_S - 1 chars."""
    corpus = _docs_with_mutants(spark, sf)
    docs = corpus.filter(F.length("text") >= WIN_W)
    wins = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.length("text") - (WIN_W - 1), F.lit(WIN_S)
                ),
                lambda p: F.struct(
                    p.alias("pos"), F.col("text").substr(p, F.lit(WIN_W)).alias("win")
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.pos", "s.win")
    wdocs = wins.select("win", "doc_id").distinct()
    wcount = wdocs.groupBy("win").agg(F.count("*").alias("n_docs"))
    flagged = wins.join(wcount, "win")
    out = flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_windows"),
        F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_shared"),
        F.min(F.when(F.col("n_docs") >= 2, F.col("pos"))).cast("long").alias(
            "first_shared_pos"
        ),
    )
    return ordered(out, "doc_id")


def curation_funnel_v3(spark: SparkSession, sf: str) -> DataFrame:
    """NEAR-dup curation funnel: crawl batch (documents ∪ mutant overlay,
    the same "new crawl" rule as ``dedup_incremental``) → Gopher quality
    gate → MinHash-LSH near-duplicate collapse (keep = cluster canonical,
    the ``dedup_survivors`` rule) → benchmark decontamination, audited as
    cumulative per-stage survivor counts.

    Complements ``curation_funnel`` (EXACT-hash dedup over raw documents)
    and ``curation_funnel_v2`` (boilerplate-strip then gate): v3 is the
    funnel a web-crawl pipeline runs where duplicates are near-misses, not
    byte-identical.  Composition shape: quality and decontamination flags
    are narrow/broadcast single-pass computations; the near-dup flag comes
    from ONE clustering evaluation (iterative CC over the candidate-pair
    graph, localCheckpointed inside); flags meet on doc_id and collapse to
    one row of cumulative conjunction sums unpivoted by ``stack``."""
    from .corpus import DECON_N, _doc_grams, _split_expr, gopher_flags

    corpus = _docs_with_mutants(spark, sf)
    quality = gopher_flags(corpus).select("doc_id", "pass_gopher")
    labels = _clusters_frame(spark, sf)
    # benchmark = held-out test split of the same batch (split rule shared
    # with curation_funnel); contaminated ⇔ shares a DECON_N-gram with it
    lab = corpus.withColumn("split", _split_expr())
    bench_grams = (
        _doc_grams(lab.filter(F.col("split") == "test")).select("gram").distinct()
    )
    dirty = (
        _doc_grams(corpus)
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("dirty", F.lit(True))
    )
    staged = (
        quality.join(labels, "doc_id")
        .join(dirty, "doc_id", "left")
        .select(
            (F.col("pass_gopher") == 1).alias("q"),
            (F.col("doc_id") == F.col("cluster_id")).alias("canon"),
            (~F.coalesce("dirty", F.lit(False))).alias("clean"),
        )
    )
    stage_flags = ["q", "canon", "clean"]
    survivors = [
        F.sum(F.expr(" AND ".join(stage_flags[: i + 1])).cast("long")).alias(f"s{i + 1}")
        for i in range(len(stage_flags))
    ]
    agg = staged.agg(F.count("*").alias("s0"), *survivors)
    out = agg.select(
        F.expr(
            "stack(4, 0, 'raw', s0, 1, 'quality', s1,"
            " 2, 'neardup', s2, 3, 'decontaminated', s3)"
        ).alias("stage_idx", "stage", "n_docs")
    )
    return ordered(out, "stage_idx")


def fast_parity(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-visible VALUE check for the xxhash64 production data plane.

    The ``_fast`` variants hash with a different family, so their band
    collisions — and hence their raw candidate sets — are legitimately
    different from the portable pipeline's (measured at sf0.01: 7 pairs
    found only by portable bands, 7 only by fast bands; the differences
    persist even after exact-Jaccard verification because a 2-band × 2-row
    scheme has sub-1 recall per family).  Set equality is therefore not a
    checkable property.  What IS exact is the data plane every fast stage
    rides on: shingling → xxhash64 → distinct-set semantics.  On the
    PORTABLE candidate pair list (reproducible in SQL), the exact Jaccard
    computed from xxhash64-hashed shingle sets must equal the exact Jaccard
    the oracle computes from the raw shingle STRINGS — hashing is injective
    modulo 64-bit collisions, so any divergence in the fast path's
    tokenization, hashing, null handling, or set arithmetic mismatches
    these integers pair by pair.

    Scale shape: identical to ``lsh_jaccard_verify`` — capped banded pair
    list, two doc-id hash joins, per-pair O(|sh_a| + |sh_b|) intersection;
    the double-hashed frame feeds three subtrees and is localCheckpointed
    once (driver-query-sized: one row per doc)."""
    corpus = _docs_with_mutants(spark, sf)
    has_shingles = F.size(F.split(F.trim(F.col("text")), r"\s+")) >= SHINGLE
    both = (
        _with_words(corpus.filter(has_shingles))
        .select("doc_id", _shingles().alias("shs"))
        .select(
            "doc_id",
            _hash_shingles(F.col("shs")).alias("slow_sh"),
            F.transform("shs", lambda s: F.xxhash64(s)).alias("fast_sh"),
        )
        .localCheckpoint()
    )
    pairs = _lsh_pairs(
        spark, sf, sigs=_sigs_from_hashed(both.select("doc_id", F.col("slow_sh").alias("sh")))
    )
    fsets = both.select("doc_id", F.array_distinct("fast_sh").alias("sh"))
    a = fsets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = fsets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    out = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_inter"),
            (F.size("sh_a") + F.size("sh_b"))
            .cast("long")
            .alias("n_total"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            (F.col("n_total") - F.col("n_inter")).alias("n_union"),
            F.expr("(n_inter * 10000) div (n_total - n_inter)").alias("jaccard_bp"),
        )
    )
    return ordered(out, "doc_a", "doc_b")


def substring_dupes_fast(spark: SparkSession, sf: str) -> DataFrame:
    """Production twin of ``substring_dupes``: the WIN_W-char window string
    is xxhash64-compressed BEFORE the explode, so the shuffle moves 8-byte
    keys instead of 36-char strings — the exact plan shape the
    ``substring_dupes`` docstring promises for 10^12 turns.  Window counts
    only depend on window EQUALITY, which the hash preserves (injective
    modulo 64-bit collisions), so the per-doc output is value-identical to
    the raw-string variant and shares its DuckDB oracle verbatim — a full
    driver-visible correctness row for the fast path."""
    corpus = _docs_with_mutants(spark, sf)
    docs = corpus.filter(F.length("text") >= WIN_W)
    wins = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.length("text") - (WIN_W - 1), F.lit(WIN_S)
                ),
                lambda p: F.struct(
                    p.alias("pos"),
                    F.xxhash64(F.col("text").substr(p, F.lit(WIN_W))).alias("win_h"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.pos", "s.win_h")
    wdocs = wins.select("win_h", "doc_id").distinct()
    wcount = wdocs.groupBy("win_h").agg(F.count("*").alias("n_docs"))
    flagged = wins.join(wcount, "win_h")
    out = flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_windows"),
        F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_shared"),
        F.min(F.when(F.col("n_docs") >= 2, F.col("pos"))).cast("long").alias(
            "first_shared_pos"
        ),
    )
    return ordered(out, "doc_id")


# the banding-scheme sweep: the fixed 4-hash MinHash budget arranged as
# (n_bands x rows_per_band) — 1x4 is the tightest (highest precision,
# lowest recall: all 4 sigs must agree), 4x1 the loosest (any single sig
# agreement makes a candidate)
BAND_SWEEP = ((1, 4), (2, 2), (4, 1))


def minhash_band_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """LSH banding calibration — the recall/cost tuning table an operator
    reads before fixing b and r at 100 TB (Leskovec et al., MMDS ch. 3:
    the (b, r) trade is THE design knob of MinHash-LSH): for every
    arrangement of the same 4-hash budget, the candidate-pair volume and
    the mean signature-agreement Jaccard estimate of those pairs, as exact
    integers.  Looser banding (more bands, fewer rows) strictly widens the
    candidate set (every r-row agreement at 2x2 implies its band-prefix
    agreements at 4x1) while diluting mean pair quality — this query makes
    both directions measurable next to ``lsh_drop_stats``'s cap audit and
    ``lsh_jaccard_verify``'s exact re-rank.

    Scale shape: the signature frame is computed ONCE (localCheckpoint —
    doc-count-sized, 4 longs per doc) and each scheme is the standard
    capped bucket-collect + in-array pair explosion on its own band key;
    per-pair estimation joins on doc_id.  Nothing is quadratic: every
    scheme's buckets are DEDUP_CAP-capped."""
    sigs = _minhash_sigs(spark, sf).localCheckpoint()
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(len(MINHASH_AB))],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(len(MINHASH_AB))],
    )
    parts = []
    for nb, r in BAND_SWEEP:
        bands = sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("band_id"),
                            F.concat_ws(
                                ":", *[F.col(f"m{t * r + j}") for j in range(r)]
                            ).alias("bk"),
                        )
                        for t in range(nb)
                    ]
                )
            ).alias("x"),
        ).select("doc_id", "x.band_id", "x.bk")
        buckets = (
            bands.groupBy("band_id", "bk")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("all_ds"))
            .select(F.slice("all_ds", 1, DEDUP_CAP).alias("ds"))
            .filter(F.size("ds") > 1)
        )
        pairs = (
            buckets.select(
                F.explode(
                    F.flatten(
                        F.transform(
                            "ds",
                            lambda x, i: F.transform(
                                F.slice(F.col("ds"), i + 2, F.size("ds")),
                                lambda y: F.struct(
                                    x.alias("doc_a"), y.alias("doc_b")
                                ),
                            ),
                        )
                    )
                ).alias("p")
            )
            .select("p.doc_a", "p.doc_b")
            .distinct()
        )
        n_match = sum(
            (F.col(f"a{i}") == F.col(f"b{i}")).cast("long")
            for i in range(len(MINHASH_AB))
        )
        est = pairs.join(a, "doc_a").join(b, "doc_b").select(
            n_match.alias("n_match")
        )
        stats = est.agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.coalesce(F.sum("n_match"), F.lit(0)).cast("long").alias("sum_match"),
        )
        parts.append(
            stats.select(
                F.lit(f"{nb}x{r}").alias("scheme"),
                F.lit(nb).cast("int").alias("n_bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                "n_pairs",
                "sum_match",
                F.when(F.col("n_pairs") == 0, F.lit(0))
                .otherwise(
                    F.expr(f"(sum_match * 10000) div ({len(MINHASH_AB)} * n_pairs)")
                )
                .cast("long")
                .alias("mean_est_jaccard_bp"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return ordered(out, "scheme")


def dedup_family_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-family candidate agreement — the Venn decomposition of the
    three near-dup detectors' pair sets (MinHash-LSH banding, exact n-gram
    Jaccard >= 0.6, SimHash fingerprint blocking), one row per non-empty
    membership region.  This is the audit a curation operator reads before
    trusting ONE family at 100 TB: pairs found by Jaccard but missed by the
    LSH bands quantify banding recall; pairs found only by 16-bit SimHash
    blocking quantify its false-positive rate.  Complements
    ``ann_recall_audit`` (the same question for the vector families) and
    ``minhash_band_sweep`` (recall across banding schemes).

    Scale shape: each family's pair list is its existing capped/bounded
    generator (band buckets DEDUP_CAP-capped, shingle buckets DF_MAX-cut,
    fingerprint buckets DEDUP_CAP-capped) — never all-pairs; the Venn merge
    is one groupBy on the pair key with map-side combine."""
    flags = ("in_lsh", "in_ngram", "in_simhash")

    def tagged(pairs: DataFrame, fam: str) -> DataFrame:
        return pairs.select(
            "doc_a",
            "doc_b",
            *[F.lit(1 if f == fam else 0).alias(f) for f in flags],
        )

    lsh = tagged(_lsh_pairs(spark, sf), "in_lsh")
    ng = tagged(_ngram_pairs(spark, sf).select("doc_a", "doc_b"), "in_ngram")
    fps = _simhash_frame(spark, sf)
    sim_buckets = (
        fps.groupBy("simhash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("all_ds"))
        .select(F.slice("all_ds", 1, DEDUP_CAP).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    sim_pairs = (
        sim_buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ds",
                        lambda x, i: F.transform(
                            F.slice(F.col("ds"), i + 2, F.size("ds")),
                            lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                        ),
                    )
                )
            ).alias("p")
        ).select("p.doc_a", "p.doc_b")
    )
    u = lsh.unionByName(ng).unionByName(tagged(sim_pairs, "in_simhash"))
    venn = (
        u.groupBy("doc_a", "doc_b")
        .agg(*[F.max(f).cast("int").alias(f) for f in flags])
        .groupBy(*flags)
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )
    return ordered(venn, *flags)


def dedup_cluster_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-size distribution of the near-dup graph — the audit row a
    dedup run reads before trusting its survivor count (a fat head means a
    boilerplate template is welding unrelated pages into one component; a
    long singleton tail means the banding recalls nothing).  One row per
    component size: how many clusters, how many documents they hold, and
    how many non-canonical members a keeper pass would drop.

    Scale shape: two keyed aggregates over the cluster labels (label →
    size, size → counts) with map-side combine; output is bounded by the
    distinct-size count.  The clustering itself is the capped-LSH + CC
    pipeline shared with ``dedup_clusters``."""
    labels = _clusters_frame(spark, sf)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").cast("long").alias("size"))
    out = sizes.groupBy("size").agg(
        F.count("*").cast("long").alias("n_clusters"),
        (F.count("*") * F.col("size")).cast("long").alias("n_docs"),
        ((F.col("size") - 1) * F.count("*")).cast("long").alias("n_dropped"),
    ).select("size", "n_clusters", "n_docs", "n_dropped")
    return ordered(out, "size")
