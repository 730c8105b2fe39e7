"""Corpus-curation operators for a large-scale training-data pipeline:
repetition filtering signals, vocabulary heavy hitters, TF-IDF key terms,
deterministic train/val/test splitting, stratified sampling, and PII
redaction.  All JVM-side (built-in functions, whole-stage codegen) — no
Python anywhere; every operator has a DuckDB oracle.

Scale notes: every groupBy here is keyed (token / doc_id / stratum) with
map-side partial aggregation; per-doc top-k goes through a window on the
doc_id shuffle key, global top-k through TakeOrderedAndProject.  Nothing
collects to the driver and nothing is quadratic in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import ordered
from ..sources import load

# train/val/test thresholds over the 256 md5-derived buckets (~80/10/10)
TRAIN_UPTO = 205
VAL_UPTO = 230
STRATUM_K = 5  # docs kept per (lang, source) stratum
TOP_TERMS = 3  # TF-IDF terms kept per doc
N_HITTERS = 20  # global heavy-hitter vocabulary size

# synthetic-PII decoration + redaction patterns (kept to constructs with
# identical semantics in Java regex and RE2 so the oracle matches exactly)
EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
PHONE_RE = r"\+1-555-[0-9]{4}"


def _words(col: str = "text"):
    return F.split(F.trim(F.col(col)), r"\s+")


def repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of word
    occurrences that are repeats (1 - distinct/total) and the share of the
    most frequent 2-gram — the standard duplicate-content quality gates for
    training corpora.  Ties on the top 2-gram break to the lexicographically
    smallest (deterministic)."""
    docs = load(spark, sf, "documents")
    # staged projections, deliberately: (1) materialize the words array —
    # referencing the split() EXPRESSION from inside the gram lambda would
    # inline a full re-split per element_at call (O(words²) per doc,
    # measured 4×); (2) compute the per-doc scalars BEFORE the explode —
    # selected next to a generator they would re-evaluate once per gram
    # row, not once per doc.  CollapseProject leaves both stages alone
    # (multi-use non-cheap aliases).  The scalars then ride through the
    # explode as extra groupBy keys (constant per doc_id — no new groups).
    wdocs = docs.select("doc_id", _words().alias("w"))
    scalars = wdocs.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        "w",
    )
    wc = F.col("w")
    exploded = scalars.select(
        "doc_id",
        "n_words",
        "n_distinct",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(wc) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(wc, i), F.element_at(wc, i + 1)
                ),
            )
        ).alias("gram"),
    )
    gram_counts = exploded.groupBy("doc_id", "n_words", "n_distinct", "gram").agg(
        F.count("*").alias("n")
    )
    top = gram_counts.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("gram"))
        ),
    ).filter(F.col("rn") == 1)
    out = top.select(
        "doc_id",
        "n_words",
        F.round(1 - F.col("n_distinct") / F.col("n_words"), 4).alias("dup_word_frac"),
        F.col("gram").alias("top_2gram"),
        F.round(F.col("n") / (F.col("n_words") - 1), 4).alias("top_2gram_frac"),
    )
    return ordered(out, "doc_id")


def heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-N vocabulary tokens by occurrence count (two-stage
    aggregation: map-side partial counts per token, one shuffle on the token
    key, then TakeOrderedAndProject for the top N — no global sort)."""
    docs = load(spark, sf, "documents")
    counts = (
        docs.select(F.explode(_words()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(N_HITTERS)
    # the unpartitioned window runs AFTER the limit — ≤ N_HITTERS rows by
    # construction, so the single-partition WindowExec is driver-sized
    return ordered(
        top.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token"))),
        ),
        "rank",
    )


def tfidf_topterms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-K terms by TF·IDF with the linear idf variant
    N/df (rational arithmetic — one IEEE division on exact integers, so the
    DuckDB oracle matches bit-for-bit; ln-based idf would hinge on libm).
    tf and df come from two keyed aggregations; N rides in as a broadcast
    scalar (no driver round-trip)."""
    docs = load(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(_words())).alias("token")
    ).filter(F.col("token") != "")
    all_toks = docs.select("doc_id", F.explode(_words()).alias("token")).filter(
        F.col("token") != ""
    )
    tf = all_toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(F.col("tf") * F.col("n_docs") / F.col("df"), 4).alias("tfidf"),
        )
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.desc("tfidf"), F.asc("token")
            )
        ),
    ).filter(F.col("rank") <= TOP_TERMS)
    return ordered(
        ranked.select("doc_id", "rank", "token", "tf", "df", "tfidf"),
        "doc_id",
        "rank",
    )


def _md5_bucket(expr):
    """First md5 byte as an int in [0, 256) via hex-digit position — the
    only content-hash-to-int construction expressible identically in Spark
    SQL and DuckDB (no conv/from_hex dependency)."""
    h = F.md5(expr)
    hexd = F.lit("0123456789abcdef")
    d1 = F.instr(hexd, F.substring(h, 1, 1)) - 1
    d2 = F.instr(hexd, F.substring(h, 2, 1)) - 1
    return (d1 * 16 + d2).cast("int")


def sample_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic content-hash train/val/test assignment (~80/10/10):
    bucket = first md5 byte of 'doc_id:text'.  Reproducible across runs,
    clusters, and engines — the property a training pipeline needs so a
    re-run never migrates documents between splits."""
    docs = load(spark, sf, "documents")
    bucket = _md5_bucket(F.concat_ws(":", F.col("doc_id"), F.col("text")))
    out = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_UPTO, "train")
        .when(bucket < VAL_UPTO, "val")
        .otherwise("test")
        .alias("split"),
    )
    return ordered(out, "doc_id")


def stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling: the K docs with the smallest
    content hash per (lang, source) stratum — one window over the stratum
    shuffle key; every stratum is represented regardless of its share of
    the corpus (uniform hash sampling would starve small strata)."""
    docs = load(spark, sf, "documents")
    ranked = docs.select(
        "lang", "source", "doc_id", F.md5("text").alias("h")
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang", "source").orderBy("h", "doc_id")
        ),
    )
    out = ranked.filter(F.col("rn") <= STRATUM_K).select(
        "lang", "source", "doc_id", "rn"
    )
    return ordered(out, "lang", "source", "rn")


def pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction over a deterministically decorated corpus: each doc
    gets a synthetic email + phone appended (the testdata carries none), then
    both are regex-redacted and counted.  Patterns are restricted to
    constructs with identical Java-regex/RE2 semantics so the oracle matches
    the redacted text exactly."""
    docs = load(spark, sf, "documents")
    decorated = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(decorated, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    out = docs.select(
        "doc_id",
        F.regexp_count(decorated, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(decorated, F.lit(PHONE_RE)).alias("n_phones"),
        F.substring(redacted, F.length(redacted) - 39, 40).alias("redacted_tail"),
    )
    return ordered(out, "doc_id")


CHUNK_SIZE = 64  # words per training chunk
CHUNK_STRIDE = 48  # chunk start stride (CHUNK_SIZE - CHUNK_STRIDE overlap)
PACK_BUDGET = 256  # token budget per packed training shard


def chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    word-window chunks (size CHUNK_SIZE, stride CHUNK_STRIDE) — the step
    that turns curated documents into training-context-sized samples.

    Shape: one narrow projection chain — materialize the words array ONCE
    (same staged-projection rule as repetition_stats), compute the start
    offsets as a ``sequence``, then a single posexplode.  Fan-out is
    ~n_words/stride per doc, linear in corpus size; no shuffle at all
    before the presentation sort."""
    docs = load(spark, sf, "documents")
    wdocs = docs.select("doc_id", _words().alias("w"))
    staged = wdocs.select(
        "doc_id", "w",
        F.expr(f"sequence(1, greatest(size(w), 1), {CHUNK_STRIDE})").alias("starts"),
    )
    exploded = staged.select(
        "doc_id", "w",
        F.posexplode("starts").alias("chunk_idx", "start_word"),
    )
    out = exploded.select(
        "doc_id",
        "chunk_idx",
        "start_word",
        F.least(
            F.lit(CHUNK_SIZE), F.size("w") - F.col("start_word") + 1
        ).cast("int").alias("n_tokens"),
        F.array_join(F.slice("w", F.col("start_word"), CHUNK_SIZE), " ").alias(
            "chunk_text"
        ),
    )
    return ordered(out, "doc_id", "chunk_idx")


def pack_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy sequential sample packing: documents are packed in doc_id
    order into training shards of ~PACK_BUDGET tokens; a doc joins the
    current shard if any budget remains, else starts the next one
    (equivalently shard_id = floor(tokens_before_doc / budget) — docs are
    never split, shards may overflow by at most one doc's tail).

    Scale shape: the running sum is a window PARTITIONED BY the shard
    group (lang here) — packing parallelism is per-group, never a global
    single-partition window; the only shuffle is the keyed window
    exchange."""
    return ordered(_packed_frame(spark, sf), "doc_id")


def _packed_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Unordered packing-assignment core (building block — consumed by
    ``pack_shards`` and the ``shard_stats`` audit)."""
    docs = load(spark, sf, "documents")
    toks = docs.select(
        "doc_id", "lang",
        F.size(_words()).cast("long").alias("n_tokens"),
    )
    win = Window.partitionBy("lang").orderBy("doc_id")
    cum = F.sum("n_tokens").over(win)
    return toks.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(PACK_BUDGET)).alias("shard_id"),
        (cum - F.col("n_tokens")).alias("tokens_before"),
    )


def shard_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Packing audit — per (lang, shard) doc count, token fill, fill rate
    in exact basis points, and the overflow flag (greedy packing lets the
    last doc overflow the budget rather than split).  This is the
    observability row a training job reads before trusting the packed
    layout: systematic under-fill means wasted sequence length, heavy
    overflow means the budget is mis-sized vs the doc-length distribution
    — same no-silent-caps discipline as ``lsh_drop_stats``.

    Scale shape: one keyed aggregate over the packing assignment
    (map-side combine on (lang, shard_id)); output is shard-count-sized."""
    out = (
        _packed_frame(spark, sf)
        .groupBy("lang", "shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(
            "lang",
            "shard_id",
            "n_docs",
            "n_tokens",
            F.expr(f"(n_tokens * 10000) div {PACK_BUDGET}").alias("fill_bp"),
            (F.col("n_tokens") > PACK_BUDGET).cast("int").alias("overflow"),
        )
    )
    return ordered(out, "lang", "shard_id")


DECON_N = 8  # benchmark-overlap n-gram size (13 in GPT-3-era pipelines; 8 fits the synthetic doc lengths)

# per-source mixture keep-threshold over the 256 md5 buckets:
# MIX_BASE + MIX_STEP * (source_index % MIX_MOD)   (rates 25%..72%)
MIX_BASE = 64
MIX_STEP = 8
MIX_MOD = 16


def _split_expr():
    """Content-hash split label — the exact assignment ``sample_split``
    emits, usable inline by other operators (decontamination)."""
    bucket = _md5_bucket(F.concat_ws(":", F.col("doc_id"), F.col("text")))
    return (
        F.when(bucket < TRAIN_UPTO, "train")
        .when(bucket < VAL_UPTO, "val")
        .otherwise("test")
    )


def _doc_grams(docs: DataFrame) -> DataFrame:
    """Distinct DECON_N-word shingles per document (none for shorter docs).
    The words array is materialized as an alias BEFORE the transform lambda
    (staged-projection rule — slicing the split() expression itself would
    re-split per gram).  The sequence is guarded: Spark's two-arg
    ``sequence(1, stop)`` DESCENDS for stop < 1, so short docs must take
    the empty-array branch, not ``sequence(1, 0)``."""
    wdocs = docs.select("doc_id", _words().alias("w"))
    return wdocs.select(
        "doc_id",
        F.explode(_gram_array(F.col("w"), DECON_N)).alias("gram"),
    )


def _gram_array(w, n: int):
    """Distinct n-word shingles of a words-array column, [] when too short
    (guarded: Spark's two-arg ``sequence(1, stop)`` DESCENDS for stop < 1).
    Shared by doc-level and turn-level decontamination."""
    return F.array_distinct(
        F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.array_join(F.slice(w, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    DECON_N-gram with the held-out test split (the standard n-gram-overlap
    decontamination of GPT-3/PaLM data pipelines, expressed as a semi-join
    on the shingle key).

    Scale shape: the benchmark gram set is small and fixed-size (benchmarks
    don't grow with the corpus) → broadcast; the training side then never
    shuffles for the membership test — one broadcast LeftSemi per gram row
    plus a keyed per-doc count.  Nothing is quadratic and no gram list is
    ever collected into a single row."""
    docs = load(spark, sf, "documents").withColumn("split", _split_expr())
    train = docs.filter(F.col("split") == "train")
    bench_grams = (
        _doc_grams(docs.filter(F.col("split") == "test")).select("gram").distinct()
    )
    tg = _doc_grams(train)
    per_doc = tg.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    shared = (
        tg.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    out = (
        train.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )
    return ordered(out, "doc_id")


def _mixture(docs: DataFrame) -> DataFrame:
    """Per-doc mixture decision: deterministic content-hash bucket vs the
    per-source keep threshold ('mix' salt keeps the decision independent of
    the train/val/test split hash)."""
    idx = F.expr("CAST(substring(source, 4) AS INT)")
    thr = (F.lit(MIX_BASE) + F.lit(MIX_STEP) * (idx % MIX_MOD)).cast("int")
    bucket = _md5_bucket(F.concat_ws(":", F.col("doc_id"), F.col("text"), F.lit("mix")))
    return docs.select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
        thr.alias("keep_threshold"),
        (bucket < thr).cast("int").alias("kept"),
    )


def source_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Source-mixture downsampling: each source keeps a configured fraction
    of its documents (keep_threshold/256), decided per doc by content hash —
    the reweighting step that shapes a raw crawl into a target training
    mixture, reproducible across runs and engines (no RNG state)."""
    return ordered(_mixture(load(spark, sf, "documents")), "doc_id")


def mixture_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Achieved-vs-target mixture audit per source.  The achieved rate is
    reported in basis points via INTEGER division (exact in both engines —
    a rounded float ratio can straddle a half-ulp tie between Spark and the
    oracle).  One keyed aggregation; threshold rides as a group key (it is
    functionally dependent on source)."""
    per = _mixture(load(spark, sf, "documents"))
    agg = per.groupBy("source", "keep_threshold").agg(
        F.count("*").alias("n_docs"),
        F.sum("kept").cast("long").alias("n_kept"),
    )
    out = agg.select(
        "source",
        "keep_threshold",
        "n_docs",
        "n_kept",
        F.expr("(n_kept * 10000) div n_docs").alias("achieved_bp"),
    )
    return ordered(out, "source")


def ngram_lm_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus bigram language-model table: occurrence counts n(w1,w2),
    unigram context totals n(w1), and the conditional probability
    P(w2|w1) in exact integer basis points — the count statistics an n-gram
    LM (or a perplexity-based quality filter built on one) trains from.

    Scale shape: two keyed aggregations (bigram key, then context key) with
    map-side partial counts, joined back on the context key — the classic
    count/divide shape; nothing collects and nothing is quadratic.  The
    probability uses integer ``div`` (half-ulp-tie-proof across engines)."""
    docs = load(spark, sf, "documents")
    wdocs = docs.select("doc_id", _words().alias("w"))
    bigrams = wdocs.select(F.explode(_bigrams(F.col("w"))).alias("b")).select(
        "b.w1", "b.w2"
    )
    n12 = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    n1 = bigrams.groupBy("w1").agg(F.count("*").alias("n1"))
    out = n12.join(n1, "w1").select(
        "w1",
        "w2",
        "n12",
        "n1",
        F.expr("(n12 * 10000) div n1").alias("cond_bp"),
    )
    return ordered(out, "w1", "w2")


VOCAB_TOP = 30  # vocabulary sizes audited by vocab_coverage


def vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative corpus coverage of the top-N vocabulary: for each of the
    VOCAB_TOP most frequent tokens, the running share of ALL token
    occurrences covered by the vocabulary up to that rank (exact integer
    basis points) — the audit that sizes a tokenizer vocabulary against a
    corpus.

    Scale shape: token counts are one keyed aggregation; the top-N cut is
    TakeOrderedAndProject (never a global sort of the vocabulary); the
    cumulative window then runs over <= N driver-sized rows, and the grand
    total rides in as a broadcast scalar."""
    docs = load(spark, sf, "documents")
    counts = (
        docs.select(F.explode(_words()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(VOCAB_TOP)
    total = counts.agg(F.sum("n").alias("total"))
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    out = (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("cum", F.sum("n").over(w))
        .select(
            "rank",
            "token",
            "n",
            F.expr("(cum * 10000) div total").alias("cum_bp"),
        )
    )
    return ordered(out, "rank")


def tokenize_ids(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus tokenization: every document rendered as its vocab-id
    sequence — the step between curation and sample packing.  The
    vocabulary is the corpus top-VOCAB_TOP tokens (id = frequency rank,
    1-based; ties -> lexicographic, the ``vocab_coverage`` order) and
    everything else maps to the OOV id 0.  Emits the id sequence (space-
    joined string — a stable scalar for cross-engine comparison), token and
    OOV counts, and the OOV share in exact basis points.

    Scale shape: the vocabulary is fixed-size by construction -> broadcast
    hash join against the exploded tokens (the unbounded side never
    shuffles to be looked up); reassembly is one keyed groupBy on doc_id
    with an order-restoring array_sort on the carried position."""
    docs = load(spark, sf, "documents")
    counts = (
        docs.select(F.explode(_words()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    vocab = (
        counts.orderBy(F.desc("n"), F.asc("token"))
        .limit(VOCAB_TOP)
        .withColumn(
            "tok_id",
            F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token"))),
        )
        .select("token", "tok_id")
    )
    toks = docs.select(
        "doc_id", F.posexplode(_words()).alias("pos", "token")
    ).filter(F.col("token") != "")
    tagged = toks.join(F.broadcast(vocab), "token", "left").select(
        "doc_id", "pos", F.coalesce("tok_id", F.lit(0)).alias("tok_id")
    )
    agg = tagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum((F.col("tok_id") == 0).cast("long")).alias("n_oov"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok_id"))),
                lambda s: s["tok_id"].cast("string"),
            ),
            " ",
        ).alias("ids_str"),
    )
    out = agg.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.expr("(n_oov * 10000) div n_tokens").alias("oov_bp"),
        "ids_str",
    )
    return ordered(out, "doc_id")


SEG_WORDS = 10  # words per dedup segment (the "line" unit — the synthetic corpus has no newlines)


def line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """C4-style corpus-wide segment-level dedup: each document is cut into
    non-overlapping SEG_WORDS-word segments (the line analog — the synthetic
    text carries no newlines) and every segment text is kept only at its
    first corpus occurrence, first = smallest (doc_id, seg_idx).  Emits the
    per-doc segment/survivor counts and the reassembled deduped text — the
    exact shape of C4's "discard duplicate three-sentence spans" pass.

    Scale shape: the keeper per segment is a ``min(struct(doc_id, seg_idx))``
    AGGREGATION on the segment key — map-side partial min shrinks a segment
    duplicated 10^6 times to one row per input partition before the shuffle
    (a window row_number would instead sort the whole hot key in one task);
    the mark-back is a plain equi-join on the same key (AQE skew-split
    eligible), and reassembly is one keyed groupBy on doc_id."""
    docs = load(spark, sf, "documents")
    wdocs = docs.select("doc_id", _words().alias("w"))
    segs = wdocs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("w"), F.lit(SEG_WORDS)),
                lambda i: F.array_join(F.slice("w", i, SEG_WORDS), " "),
            )
        ).alias("seg_idx", "seg"),
    )
    keepers = segs.groupBy("seg").agg(
        F.min(F.struct("doc_id", "seg_idx")).alias("k")
    )
    marked = segs.join(keepers, "seg").select(
        "doc_id",
        "seg_idx",
        "seg",
        (
            (F.col("doc_id") == F.col("k.doc_id"))
            & (F.col("seg_idx") == F.col("k.seg_idx"))
        ).alias("kept"),
    )
    out = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("kept"), F.struct("seg_idx", "seg")))
                ),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    return ordered(out, "doc_id")


# Gopher-style quality-rule thresholds.  All signals are INTEGERS (mean word
# length ×100 and distinct-word fraction in basis points, both via integer
# div) — a rounded float ratio can straddle a half-ulp HALF_UP/HALF_EVEN tie
# between Spark and the oracle; integer division cannot.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MEANLEN_MIN_X100 = 300  # mean word length in [3, 10]
GOPHER_MEANLEN_MAX_X100 = 1_000
GOPHER_DISTINCT_MIN_BP = 3_000  # >= 30% distinct words
GOPHER_STOP_MIN = 2  # >= 2 stop-word hits


def gopher_flags(
    df: DataFrame, text_col: str = "text", keep: list[str] | None = None
) -> DataFrame:
    """Gopher rule signals + flags for an arbitrary (doc_id, text) frame —
    the reusable gate: ``gopher_rules`` applies it to raw documents,
    ``curation_funnel_v2`` to boilerplate-stripped main text.  ``keep``
    columns ride through untouched (so a caller composes without a
    self-join that would re-evaluate the input subtree per side)."""
    from .text import EN_STOPWORDS

    keep = keep or []
    # staged projections (repetition_stats rule): materialize the words
    # array once; the sum-of-lengths fold references the alias, not split()
    wdocs = df.select(
        "doc_id",
        *keep,
        F.col(text_col).alias("gt"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("w"),
    )
    staged = wdocs.select(
        "doc_id",
        *keep,
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.aggregate(
            F.transform("w", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("sum_len"),
        F.regexp_count(F.lower("gt"), F.lit(EN_STOPWORDS)).alias("n_stop"),
    )
    sig = staged.select(
        "doc_id",
        *keep,
        "n_words",
        F.expr("(sum_len * 100) div n_words").alias("mean_wlen_x100"),
        F.expr("(n_distinct * 10000) div n_words").alias("distinct_bp"),
        "n_stop",
    )
    words_ok = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    mlen_ok = F.col("mean_wlen_x100").between(
        GOPHER_MEANLEN_MIN_X100, GOPHER_MEANLEN_MAX_X100
    )
    dist_ok = F.col("distinct_bp") >= GOPHER_DISTINCT_MIN_BP
    stop_ok = F.col("n_stop") >= GOPHER_STOP_MIN
    return sig.select(
        "doc_id",
        *keep,
        "n_words",
        "mean_wlen_x100",
        "distinct_bp",
        "n_stop",
        words_ok.cast("int").alias("words_ok"),
        mlen_ok.cast("int").alias("mean_len_ok"),
        dist_ok.cast("int").alias("distinct_ok"),
        stop_ok.cast("int").alias("stopword_ok"),
        (words_ok & mlen_ok & dist_ok & stop_ok).cast("int").alias("pass_gopher"),
    )


def gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1 analog):
    word-count bounds, mean-word-length band, distinct-word floor (the
    repetition gate), and a minimum stop-word count (the gibberish gate),
    with the per-rule flags and the conjunction exposed per document.  All
    JVM-side in one narrow projection chain — no shuffle before the
    presentation sort; signals are exact integers (see threshold block)."""
    return ordered(gopher_flags(load(spark, sf, "documents")), "doc_id")


# linear quality-classifier weights (integer; a fastText-style scorer's
# exact-arithmetic analog): rule flags carry most of the mass, the capped
# stop-word count adds a graded fluency term
QUAL_W_WORDS = 3
QUAL_W_MLEN = 2
QUAL_W_DISTINCT = 2
QUAL_W_STOPFLAG = 1
QUAL_STOP_CAP = 5  # graded term: min(n_stop, cap)
QUAL_ACCEPT = 7  # accept ⇔ score >= this


def _quality_score():
    """The graded integer quality score over ``gopher_flags`` signal columns
    (shared by ``quality_classifier`` and ``quality_weighted_sample``)."""
    return (
        F.col("words_ok") * QUAL_W_WORDS
        + F.col("mean_len_ok") * QUAL_W_MLEN
        + F.col("distinct_ok") * QUAL_W_DISTINCT
        + F.col("stopword_ok") * QUAL_W_STOPFLAG
        + F.least(F.col("n_stop"), F.lit(QUAL_STOP_CAP))
    ).cast("long")


def quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Graded quality score (the exact-integer analog of a fastText-style
    linear quality classifier, CCNet/Gopher lineage): a fixed-weight dot
    product over the rule-gate signals plus a capped stop-word fluency
    term, thresholded into an accept flag.  Unlike the hard `gopher_rules`
    conjunction, the score RANKS documents — the bucket-by-quality signal
    a curation run uses to trade corpus size against quality.

    Scale shape: rides the same one-scan narrow projection chain as
    `gopher_flags` — no shuffle before the presentation sort; all signals
    and the score are exact integers."""
    flags = gopher_flags(load(spark, sf, "documents"))
    score = _quality_score()
    out = flags.select(
        "doc_id",
        score.alias("quality_score"),
        (score >= QUAL_ACCEPT).cast("int").alias("accept"),
    )
    return ordered(out, "doc_id")


QUAL_MIN_WORDS = DECON_N  # quality gate: enough words to carry one decon gram


def curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """The full training-data curation pipeline as ONE declarative DAG,
    audited as a funnel: raw → quality gate (≥QUAL_MIN_WORDS words) → exact
    dedup (canonical = min doc_id per content hash, the `dedup_exact` rule)
    → train split (`sample_split` rule) → benchmark decontamination
    (`decontaminate` rule) → source mixture (`source_mixture` rule), with
    surviving-doc counts per stage.

    Composition shape: every flag is computed in a single pass over the
    corpus — one broadcast LeftSemi against the fixed-size benchmark gram
    set (decontamination), then ONE aggregation on the content-hash key
    that IS the dedup (the ``line_dedup`` keeper principle: a content key
    duplicated 10^6 times collapses in the map-side partial aggregate,
    where the window keeper this replaces would sort the whole hot key in
    one task — VERDICT r3 item 3).  Text-determined flags (quality,
    contamination) are group constants; doc-determined flags (split,
    mixture) ride along on ``min(struct(doc_id, …))`` so the canonical
    member's values — the only ones the post-dedup stages can see — survive
    the group.  Finally one global aggregation of the six cumulative
    conjunctions unpivoted by ``stack``.  No stage re-scans the corpus; the
    funnel costs the same as its most expensive member."""
    docs = load(spark, sf, "documents")
    flags = docs.select(
        "doc_id",
        F.md5("text").alias("ck"),
        (F.size(_words()) >= QUAL_MIN_WORDS).alias("q"),
        (_split_expr() == "train").alias("is_train"),
    )
    # contamination flag for train docs (same grams + broadcast semi-join as decontaminate)
    bench_grams = (
        _doc_grams(
            docs.withColumn("split", _split_expr()).filter(F.col("split") == "test")
        ).select("gram").distinct()
    )
    dirty = (
        _doc_grams(docs)
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("dirty", F.lit(True))
    )
    mix = _mixture(docs).select("doc_id", "kept")
    staged = (
        flags.join(dirty, "doc_id", "left")
        .join(mix, "doc_id")
        .select(
            "doc_id",
            "ck",
            "q",
            "is_train",
            (~F.coalesce("dirty", F.lit(False))).alias("clean"),
            (F.col("kept") == 1).alias("mixed"),
        )
    )
    # the dedup aggregation: group size, the text-determined flags (any
    # member's value — they are group constants), and the canonical
    # (min-doc_id) member's doc-determined flags
    grouped = staged.groupBy("ck").agg(
        F.count("*").alias("n"),
        F.max(F.col("q").cast("long")).alias("q"),
        F.max(F.col("clean").cast("long")).alias("clean"),
        F.min(F.struct("doc_id", "is_train", "mixed")).alias("k"),
    )
    agg = grouped.agg(
        F.sum("n").alias("s0"),
        F.sum(F.col("n") * F.col("q")).alias("s1"),
        F.sum("q").alias("s2"),
        F.sum(F.col("q") * F.col("k.is_train").cast("long")).alias("s3"),
        F.sum(
            F.col("q") * F.col("k.is_train").cast("long") * F.col("clean")
        ).alias("s4"),
        F.sum(
            F.col("q")
            * F.col("k.is_train").cast("long")
            * F.col("clean")
            * F.col("k.mixed").cast("long")
        ).alias("s5"),
    )
    out = agg.select(
        F.expr(
            "stack(6, 0, 'raw', s0, 1, 'quality', s1, 2, 'dedup', s2,"
            " 3, 'train', s3, 4, 'decontaminated', s4, 5, 'mixture', s5)"
        ).alias("stage_idx", "stage", "n_docs")
    )
    return ordered(out, "stage_idx")


IDX_N = 3  # phrase-term width; single tokens are a 31-word closed set here
IDX_DF_MAX = 256  # stop-term cutoff: terms in more docs carry no signal
IDX_TOPK = 8  # postings kept per term


def inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed inverted-index build (the retrieval-side primitive of a
    RAG / search corpus): phrase term (IDX_N-word shingle) -> top-K posting
    list ranked by term frequency.  Terms whose document frequency exceeds
    IDX_DF_MAX are dropped as stop terms (the same bounded-hot-key pattern
    as the dedup DF_MAX cutoff) — which also BOUNDS the ranking window:
    after the cutoff no term has more than IDX_DF_MAX postings, so the
    per-term row_number sort is capped at IDX_DF_MAX rows per key at any
    corpus scale.

    Scale shape: one (doc, term)-keyed count with map-side combine, a
    term-keyed DF count over those collapsed rows, a term-keyed join, a
    bounded window — every shuffle on a natural key, index size bounded by
    vocabulary x IDX_TOPK, never corpus size."""
    docs = (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    wdocs = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("w")
    )
    grams = wdocs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("w") >= IDX_N,
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - (IDX_N - 1)),
                    lambda i: F.array_join(F.slice("w", i, IDX_N), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("term"),
    )
    tf = grams.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count("*").alias("df"))
    kept = tf.join(df_counts.filter(F.col("df") <= IDX_DF_MAX), "term")
    ranked = kept.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
        ),
    ).filter(F.col("rank") <= IDX_TOPK)
    out = ranked.select(
        "term", F.col("rank").cast("long").alias("rank"), "doc_id", "tf", "df"
    )
    return ordered(out, "term", "rank")


def token_rarity(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style rarity signal (Wenzek et al. 2020 use an LM perplexity;
    this is the integer-exact corpus-statistics analog): for each document,
    the mean corpus document-frequency of its DISTINCT lowercased tokens.
    A low mean-DF document is built from rare vocabulary (specialist or
    noise); a high one from boilerplate vocabulary — the standard
    bucket-by-rarity curation signal.

    Scale shape: one explode of per-doc distinct tokens, a token-keyed
    count (map-side partial combine collapses hot tokens), a token-keyed
    join back, and a doc-keyed sum — every shuffle is on a natural key and
    the token DF table is the only corpus-wide state (vocabulary-sized,
    NOT corpus-sized).  Signals are exact integers (×100 via ``div``) so
    the oracle comparison has no float surface."""
    docs = (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))).alias("tok"),
    ).filter(F.col("tok") != "")
    df_counts = toks.groupBy("tok").agg(F.count("*").alias("df"))
    per_doc = toks.join(df_counts, "tok").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_distinct_tokens"),
        F.sum("df").cast("long").alias("sum_df"),
    )
    out = per_doc.select(
        "doc_id",
        "n_distinct_tokens",
        "sum_df",
        F.expr("(sum_df * 100) div n_distinct_tokens").alias("mean_df_x100"),
    )
    return ordered(out, "doc_id")


def token_surprisal(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR-style importance signal (Xie et al. 2023 weight documents by
    n-gram likelihood ratios; the integer-exact single-corpus analog): the
    mean per-token surprisal of a document's DISTINCT lowercased tokens,
    in whole bits — ``floor(log2(n_docs / df))``, computed exactly as
    ``length(bin(n_docs div df)) - 1`` so there is no libm/float surface
    for the oracle to diverge on.  A token seen in every document carries
    0 bits; one seen in a single document out of 2^k carries k bits.
    Where ``token_rarity`` averages raw document frequencies (dominated by
    the corpus's most common tokens), this is the log-scale version that
    actually ranks by information content — the standard
    importance-sampling / perplexity-bucket curation signal.

    Scale shape: identical to ``token_rarity`` — one explode of per-doc
    distinct tokens, a token-keyed DF count (map-side combine collapses
    hot tokens), the corpus size joined in as a broadcast 1-row frame (no
    driver collect), a token-keyed join back, and a doc-keyed sum.  The
    only corpus-wide state is the vocabulary-sized DF table."""
    docs = (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))).alias("tok"),
    ).filter(F.col("tok") != "")
    total = docs.agg(F.count("*").alias("n_docs"))
    df_counts = toks.groupBy("tok").agg(F.count("*").alias("df"))
    bits = df_counts.crossJoin(F.broadcast(total)).select(
        "tok",
        (F.length(F.bin(F.expr("n_docs div df"))) - 1).cast("long").alias("bits"),
    )
    per_doc = toks.join(bits, "tok").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_distinct_tokens"),
        F.sum("bits").cast("long").alias("sum_bits"),
    )
    out = per_doc.select(
        "doc_id",
        "n_distinct_tokens",
        "sum_bits",
        F.expr("(sum_bits * 100) div n_distinct_tokens").alias("mean_bits_x100"),
    )
    return ordered(out, "doc_id")


# Bloom decontamination sizing: BLOOM_M bit positions (the broadcast is a
# dense boolean array of exactly BLOOM_M entries — FIXED by config no
# matter how large the corpus or the benchmark grows), BLOOM_K seeded
# xxhash64 probe functions.  Spark's own bloom_filter_agg/might_contain
# pair is not in the public function registry (runtime-filter internal),
# so the filter is built from the same primitives relationally —
# semantically the textbook Bloom filter, including its no-false-negative
# guarantee.
BLOOM_M = 1 << 16
BLOOM_K = 4
_BLOOM_WORD_BITS = 32  # 32-bit packing keeps every mask a positive long
_BLOOM_WORDS = BLOOM_M // _BLOOM_WORD_BITS
_BLOOM_MASKS = [1 << i for i in range(_BLOOM_WORD_BITS)]


def _bloom_positions(gram_col):
    """The BLOOM_K probe positions of one gram: independent hash functions
    via seeded xxhash64 (seed as a leading hashed column), folded onto the
    bit space with pmod (xxhash64 is signed)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), gram_col), F.lit(BLOOM_M))
            for i in range(BLOOM_K)
        ]
    )


def _bloom_build(grams: DataFrame) -> list[int]:
    """Fold a gram set into a dense BLOOM_M-bit bitmap as _BLOOM_WORDS
    32-bit words: explode the K positions, OR them into words with one
    word-keyed distributed aggregate (map-side combine collapses hot
    positions; at most _BLOOM_WORDS rows survive regardless of input
    size), then collect that CONFIG-BOUNDED result and densify on the
    driver.  The collect is the scalar-subquery materialization Spark's
    own runtime bloom filters perform — the filter value must reach the
    probe EXPRESSION as a constant; it is never corpus-sized."""
    word = F.expr(f"CAST(pos div {_BLOOM_WORD_BITS} AS INT)")
    bit = F.pmod(F.col("pos"), F.lit(_BLOOM_WORD_BITS)).cast("int")
    mask = F.element_at(
        F.array(*[F.lit(m).cast("long") for m in _BLOOM_MASKS]), bit + 1
    )
    rows = (
        grams.select(F.explode(_bloom_positions(F.col("gram"))).alias("pos"))
        .select(word.alias("widx"), mask.alias("mask"))
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    dense = [0] * _BLOOM_WORDS
    for r in rows:
        dense[r["widx"]] = r["word"]
    return dense


def _bloom_might_contain(bits: list[int], gram_col):
    """Map-side membership probe: all BLOOM_K positions set.  The bitmap
    enters the expression as a LITERAL array (constant-folded once per
    plan, shared across rows — the same inlining Spark's runtime bloom
    filters use), so each probe is an O(1) ``F.get`` word load plus a mask
    AND: no join, no per-row copy of the filter, no data-sized state."""
    lit_words = F.array(*[F.lit(int(w)).cast("long") for w in bits])
    lit_masks = F.array(*[F.lit(m).cast("long") for m in _BLOOM_MASKS])
    return F.forall(
        _bloom_positions(gram_col),
        lambda p: (
            F.get(lit_words, (p / F.lit(_BLOOM_WORD_BITS)).cast("int"))
            .bitwiseAND(
                F.element_at(
                    lit_masks, F.pmod(p, F.lit(_BLOOM_WORD_BITS)).cast("int") + 1
                )
            )
            != 0
        ),
    )


def _bloom_flags(spark: SparkSession, sf: str) -> DataFrame:
    """Unordered per-train-doc bloom verdicts (the shared core of
    ``bloom_decontaminate`` and ``bloom_decon_audit`` — composition happens
    HERE, above the presentation-only ``ordered()`` funnel)."""
    docs = load(spark, sf, "documents").withColumn("split", _split_expr())
    train = docs.filter(F.col("split") == "train")
    bench_grams = (
        _doc_grams(docs.filter(F.col("split") == "test")).select("gram").distinct()
    )
    bits = _bloom_build(bench_grams)
    tg = _doc_grams(train)
    flagged = tg.select(
        "doc_id",
        _bloom_might_contain(bits, F.col("gram")).alias("hit"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum(F.col("hit").cast("long")).alias("n_bloom_hits"),
    ).select(
        "doc_id",
        "n_grams",
        "n_bloom_hits",
        (F.col("n_bloom_hits") > 0).cast("int").alias("bloom_contaminated"),
    )


def bloom_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter benchmark decontamination — the shape production
    pipelines actually run at 100 TB: the held-out gram set is folded into
    a fixed BLOOM_M-bit Bloom filter (``_bloom_build``), inlined into the
    probe expression as a constant-folded literal, and every training gram
    is tested MAP-SIDE by K O(1) bit probes (``_bloom_might_contain``) —
    the membership test never shuffles the corpus at all (contrast
    ``decontaminate``, whose broadcast LeftSemi still hashes the full gram
    set, which GROWS with the benchmark; the bloom stays BLOOM_M bits
    forever).  Blooms have no false
    negatives, so a 'hit' set strictly contains the exact overlap; the
    per-doc output makes the false-positive overhead observable and
    ``bloom_decon_audit`` pins the containment as a driver-checked
    constant.

    Per-train-doc output: n_grams, n_bloom_hits (grams the filter flags),
    bloom_contaminated.  The bloom hit VALUES are hash-family-specific
    (seeded xxhash64 positions), so this query is pytest- and
    audit-checked rather than value-oracled."""
    return ordered(_bloom_flags(spark, sf), "doc_id")


def bloom_decon_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-visible correctness row for the Bloom decontamination path:
    one row of corpus-level counts where the load-bearing column —
    ``n_missed_by_bloom`` — is the number of exactly-contaminated training
    documents the Bloom filter FAILED to flag.  Blooms structurally cannot
    produce false negatives, so the oracle pins it as the constant 0 (next
    to two genuinely data-derived counts the SQL recomputes independently);
    any defect in the gram derivation, hash feeding, sizing arithmetic, or
    ``might_contain`` plumbing that loses a true positive mismatches the
    hash.  (False positives are legitimate and implementation-specific —
    pinned by pytest instead, not by this oracle.)"""
    docs = load(spark, sf, "documents").withColumn("split", _split_expr())
    train = docs.filter(F.col("split") == "train")
    bench_grams = (
        _doc_grams(docs.filter(F.col("split") == "test")).select("gram").distinct()
    )
    bits = _bloom_build(bench_grams)
    # ONE pass over the training grams carrying BOTH verdicts (the exact
    # mark via the broadcast join, the bloom mark via the literal probe) —
    # Spark does not share subtrees, so separate exact/bloom/missed count
    # branches would re-derive the corpus-sized gram frame once each
    marked = (
        _doc_grams(train)
        .join(
            F.broadcast(bench_grams.withColumn("ex", F.lit(1))), "gram", "left"
        )
        .select(
            "doc_id",
            F.coalesce("ex", F.lit(0)).alias("ex"),
            _bloom_might_contain(bits, F.col("gram")).cast("int").alias("bl"),
        )
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.max("ex").alias("exact_hit"), F.max("bl").alias("bloom_hit")
    )
    # gramless train docs (shorter than DECON_N words) can hit neither
    # verdict but still count toward n_train
    base = train.select("doc_id").join(per_doc, "doc_id", "left")
    return base.agg(
        F.count("*").cast("long").alias("n_train"),
        F.sum(F.coalesce("exact_hit", F.lit(0)))
        .cast("long")
        .alias("n_exact_contaminated"),
        F.sum(
            (
                (F.coalesce("exact_hit", F.lit(0)) == 1)
                & (F.coalesce("bloom_hit", F.lit(0)) == 0)
            ).cast("long")
        )
        .cast("long")
        .alias("n_missed_by_bloom"),
    )


def _norm_expr(col: str = "text"):
    """Canonical text normalization shared by ``text_normalize`` and
    ``normalized_dedup`` (the C4/CCNet-style pre-dedup canonicalization:
    case-fold, strip everything outside [a-z0-9 ] to spaces, collapse
    whitespace runs, trim).  Kept to constructs with identical semantics
    in Java regex and DuckDB RE2 — Spark's regexp_replace replaces all
    occurrences by default, DuckDB needs the explicit 'g' flag in the
    oracle."""
    lowered = F.lower(F.col(col))
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(stripped, " +", " "))


def text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Text canonicalization as a first-class operator: per document, the
    normalized text plus raw/normalized lengths (the shrinkage is itself a
    quality signal — a doc that loses most of its characters to
    normalization was markup or punctuation soup).

    Scale shape: one narrow projection, zero shuffles, whole-stage
    codegen end to end."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    out = docs.select(
        "doc_id",
        _norm_expr().alias("norm_text"),
        F.length("text").cast("long").alias("n_chars_raw"),
        F.length(_norm_expr()).cast("long").alias("n_chars_norm"),
    )
    return ordered(out, "doc_id")


def _docs_with_reformatted(spark: SparkSession, sf: str) -> DataFrame:
    """documents + a deterministic 'reformatted republication' overlay
    (doc_id+2000000 for every doc_id % 3 == 2): upper-cased with trailing
    punctuation and doubled spacing — byte-different, normalization-equal.
    The overlay is what makes ``normalized_dedup`` a real test: exact
    dedup CANNOT merge these pairs, normalized dedup MUST."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    variants = docs.filter(F.col("doc_id") % 3 == 2).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  !!")).alias("text"),
    )
    return docs.unionByName(variants)


def normalized_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup AFTER normalization — the standard first rung of a web
    dedup ladder (byte-identical dedup misses trivially reformatted
    republications; MinHash is overkill for them).  Every reformatted
    overlay doc must land in its base doc's group.

    Scale shape: the ``line_dedup`` keeper principle — group size and the
    canonical (min doc_id) member come from ONE aggregation on the
    normalized-content key (map-side partial agg collapses a
    mass-republished page before the shuffle; never a window over the hot
    content key), then an equi-join marks members back."""
    n = _docs_with_reformatted(spark, sf).select(
        "doc_id", F.md5(_norm_expr()).alias("nk")
    )
    groups = n.groupBy("nk").agg(
        F.min("doc_id").alias("keeper"),
        F.count("*").cast("long").alias("grp_size"),
    )
    out = n.join(groups, "nk").select(
        "doc_id",
        "grp_size",
        (F.col("doc_id") == F.col("keeper")).cast("int").alias("canonical"),
    )
    return ordered(out, "doc_id")


# tokenizer-training / scheduling constants
CURRICULUM_STAGES = 4  # length-curriculum quartiles


def bpe_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    """One BPE statistics pass (Sennrich et al. 2016 — the inner loop of
    tokenizer training): corpus-weighted adjacent character-pair counts.
    Every pair occurrence inside a word counts once per corpus occurrence
    of that word ("aaa" contributes the pair "aa" twice per occurrence);
    the end-of-word marker is omitted (pairs are intra-word only).

    Scale shape: the corpus collapses to the VOCABULARY first — one
    word-keyed count with map-side combine (the 100-TB corpus becomes a
    vocab-sized frame before any pair is materialized) — then the pair
    explode runs over distinct words only and the final aggregate is keyed
    by the pair (output bounded by alphabet², not corpus size)."""
    docs = (
        load(spark, sf, "documents")
        .select("text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count("*").cast("long").alias("wc"))
    # pairs over DISTINCT words; guard the two-arg sequence (length-1 words
    # would make sequence(1, 0) DESCEND — take the empty branch instead)
    pairs = vocab.select(
        "wc",
        F.explode(
            F.when(
                F.length("word") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
    )
    out = pairs.groupBy("pair").agg(F.sum("wc").cast("long").alias("n_occurrences"))
    return ordered(out, "pair")


def source_leakage_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus sources,
    the number of DISTINCT DECON_N-gram shingles they share, plus the
    containment of the smaller gram set in basis points — the audit a
    curation run reads to find mirror sites / syndicated feeds before
    choosing mixture weights (same family as benchmark decontamination,
    but source-vs-source instead of train-vs-test).

    Scale shape: grams dedup to (source, gram) FIRST (map-side combine on
    the corpus scan), the self-join is keyed on the gram, and the output
    is bounded by S² source pairs.  Per-source gram totals are an S-row
    frame joined back by broadcast.  A gram shared by all S sources emits
    S(S-1)/2 rows — bounded by the (small, config-like) source count, not
    by corpus size, so no hot-key cap is needed on this key."""
    docs = load(spark, sf, "documents").select("source", "text")
    n = DECON_N
    wdocs = docs.select("source", _words().alias("w")).repartition(
        spark.sparkContext.defaultParallelism
    )
    grams = (
        wdocs.select(
            "source",
            F.explode(
                F.when(
                    F.size("w") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size("w") - (n - 1)),
                        lambda i: F.array_join(F.slice("w", i, n), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        .dropDuplicates(["source", "gram"])
    )
    totals = grams.groupBy("source").agg(F.count("*").cast("long").alias("n_grams"))
    a = grams.select(F.col("source").alias("source_a"), "gram")
    b = grams.select(F.col("source").alias("source_b"), "gram")
    shared = (
        a.join(b, "gram")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("shared_grams"))
    )
    out = (
        shared.join(
            F.broadcast(totals.select(F.col("source").alias("source_a"), F.col("n_grams").alias("grams_a"))),
            "source_a",
        )
        .join(
            F.broadcast(totals.select(F.col("source").alias("source_b"), F.col("n_grams").alias("grams_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            "grams_a",
            "grams_b",
            F.expr("(shared_grams * 10000) div least(grams_a, grams_b)").alias("containment_bp"),
        )
    )
    return ordered(out, "source_a", "source_b")


def curriculum_stages(spark: SparkSession, sf: str) -> DataFrame:
    """Length-curriculum assignment by EXACT corpus quantiles: documents
    are ranked by token count and cut into CURRICULUM_STAGES stages
    (shortest first — the standard length-based curriculum / batch
    scheduling split), with the rule that equal lengths are never split
    across stages: a document's stage is decided by how many documents are
    STRICTLY shorter, so the assignment is a pure function of the length
    histogram.

    Scale shape: this is the scale-honest way to rank a 100-TB corpus —
    NO global row_number/ntile over the documents (that is a
    single-partition sort).  The corpus collapses to the length histogram
    (one keyed count, map-side combine, output is distinct-lengths-sized),
    the cumulative rank runs as a window over that TINY frame, and the
    stage boundaries broadcast-join back onto the documents by length."""
    docs = load(spark, sf, "documents").select(
        "doc_id", F.size(_words()).cast("long").alias("n_tokens")
    )
    hist = docs.groupBy("n_tokens").agg(F.count("*").cast("long").alias("n_docs"))
    # cumulative docs strictly below each length; window over the
    # distinct-lengths frame only (bounded by the length domain, not corpus)
    w = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, -1)
    total = hist.agg(F.sum("n_docs").cast("long").alias("n_total"))
    stages = (
        hist.select(
            "n_tokens",
            F.coalesce(F.sum("n_docs").over(w), F.lit(0)).cast("long").alias("docs_below"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "n_tokens",
            F.expr(f"least((docs_below * {CURRICULUM_STAGES}) div n_total, {CURRICULUM_STAGES - 1})")
            .cast("int")
            .alias("stage"),
        )
    )
    out = docs.join(F.broadcast(stages), "n_tokens").select("doc_id", "n_tokens", "stage")
    return ordered(out, "doc_id")


def packed_doc_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Document-boundary spans inside packed training shards: for every
    document the greedy packer placed (``pack_shards``), its token offset
    interval [begin_token, end_token) within its shard — the metadata a
    trainer needs to reset attention masks / position ids at document
    boundaries in packed sequences.

    Scale shape: the packing assignment is reused as-is; the within-shard
    base offset is the MIN(tokens_before) over the (lang, shard) window —
    a window whose partitions are shard-sized (a handful of docs by
    construction of the token budget), never corpus- or key-skew-sized."""
    packed = _packed_frame(spark, sf)
    w = Window.partitionBy("lang", "shard_id")
    out = packed.select(
        "lang",
        "shard_id",
        "doc_id",
        (F.col("tokens_before") - F.min("tokens_before").over(w)).cast("long").alias("begin_token"),
        (F.col("tokens_before") - F.min("tokens_before").over(w) + F.col("n_tokens"))
        .cast("long")
        .alias("end_token"),
    )
    return ordered(out, "lang", "shard_id", "doc_id")


def seqlen_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence-length distribution in power-of-two buckets — the
    histogram a batch scheduler reads to size length-bucketed batches
    (bucket k holds docs with 2^k <= n_tokens < 2^(k+1)).  The bucket
    index is ``floor(log2(n_tokens))`` computed exactly as
    ``length(bin(n_tokens)) - 1`` (the integer log2 pattern shared with
    ``token_surprisal``) so there is no libm/float surface.

    Scale shape: one projection and one keyed aggregate with map-side
    combine; output is bounded by the ~60 possible bucket indices."""
    docs = load(spark, sf, "documents").select(
        F.size(_words()).cast("long").alias("n_tokens")
    )
    out = (
        docs.filter(F.col("n_tokens") > 0)
        .select((F.length(F.bin(F.col("n_tokens"))) - 1).cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(
            "bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), bucket)").alias("min_tokens"),
            F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1").alias("max_tokens"),
            "n_docs",
        )
    )
    return ordered(out, "bucket")


def _incremental_batch(spark: SparkSession, sf: str) -> DataFrame:
    """The synthetic "new crawl batch": reformatted republications of every
    third base document (doc_id+2,000,000 — the ``normalized_dedup``
    overlay, so they collide with the index on the normalized key) plus
    genuinely new documents (doc_id+4,000,000, base text with a fresh
    appended segment — novel under any content key)."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    reposts = docs.filter(F.col("doc_id") % 3 == 2).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  !!")).alias("text"),
    )
    fresh = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" brand new appendix "), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    return reposts.unionByName(fresh)


def curation_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental admission of a new crawl batch against the existing
    curated index — the daily-ingest path of a production pipeline (the
    ``dedup_incremental`` principle applied to curation): each batch
    document gets a quality verdict (Gopher gate), a novelty verdict
    (normalized content key not already in the index), and the admission
    conjunction.  Reformatted republications of indexed pages must be
    rejected as non-novel; genuinely new pages that pass quality are
    admitted.

    Scale shape: the index side collapses to DISTINCT normalized KEYS
    (key-only, one keyed aggregate — never the corpus rows), the novelty
    test is one hash equi-join on the key (batch side is batch-sized),
    and the quality gate is the shared one-scan ``gopher_flags`` chain.
    Nothing is quadratic and nothing collects."""
    base_keys = (
        load(spark, sf, "documents")
        .select(F.md5(_norm_expr()).alias("nk"))
        .distinct()
        .withColumn("_indexed", F.lit(1))
    )
    batch = _incremental_batch(spark, sf)
    flagged = gopher_flags(batch, keep=["text"])
    keyed = flagged.select("doc_id", "pass_gopher", F.md5(_norm_expr()).alias("nk"))
    marked = keyed.join(base_keys, "nk", "left")
    out = marked.select(
        "doc_id",
        "pass_gopher",
        F.col("_indexed").isNull().cast("int").alias("is_novel"),
        ((F.col("pass_gopher") == 1) & F.col("_indexed").isNull())
        .cast("int")
        .alias("admitted"),
    )
    return ordered(out, "doc_id")


def source_token_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source token-distribution drift: the exact total-variation
    distance between each source's unigram distribution and the whole
    corpus's, in basis points — the mixture-monitoring signal a pipeline
    watches to catch a source whose content shifted (spam flood, template
    change) before it pollutes the blend.  TV = ½ Σ|p_s(tok) − p(tok)|;
    the sum over tokens ABSENT from the source is the closed form
    t_s·(T − Σ_present tf_c), so only the source's own tokens are ever
    joined.

    Exactness: all cross-multiplications run in DECIMAL(38,0) (the
    ``event_outliers`` lesson — int64 silently wraps at 100-TB counts
    where DuckDB raises), and the final basis-point value is an integral
    ``div``.

    Scale shape: one token explode, a (source, token)-keyed count with
    map-side combine, a token-keyed join to the (vocabulary-sized) corpus
    counts, S-row side frames by broadcast, and a source-keyed reduce —
    no corpus-wide state beyond the vocabulary."""
    docs = (
        load(spark, sf, "documents")
        .select("source", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    src_tf = toks.groupBy("source", "tok").agg(F.count("*").cast("long").alias("tf_s"))
    corp_tf = src_tf.groupBy("tok").agg(F.sum("tf_s").cast("long").alias("tf_c"))
    totals = src_tf.groupBy("source").agg(F.sum("tf_s").cast("long").alias("t_s"))
    grand = totals.agg(F.sum("t_s").cast("long").alias("t"))
    d = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    joined = (
        src_tf.join(corp_tf, "tok")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(grand))
    )
    present = joined.groupBy("source").agg(
        F.sum(F.abs(d("tf_s") * d("t") - d("tf_c") * d("t_s"))).alias("present_num"),
        F.sum("tf_c").cast("decimal(18,0)").alias("present_tfc"),
    )
    out = (
        present.join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            F.col("t_s").alias("n_tokens"),
            F.expr(
                "CAST((present_num"
                " + CAST(t_s AS DECIMAL(18,0)) * (CAST(t AS DECIMAL(18,0)) - present_tfc))"
                " * 10000 AS DECIMAL(38,0))"
                " div (2 * CAST(t AS DECIMAL(18,0)) * CAST(t_s AS DECIMAL(18,0)))"
            ).alias("tv_drift_bp"),
        )
    )
    return ordered(out, "source")


# quality-weighted (soft) sampling: keep probability per quality tier over the
# 256 md5 buckets — accept-tier docs all survive, mid-tier ~1/2, low ~1/10
QWS_MID_SCORE = 4  # mid tier: score in [QWS_MID_SCORE, QUAL_ACCEPT)
QWS_KEEP_HI = 256
QWS_KEEP_MID = 128
QWS_KEEP_LO = 26


def quality_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Soft quality filtering (the FineWeb/DCLM-style alternative to a hard
    gate): instead of dropping everything below the accept threshold, each
    quality TIER keeps a configured fraction of its documents, decided by
    deterministic content hash — low-quality text still contributes signal
    at a discounted rate, and the decision is reproducible across runs and
    engines (no RNG state, same discipline as ``source_mixture``).

    Scale shape: one scan through the ``gopher_flags`` projection chain,
    no shuffle before the presentation sort; tier, threshold, bucket, and
    verdict are all exact integers."""
    flags = gopher_flags(load(spark, sf, "documents"), keep=["text"])
    score = _quality_score()
    thr = (
        F.when(score >= QUAL_ACCEPT, QWS_KEEP_HI)
        .when(score >= QWS_MID_SCORE, QWS_KEEP_MID)
        .otherwise(QWS_KEEP_LO)
        .cast("int")
    )
    bucket = _md5_bucket(
        F.concat_ws(":", F.col("doc_id"), F.col("text"), F.lit("qws"))
    )
    out = flags.select(
        "doc_id",
        score.alias("quality_score"),
        thr.alias("keep_threshold"),
        bucket.alias("bucket"),
        (bucket < thr).cast("int").alias("kept"),
    )
    return ordered(out, "doc_id")


# mixture-rebalance target weights: 1..REBAL_W_MOD by source index (a stand-in
# for the per-domain weights a DoReMi-style optimizer or a curation spec emits)
REBAL_W_MOD = 4


def mixture_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    """Feasible mixture solve: given per-source target WEIGHTS and the
    observed per-source token supply, compute the largest sampling-without-
    replacement plan that honors the target proportions — the global scale
    k = min_s(tokens_s · 10⁴ div w_s), per-source accepted tokens
    (k · w_s) div 10⁴, and the resulting acceptance rate in basis points.
    This is the SOLVER step upstream of ``source_mixture`` (which applies
    per-source rates): the binding source runs at 100% acceptance and every
    other source downsamples to match its weight.  All arithmetic is
    integer ``div`` — exact in both engines.

    Scale shape: one source-keyed token aggregate (map-side combine), the
    global min folds the S-row frame to one row that broadcasts back — no
    window, nothing corpus-sized past the first aggregate."""
    docs = (
        load(spark, sf, "documents")
        .select("source", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    per = docs.select(
        "source", F.size(_words()).cast("long").alias("n_toks")
    ).groupBy("source").agg(F.sum("n_toks").cast("long").alias("n_tokens"))
    idx = F.expr("CAST(substring(source, 4) AS INT)")
    w = per.withColumn(
        "target_w", (F.lit(1) + idx % REBAL_W_MOD).cast("long")
    )
    k = w.agg(F.min(F.expr("n_tokens * 10000 div target_w")).alias("k"))
    out = w.crossJoin(F.broadcast(k)).select(
        "source",
        "target_w",
        "n_tokens",
        F.expr("(k * target_w) div 10000").alias("n_accept_tokens"),
        F.expr("((k * target_w) div 10000) * 10000 div n_tokens").alias(
            "accept_bp"
        ),
    )
    return ordered(out, "source")


def _bigrams(wc) -> "F.Column":
    """Adjacent-bigram structs from a words-array column.  Guarded: two-arg
    ``sequence(1, stop)`` DESCENDS for stop < 1, so 0/1-word docs must take
    the empty branch, never ``sequence(1, 0)``."""
    return F.when(
        F.size(wc) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(wc) - 1),
            lambda i: F.struct(
                F.element_at(wc, i).alias("w1"),
                F.element_at(wc, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<w1:string,w2:string>>)"))


# CCNet buckets (Wenzek et al. 2020 split a crawl corpus into three equal
# perplexity tiers under a KenLM reference model; this is the integer-exact
# single-corpus analog, the reference LM being the corpus's own bigram table)
PPL_STAGES = ("head", "middle", "tail")


def perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered presentation wrapper over ``_ppl_buckets`` (semantics and
    scale notes there)."""
    return ordered(_ppl_buckets(spark, sf), "doc_id")


def _ppl_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style perplexity tiers: every document's mean per-bigram
    surprisal under the corpus bigram LM — ``floor(log2(n(w1) / n(w1,w2)))``
    bits per bigram position, computed exactly as
    ``length(bin(n1 div n12)) - 1`` (for a >= b, ``floor(log2(a div b)) ==
    floor(log2(a/b))``, so the integer form is the true value, not an
    approximation) — then cut into equal head/middle/tail thirds by EXACT
    corpus quantiles of the score.  Head = most LM-predictable, the tier
    CCNet keeps.  Documents with fewer than two words have no bigram events
    and are not scored (same event space as ``ngram_lm_counts``).

    Scale shape: one explode into bigram occurrences, a bigram-keyed count
    (map-side combine collapses hot pairs), context totals derived from the
    VOCAB-sized pair table (not a second corpus-wide shuffle), a keyed join
    back, a doc-keyed sum — and the tercile cut is the histogram trick from
    ``curriculum_stages``: the only Window runs over the distinct-score
    frame (bounded by the score domain), never over the corpus."""
    docs = (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    wdocs = docs.select("doc_id", _words().alias("w"))
    occ = wdocs.select("doc_id", F.explode(_bigrams(F.col("w"))).alias("b")).select(
        "doc_id", "b.w1", "b.w2"
    )
    n12 = occ.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    n1 = n12.groupBy("w1").agg(F.sum("n12").cast("long").alias("n1"))
    bits_tbl = n12.join(n1, "w1").select(
        "w1",
        "w2",
        (F.length(F.bin(F.expr("n1 div n12"))) - 1).cast("long").alias("bits"),
    )
    per_doc = (
        occ.join(bits_tbl, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("bits").cast("long").alias("sum_bits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("(sum_bits * 100) div n_bigrams").cast("long").alias("ppl_c"),
        )
    )
    hist = per_doc.groupBy("ppl_c").agg(F.count("*").cast("long").alias("n_docs"))
    wnd = Window.orderBy("ppl_c").rowsBetween(Window.unboundedPreceding, -1)
    total = hist.agg(F.sum("n_docs").cast("long").alias("n_total"))
    cuts = (
        hist.select(
            "ppl_c",
            F.coalesce(F.sum("n_docs").over(wnd), F.lit(0)).cast("long").alias("below"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "ppl_c",
            F.expr("least((below * 3) div n_total, 2)").cast("int").alias("stage"),
        )
    )
    out = per_doc.join(F.broadcast(cuts), "ppl_c").select(
        "doc_id",
        "n_bigrams",
        "ppl_c",
        F.element_at(
            F.array(*[F.lit(s) for s in PPL_STAGES]), F.col("stage") + 1
        ).alias("bucket"),
    )
    return out


def quality_rung_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-rung quality-gate agreement — the Venn decomposition of the
    three quality verdicts (the hard Gopher rule conjunction, the graded
    linear classifier at QUAL_ACCEPT, and CCNet head-tier membership), one
    row per non-empty membership region.  The quality analog of
    ``dedup_family_agreement``: before trusting ONE gate at 100 TB, a
    pipeline owner reads how often the cheap rules and the ranked scores
    disagree (docs the rules kill but the LM ranks predictable are the
    false-kill budget; classifier-only keeps measure the graded term's
    reach).  Documents too short to carry a bigram event are not in the
    head tier by definition.

    Scale shape: the rule and classifier verdicts ride ONE narrow
    projection chain (both derive from the same ``gopher_flags`` frame —
    no second scan, no self-join); the perplexity verdict is the audited
    ``_ppl_buckets`` pipeline; the merge is one doc-keyed left join plus a
    groupBy over the 3-bit region key with map-side combine."""
    flags = gopher_flags(load(spark, sf, "documents"))
    per = flags.select(
        "doc_id",
        F.col("pass_gopher").alias("in_gopher"),
        (_quality_score() >= QUAL_ACCEPT).cast("int").alias("in_classifier"),
    )
    ppl = _ppl_buckets(spark, sf).select(
        "doc_id", (F.col("bucket") == "head").cast("int").alias("in_ppl_head")
    )
    joined = per.join(ppl, "doc_id", "left").select(
        "in_gopher",
        "in_classifier",
        F.coalesce("in_ppl_head", F.lit(0)).alias("in_ppl_head"),
    )
    venn = joined.groupBy("in_gopher", "in_classifier", "in_ppl_head").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    return ordered(venn, "in_gopher", "in_classifier", "in_ppl_head")


# per-key document cap (the Common Crawl domain-cap shape, keyed on source):
# keep the CAP_K hash-smallest docs per key, exactly
CAP_K = 4
CAP_OVER = 4  # prefilter overshoot factor
CAP_PRIO_SPACE = 1 << 32  # priority hash domain (first 8 md5 hex digits)


def _cap_tagged(spark: SparkSession, sf: str) -> DataFrame:
    docs = (
        load(spark, sf, "documents")
        .select("doc_id", "source")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    from .sketches import _hex_int

    prio = _hex_int(F.md5(F.concat_ws(":", "doc_id", F.lit("cap"))), 1, 8)
    return docs.withColumn("prio", prio)


def _cap_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """The bounded candidate set for ``source_cap``: per-key hash-threshold
    prefilter expecting ~CAP_K*CAP_OVER survivors per key, plus an exactness
    fallback (whole key re-admitted) for any key where the prefilter
    undershot min(CAP_K, n) — Chernoff-unlikely, but it makes the two-phase
    selection EXACTLY the K hash-smallest rows, not approximately.

    The checkpoint pins the prefilter output (key-count-bounded, tiny) so
    the survivor audit and the final window don't re-scan the corpus; the
    uniform-hash threshold is computed in the division form
    ``prio < (2^32 * lim) div n`` so nothing overflows at any corpus size."""
    tagged = _cap_tagged(spark, sf)
    counts = tagged.groupBy("source").agg(F.count("*").cast("long").alias("n_key"))
    lim = CAP_K * CAP_OVER
    pre = (
        tagged.join(F.broadcast(counts), "source")
        .filter(
            (F.col("n_key") <= lim)
            | (F.col("prio") < F.expr(f"({CAP_PRIO_SPACE} * {lim}) div n_key"))
        )
        .select("source", "doc_id", "prio")
        .localCheckpoint()
    )
    srv = pre.groupBy("source").agg(F.count("*").alias("n_srv"))
    # key-count-sized (expected EMPTY); checkpointed because it feeds BOTH
    # union branches below — uncheckpointed, each branch clones the subtree
    # and re-scans the corpus for the key counts
    bad = (
        srv.join(counts, "source")
        .filter(F.col("n_srv") < F.least(F.lit(CAP_K), F.col("n_key")))
        .select("source")
        .localCheckpoint()
    )
    fallback = tagged.join(F.broadcast(bad), "source", "leftsemi").select(
        "source", "doc_id", "prio"
    )
    good = pre.join(F.broadcast(bad), "source", "leftanti")
    return good.unionByName(fallback)


def source_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-key document cap by deterministic hash priority: at most
    CAP_K docs survive per source, the K smallest md5 priorities (ties to
    the smaller doc_id) — the per-domain cap every crawl-curation pipeline
    applies to stop mega-domains from dominating the mixture.

    Scale shape: the naive version is ``row_number() OVER (PARTITION BY
    key)`` on the corpus — a hot key lands in ONE task (the anti-pattern
    ``line_dedup`` engineered out).  Here the window runs only over the
    ``_cap_candidates`` prefilter output, whose per-key size concentrates
    around CAP_K*CAP_OVER regardless of key skew; the fallback branch keeps
    the selection exact even when the concentration bound misses."""
    cand = _cap_candidates(spark, sf)
    w = Window.partitionBy("source").orderBy("prio", "doc_id")
    out = (
        cand.withColumn("cap_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("cap_rank") <= CAP_K)
        .select("source", "doc_id", "cap_rank")
    )
    return ordered(out, "source", "cap_rank")


# ---------------------------------------------------------------------------
# DSIR importance weights + tokenizer fertility (round-4 session 7)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256   # hashed-feature dimensionality (Xie et al. 2023 use 10^4)
DSIR_TARGET_MOD = 7  # docs with doc_id % 7 == 0 proxy the target domain


def dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR-style data selection with importance resampling (Xie et al.
    2023, arXiv:2302.03169): documents are scored by how much more likely
    their hashed-bigram features are under a TARGET domain's distribution
    than under the raw corpus's.  Features: word bigrams -> the portable
    rolling hash (dedup's ``_hash_one`` fold) -> DSIR_BUCKETS buckets.  The
    log-ratio is kept in EXACT integer arithmetic with NO products (so
    nothing can overflow BIGINT however large the corpus): with add-1
    smoothed bucket counts t_b (target) / r_b (raw) and totals T / R, the
    per-bucket inverse probabilities q_t = (T+B) div (t_b+1) and
    q_r = (R+B) div (r_b+1) stay <= the totals, and each bigram occurrence
    contributes bitlen(q_r) - bitlen(q_t) ~= log2(p_target/p_raw) (the
    `perplexity_buckets` quotient-bit-length device), so Spark and DuckDB
    agree bit-for-bit at any scale.  keep=1 when the summed weight is
    positive (target-leaning doc).

    Scale shape: bigram stream -> ONE map-side-combined aggregate producing
    BOTH per-bucket counts (target via count_if) -> a DSIR_BUCKETS-row
    weight table broadcast back onto the stream -> per-doc sum.  The
    feature stream is re-evaluated once for scoring rather than
    materialized — a cheap scan+explode beats caching a corpus-size
    intermediate at 100 TB."""
    from .dedup import _hash_one

    docs = load(spark, sf, "documents").select("doc_id", "text")
    ws = F.split(F.trim("text"), r"\s+")
    bigrams = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr("transform(sequence(0, size(ws) - 2),"
                       " i -> concat(ws[i], ' ', ws[i + 1]))")
            ).alias("bg"),
        )
        .select(
            "doc_id",
            F.pmod(_hash_one(F.col("bg")), F.lit(DSIR_BUCKETS)).cast("int").alias("bucket"),
        )
    )
    counts = bigrams.groupBy("bucket").agg(
        F.count("*").cast("long").alias("r_b"),
        F.count_if(F.col("doc_id") % DSIR_TARGET_MOD == 0).cast("long").alias("t_b"),
    )
    totals = counts.agg(
        F.sum("r_b").cast("long").alias("r_tot"),
        F.sum("t_b").cast("long").alias("t_tot"),
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.length(F.bin(F.expr(f"(r_tot + {DSIR_BUCKETS}) div (r_b + 1)")))
            - F.length(F.bin(F.expr(f"(t_tot + {DSIR_BUCKETS}) div (t_b + 1)")))
        ).cast("long").alias("w"),
    )
    per_doc = (
        bigrams.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.sum("w").cast("long").alias("w_sum"),
        )
        .select(
            "doc_id", "n_bigrams", "w_sum",
            (F.col("w_sum") > 0).cast("int").alias("keep"),
        )
    )
    return ordered(per_doc, "doc_id")


def tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer fertility audit per source: subword tokens per word and
    chars per subword token — the pre-training health check that catches a
    tokenizer exploding on a domain (fertility spikes on code/URLs) before
    any GPU time is spent.  Words are the whitespace convention, subwords
    the BPE-ish regex (`text.BPE_ISH`), ratios exact integer basis points.

    Scale shape: one scan, one map-side-combined groupBy(source) — no
    joins, no windows, no Python."""
    from .text import BPE_ISH

    docs = load(spark, sf, "documents")
    per = docs.select(
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_words"),
        F.regexp_count("text", F.lit(BPE_ISH)).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    out = (
        per.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .select(
            "source", "n_docs", "n_words", "n_tokens", "n_chars",
            F.expr("n_tokens * 10000 div n_words").alias("fertility_bp"),
            F.expr("n_chars * 10000 div n_tokens").alias("chars_per_token_bp"),
        )
    )
    return ordered(out, "source")


# --- round-5 additions: span-corruption sampling + dataset-card report ----

CORRUPT_WIN = 20  # token window per span slot (one corrupted span each)
CORRUPT_MIN = 4  # windows shorter than this stay intact
REPORT_REPUB_MOD = 4  # corpus_report re-crawl overlay: every 4th base doc
REPORT_REPUB_OFF = 700_000  # ...republishes verbatim under this id offset


def _with_repub(docs: DataFrame, mod: int = REPORT_REPUB_MOD,
                off: int = REPORT_REPUB_OFF) -> DataFrame:
    """The re-crawl overlay convention in ONE place: every ``mod``-th base
    document re-appears verbatim under ``doc_id + off``, all other columns
    riding through unchanged.  Shared by corpus_report /
    split_leakage_audit (and pdf_extraction_funnel with its own offset,
    whose divisibility invariant is documented there)."""
    repub = docs.filter(F.col("doc_id") % mod == 0).select(
        (F.col("doc_id") + off).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )
    return docs.unionByName(repub)


def span_corruption_masks(spark: SparkSession, sf: str) -> DataFrame:
    """T5-style span-corruption metadata (Raffel et al. 2020: contiguous
    token spans replaced by sentinels, ~15% noise density, mean span 3) in
    a deterministic windowed form: every CORRUPT_WIN-token window of a
    document corrupts ONE span whose start offset and length derive from
    integer hash arithmetic — ``start = (doc_id*31 + j*7) % (m-2)``,
    ``len = 1 + (doc_id + j) % 3`` — so the mask plan is a pure function
    of (doc_id, position) that the trainer, a replay, and the DuckDB
    oracle all re-derive bit-identically (no RNG state to ship).  Windows
    shorter than CORRUPT_MIN stay intact; spans never cross windows, so
    noise density is bounded by construction.  One row per span: the
    sentinel index, token start offset, and length.

    Scale shape: one narrow projection + a JVM-side sequence explode
    (fan-out = n_tokens / CORRUPT_WIN per doc, linear); no shuffle before
    the presentation sort."""
    docs = load(spark, sf, "documents")
    nd = docs.select("doc_id", F.size(_words()).cast("int").alias("n_tokens"))
    wins = nd.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.expr(f"sequence(0, (n_tokens - 1) div {CORRUPT_WIN})")
        ).alias("j"),
    )
    staged = wins.select(
        "doc_id",
        "n_tokens",
        F.col("j").cast("int").alias("span_idx"),
        F.least(
            F.lit(CORRUPT_WIN), F.col("n_tokens") - F.col("j") * CORRUPT_WIN
        ).cast("int").alias("m"),
    ).filter(F.col("m") >= CORRUPT_MIN)
    out = staged.select(
        "doc_id",
        "span_idx",
        "n_tokens",
        (
            F.col("span_idx") * CORRUPT_WIN
            + F.expr("(doc_id * 31 + span_idx * 7) % (m - 2)")
        ).cast("int").alias("tok_start"),
        (F.lit(1) + (F.col("doc_id") + F.col("span_idx")) % 3)
        .cast("int")
        .alias("tok_len"),
    )
    return ordered(out, "doc_id", "span_idx")


def corpus_report(spark: SparkSession, sf: str) -> DataFrame:
    """The dataset card: per-source corpus summary — document and token
    volume, token-length envelope, mean graded quality (exact integer
    x100), exact-duplicate rate in basis points, and language spread —
    the one table an operator reads before choosing mixture weights.  The
    report runs over the crawl batch INCLUDING re-fetches (every
    REPORT_REPUB_MOD-th base doc republished verbatim, the ``url_dedup``
    overlay convention) so the duplicate-rate column has true positives
    to count.

    Scale shape: one scan through the shared ``gopher_flags`` projection
    chain, then ONE source-keyed aggregation; the two distinct counts
    (text fingerprints, languages) ride the same aggregate via Spark's
    expand-based multi-distinct rewrite — map-side partial dedup, never a
    corpus-wide distinct-first shuffle per signal.  Output is
    source-bounded."""
    docs = load(spark, sf, "documents").select("doc_id", "text", "lang", "source")
    flags = gopher_flags(_with_repub(docs), keep=["lang", "source", "text"])
    scored = flags.select(
        "source",
        "lang",
        F.col("n_words").cast("long").alias("n_toks"),
        _quality_score().alias("q"),
        F.md5("text").alias("ck"),
    )
    agg = scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.min("n_toks").alias("min_tokens"),
        F.max("n_toks").alias("max_tokens"),
        F.sum("q").alias("qsum"),
        F.countDistinct("ck").alias("n_distinct_texts"),
        F.countDistinct("lang").alias("n_langs"),
    )
    out = agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "min_tokens",
        "max_tokens",
        F.expr("qsum * 100 div n_docs").alias("mean_quality_x100"),
        F.expr("(n_docs - n_distinct_texts) * 10000 div n_docs").alias("dup_bp"),
        "n_langs",
    )
    return ordered(out, "source")


QUAL_PREMIUM = QUAL_ACCEPT + 3  # length_quality_matrix: top quality tier
NOVELTY_N = 3  # ngram_novelty_curve: vocabulary-growth shingle size


def quality_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Calibration curve of the graded quality score against the hard rule
    gate: per score value, document count, Gopher-pass count, and the pass
    rate in exact basis points — the table that tells an operator where to
    put the acceptance threshold (a well-calibrated score should show pass
    rate rising monotonically with the score).

    Scale shape: one scan through the shared ``gopher_flags`` projection,
    one keyed aggregate on the score — output bounded by the score range
    (0..13), never corpus-sized."""
    flags = gopher_flags(load(spark, sf, "documents"))
    scored = flags.select(
        _quality_score().alias("score"),
        F.col("pass_gopher").cast("long").alias("p"),
    )
    out = (
        scored.groupBy("score")
        .agg(F.count("*").alias("n_docs"), F.sum("p").alias("n_pass"))
        .select(
            "score",
            "n_docs",
            "n_pass",
            F.expr("n_pass * 10000 div n_docs").alias("pass_bp"),
        )
    )
    return ordered(out, "score")


def length_quality_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """The batch scheduler's 2-D planning table: document counts and token
    mass per (power-of-two length bucket x quality tier) cell — how much
    premium/accept/reject material exists at each sequence length, read
    when choosing length-bucketed batch shapes and per-tier sampling
    rates.  Length bucket = exact integer log2 (the ``seqlen_buckets``
    bit-length idiom); tiers cut the graded score at QUAL_ACCEPT and
    QUAL_PREMIUM.

    Scale shape: one projection + one keyed aggregate with map-side
    combine; output bounded by buckets x 3 tiers."""
    flags = gopher_flags(load(spark, sf, "documents"))
    staged = flags.filter(F.col("n_words") > 0).select(
        (F.length(F.bin(F.col("n_words"))) - 1).cast("int").alias("len_bucket"),
        _quality_score().alias("score"),
        F.col("n_words").cast("long").alias("n_toks"),
    )
    tier = (
        F.when(F.col("score") < QUAL_ACCEPT, "reject")
        .when(F.col("score") < QUAL_PREMIUM, "accept")
        .otherwise("premium")
    )
    out = (
        staged.select("len_bucket", tier.alias("tier"), "n_toks")
        .groupBy("len_bucket", "tier")
        .agg(F.count("*").alias("n_docs"), F.sum("n_toks").alias("n_tokens"))
    )
    return ordered(out, "len_bucket", "tier")


def split_leakage_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Train/val/test split-leakage audit: the ``sample_split`` assignment
    hashes (doc_id, text), so a re-crawled copy of a training document can
    land in the test split carrying every one of its DECON_N-grams — the
    exact leak benchmark decontamination exists to catch, here measured
    INSIDE the corpus' own splits.  Over the corpus plus the re-crawl
    overlay (``corpus_report`` convention, guaranteeing cross-split
    copies): distinct shared grams per split pair, and the count of test
    documents contaminated by the train split.

    Scale shape: per-gram split presence is ONE gram-keyed aggregate with
    map-side combine (three max flags — never a COUNT DISTINCT per pair);
    the contaminated-doc count is one gram-keyed semi join plus a distinct
    on the (small) leaked-doc set.  Output is 4 audit rows."""
    base = _with_repub(load(spark, sf, "documents").select("doc_id", "text"))
    # the EXACT sample_split assignment, via the shared helper so the audit
    # can never drift from the split it audits
    lab = base.select(
        "doc_id",
        _split_expr().alias("split"),
        _words().alias("w"),
    )
    grams = lab.select(
        "doc_id", "split", F.explode(_gram_array(F.col("w"), DECON_N)).alias("gram")
    )
    pres = grams.groupBy("gram").agg(
        F.max((F.col("split") == "train").cast("long")).alias("tr"),
        F.max((F.col("split") == "val").cast("long")).alias("va"),
        F.max((F.col("split") == "test").cast("long")).alias("te"),
    )
    shared = pres.agg(
        F.sum(F.expr("tr * va")).alias("g_tv"),
        F.sum(F.expr("tr * te")).alias("g_tt"),
        F.sum(F.expr("va * te")).alias("g_vt"),
    )
    train_g = grams.filter(F.col("split") == "train").select("gram").distinct()
    cont = (
        grams.filter(F.col("split") == "test")
        .join(train_g, "gram", "left_semi")
        .agg(F.countDistinct("doc_id").alias("n"))
    )
    a = shared.select(
        F.expr(
            "stack(3, 'grams_train_val', g_tv, 'grams_train_test', g_tt,"
            " 'grams_val_test', g_vt)"
        ).alias("metric", "n")
    )
    b = cont.select(F.lit("test_docs_contaminated_by_train").alias("metric"), "n")
    return ordered(a.unionByName(b), "metric")


def ngram_novelty_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) audit: how many NEW distinct
    NOVELTY_N-grams each doc-id decile of the corpus introduces, with the
    cumulative total — a flat tail means later documents add nothing new
    (template flood / crawl collapse), the corpus-level twin of the
    per-doc repetition gates.

    Scale shape: first occurrence per gram is a gram-keyed MIN aggregate
    (map-side combine — a gram repeated 10^6 times collapses per
    partition); deciles come from a broadcast 1-row max; the cumulative
    sum runs over the 10-row decile frame (driver-sized, the
    ``vocab_coverage`` convention)."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    wd = docs.select("doc_id", _words().alias("w"))
    grams = wd.select(
        "doc_id", F.explode(_gram_array(F.col("w"), NOVELTY_N)).alias("gram")
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("fd"))
    mx = docs.agg((F.max("doc_id") + 1).alias("mx"))
    dec = first.crossJoin(F.broadcast(mx)).select(
        F.expr("CAST(fd * 10 div mx AS INT)").alias("decile")
    )
    cnt = dec.groupBy("decile").agg(F.count("*").alias("n_new_grams"))
    w10 = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    out = cnt.select(
        "decile",
        "n_new_grams",
        F.sum("n_new_grams").over(w10).alias("cum_grams"),
    )
    return ordered(out, "decile")
