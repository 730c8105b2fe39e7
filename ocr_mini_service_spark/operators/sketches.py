"""Sketch operators with exact-value audits: the probabilistic summaries a
100-TB pipeline runs BEFORE committing to exact passes — cardinality
(HyperLogLog), frequency (Count-Min), and rank (Greenwald-Khanna via
``percentile_approx``) — each implemented so the driver's DuckDB oracle can
value-check them.

Reference stake: the reference service sizes work from cheap pre-scans (the
admission gate's metadata checks before the expensive OCR pass,
image-recognition.controller.ts:79-117); these are the corpus-scale analog —
a sketch pass that decides whether the exact dedup / decontamination /
quantile machinery is worth launching.

Portability design: Spark's built-in sketches (``approx_count_distinct``,
``count_min_sketch``) are JVM-internal binaries DuckDB cannot reproduce, so
the HLL and CMS here are built RELATIONALLY from md5-derived integers —
``conv(substr(md5(x), ...), 16, 10)`` on the Spark side equals
``('0x' || substr(md5(x), ...))::BIGINT`` in DuckDB bit-for-bit — and every
estimate is computed in pure BIGINT arithmetic (powers of two, integer
``div``), so the oracle recomputes the SAME sketch and the SAME estimate
exactly.  ``percentile_approx`` has no portable twin, so its audit emits
exact order statistics (oracle-checked) plus integer verdict flags pinned by
the GK sketch's deterministic rank-error guarantee.

Scale notes: sketch state is vocabulary- or register-sized, never
corpus-sized — the CMS counter table is D x W rows, the HLL register table is
sources x 2^B rows; both come out of keyed aggregations with map-side
combine.  The one corpus-sized shuffle anywhere here is the salted join's,
which is the POINT of that operator (splintering a hot key across SALT
reducers instead of one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ordered
from ..sources import load

SK_N = 3  # words per gram: single tokens are a 31-word closed set here
CMS_W = 1024  # count-min width (65536 hex-derived positions pmod W: uniform)
CMS_D = 4  # count-min depth (independent md5 rows via the "d:" salt prefix)
CMS_TOP = 20  # heavy-hitter grams probed against the sketch
HLL_M = 64  # HLL registers (2^6; bucket from 8 md5 bits pmod 64: uniform)
HLL_RHO_CAP = 24  # cap leading-zero rank so 2^(cap-rho) stays exact BIGINT
# alpha_64 = 0.709 (Flajolet et al. 2007, Fig. 3) as the rational 709/1000;
# raw-regime numerator alpha * m^2 * 2^cap, all integer
HLL_NUM = 709 * HLL_M * HLL_M * (1 << HLL_RHO_CAP)
HLL_DEN = 1000
QS_ACC = 1000  # percentile_approx accuracy: rank error <= n div QS_ACC
SALT = 8  # hot-key splinter factor for the salted join


def _gram_array(col: str = "text"):
    """SK_N-word shingle array over whitespace-split lowered text (the same
    derivation as corpus.inverted_index's phrase terms, kept independent so
    the two operators' constants can diverge)."""
    w = F.split(F.lower(F.trim(F.col(col))), r"\s+")
    return F.when(
        F.size(w) >= SK_N,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (SK_N - 1)),
            lambda i: F.array_join(F.slice(w, i, SK_N), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _hex_int(col, start: int, width: int):
    """Portable md5-hex substring as BIGINT: Spark ``conv(..., 16, 10)``
    equals DuckDB ``('0x' || substr(...))::BIGINT`` exactly (width <= 15 hex
    chars keeps the value inside signed 64-bit)."""
    return F.conv(F.substring(col, start, width), 16, 10).cast("long")


def cms_heavy_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Relational Count-Min Sketch (Cormode & Muthukrishnan, J.Alg 2005)
    over the corpus's SK_N-gram stream, audited on its heavy hitters: the
    sketch's estimate for each of the CMS_TOP most frequent grams next to
    the exact count, with the overestimate surfaced as ``excess``.

    The sketch is D rows x W counters; row d hashes a gram to position
    md5("d:" || gram)[0:4] pmod W and the estimate is the MIN across rows.
    Everything — positions, counters, estimates — is md5/BIGINT arithmetic
    the DuckDB oracle recomputes identically, so this is a full value check
    of the sketch, not a verdict flag.  CMS guarantees est >= true (all
    excess >= 0) and E[excess] <= N/W per row.

    Scale shape: gram counts are one vocabulary-keyed aggregation with
    map-side combine; the counter build aggregates vocab x D rows down to
    D x W; the probe joins CMS_TOP x D rows against the broadcast counter
    table.  Sketch state is O(D·W) regardless of corpus size."""
    docs = (
        load(spark, sf, "documents")
        .select("text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    counts = (
        docs.select(F.explode(_gram_array()).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("true_n"))
    )
    pos_structs = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    _hex_int(F.md5(F.concat(F.lit(f"{d}:"), F.col("gram"))), 1, 4),
                    F.lit(CMS_W),
                ).alias("pos"),
            )
            for d in range(CMS_D)
        ]
    )
    ctr = (
        counts.select(F.explode(pos_structs).alias("dp"), "true_n")
        .groupBy(F.col("dp.d").alias("d"), F.col("dp.pos").alias("pos"))
        .agg(F.sum("true_n").alias("c"))
    )
    probes = counts.orderBy(F.desc("true_n"), F.asc("gram")).limit(CMS_TOP)
    est = (
        probes.select("gram", "true_n", F.explode(pos_structs).alias("dp"))
        .join(F.broadcast(ctr), (F.col("dp.d") == F.col("d")) & (F.col("dp.pos") == F.col("pos")))
        .groupBy("gram", "true_n")
        .agg(F.min("c").alias("est_n"))
    )
    out = est.select(
        "gram", "true_n", "est_n", (F.col("est_n") - F.col("true_n")).alias("excess")
    )
    return ordered(out, "gram")


def hll_distinct_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Relational integer HyperLogLog (Flajolet/Fusy/Gandouet/Meunier,
    AofA 2007) per source, audited against the exact distinct-gram count
    from the same single pass.

    Register math is pure BIGINT so the estimate is cross-engine exact:
    bucket = md5(gram)[0:2] pmod 64, rank rho = leading zeros of the next
    48 md5 bits + 1 (via 49 - bit_length, the length(bin(x)) pattern),
    capped at HLL_RHO_CAP so each register's harmonic term 2^(cap - rho) is
    an exact BIGINT; absent registers contribute 2^cap.  Raw-regime
    estimate = (709 · m² · 2^cap) div (1000 · Z) — the small-range linear
    counting branch needs libm ln so it is deliberately not taken; the
    per-source gram cardinality here (and at any corpus scale) sits far
    above the 2.5·m correction threshold, and ``n_zero_reg`` is emitted so
    the regime is visible in the data.  ``err_bp`` is the realized
    |est - exact| in basis points (expected ~1.04/sqrt(64) ~ 13%).

    Scale shape: ONE aggregation chain — distinct (source, gram), then
    (source, bucket) partial-max, then sources x <=64 register rows fold to
    one row per source carrying BOTH the exact count and the sketch."""
    docs = (
        load(spark, sf, "documents")
        .select("source", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    items = (
        docs.select("source", F.explode(_gram_array()).alias("gram"))
        .distinct()
        .withColumn("hx", F.md5("gram"))
    )
    w48 = _hex_int(F.col("hx"), 3, 12)
    rho = F.when(w48 == 0, F.lit(HLL_RHO_CAP)).otherwise(
        F.least(F.lit(49) - F.length(F.bin(w48)), F.lit(HLL_RHO_CAP))
    )
    regs = items.select(
        "source",
        F.pmod(_hex_int(F.col("hx"), 1, 2), F.lit(HLL_M)).alias("bucket"),
        rho.alias("rho"),
    ).groupBy("source", "bucket").agg(
        F.count("*").alias("n_b"), F.max("rho").alias("r")
    )
    # NB: pyspark's F.shiftleft only takes a python-int bit count — the
    # column-valued shift has to go through the SQL registry via F.expr
    folded = regs.groupBy("source").agg(
        F.sum("n_b").cast("long").alias("n_exact"),
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - r)"))
            + (F.lit(HLL_M) - F.count("*")) * F.lit(1 << HLL_RHO_CAP)
        )
        .cast("long")
        .alias("z"),
        (F.lit(HLL_M) - F.count("*")).cast("long").alias("n_zero_reg"),
    )
    out = folded.select(
        "source",
        "n_exact",
        F.expr(f"{HLL_NUM} div ({HLL_DEN} * z)").alias("hll_est"),
        F.expr(
            f"abs(({HLL_NUM} div ({HLL_DEN} * z)) - n_exact) * 10000 div n_exact"
        ).alias("err_bp"),
        "n_zero_reg",
    )
    return ordered(out, "source")


def quantile_sketch_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Greenwald-Khanna rank-error audit of ``percentile_approx`` per event
    type: exact p50/p90 order statistics (``percentile_disc`` — oracle-
    checked values) next to integer verdicts that the approximate answers
    honor the sketch's DETERMINISTIC guarantee (rank error <= n div
    accuracy, Greenwald & Khanna SIGMOD 2001 — not probabilistic, so the
    verdicts are safe constants for the oracle).

    The verdict is computed by joining the approximate values back over the
    stream and counting exact ranks: value v passes for quantile q iff some
    rank in [n_lt(v)+1, n_le(v)] lies within n div ACC (+1 floor slack) of
    q·n.  Scale shape: one keyed aggregate for the stats, one broadcast of
    the per-type row back over the stream, one more keyed aggregate — no
    window, no sort."""
    ev = load(spark, sf, "events").select("event_type", "value")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90"),
        F.percentile_approx("value", [0.5, 0.9], QS_ACC).alias("ap"),
    )
    marked = ev.join(F.broadcast(agg), "event_type")
    ranks = marked.groupBy("event_type").agg(
        F.first("n").alias("n"),
        F.first("p50").alias("p50_exact"),
        F.first("p90").alias("p90_exact"),
        F.sum((F.col("value") <= F.col("ap")[0]).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("ap")[0]).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("ap")[1]).cast("long")).alias("le90"),
        F.sum((F.col("value") < F.col("ap")[1]).cast("long")).alias("lt90"),
    )

    def ok(q_mille: int, le: str, lt: str):
        target = F.expr(f"(n * {q_mille}) div 1000")
        slack = F.expr(f"n div {QS_ACC}") + 1
        return (
            (F.col(le) >= target - slack) & (F.col(lt) <= target + slack)
        ).cast("int")

    out = ranks.select(
        "event_type",
        "n",
        "p50_exact",
        "p90_exact",
        ok(500, "le50", "lt50").alias("ok_p50"),
        ok(900, "le90", "lt90").alias("ok_p90"),
    )
    return ordered(out, "event_type")


def skew_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit salt-splintered join for a hot-key fact-to-aggregate join:
    the per-source aggregate side is replicated SALT ways with a salt
    column, the fact side salts on pmod(doc_id, SALT), and the join runs on
    (source, salt) — so a source holding most of the corpus (the normal web
    crawl shape) lands on SALT reducers instead of one.

    At driver scale the aggregate side is 5 rows and a broadcast would win;
    the query deliberately pins the SHUFFLE join shape (``shuffle_hash``
    hint, plan-asserted: no broadcast join, salt in the partitioning keys)
    because it exists to keep the 100-TB variant honest — when the
    aggregate key space is itself billions of rows (per-domain stats over a
    web crawl), broadcast is off the table and the salt is what breaks the
    skew.  Results are value-identical to the unsalted join, which is
    exactly what the plain-join oracle checks."""
    docs = (
        load(spark, sf, "documents")
        .select("doc_id", "source", "n_chars")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    dim = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("src_chars"),
    )
    rep = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    fact = docs.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(SALT)).cast("int"))
    j = fact.join(rep.hint("shuffle_hash"), ["source", "salt"])
    out = j.select(
        "doc_id",
        "source",
        "n_docs",
        "src_chars",
        F.expr("n_chars * 10000 div src_chars").alias("share_bp"),
    )
    return ordered(out, "doc_id")
