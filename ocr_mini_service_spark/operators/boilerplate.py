"""DOM-heuristic boilerplate stripping — the main-content-extraction block
classifier family (text-density scoring, link-density pruning, block-level
readability classification) a web-scale curation pipeline runs before any
other text operator.

The classifier is the published Boilerpipe ``NumWordsRulesClassifier``
decision rule (Kohlschütter et al., WSDM 2011 — "Boilerplate Detection
using Shallow Text Features"): a block is MAIN CONTENT iff its link density
is low and the word-count context (previous / current / next block) clears
the rule's thresholds.  Densities are exact integer basis points and the
thresholds integers, so a SQL oracle reproduces every decision bit-for-bit.

The synthetic corpus has no markup, so the DOM is derived deterministically
from the closed-form word grid: consecutive BLOCK_WORDS-word windows are
blocks, and word j of block i in doc d is an anchor (link) word iff
pmod(d*31 + i*7 + j, LINK_MOD) == 0 — a pure integer rule both engines
evaluate identically (the same overlay trick as dedup's mutants: structure
is synthesized, the OPERATOR is the real published algorithm).

Scale shape: one narrow projection chain (stage the words array once, one
posexplode — the staged-projection rule), then a single window on the
doc_id key for the prev/next context and one keyed groupBy for the strip —
two Exchanges total on the doc key, nothing quadratic, no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import ordered
from ..sources import load

BLOCK_WORDS = 8  # words per synthetic DOM block
LINK_MOD = 5  # word j of block i in doc d is a link iff (d*31+i*7+j) % 5 == 0
WRAP_COLS = 80  # densitometric wrap width (text density = words per wrapped line)

# NumWordsRulesClassifier constants (boilerpipe
# NumWordsRulesClassifier.classify; densities in exact basis points)
CURR_LINK_BP_MAX = 3333  # curr.linkDensity <= 0.333333
PREV_LINK_BP_LOW = 5555  # prev.linkDensity <= 0.555556 branch split
# low-prev-link branch: content iff curr>16 or next>15 or prev>4 words
CURR_WORDS_A, NEXT_WORDS_A, PREV_WORDS_A = 16, 15, 4
# high-prev-link branch: content iff curr>40 or next>17 words
CURR_WORDS_B, NEXT_WORDS_B = 40, 17

# jusText rung (Pomikálek 2011, "Removing Boilerplate and Duplicate
# Content from Web Corpora", ch. 4) — the stopword-density block classifier:
# context-free pass assigns good / neargood / short / bad from link density,
# block length, and stopword density; the context-sensitive pass re-labels
# short and neargood blocks from their nearest good/bad neighbours.
# MAX_LINK_DENSITY = 0.2 is the published default; the length/stopword
# thresholds mirror the paper's length_low/length_high and
# stopwords_low/stopwords_high STRUCTURE with values pinned at the synthetic
# 8-word grid's separation points (stopword density quantizes at 1250 bp
# steps; full blocks run 33–52 chars), same convention as the densitometric
# rung above.
JT_STOPWORDS = ("a", "the")  # the corpus vocabulary's function words
_JT_SW_ARR = ", ".join(f"'{s}'" for s in JT_STOPWORDS)  # SQL literal array body
JT_MAX_LINK_BP = 2000  # link_density > 0.2 => bad (paper default)
JT_LEN_LOW = 25  # chars; below => short (or bad if any link)
JT_LEN_HIGH = 38  # chars; stopword-dense blocks above => good
JT_STOP_LOW_BP = 1200  # >= one stopword per 8-word block
JT_STOP_HIGH_BP = 2400  # >= two stopwords per 8-word block

# Densitometric rung — the density twin of the NumWordsRules tree.
# Kohlschütter et al. §3.2 measure text density as words per WRAP_COLS-
# wrapped line and show it separates content from boilerplate; their
# density CLASSIFIER is a trained decision tree, so the integer thresholds
# here are repo-defined at the synthetic block grid's separation points
# (full 8-word one-line blocks sit at 800; doc-tail fragments below), not a
# paper citation.  Link gates are identical to the rules rung.
DENS_CURR_A = 700  # low-prev-link branch: content iff curr density > 7.00
DENS_CTX_A = 400  # ... or BOTH neighbors dense (> 4.00 words/line)
DENS_CURR_B = 750  # high-prev-link branch: content iff curr > 7.50 only


def _words(col: str = "text"):
    return F.split(F.trim(F.col(col)), r"\s+")


def _text_density():
    """Densitometric text density (Kohlschütter et al. §3.2): words per
    WRAP_COLS-wrapped line as an exact ×100 integer, over the n_words /
    block_text columns — THE single source of the formula (shared by
    ``_block_features`` and the ensemble frame so the two can never
    drift)."""
    return F.expr(
        f"(n_words * 100) div greatest("
        f"(length(block_text) + {WRAP_COLS - 1}) div {WRAP_COLS}, 1)"
    )


def _block_features(spark: SparkSession, sf: str) -> DataFrame:
    """doc_id, block_idx, block_text, n_words, n_links, link_bp."""
    docs = load(spark, sf, "documents")
    wdocs = docs.select("doc_id", _words().alias("w"))
    staged = wdocs.select(
        "doc_id",
        "w",
        F.expr(f"sequence(1, size(w), {BLOCK_WORDS})").alias("starts"),
    )
    blocks = staged.select(
        "doc_id",
        "w",
        F.posexplode("starts").alias("block_idx", "start"),
    ).select(
        "doc_id",
        "block_idx",
        F.slice("w", F.col("start"), BLOCK_WORDS).alias("bw"),
    )
    # anchor-word flags from the integer rule; j is 1-based within the block
    n_links = F.size(
        F.filter(
            F.transform(
                "bw",
                lambda _, j: F.pmod(
                    F.col("doc_id") * 31 + F.col("block_idx") * 7 + (j + 1),
                    F.lit(LINK_MOD),
                ),
            ),
            lambda r: r == 0,
        )
    )
    return (
        blocks.select(
            "doc_id",
            "block_idx",
            F.array_join("bw", " ").alias("block_text"),
            F.size("bw").alias("n_words"),
            n_links.alias("n_links"),
        )
        .withColumn("link_bp", F.expr("(n_links * 10000) div n_words"))
        .withColumn("text_density_x100", _text_density())
    )


def _rules_verdict():
    """The NumWordsRules decision as a boolean Column over the context
    columns (n_words / prev_words / next_words / link_bp / prev_link_bp) —
    shared by ``_classified`` and the ensemble rung."""
    low_branch = (
        (F.col("n_words") > CURR_WORDS_A)
        | (F.col("next_words") > NEXT_WORDS_A)
        | (F.col("prev_words") > PREV_WORDS_A)
    )
    high_branch = (F.col("n_words") > CURR_WORDS_B) | (
        F.col("next_words") > NEXT_WORDS_B
    )
    return F.when(F.col("link_bp") > CURR_LINK_BP_MAX, F.lit(False)).otherwise(
        F.when(F.col("prev_link_bp") <= PREV_LINK_BP_LOW, low_branch).otherwise(
            high_branch
        )
    )


def _density_verdict():
    """The densitometric decision as a boolean Column over the density
    context columns — shared by ``_classified`` and the ensemble rung."""
    dens_low = (F.col("text_density_x100") > DENS_CURR_A) | (
        (F.col("prev_density_x100") > DENS_CTX_A)
        & (F.col("next_density_x100") > DENS_CTX_A)
    )
    dens_high = F.col("text_density_x100") > DENS_CURR_B
    return F.when(F.col("link_bp") > CURR_LINK_BP_MAX, F.lit(False)).otherwise(
        F.when(F.col("prev_link_bp") <= PREV_LINK_BP_LOW, dens_low).otherwise(
            dens_high
        )
    )


def _classified(spark: SparkSession, sf: str) -> DataFrame:
    """Block features + prev/next context + BOTH rung decisions (the
    NumWordsRules word-count tree and its densitometric twin) — one doc-key
    window pass feeds every downstream classifier/audit, so adding a rung
    costs two lag/lead columns, never a second scan or a join."""
    feats = _block_features(spark, sf)
    w = Window.partitionBy("doc_id").orderBy("block_idx")
    ctx = feats.select(
        "*",
        F.coalesce(F.lag("n_words").over(w), F.lit(0)).alias("prev_words"),
        F.coalesce(F.lead("n_words").over(w), F.lit(0)).alias("next_words"),
        F.coalesce(F.lag("link_bp").over(w), F.lit(0)).alias("prev_link_bp"),
        F.coalesce(F.lag("text_density_x100").over(w), F.lit(0)).alias(
            "prev_density_x100"
        ),
        F.coalesce(F.lead("text_density_x100").over(w), F.lit(0)).alias(
            "next_density_x100"
        ),
    )
    return ctx.withColumn(
        "is_content", _rules_verdict().cast("int")
    ).withColumn("is_content_density", _density_verdict().cast("int"))


def boilerplate_blocks(spark: SparkSession, sf: str) -> DataFrame:
    """Per-block shallow-text-feature classification (the block-level
    readability decision): word counts, exact link density, prev/next
    context, and the NumWordsRules verdict."""
    out = _classified(spark, sf).select(
        "doc_id",
        "block_idx",
        "n_words",
        "n_links",
        "link_bp",
        "text_density_x100",
        "prev_words",
        "next_words",
        "is_content",
    )
    return ordered(out, "doc_id", "block_idx")


def density_blocks(spark: SparkSession, sf: str) -> DataFrame:
    """Per-block densitometric classification — the text-density rung of
    the north-star DOM-heuristic family (density scoring alongside the
    word-count rules): exact ×100 densities with prev/next context and the
    density-tree verdict.  Same single window pass as the rules rung."""
    out = _classified(spark, sf).select(
        "doc_id",
        "block_idx",
        "n_words",
        "link_bp",
        "text_density_x100",
        "prev_density_x100",
        "next_density_x100",
        "is_content_density",
    )
    return ordered(out, "doc_id", "block_idx")


def extractor_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document agreement audit between the two extraction rungs
    (NumWordsRules vs densitometric) — the confusion counts a pipeline
    owner watches before switching classifiers: blocks both keep, blocks
    only one keeps, blocks both drop.  Both verdicts come out of the SAME
    window pass, so the audit is one doc-keyed aggregation over the
    classified blocks — no join of two classifier outputs."""
    cls = _classified(spark, sf)
    r = F.col("is_content")
    d = F.col("is_content_density")
    out = cls.groupBy("doc_id").agg(
        F.count("*").alias("n_blocks"),
        F.sum((r * d).cast("long")).alias("n_both"),
        F.sum((r * (1 - d)).cast("long")).alias("n_only_rules"),
        F.sum(((1 - r) * d).cast("long")).alias("n_only_density"),
        F.sum(((1 - r) * (1 - d)).cast("long")).alias("n_neither"),
    )
    return ordered(out, "doc_id")


def _stripped(spark: SparkSession, sf: str) -> DataFrame:
    """Unordered per-doc strip aggregate (building block)."""
    cls = _classified(spark, sf)
    return cls.groupBy("doc_id").agg(
        F.count("*").alias("n_blocks"),
        F.sum("is_content").cast("long").alias("n_content_blocks"),
        F.sum(F.when(F.col("is_content") == 1, F.col("n_words")).otherwise(0))
        .cast("long")
        .alias("n_content_words"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_content") == 1,
                            F.struct("block_idx", "block_text"),
                        )
                    )
                ),
                lambda s: s["block_text"],
            ),
            " ",
        ).alias("main_text"),
    )


def boilerplate_strip(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate stripping: each document reduced to its main content —
    the ordered join of blocks the classifier kept — with the block/word
    audit counts a curation funnel records.  One keyed groupBy over the
    classified blocks; docs whose every block is boilerplate survive with
    empty main_text (no silent row drops)."""
    return ordered(_stripped(spark, sf), "doc_id")


def _justext_classified(spark: SparkSession, sf: str) -> DataFrame:
    """Block features + both jusText passes (the shared core of
    ``justext_blocks`` / ``justext_strip``).

    Context-free pass (paper ch. 4.1): link-dense blocks are bad; very
    short blocks are short (bad if they carry any link); otherwise the
    stopword density ladder assigns good / neargood / bad with the length
    gate splitting good from neargood.

    Context-sensitive pass (ch. 4.2): each short / neargood block looks at
    its nearest CONTEXT-FREE good/bad neighbour on each side (edges default
    bad).  neargood becomes bad only between two bad neighbours; short
    takes the class both sides agree on, and on a good/bad boundary sides
    whose nearest any-class neighbour is neargood pull it to good.  The
    reference implementation revises classes IN PLACE while iterating, so
    its left-neighbour lookups are order-dependent; this variant reads
    context-free classes in both directions — deterministic, symmetric,
    and partition-parallel (one doc-keyed window, no sequential scan).

    Scale shape: the same single posexplode projection as the other rungs
    plus one window on the doc key (four lag/lead-style frames share the
    one Sort+Window pass) — no join, nothing quadratic, no UDF."""
    feats = _block_features(spark, sf)
    jt = feats.select(
        "doc_id",
        "block_idx",
        "block_text",
        "n_words",
        "link_bp",
        F.length("block_text").cast("int").alias("n_chars"),
        F.expr(
            # repo convention: exact integer `div`, never a float ratio
            # (truncated doubles can straddle rounding ties vs DuckDB `//`)
            f"(size(filter(split(block_text, ' '),"
            f" x -> array_contains(array({_JT_SW_ARR}), x))) * 10000L)"
            " div n_words"
        ).alias("stop_bp"),
    )
    cf = (
        F.when(F.col("link_bp") > JT_MAX_LINK_BP, F.lit("bad"))
        .when(
            F.col("n_chars") < JT_LEN_LOW,
            F.when(F.col("link_bp") > 0, F.lit("bad")).otherwise(F.lit("short")),
        )
        .when(
            F.col("stop_bp") >= JT_STOP_HIGH_BP,
            F.when(F.col("n_chars") > JT_LEN_HIGH, F.lit("good")).otherwise(
                F.lit("neargood")
            ),
        )
        .when(F.col("stop_bp") >= JT_STOP_LOW_BP, F.lit("neargood"))
        .otherwise(F.lit("bad"))
    )
    cfd = jt.withColumn("cf_class", cf)
    base = Window.partitionBy("doc_id").orderBy("block_idx")
    wprev = base.rowsBetween(Window.unboundedPreceding, -1)
    wnext = base.rowsBetween(1, Window.unboundedFollowing)
    gb = F.when(F.col("cf_class").isin("good", "bad"), F.col("cf_class"))
    nonshort = F.when(F.col("cf_class") != "short", F.col("cf_class"))
    ctx = cfd.select(
        "*",
        F.coalesce(F.last(gb, ignorenulls=True).over(wprev), F.lit("bad")).alias(
            "prev_gb"
        ),
        F.coalesce(F.first(gb, ignorenulls=True).over(wnext), F.lit("bad")).alias(
            "next_gb"
        ),
        F.coalesce(
            F.last(nonshort, ignorenulls=True).over(wprev), F.lit("bad")
        ).alias("prev_any"),
        F.coalesce(
            F.first(nonshort, ignorenulls=True).over(wnext), F.lit("bad")
        ).alias("next_any"),
    )
    final = (
        F.when(F.col("cf_class").isin("good", "bad"), F.col("cf_class"))
        .when(
            F.col("cf_class") == "neargood",
            F.when(
                (F.col("prev_gb") == "bad") & (F.col("next_gb") == "bad"),
                F.lit("bad"),
            ).otherwise(F.lit("good")),
        )
        # short: agreement wins; on a good/bad boundary a neargood bridge
        # on the bad side pulls it to good (paper's conductor rule)
        .when(F.col("prev_gb") == F.col("next_gb"), F.col("prev_gb"))
        .when(
            (F.col("prev_gb") == "bad") & (F.col("prev_any") == "neargood"),
            F.lit("good"),
        )
        .when(
            (F.col("next_gb") == "bad") & (F.col("next_any") == "neargood"),
            F.lit("good"),
        )
        .otherwise(F.lit("bad"))
    )
    return ctx.withColumn("final_class", final)


def justext_blocks(spark: SparkSession, sf: str) -> DataFrame:
    """Per-block jusText classification — the stopword-density rung of the
    DOM-heuristic family: shallow features plus both the context-free and
    the context-sensitive (final) class."""
    out = _justext_classified(spark, sf).select(
        "doc_id",
        "block_idx",
        "n_words",
        "n_chars",
        "link_bp",
        "stop_bp",
        "cf_class",
        "final_class",
    )
    return ordered(out, "doc_id", "block_idx")


def justext_strip(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate stripping under the jusText rung: each document reduced
    to its final_class == good blocks in block order, with the audit counts
    (kept blocks/words and how many keeps the context pass added over the
    context-free goods).  One keyed groupBy over the classified blocks;
    all-boilerplate docs survive with empty main_text."""
    cls = _justext_classified(spark, sf)
    keep = (F.col("final_class") == "good").cast("int")
    out = cls.groupBy("doc_id").agg(
        F.count("*").alias("n_blocks"),
        F.sum(keep).cast("long").alias("n_good_blocks"),
        F.sum(keep * F.col("n_words")).cast("long").alias("n_good_words"),
        F.sum(
            ((F.col("final_class") == "good") & (F.col("cf_class") != "good"))
            .cast("long")
        ).alias("n_context_promoted"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("final_class") == "good",
                            F.struct("block_idx", "block_text"),
                        )
                    )
                ),
                lambda s: s["block_text"],
            ),
            " ",
        ).alias("main_text"),
    )
    return ordered(out, "doc_id")


def _ensemble_classified(spark: SparkSession, sf: str) -> DataFrame:
    """All THREE rung verdicts (NumWordsRules, densitometric, jusText) on
    one block frame — the majority-vote ensemble extractor (the standard
    CleanEval-era remedy for single-classifier precision/recall trade-offs:
    each rung errs on different blocks, so 2-of-3 voting beats any member).

    Built ON TOP of the jusText frame instead of joining classifier
    outputs: the rules/density context columns are five more lag/lead
    expressions over the SAME (doc_id, block_idx) window the jusText
    context pass already sorts for, so all three verdicts ride one scan,
    one Exchange, one Sort — no self-join of rung outputs (the plan test
    pins Join-free)."""
    jt = _justext_classified(spark, sf)
    w = Window.partitionBy("doc_id").orderBy("block_idx")
    ctx = jt.withColumn("text_density_x100", _text_density()).select(
        "*",
        F.coalesce(F.lag("n_words").over(w), F.lit(0)).alias("prev_words"),
        F.coalesce(F.lead("n_words").over(w), F.lit(0)).alias("next_words"),
        F.coalesce(F.lag("link_bp").over(w), F.lit(0)).alias("prev_link_bp"),
        F.coalesce(F.lag("text_density_x100").over(w), F.lit(0)).alias(
            "prev_density_x100"
        ),
        F.coalesce(F.lead("text_density_x100").over(w), F.lit(0)).alias(
            "next_density_x100"
        ),
    )
    return (
        ctx.withColumn("vote_rules", _rules_verdict().cast("int"))
        .withColumn("vote_density", _density_verdict().cast("int"))
        .withColumn(
            "vote_justext", (F.col("final_class") == "good").cast("int")
        )
        .withColumn(
            "votes",
            F.col("vote_rules") + F.col("vote_density") + F.col("vote_justext"),
        )
        .withColumn("keep", (F.col("votes") >= 2).cast("int"))
    )


def ensemble_blocks(spark: SparkSession, sf: str) -> DataFrame:
    """Per-block majority-vote ensemble classification: each rung's vote,
    the vote total, and the 2-of-3 keep decision."""
    out = _ensemble_classified(spark, sf).select(
        "doc_id",
        "block_idx",
        "n_words",
        "link_bp",
        "vote_rules",
        "vote_density",
        "vote_justext",
        "votes",
        "keep",
    )
    return ordered(out, "doc_id", "block_idx")


def ensemble_strip(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate stripping under the majority-vote ensemble: each
    document reduced to its 2-of-3 kept blocks in block order, with the
    unanimity audit (how many keeps all three rungs agreed on vs. majority
    rescues) a pipeline owner watches to see whether the ensemble is
    actually arbitrating or one rung dominates.  One keyed groupBy over the
    classified blocks; all-boilerplate docs survive with empty main_text."""
    cls = _ensemble_classified(spark, sf)
    out = cls.groupBy("doc_id").agg(
        F.count("*").alias("n_blocks"),
        F.sum("keep").cast("long").alias("n_kept_blocks"),
        F.sum(F.col("keep") * F.col("n_words"))
        .cast("long")
        .alias("n_kept_words"),
        F.sum((F.col("votes") == 3).cast("long")).alias("n_unanimous"),
        F.sum((F.col("votes") == 2).cast("long")).alias("n_majority_only"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("keep") == 1,
                            F.struct("block_idx", "block_text"),
                        )
                    )
                ),
                lambda s: s["block_text"],
            ),
            " ",
        ).alias("main_text"),
    )
    return ordered(out, "doc_id")


def ensemble_strip_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Character-span offsets of the ensemble-kept blocks — the span half
    of the strip's (text, spans) output contract (same contract as the
    kernel path's ``extract_spans``): kept block i occupies
    [span_start, span_end) of the document's canonical single-space text.

    Offsets are a running sum of (block length + 1 joining space) over ALL
    blocks — kept and dropped — so they address the original document, not
    the stripped result; the keep filter applies after the cumsum.  The
    oracle re-derives the offsets independently and substring-addresses the
    reconstructed canonical text at them, so a drifted offset surfaces as a
    mismatched block_text, not just a mismatched integer.

    Scale shape: one more frame on the same doc-keyed window sort the
    verdicts already ride — no join, nothing quadratic."""
    cls = _ensemble_classified(spark, sf)
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("block_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sp = cls.select(
        "doc_id",
        "block_idx",
        "block_text",
        "keep",
        F.coalesce(
            F.sum(F.length("block_text") + F.lit(1)).over(wcum), F.lit(0)
        )
        .cast("long")
        .alias("span_start"),
    )
    out = sp.filter(F.col("keep") == 1).select(
        "doc_id",
        "block_idx",
        "span_start",
        (F.col("span_start") + F.length("block_text"))
        .cast("long")
        .alias("span_end"),
        "block_text",
    )
    return ordered(out, "doc_id", "block_idx")


def curation_funnel_v2(spark: SparkSession, sf: str) -> DataFrame:
    """The web-extraction curation pipeline as one declarative DAG, audited
    as a funnel: raw -> boilerplate strip (>= 1 content block survives) ->
    Gopher quality gate evaluated on the STRIPPED main text (garbage that
    only looked good with its boilerplate attached dies here) -> exact
    dedup of the stripped text (canonical = min doc_id per md5(main_text) —
    stripping first is the production order, since boilerplate variation
    masks identical main content).

    Composition shape: one pass over the classified blocks (doc-key window
    + groupBy), the gate as a narrow projection over the strip, the dedup
    as one window on the content-hash key, then a single partial+final
    aggregation of the cumulative conjunctions unpivoted by ``stack`` —
    the funnel costs the same as the strip that feeds it."""
    from .corpus import gopher_flags

    stripped = _stripped(spark, sf)
    # keep= passthrough instead of a self-join: joining gopher_flags(strip)
    # back onto strip would evaluate the strip aggregation once per side
    g = gopher_flags(
        stripped, "main_text", keep=["n_content_blocks", "main_text"]
    )
    flags = g.select(
        F.md5("main_text").alias("ck"),
        (F.col("n_content_blocks") > 0).cast("long").alias("has_content"),
        (F.col("pass_gopher") == 1).cast("long").alias("quality"),
    )
    # Dedup IS the aggregation (the line_dedup keeper principle — a window
    # over the content key would sort a mass-duplicated main_text in one
    # task; VERDICT r3 item 3).  has_content (main_text != '') and quality
    # (gopher on main_text) are determined by main_text, hence constant
    # within a ck group, so the canonical member (min doc_id) passes the
    # earlier gates iff the group constants do: s3 = Σ_groups hc·q, while
    # the per-doc stages are Σ_groups n·(group constant).
    byck = flags.groupBy("ck").agg(
        F.count("*").alias("n"),
        F.min("has_content").alias("hc"),
        F.min("quality").alias("q"),
    )
    agg = byck.agg(
        F.sum("n").alias("s0"),
        F.sum(F.col("n") * F.col("hc")).alias("s1"),
        F.sum(F.col("n") * F.col("hc") * F.col("q")).alias("s2"),
        F.sum(F.col("hc") * F.col("q")).alias("s3"),
    )
    out = agg.select(
        F.expr(
            "stack(4, 0, 'raw', s0, 1, 'content', s1,"
            " 2, 'quality', s2, 3, 'dedup', s3)"
        ).alias("stage_idx", "stage", "n_docs")
    )
    return ordered(out, "stage_idx")
