"""Agent-transcript curation operators: the hygiene / dedup rungs a
training-data pipeline runs over MULTI-TURN conversation logs before the
extracted text is packed into samples.  The reference is a per-request
service (one image/PDF per call — /root/reference/src/ocr/
image-recognition.controller.ts); at corpus scale its callers hold the
conversation state, so these operators are the corpus-side analog of the
state the service never sees: retries, regenerations, truncation, echoes,
tool payload health.

Multi-turn construction (shared by every operator here; each DuckDB oracle
in ``__spark_entry__`` re-derives it independently from ``documents``):

- conversation ``c`` has ``n(c) = 2 + c % 3`` turns (2..4)
- turn ``t`` of conversation ``c`` normally sources document ``c*4 + t``
- every 5th conversation (``c % 5 == 4``) is a RETRY of its predecessor:
  - ``c % 10 == 4``: a pure RESUME — every turn re-sources ``(c-1)*4 + t``
  - ``c % 10 == 9``: an EDITED retry — every turn but the last re-sources
    ``(c-1)*4 + t``; the final turn is its own regenerated document
- ``turn_text`` = first ``TURN_WORDS`` whitespace-normalized words of the
  source document; ``role`` alternates user/assistant by turn parity;
  ``bucket`` = first md5 byte of ``conv:turn:turn_text``

This mirrors the duplication structure of real agent-transcript corpora:
resumed sessions replay a prefix of an earlier conversation verbatim and
regenerations fork a shared prefix into different continuations — exactly
the two phenomena ``conv_prefix_containment`` / ``conv_fork_points``
detect from content alone (full per-turn hashes, no id lineage), the way a
crawler-side pipeline must (session ids are not stable across retries).

Scale notes (100 TB posture):
- every per-turn derivation is a narrow projection; every per-conversation
  reduction is ONE keyed aggregation or ONE bounded window on the conv_id
  shuffle key (per-conversation cost = its turn rows);
- the containment join keys on the FULL md5-chain of a conversation's
  turns, so join groups are true-duplicate sets (sparse by construction) —
  never a coarse bucket that goes quadratic;
- the turn-resolution join (``src_doc`` → documents) is an equi hash join
  on the unique doc key — the realistic "resolve turn references" shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load
from . import first_words, ordered
from .corpus import DECON_N, _doc_grams, _gram_array, _md5_bucket, _split_expr

TURNS_PER_CONV = 4  # documents per conversation slot (same as transcribe)
CONV_MIN_TURNS = 2  # n(c) = CONV_MIN_TURNS + c % 3
TURN_WORDS = 12  # words kept per turn (same budget as the loss-mask family)
BUDGET_CHARS = 150  # context_budget: training-sample character budget
LONG_GAP_S = 90  # reply_latency: a gap above this splits attention
ROLES3 = ("user", "assistant", "tool")  # role_sequence_audit alphabet
SFT_BUDGET_CHARS = 512  # sft_pack_conversations: packed-sample capacity
PACK_STREAMS = 8  # sft_pack_conversations: parallel packing streams


def _turns(spark: SparkSession, sf: str) -> DataFrame:
    """The shared (conv_id, turn_idx, role, turn_text, bucket) frame per the
    module-docstring construction.  Shape: a generated (conv, turn) domain
    resolved against documents by one equi join on the unique doc key."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    n = (F.lit(CONV_MIN_TURNS) + F.col("conv_id") % 3).cast("int")
    dom = (
        docs.select(F.expr(f"doc_id div {TURNS_PER_CONV}").alias("conv_id"))
        .distinct()
        .select("conv_id", n.alias("n_turns"))
        .select(
            "conv_id",
            "n_turns",
            F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
        )
    )
    is_retry = F.col("conv_id") % 5 == 4
    own_last = (F.col("conv_id") % 10 == 9) & (
        F.col("turn_idx") == F.col("n_turns") - 1
    )
    src = F.when(
        is_retry & ~own_last,
        (F.col("conv_id") - 1) * TURNS_PER_CONV + F.col("turn_idx"),
    ).otherwise(F.col("conv_id") * TURNS_PER_CONV + F.col("turn_idx"))
    words = first_words("text", TURN_WORDS)
    resolved = dom.select("conv_id", "turn_idx", src.alias("src_doc")).join(
        docs, F.col("src_doc") == F.col("doc_id")
    )
    turn_text = F.array_join(words, " ")
    return resolved.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant").alias("role"),
        turn_text.alias("turn_text"),
        _md5_bucket(
            F.concat_ws(":", F.col("conv_id"), F.col("turn_idx"), turn_text)
        ).alias("bucket"),
    )


def _bad_turns(t: DataFrame) -> DataFrame:
    """Per-turn role-hygiene flag: (conv_id, turn_idx, bad).  Roles come
    from the content-hash bucket (mod 3) so the synthetic corpus exercises
    every violation class; a real corpus supplies its logged roles."""
    r = t.select(
        "conv_id",
        "turn_idx",
        F.element_at(
            F.array(*[F.lit(x) for x in ROLES3]), F.col("bucket") % 3 + 1
        ).alias("r3"),
    )
    win = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("r3").over(win)
    bad = (
        ((F.col("turn_idx") == 0) & (F.col("r3") != "user"))
        | ((F.col("turn_idx") > 0) & (F.col("r3") == prev))
        | ((F.col("r3") == "tool") & ((F.col("turn_idx") == 0) | (prev != "assistant")))
    )
    return r.select("conv_id", "turn_idx", bad.cast("int").alias("bad"))


def role_sequence_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Transcript hygiene gate: flag conversations whose role sequence is
    structurally invalid — first turn not 'user', two consecutive turns
    with the same role, or a 'tool' turn not immediately preceded by
    'assistant'.  One bounded lag window on the conv_id shuffle key, then
    one keyed aggregation."""
    flagged = _bad_turns(_turns(spark, sf))
    out = flagged.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("bad").alias("n_violations"),
        F.coalesce(
            F.min(F.when(F.col("bad") == 1, F.col("turn_idx"))), F.lit(-1)
        ).alias("first_bad_turn"),
        (F.sum("bad") == 0).cast("int").alias("valid"),
    )
    return ordered(out, "conv_id")


def turn_dedup_xconv(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-conversation turn dedup: turn texts that recur in >= 2 distinct
    conversations (retried sessions, templated/canned replies), keyed by the
    full content hash with a deterministic canonical occurrence (min
    (conv, turn)).  ONE aggregation on the content key — a mass-duplicated
    turn collapses in the map-side partial, never sorts a hot key in one
    task (the line_dedup keeper principle)."""
    t = _turns(spark, sf)
    out = (
        t.groupBy(F.md5("turn_text").alias("tkey"))
        .agg(
            F.count("*").alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.min(F.struct("conv_id", "turn_idx")).alias("c"),
        )
        .filter(F.col("n_convs") >= 2)
        .select(
            "tkey",
            "n_turns",
            "n_convs",
            F.col("c.conv_id").alias("canon_conv"),
            F.col("c.turn_idx").alias("canon_turn"),
        )
    )
    return ordered(out, "tkey")


def _seqs(t: DataFrame) -> DataFrame:
    """Per conversation: the ordered concatenation of its full per-turn
    content hashes (the conversation's content 'spine') plus its length.
    Bounded per-conversation state: 32 hex chars per turn."""
    t = t.select("conv_id", "turn_idx", F.md5("turn_text").alias("tk"))
    return t.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "tk"))),
                lambda s: s["tk"],
            ),
            "",
        ).alias("seq"),
        F.count("*").cast("int").alias("n_turns"),
    )


def conv_prefix_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Retry/resume dedup: conversations whose ENTIRE turn sequence is a
    prefix of another conversation's (a resumed session replays its
    predecessor verbatim and continues) or an exact duplicate of one with a
    smaller conv_id (canonical-keeper tiebreak).  Detection is by content
    alone: join the full md5-chain of each conversation against every
    proper-or-full prefix chain of every other.

    Scale: prefix keys are full 32-hex-per-turn hash chains, so a join
    group is a TRUE duplicate set — group sizes track the real retry rate,
    never a coarse bucket that goes quadratic; prefix fan-out per
    conversation is bounded by its turn count."""
    hits = _containment_hits(_seqs(_turns(spark, sf)))
    out = hits.groupBy("conv_id").agg(
        F.first("n_turns").alias("n_turns"),
        F.count("*").alias("n_containers"),
        F.max((F.col("nb") == F.col("n_turns")).cast("int")).alias("exact_dup"),
    )
    return ordered(out, "conv_id")


def _containment_hits(seqs: DataFrame) -> DataFrame:
    """One row per (contained conversation, container): the equi join of
    full-hash chains against every proper-or-full prefix chain, with the
    canonical-keeper tiebreak for exact duplicates."""
    pref = (
        seqs.select(
            F.col("conv_id").alias("container"),
            F.col("n_turns").alias("nb"),
            "seq",
            F.explode(F.sequence(F.lit(1), F.col("n_turns"))).alias("l"),
        )
        .select(
            "container",
            "nb",
            "l",
            F.expr("substring(seq, 1, l * 32)").alias("p"),
        )
    )
    hits = seqs.join(
        pref,
        (F.col("seq") == F.col("p"))
        & (F.col("n_turns") == F.col("l"))
        & (
            (F.col("nb") > F.col("n_turns"))
            | ((F.col("nb") == F.col("n_turns")) & (F.col("container") < F.col("conv_id")))
        ),
    )
    return hits


def conv_fork_points(spark: SparkSession, sf: str) -> DataFrame:
    """Regeneration forks: depths at which conversations sharing an
    identical turn-prefix diverge into different next turns (an edited
    retry keeps the prefix and regenerates the continuation).  Per depth:
    how many full-hash prefix groups are shared by >= 2 conversations, and
    how many of those fork (>= 2 distinct next-turn hashes).  Two keyed
    aggregations; prefix keys are true-duplicate chains (sparse groups)."""
    return _fork_depths(_turns(spark, sf))


def _fork_depths(turns: DataFrame) -> DataFrame:
    """``conv_fork_points`` over an explicit turns frame (testable with
    hand-built single-turn conversations)."""
    t = turns.select("conv_id", "turn_idx", F.md5("turn_text").alias("tk"))
    arrs = t.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("turn_idx", "tk"))), lambda s: s["tk"]
        ).alias("arr")
    )
    # single-turn conversations contribute no fork depths; without the guard
    # F.sequence(1, 0) is DESCENDING [1, 0] in Spark (unlike DuckDB's empty
    # generate_series(1, 0)) and element_at(arr, 2) on a 1-element array
    # aborts under ANSI mode
    expl = arrs.filter(F.size("arr") >= 2).select(
        "conv_id",
        F.explode(F.sequence(F.lit(1), F.size("arr") - 1)).alias("depth"),
        "arr",
    ).select(
        "conv_id",
        "depth",
        F.array_join(F.slice("arr", 1, F.col("depth")), "").alias("prefix"),
        F.element_at("arr", F.col("depth") + 1).alias("nxt"),
    )
    groups = expl.groupBy("depth", "prefix").agg(
        F.count("*").alias("n_convs"),
        F.countDistinct("nxt").alias("n_next"),
    )
    out = groups.groupBy("depth").agg(
        F.sum((F.col("n_convs") >= 2).cast("long")).alias("n_shared_prefixes"),
        F.sum((F.col("n_next") >= 2).cast("long")).alias("n_forks"),
    )
    return ordered(out, "depth")


def fork_preference_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Preference-pair construction from regeneration forks: when >= 2
    conversations share an identical turn-prefix and continue differently
    (the ``conv_fork_points`` phenomenon), the later attempt is the one the
    user kept — emit (prefix, rejected = first attempt's next turn, chosen =
    last attempt's next turn) per fork group, the raw material an RLHF/DPO
    pipeline mines from transcript logs.  One pair per (depth, prefix)
    group: original-vs-final attempt, skipped when their continuations
    coincide (e.g. an intermediate attempt diverged but the final retry
    landed back on the original).

    Scale: identical to ``conv_fork_points`` — grouping keys are full
    md5-chain prefixes (true-duplicate groups, sparse by construction), the
    per-group reduction is min_by/max_by (map-side combinable), and per-doc
    work is bounded by turn count.  Never a coarse bucket, never a window
    over a hot key."""
    t = _turns(spark, sf).select(
        "conv_id", "turn_idx", "turn_text", F.md5("turn_text").alias("tk")
    )
    arrs = t.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(F.struct("turn_idx", "tk", "turn_text"))).alias("a")
    )
    # single-turn conversations have no (prefix, continuation) split — same
    # descending-sequence guard as _fork_depths
    expl = (
        arrs.filter(F.size("a") >= 2)
        .select(
            "conv_id",
            F.explode(F.sequence(F.lit(1), F.size("a") - 1)).alias("depth"),
            "a",
        )
        .select(
            "conv_id",
            "depth",
            F.md5(
                F.array_join(
                    F.transform(F.slice("a", 1, F.col("depth")), lambda s: s["tk"]), ""
                )
            ).alias("prefix_key"),
            F.element_at("a", F.col("depth") + 1)["tk"].alias("nxt_tk"),
            F.element_at("a", F.col("depth") + 1)["turn_text"].alias("nxt_text"),
        )
    )
    groups = expl.groupBy("depth", "prefix_key").agg(
        F.count("*").alias("n_attempts"),
        F.min_by(F.struct("conv_id", "nxt_text"), "conv_id").alias("rej"),
        F.max_by(F.struct("conv_id", "nxt_text"), "conv_id").alias("cho"),
    )
    pairs = groups.filter(
        (F.col("n_attempts") >= 2)
        & (F.col("cho.nxt_text") != F.col("rej.nxt_text"))
    ).select(
        "depth",
        "prefix_key",
        F.col("n_attempts").cast("long").alias("n_attempts"),
        F.col("cho.conv_id").alias("chosen_conv"),
        F.col("rej.conv_id").alias("rejected_conv"),
        F.col("cho.nxt_text").alias("chosen_text"),
        F.col("rej.nxt_text").alias("rejected_text"),
    )
    return ordered(pairs, "depth", "prefix_key")


def preference_pair_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Length-bias audit over the mined preference pairs: per fork depth,
    how many pairs exist and how often / by how much the chosen continuation
    is longer than the rejected one — the first check an RLHF data pipeline
    runs, because a length-skewed pair set trains a length-hacking reward
    model.  Exact integer char margins; one keyed aggregation over the
    (already sparse) pair set."""
    p = fork_preference_pairs(spark, sf)
    cl = F.length("chosen_text").cast("long")
    rl = F.length("rejected_text").cast("long")
    out = (
        p.select("depth", cl.alias("cl"), rl.alias("rl"))
        .groupBy("depth")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum((F.col("cl") > F.col("rl")).cast("long")).alias("n_chosen_longer"),
            F.sum((F.col("cl") < F.col("rl")).cast("long")).alias("n_rejected_longer"),
            F.sum(F.col("cl") - F.col("rl")).alias("sum_margin_chars"),
        )
    )
    return ordered(out, "depth")


def sft_pack_conversations(spark: SparkSession, sf: str) -> DataFrame:
    """Conversation-aware sample packing with loss-mask offsets: whole
    conversations (turns '\\n'-joined, never split) are packed greedily in
    conv_id order into ~SFT_BUDGET_CHARS samples across PACK_STREAMS
    parallel streams, and every turn is emitted with its sample-relative
    [start_off, end_off) char interval plus the assistant-only loss-mask
    flag (``mask`` — 1 where loss IS computed, matching ``loss_mask_spans``) — exactly the metadata an SFT trainer needs to reset attention at
    conversation boundaries and mask user turns inside packed sequences.
    Conversations sit end-to-end inside a sample (no separator chars — the
    attention reset makes one redundant); a conversation joins the current
    sample if any budget remains, so samples may overflow by one
    conversation's tail (the ``pack_shards`` greedy rule).

    Scale shape: one conv-keyed cumulative window (turn offsets), one
    stream-keyed cumulative window (the packing scan — parallelism is
    per-stream, PACK_STREAMS serial scans at worst, same trade
    ``pack_shards`` documents for its lang streams), one sample-sized MIN
    window for the base offset (the ``packed_doc_spans`` shape).  The
    joined sample text is never built."""
    t = _turns(spark, sf)
    wturn = Window.partitionBy("conv_id").orderBy("turn_idx")
    staged = t.select(
        "conv_id",
        "turn_idx",
        "role",
        F.length("turn_text").cast("long").alias("n_chars"),
        F.sum(F.length("turn_text").cast("long")).over(wturn).alias("cum"),
    )
    # within-conversation offsets: previous turns + one '\n' per boundary
    per_turn = staged.select(
        "conv_id",
        "turn_idx",
        "role",
        (F.col("cum") - F.col("n_chars") + F.col("turn_idx")).alias("t_start"),
        (F.col("cum") + F.col("turn_idx")).alias("t_end"),
    )
    conv = staged.groupBy("conv_id").agg(
        (F.max("cum") + F.max("turn_idx")).alias("conv_chars")
    )
    wstream = Window.partitionBy("stream").orderBy("conv_id")
    packed = (
        conv.select(
            "conv_id", F.pmod(F.col("conv_id"), F.lit(PACK_STREAMS)).alias("stream"),
            "conv_chars",
        )
        .select(
            "conv_id",
            "stream",
            (F.sum("conv_chars").over(wstream) - F.col("conv_chars")).alias("before"),
        )
        .select(
            "conv_id",
            "stream",
            "before",
            F.expr(f"before div {SFT_BUDGET_CHARS}").alias("sample_id"),
        )
    )
    wsamp = Window.partitionBy("stream", "sample_id")
    placed = packed.select(
        "conv_id",
        "stream",
        "sample_id",
        (F.col("before") - F.min("before").over(wsamp)).alias("base"),
    )
    out = per_turn.join(placed, "conv_id").select(
        "stream",
        "sample_id",
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        (F.col("base") + F.col("t_start")).alias("start_off"),
        (F.col("base") + F.col("t_end")).alias("end_off"),
        (F.col("role") == "assistant").cast("int").alias("mask"),
    )
    return ordered(out, "stream", "sample_id", "conv_id", "turn_idx")


def conv_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Conversation-level benchmark decontamination: a transcript is
    tainted if ANY of its turns shares a DECON_N-gram with the held-out
    test split — leakage audits are conversation-granular, because a model
    trained on the rest of a contaminated conversation still sees the
    benchmark item in its context window.  Mirrors ``decontaminate``'s
    shingle + broadcast-semi-join machinery at turn granularity, then one
    conv_id-keyed rollup of the verdict.

    Scale shape: the benchmark gram set is fixed-size (benchmarks don't
    grow with the corpus) → broadcast; the turn side never shuffles for
    the membership test; the only exchanges are the conv_id rollups."""
    docs = load(spark, sf, "documents").withColumn("split", _split_expr())
    bench = (
        _doc_grams(docs.filter(F.col("split") == "test")).select("gram").distinct()
    )
    t = _turns(spark, sf)
    grams = t.select(
        "conv_id",
        "turn_idx",
        F.explode(_gram_array(F.split("turn_text", " "), DECON_N)).alias("gram"),
    )
    bad = (
        grams.join(F.broadcast(bench), "gram", "left_semi")
        .select("conv_id", "turn_idx")
        .distinct()
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_bad"))
    )
    out = (
        t.groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"))
        .join(bad, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            F.coalesce("n_bad", F.lit(0)).cast("long").alias("n_leaky_turns"),
            (F.coalesce("n_bad", F.lit(0)) == 0).cast("int").alias("keep"),
        )
    )
    return ordered(out, "conv_id")


def _budget_staged(t: DataFrame) -> DataFrame:
    """Per-turn budget fit: (conv_id, n_chars, kept) where kept means the
    '\\n'-joined prefix through this turn still fits BUDGET_CHARS.  The
    joined string is never built — offset arithmetic only, one cumulative
    window on the conv_id shuffle key (the loss_mask_spans shape)."""
    win = Window.partitionBy("conv_id").orderBy("turn_idx")
    n = F.length("turn_text").cast("long")
    cum_end = F.sum(F.length("turn_text").cast("long")).over(win) + F.col("turn_idx")
    return t.select(
        "conv_id",
        n.alias("n_chars"),
        (cum_end <= BUDGET_CHARS).cast("int").alias("kept"),
    )


def context_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window truncation audit: pack each conversation's turns (in
    order, '\\n'-separated) into a BUDGET_CHARS sample and report what
    survives — the pre-tokenizer capacity planning a transcript pipeline
    runs before packing.  One cumulative-sum window on the conv_id shuffle
    key, then one keyed aggregation; the joined string is never built
    (offset arithmetic only, as in loss_mask_spans)."""
    staged = _budget_staged(_turns(spark, sf))
    out = staged.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("kept").alias("n_kept"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(F.col("kept") == 1, F.col("n_chars")).otherwise(F.lit(0))).alias(
            "kept_chars"
        ),
        F.max(F.when(F.col("kept") == 0, 1).otherwise(0)).alias("truncated"),
    )
    return ordered(out, "conv_id")


def assistant_echo(spark: SparkSession, sf: str) -> DataFrame:
    """Echo rate: for every assistant turn, the share of its distinct words
    already present in the immediately preceding user turn — the
    parrot-detection signal transcript curation uses to down-weight
    low-information replies.  One bounded lag window on the conv_id
    shuffle key; set arithmetic on per-turn word arrays (<= TURN_WORDS
    elements) — no shuffle beyond the conv key."""
    t = _turns(spark, sf).select(
        "conv_id",
        "turn_idx",
        "role",
        F.array_distinct(F.split("turn_text", " ")).alias("dw"),
    )
    win = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("dw").over(win)
    staged = t.select(
        "conv_id", "turn_idx", "role", "dw", prev.alias("pdw")
    ).filter((F.col("role") == "assistant") & (F.col("turn_idx") >= 1))
    out = staged.select(
        "conv_id",
        "turn_idx",
        F.size("dw").alias("n_distinct"),
        F.size(F.array_intersect("dw", "pdw")).alias("n_echo"),
        F.expr("(size(array_intersect(dw, pdw)) * 10000) div size(dw)").alias(
            "echo_bp"
        ),
    )
    return ordered(out, "conv_id", "turn_idx")


def reply_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Turn-gap audit: per conversation, the count / sum / max of the
    seconds between consecutive turns plus how many gaps exceed
    LONG_GAP_S (stale-context splits).  Timestamps are constructed per the
    module scheme (turn t at base + t*60 + jitter(bucket) seconds, so gaps
    land in [1, 119]) and the deltas are computed with real timestamp
    arithmetic; one lag window + one keyed aggregation."""
    t = _turns(spark, sf).select(
        "conv_id",
        "turn_idx",
        F.expr(
            "timestampadd(SECOND, turn_idx * 60 + bucket % 60,"
            " timestamp'2026-03-01 08:00:00')"
        ).alias("ts"),
    )
    win = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(win))).alias(
        "gap_s"
    )
    gaps = t.select("conv_id", "turn_idx", gap).filter(F.col("gap_s").isNotNull())
    out = gaps.groupBy("conv_id").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap_s").alias("sum_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
        F.sum((F.col("gap_s") > LONG_GAP_S).cast("long")).alias("n_long_gaps"),
    )
    return ordered(out, "conv_id")


def tool_turn_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Tool-payload health: per conversation, how many turns carry a tool
    payload, how many of those parse as JSON, and the total parsed code
    count — the reference's ZBar symbol envelope health check
    (code-reader.service.ts:64-90) lifted to corpus scale.  The payload
    variant is chosen by the content-hash bucket (mod 5: 2-code / empty /
    malformed / absent) so the Spark side must actually PARSE to classify;
    the oracle re-derives the expectation arithmetically.  One narrow
    from_json projection + one keyed aggregation."""
    t = _turns(spark, sf)
    m = F.col("bucket") % 5
    tool = (
        F.when(
            m == 0,
            F.concat(
                F.lit('{"codes": [{"data": "'),
                F.substring(F.md5("turn_text"), 1, 6),
                F.lit('"}, {"data": "x"}]}'),
            ),
        )
        .when(m == 1, F.lit('{"codes": []}'))
        .when(m == 2, F.lit('{"codes": ['))
        .otherwise(F.lit(""))
    )
    parsed = F.from_json(tool, "codes array<struct<data:string>>")
    staged = t.select(
        "conv_id",
        tool.alias("tool"),
        parsed.getField("codes").alias("codes"),
    ).select(
        "conv_id",
        (F.col("tool") != "").cast("int").alias("has_tool"),
        ((F.col("tool") != "") & F.col("codes").isNotNull()).cast("int").alias("ok"),
        F.when(F.col("codes").isNotNull(), F.size("codes"))
        .otherwise(F.lit(0))
        .alias("nc"),
    )
    out = staged.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("has_tool").alias("n_tool"),
        F.sum("ok").alias("n_valid"),
        F.sum(F.col("has_tool") - F.col("ok")).alias("n_malformed"),
        F.sum("nc").alias("n_codes"),
    )
    return ordered(out, "conv_id")


SEG_SIM_MAX = 2  # a cohesion valley must also be this weak to cut a segment


def conv_topic_segments(spark: SparkSession, sf: str) -> DataFrame:
    """TextTiling-style topic segmentation over conversation turns (Hearst
    1997's lexical-cohesion valleys, adapted from the sentence grid to the
    turn grid): cohesion of each adjacent-turn gap = |distinct-token
    intersection| (exact integer), and a segment boundary falls at every
    STRICT cohesion valley (lower than both neighboring gaps; edge gaps
    compare against +inf) that is also globally weak (sim <= SEG_SIM_MAX).
    Gap-level output so the driver hashes every cohesion score and both
    context values, not just the cut count.

    Scale shape: the lead-token intersection and the valley context ride
    consecutive windows on the SAME conv_id key and turn order (one
    Exchange, shared sort); nothing shuffles on anything but conv_id and
    nothing is quadratic in conversation length."""
    t = _turns(spark, sf)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    toks = t.select(
        "conv_id",
        "turn_idx",
        F.array_distinct(F.split("turn_text", " ")).alias("tk"),
    )
    gaps = toks.select(
        "conv_id",
        "turn_idx",
        F.size(F.array_intersect("tk", F.lead("tk").over(w))).alias("sim"),
    ).filter(F.col("sim").isNotNull())
    w2 = Window.partitionBy("conv_id").orderBy("gap_idx")
    ctx = gaps.select(
        "conv_id", F.col("turn_idx").alias("gap_idx"), "sim"
    ).select(
        "*",
        F.lag("sim").over(w2).alias("prev_sim"),
        F.lead("sim").over(w2).alias("next_sim"),
    )
    out = ctx.withColumn(
        "is_boundary",
        (
            (F.col("sim") < F.coalesce("prev_sim", F.lit(99)))
            & (F.col("sim") < F.coalesce("next_sim", F.lit(99)))
            & (F.col("sim") <= SEG_SIM_MAX)
        ).cast("int"),
    )
    return ordered(out, "conv_id", "gap_idx")


def transcript_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """The multi-turn flagship COMPOSITION: the convo signals chained into
    one conversation-level curation funnel with cumulative survivor counts —
    raw -> role-valid (role_sequence_audit rule) -> containment-deduped
    (conv_prefix_containment rule: drop contained/duplicate conversations,
    keep canonicals) -> in-budget (context_budget rule: never truncated).
    This is what a transcript pipeline actually ships: hygiene, then
    retry/resume dedup, then capacity fit, audited per stage.

    Composition shape: the resolved turns frame is localCheckpointed ONCE
    and every per-conversation flag derives from it (one lag window, one
    hash-chain aggregation + equi join, one cumulative window — each keyed
    by conv_id); the flags meet in two equi joins on conv_id and collapse
    in ONE global aggregation of cumulative conjunctions.  No stage
    re-evaluates the turn resolution; nothing shuffles on anything but
    conv_id or a true-duplicate hash chain."""
    t = _turns(spark, sf).localCheckpoint()
    valid = _bad_turns(t).groupBy("conv_id").agg(
        (F.sum("bad") == 0).cast("long").alias("v")
    )
    contained = (
        _containment_hits(_seqs(t))
        .select("conv_id")
        .distinct()
        .withColumn("contained", F.lit(True))
    )
    fit = _budget_staged(t).groupBy("conv_id").agg(
        (F.sum(F.when(F.col("kept") == 0, 1).otherwise(0)) == 0)
        .cast("long")
        .alias("f")
    )
    per = (
        valid.join(contained, "conv_id", "left")
        .join(fit, "conv_id")
        .select(
            "v",
            (~F.coalesce("contained", F.lit(False))).cast("long").alias("canon"),
            "f",
        )
    )
    agg = per.agg(
        F.count("*").alias("s0"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("canon")).alias("s2"),
        F.sum(F.col("v") * F.col("canon") * F.col("f")).alias("s3"),
    )
    out = agg.select(
        F.expr(
            "stack(4, 0, 'raw', s0, 1, 'role_valid', s1,"
            " 2, 'containment_dedup', s2, 3, 'in_budget', s3)"
        ).alias("stage_idx", "stage", "n_convs")
    )
    return ordered(out, "stage_idx")


# --- secret_scan: credential / PII scrubbing over turn payloads ------------
# Which secret class a turn's payload carries is chosen by the content-hash
# bucket, so the scanner must actually MATCH the planted strings, not infer
# from metadata; the email overlay is independent of the class so some turns
# carry two secrets at once.
SECRET_MOD = 4  # bucket % SECRET_MOD picks the class (0 key / 1 bearer /
#                 2 ip / 3 none)
EMAIL_EVERY = 7  # bucket % EMAIL_EVERY == 0 additionally plants an email
# detection patterns, restricted to the Java-regex / RE2 common subset so
# the DuckDB oracle can apply the IDENTICAL pattern text
AKIA_RE = r"AKIA[0-9A-Z]{16}"
BEARER_RE = r"Bearer [0-9A-Za-z_\-]{16,}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def secret_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Turn-level credential scrubbing — the security rung an
    agent-transcript pipeline runs before any text is kept: tool outputs
    routinely leak AWS-style access keys, Authorization bearer tokens,
    internal IPv4 addresses, and contact emails, and every corpus policy
    (CCNet/Dolma-style PII scrubbing, extended to credentials for agent
    logs) requires them detected and redacted.  Per turn: a deterministic
    payload (turn text + the bucket-planted secrets), regex match counts
    per class, and the post-redaction length — counts AND redaction both
    hash-checked against an oracle that re-plants and re-scans
    independently.

    Scale shape: one narrow projection over the resolved turns frame —
    synthesis, four regexp_counts, and the redaction chain are all
    whole-stage-codegen'd string ops; zero shuffles beyond _turns' doc
    resolution join.  At 100 TB this runs at scan speed."""
    from .corpus import EMAIL_RE

    t = _turns(spark, sf)
    m = F.col("bucket") % SECRET_MOD
    sk = F.md5(F.concat_ws(":", "turn_text", F.lit("sk")))
    planted = (
        F.when(m == 0, F.concat(F.lit(" key=AKIA"), F.upper(F.substring(sk, 1, 16))))
        .when(
            m == 1,
            F.concat(F.lit(" Authorization: Bearer "), F.substring(sk, 1, 24)),
        )
        .when(
            m == 2,
            F.concat(
                F.lit(" from 10."),
                (F.col("bucket") % 200).cast("string"),
                F.lit(".0."),
                (F.col("turn_idx") + 1).cast("string"),
            ),
        )
        .otherwise(F.lit(""))
    )
    email = F.when(
        F.col("bucket") % EMAIL_EVERY == 0,
        F.concat(
            F.lit(" contact ops"), F.col("conv_id").cast("string"), F.lit("@example.com")
        ),
    ).otherwise(F.lit(""))
    staged = t.select(
        "conv_id",
        "turn_idx",
        F.concat(F.col("turn_text"), planted, email).alias("payload"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("payload"), BEARER_RE, "Bearer <TOKEN>"),
                AKIA_RE,
                "<AWS_KEY>",
            ),
            IPV4_RE,
            "<IP>",
        ),
        EMAIL_RE,
        "<EMAIL>",
    )
    out = staged.select(
        "conv_id",
        "turn_idx",
        F.regexp_count("payload", F.lit(AKIA_RE)).alias("n_awskey"),
        F.regexp_count("payload", F.lit(BEARER_RE)).alias("n_bearer"),
        F.regexp_count("payload", F.lit(IPV4_RE)).alias("n_ipv4"),
        F.regexp_count("payload", F.lit(EMAIL_RE)).alias("n_email"),
        F.length(redacted).alias("redacted_len"),
    )
    return ordered(out, "conv_id", "turn_idx")


# --- continuation_stitch: mid-conversation truncation repair ---------------
TRUNC_MOD = 3  # assistant turns with bucket % TRUNC_MOD == 0 are truncated
TRUNC_MIN_WORDS = 3  # truncated turns keep bucket % TRUNC_WORDS_MOD +
TRUNC_WORDS_MOD = 5  # TRUNC_MIN_WORDS words


def _stitch_overlay(t: DataFrame) -> DataFrame:
    """The truncation overlay shared by ``continuation_stitch`` (audit) and
    ``conv_stitch_apply`` (transform): bucket-chosen assistant turns are cut
    short and the user turn right after each becomes the literal
    ``continue``.  Returns (conv_id, turn_idx, role, txt2); the synthesis
    lag rides the same conv_id sort every consumer reuses."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    src = (F.col("role") == "assistant") & (F.col("bucket") % TRUNC_MOD == 0)
    ncut = (F.col("bucket") % TRUNC_WORDS_MOD + TRUNC_MIN_WORDS).cast("int")
    txt1 = F.when(
        src, F.array_join(F.slice(F.split("turn_text", " "), F.lit(1), ncut), " ")
    ).otherwise(F.col("turn_text"))
    staged = t.select(
        "conv_id", "turn_idx", "role", txt1.alias("txt1"), src.alias("src")
    )
    txt2 = F.when(
        (F.col("role") == "user")
        & F.coalesce(F.lag("src").over(w), F.lit(False)),
        F.lit("continue"),
    ).otherwise(F.col("txt1"))
    return staged.select("conv_id", "turn_idx", "role", txt2.alias("txt2"))


def continuation_stitch(spark: SparkSession, sf: str) -> DataFrame:
    """Truncation / continuation repair — the transcript-hygiene rung that
    detects assistant turns cut off mid-generation (the next user turn is a
    bare continuation request) and STITCHES the split generation back into
    one logical message, purely from content (session ids are not stable
    across retries, so a corpus pipeline cannot rely on lineage).  The
    synthetic overlay truncates bucket-chosen assistant turns and replaces
    the following user turn with the literal ``continue``; detection then
    re-finds them from the text alone.  Per conversation: turn count,
    continuation-request count, stitchable count (a following assistant
    turn exists to merge), and the total stitched-message length.

    Scale shape: the synthesis lag and the detection leads ride ONE
    conv_id sort (same key and order), then one keyed aggregation —
    per-conversation cost is its turn rows, nothing quadratic."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ov = _stitch_overlay(_turns(spark, sf)).select("conv_id", "turn_idx", "txt2")
    is_cont = F.col("txt2") == "continue"
    det = ov.select(
        "conv_id",
        "txt2",
        is_cont.cast("int").alias("is_cont"),
        F.coalesce(F.lead(is_cont).over(w), F.lit(False)).alias("truncated"),
        F.lead("txt2", 2).over(w).alias("after"),
    )
    stitched = F.col("truncated") & F.col("after").isNotNull()
    out = det.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("is_cont").cast("long").alias("n_continue"),
        F.sum(stitched.cast("int")).cast("long").alias("n_stitched"),
        F.coalesce(
            F.sum(F.when(stitched, F.length(F.concat_ws(" ", "txt2", "after")))),
            F.lit(0),
        )
        .cast("long")
        .alias("stitched_chars"),
    )
    return ordered(out, "conv_id")


def _stitch_groups(ov: DataFrame) -> DataFrame:
    """The repair core over an overlay frame (conv_id, turn_idx, role,
    txt2): group turns into logical messages (a turn opens a new message
    unless it is a continuation request or the turn right after one),
    drop the requests, merge each group's surviving texts in turn order,
    renumber.  Split out so chain stitching (a continuation that is
    itself truncated and continued again) is unit-testable on hand-built
    conversations longer than the synthetic corpus's 4-turn cap."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    is_cont = F.col("txt2") == "continue"
    fl = ov.select(
        "conv_id",
        "turn_idx",
        "role",
        "txt2",
        is_cont.alias("is_cont"),
        F.coalesce(F.lag(is_cont).over(w), F.lit(False)).alias("post_cont"),
    )
    grp = fl.select(
        "*",
        F.sum(
            F.when(F.col("is_cont") | F.col("post_cont"), 0).otherwise(1)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("g"),
    )
    members = grp.groupBy("conv_id", "g").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "is_cont", "role", "txt2"))
        ).alias("ms")
    )
    kept = F.filter("ms", lambda m: ~m["is_cont"])
    merged = members.select(
        "conv_id",
        "g",
        F.element_at("ms", 1)["role"].alias("role"),
        F.size(kept).cast("int").alias("n_merged"),
        F.array_join(F.transform(kept, lambda m: m["txt2"]), " ").alias("text"),
    )
    return merged.select(
        "conv_id",
        F.row_number()
        .over(Window.partitionBy("conv_id").orderBy("g"))
        .alias("new_idx"),
        "role",
        "n_merged",
        "text",
    )


def conv_stitch_apply(spark: SparkSession, sf: str) -> DataFrame:
    """The TRANSFORM counterpart of ``continuation_stitch``: actually
    repair the conversation — drop each bare ``continue`` request, merge
    every truncated generation with its regenerated continuation(s) into
    one logical message, and renumber the surviving turns.  Chains stitch
    correctly (a continuation that is itself truncated and continued again
    collapses into the same message): a turn opens a new logical message
    unless it is a continuation request or the turn right after one, so a
    running sum of the opens yields the message group — the sessionization
    idiom applied to log repair.  One row per repaired message: new index,
    role of the opening turn, merged-part count, and the merged text
    itself (driver-hashed, so the merge order and joins are pinned).

    Scale shape: the overlay lag, the grouping lag, and the running sum
    ride ONE conv_id sort; the merge is a keyed aggregation whose ordered
    reduction is the array_sort(collect_list(struct)) idiom
    (``ordered_agg_lineitems``) — per-conversation cost is its turn rows,
    nothing quadratic, no self-join back to the turn grid."""
    out = _stitch_groups(_stitch_overlay(_turns(spark, sf)))
    return ordered(out, "conv_id", "new_idx")


# --- round-5 additions: credit assignment + tool-use transitions ----------

CREDIT_BASE = 100  # terminal-reward floor (reward = base + last-turn bucket)
TOOL_NAMES = ("search", "code", "browse", "none", "none")  # bucket % 5 map


def turn_credit_decay(spark: SparkSession, sf: str) -> DataFrame:
    """RL-style credit assignment over agent transcripts: each conversation
    earns a deterministic terminal reward (CREDIT_BASE + the final turn's
    content-hash bucket — the stand-in for a real grader's score), and every
    turn receives the reward halved once per step of distance from the end:
    ``credit = reward div 2^(n_turns - 1 - turn_idx)`` — exact integer
    right-shift, so the per-turn training weights a reward-weighted SFT /
    RLHF pipeline consumes are bit-reproducible.

    Scale shape: the terminal reward distributes over the conversation via
    ONE bounded window on the conv_id key (max of a last-turn-only CASE —
    no join back); the decay is a narrow integer projection.  Per-conv cost
    = its turn rows."""
    t = _turns(spark, sf)
    staged = t.select(
        "conv_id",
        "turn_idx",
        "role",
        "bucket",
        (F.lit(CONV_MIN_TURNS) + F.col("conv_id") % 3).cast("int").alias("nt"),
    )
    w = Window.partitionBy("conv_id")
    reward = F.max(
        F.when(F.col("turn_idx") == F.col("nt") - 1, F.lit(CREDIT_BASE) + F.col("bucket"))
    ).over(w)
    s2 = staged.select(
        "conv_id", "turn_idx", "role", "nt", reward.cast("long").alias("reward")
    )
    out = s2.select(
        "conv_id",
        "turn_idx",
        "role",
        "reward",
        F.expr("reward div shiftleft(1, nt - 1 - turn_idx)")
        .cast("long")
        .alias("credit"),
    )
    return ordered(out, "conv_id", "turn_idx")


def tool_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Tool-use transition matrix over agent transcripts: which tool tends
    to follow which across consecutive turns — the corpus-level signal an
    agent-training pipeline reads to spot degenerate loops (search->search
    chains) and to stratify sampling by tool mix.  The per-turn tool label
    derives from the content-hash bucket (mod 5 over TOOL_NAMES, 'none'
    weighted double) so both engines must classify identically; a real
    corpus supplies its logged tool field.

    Scale shape: one bounded lag window on the conv_id key forms the
    consecutive pairs, then ONE keyed aggregation on the (from, to) label
    pair — output is alphabet^2-bounded regardless of corpus size."""
    t = _turns(spark, sf)
    lab = t.select(
        "conv_id",
        "turn_idx",
        F.element_at(
            F.array(*[F.lit(x) for x in TOOL_NAMES]), (F.col("bucket") % 5 + 1).cast("int")
        ).alias("tool"),
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = lab.select(
        "conv_id",
        F.lag("tool").over(w).alias("tool_from"),
        F.col("tool").alias("tool_to"),
    ).filter(F.col("tool_from").isNotNull())
    out = pairs.groupBy("tool_from", "tool_to").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("conv_id").alias("n_convs"),
    )
    return ordered(out, "tool_from", "tool_to")
