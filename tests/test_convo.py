"""Semantic tests for the multi-turn agent-transcript curation operators
(operators/convo.py) beyond the generic DuckDB parity harness: the
construction-level phenomena the operators exist to find (resumes are
contained, edited retries fork, retried turns duplicate across
conversations) and the plan shapes their 100-TB posture claims."""

import re

import pytest
from pyspark.sql import functions as F

from ocr_mini_service_spark.operators import convo
from ocr_mini_service_spark.plans import formatted_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def turns(spark):
    return convo._turns(spark, SF).toPandas()


def _n(c: int) -> int:
    return convo.CONV_MIN_TURNS + c % 3


def test_construction_lengths_and_density(turns):
    g = turns.groupby("conv_id")["turn_idx"].agg(["count", "min", "max"])
    for conv, row in g.iterrows():
        assert row["min"] == 0 and row["max"] == row["count"] - 1, conv
        assert row["count"] == _n(conv), conv


def test_pure_resume_replays_predecessor_prefix(turns):
    """Every c%10==4 conversation's first min(n(c), n(c-1)) turns equal its
    predecessor's — the containment signal is real, not hash luck."""
    by = {
        (r.conv_id, r.turn_idx): r.turn_text
        for r in turns.itertuples()
    }
    checked = 0
    for c in sorted(turns["conv_id"].unique()):
        if c % 10 != 4 or c == 0:
            continue
        for t in range(min(_n(c), _n(c - 1))):
            if (c - 1, t) in by and (c, t) in by:
                assert by[(c, t)] == by[(c - 1, t)], (c, t)
                checked += 1
    assert checked > 0


def test_edited_retry_regenerates_only_last_turn(turns):
    by = {(r.conv_id, r.turn_idx): r.turn_text for r in turns.itertuples()}
    forked = 0
    for c in sorted(turns["conv_id"].unique()):
        if c % 10 != 9:
            continue
        last = _n(c) - 1
        for t in range(last):
            if (c - 1, t) in by:
                assert by[(c, t)] == by[(c - 1, t)], (c, t)
        # the regenerated last turn diverges from the predecessor's turn at
        # the same index whenever the predecessor has one
        if (c - 1, last) in by and by[(c, last)] != by[(c - 1, last)]:
            forked += 1
    assert forked > 0


def test_containment_finds_every_pure_resume_pair(spark, turns):
    """Independent expectation: for each pure-resume pair (c-1, c), the
    shorter conversation must be reported contained (ties: larger conv_id)."""
    out = {
        r.conv_id: r
        for r in convo.conv_prefix_containment(spark, SF).collect()
    }
    expected = set()
    convs = set(turns["conv_id"].unique())
    for c in sorted(convs):
        if c % 10 != 4 or c == 0 or (c - 1) not in convs:
            continue
        na, nb = _n(c - 1), _n(c)
        if na < nb:
            expected.add(c - 1)
        elif nb < na:
            expected.add(c)
        else:
            expected.add(c)  # exact dup: canonical keeper is min conv_id
    for c in expected:
        assert c in out, f"conv {c} not reported contained"
        assert out[c].n_containers >= 1
    # exact_dup flags appear exactly for equal-length resumes
    eq = {c for c in expected if _n(c) == _n(c - 1)}
    for c in eq:
        assert out[c].exact_dup == 1, c


def test_containment_exact_dup_tiebreak(spark):
    """The synthetic corpus never produces equal-length resumes (n(c) and
    n(c-1) always differ mod 3), so the exact_dup=1 path is exercised
    directly: two identical chains must report ONLY the larger conv_id as
    contained, flagged exact, with the smaller id as container."""
    h = "a" * 32
    seqs = spark.createDataFrame(
        [(7, h + h, 2), (3, h + h, 2), (9, h, 1)],
        "conv_id long, seq string, n_turns int",
    )
    hits = convo._containment_hits(seqs).collect()
    # conv 9 (single-turn prefix of both) + conv 7 (exact dup of 3)
    by = {(r.conv_id, r.container) for r in hits}
    assert (7, 3) in by, hits
    assert not any(c == 3 for c, _ in by), hits  # canonical keeper survives
    exact = [r for r in hits if r.conv_id == 7]
    assert len(exact) == 1 and exact[0].nb == exact[0].n_turns
    # 9 is contained by both 3 and 7 as a proper prefix
    assert {(9, 3), (9, 7)} <= by


def test_fork_points_single_turn_conversation_guard(spark):
    """A 1-turn conversation must contribute no depths (Spark's
    sequence(1, 0) is DESCENDING, which unguarded aborts element_at under
    ANSI mode and diverges from DuckDB's empty generate_series(1, 0))."""
    t = spark.createDataFrame(
        [(1, 0, "only turn"), (2, 0, "shared"), (2, 1, "left"),
         (3, 0, "shared"), (3, 1, "right")],
        "conv_id long, turn_idx int, turn_text string",
    )
    rows = {r.depth: r for r in convo._fork_depths(t).collect()}
    assert list(rows) == [1]  # no depth rows from conv 1
    assert rows[1].n_shared_prefixes == 1 and rows[1].n_forks == 1


def test_fork_points_nonempty_and_bounded(spark):
    rows = convo.conv_fork_points(spark, SF).collect()
    assert rows, "no fork depths at all"
    total_forks = sum(r.n_forks for r in rows)
    assert total_forks > 0, "edited retries must fork at least once"
    for r in rows:
        assert 1 <= r.depth <= convo.TURNS_PER_CONV - 1
        assert r.n_forks <= r.n_shared_prefixes


def test_turn_dedup_catches_retried_turns(spark, turns):
    out = convo.turn_dedup_xconv(spark, SF).collect()
    assert out
    # every reported key really does span >=2 conversations, counted from
    # the raw frame
    counts = turns.groupby("turn_text")["conv_id"].nunique()
    dup_texts = set(counts[counts >= 2].index)
    assert len(out) == len(dup_texts)
    for r in out:
        assert r.n_convs >= 2
        assert r.n_turns >= r.n_convs


def test_context_budget_invariants(spark):
    for r in convo.context_budget(spark, SF).collect():
        assert 0 <= r.n_kept <= r.n_turns
        assert 0 <= r.kept_chars <= r.total_chars
        assert r.truncated == (1 if r.n_kept < r.n_turns else 0)


def test_tool_turn_stats_identities(spark):
    for r in convo.tool_turn_stats(spark, SF).collect():
        assert r.n_valid + r.n_malformed == r.n_tool
        assert r.n_tool <= r.n_turns
        assert r.n_codes % 2 == 0  # valid payloads carry exactly 2 codes


def test_echo_bounds(spark):
    for r in convo.assistant_echo(spark, SF).collect():
        assert 0 <= r.n_echo <= r.n_distinct
        assert 0 <= r.echo_bp <= 10000


def test_latency_gap_range(spark):
    """Construction pins gaps to [1, 119] (60 +/- jitter<60, never 0)."""
    for r in convo.reply_latency(spark, SF).collect():
        assert r.n_gaps == _n(r.conv_id) - 1
        assert 1 <= r.max_gap_s <= 119
        assert r.n_long_gaps <= r.n_gaps


# ---------------------------------------------------------------- plans ----


def test_turn_dedup_is_aggregation_not_window(spark):
    plan = formatted_plan(convo.turn_dedup_xconv(spark, SF))
    assert "Window" not in plan, plan  # line_dedup keeper principle


def test_convo_windows_are_conv_partitioned(spark):
    """Every window in the per-turn operators is keyed by conv_id — never a
    global (unpartitioned) window that would serialize the corpus."""
    for q in (convo.context_budget, convo.assistant_echo, convo.reply_latency,
              convo.role_sequence_audit):
        plan = formatted_plan(q(spark, SF))
        for m in re.finditer(r"\(\d+\) Window\b.*?\n(.*?)\n\n", plan, re.S):
            assert "conv_id" in m.group(1), (q.__name__, m.group(1))


def test_containment_join_is_equi_keyed(spark):
    """The containment join must be a hash/merge EQUI join on the full-hash
    chain — never BroadcastNestedLoop/Cartesian (the quadratic shape)."""
    plan = formatted_plan(convo.conv_prefix_containment(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_transcript_funnel_monotone_and_consistent(spark):
    rows = {r.stage: r.n_convs for r in convo.transcript_funnel(spark, SF).collect()}
    assert list(rows) == ["raw", "role_valid", "containment_dedup", "in_budget"]
    vals = list(rows.values())
    assert vals == sorted(vals, reverse=True)
    assert rows["raw"] > 0
    # cross-check the two gates against the standalone operators
    audit = convo.role_sequence_audit(spark, SF).collect()
    assert rows["raw"] == len(audit)
    assert rows["role_valid"] == sum(r.valid for r in audit)


def test_transcript_funnel_no_cartesian(spark):
    plan = formatted_plan(convo.transcript_funnel(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
