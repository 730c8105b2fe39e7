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


def test_preference_pairs_match_independent_reconstruction(spark, turns):
    """Full independent pandas re-derivation of the fork-group min/max
    semantics: one pair per (depth, prefix) group, rejected = first
    attempt's continuation, chosen = last attempt's, only when they
    differ."""
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    chains = {}
    for c, g in turns.sort_values("turn_idx").groupby("conv_id"):
        chains[c] = list(g["turn_text"])
    groups = {}
    for c, ts in chains.items():
        for d in range(1, len(ts)):
            key = (d, md5("".join(md5(x) for x in ts[:d])))
            groups.setdefault(key, []).append((c, ts[d]))
    expected = {}
    for (d, pk), members in groups.items():
        if len(members) < 2:
            continue
        members.sort()
        (rc, rt), (cc, ct) = members[0], members[-1]
        if ct != rt:
            expected[(d, pk)] = (cc, rc, ct, rt)
    got = {
        (r.depth, r.prefix_key): (
            r.chosen_conv, r.rejected_conv, r.chosen_text, r.rejected_text
        )
        for r in convo.fork_preference_pairs(spark, SF).collect()
    }
    assert got == expected
    assert expected, "construction must yield at least one preference pair"
    # at least one pair comes from a genuine edited retry (c % 10 == 9)
    assert any(cc % 10 == 9 for cc, _, _, _ in expected.values())


def test_preference_stats_aggregate_pairs(spark):
    pairs = convo.fork_preference_pairs(spark, SF).collect()
    stats = {r.depth: r for r in convo.preference_pair_stats(spark, SF).collect()}
    by_depth = {}
    for p in pairs:
        d = by_depth.setdefault(p.depth, [0, 0, 0, 0])
        d[0] += 1
        d[1] += len(p.chosen_text) > len(p.rejected_text)
        d[2] += len(p.chosen_text) < len(p.rejected_text)
        d[3] += len(p.chosen_text) - len(p.rejected_text)
    assert set(stats) == set(by_depth)
    for d, (n, cl, rl, m) in by_depth.items():
        r = stats[d]
        assert (r.n_pairs, r.n_chosen_longer, r.n_rejected_longer,
                r.sum_margin_chars) == (n, cl, rl, m)


def test_sft_pack_invariants(spark, turns):
    rows = convo.sft_pack_conversations(spark, SF).collect()
    n_lens = {c: len(g) for c, g in turns.groupby("conv_id")}
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
        assert r.stream == r.conv_id % convo.PACK_STREAMS
        assert r.mask == (1 if r.role == "assistant" else 0)
    # a conversation is never split across samples and keeps all its turns
    for c, rs in by_conv.items():
        assert len(rs) == n_lens[c]
        assert len({(r.stream, r.sample_id) for r in rs}) == 1
        rs.sort(key=lambda r: r.turn_idx)
        for a, b in zip(rs, rs[1:]):
            assert b.start_off == a.end_off + 1  # one '\n' separator char
    # conversations sit end-to-end inside a sample; first starts at 0; a
    # conversation only STARTS inside the budget (greedy overflow-by-tail)
    by_sample = {}
    for r in rows:
        by_sample.setdefault((r.stream, r.sample_id), []).append(r)
    for (_, _), rs in by_sample.items():
        rs.sort(key=lambda r: (r.conv_id, r.turn_idx))
        assert rs[0].start_off == 0
        prev_end = None
        for c in sorted({r.conv_id for r in rs}):
            cr = [r for r in rs if r.conv_id == c]
            assert cr[0].start_off < convo.SFT_BUDGET_CHARS
            if prev_end is not None:
                assert cr[0].start_off == prev_end  # end-to-end, no gap
            prev_end = cr[-1].end_off


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


def test_preference_pairs_no_product_join(spark):
    plan = formatted_plan(convo.fork_preference_pairs(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan  # min_by/max_by aggregation, no window


def test_sft_pack_windows_are_keyed(spark):
    """Every packing window is keyed (conv_id / stream) — never a global
    single-partition window that would serialize the corpus."""
    plan = formatted_plan(convo.sft_pack_conversations(spark, SF))
    for m in re.finditer(r"\(\d+\) Window\b.*?\n(.*?)\n\n", plan, re.S):
        assert "conv_id" in m.group(1) or "stream" in m.group(1), m.group(1)


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


def test_conv_decontaminate_flags_test_sourced_turns(spark, turns):
    """A turn whose resolved source document is test-split and long enough to
    shingle (min(len(words), TURN_WORDS) >= DECON_N) is leaky by construction:
    turn_text is the first TURN_WORDS normalized words of that document, so
    every turn gram is also a document gram in the bench set.  The verdict
    must flag every such conversation."""
    from ocr_mini_service_spark.operators.corpus import DECON_N, _split_expr
    from ocr_mini_service_spark.sources import load

    out = {r.conv_id: r for r in convo.conv_decontaminate(spark, SF).collect()}
    docs = (
        load(spark, SF, "documents")
        .select(
            "doc_id",
            _split_expr().alias("split"),
            F.size(F.split(F.trim("text"), r"\s+")).alias("nw"),
        )
        .collect()
    )
    meta = {r.doc_id: r for r in docs}
    forced = set()
    for r in turns.itertuples():
        is_retry = r.conv_id % 5 == 4
        own_last = r.conv_id % 10 == 9 and r.turn_idx == _n(r.conv_id) - 1
        src = (
            (r.conv_id - 1) * convo.TURNS_PER_CONV + r.turn_idx
            if is_retry and not own_last
            else r.conv_id * convo.TURNS_PER_CONV + r.turn_idx
        )
        m = meta[src]
        if m.split == "test" and min(m.nw, convo.TURN_WORDS) >= DECON_N:
            forced.add(r.conv_id)
    assert forced, "fixture should contain at least one test-sourced turn"
    for conv_id in forced:
        assert out[conv_id].n_leaky_turns >= 1, conv_id
        assert out[conv_id].keep == 0, conv_id
    for r in out.values():
        assert (r.keep == 0) == (r.n_leaky_turns > 0)
        assert 0 <= r.n_leaky_turns <= r.n_turns


def test_conv_decontaminate_membership_is_broadcast(spark):
    """The bench-gram membership test must be a broadcast LeftSemi (the
    benchmark side is fixed-size) — never a shuffled join of the turn grams."""
    plan = formatted_plan(convo.conv_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_topic_segments_valley_rule_replicates(spark, turns):
    """The TextTiling valley rule re-derived independently in pandas from
    the turn texts: every cohesion score is the distinct-token
    intersection size of the adjacent pair, and boundaries are exactly
    the weak strict local minima.  Both classes occur."""
    df = (
        convo.conv_topic_segments(spark, SF)
        .toPandas()
        .sort_values(["conv_id", "gap_idx"])
        .reset_index(drop=True)
    )
    toks = {
        (r.conv_id, r.turn_idx): set(r.turn_text.split(" "))
        for r in turns.itertuples()
    }
    for r in df.itertuples():
        want = len(toks[(r.conv_id, r.gap_idx)] & toks[(r.conv_id, r.gap_idx + 1)])
        assert r.sim == want, (r.conv_id, r.gap_idx)
    for conv, g in df.groupby("conv_id"):
        sims = g["sim"].tolist()
        for j, row in enumerate(g.itertuples()):
            prev = sims[j - 1] if j > 0 else 99
            nxt = sims[j + 1] if j + 1 < len(sims) else 99
            want_b = int(
                sims[j] < prev and sims[j] < nxt and sims[j] <= convo.SEG_SIM_MAX
            )
            assert row.is_boundary == want_b, (conv, row.gap_idx)
    assert df["is_boundary"].nunique() == 2, "rule is vacuous on the corpus"


def test_topic_segments_single_sort_no_extra_join(spark):
    """Both window passes (lead-token intersection, valley context) share
    the conv_id sort (2 Window nodes, one data sort + the presentation
    sort); the only join is _turns' own broadcast document resolution —
    the segmentation itself never joins and nothing is cartesian."""
    plan = formatted_plan(convo.conv_topic_segments(spark, SF))
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", plan)
    assert joins == ["BroadcastHashJoin"], plan
    assert "CartesianProduct" not in plan, plan
    assert len(re.findall(r"\(\d+\) Sort", plan)) <= 2, plan


def test_secret_scan_replicates_and_scrubs(spark, turns):
    """The planted-secret arithmetic, the four match counts, and the
    redaction re-derived independently with hashlib + Python re (a third
    regex engine beside Java and RE2 — the patterns live in the common
    subset).  Scrubbing is complete: no pattern matches the redacted
    payload.  All four secret classes occur on the corpus."""
    import hashlib

    from ocr_mini_service_spark.operators.corpus import EMAIL_RE

    df = (
        convo.secret_scan(spark, SF)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    t = turns.set_index(["conv_id", "turn_idx"])
    pats = [convo.AKIA_RE, convo.BEARER_RE, convo.IPV4_RE, EMAIL_RE]
    classes = set()
    for r in df.itertuples():
        row = t.loc[(r.conv_id, r.turn_idx)]
        b = int(row["bucket"])
        sk = hashlib.md5((row["turn_text"] + ":sk").encode()).hexdigest()
        m = b % convo.SECRET_MOD
        p = row["turn_text"]
        if m == 0:
            p += " key=AKIA" + sk[:16].upper()
        elif m == 1:
            p += " Authorization: Bearer " + sk[:24]
        elif m == 2:
            p += f" from 10.{b % 200}.0.{r.turn_idx + 1}"
        if b % convo.EMAIL_EVERY == 0:
            p += f" contact ops{r.conv_id}@example.com"
        want = [len(re.findall(pat, p)) for pat in pats]
        got = [r.n_awskey, r.n_bearer, r.n_ipv4, r.n_email]
        assert got == want, (r.conv_id, r.turn_idx)
        red = re.sub(convo.BEARER_RE, "Bearer <TOKEN>", p)
        red = re.sub(convo.AKIA_RE, "<AWS_KEY>", red)
        red = re.sub(convo.IPV4_RE, "<IP>", red)
        red = re.sub(EMAIL_RE, "<EMAIL>", red)
        assert r.redacted_len == len(red), (r.conv_id, r.turn_idx)
        for pat in pats:
            assert not re.search(pat, red), (r.conv_id, r.turn_idx, pat)
        classes.add(m)
    assert classes == set(range(convo.SECRET_MOD)), "a secret class never occurs"


def test_secret_scan_scan_speed_shape(spark):
    """Synthesis + scan + redaction are one codegen'd projection: the only
    join is _turns' broadcast doc resolution, and no sort beyond the
    presentation device."""
    plan = formatted_plan(convo.secret_scan(spark, SF))
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", plan)
    assert joins == ["BroadcastHashJoin"], plan
    assert "CartesianProduct" not in plan, plan
    assert len(re.findall(r"\(\d+\) Sort", plan)) <= 1, plan


def test_continuation_stitch_replicates(spark, turns):
    """The truncation overlay, the content-only detection rule, and the
    stitch accounting re-derived serially per conversation in pandas; both
    a stitched pair and an unstitchable trailing 'continue' occur."""
    df = convo.continuation_stitch(spark, SF).toPandas().set_index("conv_id")
    some_stitched = some_unstitchable = False
    for conv, g in turns.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        txt = []
        prev_src = False
        for r in g.itertuples():
            src = r.role == "assistant" and r.bucket % convo.TRUNC_MOD == 0
            keep = r.bucket % convo.TRUNC_WORDS_MOD + convo.TRUNC_MIN_WORDS
            t1 = " ".join(r.turn_text.split(" ")[:keep]) if src else r.turn_text
            txt.append("continue" if (r.role == "user" and prev_src) else t1)
            prev_src = src
        n_cont = sum(x == "continue" for x in txt)
        n_st = chars = n_trunc = 0
        for j in range(len(txt)):
            if j + 1 < len(txt) and txt[j + 1] == "continue":
                n_trunc += 1
                if j + 2 < len(txt):
                    n_st += 1
                    chars += len(txt[j] + " " + txt[j + 2])
        row = df.loc[conv]
        assert row["n_turns"] == len(txt), conv
        assert row["n_continue"] == n_cont, conv
        assert row["n_stitched"] == n_st, conv
        assert row["stitched_chars"] == chars, conv
        some_stitched = some_stitched or n_st > 0
        some_unstitchable = some_unstitchable or n_trunc > n_st
    assert some_stitched and some_unstitchable


def test_continuation_stitch_single_sort_shape(spark):
    """The synthesis lag window and both detection lead windows share one
    conv_id sort, and the final per-conversation aggregation reuses the
    window partitioning — one BroadcastHashJoin, no cartesian, at most the
    shared window sort plus the presentation sort."""
    plan = formatted_plan(convo.continuation_stitch(spark, SF))
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", plan)
    assert joins == ["BroadcastHashJoin"], plan
    assert "CartesianProduct" not in plan, plan
    assert len(re.findall(r"\(\d+\) Sort", plan)) <= 2, plan


def test_stitch_apply_replicates(spark, turns):
    """The repaired-conversation output re-derived serially per
    conversation in pandas: 'continue' turns drop, truncated generations
    merge with their continuations, indices renumber, roles come from the
    opening turn.  Merged (n_merged=2) and unstitchable (a trailing
    'continue' whose group keeps only the truncated text) both occur."""
    df = (
        convo.conv_stitch_apply(spark, SF)
        .toPandas()
        .sort_values(["conv_id", "new_idx"])
        .reset_index(drop=True)
    )
    got = {c: g for c, g in df.groupby("conv_id")}
    saw_merge = False
    for conv, g in turns.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        rows = []
        prev_src = False
        for r in g.itertuples():
            src = r.role == "assistant" and r.bucket % convo.TRUNC_MOD == 0
            keep = r.bucket % convo.TRUNC_WORDS_MOD + convo.TRUNC_MIN_WORDS
            t1 = " ".join(r.turn_text.split(" ")[:keep]) if src else r.turn_text
            t2 = "continue" if (r.role == "user" and prev_src) else t1
            rows.append((r.role, t2))
            prev_src = src
        msgs = []
        prev_cont = False
        for role, t2 in rows:
            cont = t2 == "continue"
            if not (cont or prev_cont) or not msgs:
                msgs.append({"role": role, "parts": []})
            if not cont:
                msgs[-1]["parts"].append(t2)
            prev_cont = cont
        want = [
            (i + 1, m["role"], len(m["parts"]), " ".join(m["parts"]))
            for i, m in enumerate(msgs)
        ]
        have = [
            (r.new_idx, r.role, r.n_merged, r.text) for r in got[conv].itertuples()
        ]
        assert have == want, conv
        saw_merge = saw_merge or any(m[2] >= 2 for m in want)
    assert saw_merge


def test_stitch_apply_chain_merges_into_one_message(spark):
    """A continuation that is itself truncated and continued again (5-turn
    chain — longer than the synthetic corpus's 4-turn cap, so exercised on
    a hand-built conversation): all three assistant fragments collapse
    into ONE message and the bare requests vanish."""
    ov = spark.createDataFrame(
        [
            ("c0", 0, "user", "ask"),
            ("c0", 1, "assistant", "part one"),
            ("c0", 2, "user", "continue"),
            ("c0", 3, "assistant", "part two"),
            ("c0", 4, "user", "continue"),
            ("c0", 5, "assistant", "part three"),
            ("c0", 6, "user", "followup"),
            ("c0", 7, "assistant", "done"),
        ],
        "conv_id string, turn_idx int, role string, txt2 string",
    )
    out = (
        convo._stitch_groups(ov)
        .orderBy("new_idx")
        .toPandas()[["new_idx", "role", "n_merged", "text"]]
        .values.tolist()
    )
    assert out == [
        [1, "user", 1, "ask"],
        [2, "assistant", 3, "part one part two part three"],
        [3, "user", 1, "followup"],
        [4, "assistant", 1, "done"],
    ], out


def test_stitch_apply_single_sort_shape(spark):
    """Overlay lag, grouping lag, running sum, ordered merge, and
    renumbering all ride the conv_id key: one BroadcastHashJoin (doc
    resolution), no cartesian, and only conv_id-keyed sorts."""
    plan = formatted_plan(convo.conv_stitch_apply(spark, SF))
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", plan)
    assert joins == ["BroadcastHashJoin"], plan
    assert "CartesianProduct" not in plan, plan


def test_stitch_groups_randomized_vs_serial(spark):
    """Adversarial grid for the repair core: 40 seeded random conversations
    with arbitrary 'continue' placements — leading, trailing, consecutive,
    and chained — compared against an independent serial reference in ONE
    Spark round trip.  Pins the general-function semantics beyond what the
    synthetic overlay can produce (roles there alternate, so consecutive
    requests never arise)."""
    import random

    rng = random.Random(20260821)
    rows = []
    for c in range(40):
        n = rng.randint(1, 8)
        for t in range(n):
            role = rng.choice(["user", "assistant", "tool"])
            txt = (
                "continue"
                if rng.random() < 0.35
                else f"w{rng.randint(0, 4)} w{rng.randint(0, 4)}"
            )
            rows.append((f"c{c:02d}", t, role, txt))
    ov = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, txt2 string"
    )
    got = {
        conv: [(r.new_idx, r.role, r.n_merged, r.text) for r in g.itertuples()]
        for conv, g in convo._stitch_groups(ov)
        .toPandas()
        .sort_values(["conv_id", "new_idx"])
        .groupby("conv_id")
    }
    by_conv = {}
    for conv, t, role, txt in rows:
        by_conv.setdefault(conv, []).append((t, role, txt))
    for conv, turns in by_conv.items():
        msgs = []
        prev_cont = False
        for _, role, txt in sorted(turns):
            cont = txt == "continue"
            if not (cont or prev_cont) or not msgs:
                msgs.append({"role": role, "parts": []})
            if not cont:
                msgs[-1]["parts"].append(txt)
            prev_cont = cont
        want = [
            (i + 1, m["role"], len(m["parts"]), " ".join(m["parts"]))
            for i, m in enumerate(msgs)
        ]
        assert got[conv] == want, conv


def test_turn_credit_decay_halves_toward_the_front(spark, sf_dir):
    """credit = reward >> (steps from the end): the final turn carries the
    full reward, each earlier turn exactly half its successor (integer
    div), and the reward is CREDIT_BASE + the final turn's bucket."""
    rows = convo.turn_credit_decay(spark, sf_dir).collect()
    buckets = {
        (r["conv_id"], r["turn_idx"]): r["bucket"]
        for r in convo._turns(spark, sf_dir).collect()
    }
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for conv, turns in by_conv.items():
        turns.sort(key=lambda r: r["turn_idx"])
        last = turns[-1]
        assert last["credit"] == last["reward"]
        assert last["reward"] == convo.CREDIT_BASE + buckets[(conv, last["turn_idx"])]
        for earlier, later in zip(turns, turns[1:]):
            assert earlier["credit"] == later["credit"] // 2
            assert earlier["reward"] == later["reward"]


def test_tool_transition_matrix_accounts_for_every_gap(spark, sf_dir):
    """Every consecutive-turn gap contributes exactly one pair: the matrix
    total equals sum over conversations of (n_turns - 1), and all labels
    come from the TOOL_NAMES alphabet."""
    mat = convo.tool_transition_matrix(spark, sf_dir).collect()
    turns = convo._turns(spark, sf_dir).groupBy("conv_id").count().collect()
    assert sum(r["n_pairs"] for r in mat) == sum(r["count"] - 1 for r in turns)
    labels = set(convo.TOOL_NAMES)
    for r in mat:
        assert r["tool_from"] in labels and r["tool_to"] in labels
        assert 0 < r["n_convs"] <= r["n_pairs"]
