"""Invariants for the DOM-heuristic boilerplate family: the block grid
tiles every document, the published NumWordsRules decision is replicated
independently in pandas, and the strip is exactly the content blocks."""

from ocr_mini_service_spark.operators import boilerplate as bp


def test_blocks_tile_documents_and_rule_replicates(spark, sf_dir):
    df = bp.boilerplate_blocks(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    n_words = docs.set_index("doc_id")["text"].str.strip().str.split().str.len()
    per = df.groupby("doc_id")
    assert (per.size() == -(-n_words.reindex(per.size().index) // bp.BLOCK_WORDS)).all()
    assert (per["n_words"].sum() == n_words.reindex(per.size().index)).all()
    assert (df["n_links"] <= df["n_words"]).all()
    assert (df["link_bp"] == df["n_links"] * 10000 // df["n_words"]).all()
    # independent re-derivation of the classifier decision
    want = df.apply(
        lambda r: 0
        if r["link_bp"] > bp.CURR_LINK_BP_MAX
        else (
            int(
                r["n_words"] > bp.CURR_WORDS_A
                or r["next_words"] > bp.NEXT_WORDS_A
                or r["prev_words"] > bp.PREV_WORDS_A
            )
            if _prev_link_bp(df, r) <= bp.PREV_LINK_BP_LOW
            else int(r["n_words"] > bp.CURR_WORDS_B or r["next_words"] > bp.NEXT_WORDS_B)
        ),
        axis=1,
    )
    assert (df["is_content"] == want).all()
    # the synthetic grid produces both classes (the gate separates)
    assert df["is_content"].nunique() == 2


def _prev_link_bp(df, row):
    prev = df[
        (df["doc_id"] == row["doc_id"]) & (df["block_idx"] == row["block_idx"] - 1)
    ]
    return int(prev["link_bp"].iloc[0]) if len(prev) else 0


def test_strip_is_exactly_the_content_blocks(spark, sf_dir):
    blocks = bp.boilerplate_blocks(spark, sf_dir).toPandas()
    strip = bp.boilerplate_strip(spark, sf_dir).toPandas().set_index("doc_id")
    per = blocks.groupby("doc_id").agg(
        n_blocks=("block_idx", "size"),
        n_content_blocks=("is_content", "sum"),
    )
    content_words = (
        blocks.loc[blocks["is_content"] == 1].groupby("doc_id")["n_words"].sum()
    )
    m = strip.join(per, rsuffix="_chk")
    assert (m["n_blocks"] == m["n_blocks_chk"]).all()
    assert (m["n_content_blocks"] == m["n_content_blocks_chk"]).all()
    assert (
        m["n_content_words"]
        == content_words.reindex(m.index).fillna(0).astype(int)
    ).all()
    # main_text word count telescopes to the kept-block word total
    got_words = m["main_text"].str.split().str.len().fillna(0).astype(int)
    assert (got_words == m["n_content_words"]).all()
    # every document survives, boilerplate-only docs with empty text
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert set(m.index) == set(docs["doc_id"])


def test_curation_funnel_v2_consistent_with_components(spark, sf_dir):
    """Funnel counts telescope from the component operators: content
    survivors match boilerplate_strip, quality applies the Gopher gate to
    the STRIPPED text, dedup keeps min-doc_id canonicals of main_text."""
    from ocr_mini_service_spark.operators.corpus import gopher_flags

    f = (
        bp.curation_funnel_v2(spark, sf_dir)
        .toPandas()
        .set_index("stage")["n_docs"]
    )
    strip = bp.boilerplate_strip(spark, sf_dir).toPandas()
    assert f["raw"] == len(strip)
    assert f["content"] == (strip["n_content_blocks"] > 0).sum()
    g = gopher_flags(
        spark.createDataFrame(strip[["doc_id", "main_text"]]), "main_text"
    ).toPandas()
    m = strip.merge(g[["doc_id", "pass_gopher"]], on="doc_id")
    m["has_content"] = m["n_content_blocks"] > 0
    m["quality"] = m["pass_gopher"] == 1
    canon_ids = m.groupby("main_text")["doc_id"].transform("min")
    m["canon"] = m["doc_id"] == canon_ids
    assert f["quality"] == (m["has_content"] & m["quality"]).sum()
    assert f["dedup"] == (m["has_content"] & m["quality"] & m["canon"]).sum()
    # monotone funnel with real attrition at every stage on the synthetic corpus
    assert f["raw"] > f["content"] >= f["quality"] >= f["dedup"]


def test_density_rung_replicates_in_pandas_and_disagrees_somewhere(spark, sf_dir):
    """The density tree re-derived independently in pandas over the emitted
    features must match every verdict; and the two rungs must genuinely
    disagree on some blocks (otherwise the agreement audit is vacuous)."""
    df = bp.density_blocks(spark, sf_dir).toPandas()
    lowlink = df["link_bp"] <= bp.CURR_LINK_BP_MAX
    # prev_link_bp isn't emitted here; recompute from the block order
    rules = bp.boilerplate_blocks(spark, sf_dir).toPandas()
    m = df.merge(
        rules[["doc_id", "block_idx", "link_bp", "is_content"]],
        on=["doc_id", "block_idx", "link_bp"],
    )
    assert len(m) == len(df)
    m = m.sort_values(["doc_id", "block_idx"]).reset_index(drop=True)
    prev_link = (
        m.groupby("doc_id")["link_bp"].shift(1).fillna(0).astype(int)
    )
    low = (m["text_density_x100"] > bp.DENS_CURR_A) | (
        (m["prev_density_x100"] > bp.DENS_CTX_A)
        & (m["next_density_x100"] > bp.DENS_CTX_A)
    )
    high = m["text_density_x100"] > bp.DENS_CURR_B
    expect = (
        lowlink
        & ((prev_link <= bp.PREV_LINK_BP_LOW) & low | (prev_link > bp.PREV_LINK_BP_LOW) & high)
    ).astype(int)
    assert (m["is_content_density"] == expect).all()
    assert (m["is_content_density"] != m["is_content"]).any(), (
        "rungs never disagree — audit is vacuous"
    )


def test_extractor_agreement_identities(spark, sf_dir):
    ag = bp.extractor_agreement(spark, sf_dir).toPandas()
    total = ag["n_both"] + ag["n_only_rules"] + ag["n_only_density"] + ag["n_neither"]
    assert (total == ag["n_blocks"]).all()
    assert ag["n_only_rules"].sum() + ag["n_only_density"].sum() > 0


def test_justext_classes_and_context_pass_replicate(spark, sf_dir):
    """The jusText rung re-derived independently in pandas: the context-free
    ladder from the emitted features, then the symmetric context-sensitive
    relabel from nearest context-free good/bad neighbours.  All four
    context-free classes must occur, the final pass must both promote and
    demote somewhere, and final classes are binary."""
    df = (
        bp.justext_blocks(spark, sf_dir)
        .toPandas()
        .sort_values(["doc_id", "block_idx"])
        .reset_index(drop=True)
    )

    def cf_row(r):
        if r["link_bp"] > bp.JT_MAX_LINK_BP:
            return "bad"
        if r["n_chars"] < bp.JT_LEN_LOW:
            return "bad" if r["link_bp"] > 0 else "short"
        if r["stop_bp"] >= bp.JT_STOP_HIGH_BP:
            return "good" if r["n_chars"] > bp.JT_LEN_HIGH else "neargood"
        if r["stop_bp"] >= bp.JT_STOP_LOW_BP:
            return "neargood"
        return "bad"

    assert (df["cf_class"] == df.apply(cf_row, axis=1)).all()
    assert set(df["cf_class"]) == {"good", "neargood", "short", "bad"}
    assert set(df["final_class"]) == {"good", "bad"}

    def finals(grp):
        cf = grp["cf_class"].tolist()
        out = []
        for i, c in enumerate(cf):
            if c in ("good", "bad"):
                out.append(c)
                continue
            prev_gb = next(
                (x for x in reversed(cf[:i]) if x in ("good", "bad")), "bad"
            )
            next_gb = next((x for x in cf[i + 1:] if x in ("good", "bad")), "bad")
            if c == "neargood":
                out.append(
                    "bad" if prev_gb == "bad" and next_gb == "bad" else "good"
                )
                continue
            prev_any = next(
                (x for x in reversed(cf[:i]) if x != "short"), "bad"
            )
            next_any = next((x for x in cf[i + 1:] if x != "short"), "bad")
            if prev_gb == next_gb:
                out.append(prev_gb)
            elif prev_gb == "bad" and prev_any == "neargood":
                out.append("good")
            elif next_gb == "bad" and next_any == "neargood":
                out.append("good")
            else:
                out.append("bad")
        return out

    want = [c for _, g in df.groupby("doc_id", sort=True) for c in finals(g)]
    assert df["final_class"].tolist() == want
    promoted = (df["final_class"] == "good") & (df["cf_class"] != "good")
    demoted = (df["final_class"] == "bad") & (
        df["cf_class"].isin(["neargood", "short"])
    )
    assert promoted.any(), "context pass never promotes — rung is vacuous"
    assert demoted.any(), "context pass never demotes — rung is vacuous"


def test_justext_strip_telescopes(spark, sf_dir):
    blocks = bp.justext_blocks(spark, sf_dir).toPandas()
    strip = bp.justext_strip(spark, sf_dir).toPandas().set_index("doc_id")
    per = blocks.groupby("doc_id").agg(
        n_blocks=("block_idx", "size"),
        n_good_blocks=("final_class", lambda s: (s == "good").sum()),
    )
    good_words = (
        blocks.loc[blocks["final_class"] == "good"]
        .groupby("doc_id")["n_words"]
        .sum()
    )
    m = strip.join(per, rsuffix="_chk")
    assert (m["n_blocks"] == m["n_blocks_chk"]).all()
    assert (m["n_good_blocks"] == m["n_good_blocks_chk"]).all()
    assert (
        m["n_good_words"]
        == good_words.reindex(m.index).fillna(0).astype(int)
    ).all()
    got_words = m["main_text"].str.split().str.len().fillna(0).astype(int)
    assert (got_words == m["n_good_words"]).all()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert set(m.index) == set(docs["doc_id"])


def test_justext_is_one_window_pass_no_join(spark, sf_dir):
    """All four neighbour lookups ride ONE doc-keyed Window (one Sort, one
    Exchange on the doc key) and the rung never joins."""
    import re
    from ocr_mini_service_spark.plans import formatted_plan

    plan = formatted_plan(bp.justext_blocks(spark, sf_dir))
    assert not re.search(r"Join", plan), plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan


def test_ensemble_votes_replicate_from_member_rungs(spark, sf_dir):
    """The 2-of-3 ensemble verdict recomposed from the three member rungs'
    own outputs must match vote-for-vote; every vote total 0..3 occurs and
    each of rules/density arbitrates some block alone (the ensemble is a
    real tie-breaker, not a constant)."""
    ens = bp.ensemble_blocks(spark, sf_dir).toPandas()
    rules = bp.boilerplate_blocks(spark, sf_dir).toPandas()
    dens = bp.density_blocks(spark, sf_dir).toPandas()
    jt = bp.justext_blocks(spark, sf_dir).toPandas()
    m = (
        ens.merge(
            rules[["doc_id", "block_idx", "is_content"]],
            on=["doc_id", "block_idx"],
        )
        .merge(
            dens[["doc_id", "block_idx", "is_content_density"]],
            on=["doc_id", "block_idx"],
        )
        .merge(
            jt[["doc_id", "block_idx", "final_class"]],
            on=["doc_id", "block_idx"],
        )
    )
    assert len(m) == len(ens)
    assert (m["vote_rules"] == m["is_content"]).all()
    assert (m["vote_density"] == m["is_content_density"]).all()
    assert (m["vote_justext"] == (m["final_class"] == "good").astype(int)).all()
    want_votes = m["is_content"] + m["is_content_density"] + (
        m["final_class"] == "good"
    ).astype(int)
    assert (m["votes"] == want_votes).all()
    assert (m["keep"] == (want_votes >= 2).astype(int)).all()
    assert set(m["votes"]) == {0, 1, 2, 3}
    # majority voting actually overrules single rungs in both directions
    assert ((m["votes"] == 2) & (m["keep"] == 1)).any()
    assert ((m["votes"] == 1) & (m["keep"] == 0)).any()


def test_ensemble_strip_telescopes(spark, sf_dir):
    blocks = bp.ensemble_blocks(spark, sf_dir).toPandas()
    strip = bp.ensemble_strip(spark, sf_dir).toPandas().set_index("doc_id")
    per = blocks.groupby("doc_id").agg(
        n_blocks=("block_idx", "size"),
        n_kept_blocks=("keep", "sum"),
        n_unanimous=("votes", lambda s: (s == 3).sum()),
        n_majority_only=("votes", lambda s: (s == 2).sum()),
    )
    kept_words = (
        blocks.loc[blocks["keep"] == 1].groupby("doc_id")["n_words"].sum()
    )
    m = strip.join(per, rsuffix="_chk")
    for c in ("n_blocks", "n_kept_blocks", "n_unanimous", "n_majority_only"):
        assert (m[c] == m[f"{c}_chk"]).all()
    assert (
        m["n_kept_words"] == kept_words.reindex(m.index).fillna(0).astype(int)
    ).all()
    got_words = m["main_text"].str.split().str.len().fillna(0).astype(int)
    assert (got_words == m["n_kept_words"]).all()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert set(m.index) == set(docs["doc_id"])


def test_ensemble_strip_spans_address_the_canonical_text(spark, sf_dir):
    """Every emitted span, substring-addressed into the canonical
    single-space document text, yields exactly its block_text; spans are
    disjoint, ordered, and there is one per kept block."""
    sp = bp.ensemble_strip_spans(spark, sf_dir).toPandas()
    blocks = bp.ensemble_blocks(spark, sf_dir).toPandas()
    kept = blocks.loc[blocks["keep"] == 1, ["doc_id", "block_idx"]]
    assert len(sp) == len(kept)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    canon = {
        r.doc_id: " ".join(r.text.strip().split()) for r in docs.itertuples()
    }
    for r in sp.itertuples():
        assert canon[r.doc_id][r.span_start : r.span_end] == r.block_text
    prev_end = sp.groupby("doc_id")["span_end"].shift(1)
    assert ((sp["span_start"] >= prev_end) | prev_end.isna()).all()


def test_ensemble_is_join_free_one_sort(spark, sf_dir):
    """All three verdicts ride the jusText frame's doc-keyed sort: the
    ensemble plan never joins rung outputs and adds no Window pass beyond
    the (fused) context lookups."""
    import re
    from ocr_mini_service_spark.plans import formatted_plan

    plan = formatted_plan(bp.ensemble_blocks(spark, sf_dir))
    assert not re.search(r"Join", plan), plan
    assert len(re.findall(r"\(\d+\) Window", plan)) <= 2, plan
    # one doc-keyed window sort + the presentation sort, same as justext
    assert len(re.findall(r"\(\d+\) Sort", plan)) <= 2, plan


def test_extractor_agreement_is_one_pass_no_join(spark, sf_dir):
    """Both verdicts come from the same window pass: the audit plan has no
    join at all and exactly one doc_id-keyed Window."""
    import re
    from ocr_mini_service_spark.plans import formatted_plan

    plan = formatted_plan(bp.extractor_agreement(spark, sf_dir))
    assert not re.search(r"Join", plan), plan
    wins = re.findall(r"\(\d+\) Window", plan)
    assert len(wins) == 1, plan
