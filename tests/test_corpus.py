"""Invariant tests for the corpus-curation operators (cross-engine value
parity is covered by tests/test_operators_duckdb.py; these pin the semantic
properties a training pipeline relies on)."""

from ocr_mini_service_spark.operators import corpus


def test_sample_split_deterministic_and_proportioned(spark, sf_dir):
    a = corpus.sample_split(spark, sf_dir).toPandas()
    b = corpus.sample_split(spark, sf_dir).toPandas()
    # bit-for-bit reproducible — re-runs never migrate docs between splits
    assert a.equals(b)
    assert a["bucket"].between(0, 255).all()
    frac = a["split"].value_counts(normalize=True)
    assert 0.70 < frac["train"] < 0.90
    assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0
    # assignment is a pure function of content: one split per doc
    assert a["doc_id"].is_unique


def test_stratified_sample_covers_every_stratum(spark, sf_dir):
    df = corpus.stratified_sample(spark, sf_dir).toPandas()
    per = df.groupby(["lang", "source"]).size()
    assert (per <= corpus.STRATUM_K).all()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_strata = docs.select("lang", "source").distinct().count()
    assert len(per) == n_strata  # no stratum starved
    assert (df.groupby(["lang", "source"])["rn"].min() == 1).all()


def test_repetition_stats_bounds(spark, sf_dir):
    df = corpus.repetition_stats(spark, sf_dir).toPandas()
    assert df["dup_word_frac"].between(0, 1).all()
    assert df["top_2gram_frac"].between(0, 1).all()
    assert (df["top_2gram"].str.count(" ") == 1).all()  # real 2-grams


def test_pii_redact_scrubs_everything(spark, sf_dir):
    df = corpus.pii_redact(spark, sf_dir).toPandas()
    assert (df["n_emails"] >= 1).all()
    assert (df["n_phones"] >= 1).all()
    tails = df["redacted_tail"]
    assert tails.str.contains("<EMAIL>").all()
    assert tails.str.contains("<PHONE>").all()
    assert not tails.str.contains("@example.com").any()


def test_tfidf_ranks_rare_terms_above_stopwords(spark, sf_dir):
    df = corpus.tfidf_topterms(spark, sf_dir).toPandas()
    assert (df.groupby("doc_id").size() <= corpus.TOP_TERMS).all()
    # within a doc, rank order == tfidf order
    for _, g in df.groupby("doc_id"):
        srt = g.sort_values("rank")
        assert (srt["tfidf"].diff().dropna() <= 1e-12).all()


def test_chunk_documents_cover_and_overlap(spark, sf_dir):
    """Chunks tile every document: chunk 0 starts at word 1, starts advance
    by exactly CHUNK_STRIDE (so consecutive full chunks overlap by
    CHUNK_SIZE - CHUNK_STRIDE words), and the last chunk reaches the final
    word."""
    df = corpus.chunk_documents(spark, sf_dir).toPandas()
    assert (df["n_tokens"] >= 1).all()
    assert (df["start_word"] == df["chunk_idx"] * corpus.CHUNK_STRIDE + 1).all()
    per = df.groupby("doc_id")
    assert (per["chunk_idx"].min() == 0).all()
    # contiguous chunk numbering
    assert (per["chunk_idx"].max() + 1 == per.size()).all()
    # the final chunk covers through the last word
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    n_words = docs.set_index("doc_id")["text"].str.strip().str.split().str.len()
    last = df.loc[per["chunk_idx"].idxmax()].set_index("doc_id")
    covered = last["start_word"] + last["n_tokens"] - 1
    assert (covered == n_words.reindex(covered.index).clip(lower=1)).all()


def test_pack_shards_greedy_budget(spark, sf_dir):
    """Packing is order-preserving and budget-sane: shard ids are
    nondecreasing in doc order within a group, a new shard only opens once
    the running total crosses the budget, and docs are never split."""
    df = corpus.pack_shards(spark, sf_dir).toPandas()
    for _, g in df.sort_values("doc_id").groupby("lang"):
        assert g["shard_id"].is_monotonic_increasing
        assert (g["tokens_before"].diff().dropna() == g["n_tokens"].shift()[1:]).all()
        assert (g["shard_id"] == g["tokens_before"] // corpus.PACK_BUDGET).all()
        # every non-final shard spans its full budget window
        cum_end = g.groupby("shard_id")["tokens_before"].max() + g.groupby(
            "shard_id"
        )["n_tokens"].last()
        assert (cum_end.iloc[:-1] >= (cum_end.index[:-1] + 1) * corpus.PACK_BUDGET).all()


def test_decontaminate_matches_split_and_bounds(spark, sf_dir):
    df = corpus.decontaminate(spark, sf_dir).toPandas()
    assert df["doc_id"].is_unique
    assert (df["n_shared"] <= df["n_grams"]).all()
    assert ((df["contaminated"] == 1) == (df["n_shared"] > 0)).all()
    sp = corpus.sample_split(spark, sf_dir).toPandas()
    # exactly the train split, every doc present even with zero grams
    assert set(df["doc_id"]) == set(sp.loc[sp["split"] == "train", "doc_id"])


def test_source_mixture_decision_is_threshold_rule(spark, sf_dir):
    per = corpus.source_mixture(spark, sf_dir).toPandas()
    assert ((per["kept"] == 1) == (per["bucket"] < per["keep_threshold"])).all()
    assert per["bucket"].between(0, 255).all()
    # threshold is a pure function of source
    assert (per.groupby("source")["keep_threshold"].nunique() == 1).all()
    # independent of the split hash: both buckets exist for some doc
    sp = corpus.sample_split(spark, sf_dir).toPandas()
    merged = per.merge(sp, on="doc_id")
    assert (merged["bucket_x"] != merged["bucket_y"]).any()


def test_mixture_stats_aggregates_per_doc_decisions(spark, sf_dir):
    per = corpus.source_mixture(spark, sf_dir).toPandas()
    stats = corpus.mixture_stats(spark, sf_dir).toPandas()
    agg = per.groupby("source").agg(n_docs=("doc_id", "size"), n_kept=("kept", "sum"))
    m = stats.set_index("source").join(agg, rsuffix="_chk")
    assert (m["n_docs"] == m["n_docs_chk"]).all()
    assert (m["n_kept"] == m["n_kept_chk"]).all()
    assert (m["achieved_bp"] == m["n_kept"] * 10000 // m["n_docs"]).all()


def test_ngram_lm_counts_is_a_conditional_distribution(spark, sf_dir):
    df = corpus.ngram_lm_counts(spark, sf_dir).toPandas()
    # context totals really are the bigram-count marginals
    per_ctx = df.groupby("w1").agg(n12_sum=("n12", "sum"), n1=("n1", "first"))
    assert (per_ctx["n12_sum"] == per_ctx["n1"]).all()
    assert df["cond_bp"].between(0, 10000).all()
    # total bigrams = sum over docs of (n_words - 1)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    n_words = docs["text"].str.strip().str.split().str.len()
    assert df["n12"].sum() == (n_words - 1).sum()


def test_tokenize_ids_roundtrip_through_vocab(spark, sf_dir):
    """Id sequences decode back to the document: sequence length matches
    the token count, ids stay in [0, VOCAB_TOP], in-vocab positions decode
    to the original word via the vocab_coverage ranking, and OOV positions
    are exactly the words outside the top-N vocabulary."""
    ids = corpus.tokenize_ids(spark, sf_dir).toPandas()
    vocab = corpus.vocab_coverage(spark, sf_dir).toPandas()
    rank_to_tok = dict(zip(vocab["rank"], vocab["token"]))
    tok_to_rank = {t: r for r, t in rank_to_tok.items()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    words = docs.set_index("doc_id")["text"].str.strip().str.split()
    m = ids.set_index("doc_id")
    assert (m["ids_str"].str.split().str.len() == m["n_tokens"]).all()
    assert (m["oov_bp"] == m["n_oov"] * 10000 // m["n_tokens"]).all()
    for doc_id, row in m.head(50).iterrows():
        seq = [int(x) for x in row["ids_str"].split()]
        ws = words.loc[doc_id]
        assert len(seq) == len(ws)
        for w, i in zip(ws, seq):
            assert 0 <= i <= corpus.VOCAB_TOP
            if i == 0:
                assert w not in tok_to_rank
            else:
                assert rank_to_tok[i] == w


def test_ngram_lm_counts_handles_short_documents(spark, tmp_path):
    """Documents with < 2 words must contribute zero bigrams, not crash:
    two-arg sequence(1, stop) DESCENDS for stop < 1, so an unguarded
    transform throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT on a 1-word doc."""
    import pandas as pd

    d = tmp_path / "short"
    d.mkdir()
    pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["one", "   ", "a b a"]}
    ).to_parquet(d / "documents.parquet")
    df = corpus.ngram_lm_counts(spark, str(d)).toPandas()
    got = {(r.w1, r.w2): (r.n12, r.n1, r.cond_bp) for r in df.itertuples()}
    # n1 counts occurrences AS A CONTEXT (w1 of a bigram): the final 'a' of
    # "a b a" has no successor, so n1('a') = 1
    assert got == {("a", "b"): (1, 1, 10000), ("b", "a"): (1, 1, 10000)}


def test_vocab_coverage_is_monotone_and_matches_heavy_hitters(spark, sf_dir):
    df = corpus.vocab_coverage(spark, sf_dir).toPandas()
    assert list(df["rank"]) == list(range(1, corpus.VOCAB_TOP + 1))
    assert df["cum_bp"].is_monotonic_increasing
    assert df["cum_bp"].between(0, 10000).all()
    assert df["n"].is_monotonic_decreasing
    hh = corpus.heavy_hitters(spark, sf_dir).toPandas()
    # the two top-N views agree on the shared prefix
    k = min(len(hh), len(df))
    assert list(df["token"][:k]) == list(hh["token"][:k])


def test_line_dedup_keeps_first_occurrence_and_reassembles(spark, sf_dir):
    df = corpus.line_dedup(spark, sf_dir).toPandas()
    assert (df["n_kept"] <= df["n_segments"]).all()
    assert (df["n_kept"] >= 0).all()
    # reassembled text is exactly the kept segments: word count telescopes
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    n_words = docs.set_index("doc_id")["text"].str.strip().str.split().str.len()
    m = df.set_index("doc_id")
    assert (m["n_segments"] == -(-n_words.reindex(m.index) // corpus.SEG_WORDS)).all()
    # the union of kept text across the corpus has no duplicate segment:
    # every segment string appears exactly once among kept positions
    kept_words = m["dedup_text"].str.split().str.len().fillna(0)
    # each doc's dedup_text word count never exceeds the original
    assert (kept_words <= n_words.reindex(m.index)).all()
    # idempotence: running dedup on already-deduped docs keeps everything
    segs = [
        t.split()[i : i + corpus.SEG_WORDS]
        for t in m["dedup_text"]
        for i in range(0, len(t.split()), corpus.SEG_WORDS)
    ]
    joined = [" ".join(s) for s in segs if s]
    assert len(joined) == len(set(joined))


def test_gopher_rules_flags_match_signals(spark, sf_dir):
    df = corpus.gopher_rules(spark, sf_dir).toPandas()
    assert (
        (df["words_ok"] == 1)
        == df["n_words"].between(corpus.GOPHER_MIN_WORDS, corpus.GOPHER_MAX_WORDS)
    ).all()
    assert (
        (df["mean_len_ok"] == 1)
        == df["mean_wlen_x100"].between(
            corpus.GOPHER_MEANLEN_MIN_X100, corpus.GOPHER_MEANLEN_MAX_X100
        )
    ).all()
    assert ((df["distinct_ok"] == 1) == (df["distinct_bp"] >= corpus.GOPHER_DISTINCT_MIN_BP)).all()
    assert ((df["stopword_ok"] == 1) == (df["n_stop"] >= corpus.GOPHER_STOP_MIN)).all()
    conj = df[["words_ok", "mean_len_ok", "distinct_ok", "stopword_ok"]].min(axis=1)
    assert (df["pass_gopher"] == conj).all()
    assert df["distinct_bp"].between(0, 10000).all()
    # the gate actually separates: both outcomes occur on the synthetic corpus
    assert df["pass_gopher"].nunique() == 2


def test_curation_funnel_is_consistent_with_component_operators(spark, sf_dir):
    f = corpus.curation_funnel(spark, sf_dir).toPandas().set_index("stage")["n_docs"]
    # monotone non-increasing survivor counts
    assert (f.diff().dropna() <= 0).all()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert f["raw"] == len(docs)
    # train stage consistent with sample_split, mixture with source_mixture
    sp = corpus.sample_split(spark, sf_dir).toPandas()
    assert f["train"] <= (sp["split"] == "train").sum()
    de = corpus.decontaminate(spark, sf_dir).toPandas()
    # funnel's decontaminated drop count never exceeds decontaminate's flags
    assert f["train"] - f["decontaminated"] <= (de["contaminated"] == 1).sum()


def test_bloom_decontaminate_never_misses_exact_overlap(spark, sf_dir):
    """The Bloom verdict must be a strict SUPERSET of the exact verdict
    (blooms have false positives, never false negatives), bit-reproducible
    across runs, and the audit query's miss count must be the structural 0
    its oracle pins."""
    exact = corpus.decontaminate(spark, sf_dir).toPandas().set_index("doc_id")
    bloom = corpus.bloom_decontaminate(spark, sf_dir).toPandas().set_index("doc_id")
    again = corpus.bloom_decontaminate(spark, sf_dir).toPandas().set_index("doc_id")
    # deterministic by construction: seeded-xxhash64 positions into a fixed
    # bit space, no RNG anywhere in build or probe
    assert bloom.equals(again)
    # same training universe, same per-doc gram counts
    assert set(bloom.index) == set(exact.index)
    joined = exact.join(bloom, lsuffix="_e")
    assert (joined["n_grams_e"] == joined["n_grams"]).all()
    # containment: every exactly-contaminated doc is bloom-flagged, and the
    # bloom can only ever ADD candidates (n_bloom_hits >= n_shared per doc)
    assert (joined["n_bloom_hits"] >= joined["n_shared"]).all()
    assert (
        joined.loc[joined["contaminated"] == 1, "bloom_contaminated"] == 1
    ).all()
    audit = corpus.bloom_decon_audit(spark, sf_dir).toPandas()
    assert audit["n_missed_by_bloom"].iloc[0] == 0
    assert audit["n_train"].iloc[0] == len(exact)
    assert audit["n_exact_contaminated"].iloc[0] == int(
        (exact["contaminated"] == 1).sum()
    )


def test_token_surprisal_is_log2_of_rarity(spark, sf_dir):
    """Per-token surprisal must be exactly floor(log2(n_docs / df)) of the
    same DF table token_rarity is built from: a ubiquitous token carries 0
    bits, and sum_bits is consistent with an independent pandas recompute
    on a sample of documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    n_docs = len(docs)
    dfs: dict[str, int] = {}
    per_doc_toks = {}
    for _, r in docs.iterrows():
        toks = {t for t in r["text"].strip().lower().split() if t}
        per_doc_toks[r["doc_id"]] = toks
        for t in toks:
            dfs[t] = dfs.get(t, 0) + 1
    out = corpus.token_surprisal(spark, sf_dir).toPandas().set_index("doc_id")
    for doc_id in list(out.index)[:50]:
        toks = per_doc_toks[doc_id]
        want = sum((n_docs // dfs[t]).bit_length() - 1 for t in toks)
        row = out.loc[doc_id]
        assert row["n_distinct_tokens"] == len(toks)
        assert row["sum_bits"] == want, doc_id
        assert row["mean_bits_x100"] == (want * 100) // len(toks)


def test_normalized_dedup_merges_reformatted_republications(spark, sf_dir):
    """Every reformatted overlay doc (upper-case + punctuation + doubled
    spacing) must land in its base doc's group: the overlay pair has
    grp_size >= 2 with the BASE doc as canonical, while exact dedup cannot
    merge them (byte-different).  Normalization itself is pinned by value:
    norm(variant) == norm(base)."""
    norm = corpus.text_normalize(spark, sf_dir).toPandas().set_index("doc_id")
    out = corpus.normalized_dedup(spark, sf_dir).toPandas().set_index("doc_id")
    base_ids = [i for i in out.index if i < 2000000]
    overlay_ids = [i for i in out.index if i >= 2000000]
    assert overlay_ids and len(out) == len(base_ids) + len(overlay_ids)
    for vid in overlay_ids:
        bid = vid - 2000000
        assert out.loc[vid, "grp_size"] >= 2, vid
        assert out.loc[vid, "canonical"] == 0, vid  # base id is smaller
        assert out.loc[bid, "grp_size"] == out.loc[vid, "grp_size"], vid
    # shrinkage signal sanity: normalization never grows the text
    assert (norm["n_chars_norm"] <= norm["n_chars_raw"]).all()
    assert (norm["n_chars_norm"] == norm["norm_text"].str.len()).all()


def test_perplexity_buckets_are_ordered_equal_thirds(spark, sf_dir):
    rows = corpus.perplexity_buckets(spark, sf_dir).collect()
    by = {b: [r["ppl_c"] for r in rows if r["bucket"] == b]
          for b in corpus.PPL_STAGES}
    assert all(by[b] for b in corpus.PPL_STAGES)
    # tiers are score-ordered and equal scores never split across tiers
    assert max(by["head"]) < min(by["middle"])
    assert max(by["middle"]) < min(by["tail"])
    # roughly equal thirds (exact up to tie groups at the cut points)
    n = len(rows)
    for b in corpus.PPL_STAGES:
        assert abs(len(by[b]) - n / 3) < n / 6, {k: len(v) for k, v in by.items()}


def test_perplexity_score_matches_bigram_table(spark, sf_dir):
    # recompute one doc's score from ngram_lm_counts (independent operator)
    lm = {(r["w1"], r["w2"]): (r["n1"], r["n12"])
          for r in corpus.ngram_lm_counts(spark, sf_dir).collect()}
    doc = (
        corpus.load(spark, sf_dir, "documents")
        .select("doc_id", "text").orderBy("doc_id").first()
    )
    words = doc["text"].strip().split()
    bits = []
    for a, b in zip(words, words[1:]):
        n1, n12 = lm[(a, b)]
        bits.append((n1 // n12).bit_length() - 1)
    got = {r["doc_id"]: r for r in corpus.perplexity_buckets(spark, sf_dir).collect()}
    r = got[doc["doc_id"]]
    assert r["n_bigrams"] == len(bits)
    assert r["ppl_c"] == sum(bits) * 100 // len(bits)


def test_source_cap_keeps_k_hash_smallest_per_key(spark, sf_dir):
    rows = corpus.source_cap(spark, sf_dir).collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r["source"], []).append(r["cap_rank"])
    for src, ranks in per_key.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src
        assert len(ranks) <= corpus.CAP_K


def test_source_cap_candidates_are_prefilter_bounded(spark, sf_dir):
    total = corpus.load(spark, sf_dir, "documents").count()
    cand = corpus._cap_candidates(spark, sf_dir)
    n_cand = cand.count()
    # the prefilter must actually drop rows (keys here exceed CAP_K*CAP_OVER)
    assert n_cand < total
    # and every selected row comes from the candidate set
    sel = set(
        (r["source"], r["doc_id"])
        for r in corpus.source_cap(spark, sf_dir).collect()
    )
    cset = set((r["source"], r["doc_id"]) for r in cand.collect())
    assert sel <= cset


def test_quality_rung_agreement_telescopes_from_components(spark, sf_dir):
    """The Venn counts recompute exactly from the three public component
    queries; a Gopher pass implies a classifier accept (the rule flags
    alone carry QUAL_ACCEPT-many points plus the stopword-cap term); and
    the rungs genuinely disagree somewhere."""
    import pandas as pd

    g = corpus.gopher_rules(spark, sf_dir).toPandas()[["doc_id", "pass_gopher"]]
    c = corpus.quality_classifier(spark, sf_dir).toPandas()[["doc_id", "accept"]]
    p = corpus.perplexity_buckets(spark, sf_dir).toPandas()[["doc_id", "bucket"]]
    m = g.merge(c, on="doc_id").merge(p, on="doc_id", how="left")
    m["in_ppl_head"] = (m["bucket"] == "head").fillna(False).astype(int)
    want = (
        m.groupby(
            [m["pass_gopher"].rename("in_gopher"),
             m["accept"].rename("in_classifier"),
             "in_ppl_head"]
        )
        .size()
        .rename("n_docs")
        .reset_index()
    )
    got = corpus.quality_rung_agreement(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values(list(got.columns)).reset_index(drop=True).astype("int64"),
        want.sort_values(list(got.columns)).reset_index(drop=True).astype("int64"),
        check_names=False,
    )
    # total telescopes to the corpus
    assert got["n_docs"].sum() == len(g)
    # gopher => classifier containment (no (1, 0, *) region)
    assert got.loc[(got["in_gopher"] == 1) & (got["in_classifier"] == 0)].empty
    # real disagreement: classifier-only keeps and head-tier splits exist
    assert len(got) >= 4


def test_span_corruption_masks_stay_inside_their_window(spark, sf_dir):
    """Each span lives entirely inside its CORRUPT_WIN-token window and
    inside the document; windows shorter than CORRUPT_MIN emit nothing, so
    spans never overlap by construction."""
    rows = corpus.span_corruption_masks(spark, sf_dir).collect()
    assert rows
    for r in rows:
        w0 = r["span_idx"] * corpus.CORRUPT_WIN
        m = min(corpus.CORRUPT_WIN, r["n_tokens"] - w0)
        assert m >= corpus.CORRUPT_MIN
        assert w0 <= r["tok_start"] < w0 + m - 2
        assert 1 <= r["tok_len"] <= 3
        assert r["tok_start"] + r["tok_len"] <= w0 + m <= r["n_tokens"]


def test_corpus_report_counts_the_republication_overlay(spark, sf_dir):
    """The dataset card counts the re-crawl overlay as duplicates: every
    source shows a positive dup rate, and doc counts close over base +
    overlay."""
    from pyspark.sql import functions as F

    rep = {r["source"]: r for r in corpus.corpus_report(spark, sf_dir).collect()}
    docs = corpus.load(spark, sf_dir, "documents")
    base = {
        r["source"]: (r["n"], r["n_over"])
        for r in docs.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("doc_id") % corpus.REPORT_REPUB_MOD == 0).cast("int")).alias(
                "n_over"
            ),
        )
        .collect()
    }
    assert set(rep) == set(base)
    for src, (n, n_over) in base.items():
        r = rep[src]
        assert r["n_docs"] == n + n_over
        if n_over:
            assert r["dup_bp"] > 0
        assert r["min_tokens"] <= r["max_tokens"]
        assert r["n_langs"] >= 1


def test_quality_calibration_buckets_cover_the_corpus(spark, sf_dir):
    """Calibration rows partition the corpus: bucket doc counts sum to the
    corpus size, pass counts never exceed doc counts, and the rule gate
    only passes at scores where every flag could fire."""
    rows = corpus.quality_calibration(spark, sf_dir).collect()
    total = corpus.load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert r["pass_bp"] == r["n_pass"] * 10000 // r["n_docs"]
        # the full conjunction implies at least the four flag weights
        if r["n_pass"]:
            assert r["score"] >= (
                corpus.QUAL_W_WORDS + corpus.QUAL_W_MLEN
                + corpus.QUAL_W_DISTINCT + corpus.QUAL_W_STOPFLAG
            )


def test_split_leakage_audit_finds_the_overlay(spark, sf_dir):
    """The re-crawl overlay guarantees cross-split verbatim copies, so the
    train/test shared-gram count and the contaminated-test-doc count are
    both positive."""
    vals = {
        r["metric"]: r["n"]
        for r in corpus.split_leakage_audit(spark, sf_dir).collect()
    }
    assert set(vals) == {
        "grams_train_val", "grams_train_test", "grams_val_test",
        "test_docs_contaminated_by_train",
    }
    assert vals["grams_train_test"] > 0
    assert vals["test_docs_contaminated_by_train"] > 0


def test_ngram_novelty_curve_is_cumulative_and_complete(spark, sf_dir):
    """Deciles 0..9 all appear, the cumulative column is the running sum,
    and the final total equals the corpus-wide distinct gram count."""
    from pyspark.sql import functions as F

    rows = corpus.ngram_novelty_curve(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(10))
    run = 0
    for r in rows:
        run += r["n_new_grams"]
        assert r["cum_grams"] == run
    docs = corpus.load(spark, sf_dir, "documents")
    total = (
        docs.select(
            F.explode(
                corpus._gram_array(corpus._words(), corpus.NOVELTY_N)
            ).alias("g")
        )
        .agg(F.countDistinct("g"))
        .collect()[0][0]
    )
    assert rows[-1]["cum_grams"] == total
