"""Hot-bucket scale guards: a mass-duplicated document (10³ identical copies)
must NOT materialize an unbounded bucket array or a quadratic in-row pair
explosion.  Pins the DEDUP_CAP / DF_MAX / K_CAP behavior and the no-silent-
caps audit surfaces (drop stats report exactly what the caps removed)."""

import numpy as np
import pandas as pd
import pytest

from ocr_mini_service_spark.operators import dedup, similarity

N_DOCS = 1000
TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _n_mutants(n: int) -> int:
    # dedup._docs_with_mutants keeps ids where (doc_id + 1_000_000) % 3 == 1
    return sum(1 for i in range(n) if (i + 1_000_000) % 3 == 1)


@pytest.fixture(scope="module")
def hot_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hotdocs")
    pd.DataFrame({"doc_id": range(N_DOCS), "text": [TEXT] * N_DOCS}).to_parquet(
        d / "documents.parquet"
    )
    rng = np.random.default_rng(7)
    vec = rng.uniform(-0.5, 0.5, 64).astype("float32")
    pd.DataFrame(
        {"vec_id": range(N_DOCS), "embedding": [vec.tolist()] * N_DOCS}
    ).to_parquet(d / "embeddings.parquet")
    return str(d)


def test_lsh_hot_bucket_capped(spark, hot_docs_dir):
    cap = dedup.DEDUP_CAP
    pairs = dedup.lsh_candidate_pairs(spark, hot_docs_dir).count()
    # identical originals form one capped bucket; identical mutants another
    per_bucket = cap * (cap - 1) // 2
    assert pairs == 2 * per_bucket, pairs
    stats = {r["band_id"]: r for r in dedup.lsh_drop_stats(spark, hot_docs_dir).collect()}
    n_mut = _n_mutants(N_DOCS)
    for band in (0, 1):
        s = stats[band]
        # originals (1000 identical) and mutants (334 identical) form hot
        # buckets; depending on minhash coincidences on the tiny shingle sets
        # they may merge within a band, so assert bounds, not exact layout
        assert N_DOCS <= s["max_bucket"] <= N_DOCS + n_mut
        assert s["n_dropped"] >= N_DOCS - cap


def test_dedup_clusters_hot_bucket_converges(spark, hot_docs_dir):
    """Connected components over the capped pair graph: the 10³ identical
    docs resolve to one capped cluster (min-id canonical) in a couple of
    label-propagation rounds; everything outside the caps stays singleton."""
    cap = dedup.DEDUP_CAP
    rows = dedup.dedup_clusters(spark, hot_docs_dir).collect()
    assert len(rows) == N_DOCS + _n_mutants(N_DOCS)
    c0 = [r for r in rows if r["cluster_id"] == 0]
    assert len(c0) == cap and all(r["cluster_size"] == cap for r in c0)
    singles = [r for r in rows if r["cluster_size"] == 1]
    assert all(r["cluster_id"] == r["doc_id"] for r in singles)


def test_ngram_df_cutoff_drops_stop_shingles(spark, hot_docs_dir):
    # every shingle appears in 1000 (or 334) docs > DF_MAX -> representation
    # empties out; no quadratic intersection join happens at all
    assert dedup.ngram_jaccard_pairs(spark, hot_docs_dir).count() == 0


def test_embedding_hot_bucket_capped(spark, hot_docs_dir):
    cap = similarity.K_CAP
    # identical vectors all collide in every band; mutants (+0.01 on c0)
    # share the same sign buckets, but the cap keeps only the smallest
    # K_CAP vec_ids (= originals), so pairs are C(K_CAP, 2), all cosine 1.0
    got = similarity.embedding_cosine_dups(spark, hot_docs_dir)
    rows = got.collect()
    assert len(rows) == cap * (cap - 1) // 2
    assert all(r["cosine"] >= 0.99 for r in rows)
    stats = similarity.lsh_bucket_stats(spark, hot_docs_dir).collect()
    assert all(r["n_dropped"] > 0 for r in stats)


def test_caps_above_testdata_maxima(spark, sf_dir):
    """The guards must be dead code on the synthetic corpus (oracle results
    unchanged): loudly fail if a testdata regeneration ever crosses them."""
    lsh = dedup.lsh_drop_stats(spark, sf_dir).collect()
    assert all(r["n_dropped"] == 0 for r in lsh)
    assert all(r["max_bucket"] <= dedup.DEDUP_CAP for r in lsh)
    emb = similarity.lsh_bucket_stats(spark, sf_dir).collect()
    assert all(r["n_dropped"] == 0 for r in emb)


def test_dedup_incremental_admission_rules(spark, sf_dir):
    """Every new-batch doc is adjudicated exactly once; the mutant overlay
    (substr of its source doc, sharing most 3-word shingles) is overwhelmingly
    rejected against the index; the admission flag is exactly the
    zero-duplicate conjunction."""
    df = dedup.dedup_incremental(spark, sf_dir).toPandas()
    assert df["doc_id"].is_unique
    assert (df["doc_id"] >= dedup.MUTANT_BASE).all()
    assert (
        (df["admitted"] == 1)
        == ((df["n_index_dups"] == 0) & (df["n_batch_dups"] == 0))
    ).all()
    # mutants are near-dups of their sources by construction: most collide
    assert (df["n_index_dups"] > 0).mean() > 0.8


def test_dedup_incremental_hot_batch_bounded(spark, hot_docs_dir):
    """On the 10³-identical-docs fixture the batch side still adjudicates
    every mutant without a quadratic blowup: pair lists stay capped."""
    df = dedup.dedup_incremental(spark, hot_docs_dir).toPandas()
    assert len(df) == _n_mutants(N_DOCS)
    # per-doc duplicate counts can never exceed the bucket cap
    assert (df["n_index_dups"] + df["n_batch_dups"] <= dedup.DEDUP_CAP).all()


def test_dedup_survivors_partitions_the_corpus(spark, hot_docs_dir):
    """Survivors are exactly the cluster canonicals, and kept + removed
    accounts for every corpus doc (no silent drops)."""
    n_corpus = N_DOCS + _n_mutants(N_DOCS)
    rows = dedup.dedup_survivors(spark, hot_docs_dir).collect()
    clusters = dedup.dedup_clusters(spark, hot_docs_dir).collect()
    canonicals = {r["doc_id"] for r in clusters if r["doc_id"] == r["cluster_id"]}
    assert {r["doc_id"] for r in rows} == canonicals
    assert sum(r["n_dupes_removed"] for r in rows) + len(rows) == n_corpus


def test_dedup_survivors_reuses_materialized_clusters(spark, hot_docs_dir):
    """The production path: cluster once, persist the labels, filter them —
    survivors over a precomputed frame must equal the inline derivation."""
    labels = dedup.dedup_clusters(spark, hot_docs_dir).localCheckpoint()
    via_labels = {
        (r["doc_id"], r["n_dupes_removed"])
        for r in dedup.dedup_survivors(spark, hot_docs_dir, clusters=labels).collect()
    }
    inline = {
        (r["doc_id"], r["n_dupes_removed"])
        for r in dedup.dedup_survivors(spark, hot_docs_dir).collect()
    }
    assert via_labels == inline and len(inline) > 0


# ---------------------------------------------------------------------------
# connected-components variants on an adversarial chain graph
# ---------------------------------------------------------------------------

CHAIN_N = 40  # path graph 0-1-2-...-39: diameter 39


def _chain_edges(spark):
    fwd = spark.createDataFrame(
        [(i, i + 1) for i in range(CHAIN_N - 1)], "src long, dst long"
    )
    return fwd.union(fwd.selectExpr("dst as src", "src as dst"))


def test_cc_star_beats_min_label_on_chains(spark):
    """A chain is the worst case for min-label propagation (rounds =
    diameter); large-star/small-star must resolve the same component in
    O(log n) rounds with identical labels."""
    edges = _chain_edges(spark)
    lab_ml, rounds_ml = dedup._cc_min_label(edges, max_iter=CHAIN_N + 2)
    lab_st, rounds_st = dedup._cc_star(edges, max_iter=CHAIN_N + 2)
    want = {(i, 0) for i in range(CHAIN_N)}
    assert {(r.id, r.label) for r in lab_ml.collect()} == want
    assert {(r.id, r.label) for r in lab_st.collect()} == want
    assert rounds_st <= 8, rounds_st          # ~log2(40) + alternation slack
    assert rounds_ml >= CHAIN_N // 2, rounds_ml
    assert rounds_st < rounds_ml / 2, (rounds_st, rounds_ml)


def test_cc_min_label_raises_instead_of_wrong_labels(spark):
    """Exhausting max_iter below the graph diameter must raise — never
    return plausible-but-wrong cluster labels (ADVICE r2)."""
    with pytest.raises(RuntimeError, match="did not reach its fixpoint"):
        dedup._cc_min_label(_chain_edges(spark), max_iter=3)


def test_cc_star_matches_min_label_on_mixed_graph(spark):
    """Chain + triangle + singleton-pair + isolated star: both algorithms
    must produce identical component labels."""
    raw = (
        [(i, i + 1) for i in range(10, 15)]        # chain 10..15
        + [(0, 1), (1, 2), (2, 0)]                  # triangle
        + [(100, 200)]                              # pair
        + [(50, 51), (50, 52), (50, 53)]            # star centered off-min
    )
    fwd = spark.createDataFrame(raw, "src long, dst long")
    edges = fwd.union(fwd.selectExpr("dst as src", "src as dst"))
    lab_ml, _ = dedup._cc_min_label(edges, max_iter=30)
    lab_st, _ = dedup._cc_star(edges, max_iter=30)
    assert (
        {(r.id, r.label) for r in lab_ml.collect()}
        == {(r.id, r.label) for r in lab_st.collect()}
    )


def test_dedup_clusters_star_algo_oracle_equal(spark, hot_docs_dir):
    """The driver query under algo='star' returns the exact same frame as
    the default min-label algorithm (same recursive-CTE oracle semantics)."""
    a = {tuple(r) for r in dedup.dedup_clusters(spark, hot_docs_dir).collect()}
    b = {
        tuple(r)
        for r in dedup.dedup_clusters(spark, hot_docs_dir, algo="star").collect()
    }
    assert a == b


def test_substring_dupes_detects_the_mutant_overlay(spark, sf_dir):
    """The mutant overlay (same text shifted 12 chars) MUST register as
    shared substrings: WIN_S divides the 12-char offset, so original and
    mutant windows align.  Every mutant doc long enough to carry a window
    shares all of its windows with its original."""
    out = dedup.substring_dupes(spark, sf_dir).collect()
    mutants = [r for r in out if r.doc_id >= 1_000_000]
    assert mutants, "no mutant docs produced windows"
    assert all(r.n_shared > 0 for r in mutants), mutants[:5]
    # the 12-char offset stays alignment-compatible with the stride
    assert 12 % dedup.WIN_S == 0


def test_minhash_estimate_is_bounded_and_pairs_match_lsh(spark, sf_dir):
    """Estimates are valid basis points over the signature width, and the
    estimator runs over exactly the LSH candidate pairs (same recall set
    as the exact verifier)."""
    est = dedup.minhash_jaccard_estimate(spark, sf_dir).collect()
    assert est
    width = len(dedup.MINHASH_AB)
    for r in est:
        assert 0 <= r.n_match <= width
        assert r.est_jaccard_bp == (r.n_match * 10000) // width
    pairs = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(spark, sf_dir).collect()}
    assert {(r.doc_a, r.doc_b) for r in est} == pairs


def test_winnowing_detects_shared_runs_and_respects_density(spark, sf_dir):
    """Winnowing guarantee: the mutant overlay (same text minus a 12-char
    prefix) shares long word runs with its original, so every mutant doc
    must share >= 1 fingerprint HASH with its original; and the selected
    set stays sparse (at most one selection per window start)."""
    fps = dedup.winnowing_fingerprints(spark, sf_dir).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    mutants = [d for d in by_doc if d >= 1_000_000]
    assert mutants
    for m in mutants:
        orig = m - 1_000_000
        if orig in by_doc:
            assert by_doc[m] & by_doc[orig], (m, orig)
    counts = {}
    for r in fps:
        counts[r.doc_id] = counts.get(r.doc_id, 0) + 1
    # REAL density bounds per doc: selections are distinct (pos, hash) over
    # n_windows = n_shingles - W + 1 windows, so counts <= n_windows; and a
    # single selection can serve at most W consecutive windows, so
    # counts >= ceil(n_windows / W)
    corpus = {r.doc_id: r.text for r in dedup._docs_with_mutants(spark, sf_dir).collect()}
    w = dedup.WINNOW_W
    for doc_id, c in counts.items():
        n_shingles = max(len(corpus[doc_id].split()) - (dedup.SHINGLE - 1), 0)
        n_windows = n_shingles - w + 1
        assert n_windows >= 1, doc_id
        assert c <= n_windows, (doc_id, c, n_windows)
        assert c >= -(-n_windows // w), (doc_id, c, n_windows)
