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
