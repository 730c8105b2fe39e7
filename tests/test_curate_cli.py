"""End-to-end test of the run_curate.py job surface: the curated table on
disk must be exactly the docs every stage operator independently approves."""


import duckdb

import run_curate
from ocr_mini_service_spark.operators import corpus


def test_run_curate_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "cur")
    stats = run_curate.run(spark, sf_dir, out)
    s = stats["stages"]
    # funnel monotone and consistent
    assert s["raw"] >= s["quality"] >= s["dedup"] >= s["train"] >= s["decontaminated"] >= s["mixed"]
    assert stats["n_curated"] == s["mixed"]

    # independent read of the artifact (DuckDB, not Spark)
    got = duckdb.sql(f"SELECT doc_id FROM '{out}/curated/*.parquet' ORDER BY doc_id").df()
    assert len(got) == stats["n_curated"] > 0
    curated_ids = set(got["doc_id"])

    # every stage operator independently approves every curated doc
    gq = corpus.gopher_rules(spark, sf_dir).toPandas().set_index("doc_id")
    assert (gq.loc[sorted(curated_ids), "pass_gopher"] == 1).all()
    sp = corpus.sample_split(spark, sf_dir).toPandas().set_index("doc_id")
    assert (sp.loc[sorted(curated_ids), "split"] == "train").all()
    mix = corpus.source_mixture(spark, sf_dir).toPandas().set_index("doc_id")
    assert (mix.loc[sorted(curated_ids), "kept"] == 1).all()
    bl = corpus.bloom_decontaminate(spark, sf_dir).toPandas().set_index("doc_id")
    assert (bl.loc[bl.index.intersection(curated_ids), "bloom_contaminated"] == 0).all()
    # normalized-dedup canonicality: no two curated docs share a norm key,
    # and each curated doc is the min doc_id of its key within the corpus
    norm = corpus.text_normalize(spark, sf_dir).toPandas()
    key_min = norm.groupby("norm_text")["doc_id"].min()
    by_doc = norm.set_index("doc_id")["norm_text"]
    keys = by_doc.loc[sorted(curated_ids)]
    assert keys.is_unique
    assert all(key_min[k] == d for d, k in keys.items())


def test_run_report_end_to_end(spark, sf_dir, tmp_path):
    """The run_report.py job surface: every audit table on disk equals the
    corresponding driver query's result, via an independent DuckDB read."""
    import run_report

    out = str(tmp_path / "rep")
    stats = run_report.run(spark, sf_dir, out)
    assert stats["tables"]["split_leakage_audit"] == 4
    for name in (
        "corpus_report",
        "quality_calibration",
        "length_quality_matrix",
        "split_leakage_audit",
    ):
        disk = duckdb.sql(
            f"SELECT * FROM '{out}/{name}/*.parquet'"
        ).df()
        assert len(disk) == stats["tables"][name] > 0
        want = getattr(corpus, name)(spark, sf_dir).toPandas()
        cols = sorted(want.columns)
        a = disk[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b), name
