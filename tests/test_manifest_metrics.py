"""Task-side observed metrics (df.observe riding the write) must equal the
lineage-true metrics aggregated from the committed files — the two
independent derivations cross-check each other (SURVEY.md §2.1 S7/S9)."""

import duckdb

from ocr_mini_service_spark.manifest import load_transcripts, run_with_manifest
from ocr_mini_service_spark.synth import write_transcripts_parquet


def test_observed_metrics_match_committed(spark, tmp_path):
    inp = str(tmp_path / "t.parquet")
    out = str(tmp_path / "extracted")
    write_transcripts_parquet(inp, 800)
    stats = run_with_manifest(spark, load_transcripts(spark, inp), out, n_buckets=8)

    obs = stats["observed"]
    assert obs["n_turns"] == stats["n_turns"]

    man = duckdb.sql(
        f"SELECT SUM(n_turns), SUM(n_words_kept), SUM(n_words_dropped), SUM(n_errors) "
        f"FROM '{out}/_manifest/*.parquet'"
    ).fetchone()
    assert man[0] == obs["n_turns"]
    assert man[1] == obs["n_words_kept"]
    assert man[2] == obs["n_words_dropped"]
    assert man[3] == obs["n_errors"]

    # mid-job progress events (SSE analog) rode the write action: at least
    # one sampled progress row plus the terminal complete row, and the
    # underscore-prefixed file did not confuse the parquet manifest readers
    # (the read above succeeded)
    import json

    with open(f"{out}/_manifest/_progress.jsonl") as f:
        events = [json.loads(line) for line in f]
    assert events[-1]["type"] == "complete"
    assert any(e["type"] == "progress" for e in events)
