"""Manifest metrics must agree across all three independent derivations
(SURVEY.md §2.1 S7/S9):

- task-side observed metrics (``df.observe`` riding the write),
- task-side per-bucket accumulator tallies (default ``metrics_source`` —
  zero extra jobs, the 100 TB path),
- lineage-true aggregation of the committed files (``readback`` mode).
"""

import duckdb

from ocr_mini_service_spark.manifest import load_transcripts, run_with_manifest
from ocr_mini_service_spark.synth import write_transcripts_parquet


def _manifest_rows(out):
    return duckdb.sql(
        f"SELECT bucket, n_turns, n_words_kept, n_words_dropped, n_errors "
        f"FROM '{out}/_manifest/*.parquet' ORDER BY bucket"
    ).fetchall()


def test_observed_metrics_match_committed(spark, tmp_path):
    inp = str(tmp_path / "t.parquet")
    write_transcripts_parquet(inp, 800)

    outs = {}
    for mode in ("accumulator", "readback"):
        out = str(tmp_path / f"extracted_{mode}")
        stats = run_with_manifest(
            spark, load_transcripts(spark, inp), out, n_buckets=8,
            metrics_source=mode,
        )
        outs[mode] = out

        obs = stats["observed"]
        assert obs["n_turns"] == stats["n_turns"]

        man = duckdb.sql(
            f"SELECT SUM(n_turns), SUM(n_words_kept), SUM(n_words_dropped), "
            f"SUM(n_errors) FROM '{out}/_manifest/*.parquet'"
        ).fetchone()
        assert man[0] == obs["n_turns"]
        assert man[1] == obs["n_words_kept"]
        assert man[2] == obs["n_words_dropped"]
        assert man[3] == obs["n_errors"]

    # the per-bucket rows of the two modes are identical — the accumulator
    # tallies ARE the committed files' contents, bucket for bucket
    assert _manifest_rows(outs["accumulator"]) == _manifest_rows(outs["readback"])

    # mid-job progress events (SSE analog) rode the write action: at least
    # one sampled progress row plus the terminal complete row, and the
    # underscore-prefixed file did not confuse the parquet manifest readers
    # (the read above succeeded)
    import json

    with open(f"{outs['accumulator']}/_manifest/_progress.jsonl") as f:
        events = [json.loads(line) for line in f]
    assert events[-1]["type"] == "complete"
    assert any(e["type"] == "progress" for e in events)


def test_progress_reports_failed_on_error(spark, tmp_path):
    """A raised write must close the progress stream with {type: 'failed'},
    never 'complete' (the reference's complete/error event split,
    image-recognition.service.ts:360-413; ADVICE r2)."""
    import json

    import pytest

    from ocr_mini_service_spark.manifest import _emit_progress

    out = str(tmp_path / "failing")
    with pytest.raises(ValueError, match="boom"):
        with _emit_progress(spark, out):
            raise ValueError("boom")
    with open(f"{out}/_manifest/_progress.jsonl") as f:
        events = [json.loads(line) for line in f]
    assert events[-1]["type"] == "failed"
    assert "boom" in events[-1]["error"]
    assert not any(e["type"] == "complete" for e in events)
