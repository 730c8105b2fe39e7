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


def test_compact_output_one_file_per_bucket_resume_noop(spark, tmp_path):
    """compact_output rewrites a fragmented committed output to one file per
    bucket, bit-for-bit (DuckDB as the independent reader), carries the
    manifest so --resume against the compacted location skips every bucket,
    and refuses nothing it shouldn't (row-count guard is exercised by the
    equality assert)."""
    from ocr_mini_service_spark.manifest import persisted_n_buckets
    from ocr_mini_service_spark.sources import DEFAULT_IO
    from run_compact import run as compact_run

    inp = str(tmp_path / "t.parquet")
    write_transcripts_parquet(inp, 400)
    out = str(tmp_path / "extracted")
    stats = run_with_manifest(spark, load_transcripts(spark, inp), out, n_buckets=8)

    # fragment the committed output the way resumed batches / streaming
    # triggers do: many part files per bucket dir, manifest carried over
    frag = str(tmp_path / "fragmented")
    DEFAULT_IO.write(
        DEFAULT_IO.read(spark, out).repartition(32),
        frag,
        partition_by=("bucket",),
        mode="overwrite",
    )
    DEFAULT_IO.write(spark.read.parquet(f"{out}/_manifest"), f"{frag}/_manifest")

    dst = str(tmp_path / "compacted")
    res = compact_run(spark, frag, dst)
    assert res["rows"] == stats["n_turns"]
    assert res["buckets"] == 8
    assert res["files_before"] > 8  # fragmented state really was fragmented
    assert res["files_after"] == 8  # ONE file per bucket dir

    # bit-for-bit row equality, independent reader
    rows = {
        p: duckdb.sql(
            f"SELECT * FROM read_parquet('{p}/bucket=*/*.parquet', "
            f"hive_partitioning=1) ORDER BY ALL"
        ).fetchall()
        for p in (frag, dst)
    }
    assert rows[frag] == rows[dst]

    # the manifest (and its pinned modulus) travelled: resume is a no-op
    assert persisted_n_buckets(spark, dst) == 8
    again = run_with_manifest(
        spark, load_transcripts(spark, inp), dst, resume=True
    )
    assert again["buckets_skipped"] == 8
    assert again["n_turns"] == 0
