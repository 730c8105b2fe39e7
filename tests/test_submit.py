"""spark-submit --py-files launch path (north rule: the job is launched via
spark-submit with the engine shipped as a zip to separate executor JVMs).

Runs tools/submit.sh against local-cluster[1,2,1536] — one real executor
JVM, package resolved from --py-files only (cwd is moved so the workers
cannot fall back to the repo checkout) — and checks the job JSON plus the
committed output with an independent reader.
"""

import json
import os
import subprocess

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_local_cluster(tmp_path):
    out = tmp_path / "run"
    proc = subprocess.run(
        [os.path.join(REPO, "tools", "submit.sh"),
         "local-cluster[1,2,1536]", str(out), "800"],
        capture_output=True, text=True, timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith('{"job"')]
    assert line, proc.stdout[-2000:]
    stats = json.loads(line[-1])
    assert stats["n_turns"] > 0 and stats["buckets_done"] > 0
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{out}/extracted/bucket=*/*.parquet'"
    ).fetchone()[0]
    assert n == stats["n_turns"]


def test_run_dedup_cli_materializes_labels(tmp_path):
    """The production dedup CLI: labels written once, survivors derived from
    the READ-BACK labels table; audit accounting closes (kept + removed =
    corpus) and the two tables agree with an independent reader."""
    out = tmp_path / "dedup"
    proc = subprocess.run(
        ["python", os.path.join(REPO, "run_dedup.py"),
         "--sf-dir", "/root/testdata/sf0.001", "--output", str(out),
         "--algo", "star", "--master", "local[4]"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith('{"job"')]
    stats = json.loads(line[-1])
    assert stats["n_docs"] == stats["n_survivors"] + stats["n_removed"]
    labels = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT doc_id) FROM '{out}/cluster_labels/*.parquet'"
    ).fetchone()
    assert labels[0] == labels[1] == stats["n_docs"]
    surv = duckdb.sql(
        f"SELECT COUNT(*), SUM(n_dupes_removed) FROM '{out}/survivors/*.parquet'"
    ).fetchone()
    assert surv[0] == stats["n_survivors"]
    assert (surv[1] or 0) == stats["n_removed"]
