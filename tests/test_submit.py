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
