#!/usr/bin/env python
"""Batch corpus-audit job — the spark-submit entrypoint materializing the
observability tables an operator reads BEFORE launching a training run
(the dataset card plus its companion audits):

    spark-submit --py-files engine.zip run_report.py \
        --sf-dir /path/corpus_dir --output /path/report

Tables written (each its own parquet dir under --output):

1. ``corpus_report``       — per-source dataset card (volume, token
   envelope, mean graded quality x100, duplicate rate over the re-crawl
   overlay, language spread);
2. ``quality_calibration`` — pass-rate-per-score calibration of the
   graded quality score against the hard Gopher gate;
3. ``length_quality_matrix`` — doc counts + token mass per (log2 length
   bucket x quality tier) cell, the batch scheduler's planning table;
4. ``split_leakage_audit`` — cross-split shared-gram counts + the
   contaminated-test-doc count.

All four are bounded-output aggregates (source / score / bucket x tier /
4 rows), so the job's write side is tiny regardless of corpus size; the
cost is the audit scans themselves.  Writes through the ``TableIO`` seam
and prints ONE JSON stats line.

Note on the ``ordered()`` presentation wrapper (a ``repartition(1)``):
production jobs writing CORPUS-SIZED tables must avoid it (run_dedup /
run_curate write unordered — VERDICT r2/r4), but these audit tables are
BOUNDED (dozens of rows), where one sorted task producing one small file
is exactly the artifact an operator wants to open.

Local dev:
    python run_report.py --sf-dir /root/testdata/sf0.01 --output /tmp/report
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run(spark, sf_dir: str, output: str) -> dict:
    """The job body, on a caller-owned SparkSession (main() wraps it with
    session lifecycle; tests call it directly on the fixture session)."""
    from ocr_mini_service_spark.operators import corpus
    from ocr_mini_service_spark.sources import DEFAULT_IO

    t0 = time.time()
    tables = {
        "corpus_report": corpus.corpus_report,
        "quality_calibration": corpus.quality_calibration,
        "length_quality_matrix": corpus.length_quality_matrix,
        "split_leakage_audit": corpus.split_leakage_audit,
    }
    counts: dict[str, int] = {}
    for name, fn in tables.items():
        DEFAULT_IO.write(fn(spark, sf_dir), f"{output}/{name}")
        # count from the committed (bounded-size) table, not a second
        # evaluation of the corpus-scan DAG
        counts[name] = DEFAULT_IO.read(spark, f"{output}/{name}").count()
    return {
        "job": "report",
        "tables": counts,
        "wall_sec": round(time.time() - t0, 2),
        "output": output,
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", required=True,
                   help="corpus dir containing documents.parquet")
    p.add_argument("--output", required=True, help="report output dir")
    p.add_argument("--master", default=None,
                   help="spark master (default local[$SPARK_GRAFT_CPUS])")
    args = p.parse_args(argv)

    from ocr_mini_service_spark.session import get_spark

    spark = get_spark(app_name="corpus-report", master=args.master)
    try:
        print(json.dumps(run(spark, args.sf_dir, args.output)))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
