"""Small-file compaction job: rewrite a committed extraction output so each
bucket partition holds one file, carrying the manifest (table maintenance —
the production analog of Iceberg's rewrite_data_files / OPTIMIZE).

    spark-submit run_compact.py --input /data/extracted --output /data/extracted_c

Prints ONE JSON line with rows / files_before / files_after / buckets."""

from __future__ import annotations

import argparse
import json
import time


def run(spark, src: str, dst: str) -> dict:
    from ocr_mini_service_spark.manifest import compact_output

    t0 = time.time()
    stats = compact_output(spark, src, dst)
    return {
        "job": "compact",
        **stats,
        "wall_sec": round(time.time() - t0, 2),
        "input": src,
        "output": dst,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="committed extraction output")
    ap.add_argument("--output", required=True, help="destination for the compacted table")
    ap.add_argument("--master", default=None, help="override master (e.g. local[8])")
    args = ap.parse_args()

    from ocr_mini_service_spark.session import get_spark

    spark = get_spark(app_name="compact-output", master=args.master)
    print(json.dumps(run(spark, args.input, args.output)))


if __name__ == "__main__":
    main()
