#!/usr/bin/env bash
# Launch the batch extraction job exactly as the production deployment does:
#
#     spark-submit --py-files engine.zip run_extract.py ...
#
# over a master with SEPARATE executor JVMs (local-cluster[w,c,mem] here;
# a real cluster URL in production).  The engine package ships to executors
# via --py-files — nothing on the workers' filesystem is assumed.
#
# Usage: tools/submit.sh [master] [output_dir] [n_synth_turns]
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${1:-local-cluster[2,2,2048]}"
OUT="${2:-/tmp/submit_run}"
NTURNS="${3:-3000}"

SPARK_SUBMIT="$(command -v spark-submit || echo /opt/spark/bin/spark-submit)"
rm -rf "$OUT" engine.zip
python - <<'PY'
import zipfile, os
with zipfile.ZipFile("engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("ocr_mini_service_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
PY

"$SPARK_SUBMIT" \
    --master "$MASTER" \
    --py-files engine.zip \
    --conf spark.driver.memory=4g \
    --conf spark.executor.memory=1g \
    run_extract.py \
    --synth "$NTURNS" \
    --input "$OUT/transcripts.parquet" \
    --output "$OUT/extracted"
