"""Profiling session for the local[8]->local[32] thread-scaling gap
(VERDICT r3 item 6: measured 0.52 vs the machine's own busy-loop ceiling
of 0.80 — ~35% of the 32-thread box unaccounted for).

Hypotheses, each isolated by one config axis at the SAME 32-core budget:

  base32    local[32], arrow 2048, n_buckets=64   (the reported number)
  jvm4x8    local-cluster[4,8,6144]               single-JVM contention: same
            32 cores split across 4 executor JVMs (GC/Arrow/parquet-writer
            threads are per-JVM co-tenants in local[32])
  waves256  local[32], n_buckets=256              wave quantization: 64 tasks
            on 32 slots = 2 waves, a straggler idles up to 31 cores; 256
            tasks = 8 finer waves
  arrow8k   local[32], arrow batch 8192           Python-worker round-trip
            amortization (no win at local[8] in r2; retest at 32 threads)
  base8     local[8]                              the ratio denominator

Protocol per the bench discipline (BENCH/BASELINE.md, memory: +-3x drift on
a minutes scale): every round runs ALL configs back-to-back in a fixed
order so drift cancels in the per-round ratios; per session one untimed
warm-up job then best-of-2 timed runs; 3 rounds; report per-round
throughput ratios vs base32 and the median.

Usage: python tools/profile_scaling.py [rounds]
Writes /tmp/profile_scaling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from ocr_mini_service_spark.manifest import load_transcripts, run_with_manifest
from ocr_mini_service_spark.session import get_spark

OUT = "/tmp/profile_scaling/out"


def _timed(spark, transcripts, n_buckets: int) -> float:
    shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.time()
    stats = run_with_manifest(spark, transcripts, OUT, n_buckets=n_buckets, resume=False)
    return stats["n_turns"] / (time.time() - t0)


def session(master: str, arrow_rows: int, n_buckets: int, app: str) -> float:
    conf = {}
    if master.startswith("local-cluster"):
        conf = {
            "spark.executorEnv.PYTHONPATH": os.getcwd(),
            "spark.executor.extraJavaOptions": "-XX:ActiveProcessorCount=8",
        }
    spark = get_spark(app_name=app, master=master, arrow_batch_rows=arrow_rows,
                      extra_conf=conf)
    try:
        transcripts = load_transcripts(spark, bench.DATA)
        transcripts.count()
        _timed(spark, load_transcripts(spark, bench.WARM_DATA), n_buckets)  # warm-up
        return max(_timed(spark, transcripts, n_buckets) for _ in range(2))
    finally:
        spark.stop()


CONFIGS = {
    # name: (master, arrow_rows, n_buckets)
    "base32": ("local[32]", 2048, 64),
    "jvm4x8": ("local-cluster[4,8,6144]", 2048, 64),
    "waves256": ("local[32]", 2048, 256),
    "arrow8k": ("local[32]", 8192, 64),
    "base8": ("local[8]", 2048, 64),
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from ocr_mini_service_spark.synth import write_transcripts_dataset

    write_transcripts_dataset(bench.DATA, bench.BENCH_TURNS)
    write_transcripts_dataset(bench.WARM_DATA, bench.WARM_TURNS)

    thr: dict[str, list[float]] = {k: [] for k in CONFIGS}
    for r in range(rounds):
        for name, (master, arrow_rows, n_buckets) in CONFIGS.items():
            t = session(master, arrow_rows, n_buckets, app=f"prof-{name}-r{r}")
            thr[name].append(round(t, 1))
            print(f"round {r} {name}: {t:.0f} turns/s", flush=True)

    ratios_vs_base32 = {
        name: [round(thr[name][i] / thr["base32"][i], 3) for i in range(rounds)]
        for name in CONFIGS
    }
    out = {
        "throughputs": thr,
        "ratios_vs_base32_per_round": ratios_vs_base32,
        "median_ratio_vs_base32": {
            n: round(statistics.median(r), 3) for n, r in ratios_vs_base32.items()
        },
        "eff_8_to_32_per_round": [
            round(thr["base32"][i] / thr["base8"][i] / 4.0, 3) for i in range(rounds)
        ],
        "bench_turns": bench.BENCH_TURNS,
    }
    with open("/tmp/profile_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
