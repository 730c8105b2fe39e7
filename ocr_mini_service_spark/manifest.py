"""Resumable per-partition commit manifest — the Spark re-expression of the
reference's ``JobStatus`` map (/root/reference/src/types/return-strategy.types.ts:9-17,
src/ocr/image-recognition.service.ts:25, 61-67, 189-214): one row per
partition-bucket with status, extraction metrics (blocks kept/dropped, error
counts — service.ts:184-186) and commit lineage, enabling idempotent resume.

Layout (parquet emulation of an Iceberg snapshot — an Iceberg catalog slots in
behind the same two functions when its runtime jar is on the cluster):

    <output>/bucket=<k>/part-*.parquet     data, one bucket per task
    <output>/_manifest/part-*.parquet      append-only manifest rows

Partitioning strategy (north rule): bucket = pmod(xxhash64(conv_id, salt), N)
with salt = pmod(xxhash64(turn_idx), S).  Hashing conv_id keeps a
conversation's turns in at most S buckets (mostly co-located) while the salt
bounds the skew of pathologically long conversations — a 10^6-turn
conversation spreads over S tasks instead of serializing one (SURVEY.md §4.2).

Crash atomicity: data files are committed by Spark's parquet commit protocol;
manifest rows are appended only AFTER the data write returns, and metrics are
aggregated from the committed files themselves (read-back), so a manifest row
is always backed by data.  A crash between data and manifest re-runs that
bucket; dynamic partition overwrite makes the re-run idempotent (no
duplicates).
"""

from __future__ import annotations

import contextlib
import datetime
import json
import threading
import time

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract_fused
from .schema import EXTRACTED, TRANSCRIPTS
from .sources import DEFAULT_IO, TableIO

SALT_FACTOR = 32

# extracted table + the hive partition column, for inference-free read-back
from pyspark.sql.types import (  # noqa: E402
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_EXTRACTED_BUCKETED = StructType(
    EXTRACTED.fields + [StructField("bucket", IntegerType(), True)]
)

_MANIFEST_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), True),
        StructField("status", StringType(), False),
        StructField("n_turns", LongType(), False),
        StructField("n_words_kept", LongType(), True),
        StructField("n_words_dropped", LongType(), True),
        StructField("n_errors", LongType(), False),
        StructField("error", StringType(), True),
        StructField("started_at", TimestampType(), False),
        StructField("committed_at", TimestampType(), False),
        # the bucket modulus the output was written under: bucket ids are
        # only meaningful relative to it, so resume must reuse it (validated
        # in run_with_manifest — a different modulus would silently drop
        # turns whose new id collides with a committed old id)
        StructField("n_buckets", IntegerType(), True),
    ]
)


def bucket_expr(n_buckets: int, salt_factor: int = SALT_FACTOR):
    """Deterministic bucket assignment from (conv_id, turn_idx) — recomputable
    on both the input and output side, so no column needs to survive the
    extraction kernel."""
    salt = F.pmod(F.xxhash64(F.col("turn_idx").cast("long")), F.lit(salt_factor))
    return F.pmod(F.xxhash64(F.col("conv_id"), salt), F.lit(n_buckets)).cast("int")


def read_manifest(
    spark: SparkSession, output: str, io: TableIO = DEFAULT_IO
) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    try:
        return io.read(spark, f"{output}/_manifest")
    except AnalysisException:
        # no manifest yet (fresh run); corruption raises a different error —
        # it must surface, not silently reset resume bookkeeping
        return None


def committed_buckets(
    spark: SparkSession, output: str, io: TableIO = DEFAULT_IO
) -> set[int]:
    m = read_manifest(spark, output, io=io)
    if m is None:
        return set()
    rows = m.filter(F.col("status") == "completed").select("bucket").distinct().collect()
    return {r["bucket"] for r in rows}


def persisted_n_buckets(
    spark: SparkSession, output: str, io: TableIO = DEFAULT_IO
) -> int | None:
    """The bucket modulus recorded in an existing output's manifest (None if
    no manifest, or one predating the n_buckets column).  A manifest carrying
    MULTIPLE moduli is already incoherent — surface it, don't pick one."""
    m = read_manifest(spark, output, io=io)
    if m is None or "n_buckets" not in m.columns:
        return None
    rows = (
        m.select("n_buckets").filter(F.col("n_buckets").isNotNull()).distinct().collect()
    )
    vals = sorted(r["n_buckets"] for r in rows)
    if len(vals) > 1:
        raise ValueError(
            f"manifest at {output}/_manifest mixes bucket moduli {vals}; the "
            "output cannot be resumed coherently — clear it and rerun"
        )
    return vals[0] if vals else None


def _append_manifest(
    spark: SparkSession, output: str, rows, schema, io: TableIO = DEFAULT_IO
) -> None:
    """Append the (one-row-per-bucket, already-collected) manifest delta.

    The manifest is driver-sized by construction — one row per bucket — so a
    local filesystem gets a direct pyarrow append (no Spark job for 64 rows);
    remote filesystems (s3://, hdfs://) go through a single-partition append
    via the TableIO seam, which handles the object-store/catalog commit."""
    path = f"{output}/_manifest"
    if "://" in output and not output.startswith("file://"):
        io.append(spark.createDataFrame(rows, schema=schema).coalesce(1), path)
        return
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_type

    local = path[len("file://"):] if path.startswith("file://") else path
    os.makedirs(local, exist_ok=True)
    arrow_schema = pa.schema(
        [pa.field(f.name, to_arrow_type(f.dataType)) for f in schema.fields]
    )
    # Spark's collect() returns naive datetimes in the HOST's local timezone;
    # the arrow fields are tz-aware (timestamp[us, UTC]) — attach the local
    # tz explicitly so both write branches persist the same instant on a
    # non-UTC host.
    py_rows = []
    for r in rows:
        d = r.asDict()
        for k, v in d.items():
            if isinstance(v, datetime.datetime) and v.tzinfo is None:
                d[k] = v.astimezone()
        py_rows.append(d)
    table = pa.Table.from_pylist(py_rows, schema=arrow_schema)
    # temp-name + atomic rename: a crash mid-write must not leave a corrupt
    # part visible to read_manifest (crash-atomicity per the module docstring)
    final = f"{local}/part-{uuid.uuid4().hex}.parquet"
    tmp = f"{local}/.{os.path.basename(final)}.tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final)


@contextlib.contextmanager
def _emit_progress(spark: SparkSession, output: str, interval: float = 0.5):
    """Mid-job progress events riding the write action (the SSE
    ``{type: 'progress', progress, message}`` stream analog,
    /root/reference/docs/api.md:127-144): a driver-side poller samples the
    SparkListener-backed status tracker and appends JSON lines to
    ``_manifest/_progress.jsonl`` (underscore-prefixed → invisible to
    parquet readers of the manifest).  Local filesystems only — an external
    monitor on a real cluster reads the Spark UI / event log instead."""
    if "://" in output and not output.startswith("file://"):
        yield
        return
    local = output[len("file://"):] if output.startswith("file://") else output
    import os

    os.makedirs(f"{local}/_manifest", exist_ok=True)
    path = f"{local}/_manifest/_progress.jsonl"

    def _write(payload: dict) -> None:
        payload["ts"] = time.time()
        with open(path, "a") as f:
            f.write(json.dumps(payload) + "\n")

    stop = threading.Event()

    def _poll() -> None:
        st = spark.sparkContext.statusTracker()
        while not stop.wait(interval):
            try:
                ids = st.getActiveStageIds()
                done = total = 0
                for sid in ids:
                    info = st.getStageInfo(sid)
                    if info is not None:
                        done += info.numCompletedTasks
                        total += info.numTasks
                _write(
                    {
                        "type": "progress",
                        "active_stages": len(ids),
                        "tasks_done": done,
                        "tasks_total": total,
                        "message": f"{done}/{total} tasks in {len(ids)} active stages",
                    }
                )
            except Exception:
                return  # context torn down mid-poll

    t = threading.Thread(target=_poll, daemon=True)
    t.start()
    # terminal event mirrors the reference's complete/error split
    # (/root/reference/src/ocr/image-recognition.service.ts:360-368,405-413):
    # a failed write must emit {type: 'failed'}, never 'complete'
    try:
        yield
    except BaseException as exc:
        stop.set()
        t.join(timeout=2)
        _write({"type": "failed", "error": f"{type(exc).__name__}: {exc}"})
        raise
    else:
        stop.set()
        t.join(timeout=2)
        _write({"type": "complete"})


class _BucketMetricsParam(AccumulatorParam):
    """dict[bucket -> (n_turns, n_words_kept, n_words_dropped, n_errors)]
    merged by element-wise sum."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, t in b.items():
            cur = a.get(k)
            a[k] = t if cur is None else tuple(x + y for x, y in zip(cur, t))
        return a


def run_with_manifest(
    spark: SparkSession,
    transcripts: DataFrame,
    output: str,
    n_buckets: int | None = None,
    resume: bool = False,
    salt_factor: int = SALT_FACTOR,
    io: TableIO = DEFAULT_IO,
    metrics_source: str = "accumulator",
) -> dict:
    """Extract all not-yet-committed buckets in one Spark job; append manifest
    rows per bucket after the data commit.  Returns run stats.

    ``metrics_source`` selects how per-bucket manifest metrics are obtained:

    - ``"accumulator"`` (default, the 100 TB path): tallied task-side inside
      the extraction kernel and merged on the driver — zero extra Spark jobs,
      nothing re-read.  Exactly-once: the updates ride the one write action,
      and Spark applies each successful task's accumulator contribution once
      (restarted tasks don't double-count within an action).
    - ``"readback"``: aggregated from the committed files themselves
      (column-pruned second scan) — lineage-true cross-check; at 100 TB the
      re-scan is the cost.  tests/test_manifest_metrics.py asserts both
      derivations agree with the observed metrics and with each other."""
    # An existing output's manifest pins the bucket modulus: ids are only
    # meaningful relative to it.  Resuming (or overwriting into) the same
    # output with a different modulus would silently DROP turns whose new id
    # collides with a committed old id and duplicate others — so an explicit
    # mismatch is an error, and an unspecified n_buckets ADOPTS the persisted
    # value rather than the parallelism default.
    persisted = persisted_n_buckets(spark, output, io=io)
    if n_buckets is not None and persisted is not None and persisted != n_buckets:
        raise ValueError(
            f"output {output} was written with n_buckets={persisted}, but "
            f"n_buckets={n_buckets} was requested; rerun with "
            f"n_buckets={persisted} (or clear the output)"
        )
    if n_buckets is None:
        # 8 task waves per slot: with only 2 waves (the old 2x default) a
        # straggler in the last wave idles the whole executor fleet behind
        # it — measured 1.37x end-to-end at local[32] when moving 64 -> 256
        # buckets on the 600k-turn bench input (tools/profile_scaling.py,
        # BENCH/BASELINE.md "thread-scaling attribution").  Finer buckets
        # also shrink the per-bucket retry unit for resume.
        n_buckets = (
            persisted
            if persisted is not None
            else 8 * spark.sparkContext.defaultParallelism
        )
    if metrics_source not in ("accumulator", "readback"):
        raise ValueError(f"unknown metrics_source: {metrics_source!r}")

    started_at = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)

    df = transcripts.withColumn("bucket", bucket_expr(n_buckets, salt_factor))
    skipped: set[int] = set()
    if resume:
        skipped = committed_buckets(spark, output, io=io)
        if skipped:
            df = df.filter(~F.col("bucket").isin(*[int(b) for b in skipped]))

    # One shuffle on the small input side (raw turns), none on the fat output
    # side: each task then owns whole buckets → one file per bucket via
    # partitionBy, sorted by the stable turn order within each (the explicit
    # sort also declares the ordering the partitionBy writer needs, so the
    # writer does not insert its own partition-column sort).
    t0 = time.time()
    df = df.repartition(n_buckets, "bucket")
    accum = (
        spark.sparkContext.accumulator({}, _BucketMetricsParam())
        if metrics_source == "accumulator"
        else None
    )
    extracted = extract_fused(df, bucket_accum=accum).withColumn(
        "bucket", bucket_expr(n_buckets, salt_factor)
    )
    # task-side observed metrics riding the write action (zero extra jobs) —
    # the analog of the reference's SSE progress events
    # (image-recognition.service.ts:310-312; SURVEY.md §2.1 S7 / §2.4 A3)
    from pyspark.sql import Observation

    obs = Observation("extract")
    observed = extracted.observe(
        obs,
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("n_blocks_kept").alias("n_words_kept"),
        F.sum("n_blocks_dropped").alias("n_words_dropped"),
        F.count("error").alias("n_errors"),
    )
    with _emit_progress(spark, output):
        io.write(
            observed.sortWithinPartitions("bucket", "conv_id", "turn_idx"),
            output,
            partition_by=("bucket",),
            mode="overwrite",
            dynamic=True,
        )
    observed_metrics = obs.get
    t_write = time.time() - t0

    committed_at = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    t0 = time.time()
    if accum is not None:
        # Task-side tallies, merged driver-side by the accumulator — zero
        # extra jobs, nothing re-read (the 100 TB path).
        rows = [
            Row(
                bucket=int(b),
                status="completed",
                n_turns=int(m[0]),
                n_words_kept=int(m[1]),
                n_words_dropped=int(m[2]),
                n_errors=int(m[3]),
                error=None,
                # tz-aware: _append_manifest treats NAIVE stamps as host-local
                # (the collect() convention); these are UTC instants
                started_at=started_at.replace(tzinfo=datetime.timezone.utc),
                committed_at=committed_at.replace(tzinfo=datetime.timezone.utc),
                n_buckets=int(n_buckets),
            )
            for b, m in sorted(accum.value.items())
        ]
        manifest_schema = _MANIFEST_SCHEMA
    else:
        # Metrics from the committed files (lineage-true), column-pruned scan.
        back = io.read(spark, output, schema=_EXTRACTED_BUCKETED)
        if skipped:
            back = back.filter(~F.col("bucket").isin(*[int(b) for b in skipped]))
        metrics = (
            back.groupBy("bucket")
            .agg(
                F.count("*").alias("n_turns"),
                F.sum("n_blocks_kept").cast("long").alias("n_words_kept"),
                F.sum("n_blocks_dropped").cast("long").alias("n_words_dropped"),
                F.count("error").alias("n_errors"),
            )
            .select(
                "bucket",
                F.lit("completed").alias("status"),
                "n_turns",
                "n_words_kept",
                "n_words_dropped",
                "n_errors",
                F.lit(None).cast("string").alias("error"),
                F.lit(started_at).alias("started_at"),
                F.lit(committed_at).alias("committed_at"),
                F.lit(int(n_buckets)).cast("int").alias("n_buckets"),
            )
        )
        # collect the (tiny: one row per bucket) metrics once, then append
        # them from the driver — one metrics job total, no manifest re-read
        rows = metrics.collect()
        manifest_schema = metrics.schema
    t_metrics = time.time() - t0
    t0 = time.time()
    _append_manifest(spark, output, rows, manifest_schema, io=io)
    return {
        "n_turns": int(sum(r["n_turns"] for r in rows)),
        "buckets_done": len({r["bucket"] for r in rows}),
        "buckets_skipped": len(skipped),
        "n_buckets": n_buckets,
        "t_write": round(t_write, 2),
        "t_metrics": round(t_metrics, 2),
        "t_manifest": round(time.time() - t0, 2),
        "observed": observed_metrics,
    }


def load_transcripts(
    spark: SparkSession, path: str, io: TableIO = DEFAULT_IO
) -> DataFrame:
    return io.read(spark, path, schema=TRANSCRIPTS)


def compact_output(
    spark: SparkSession,
    src: str,
    dst: str,
    io: TableIO = DEFAULT_IO,
) -> dict:
    """Small-file compaction of a committed extraction output — the table
    maintenance a long-lived ingest target needs: every ``--resume`` batch
    and every streaming trigger appends its own part files per bucket, and
    scan-task scheduling over thousands of tiny files eventually dominates
    read cost.  Rewrites the data so each bucket partition holds ONE file,
    preserving rows bit-for-bit and carrying the manifest (and its pinned
    ``n_buckets``) to the destination — ``--resume`` against the compacted
    output skips every bucket, exactly as against the original.

    Writes to a NEW location: Spark cannot overwrite a path it is reading
    from (lazy scan during write), and a same-path rewrite would also
    destroy the crash-atomicity story — the swap (rename or catalog
    pointer flip) is the operator's one atomic step.  At 100 TB this runs
    per-partition-range, not whole-table; the shuffle is the compaction's
    inherent cost (rows must land in one task per bucket to become one
    file per bucket).

    Returns {"rows", "files_before", "files_after", "buckets"} — counts
    derived distributedly via input_file_name(), FS-agnostic."""
    df = io.read(spark, src)
    n_buckets = persisted_n_buckets(spark, src, io=io)
    files_before = df.select(F.input_file_name()).distinct().count()
    rows_before = df.count()
    # one task per bucket value -> one file per bucket dir
    compacted = df.repartition(int(n_buckets or 256), "bucket")
    io.write(compacted, dst, partition_by=("bucket",), mode="overwrite", dynamic=True)
    m = read_manifest(spark, src, io=io)
    if m is not None:
        io.write(m, f"{dst}/_manifest", mode="overwrite")
    out = io.read(spark, dst)
    rows_after = out.count()
    if rows_after != rows_before:
        raise RuntimeError(
            f"compaction row-count mismatch: {rows_before} -> {rows_after}"
        )
    files_after = out.select(F.input_file_name()).distinct().count()
    return {
        "rows": rows_after,
        "files_before": files_before,
        "files_after": files_after,
        "buckets": n_buckets,
    }
