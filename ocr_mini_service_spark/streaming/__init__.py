"""Incremental extraction via Structured Streaming.

The reference is a continuously running service with per-job progress events
(SSE subjects, /root/reference/src/ocr/image-recognition.service.ts:24,
310-326).  The Spark re-expression (SURVEY.md §2.8): new transcript files
arrive in a directory → ``readStream`` → the same fused extraction →
``foreachBatch`` writes through the batch writer; ``Trigger.AvailableNow``
drains what exists and stops (resumable drain ≅ the job lifecycle;
checkpointLocation ≅ the job-status map; StreamingQueryListener/progress ≅
the SSE progress events).

There are no event-time windows or watermarks here because the reference has
none (jobs are independent units); idempotent per-batch commits are the
late/duplicate story.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..pipeline import extract_fused
from ..schema import TRANSCRIPTS


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drain all unprocessed transcript files into the extracted table.
    Returns the StreamingQuery (already awaited when available_now)."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    writer = (
        extract_fused(stream)
        .writeStream.option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .format("parquet")
        .option("path", output_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()
