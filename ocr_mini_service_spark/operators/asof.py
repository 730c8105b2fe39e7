"""Time-series joins Spark's DataFrame API lacks: as-of join and trailing
interval (range) join.

As-of is the scalable composition: union both sides tagged, one shuffle on
the join key, and a running ``last(..., ignorenulls=True)`` window over
event time — never a per-row range probe or a theta join.  The range join
is a time-bucket equi-join (bucket width = window, left side explodes into
its two covering buckets) with the range predicate as an in-bucket
residual — pair fan-out bounded by bucket population, not key population.

Scale notes: cost is one Exchange on the key plus a per-partition sort —
identical shape to any keyed window; skewed keys fall to AQE.  This beats
the naive formulation (left join on key with ts <= ts, then max-per-left-row)
which materializes every (left, earlier-right) pair — quadratic per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import ordered
from ..sources import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """For every ``left`` row, attach the ``payload_cols`` of the latest
    ``right`` row with the same ``on`` key and ``right.ts <= left.ts``
    (ties at equal ts: the right row wins, then the larger ``tiebreak``).
    Rows with no earlier right match keep nulls.

    Both inputs must carry ``on``, ``ts``, and ``tiebreak``; ``left``'s
    other columns pass through untouched.
    """
    l_tag = left.withColumn("_kind", F.lit(1))
    r_tag = right.withColumn("_kind", F.lit(0))
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(l_tag.schema[c].dataType))
    for c in r_tag.columns:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None).cast(r_tag.schema[c].dataType))
    tagged = l_tag.unionByName(r_tag.select(l_tag.columns))

    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_kind", tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "*",
        *[
            F.last(F.when(F.col("_kind") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_kind") == 1).drop(
        "_kind", *[c for c in payload_cols if c not in left.columns]
    )


RANGE_WINDOW_S = 21600  # 6 h trailing attribution window


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_s: int,
) -> DataFrame:
    """Trailing-window interval join: every (left, right) pair with the same
    ``on`` key and ``right_ts`` in ``(left_ts - window_s, left_ts]``.

    Scale shape: a naive key-only equi-join with the range as a residual
    filter materializes *every* same-key pair before filtering — quadratic
    in the hottest key.  Instead both sides get a time-bucket equi key of
    width ``window_s``: a right row lands in exactly one bucket, a left
    row's trailing window spans exactly two, so the left explodes ×2 and
    the join runs on ``(key, bucket)`` — per-task pair fan-out is bounded
    by bucket population, not key population, and the residual predicate
    only prunes within the two adjacent buckets.  No dedup needed (each
    right row is joined from one bucket only).
    """
    win_us = F.lit(window_s * 1_000_000).cast("long")
    l_epoch = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_epoch = F.unix_micros(F.col(right_ts).cast("timestamp"))

    def bucket(epoch):
        # exact integer bucketing: (e - pmod(e, W)) is a multiple of W, so
        # the division is exact in IEEE — no double-quotient boundary drift.
        # pmod (floor semantics), NOT `%` (truncated remainder): a negative
        # epoch (pre-1970 ts) under `%` rounds toward zero and lands in the
        # bucket ABOVE its floor window, silently dropping matching pairs.
        return ((epoch - F.pmod(epoch, win_us)) / win_us).cast("long")

    l = left.withColumn("_lus", l_epoch).withColumn(
        "_bucket", F.explode(F.array(bucket(l_epoch) - 1, bucket(l_epoch)))
    )
    r = right.withColumn("_rus", r_epoch).withColumn("_bucket", bucket(r_epoch))
    residual = (F.col("_rus") > F.col("_lus") - win_us) & (
        F.col("_rus") <= F.col("_lus")
    )
    return (
        l.join(r, on=[on, "_bucket"], how="inner")
        .filter(residual)
        .drop("_bucket")
    )


def range_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """Driver query: all (click, view) pairs per user with the view in the
    6 h trailing window of the click — the interval-join workload (ad
    attribution, context gathering) that a key-only join makes quadratic."""
    ev = load(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    j = range_join(
        clicks, views, on="user_id", left_ts="ts", right_ts="view_ts",
        window_s=RANGE_WINDOW_S,
    )
    out = j.select(
        "user_id",
        "click_id",
        "view_id",
        (F.col("_lus") - F.col("_rus")).cast("long").alias("lag_us"),
    )
    return ordered(out, "user_id", "click_id", "view_id")


def asof_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """Driver query: each 'click' event joined as-of to the user's most
    recent 'view' at or before the click — the attribution-style lookup a
    per-row subquery would make quadratic."""
    ev = load(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
        F.col("ts").alias("view_ts"),
    )
    j = asof_join(
        clicks,
        views,
        on="user_id",
        ts="ts",
        payload_cols=["view_id", "view_value", "view_ts"],
        tiebreak="event_id",
    )
    out = j.select(
        "user_id",
        "event_id",
        F.col("asof_view_id").alias("view_id"),
        F.round("asof_view_value", 4).alias("view_value"),
        # microsecond epochs: exact integers in both engines (second-level
        # epoch() is a double in DuckDB — cast rounding would diverge); the
        # NTZ→TZ cast is shift-free under the session's fixed UTC zone
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("asof_view_ts").cast("timestamp"))
        )
        .cast("long")
        .alias("lag_us"),
    )
    return ordered(out, "user_id", "event_id")
