"""Hand-computed semantics for the as-of join operator: <= match, same-ts
visibility, tie-breaking, null for no earlier match — and the plan shape
(one keyed Exchange + window, never a range-probe join)."""

import datetime as dt
import re

from pyspark.sql import functions as F

from ocr_mini_service_spark.operators.asof import asof_join, asof_join_events
from ocr_mini_service_spark.plans import formatted_plan


def _ts(s):
    return dt.datetime(2026, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(5), 101), (2, _ts(3), 102), (3, _ts(9), 103)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), 7, 7, 0.5),   # same instant as click 101 -> visible
            (1, _ts(8), 8, 8, 0.7),
            (1, _ts(8), 9, 9, 0.9),   # same ts as view 8: larger id wins
            (2, _ts(4), 10, 10, 1.0), # after user 2's click -> no match
        ],
        "user_id long, ts timestamp, event_id long, view_id long, view_value double",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", ts="ts",
        payload_cols=["view_id", "view_value"], tiebreak="event_id",
    )
    rows = {r.event_id: r for r in out.collect()}
    assert rows[100].asof_view_id == 9      # latest ts wins; tie -> larger id
    assert rows[101].asof_view_id == 7      # right at equal ts is visible
    assert rows[101].asof_view_value == 0.5
    assert rows[102].asof_view_id is None   # only later views exist
    assert rows[103].asof_view_id is None   # user has no views at all
    assert out.count() == left.count()      # left-join cardinality


def test_range_join_negative_epochs(spark):
    """Pre-1970 timestamps have negative epoch micros: truncated `%` would
    bucket them one window too high and silently drop matching pairs; pmod
    (floor semantics) must keep the bucketed join identical to the naive
    interval join."""
    from ocr_mini_service_spark.operators.asof import range_join

    base = dt.datetime(1969, 12, 31, 22, 0, 0)  # epoch < 0 throughout
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=s), 100 + i)
         for i, s in enumerate([0, 30, 3600, 7205])],
        "user_id long, ts timestamp, click_id long",
    )
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=s), 200 + i)
         for i, s in enumerate([-3599, -5, 0, 29, 3599, 7200])],
        "user_id long, view_ts timestamp, view_id long",
    )
    got = sorted(
        (r.click_id, r.view_id)
        for r in range_join(
            left, right, on="user_id", left_ts="ts", right_ts="view_ts",
            window_s=3600,
        ).collect()
    )
    # naive oracle: view_ts in (click_ts - W, click_ts]
    lrows = [(r.click_id, r.ts) for r in left.collect()]
    rrows = [(r.view_id, r.view_ts) for r in right.collect()]
    want = sorted(
        (cid, vid)
        for cid, cts in lrows
        for vid, vts in rrows
        if cts - dt.timedelta(seconds=3600) < vts <= cts
    )
    assert got == want and len(want) >= 6, (got, want)


def test_asof_plan_is_single_keyed_exchange(spark, sf_dir):
    plan = formatted_plan(asof_join_events(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" not in plan, plan  # no join at all: union + window
    # exchanges: one hashpartitioning(user_id) for the window + the final
    # presentation repartition(1) from ordered()
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1, plan
