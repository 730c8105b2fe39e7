"""Bucketed co-located joins: two tables bucketed by the same key into the
same bucket count must join with ZERO Exchange — the repeatedly-joined
spine-table layout at 100 TB (each bucket pair is a map-side sort-merge)."""

import re

from pyspark.sql import functions as F

from ocr_mini_service_spark.plans import formatted_plan
from ocr_mini_service_spark.sources import write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.range(0, 2000).select(
        F.col("id").alias("conv_key"), (F.col("id") % 7).alias("x")
    )
    right = spark.range(0, 2000, 3).select(
        F.col("id").alias("conv_key"), (F.col("id") % 5).alias("y")
    )
    spark.sql("DROP TABLE IF EXISTS t_buck_a")
    spark.sql("DROP TABLE IF EXISTS t_buck_b")
    write_bucketed(left, "t_buck_a", "conv_key", 8, path=str(tmp_path / "a"))
    write_bucketed(right, "t_buck_b", "conv_key", 8, path=str(tmp_path / "b"))
    try:
        # hint("merge"): test tables are broadcast-small, but the layout
        # exists for big-big joins where SortMergeJoin is what Catalyst
        # picks — pin that strategy so the no-Exchange property is tested
        joined = (
            spark.table("t_buck_a")
            .hint("merge")
            .join(spark.table("t_buck_b").hint("merge"), "conv_key")
        )
        plan = formatted_plan(joined)
        assert re.search(r"\(\d+\) SortMergeJoin", plan), plan
        assert not re.search(r"\(\d+\) Exchange", plan), plan
        # the layout changes the plan, never the answer
        want = {(i, i % 7, i % 5) for i in range(0, 2000, 3)}
        got = {tuple(r) for r in joined.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_buck_a")
        spark.sql("DROP TABLE IF EXISTS t_buck_b")
