"""Relational operator showcase queries over the driver testdata.

Each function maps to a SURVEY.md §2 "driver query" tag and has a matching
DuckDB oracle in ``__spark_entry__.oracle_sql()``.  Every computed column is
aliased identically on both sides (the driver's value-hash compare sorts
columns by name).  Reference cites are to /root/reference/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import ordered
from ..sources import load


def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """A2/A3-style grouped aggregation (grouped avg/count/sum; SURVEY §2.4).
    Classic TPC-H Q1 shape: partial (map-side) aggregation + final merge is
    free in Spark's hash aggregate."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def broadcast_region_customers(spark: SparkSession, sf: str) -> DataFrame:
    """J3 broadcast equi-join (page-dims enrichment analog,
    parse-tsv-output.function.ts:144-167): tiny dims (region/nation) broadcast
    to the fact side — no shuffle of the big table."""
    region = load(spark, sf, "region")
    nation = load(spark, sf, "nation")
    cust = load(spark, sf, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .orderBy("r_name")
    )


def anti_join_quiet_orders(spark: SparkSession, sf: str) -> DataFrame:
    """J1-shaped anti-join: equi key + non-equi residual (the overlap
    anti-join pattern, image-recognition.service.ts:252-276): orders with NO
    lineitem shipped within 60 days of the order date."""
    orders = load(spark, sf, "orders").alias("o")
    li = load(spark, sf, "lineitem").alias("l")
    cond = (F.col("l.l_orderkey") == F.col("o.o_orderkey")) & (
        F.col("l.l_shipdate") < F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_anti")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


def overlap_anti_join_geometric(spark: SparkSession, sf: str) -> DataFrame:
    """J1 literally: rectangles from lineitem rows (x=[l_discount,
    l_discount+l_tax], y=[l_quantity/100, +0.2]) anti-joined against 'code'
    rectangles derived from high-price rows of the same order; boundary touch
    (<=) is NOT overlap (image-recognition.service.ts:285-302)."""
    li = load(spark, sf, "lineitem")
    rects = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_discount").alias("x"),
        F.col("l_tax").alias("w"),
        (F.col("l_quantity") / 100.0).alias("y"),
        F.lit(0.2).alias("h"),
    )
    codes = li.filter(F.col("l_extendedprice") > 50000).select(
        "l_orderkey",
        F.col("l_tax").alias("cx"),
        F.col("l_discount").alias("cw"),
        (F.col("l_quantity") / 150.0).alias("cy"),
        F.lit(0.3).alias("ch"),
    )
    w, c = rects.alias("w"), codes.alias("c")
    no_overlap = (
        (F.col("w.x") + F.col("w.w") <= F.col("c.cx"))
        | (F.col("c.cx") + F.col("c.cw") <= F.col("w.x"))
        | (F.col("w.y") + F.col("w.h") <= F.col("c.cy"))
        | (F.col("c.cy") + F.col("c.ch") <= F.col("w.y"))
    )
    return (
        w.join(c, (F.col("w.l_orderkey") == F.col("c.l_orderkey")) & ~no_overlap, "left_anti")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("l_orderkey")
    )


def rollup_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """A4 hierarchy rollup (lines/paragraphs/blocks analog,
    docs/api.md:147-159): multi-level grouping with min/max bbox-style
    aggregates and grouping ids."""
    li = load(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


def ordered_agg_lineitems(spark: SparkSession, sf: str) -> DataFrame:
    """A5/W2 ordered aggregation (space-joined text in reading order,
    example-ocr-response.json:3-4): explicit sort inside the aggregate —
    collect_list order is never relied on (SURVEY §4.3)."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
                " ",
            ).alias("line_seq"),
            # exact quantized sum (avg-of-doubles rounds differently across
            # engines at .00005 boundaries; integer sums never do)
            F.sum(F.round(F.col("l_discount") * 100).cast("long")).alias("sum_disc_x100"),
        )
        .orderBy("l_orderkey")
    )


def window_rownum_orders(spark: SparkSession, sf: str) -> DataFrame:
    """W3 per-group numbering (word_num/line_num regeneration,
    parse-tsv-output.function.ts:117-120): latest 3 orders per customer."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    )


def session_gap_events(spark: SparkSession, sf: str) -> DataFrame:
    """W1(b,c) machinery: lag + gap-flag + cumulative-sum sessionization over
    events (the window half of reading-order clustering; the greedy half is
    kernel-only, SURVEY §2.5 W1)."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = F.when(epoch - F.lag(epoch).over(w) > 1800, 1).otherwise(0)
    sess = ev.withColumn("new_sess", gap).withColumn(
        "session_id", F.sum("new_sess").over(w)
    )
    # value quantized to exact integer cents: engine-order-independent sums
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_x100"),
        )
        .orderBy("user_id", "session_id")
    )


def topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (result-slicing analog,
    scripts/test/test-ocr.sh:175-190)."""
    orders = load(spark, sf, "orders")
    return orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).select(
        "o_orderkey", "o_totalprice"
    ).limit(10)


def min_by_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """A6 first/lookup aggregate (dataLines.find(level==1),
    parse-tsv-output.function.ts:144): cheapest supplier per nation with a
    deterministic (acctbal, suppkey) tiebreak."""
    sup = load(spark, sf, "supplier")
    return (
        sup.groupBy("s_nationkey")
        .agg(F.min_by("s_name", F.struct("s_acctbal", "s_suppkey")).alias("cheapest"))
        .orderBy("s_nationkey")
    )


def union_by_name(spark: SparkSession, sf: str) -> DataFrame:
    """§2.6 unionByName: text-branch and tool-branch rows landing in one typed
    table (the words/codes combine re-modeled as a tagged union)."""
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("id"), F.lit("doc").alias("src"), F.col("n_chars").cast("long").alias("n")
    )
    ev = load(spark, sf, "events").select(
        F.col("event_id").alias("id"), F.lit("event").alias("src")
    )
    u = docs.unionByName(ev, allowMissingColumns=True)
    return (
        u.groupBy("src")
        .agg(F.count("*").alias("n_rows"), F.sum("n").alias("sum_n"))
        .orderBy("src")
    )


def scalar_sampler(spark: SparkSession, sf: str) -> DataFrame:
    """§2.7 scalar-function surface over documents: split/lower/trim/regexp/
    least/greatest/abs/concat_ws/length — the reference's complete scalar
    vocabulary in one projection."""
    docs = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.length(F.lower(F.trim("text"))).alias("len_lower"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.regexp_count("text", F.lit("the")).alias("n_the"),
        F.least("n_chars", F.lit(200)).alias("len_capped"),
        F.greatest("n_chars", F.lit(200)).alias("len_floor"),
        F.abs(F.col("n_chars") - 300).alias("len_dist"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.substring("text", 1, 16).alias("prefix"),
        F.upper("lang").alias("lang_upper"),
        F.col("text").startswith("key").cast("int").alias("starts_key"),
    ).orderBy("doc_id")


def from_json_events(spark: SparkSession, sf: str) -> DataFrame:
    """P12 JSON options parse (JSON.parse of the request body,
    image-recognition.controller.ts:101-106) with explicit extraction —
    no schema inference."""
    ev = load(spark, sf, "events")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .filter(F.col("k") > 50)
        .orderBy("event_id")
    )


def unbase64_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S2 base64 buffer ingest (Buffer.from(image,'base64'),
    image-recognition.controller.ts:172) + P10 binary→UTF-8 decode
    (TextDecoder().decode(symbol.data), code-reader.service.ts:74-77):
    encode → base64 → unbase64 → decode must round-trip the text."""
    docs = load(spark, sf, "documents")
    payload = F.unbase64(F.base64(F.encode("text", "utf-8")))
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.decode(payload, "utf-8").substr(1, 12).alias("decoded_prefix"),
        (F.decode(payload, "utf-8") == F.col("text")).cast("int").alias("roundtrip_ok"),
    ).orderBy("doc_id")


def hash_key_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """P11 deterministic surrogate ids (nanoid replacement,
    nanoid.function.ts:7-10): sha2 over a '|'-joined natural key."""
    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.substring(
            F.sha2(F.concat_ws("|", "l_orderkey", "l_linenumber"), 256), 1, 16
        ).alias("row_id"),
    ).orderBy("l_orderkey", "l_linenumber")


def baseline_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """P7+P8 regex descender predicate + conditional baseline arithmetic
    (parse-tsv-output.function.ts:66-90) over real text."""
    from ..kernel import DESCENDER_REGEX

    docs = load(spark, sf, "documents")
    has_desc = F.lower(F.col("text")).rlike(DESCENDER_REGEX)
    n = F.col("n_chars").cast("double")
    return docs.select(
        "doc_id",
        has_desc.cast("int").alias("has_desc"),
        F.round(F.when(has_desc, n * 0.77).otherwise(n), 4).alias("baseline_px"),
    ).orderBy("doc_id")


def join_two_branches(spark: SparkSession, sf: str) -> DataFrame:
    """J4 two-branch fan-out + recombine (Promise.all words/codes,
    image-recognition.service.ts:164-182): two independent aggregates over the
    same scan, recombined by full outer equi-join."""
    ev = load(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.count("*").alias("n_clicks")
    )
    b = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.count("*").alias("n_views")
    )
    return (
        a.join(b, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_views", F.lit(0)).alias("n_views"),
        )
        .orderBy("user_id")
    )


def admission_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P1 admission predicates (image-recognition.controller.ts:83-121): the
    reject-chain (no file / wrong mimetype / oversized / invalid strategy)
    re-expressed as one conjunctive validation filter — all predicates are
    pushed to the parquet scan by Catalyst (PushedFilters)."""
    docs = load(spark, sf, "documents")
    return (
        docs.filter(
            F.col("text").isNotNull()
            & (F.length("text") <= F.lit(100_000))
            & F.col("lang").isin("en", "de")
            & F.col("source").startswith("c")
            & (F.col("n_chars") > F.lit(50))
        )
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


def to_json_assembly(spark: SparkSession, sf: str) -> DataFrame:
    """S10 JSON document assembly (image-recognition.service.ts:179-182,
    311): nested struct-of-arrays built with sorted collect_list, serialized
    with to_json — the OcrProcessResult envelope shape."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("l_linenumber")).alias("lines"))
        .select(
            "l_orderkey",
            F.to_json(
                F.struct(
                    F.col("l_orderkey").alias("order"),
                    F.col("lines").alias("lines"),
                    F.size("lines").alias("n"),
                )
            ).alias("doc_json"),
        )
        .orderBy("l_orderkey")
    )


def window_hourly_events(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling event-time windows (6 h) per event type — the batch twin of
    the streaming windowed aggregation (SURVEY §2.8): ``F.window`` compiles
    to a plain projection of the bucket start (epoch-aligned), so the whole
    query is one keyed groupBy with map-side partial aggregation.  The value
    sum is quantized (round(v*100) cents) for order-independent exactness;
    the window start is emitted as epoch micros (engine-portable)."""
    ev = load(spark, sf, "events")
    w = F.window(F.col("ts"), "6 hours")
    out = (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_x100"),
        )
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value_x100",
        )
    )
    return ordered(out, "window_start_us", "event_type")


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: long event rows → one wide row per user with per-type count
    and quantized value sum.  The type list is EXPLICIT — at scale, pivot
    without values runs an extra distinct-scan job over the full input just
    to discover the column set; pinning it keeps the query one pass.  Nulls
    from absent (user, type) cells are canonicalized to 0 so the result is
    engine-portable."""
    ev = load(spark, sf, "events")
    p = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sx100"),
        )
    )
    cols = [F.col("user_id")]
    for t in EVENT_TYPES:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"{t}_n"))
        cols.append(
            F.coalesce(F.col(f"{t}_sx100"), F.lit(0)).cast("long").alias(f"{t}_sx100")
        )
    return ordered(p.select(*cols), "user_id")


def value_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact ordered statistics per event type: percentile_disc picks an
    actual input value (no interpolation), so Spark and any ANSI engine
    agree bit-for-bit on doubles — the safe exact-percentile choice for
    cross-engine checks.  One hash aggregate; the per-group sort is
    Spark-internal (UnsafeExternalSorter, spills)."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90"),
            F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("p99"),
            F.round(F.min("value"), 4).alias("vmin"),
            F.round(F.max("value"), 4).alias("vmax"),
        )
        .orderBy("event_type")
    )


def map_headers(spark: SparkSession, sf: str) -> DataFrame:
    """§2.7 map surface: the reference's single map-typed value is the
    webhook ``callbackHeaders`` spread (``{...defaults, ...custom}``,
    image-recognition.service.ts:464-467; Record<string,string>,
    return-strategy.types.ts:6) — here as create_map + map_concat with the
    merged map serialized to JSON (stable insertion order) and one key
    probed via element_at."""
    docs = load(spark, sf, "documents")
    base = F.create_map(
        F.lit("content-type"), F.lit("application/json"),
        F.lit("x-lang"), F.col("lang"),
    )
    extra = F.create_map(F.lit("x-source"), F.col("source"))
    merged = F.map_concat(base, extra)
    out = docs.select(
        "doc_id",
        F.to_json(merged).alias("headers_json"),
        F.element_at(merged, F.lit("x-lang")).alias("lang_header"),
        F.size(F.map_keys(merged)).alias("n_headers"),
    )
    return ordered(out, "doc_id")


def event_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type 3-sigma outlier flags over the event stream, computed with
    an EXACT integer sigma test: values quantize to v100 = round(value*100)
    (away-from-zero, the engine-portable rule), and |v - mean| > 3*stddev is
    evaluated as (n*v - s)^2 > 9*(n*q - s^2) in widened DECIMAL(38,0)
    arithmetic — no division, no sqrt, no float anywhere, so the flag is
    bit-identical across engines even exactly on the boundary.

    Scale shape: one map-side-combined aggregate produces a per-type stats
    row (cardinality = event-type vocabulary, tiny at any scale) that
    broadcasts back onto the stream — the big side never shuffles.  Sums
    aggregate in DECIMAL(38,0) (never int64 — a BIGINT sum of squares
    wraps silently in non-ANSI Spark while DuckDB raises, breaking the
    bit-identity claim); the 38-digit envelope holds through dev² for
    |v100| <= ~1e6 at up to ~1e12 rows per type."""
    ev = load(spark, sf, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(v100 AS DECIMAL(38,0))")).alias("s"),
        F.sum(F.expr("CAST(v100 AS DECIMAL(38,0)) * v100")).alias("q"),
    )
    dev = "(CAST(n AS DECIMAL(38,0)) * v100 - s)"
    var = "(CAST(n AS DECIMAL(38,0)) * q - s * s)"
    out = ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "v100",
        F.expr(
            f"CAST(CASE WHEN {dev} * {dev} > 9 * {var} THEN 1 ELSE 0 END AS INT)"
        ).alias("is_outlier"),
    )
    return ordered(out, "event_id")


def retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention over the event stream: users are cohorted by their
    first active day; each (cohort_day, day_offset) cell counts the cohort
    members active that many days later — the classic activation/retention
    triangle of product analytics.

    Scale shape: distinct (user, day) first (the big shuffle, on a
    two-column natural key that map-side combines), then a user-keyed min
    for the cohort, a user-keyed join (co-partitioned with the agg that
    produced it), and a final (cohort, offset) count where rows are
    already one-per-user — COUNT(*), no COUNT DISTINCT state."""
    ev = (
        load(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    out = (
        ev.join(first, "user_id")
        .groupBy(
            # midnight timestamp, not DATE: the portable cross-engine form
            # (pandas reads a DuckDB DATE as a Timestamp already)
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )
    return ordered(out, "cohort_day", "day_offset")
