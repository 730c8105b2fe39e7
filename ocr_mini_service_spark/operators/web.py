"""Web-provenance operators for a crawl-derived training corpus: URL
canonicalization, registrable-domain rollups, and a link-graph PageRank
step.  The standard provenance gates of CCNet/RefinedWeb-style pipelines —
URL-level dedup needs a canonical form (scheme/host case, default ports,
tracking parameters, fragments, trailing slashes are all display noise),
quality and spam policies act per REGISTRABLE domain (one label below the
public suffix), and centrality scores come from the hyperlink graph.

All JVM-side (built-in functions, whole-stage codegen) — no Python anywhere;
every operator has a DuckDB oracle that re-implements the parse
independently (regexp + list ops on the raw URL string, never shared code).

Scale notes: canonicalization is a single-scan projection (no shuffle);
domain_stats is a two-level keyed aggregate (distinct-first, so no
COUNT-DISTINCT state explosion on a hot domain); pagerank_step is the
classic one keyed shuffle per iteration (groupBy dst) plus a co-keyed
left join back to the vertex set — contributions are integer basis points,
so the result is bit-stable under any partitioning/addition order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ordered
from .sketches import _hex_int
from ..sources import load

# second-level public suffixes the domain heuristic recognizes (a stand-in
# for the full Mozilla PSL, which is a data file, not an algorithm; at
# production scale this is a broadcast lookup table built from the PSL)
SLD_SUFFIXES = ("co.uk", "ac.uk", "gov.uk", "com.au", "co.jp")

# URL-collapse duplicate rate over a (key, canon_url)-grouped frame with a
# per-group n_copies count, in integer basis points — shared by
# domain_stats and domain_policy (and their oracles via _DUP_BP_SQL below)
_DUP_BP_EXPR = "(sum(n_copies) - count(*)) * 10000 div sum(n_copies)"
_DUP_BP_SQL = (
    "CAST((CAST(SUM(n_copies) AS BIGINT) - COUNT(*)) * 10000\n"
    "                // CAST(SUM(n_copies) AS BIGINT) AS BIGINT)"
)

TLDS = ("com", "org", "co.uk", "de")  # synthetic-URL TLD pool
EDGE_MAX_OUT = 3  # synthetic link graph: 1..EDGE_MAX_OUT outbound edges
PR_DAMP_NUM = 85  # damping 0.85 as integer percent
PR_BASE_BP = 1500  # (1 - d) in basis points
PR_RANK0_BP = 10000  # uniform initial rank, basis points


def _b(hx: Column, i: int) -> Column:
    """Byte ``i`` of an md5 hex column (0-based), as a BIGINT."""
    return _hex_int(hx, 2 * i + 1, 2)


def _materialize(df: DataFrame) -> DataFrame:
    """Codegen barrier for a multiply-consumed derived layer: persist +
    count so downstream plans read an InMemoryRelation leaf instead of
    re-inlining the canonicalizer's full regex expression tree into every
    consumer (measured 19x on url_dedup — codegen compilation + AQE
    re-planning of the huge generated methods dominated wall-clock).

    persist(), NOT localCheckpoint(): cached blocks keep their lineage, so
    on a real cluster an executor loss or dynamic-allocation decommission
    recomputes the partition instead of failing the job, and the blocks
    are evictable under memory pressure rather than pinned for the session
    (localCheckpoint blocks are neither).  The count() materializes
    eagerly so the barrier is in place before the first consumer plans."""
    df = df.persist()
    df.count()
    return df


# re-fetch overlay: every REFETCH_MOD-th doc is crawled a second time under
# doc_id + REFETCH_OFF — same URL IDENTITY (scheme value, host, tld, real
# port, path, surviving query params), freshly rolled DISPLAY NOISE (www
# prefix, default port, trailing slash, tracking params, param order,
# fragment) — so canonical-URL dedup has true positives to find.
# The +OFF id-space convention is shared with the other synthetic overlays
# (dedup_incremental +1e6, normalized_dedup +2e6, thumbnail_dedup +3e6) and
# is valid while base doc_ids stay below the offset — true for the whole
# sf ladder (sf0.1 tops out at 5,000 docs); it is a TEST-DATA construct,
# not a production id scheme
REFETCH_MOD = 5
REFETCH_OFF = 4_000_000


def _base_id() -> Column:
    """Fold a crawl-event ``doc_id`` back to its base document identity
    (the +REFETCH_OFF overlay convention) — ONE definition shared by every
    consumer (domain_policy, crawl_frontier_diff) so the fold cannot
    drift; ``BASE_ID_SQL`` is the oracle-side twin."""
    return F.when(
        F.col("doc_id") >= REFETCH_OFF, F.col("doc_id") - REFETCH_OFF
    ).otherwise(F.col("doc_id"))


def base_id_sql(col: str = "doc_id") -> str:
    """Oracle-side twin of ``_base_id`` for any column reference."""
    return (
        f"CASE WHEN {col} >= {REFETCH_OFF} "
        f"THEN {col} - {REFETCH_OFF} ELSE {col} END"
    )


def url_table(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic messy URL per crawl event (one per document plus the
    re-fetch overlay), derived from doc columns and md5 bytes exactly as
    the DuckDB oracle re-derives them: mixed-case scheme, optional WWW
    prefix, a TLD pool including a second-level public suffix, default and
    non-default ports, an optional trailing slash, up to three query
    parameters (one a tracking param) in hash-scrambled order, and an
    optional fragment — every piece of noise the canonicalizer must handle.

    Identity fields (the things canonicalization PRESERVES) hash off the
    base doc_id (``hxi``); display-noise fields hash off the crawl-event id
    (``hxn``) — for base rows the two coincide, for re-fetch rows only the
    noise re-rolls, so the pair shares one canonical URL."""
    docs = load(spark, sf, "documents").select("doc_id", "source", "n_chars")
    base = docs.select(
        F.col("doc_id").alias("out_id"),
        F.col("doc_id").alias("base_id"),
        "source",
        "n_chars",
    )
    refetch = docs.filter(F.col("doc_id") % REFETCH_MOD == 0).select(
        (F.col("doc_id") + REFETCH_OFF).alias("out_id"),
        F.col("doc_id").alias("base_id"),
        "source",
        "n_chars",
    )
    hxi = F.md5(F.concat_ws(":", "base_id", F.lit("url")))
    hxn = F.md5(F.concat_ws(":", "out_id", F.lit("url")))
    d = base.unionByName(refetch).select(
        "out_id", "base_id", "source", "n_chars", hxi.alias("hxi"), hxn.alias("hxn")
    )

    def bi(i: int) -> Column:
        return _b(F.col("hxi"), i)

    def bn(i: int) -> Column:
        return _b(F.col("hxn"), i)

    scheme = F.when(bi(0) % 2 == 0, "https").otherwise("HTTP")
    www = F.when(bn(1) % 3 == 0, "WWW.").otherwise("")
    host_core = F.concat_ws("-", "source", (F.col("base_id") % 7).cast("string"))
    tld = F.element_at(
        F.array(*[F.lit(t) for t in TLDS]), (bi(2) % len(TLDS) + 1).cast("int")
    )
    port = F.when(bi(3) % 4 == 1, ":8080").otherwise(
        F.when(
            bn(3) % 2 == 0,
            F.when(bi(0) % 2 == 0, ":443").otherwise(":80"),
        ).otherwise("")
    )
    path = F.concat(
        F.lit("/p/"),
        (F.col("base_id") % 97).cast("string"),
        F.when(bn(4) % 3 == 0, "/").otherwise(""),
    )
    p_id = F.when(
        bi(8) % 5 != 0,
        F.concat(F.lit("id="), (F.col("base_id") % 13).cast("string")),
    )
    p_utm = F.when(bn(5) % 2 == 0, F.concat(F.lit("utm_source="), F.col("source")))
    p_ref = F.when(
        bi(6) % 3 == 0, F.concat(F.lit("ref="), (bi(6) % 5).cast("string"))
    )
    params = F.filter(F.array(p_id, p_utm, p_ref), lambda x: x.isNotNull())
    params = F.when(bn(7) % 2 == 0, params).otherwise(F.reverse(params))
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise("")
    frag = F.when(
        bn(9) % 4 == 0,
        F.concat(F.lit("#sec"), (bn(9) % 7).cast("string")),
    ).otherwise("")
    url = F.concat(
        scheme, F.lit("://"), www, host_core, F.lit("."), tld, port, path, query, frag
    )
    return d.select(F.col("out_id").alias("doc_id"), "n_chars", url.alias("url"))


def canonicalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``canon_url`` and ``domain`` to a frame with a URL string column.
    Pure string surgery on the URL — lowercased scheme/host, leading
    ``www.`` stripped, default ports (http:80, https:443) dropped while
    real ports survive, trailing path slashes trimmed, tracking parameters
    (``utm_*``, ``fbclid``) removed, surviving query parameters sorted,
    fragment dropped.  ``domain`` is the registrable domain: two labels,
    or three when the two-label suffix is a recognized second-level public
    suffix (SLD_SUFFIXES).  Everything is built-in Spark functions so the
    projection stays inside whole-stage codegen; the DuckDB oracle
    re-implements the same surgery with RE2 + list functions."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z]+)://", 1))
    # authority minus userinfo ("user:pass@host" would otherwise leak the
    # userinfo into host parsing); '@' cannot appear unencoded elsewhere
    # in the authority
    hostport = F.regexp_replace(
        F.regexp_extract(u, r"^[a-zA-Z]+://([^/?#]+)", 1), r"^[^@]*@", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path = F.regexp_extract(u, r"^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    cpath = F.regexp_replace(path, r"/+$", "")
    # the query must start BEFORE any '#': scan only [^#?] up to the '?',
    # else a '?' inside the fragment ("/page#/route?tab=2") would leak
    # fragment text into the canonical query string
    qraw = F.regexp_extract(u, r"^[^#?]*\?([^#]*)", 1)
    qkeep = F.array_sort(
        F.filter(
            F.split(qraw, "&"),
            lambda x: (x != "")
            & ~x.startswith("utm_")
            & ~x.startswith("fbclid"),
        )
    )
    keep_port = (port != "") & ~(
        ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    staged = df.withColumn("scheme_c", scheme).withColumn(
        # bracketed IPv6 literals keep their colons; otherwise the host is
        # everything before the port colon
        "host_raw",
        F.lower(F.regexp_extract(hostport, r"^(\[[^\]]*\]|[^:]+)", 1)),
    )
    staged = staged.withColumn(
        "host_c",
        F.when(
            F.col("host_raw").startswith("www."), F.expr("substring(host_raw, 5)")
        ).otherwise(F.col("host_raw")),
    )
    canon = F.concat(
        F.col("scheme_c"),
        F.lit("://"),
        F.col("host_c"),
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        cpath,
        F.when(
            F.size(qkeep) > 0, F.concat(F.lit("?"), F.array_join(qkeep, "&"))
        ).otherwise(""),
    )
    labels = F.split(F.col("host_c"), r"\.")
    n = F.size(labels)
    suffix2 = F.concat_ws(
        ".", F.element_at(labels, n - 1), F.element_at(labels, n)
    )
    # the n < 2 branch must come FIRST: CaseWhen short-circuits branch
    # evaluation in order, and suffix2 contains element_at(labels, 0) for a
    # single-label host ("localhost"), which ANSI Spark rejects at runtime
    domain = (
        F.when(n < 2, F.col("host_c"))
        .when(
            suffix2.isin(*SLD_SUFFIXES) & (n >= 3),
            F.concat_ws(".", F.element_at(labels, n - 2), suffix2),
        )
        .otherwise(suffix2)
    )
    return staged.withColumn("canon_url", canon).withColumn("domain", domain).drop(
        "scheme_c", "host_raw", "host_c"
    )


def url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document URL canonicalization: the messy synthetic URL, its
    canonical form, and the registrable domain.

    Scale shape: one scan, one codegen'd projection, zero shuffles before
    the presentation sort — runs at parquet-read speed on any corpus."""
    out = canonicalize(url_table(spark, sf)).select(
        "doc_id", "url", "canon_url", "domain"
    )
    return ordered(out, "doc_id")


def domain_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Registrable-domain rollup: document count, distinct canonical URLs,
    URL-collapse duplicate rate (how much of the domain's crawl is the
    same page re-fetched under display-noise variants), and total
    characters — the per-domain table a crawl-curation policy joins
    against (domain caps, spam domain cuts).

    Scale shape: distinct-first two-level aggregate — (domain, canon_url)
    partial-aggregates map-side BEFORE the shuffle, so a hot domain
    arrives pre-collapsed and no COUNT DISTINCT state is kept; the
    second level is a plain keyed agg on the first's output."""
    per_url = (
        canonicalize(url_table(spark, sf))
        .groupBy("domain", "canon_url")
        .agg(F.count("*").alias("n_copies"), F.sum("n_chars").alias("chars"))
    )
    out = per_url.groupBy("domain").agg(
        F.sum("n_copies").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_urls"),
        F.expr(_DUP_BP_EXPR).cast("long").alias("dup_bp"),
        F.sum("chars").cast("long").alias("n_chars"),
    )
    return ordered(out, "domain")


def pagerank_step(spark: SparkSession, sf: str) -> DataFrame:
    """One PageRank power-iteration step over a deterministic synthetic
    link graph (each doc emits 1..EDGE_MAX_OUT md5-derived edges into the
    same corpus), in exact integer basis points:

        rank1(v) = PR_BASE_BP + (PR_DAMP_NUM * Σ_{u→v} (PR_RANK0_BP div
                   out_deg(u))) div 100

    The per-edge share is integer-divided BEFORE the sum, and the damping
    factor applied once AFTER it, so the result is independent of
    addition order — bit-stable across partitionings and engines.

    Scale shape: the textbook distributed PageRank step — edges explode
    JVM-side from the vertex scan (no driver materialization), ONE keyed
    shuffle groups contributions by destination, and the rank join back
    to the vertex set is co-keyed on doc_id.  The corpus-size scalar is a
    1-row broadcast.  Per iteration at 100 TB: one shuffle of the edge
    list, nothing quadratic, no driver state."""
    docs = load(spark, sf, "documents").select("doc_id")
    n_total = docs.agg(F.count("*").alias("n_total"))
    hx_deg = F.md5(F.concat_ws(":", "doc_id", F.lit("deg")))
    verts = docs.withColumn("out_deg", (_b(hx_deg, 0) % EDGE_MAX_OUT + 1).cast("int"))
    edges = (
        verts.crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            "out_deg",
            "n_total",
            F.explode(F.sequence(F.lit(0), F.col("out_deg") - 1)).alias("k"),
        )
        .select(
            (
                _hex_int(
                    F.md5(F.concat_ws(":", "doc_id", "k", F.lit("edge"))), 1, 12
                )
                % F.col("n_total")
            ).alias("dst"),
            F.expr(f"{PR_RANK0_BP} div out_deg").alias("share"),
        )
    )
    inbound = edges.groupBy("dst").agg(
        F.sum("share").alias("s"), F.count("*").alias("n_in")
    )
    out = (
        verts.join(inbound, verts.doc_id == inbound.dst, "left")
        .select(
            "doc_id",
            "out_deg",
            F.coalesce("n_in", F.lit(0)).cast("long").alias("n_in"),
            (
                F.lit(PR_BASE_BP)
                + F.expr(f"({PR_DAMP_NUM} * coalesce(s, 0)) div 100")
            )
            .cast("long")
            .alias("rank_bp"),
        )
    )
    return ordered(out, "doc_id")


def url_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical-URL dedup — the FIRST dedup rung of every crawl pipeline
    (before any content hashing): re-fetches of the same page under
    display-noise URL variants collapse onto one keeper, the minimum doc_id
    per canonical URL.

    Scale shape: the ``line_dedup`` keeper principle — ``groupBy(canon_url)
    .agg(min)`` + equi-join mark-back, NEVER a window over the URL key: a
    page re-crawled 10^6 times collapses in the map-side partial aggregate
    instead of sorting in one task.  The (doc_id, canon_url) layer is
    materialized ONCE before the self-join (``_materialize``: recoverable
    persist barrier): without it the canonicalization's full regex
    expression tree is inlined into BOTH join branches and the keeper
    aggregate, and the resulting huge generated methods dominate
    wall-clock via codegen compilation and AQE re-planning (measured 19x
    on this query — 8.3 s -> 0.4 s at sf0.1); production would persist
    the canonical URL table at this seam anyway."""
    urls = _materialize(
        canonicalize(url_table(spark, sf)).select("doc_id", "canon_url")
    )
    keep = urls.groupBy("canon_url").agg(
        F.min("doc_id").cast("long").alias("kept_doc_id")
    )
    out = urls.join(keep, "canon_url").select(
        "doc_id",
        "canon_url",
        "kept_doc_id",
        (F.col("doc_id") != F.col("kept_doc_id")).cast("int").alias("is_dup"),
    )
    return ordered(out, "doc_id")


# domain-gate thresholds (exact integers; chosen so the sf tables exercise
# all three verdicts)
POLICY_QUAL_MIN_C = 750  # drop domains whose mean quality score < 7.50
POLICY_CAP_DOCS = 2  # cap domains crawled more often than this
POLICY_DUP_MAX_BP = 2000  # cap domains whose crawl is >20% URL-duplicate


def domain_policy(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-level curation gate — the step a crawl pipeline applies
    BEFORE per-document filtering: per registrable domain, crawl volume,
    URL-duplicate rate, and mean document quality (the
    ``quality_classifier`` score), thresholded into keep / cap / drop.
    Low mean quality drops the whole domain (spam-domain cut); high volume
    or high dup rate marks it for capping (``source_cap`` shape).

    Scale shape: a doc-keyed equi join of the URL layer onto the quality
    signals (both corpus-scale, co-keyed — one shuffle each), then the
    ``domain_stats`` distinct-first two-level aggregate; verdicts are
    integer threshold CASEs on the domain-sized result."""
    from .corpus import _quality_score, gopher_flags

    urls = canonicalize(url_table(spark, sf)).select(
        "doc_id",
        "domain",
        "canon_url",
        # a re-fetch carries its base document's content, so quality joins
        # on the base identity
        _base_id().alias("base_id"),
    )
    qual = gopher_flags(load(spark, sf, "documents")).select(
        F.col("doc_id").alias("base_id"), _quality_score().alias("q")
    )
    per_url = (
        urls.join(qual, "base_id")
        .groupBy("domain", "canon_url")
        .agg(F.count("*").alias("n_copies"), F.sum("q").alias("q_sum"))
    )
    dom = per_url.groupBy("domain").agg(
        F.sum("n_copies").cast("long").alias("n_docs"),
        F.expr(_DUP_BP_EXPR).cast("long").alias("dup_bp"),
        F.expr("(sum(q_sum) * 100) div sum(n_copies)").cast("long").alias("mean_q_c"),
    )
    policy = (
        F.when(F.col("mean_q_c") < POLICY_QUAL_MIN_C, "drop")
        .when(
            (F.col("n_docs") > POLICY_CAP_DOCS)
            | (F.col("dup_bp") > POLICY_DUP_MAX_BP),
            "cap",
        )
        .otherwise("keep")
    )
    out = dom.select("domain", "n_docs", "dup_bp", "mean_q_c", policy.alias("policy"))
    return ordered(out, "domain")


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (__spark_entry__.oracle_sql composes these).  The
# oracle re-derives the synthetic URL from the documents table and then
# re-implements the canonicalization with RE2 + list functions — shared
# CONSTANTS, no shared code.  Spark's conv(substr(md5,..),16,10) equals
# DuckDB's ('0x' || substr(md5,..))::BIGINT bit-for-bit.
# ---------------------------------------------------------------------------

_SLD_SQL = ", ".join(f"'{s}'" for s in SLD_SUFFIXES)
_TLD_SQL = "[" + ", ".join(f"'{t}'" for t in TLDS) + "]"
_BI_SQL = ",\n           ".join(
    f"('0x' || substr(hxi, {2 * i + 1}, 2))::BIGINT AS bi{i}" for i in (0, 2, 3, 6, 8)
)
_BN_SQL = ",\n           ".join(
    f"('0x' || substr(hxn, {2 * i + 1}, 2))::BIGINT AS bn{i}" for i in (1, 3, 4, 5, 7, 9)
)

# ends with a CTE named web_urls(doc_id, n_chars, url, canon_url, domain);
# identity bytes (bi*) hash off the base doc, noise bytes (bn*) off the
# crawl-event id — the re-fetch overlay re-rolls only the noise
URL_CTES = f"""
uids AS (
    SELECT doc_id AS out_id, doc_id AS base_id, source, n_chars FROM documents
    UNION ALL
    SELECT doc_id + {REFETCH_OFF}, doc_id, source, n_chars FROM documents
    WHERE doc_id % {REFETCH_MOD} = 0),
u0 AS (
    SELECT out_id, base_id, source, n_chars,
           md5(base_id::VARCHAR || ':url') AS hxi,
           md5(out_id::VARCHAR || ':url') AS hxn
    FROM uids),
ub AS (
    SELECT out_id, base_id, source, n_chars,
           {_BI_SQL},
           {_BN_SQL}
    FROM u0),
uparts AS (
    SELECT out_id, n_chars, bn7, bn9,
           CASE WHEN bi0 % 2 = 0 THEN 'https' ELSE 'HTTP' END AS scheme,
           CASE WHEN bn1 % 3 = 0 THEN 'WWW.' ELSE '' END AS www,
           source || '-' || (base_id % 7)::VARCHAR AS host_core,
           ({_TLD_SQL})[(bi2 % {len(TLDS)} + 1)::INT] AS tld,
           CASE WHEN bi3 % 4 = 1 THEN ':8080'
                WHEN bn3 % 2 = 0 THEN
                    (CASE WHEN bi0 % 2 = 0 THEN ':443' ELSE ':80' END)
                ELSE '' END AS port,
           '/p/' || (base_id % 97)::VARCHAR ||
               (CASE WHEN bn4 % 3 = 0 THEN '/' ELSE '' END) AS path,
           list_filter([
               CASE WHEN bi8 % 5 != 0 THEN 'id=' || (base_id % 13)::VARCHAR END,
               CASE WHEN bn5 % 2 = 0 THEN 'utm_source=' || source END,
               CASE WHEN bi6 % 3 = 0 THEN 'ref=' || (bi6 % 5)::VARCHAR END
           ], x -> x IS NOT NULL) AS params0
    FROM ub),
urls AS (
    SELECT out_id AS doc_id, n_chars,
           scheme || '://' || www || host_core || '.' || tld || port || path ||
           (CASE WHEN len(p) > 0 THEN '?' || array_to_string(p, '&')
                 ELSE '' END) ||
           (CASE WHEN bn9 % 4 = 0 THEN '#sec' || (bn9 % 7)::VARCHAR
                 ELSE '' END) AS url
    FROM (SELECT *, CASE WHEN bn7 % 2 = 0 THEN params0
                         ELSE list_reverse(params0) END AS p
          FROM uparts)),
cparts AS (
    SELECT doc_id, n_chars, url,
           lower(regexp_extract(url, '^([a-zA-Z]+)://', 1)) AS scheme_c,
           regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1) AS hostport,
           regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1) AS path_raw,
           regexp_extract(url, '^[^#?]*\\?([^#]*)', 1) AS qraw
    FROM urls),
cparts2 AS (
    SELECT doc_id, n_chars, url, scheme_c,
           CASE WHEN starts_with(lower(regexp_extract(hostport, '^([^:]+)', 1)), 'www.')
                THEN substr(lower(regexp_extract(hostport, '^([^:]+)', 1)), 5)
                ELSE lower(regexp_extract(hostport, '^([^:]+)', 1)) END AS host_c,
           regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
           regexp_replace(path_raw, '/+$', '') AS cpath,
           list_sort(list_filter(string_split(qraw, '&'),
               x -> x != '' AND NOT starts_with(x, 'utm_')
                    AND NOT starts_with(x, 'fbclid'))) AS qkeep
    FROM cparts),
curls AS (
    SELECT doc_id, n_chars, url,
           scheme_c || '://' || host_c ||
           (CASE WHEN port != '' AND NOT ((scheme_c = 'http' AND port = '80')
                    OR (scheme_c = 'https' AND port = '443'))
                 THEN ':' || port ELSE '' END) || cpath ||
           (CASE WHEN len(qkeep) > 0 THEN '?' || array_to_string(qkeep, '&')
                 ELSE '' END) AS canon_url,
           string_split(host_c, '.') AS labels
    FROM cparts2),
web_urls AS (
    SELECT doc_id, n_chars, url, canon_url,
           CASE WHEN len(labels) < 2 THEN labels[1]
                WHEN len(labels) >= 3
                     AND (labels[-2] || '.' || labels[-1]) IN ({_SLD_SQL})
                THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                ELSE labels[-2] || '.' || labels[-1] END AS domain
    FROM curls)"""

# ends with CTEs verts(doc_id, out_deg) and inbound(dst, s, n_in)
PR_CTES = f"""
n AS (SELECT COUNT(*) AS n_total FROM documents),
verts AS (
    SELECT doc_id,
           (('0x' || substr(md5(doc_id::VARCHAR || ':deg'), 1, 2))::BIGINT
               % {EDGE_MAX_OUT} + 1)::INT AS out_deg
    FROM documents),
edges AS (
    SELECT ('0x' || substr(md5(v.doc_id::VARCHAR || ':' || k::VARCHAR
                               || ':edge'), 1, 12))::BIGINT
               % (SELECT n_total FROM n) AS dst,
           {PR_RANK0_BP} // out_deg AS share
    FROM verts v, unnest(generate_series(0, v.out_deg - 1)) AS t(k)),
inbound AS (
    SELECT dst, CAST(SUM(share) AS BIGINT) AS s, COUNT(*) AS n_in
    FROM edges GROUP BY dst)"""


# frontier-diff synthesis: base_id % FRONTIER_MOD picks the snapshot-B fate
# (0 gone / 1 content changed / 2 also spawns a new URL / else stable)
FRONTIER_MOD = 9


def crawl_frontier_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental crawl maintenance — the snapshot diff a re-crawl
    scheduler runs between two frontier states at CANONICAL-URL
    granularity: which pages appeared, vanished, changed content, or held
    stable since the last crawl.  Snapshot A is the current URL layer;
    snapshot B is a deterministic overlay (every FRONTIER_MOD-th base doc
    is gone, the next class re-crawls with changed content, the next also
    publishes a fresh URL).  Per canonical URL: the registrable domain and
    the status verdict — the table ``dedup_incremental`` /
    ``curation_incremental`` consume one level down.

    Scale shape: the textbook snapshot-diff plan — each snapshot collapses
    to one row per canonical URL in a keyed aggregate with map-side
    combine (content fingerprint = min md5 over the group, so hot re-fetch
    groups pre-collapse), then ONE key-partitioned FULL OUTER join; status
    is a null-ness/fingerprint CASE.  Nothing quadratic, no driver state;
    at 100 TB both sides shuffle once on the URL key.  The fingerprinted
    row layer feeds THREE consumers (snapshot A, B's survivors, B's new
    URLs), so it is materialized once via the same recoverable
    ``_materialize`` persist barrier as ``url_dedup`` (one materialization
    replaces three corpus scans at scale)."""
    u = canonicalize(url_table(spark, sf)).select("doc_id", "canon_url", "domain")
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("base_id"), "text"
    )
    rows = _materialize(
        u.select("canon_url", "domain", _base_id().alias("base_id"))
        .join(docs, "base_id")
        .select(
            "canon_url",
            "domain",
            (F.col("base_id") % FRONTIER_MOD).alias("m9"),
            F.md5("text").alias("fp"),
            F.md5(F.concat(F.col("text"), F.lit(":v2"))).alias("fp2"),
            F.md5(F.concat(F.col("text"), F.lit(":new"))).alias("fpn"),
        )
    )
    a = rows.groupBy("canon_url").agg(
        F.min("fp").alias("fp_a"), F.min("domain").alias("dom_a")
    )
    b_surv = rows.filter(F.col("m9") != 0).select(
        "canon_url",
        "domain",
        F.when(F.col("m9") == 1, F.col("fp2")).otherwise(F.col("fp")).alias("fpb"),
    )
    b_new = rows.filter(F.col("m9") == 2).select(
        F.concat(F.col("canon_url"), F.lit("/v2")).alias("canon_url"),
        "domain",
        F.col("fpn").alias("fpb"),
    )
    b = (
        b_surv.unionByName(b_new)
        .groupBy("canon_url")
        .agg(F.min("fpb").alias("fp_b"), F.min("domain").alias("dom_b"))
    )
    d = a.join(b, "canon_url", "full_outer")
    status = (
        F.when(F.col("fp_a").isNull(), "new")
        .when(F.col("fp_b").isNull(), "gone")
        .when(F.col("fp_a") != F.col("fp_b"), "changed")
        .otherwise("stable")
    )
    out = d.select(
        "canon_url",
        F.coalesce("dom_a", "dom_b").alias("domain"),
        status.alias("status"),
    )
    return ordered(out, "canon_url")
