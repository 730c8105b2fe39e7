"""Text-analysis operators for a large-scale training-data pipeline:
language ID, quality scoring, token counting, document fingerprinting.
All JVM-side (built-in functions, whole-stage codegen) — no Python on the
hot path; each has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load

# shared with the DuckDB oracles in __spark_entry__
EN_STOPWORDS = r"\b(the|and|of|to|in|is|that|for|with|was|on)\b"
DE_STOPWORDS = r"\b(der|die|das|und|ist|von|mit|für|auf|ein|nicht)\b"
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
FP_MOD = 1_000_000_007
FP_BASE = 31


def lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """n-gram/stopword-ratio language heuristic; ties → 'en'."""
    docs = load(spark, sf, "documents")
    en = F.regexp_count(F.lower("text"), F.lit(EN_STOPWORDS))
    de = F.regexp_count(F.lower("text"), F.lit(DE_STOPWORDS))
    return docs.select(
        "doc_id",
        en.alias("en_hits"),
        de.alias("de_hits"),
        F.when(en >= de, "en").otherwise("de").alias("lang_guess"),
    ).orderBy("doc_id")


def quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality score in [0,1]:
    the boilerplate-vs-main-content classification signal, JVM-side."""
    docs = load(spark, sf, "documents")
    n = F.length("text").cast("double")
    n_punct = F.regexp_count("text", F.lit(r"[^\w\s]")).cast("double")
    n_stop = F.regexp_count(F.lower("text"), F.lit(EN_STOPWORDS)).cast("double")
    n_tok = F.size(F.split("text", " ")).cast("double")
    punct_ratio = n_punct / n
    stop_ratio = n_stop / n_tok
    len_score = F.least(n / F.lit(400.0), F.lit(1.0))
    score = F.round(
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * (1 - F.least(punct_ratio * 10, F.lit(1.0))),
        4,
    )
    return docs.select(
        "doc_id",
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        score.alias("quality"),
    ).orderBy("doc_id")


def token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex token count."""
    docs = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("ws_tokens"),
        F.regexp_count("text", F.lit(BPE_ISH)).alias("bpe_tokens"),
    ).orderBy("doc_id")


def doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling-hash fingerprint per document: h = fold(h*31 + codepoint) mod
    1e9+7 — order-sensitive (detects transpositions md5 of sorted tokens
    would miss); intermediates stay < 2^63 so Spark's long and DuckDB's
    BIGINT agree exactly."""
    docs = load(spark, sf, "documents")
    fp = F.expr(
        f"aggregate(transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1))), "
        f"0L, (acc, c) -> pmod(acc * {FP_BASE} + c, {FP_MOD}))"
    )
    return docs.select("doc_id", fp.alias("fp")).orderBy("doc_id")
