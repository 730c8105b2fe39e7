"""Hierarchy rollup — the reference's documented lines/paragraphs/blocks
result model (`/root/reference/docs/api.md:147-159,193-207`, the
``OCRHierarchyElement`` model in `.kiro/steering/tech.md`, consumed by
`scripts/test/test-ocr.sh:175-184`): each level-2/3/4 TSV row becomes a
positioned element whose ``child_ids`` list the contained next-level
elements (block → paragraphs → lines → words), with bboxes normalized by
the page dims and deterministic sha-256 surrogate ids (§1.4: the
reference's nanoids are random, so equality compares geometry, ordering
and linkage, never raw ids).  Word children are the parse-stage words
(trimmed, non-blank level-5 rows — `parse-tsv-output.function.ts:173`),
i.e. pre-overlap-pruning, and their ids use the same recipe as the
extraction kernel, so hierarchy rows cross-link to ``extracted.words``.

Spark expression (SURVEY.md §2.4 A4): one shared block-emission Arrow pass,
page dims distributed by a window max (no join), then one grouped
``min/max``+ordered-``collect_list`` aggregation per level — all JVM-side,
shuffling only the skinny exploded rows on the turn key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .pipeline import _RAW, _emit_blocks

_LEVELS = [
    # (kind, TSV level, grouping keys within a turn, child kind)
    ("block", 2.0, ["block_num"], "paragraph"),
    ("paragraph", 3.0, ["block_num", "par_num"], "line"),
    ("line", 4.0, ["block_num", "par_num", "line_num"], "word"),
]


def _det_id(*cols) -> "F.Column":
    """sha256('|'-joined parts)[:16] — identical to kernel.det_id so ids are
    reproducible across the Arrow kernel, this rollup, and SQL oracles."""
    return F.substring(F.sha2(F.concat_ws("|", *cols), 256), 1, 16)


def _elements(raw: DataFrame, kind: str, level: float, keys: list[str]) -> DataFrame:
    """One hierarchy level's own rows: deterministic id + bbox normalized by
    the page dims (window-distributed from the per-turn meta row)."""
    w = Window.partitionBy("conv_id", "turn_idx")
    dims = raw.withColumn(
        "pw", F.max(F.when(F.col("kind") == "m", F.col("page_w"))).over(w)
    ).withColumn(
        "ph", F.max(F.when(F.col("kind") == "m", F.col("page_h"))).over(w)
    )
    rows = dims.filter((F.col("kind") == "b") & (F.col("level") == level))
    key_cols = [F.col(k).cast("int") for k in keys]
    return rows.select(
        "conv_id",
        "turn_idx",
        *[c.alias(k) for c, k in zip(key_cols, keys)],
        F.col("line_no").alias("emit_ord"),
        _det_id(F.col("conv_id"), F.col("turn_idx"), F.lit(kind), *key_cols).alias("id"),
        (F.col("left_px") / F.col("pw")).alias("left"),
        (F.col("top_px") / F.col("ph")).alias("top"),
        (F.col("width_px") / F.col("pw")).alias("width"),
        (F.col("height_px") / F.col("ph")).alias("height"),
    )


def _children(child_rows: DataFrame, parent_keys: list[str]) -> DataFrame:
    """Ordered child-id lists per parent key (rank = TSV emission order —
    childIds order is document order in the reference model)."""
    return (
        child_rows.groupBy("conv_id", "turn_idx", *parent_keys)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("emit_ord"), F.col("id")))),
                lambda s: s["id"],
            ).alias("child_ids")
        )
    )


def extract_hierarchy(transcripts: DataFrame) -> DataFrame:
    """transcripts → one row per turn: blocks / paragraphs / lines arrays of
    ``struct<id, left, top, width, height, child_ids>`` in document order."""
    raw = transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        _emit_blocks, schema=_RAW
    ).persist()  # four consumers (words + 3 levels); at cluster scale use
    # StorageLevel.MEMORY_AND_DISK or materialize the blocks table instead

    # parse-stage words (level 5, trimmed non-blank) with kernel-compatible ids
    words = raw.filter(
        (F.col("kind") == "b") & (F.col("level") == 5.0) & (F.trim("text") != "")
    ).select(
        "conv_id",
        "turn_idx",
        F.col("block_num").cast("int").alias("block_num"),
        F.col("par_num").cast("int").alias("par_num"),
        F.col("line_num").cast("int").alias("line_num"),
        F.col("line_no").alias("emit_ord"),
        _det_id(
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("block_num").cast("int"),
            F.col("par_num").cast("int"),
            F.col("line_num").cast("int"),
            F.col("word_num").cast("int"),
        ).alias("id"),
    )

    per_level: dict[str, DataFrame] = {}
    child_rows = {"word": words}
    for kind, level, keys, _ in _LEVELS:
        child_rows[kind] = _elements(raw, kind, level, keys)
    for kind, level, keys, child_kind in _LEVELS:
        elems = child_rows[kind]
        kids = _children(child_rows[child_kind], keys)
        enriched = elems.join(kids, ["conv_id", "turn_idx", *keys], "left").select(
            "conv_id",
            "turn_idx",
            "emit_ord",
            F.struct(
                F.col("id"),
                F.col("left"),
                F.col("top"),
                F.col("width"),
                F.col("height"),
                F.coalesce("child_ids", F.expr("CAST(array() AS array<string>)")).alias(
                    "child_ids"
                ),
            ).alias("el"),
        )
        per_level[kind] = enriched.groupBy("conv_id", "turn_idx").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("emit_ord"), F.col("el")))),
                lambda s: s["el"],
            ).alias(f"{kind}s")
        )

    spine = transcripts.select("conv_id", "turn_idx")
    empty = "CAST(array() AS array<struct<id:string,left:double,top:double,width:double,height:double,child_ids:array<string>>>)"
    out = (
        spine.join(per_level["block"], ["conv_id", "turn_idx"], "left")
        .join(per_level["paragraph"], ["conv_id", "turn_idx"], "left")
        .join(per_level["line"], ["conv_id", "turn_idx"], "left")
        .select(
            "conv_id",
            "turn_idx",
            F.coalesce("blocks", F.expr(empty)).alias("blocks"),
            F.coalesce("paragraphs", F.expr(empty)).alias("paragraphs"),
            F.coalesce("lines", F.expr(empty)).alias("lines"),
        )
    )
    return out
