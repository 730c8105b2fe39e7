"""extract_hierarchy vs a serial oracle built directly on
kernel.parse_tsv_blocks — pins the documented block→paragraph→line→word
linkage model (docs/api.md:147-159; OCRHierarchyElement)."""

import pytest

from ocr_mini_service_spark import kernel
from ocr_mini_service_spark.hierarchy import extract_hierarchy
from ocr_mini_service_spark.synth import gen_transcripts

_LEVELS = [
    ("block", 2, ("block_num",), "paragraph"),
    ("paragraph", 3, ("block_num", "par_num"), "line"),
    ("line", 4, ("block_num", "par_num", "line_num"), "word"),
]


def _oracle_turn(conv_id: str, turn_idx: int, text: str) -> dict:
    empty = {"blocks": [], "paragraphs": [], "lines": []}
    try:
        pw, ph, rows = kernel.parse_tsv_blocks(text)
    except Exception:
        return empty
    if not rows:
        return empty

    def keyed(r, keys):
        return tuple(int(r[k]) for k in keys)

    words = [r for r in rows if int(r["level"]) == 5 and r["text"].strip()]
    word_ids = {}
    word_texts: dict[tuple, list] = {}
    for r in words:
        k = (int(r["block_num"]), int(r["par_num"]), int(r["line_num"]))
        word_ids.setdefault(k, []).append(
            (r["line_no"], kernel.det_id(conv_id, turn_idx, int(r["block_num"]),
                                         int(r["par_num"]), int(r["line_num"]),
                                         int(r["word_num"])))
        )
        word_texts.setdefault(k, []).append((r["line_no"], r["text"].strip()))

    out = {}
    level_ids: dict[str, dict[tuple, list]] = {"word": {k: v for k, v in word_ids.items()}}
    for kind, lvl, keys, _ in _LEVELS:
        level_ids[kind] = {}
        for r in rows:
            if int(r["level"]) != lvl:
                continue
            k = keyed(r, keys)
            level_ids[kind].setdefault(k, []).append(
                (r["line_no"], kernel.det_id(conv_id, turn_idx, kind, *k))
            )
    # bottom-up content rollup mirroring the engine: an element's content is
    # the emit-order join of its children's contents (line = its words)
    ent: dict[str, list] = {
        "word": [(o, t, k) for k, lst in word_texts.items() for o, t in lst]
    }
    contents: dict[str, dict[int, str]] = {}
    for kind, lvl, keys, child_kind in reversed(_LEVELS):
        ent[kind] = []
        contents[kind] = {}
        for r in rows:
            if int(r["level"]) != lvl:
                continue
            k = keyed(r, keys)
            kids = sorted((o, t) for o, t, ck in ent[child_kind] if ck[: len(k)] == k)
            content = " ".join(t for _, t in kids)
            ent[kind].append((r["line_no"], content, k))
            contents[kind][r["line_no"]] = content
    for kind, lvl, keys, child_kind in _LEVELS:
        elems = []
        for r in rows:
            if int(r["level"]) != lvl:
                continue
            k = keyed(r, keys)
            kids = []
            for ck, entries in level_ids[child_kind].items():
                if ck[: len(k)] == k:
                    kids.extend(entries)
            kids.sort()
            elems.append(
                (
                    r["line_no"],
                    {
                        "id": kernel.det_id(conv_id, turn_idx, kind, *k),
                        "content": contents[kind][r["line_no"]],
                        "left": r["left_px"] / pw,
                        "top": r["top_px"] / ph,
                        "width": r["width_px"] / pw,
                        "height": r["height_px"] / ph,
                        "child_ids": [i for _, i in kids],
                    },
                )
            )
        elems.sort(key=lambda e: e[0])
        out[kind + "s"] = [e for _, e in elems]
    return {"blocks": out["blocks"], "paragraphs": out["paragraphs"],
            "lines": out["lines"]}


@pytest.mark.parametrize("n_turns", [300])
def test_hierarchy_matches_oracle(spark, n_turns):
    pdf = gen_transcripts(n_turns)
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in extract_hierarchy(spark.createDataFrame(pdf)).collect()
    }
    assert len(got) == len(pdf)
    checked_nonempty = 0
    for rec in pdf.itertuples():
        want = _oracle_turn(rec.conv_id, int(rec.turn_idx), rec.text)
        have = got[(rec.conv_id, int(rec.turn_idx))]
        for col in ("blocks", "paragraphs", "lines"):
            h = [row.asDict(recursive=True) for row in have[col]]
            w = want[col]
            assert len(h) == len(w), (rec.conv_id, rec.turn_idx, col)
            for he, we in zip(h, w):
                assert he["id"] == we["id"], (rec.conv_id, rec.turn_idx, col)
                assert he["child_ids"] == we["child_ids"], (rec.conv_id, rec.turn_idx, col)
                assert he["content"] == we["content"], (rec.conv_id, rec.turn_idx, col)
                for f in ("left", "top", "width", "height"):
                    assert repr(he[f]) == repr(we[f]), (rec.conv_id, rec.turn_idx, col, f)
            if w:
                checked_nonempty += 1
    assert checked_nonempty > 100  # the corpus genuinely exercises the rollup


def test_hierarchy_links_into_extracted_words(spark):
    """Cross-linkage: line child_ids use the extraction kernel's word-id
    recipe, so every extracted word id appears in exactly one line."""
    from ocr_mini_service_spark.pipeline import extract_fused

    pdf = gen_transcripts(60, edge_cases=False)
    sdf = spark.createDataFrame(pdf)
    words = {
        w["word_id"]
        for r in extract_fused(sdf).collect()
        for w in r["words"]
    }
    line_children = {
        cid
        for r in extract_hierarchy(sdf).collect()
        for ln in r["lines"]
        for cid in ln["child_ids"]
    }
    assert words <= line_children


def test_hierarchy_lines_driver_query_reconstructs_documents(spark, sf_dir):
    """The flat driver view of the rollup tells the whole story per doc:
    line contents concatenated in line order equal the document's first 40
    normalized words, word counts telescope, and ids are unique."""
    import re

    from ocr_mini_service_spark.operators import transcribe

    df = transcribe.hierarchy_lines(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    want = docs.set_index("doc_id")["text"].map(
        lambda s: " ".join(re.sub(r"\s+", " ", s.strip()).split(" ")[:40])
    )
    got = (
        df.sort_values(["doc_id", "line_idx"])
        .groupby("doc_id")["content"]
        .apply(" ".join)
    )
    assert got.to_dict() == want.reindex(got.index).to_dict()
    assert df["line_id"].is_unique
    assert (df.groupby("doc_id")["n_words"].sum() == want.reindex(got.index).str.split().str.len()).all()
    assert df["n_words"].between(1, 10).all()


def test_hierarchy_parents_link_to_lines(spark, sf_dir):
    """Cross-level consistency of the flat driver views: the paragraph's
    child count equals the doc's line count, the block parents exactly one
    paragraph, and parent content equals the line contents joined in line
    order (bottom-up aggregation all the way to the root)."""
    from ocr_mini_service_spark.operators import transcribe

    parents = transcribe.hierarchy_parents(spark, sf_dir).toPandas()
    lines = transcribe.hierarchy_lines(spark, sf_dir).toPandas()
    per_doc_lines = lines.groupby("doc_id")
    n_lines = per_doc_lines.size()
    joined = (
        lines.sort_values(["doc_id", "line_idx"])
        .groupby("doc_id")["content"]
        .apply(lambda s: " ".join(x for x in s if x))
    )
    blocks = parents[parents["kind"] == "block"].set_index("doc_id")
    paras = parents[parents["kind"] == "paragraph"].set_index("doc_id")
    assert (blocks["n_children"] == 1).all()
    assert (paras["n_children"] == n_lines.reindex(paras.index)).all()
    assert blocks["content"].to_dict() == joined.reindex(blocks.index).to_dict()
    assert paras["content"].to_dict() == joined.reindex(paras.index).to_dict()
    # geometry: parent height spans all lines
    assert (blocks["height"] * 1000).round().astype(int).eq(
        n_lines.reindex(blocks.index) * 100
    ).all()
