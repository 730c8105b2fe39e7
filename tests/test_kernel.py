"""Unit tests for the pure-Python semantics kernel against hand-computed
cases pinned to the reference behavior (file:line cites in kernel.py)."""

import json
import math

import pytest

from ocr_mini_service_spark.kernel import (
    BASELINE_TOLERANCE,
    calculate_baseline,
    det_id,
    extract_turn,
    filter_overlapping,
    has_descenders,
    js_div,
    js_parse_int,
    parse_codes,
    parse_tsv_words,
    reading_order,
    rectangles_overlap,
)

HDR = "level\tpage_num\tblock_num\tpar_num\tline_num\tword_num\tleft\ttop\twidth\theight\tconf\ttext"


def row(level, b, p, ln, w, left, top, width, height, conf, text):
    return f"{level}\t1\t{b}\t{p}\t{ln}\t{w}\t{left}\t{top}\t{width}\t{height}\t{conf}\t{text}"


PAGE = row(1, 0, 0, 0, 0, 0, 0, 1000, 1000, -1, "")


def doc(*rows):
    return "\n".join([HDR, PAGE, *rows])


# ---------- js primitives ----------

def test_js_parse_int():
    assert js_parse_int("42") == 42
    assert js_parse_int("  -7x") == -7
    assert js_parse_int("96") == 96
    assert math.isnan(js_parse_int(""))
    assert math.isnan(js_parse_int("abc"))
    assert js_parse_int("12.9") == 12  # parseInt truncates at '.'
    # JS parseInt only consumes ASCII digits; CPython's int() accepts
    # unicode digits ("١٢" == 12) and underscores ("1_0" == 10) — both must
    # take the slow path and match parseInt
    assert math.isnan(js_parse_int("١٢"))
    assert js_parse_int("1_0") == 1
    assert js_parse_int("3٢") == 3  # ASCII prefix then non-ASCII digit stops


def test_js_div():
    assert js_div(4, 2) == 2
    assert js_div(1, 0) == math.inf
    assert js_div(-1, 0) == -math.inf
    assert math.isnan(js_div(0, 0))


# ---------- baseline (parse-tsv-output.function.ts:66-90) ----------

def test_descenders():
    assert has_descenders("jump")
    assert has_descenders("Größe") is False or True  # ö not in set; g IS (lowercased)
    assert has_descenders("GY")  # lowercased 'g','y'
    assert has_descenders("hill") is False
    assert has_descenders("a,b")  # comma
    assert has_descenders("(x)")
    assert has_descenders("ąçę")
    assert not has_descenders("ÜBER")  # ü,b,e,r — none in set


def test_baseline_values():
    # no descenders: top + height
    assert calculate_baseline("hill", 0.1, 0.1) == pytest.approx(0.2)
    # descenders: top + height * 0.77
    assert calculate_baseline("jump", 0.1, 0.1) == pytest.approx(0.1 + 0.1 * 0.77)


# ---------- TSV parse (parse-tsv-output.function.ts:134-196) ----------

def test_parse_empty_and_short():
    assert parse_tsv_words("") == []
    assert parse_tsv_words(None) == []
    assert parse_tsv_words(HDR) == []  # <2 lines after trim


def test_parse_no_page_line_raises():
    with pytest.raises(ValueError):
        parse_tsv_words("\n".join([HDR, row(5, 0, 0, 0, 0, 1, 1, 1, 1, 90, "x")]))


def test_parse_normalization_and_filter():
    words = parse_tsv_words(doc(
        row(2, 0, 0, 0, 0, 10, 10, 980, 100, -1, ""),
        row(5, 0, 0, 0, 0, 100, 200, 300, 50, 96, " hi "),
        row(5, 0, 0, 0, 1, 10, 10, 50, 30, 90, "   "),   # whitespace-only: dropped
        "5\t1\t0\t0",                                     # <12 cols: skipped
    ))
    assert len(words) == 1
    w = words[0]
    assert w["text"] == "hi"
    assert w["left"] == 0.1 and w["top"] == 0.2 and w["width"] == 0.3 and w["height"] == 0.05
    assert w["conf"] == 0.96
    assert w["baseline"] == pytest.approx(0.25)  # 'hi' no descenders


def test_parse_13_column_row_text_is_col11():
    words = parse_tsv_words(doc(row(5, 0, 0, 0, 0, 0, 0, 10, 10, 90, "ok") + "\textra"))
    assert [w["text"] for w in words] == ["ok"]


def test_page_dims_lookup_first_char_rule():
    # page line must have EXACTLY 12 cols, else dims (0,0) → division by zero → inf
    bad_page = row(1, 0, 0, 0, 0, 0, 0, 1000, 1000, -1, "") + "\textra"
    words = parse_tsv_words("\n".join([HDR, bad_page, row(5, 0, 0, 0, 0, 10, 10, 50, 30, 90, "x")]))
    assert words[0]["left"] == math.inf


# ---------- reading order (parse-tsv-output.function.ts:208-250) ----------

def mkw(text, left, baseline):
    return {"text": text, "left": left, "baseline": baseline,
            "top": 0.0, "width": 0.0, "height": 0.0, "conf": 0.9,
            "block_num": 0, "par_num": 0, "line_num": 0, "word_num": 0}


def test_reading_order_basic():
    # two lines, words out of x-order
    ws = [mkw("b", 0.5, 0.2), mkw("a", 0.1, 0.2), mkw("c", 0.1, 0.5)]
    assert [w["text"] for w in reading_order(ws)] == ["a", "b", "c"]


def test_reading_order_tolerance_inclusive():
    ws = [mkw("x", 0.1, 0.2000), mkw("y", 0.2, 0.2000 + BASELINE_TOLERANCE)]
    out = reading_order(ws)
    # same group (inclusive <=), sorted by left
    assert [w["text"] for w in out] == ["x", "y"]


def test_reading_order_greedy_first_anchor():
    # chain b, b+0.002, b+0.004: second joins first's group (|0.002|<=tol);
    # third is 0.004 from anchor -> NEW group even though only 0.002 from
    # the second word. Sessionization would merge; greedy must not.
    ws = [mkw("w0", 0.3, 0.200), mkw("w1", 0.2, 0.202), mkw("w2", 0.1, 0.204)]
    out = reading_order(ws)
    # group1 = [w0,w1] avg 0.201, group2=[w2] 0.204 → group1 first, left-sorted
    assert [w["text"] for w in out] == ["w1", "w0", "w2"]


def test_reading_order_group_sort_by_avg():
    # group A anchored at 0.300 with member 0.2985 (avg 0.29925);
    # group B single at 0.297 (outside tol of A's anchor) → B avg < A avg → B first
    ws = [mkw("a1", 0.1, 0.300), mkw("a2", 0.2, 0.2985), mkw("b1", 0.3, 0.297)]
    out = reading_order(ws)
    assert [w["text"] for w in out] == ["b1", "a1", "a2"]


# ---------- overlap (image-recognition.service.ts:252-302) ----------

def rect(left, top, width, height):
    return {"left": left, "top": top, "width": width, "height": height}


def test_overlap_boundary_touch_is_not_overlap():
    a = rect(0.1, 0.1, 0.1, 0.1)  # right edge = 0.2
    b = rect(0.2, 0.1, 0.1, 0.1)  # starts exactly at 0.2
    assert rectangles_overlap(a, b) is False
    c = rect(0.19999, 0.1, 0.1, 0.1)
    assert rectangles_overlap(a, c) is True


def test_filter_overlapping_empty_codes_identity():
    ws = [mkw("x", 0.1, 0.2)]
    assert filter_overlapping(ws, []) is ws


# ---------- codes (code-reader.service.ts:51-105) ----------

def test_parse_codes():
    tool = json.dumps({"width": 1000, "height": 2000, "codes": [
        {"points": [{"x": 100, "y": 200}, {"x": 300, "y": 200},
                    {"x": 300, "y": 600}, {"x": 100, "y": 600}],
         "data": "hello", "typeName": "qr_code"},
        {"points": [], "data": "skipped", "typeName": "other"},
    ]})
    codes = parse_codes(tool)
    assert len(codes) == 1  # empty-points symbol guarded (FIXTURES edge 11)
    c = codes[0]
    assert c["left"] == 0.1 and c["top"] == 0.1 and c["width"] == 0.2 and c["height"] == 0.2
    assert c["content"] == "hello" and c["code_type"] == "QR_CODE"


def test_parse_codes_malformed_raises():
    with pytest.raises(Exception):
        parse_codes("{not json")
    assert parse_codes("") == []
    assert parse_codes(None) == []


# ---------- full turn ----------

def test_extract_turn_spans_and_text():
    text = doc(
        row(5, 0, 0, 0, 0, 100, 100, 100, 50, 90, "world"),
        row(5, 0, 0, 0, 1, 10, 100, 50, 50, 95, "hello"),
    )
    r = extract_turn("c1", 0, text, "")
    assert r["extracted_text"] == "hello world"
    assert r["spans"] == [{"start": 0, "end": 5}, {"start": 6, "end": 11}]
    assert r["n_blocks_kept"] == 2 and r["n_blocks_dropped"] == 0
    assert r["error"] is None
    assert r["words"][0]["word_id"] == det_id("c1", 0, 0, 0, 0, 1)


def test_extract_turn_branch_isolation():
    # ocr branch fails (no page line) but codes branch succeeds
    text = "\n".join([HDR, row(5, 0, 0, 0, 0, 1, 1, 1, 1, 90, "x")])
    tool = json.dumps({"width": 100, "height": 100, "codes": [
        {"points": [{"x": 0, "y": 0}, {"x": 10, "y": 10}], "data": "d", "typeName": "other"}]})
    r = extract_turn("c1", 1, text, tool)
    assert r["words"] == [] and len(r["codes"]) == 1
    assert "ocr_failed" in r["error"]
    # codes branch fails, words survive
    r2 = extract_turn("c1", 2, doc(row(5, 0, 0, 0, 0, 10, 10, 50, 30, 90, "ok")), "{bad")
    assert r2["extracted_text"] == "ok" and "codes_failed" in r2["error"]


def test_extract_turn_all_overlap():
    text = doc(row(5, 0, 0, 0, 0, 100, 100, 50, 30, 90, "gone"))
    tool = json.dumps({"width": 1000, "height": 1000, "codes": [
        {"points": [{"x": 0, "y": 0}, {"x": 1000, "y": 1000}], "data": "d", "typeName": "qr_code"}]})
    r = extract_turn("c1", 3, text, tool)
    assert r["extracted_text"] == "" and r["spans"] == []
    assert r["n_blocks_kept"] == 0 and r["n_blocks_dropped"] == 1
