"""Property-based kernel invariants (hypothesis) — the fixtures in
tests/test_kernel.py pin exact reference behaviors on hand-computed cases;
these pin the *structural* contracts on adversarial generated input:

- total error isolation: ``extract_turn`` never raises, for ANY (text, tool,
  lang) payload (image-recognition.service.ts wraps each branch; a poison
  turn must fail alone, never the task);
- span algebra: spans are end-exclusive, contiguous with single joining
  spaces, and slice ``extracted_text`` back to exactly the kept words;
- assembly counts: kept words == spans == words rows, dropped >= 0;
- determinism: same input -> bit-identical output (the resume/idempotence
  story depends on it);
- parse round-trip: a well-formed TSV built from generated word rows parses
  to exactly those rows, and reading order is a permutation of them.
"""

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_mini_service_spark import kernel

# no tabs/newlines (column/row separators), non-blank after strip
_cell_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\t\n\r"),
    min_size=1,
    max_size=12,
).filter(lambda s: s.strip())

_any_text = st.text(max_size=200)


def _word_row():
    return st.fixed_dictionaries(
        {
            "block": st.integers(0, 5),
            "par": st.integers(0, 5),
            "line": st.integers(0, 9),
            "word": st.integers(0, 9),
            "left": st.integers(0, 999),
            "top": st.integers(0, 999),
            "width": st.integers(1, 400),
            "height": st.integers(1, 120),
            "conf": st.integers(-1, 100),
            "text": _cell_text,
        }
    )


def _tsv(words, page_w=1000, page_h=1000):
    header = "level\tpage\tblock\tpar\tline\tword\tleft\ttop\twidth\theight\tconf\ttext"
    page = f"1\t1\t0\t0\t0\t0\t0\t0\t{page_w}\t{page_h}\t-1\tp"
    rows = [
        f"5\t1\t{w['block']}\t{w['par']}\t{w['line']}\t{w['word']}\t"
        f"{w['left']}\t{w['top']}\t{w['width']}\t{w['height']}\t{w['conf']}\t{w['text']}"
        for w in words
    ]
    return "\n".join([header, page] + rows)


def _tool(codes, w=100, h=100):
    return json.dumps(
        {
            "width": w,
            "height": h,
            "codes": [
                {
                    "points": [{"x": c[0], "y": c[1]}, {"x": c[0] + c[2], "y": c[1] + c[3]}],
                    "data": "d",
                    "typeName": "qr",
                }
                for c in codes
            ],
        }
    )


def _check_contract(out):
    words, spans, text = out["words"], out["spans"], out["extracted_text"]
    assert out["n_blocks_kept"] == len(words) == len(spans)
    assert out["n_blocks_dropped"] >= 0
    pos = 0
    for w, s in zip(words, spans):
        assert s["start"] == pos and s["end"] == pos + len(w["text"])
        assert text[s["start"] : s["end"]] == w["text"]
        pos = s["end"] + 1  # the joining space
    assert len(text) == (spans[-1]["end"] if spans else 0)
    if words:
        assert out["confidence"] == kernel.mean_confidence([w["confidence"] for w in words])
    else:
        assert out["confidence"] is None


@settings(max_examples=150, deadline=None)
@given(text=_any_text, tool=_any_text, lang=st.one_of(st.none(), st.text(max_size=6)))
def test_extract_turn_total_on_garbage(text, tool, lang):
    out = kernel.extract_turn("c", 0, text, tool, lang)
    _check_contract(out)
    out2 = kernel.extract_turn("c", 0, text, tool, lang)
    assert out == out2  # determinism


@settings(max_examples=100, deadline=None)
@given(
    words=st.lists(
        _word_row(),
        max_size=12,
        # det ids hash (block,par,line,word) — unique in real tesseract
        # output, so keep the generator faithful to that
        unique_by=lambda w: (w["block"], w["par"], w["line"], w["word"]),
    ),
    codes=st.lists(
        st.tuples(st.integers(0, 99), st.integers(0, 99), st.integers(1, 50), st.integers(1, 50)),
        max_size=3,
    ),
)
def test_extract_turn_wellformed_tsv(words, codes):
    out = kernel.extract_turn("conv", 3, _tsv(words), _tool(codes))
    assert out["error"] is None
    _check_contract(out)
    # anti-join only removes; with no codes nothing is dropped
    assert out["n_blocks_kept"] + out["n_blocks_dropped"] == len(words)
    if not codes:
        assert out["n_blocks_dropped"] == 0
    ids = [w["word_id"] for w in out["words"]]
    assert len(ids) == len(set(ids))  # det ids unique within a turn


@settings(max_examples=100, deadline=None)
@given(words=st.lists(_word_row(), max_size=15))
def test_parse_roundtrip_and_reading_order_permutation(words):
    parsed = kernel.parse_tsv_words(_tsv(words))
    assert [w["text"].strip() for w in words] == [p["text"] for p in parsed]
    key = lambda w: (w["block_num"], w["par_num"], w["line_num"], w["word_num"], w["text"])
    assert sorted(map(key, kernel.reading_order(parsed))) == sorted(map(key, parsed))


@settings(max_examples=200, deadline=None)
@given(s=st.text(max_size=30))
def test_js_parse_int_total(s):
    v = kernel.js_parse_int(s)
    assert isinstance(v, float)
    v2 = kernel.js_parse_int(s)
    assert v == v2 or (math.isnan(v) and math.isnan(v2))


@settings(max_examples=150, deadline=None)
@given(
    r=st.tuples(*[st.floats(0, 1, allow_nan=False) for _ in range(4)]),
    q=st.tuples(*[st.floats(0, 1, allow_nan=False) for _ in range(4)]),
)
def test_overlap_symmetric_and_touch_is_not_overlap(r, q):
    a = dict(zip(("left", "top", "width", "height"), r))
    b = dict(zip(("left", "top", "width", "height"), q))
    assert kernel.rectangles_overlap(a, b) == kernel.rectangles_overlap(b, a)
    touching = {"left": a["left"] + a["width"], "top": a["top"], "width": 0.25, "height": 0.25}
    assert not kernel.rectangles_overlap(a, touching)
