"""PDF subset parser + layout extraction: lexer edge cases pinned on
handcrafted files, generator/parser roundtrip pinned against an independent
recomputation (the same arithmetic the DuckDB oracle uses)."""

import zlib

import pytest

from ocr_mini_service_spark.operators import pdf as P


def _mini_pdf(content: bytes, *, filter_flate: bool = False,
              crlf_after_stream: bool = False, length_indirect: bool = False,
              contents_array: bool = False) -> bytes:
    """Handcraft a one-page PDF around ``content`` with structural knobs."""
    data = zlib.compress(content) if filter_flate else content
    eol = b"\r\n" if crlf_after_stream else b"\n"
    objs = {}
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    filt = b" /Filter /FlateDecode" if filter_flate else b""
    if length_indirect:
        stream_dict = b"<< /Length 6 0 R%s >>" % filt
        objs[6] = b"%d" % len(data)
    else:
        stream_dict = b"<< /Length %d%s >>" % (len(data), filt)
    objs[5] = stream_dict + b"\nstream" + eol + data + b"\nendstream"
    if contents_array:
        # second (empty-ish) part: a comment the interpreter must skip
        part2 = b"% tail part"
        objs[7] = b"<< /Length %d >>\nstream\n" % len(part2) + part2 + b"\nendstream"
        contents = b"[ 5 0 R 7 0 R ]"
    else:
        contents = b"5 0 R"
    objs[4] = (b"<< /Type /Page /Parent 2 0 R /Contents %s >>" % contents)
    # MediaBox ONLY on the Pages node: inheritance is load-bearing
    objs[2] = (b"<< /Type /Pages /Kids [ 4 0 R ] /Count 1 "
               b"/MediaBox [ 0 0 612 792 ] >>")
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for n in sorted(objs):
        offsets[n] = len(out)
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objs) + 1
    out += b"xref\n0 %d\n0000000000 65535 f \n" % n_obj
    for n in range(1, n_obj):
        out += b"%010d 00000 n \n" % offsets.get(n, 0)
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n_obj, xref_at))
    return bytes(out)


def _runs(payload: bytes):
    r = P.PdfReader(payload)
    (page,) = r.pages()
    return P.interpret_text(r.content(page))


# ---------------------------------------------------------------------------
# lexer / string syntax
# ---------------------------------------------------------------------------

def test_literal_string_escapes():
    content = (b"BT /F1 12 Tf 50 700 Td "
               b"(\\110i \\(nested (deep) parens\\) tab\\there\\\n"
               b"continued \\q) Tj ET")
    runs = _runs(_mini_pdf(content))
    # \110 = 'H'; \t escape; backslash-newline joins; \q -> 'q'
    assert runs == [(50.0, 700.0, 12.0, "Hi (nested (deep) parens) tab\therecontinued q")]


def test_hex_string_odd_padding_and_whitespace():
    content = b"BT /F1 12 Tf 10 20 Td <48 65 6C6C 6F2> Tj ET"
    runs = _runs(_mini_pdf(content))
    assert runs == [(10.0, 20.0, 12.0, "Hello ")]  # odd digit padded: 0x20


def test_comments_and_unknown_operators_skipped():
    content = (b"% leading comment\nq 0.5 G 1 0 0 RG\n"
               b"BT /F1 12 Tf 5 5 Td (x) Tj ET\nQ")
    assert _runs(_mini_pdf(content)) == [(5.0, 5.0, 12.0, "x")]


# ---------------------------------------------------------------------------
# text-state machine
# ---------------------------------------------------------------------------

def test_td_tl_tstar_quote_semantics():
    # TD sets leading = -ty; T* and ' move down by leading
    content = (b"BT /F1 12 Tf 100 700 Td 0 -14 TD (a) Tj T* (b) Tj (c) ' ET")
    runs = _runs(_mini_pdf(content))
    assert runs == [
        (100.0, 686.0, 12.0, "a"),
        (100.0, 672.0, 12.0, "b"),
        (100.0, 658.0, 12.0, "c"),
    ]


def test_tj_array_concatenates_across_kerning():
    content = b"BT /F1 12 Tf 1 2 Td [(ab) -250 (cd) 120 (ef)] TJ ET"
    assert _runs(_mini_pdf(content)) == [(1.0, 2.0, 12.0, "abcdef")]


def test_tm_translation_and_rotation_rejected():
    ok = b"BT /F1 12 Tf 1 0 0 1 33 44 Tm (z) Tj ET"
    assert _runs(_mini_pdf(ok)) == [(33.0, 44.0, 12.0, "z")]
    rot = b"BT /F1 12 Tf 0 1 -1 0 33 44 Tm (z) Tj ET"
    with pytest.raises(ValueError, match="Tm outside subset"):
        _runs(_mini_pdf(rot))


def test_double_quote_operator():
    content = b"BT /F1 12 Tf 14 TL 9 28 Td 2 3 (w) \" ET"
    assert _runs(_mini_pdf(content)) == [(9.0, 14.0, 12.0, "w")]


# ---------------------------------------------------------------------------
# file structure
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("knobs", [
    dict(filter_flate=True),
    dict(filter_flate=True, crlf_after_stream=True),
    dict(length_indirect=True),
    dict(filter_flate=True, length_indirect=True),
    dict(contents_array=True),
])
def test_structural_knobs(knobs):
    content = b"BT /F1 12 Tf 50 700 Td (ok) Tj ET"
    assert _runs(_mini_pdf(content, **knobs)) == [(50.0, 700.0, 12.0, "ok")]


def test_mediabox_inherited_from_pages_node():
    r = P.PdfReader(_mini_pdf(b"BT ET"))
    (page,) = r.pages()
    assert r.resolve(page["MediaBox"]) == [0, 0, 612, 792]


# ---------------------------------------------------------------------------
# generator/parser roundtrip (independent recomputation, oracle arithmetic)
# ---------------------------------------------------------------------------

def _expected(doc_id: int, text: str):
    ws = text.split()
    k = P.words_per_line(doc_id)
    lines = [" ".join(ws[i: i + k]) for i in range(0, len(ws), k)]
    return lines, max(1, -(-len(lines) // P.LINES_PER_PAGE))


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4])
def test_roundtrip_small(doc_id):
    text = ("alpha beta (gamma) delta\\eps zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi")
    lines, n_pages = _expected(doc_id, text)
    res = P.extract_pdf(doc_id, text)
    assert res["extracted_text"] == "\n".join(lines)
    assert res["n_pages"] == n_pages
    assert res["n_lines"] == len(lines)
    assert res["n_runs_dropped"] == 2 * n_pages  # header + footer per page
    off = 0
    for i, (span, line) in enumerate(zip(res["spans"], lines)):
        assert span["line_text"] == line
        assert (span["char_start"], span["char_end"]) == (off, off + len(line))
        assert span["page"] == i // P.LINES_PER_PAGE
        assert span["col"] == (i % P.LINES_PER_PAGE) // P.LINES_PER_COL
        assert span["y"] == P.Y_TOP - P.LEADING * (i % P.LINES_PER_COL)
        assert span["x"] == P.BODY_X[span["col"]]
        off += len(line) + 1


def test_roundtrip_multipage_and_both_stream_variants():
    text = " ".join(f"w{i}" for i in range(1500))
    for doc_id in (0, 3):  # k=6 -> 250 lines -> 3 pages (even+odd variants)
        lines, n_pages = _expected(doc_id, text)
        res = P.extract_pdf(doc_id, text)
        assert n_pages >= 2
        assert res["extracted_text"] == "\n".join(lines)
        assert res["n_pages"] == n_pages


def test_empty_text():
    res = P.extract_pdf(7, "")
    assert res["extracted_text"] == ""
    assert (res["n_pages"], res["n_lines"], res["n_runs_dropped"]) == (1, 0, 2)
    assert res["spans"] == []


def test_unicode_words_survive():
    res = P.extract_pdf(2, "über møtley crüe naïve façade 日本語 emoji\U0001F600 end")
    assert "日本語" in res["extracted_text"]
    assert "emoji\U0001F600" in res["extracted_text"]


def test_span_batches_isolates_bad_rows():
    import pandas as pd

    pdf_in = pd.DataFrame({"doc_id": [1, 2], "text": [None, "a b c"]})
    (out,) = list(P._span_batches(iter([pdf_in])))
    bad = out[out.doc_id == 1]
    assert list(bad.line_idx) == [-1]
    assert bad.line_text.iloc[0].startswith("pdf_failed:")
    good = out[out.doc_id == 2]
    assert list(good.line_text) == ["a b c"]


def test_leading_persists_across_bt_blocks():
    """Tl is text STATE (PDF 1.7 §9.3.1): a later BT block's T*/' must use
    the leading set in an earlier block; only the matrices reset at BT."""
    content = (b"BT /F1 12 Tf 14 TL 100 700 Td (a) Tj ET "
               b"BT 100 500 Td (b) ' ET")
    runs = _runs(_mini_pdf(content))
    assert runs == [
        (100.0, 700.0, 12.0, "a"),
        (100.0, 486.0, 12.0, "b"),  # ' dropped by the PERSISTED 14
    ]


def test_literal_string_unescaped_eol_reads_as_lf():
    """Unescaped CR, LF, and CRLF inside a literal string all read as one
    LF (§7.3.4.2) — unlike backslash-EOL, which joins lines."""
    content = b"BT /F1 12 Tf 5 5 Td (a\rb\nc\r\nd) Tj ET"
    runs = _runs(_mini_pdf(content))
    assert runs == [(5.0, 5.0, 12.0, "a\nb\nc\nd")]


def test_baseline_merge_tolerates_float_path_noise():
    """Two runs on one visual baseline reached via different float paths
    (Td vs TL+T* arithmetic) merge into ONE line."""
    content = (b"BT /F1 12 Tf 100 400 Td (left) Tj ET "
               b"BT /F1 12 Tf 14.000000000000002 TL 300 414.000000000000002 Td (right) ' ET")
    r = P.PdfReader(_mini_pdf(content))
    lines, dropped, n_pages = P.layout_lines(r)
    assert [ln["text"] for ln in lines] == ["left right"], lines
