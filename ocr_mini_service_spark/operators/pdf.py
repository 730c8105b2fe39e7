"""PDF / layout parsing — the north-star's third extraction modality.

The reference extracts positioned text from rendered pages (Tesseract TSV,
src/types/parse-tsv-output.function.ts:134-250); the page-description analog
at corpus scale is PDF: positioned text runs inside content streams that must
be (a) located through the file's object graph, (b) decompressed, (c)
interpreted through the text-state machine, and (d) re-ordered into reading
order by GEOMETRY, because content-stream emission order is arbitrary (PDF
spec never requires reading order — the same reason the reference re-sorts
TSV rows with greedy baseline clustering rather than trusting emission
order, parse-tsv-output.function.ts:216-234).

Two layers, mirroring the repo's multimodal tier rules:

**Synthesis** (``build_pdf``): a deterministic fixture generator — each
``documents`` row becomes a REAL multi-page PDF 1.4 file: classic xref table
with byte-exact offsets, catalog -> page tree (MediaBox inherited from the
/Pages node), per-page content streams that are genuinely zlib-compressed
(/FlateDecode), split into /Contents arrays on odd pages, with /Length as an
indirect reference on even pages.  Body text is laid out in TWO COLUMNS and
emitted in scrambled order (footer first, right column bottom-up, then left
column bottom-up, then header) through five rotating operator forms
(Td+Tj with an octal-escaped first byte, TJ arrays with kerning numbers,
Tm+Tj, TL/Td/' and hex strings) so the parser earns every token type.

**Parsing** (``parse_pdf`` + ``layout_lines``): an honest PDF-subset reader
built only from the public PDF 1.7 spec — startxref/xref/trailer walk, a
real object lexer (literal strings with all escape classes, hex strings,
names, nested dicts/arrays, indirect references, comments), stream payload
extraction with indirect /Length and optional /FlateDecode, page-tree
recursion with attribute inheritance, and a content-stream interpreter for
the text operators (BT/ET, Tf, Td, TD, TL, Tm, T*, Tj, TJ, ', ").  The
layout stage then classifies runs by geometry alone — small-font runs in the
top/bottom margin bands are boilerplate (the running header / page footer);
body runs are bucketed into columns at the MediaBox midline and sorted
(page, column, -y, x) into reading order.  Nothing in the parser or layout
knows the generator's parameters; the DuckDB oracle recomputes the expected
text independently from ``documents.text``.

Scale shape: ONE ``mapInPandas`` pass per query (Arrow-batched, per-row
error isolation, zero Python on any other path), no shuffle before the
presentation sort — the same embarrassingly-parallel posture as
``extract_fulltext``; at 100 TB the job is pure map over the document
partitions.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources import load

# ---------------------------------------------------------------------------
# layout constants (the GENERATOR's choices; the parser never reads these —
# its boilerplate bands and column midline derive from the MediaBox)
# ---------------------------------------------------------------------------
PAGE_W, PAGE_H = 612, 792
BODY_X = (50, 320)          # column left edges
Y_TOP, LEADING = 720, 14    # first baseline, line spacing
LINES_PER_COL = 48
LINES_PER_PAGE = 2 * LINES_PER_COL
BODY_SIZE, META_SIZE = 12, 8
HEADER_Y, FOOTER_Y = 760, 24


def words_per_line(doc_id: int) -> int:
    """Line width in words — varies per doc so fixtures exercise ragged
    last lines and every lines-per-page remainder."""
    return 6 + doc_id % 5


# ---------------------------------------------------------------------------
# synthesis
# ---------------------------------------------------------------------------

def _esc_literal(s: str, octal_first: bool = False) -> bytes:
    """PDF literal-string body: backslash-escape the three specials; when
    ``octal_first`` the first byte goes out as a \\ooo octal escape (so every
    fixture file contains one for the lexer to chew on)."""
    raw = s.encode("utf-8")
    out = bytearray()
    for i, b in enumerate(raw):
        if i == 0 and octal_first:
            out += b"\\%03o" % b
        elif b in (0x28, 0x29, 0x5C):  # ( ) \
            out += b"\\" + bytes([b])
        else:
            out.append(b)
    return bytes(out)


def _show_ops(line_idx: int, x: int, y: int, text: str) -> bytes:
    """One text run in one of five rotating operator forms (all land the run
    at exactly (x, y) with the body font)."""
    form = line_idx % 5
    if form == 0:
        body = _esc_literal(text, octal_first=True)
        return b"BT /F1 %d Tf %d %d Td (%s) Tj ET" % (BODY_SIZE, x, y, body)
    if form == 1:
        mid = max(1, len(text) // 2)
        a, b = _esc_literal(text[:mid]), _esc_literal(text[mid:])
        return b"BT /F1 %d Tf %d %d Td [(%s) -250 (%s)] TJ ET" % (
            BODY_SIZE, x, y, a, b)
    if form == 2:
        return b"BT /F1 %d Tf 1 0 0 1 %d %d Tm (%s) Tj ET" % (
            BODY_SIZE, x, y, _esc_literal(text))
    if form == 3:
        # ' = T* then show: position one leading ABOVE, T* drops to y
        return b"BT /F1 %d Tf %d TL %d %d Td (%s) ' ET" % (
            BODY_SIZE, LEADING, x, y + LEADING, _esc_literal(text))
    return b"BT /F1 %d Tf %d %d Td <%s> Tj ET" % (
        BODY_SIZE, x, y, text.encode("utf-8").hex().encode("ascii"))


def _page_ops(doc_id: int, page_idx: int, n_pages: int,
              lines: list[tuple[int, str]]) -> list[bytes]:
    """Content-stream fragments for one page, in SCRAMBLED order: footer,
    right column bottom-up, left column bottom-up, header.  ``lines`` are
    (global_line_idx, text) for this page in reading order."""
    left, right = lines[:LINES_PER_COL], lines[LINES_PER_COL:]
    ops = [b"% synthetic fixture page", b"q 0.5 G 1 0 0 RG"]
    ops.append(b"BT /F1 %d Tf %d %d Td (%s) Tj ET"
               % (META_SIZE, BODY_X[0], FOOTER_Y,
                  _esc_literal(f"Page {page_idx + 1} of {n_pages}")))
    for col_lines, x in ((right, BODY_X[1]), (left, BODY_X[0])):
        for j in range(len(col_lines) - 1, -1, -1):
            gidx, text = col_lines[j]
            row = gidx % LINES_PER_PAGE % LINES_PER_COL
            ops.append(_show_ops(gidx, x, Y_TOP - LEADING * row, text))
    ops.append(b"BT /F1 %d Tf %d %d Td (%s) Tj ET"
               % (META_SIZE, BODY_X[0], HEADER_Y,
                  _esc_literal(f"doc {doc_id} \xb7 part {page_idx + 1}")))
    ops.append(b"Q")
    return ops


def build_pdf(doc_id: int, text: str) -> bytes:
    """Deterministic real PDF for one document (see module docstring for the
    exercised structure).  Whitespace-split words fill lines of
    ``words_per_line(doc_id)`` words; lines fill the left then right column,
    48 per column, page after page."""
    ws = text.split()
    k = words_per_line(doc_id)
    lines = [" ".join(ws[i: i + k]) for i in range(0, len(ws), k)]
    n_pages = max(1, -(-len(lines) // LINES_PER_PAGE))

    objs: dict[int, bytes] = {}  # obj number -> full body (without N 0 obj wrapper)
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    next_obj = 4
    kids: list[int] = []
    for p in range(n_pages):
        page_lines = [(i, lines[i]) for i in
                      range(p * LINES_PER_PAGE,
                            min((p + 1) * LINES_PER_PAGE, len(lines)))]
        ops = _page_ops(doc_id, p, n_pages, page_lines)
        page_no = next_obj
        next_obj += 1
        if p % 2 == 0:
            # single FlateDecode stream; /Length indirect (a later object)
            data = zlib.compress(b"\n".join(ops), 6)
            s_no, len_no = next_obj, next_obj + 1
            next_obj += 2
            objs[s_no] = (b"<< /Length %d 0 R /Filter /FlateDecode >>\nstream\n"
                          % len_no + data + b"\nendstream")
            objs[len_no] = b"%d" % len(data)
            contents = b"%d 0 R" % s_no
        else:
            # /Contents array: first half Flate (direct length), second raw
            half = len(ops) // 2
            a = zlib.compress(b"\n".join(ops[:half]), 6)
            b_raw = b"\n".join(ops[half:])
            a_no, b_no = next_obj, next_obj + 1
            next_obj += 2
            objs[a_no] = (b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                          % len(a) + a + b"\nendstream")
            objs[b_no] = (b"<< /Length %d >>\nstream\n" % len(b_raw)
                          + b_raw + b"\nendstream")
            contents = b"[ %d 0 R %d 0 R ]" % (a_no, b_no)
        objs[page_no] = (b"<< /Type /Page /Parent 2 0 R /Resources "
                         b"<< /Font << /F1 3 0 R >> >> /Contents %s >>"
                         % contents)
        kids.append(page_no)

    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (b"<< /Type /Pages /Kids [ %s ] /Count %d "
               b"/MediaBox [ 0 0 %d %d ] >>"
               % (b" ".join(b"%d 0 R" % n for n in kids), n_pages,
                  PAGE_W, PAGE_H))

    out = bytearray(b"%PDF-1.4\n%\xc2\xb5\xc2\xb6\n")
    offsets: dict[int, int] = {}
    for n in sorted(objs):
        offsets[n] = len(out)
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objs) + 1
    out += b"xref\n0 %d\n" % n_obj
    out += b"0000000000 65535 f \n"
    for n in range(1, n_obj):
        out += b"%010d 00000 n \n" % offsets[n]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n_obj, xref_at))
    return bytes(out)


# ---------------------------------------------------------------------------
# parsing: lexer -> object reader -> page tree -> content interpreter
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):
        return f"Ref({self.num})"


class _Lexer:
    """Token reader over PDF bytes: numbers, names, strings (literal + hex),
    dict/array punctuation, keywords.  Comments and whitespace are skipped
    per the PDF 1.7 character classes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data, self.pos = data, pos

    def _skip_ws(self):
        d, i, n = self.data, self.pos, len(self.data)
        while i < n:
            c = d[i]
            if c in _WS:
                i += 1
            elif c == 0x25:  # % comment to EOL
                while i < n and d[i] not in (0x0A, 0x0D):
                    i += 1
            else:
                break
        self.pos = i

    def next(self):
        """Next token: ('num', float) ('int', int) ('name', str)
        ('str', bytes) ('dict_open'/'dict_close'/'arr_open'/'arr_close', None)
        ('kw', str) or ('eof', None)."""
        self._skip_ws()
        d, i = self.data, self.pos
        if i >= len(d):
            return ("eof", None)
        c = d[i]
        if c == 0x2F:  # /Name
            j = i + 1
            while j < len(d) and d[j] not in _WS and d[j] not in _DELIM:
                j += 1
            raw = d[i + 1: j]
            # #xx hex escapes in names
            name = re.sub(rb"#([0-9A-Fa-f]{2})",
                          lambda m: bytes([int(m.group(1), 16)]), raw)
            self.pos = j
            return ("name", name.decode("latin-1"))
        if c == 0x28:  # ( literal string
            return ("str", self._literal_string())
        if c == 0x3C:  # < : hex string or <<
            if i + 1 < len(d) and d[i + 1] == 0x3C:
                self.pos = i + 2
                return ("dict_open", None)
            return ("str", self._hex_string())
        if c == 0x3E and i + 1 < len(d) and d[i + 1] == 0x3E:
            self.pos = i + 2
            return ("dict_close", None)
        if c == 0x5B:
            self.pos = i + 1
            return ("arr_open", None)
        if c == 0x5D:
            self.pos = i + 1
            return ("arr_close", None)
        m = _NUM_RE.match(d, i)
        if m and (c in b"+-.0123456789"):
            self.pos = m.end()
            s = m.group(0)
            if b"." in s:
                return ("num", float(s))
            return ("int", int(s))
        # keyword: run of regular characters
        j = i
        while j < len(d) and d[j] not in _WS and d[j] not in _DELIM:
            j += 1
        if j == i:  # lone delimiter we don't handle ({ } etc.) — skip it
            self.pos = i + 1
            return ("kw", chr(c))
        self.pos = j
        return ("kw", d[i:j].decode("latin-1"))

    def _literal_string(self) -> bytes:
        d = self.data
        i = self.pos + 1  # past (
        depth, out = 1, bytearray()
        while i < len(d):
            c = d[i]
            if c == 0x5C:  # backslash escape
                i += 1
                if i >= len(d):
                    break
                e = d[i]
                if e in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                            0x62: b"\b", 0x66: b"\f"}[e]
                    i += 1
                elif e in b"()\\":
                    out.append(e)
                    i += 1
                elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                    o, n = 0, 0
                    while n < 3 and i < len(d) and 0x30 <= d[i] <= 0x37:
                        o = o * 8 + (d[i] - 0x30)
                        i += 1
                        n += 1
                    out.append(o & 0xFF)
                elif e in (0x0A, 0x0D):  # line continuation
                    i += 1
                    if e == 0x0D and i < len(d) and d[i] == 0x0A:
                        i += 1
                else:  # unknown escape: the char stands for itself
                    out.append(e)
                    i += 1
            elif c in (0x0A, 0x0D):
                # unescaped end-of-line inside a literal string reads as a
                # single LF regardless of CR / LF / CRLF (PDF 1.7 §7.3.4.2)
                out.append(0x0A)
                i += 1
                if c == 0x0D and i < len(d) and d[i] == 0x0A:
                    i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    i += 1
                    break
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        self.pos = i
        return bytes(out)

    def _hex_string(self) -> bytes:
        d = self.data
        i = self.pos + 1  # past <
        digits = bytearray()
        while i < len(d) and d[i] != 0x3E:
            if d[i] not in _WS:
                digits.append(d[i])
            i += 1
        self.pos = i + 1
        if len(digits) % 2:
            digits.append(0x30)  # odd count: pad with 0 per spec
        return bytes.fromhex(digits.decode("ascii"))


def _read_value(lx: _Lexer):
    """One object value at the lexer head; resolves `N G R` reference
    triples into Ref."""
    t, v = lx.next()
    if t == "dict_open":
        d = {}
        while True:
            kt, kv = lx.next()
            if kt == "dict_close":
                return d
            if kt != "name":
                raise ValueError(f"dict key is {kt}, not a name")
            d[kv] = _read_value(lx)
    if t == "arr_open":
        arr = []
        while True:
            save = lx.pos
            it, iv = lx.next()
            if it == "arr_close":
                return arr
            lx.pos = save
            arr.append(_read_value(lx))
    if t == "int":
        # lookahead for `gen R`
        save = lx.pos
        t2, v2 = lx.next()
        if t2 == "int":
            t3, v3 = lx.next()
            if t3 == "kw" and v3 == "R":
                return Ref(v)
        lx.pos = save
        return v
    if t in ("num", "str", "name"):
        return v
    if t == "kw":
        if v == "true":
            return True
        if v == "false":
            return False
        if v == "null":
            return None
        return ("kw", v)
    raise ValueError(f"unexpected token {t}")


class PdfReader:
    """Object-graph reader: xref walk, lazy object loads, stream decode."""

    def __init__(self, data: bytes):
        self.data = data
        self._cache: dict[int, object] = {}
        self.xref, self.trailer = self._read_xref()

    def _read_xref(self):
        tail = self.data[-256:]
        m = re.search(rb"startxref\s+(\d+)\s*%%EOF", tail)
        if not m:
            raise ValueError("no startxref")
        lx = _Lexer(self.data, int(m.group(1)))
        t, v = lx.next()
        if (t, v) != ("kw", "xref"):
            raise ValueError("xref table expected (xref streams unsupported)")
        xref: dict[int, int] = {}
        while True:
            save = lx.pos
            t, v = lx.next()
            if t == "kw" and v == "trailer":
                break
            if t != "int":
                raise ValueError("malformed xref section header")
            start, (_, count) = v, lx.next()
            for i in range(count):
                _, off = lx.next()
                _, gen = lx.next()
                tk, kind = lx.next()
                if kind == "n":
                    xref.setdefault(start + i, off)
        trailer = _read_value(lx)
        return xref, trailer

    def obj(self, ref):
        """Load (and cache) object N; returns (value, stream_bytes|None)."""
        num = ref.num if isinstance(ref, Ref) else ref
        if num in self._cache:
            return self._cache[num]
        lx = _Lexer(self.data, self.xref[num])
        t, v = lx.next()
        if t != "int" or v != num:
            raise ValueError(f"object {num}: xref offset does not match")
        lx.next()  # generation
        t, v = lx.next()
        if (t, v) != ("kw", "obj"):
            raise ValueError(f"object {num}: 'obj' keyword missing")
        val = _read_value(lx)
        stream = None
        save = lx.pos
        t, v = lx.next()
        if t == "kw" and v == "stream":
            # EOL after `stream` is CRLF or LF per spec
            i = lx.pos
            if self.data[i: i + 2] == b"\r\n":
                i += 2
            elif self.data[i: i + 1] in (b"\n", b"\r"):
                i += 1
            length = self.resolve(val["Length"])
            raw = self.data[i: i + length]
            filt = val.get("Filter")
            if filt == "FlateDecode" or (isinstance(filt, list)
                                         and "FlateDecode" in filt):
                stream = zlib.decompress(raw)
            elif filt is None:
                stream = raw
            else:
                raise ValueError(f"unsupported filter {filt}")
        else:
            lx.pos = save
        self._cache[num] = (val, stream)
        return val, stream

    def resolve(self, v):
        while isinstance(v, Ref):
            v = self.obj(v)[0]
        return v

    def pages(self):
        """Flat page list via /Root -> page-tree recursion, carrying
        inheritable attributes (MediaBox, Resources) down the tree."""
        root = self.resolve(self.trailer["Root"])
        out: list[dict] = []

        def walk(node_ref, inherited):
            node = self.resolve(node_ref)
            attrs = dict(inherited)
            for k in ("MediaBox", "Resources"):
                if k in node:
                    attrs[k] = node[k]
            if node.get("Type") == "Pages":
                for kid in self.resolve(node["Kids"]):
                    walk(kid, attrs)
            elif node.get("Type") == "Page":
                page = dict(node)
                for k, v in attrs.items():
                    page.setdefault(k, v)
                out.append(page)
            else:
                raise ValueError(f"unexpected page-tree node {node.get('Type')}")

        walk(root["Pages"], {})
        return out

    def content(self, page: dict) -> bytes:
        """Concatenated content streams of a page (array parts joined with a
        newline, as the spec's 'treat as one stream' rule requires a
        whitespace boundary between parts)."""
        c = page["Contents"]
        refs = c if isinstance(c, list) else [c]
        return b"\n".join(self.obj(r)[1] for r in refs)


def _run_text(b: bytes) -> str:
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def interpret_text(stream: bytes) -> list[tuple[float, float, float, str]]:
    """Text-state machine over one page's content stream.  Returns runs
    (x, y, font_size, text).  Translation-only Tm is supported (the e/f
    entries position the run; general rotation is out of subset scope and
    raises rather than mis-extracting)."""
    lx = _Lexer(stream)
    stack: list = []
    runs: list[tuple[float, float, float, str]] = []
    size = 0.0
    lm = (0.0, 0.0)     # text line matrix translation
    leading = 0.0
    in_text = False

    def show(payload: bytes):
        runs.append((lm[0], lm[1], size, _run_text(payload)))

    while True:
        t, v = lx.next()
        if t == "eof":
            break
        if t in ("int", "num", "str", "name"):
            stack.append(v)
            continue
        if t == "arr_open":
            lx.pos -= 1
            stack.append(_read_value(lx))
            continue
        if t in ("dict_open",):
            lx.pos -= 2
            stack.append(_read_value(lx))
            continue
        if t != "kw":
            stack.clear()
            continue
        op = v
        try:
            if op == "BT":
                # BT resets the text matrices only; leading (like font
                # size) is TEXT STATE and persists across BT/ET blocks
                # (PDF 1.7 §9.3.1)
                in_text, lm = True, (0.0, 0.0)
            elif op == "ET":
                in_text = False
            elif op == "Tf":
                size = float(stack[-1])
            elif op == "Td":
                lm = (lm[0] + float(stack[-2]), lm[1] + float(stack[-1]))
            elif op == "TD":
                leading = -float(stack[-1])
                lm = (lm[0] + float(stack[-2]), lm[1] + float(stack[-1]))
            elif op == "TL":
                leading = float(stack[-1])
            elif op == "Tm":
                a, b, c, d = (float(x) for x in stack[-6:-2])
                if (a, b, c, d) != (1.0, 0.0, 0.0, 1.0):
                    raise ValueError("rotated/scaled Tm outside subset")
                lm = (float(stack[-2]), float(stack[-1]))
            elif op == "T*":
                lm = (lm[0], lm[1] - leading)
            elif op == "Tj":
                if in_text:
                    show(stack[-1])
            elif op == "'":
                lm = (lm[0], lm[1] - leading)
                if in_text:
                    show(stack[-1])
            elif op == '"':
                lm = (lm[0], lm[1] - leading)
                if in_text:
                    show(stack[-1])
            elif op == "TJ":
                if in_text:
                    show(b"".join(p for p in stack[-1]
                                  if isinstance(p, bytes)))
        finally:
            stack.clear()
    return runs


# boilerplate geometry: small-font runs in the margin bands.  Fractions of
# the page height so the rule is resolution-independent, not generator-tied.
_MARGIN_FRAC = 0.06
_MIN_BODY_SIZE = 9.0
# runs whose baselines differ only by float-path noise merge into one line
# (bitwise-equal y would split a visual baseline reached via Td on one run
# and TL+T* arithmetic on another); far below any real leading
_BASELINE_EPS = 0.5


def layout_lines(reader: PdfReader):
    """Reading-order reconstruction: classify boilerplate by geometry, bucket
    body runs into columns at the MediaBox midline, sort (page, col, -y, x),
    merge same-baseline runs into lines.  Returns (lines, n_dropped,
    n_pages) where lines are dicts with page/col/x/y/text."""
    pages = reader.pages()
    kept, dropped = [], 0
    for pi, page in enumerate(pages):
        box = [float(reader.resolve(v)) for v in reader.resolve(page["MediaBox"])]
        w, h = box[2] - box[0], box[3] - box[1]
        for (x, y, size, text) in interpret_text(reader.content(page)):
            is_margin = y < box[1] + _MARGIN_FRAC * h or y > box[3] - _MARGIN_FRAC * h
            if size < _MIN_BODY_SIZE or is_margin:
                dropped += 1
                continue
            col = 0 if x < box[0] + w / 2 else 1
            kept.append((pi, col, -y, x, text))
    kept.sort(key=lambda r: (r[0], r[1], r[2], r[3]))
    lines: list[dict] = []
    for (pi, col, ny, x, text) in kept:
        if (
            lines
            and (lines[-1]["page"], lines[-1]["col"]) == (pi, col)
            and abs(lines[-1]["y"] - (-ny)) <= _BASELINE_EPS
        ):
            lines[-1]["text"] += " " + text
        else:
            lines.append({"page": pi, "col": col, "x": x, "y": -ny, "text": text})
    return lines, dropped, len(pages)


def extract_pdf(doc_id: int, text: str) -> dict:
    """Build the fixture PDF for one document and run the full extraction:
    returns extracted text + layout metrics + per-line spans."""
    payload = build_pdf(doc_id, text)
    reader = PdfReader(payload)
    lines, dropped, n_pages = layout_lines(reader)
    extracted = "\n".join(ln["text"] for ln in lines)
    spans = []
    off = 0
    for i, ln in enumerate(lines):
        spans.append({
            "line_idx": i, "page": ln["page"], "col": ln["col"],
            "x": int(ln["x"]), "y": int(ln["y"]),
            "char_start": off, "char_end": off + len(ln["text"]),
            "line_text": ln["text"],
        })
        off += len(ln["text"]) + 1
    return {
        "extracted_text": extracted,
        "n_pages": n_pages,
        "n_lines": len(lines),
        "n_runs_dropped": dropped,
        "n_bytes": len(payload),
        "spans": spans,
    }


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------

PDF_EXTRACT = StructType([
    StructField("doc_id", LongType(), False),
    StructField("extracted_text", StringType(), True),
    StructField("n_pages", IntegerType(), True),
    StructField("n_lines", IntegerType(), True),
    StructField("n_runs_dropped", IntegerType(), True),
    StructField("n_chars", IntegerType(), True),
    StructField("error", StringType(), True),
])

PDF_SPANS = StructType([
    StructField("doc_id", LongType(), False),
    StructField("line_idx", IntegerType(), False),
    StructField("page", IntegerType(), True),
    StructField("col", IntegerType(), True),
    StructField("x", IntegerType(), True),
    StructField("y", IntegerType(), True),
    StructField("char_start", IntegerType(), True),
    StructField("char_end", IntegerType(), True),
    StructField("line_text", StringType(), True),
])


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf_ in batches:
        out = []
        for r in pdf_.itertuples(index=False):
            row = {"doc_id": int(r.doc_id), "extracted_text": None,
                   "n_pages": None, "n_lines": None, "n_runs_dropped": None,
                   "n_chars": None, "error": None}
            try:
                res = extract_pdf(int(r.doc_id), r.text)
                row.update(extracted_text=res["extracted_text"],
                           n_pages=res["n_pages"], n_lines=res["n_lines"],
                           n_runs_dropped=res["n_runs_dropped"],
                           n_chars=len(res["extracted_text"]))
            except Exception as e:  # per-row isolation, as everywhere
                row["error"] = f"pdf_failed: {e}"
            out.append(row)
        yield pd.DataFrame(out, columns=[f.name for f in PDF_EXTRACT.fields])


def _span_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in PDF_SPANS.fields]
    for pdf_ in batches:
        out = []
        for r in pdf_.itertuples(index=False):
            try:  # per-row isolation, as everywhere
                res = extract_pdf(int(r.doc_id), r.text)
            except Exception as e:
                # sentinel row (line_idx=-1) so a failed document is visible
                # downstream instead of killing the task or vanishing
                out.append({"doc_id": int(r.doc_id), "line_idx": -1,
                            "page": None, "col": None, "x": None, "y": None,
                            "char_start": None, "char_end": None,
                            "line_text": f"pdf_failed: {e}"})
                continue
            for s in res["spans"]:
                out.append({"doc_id": int(r.doc_id), **s})
        yield pd.DataFrame(out, columns=cols)


def pdf_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Full-document PDF extraction: synthesize the fixture PDF per document
    (real xref/FlateDecode/two-column file), parse it through the subset
    reader, geometric boilerplate strip, reading-order text.  One Arrow pass,
    no shuffle (reference analog: the whole extract pipeline of
    src/types/parse-tsv-output.function.ts, re-targeted at page-description
    input)."""
    from . import ordered

    docs = load(spark, sf, "documents").select("doc_id", "text")
    out = docs.mapInPandas(_extract_batches, schema=PDF_EXTRACT)
    return ordered(out, "doc_id")


def pdf_line_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Per-line layout records with character spans into the extracted text —
    the PDF twin of ``extract_word_boxes`` (span offsets are the contract a
    training-data pipeline needs to align annotations back onto extractions).
    One Arrow pass, rows emitted kernel-side so span arithmetic never forces
    a keyed shuffle."""
    from . import ordered

    docs = load(spark, sf, "documents").select("doc_id", "text")
    out = docs.mapInPandas(_span_batches, schema=PDF_SPANS)
    return ordered(out, "doc_id", "line_idx")


# pdf_extraction_funnel: the republication overlay (every PDFF_REPUB_MOD-th
# base document is re-published verbatim under doc_id + PDFF_REPUB_OFF) and
# the quality gate on the EXTRACTED text.  PDFF_REPUB_OFF is divisible by 5
# so the republished file keeps its base's words_per_line — the re-published
# PDF is byte-different (different object ids in the xref) but extracts to
# IDENTICAL text, which is exactly the dedup rung's job to discover.
PDFF_REPUB_MOD = 3
PDFF_REPUB_OFF = 500_000
PDFF_MIN_WORDS = 20  # word floor on the extracted text
PDFF_DISTINCT_MIN_BP = 3_000  # >= 30% distinct words


def pdf_extraction_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """The PDF tier COMPOSED with the curation stages — the document-corpus
    twin of ``extraction_funnel`` (transcribe.py): synthesize + parse the
    fixture PDFs (real xref/FlateDecode two-column files, republication
    overlay), quality-gate the EXTRACTED text (word floor + distinct-ratio
    repetition gate), then exact-dedup it (canonical = min doc_id per
    identical extracted text), reported as cumulative per-stage survivor
    counts.  A republished PDF differs byte-wise (fresh xref offsets) yet
    extracts identically, so only real geometric reconstruction lands the
    copy in its base's dedup group.

    Scale shape: ONE Arrow kernel pass (plan-pinned in test_plans.py), flags
    in one narrow projection, then ONE aggregation on the content-hash key
    that IS the dedup — per-text group size + the (text-determined, hence
    group-constant) quality flag, so stage counts fall out as plain sums and
    a mass-republished PDF collapses in the map-side partial aggregate
    (the ``line_dedup`` keeper principle; no mark-back join, no window)."""
    from pyspark.sql import functions as F

    from . import ordered
    from .corpus import _with_repub

    docs = load(spark, sf, "documents").select("doc_id", "text")
    base = _with_repub(docs, PDFF_REPUB_MOD, PDFF_REPUB_OFF)
    ex = base.mapInPandas(_extract_batches, schema=PDF_EXTRACT)
    staged = ex.select(
        "extracted_text",
        F.col("error").isNotNull().cast("long").alias("err"),
        F.split(F.trim(F.col("extracted_text")), r"\s+").alias("w"),
    )
    sig = staged.select(
        "extracted_text",
        "err",
        F.size("w").alias("n_words"),
        F.expr("(size(array_distinct(w)) * 10000) div size(w)").alias("distinct_bp"),
    )
    grouped = sig.groupBy(F.md5("extracted_text").alias("ck")).agg(
        F.count("*").alias("n"),
        # q derives from extracted_text alone, so it is constant within a
        # content group; max() just picks that constant.  Error rows
        # (extracted_text NULL) never pass the gate AND are surfaced in
        # the explicit parse_errors stage below — a kernel failure shows
        # up as a non-zero row the (zero-expecting) oracle rejects, never
        # as a silent count drift.
        F.max(
            (
                (F.col("err") == 0)
                & (F.col("n_words") >= PDFF_MIN_WORDS)
                & (F.col("distinct_bp") >= PDFF_DISTINCT_MIN_BP)
            ).cast("long")
        ).alias("q"),
        F.sum("err").alias("e"),
    )
    agg = grouped.agg(
        F.sum("n").alias("s0"),
        F.sum(F.col("n") * F.col("q")).alias("s1"),
        F.sum("q").alias("s2"),
        F.sum("e").alias("s_err"),
    )
    out = agg.select(
        F.expr(
            "stack(4, 0, 'raw', s0, 1, 'quality', s1, 2, 'dedup', s2,"
            " 3, 'parse_errors', s_err)"
        ).alias("stage_idx", "stage", "n_docs")
    )
    return ordered(out, "stage_idx")
