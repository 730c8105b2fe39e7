"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference ingests binary image buffers (Buffer ≤10 MB,
image-recognition.controller.ts:83-93) and decodes rasters via Jimp
(code-reader.service.ts:22-30).  At pipeline scale the same shape is an
opaque ``binary`` column with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``.

Decode support is tiered by what a container without codec libraries can
honestly do:

- **rasters the container can honestly decode are REALLY decoded** in
  pure Python/stdlib/numpy: binary PPM (netpbm ``P6``), 24-bit BI_RGB
  BMP, PNG in the full Jimp matrix (depths 1/2/4/8/16, all five color
  types incl. palette, all five filter types, sequential and Adam7
  interlace; ``_decode_png``), and Huffman JPEG — baseline, extended
  sequential, AND progressive (``_decode_jpeg``: full marker parse,
  entropy tables read from the file's own DHT/DQT segments, canonical
  Huffman decode with byte unstuffing and restart-marker support,
  progressive spectral-selection/successive-approximation scans with EOB
  runs and AC refinement, dequantize + dezigzag + separable float IDCT,
  chroma upsampling, JFIF YCbCr→RGB), GIF
  (``_decode_gif``: LZW, interlace, multi-frame), and baseline TIFF
  (``_decode_tiff``: both byte orders, none/PackBits/LZW strips,
  gray/RGB/palette) — the full raster set the reference accepts via
  Jimp (src/ocr/code-reader.service.ts:22-30) is real now.
- **PCM WAV audio** (``_decode_wav``: RIFF chunk walk, 8/16-bit integer
  PCM, exact integer sample stats) and **Y4M video** (``_decode_y4m``:
  YUV4MPEG2 header parse + FRAME walk over raw planar YCbCr, exact
  integer luma-plane stats) are REALLY decoded too — the codec-free
  audio and video containers.
- Progressive/arithmetic/12-bit JPEG and compressed audio/video remain
  STUBBED behind a deterministic fake seeded from the payload hash
  (``_decode_stub``) — mp3/aac/h264/vp9 genuinely need codec libraries
  the container doesn't ship; swap for pyav/soundfile in production.  The
  Spark-side plumbing (schema, batch shape, partitioning, UDF signature,
  per-row error isolation) is identical for both tiers and is what's
  under test.  A payload that CLAIMS a decodable format but fails to
  parse surfaces as a decode ERROR, never a silent stub downgrade.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources import load

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField("declared_w", IntegerType(), True),
        StructField("declared_h", IntegerType(), True),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("sha", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("error", StringType(), True),
    ]
)


def media_table(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic media table derived from documents: payload = utf-8
    bytes of the text (an opaque blob as far as the pipeline cares), typed
    metadata from doc columns."""
    docs = load(spark, sf, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        (F.col("n_chars") % 640 + 16).cast("int").alias("declared_w"),
        (F.col("n_chars") % 480 + 16).cast("int").alias("declared_h"),
    )


# Rec.601 luma weights (the classic Y' = 0.299R + 0.587G + 0.114B)
_LUMA = np.array([0.299, 0.587, 0.114])


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Header walk of a binary netpbm PPM (``P6``): ASCII header of three
    integers (width, height, maxval; '#' comments allowed), one whitespace
    byte, then pixels.  Returns (w, h, maxval, pixel_offset) — the single
    source of truth for the layout (decode and resize both consume it)."""
    tokens: list[int] = []
    i = 2  # past the P6 magic
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    w, h, maxval = tokens
    if w <= 0 or h <= 0:
        # a vacuous w*h*3 <= 0 would pass the truncation check and emit
        # NaN luma over an empty array as a "successful" decode
        raise ValueError(f"invalid PPM dimensions {w}x{h}")
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return w, h, maxval, i + 1  # single whitespace after maxval


def _decode_ppm(payload: bytes) -> dict:
    """Real decode of a binary PPM: header walk + RGB triplet extraction.
    Pure Python/numpy — no codec library."""
    w, h, maxval, off = _ppm_header(payload)
    data = payload[off : off + w * h * 3]
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    return {
        "width": w,
        "height": h,
        "mean_luma": float((px.astype(np.float64) @ _LUMA).mean() / maxval),
        "n_frames": 1,
    }


def _decode_bmp(payload: bytes) -> dict:
    """Real decode of an uncompressed 24-bit BI_RGB Windows BMP:
    BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), bottom-up BGR rows
    padded to 4-byte boundaries."""
    import struct

    off, hsz = struct.unpack_from("<I", payload, 10)[0], struct.unpack_from("<I", payload, 14)[0]
    if hsz < 40:
        raise ValueError(f"unsupported BMP header size {hsz}")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    if w <= 0 or h == 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    height = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(payload) < off + stride * height:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=off
    ).reshape(height, stride)[:, : w * 3]
    px = rows.reshape(height, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h > 0:
        px = px[::-1]  # bottom-up storage order
    return {
        "width": w,
        "height": height,
        "mean_luma": float((px.astype(np.float64) @ _LUMA).mean() / 255.0),
        "n_frames": 1,
    }


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# color type -> legal bit depths (PNG spec §11.2.2, table 11.1)
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# Adam7 interlace pass grid: (x0, y0, dx, dy) per pass (spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)
# declared-dimension sanity cap, enforced BEFORE inflating any pixel data:
# bounds both worker memory (the inflate buffer) and the per-byte Python
# unfilter loop for hostile average/paeth-filtered rows.  2048x2048 is far
# above any real thumbnail this pipeline resizes.
_PNG_MAX_PX = 1 << 22


def _png_chunks(payload: bytes):
    """Iterate (type, data) over the PNG chunk stream.  Length-framed walk;
    CRCs are present but not verified (zlib.crc32 over 100 TB of thumbnails
    buys nothing the inflate itself won't catch — truncation and garbage
    both fail the decompress or the size check below)."""
    import struct

    i = 8  # past the magic
    n = len(payload)
    while i + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        i += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the per-row PNG filters (spec §6: 0 none, 1 sub, 2 up,
    3 average, 4 paeth).  Row-sequential by construction (each row may
    reference the reconstructed row above); within a row, sub is a grouped
    cumulative sum (vectorized per byte-phase), average/paeth are the
    genuinely sequential ones and loop per byte — fine for thumbnail-sized
    rasters, and the whole decode runs inside the Arrow-batched worker."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y * (stride + 1)])
        row = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(stride, np.int64)
        if ftype == 0:
            rec = row
        elif ftype == 1:  # sub: rec[x] = row[x] + rec[x-bpp]
            rec = row.copy()
            for c in range(bpp):
                rec[c::bpp] = np.cumsum(rec[c::bpp]) % 256
        elif ftype == 2:  # up
            rec = row + prev
        elif ftype == 3:  # average — predictor reads RECONSTRUCTED (mod-256)
            rec = np.zeros(stride, np.int64)  # bytes, so wrap at every step
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif ftype == 4:  # paeth — same wrap-at-every-step requirement
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = (rec % 256).astype(np.uint8)
    return out


def _png_pass_bytes(w_p: int, h_p: int, depth: int, ch: int) -> int:
    """Filtered byte count of one (sub)image: h rows of 1 filter byte +
    ceil(w*ch*depth/8) packed sample bytes; an empty pass has no rows."""
    if w_p <= 0 or h_p <= 0:
        return 0
    stride = (w_p * ch * depth + 7) // 8
    return h_p * (stride + 1)


def _png_unpack(raw: np.ndarray, w_p: int, h_p: int, depth: int, ch: int) -> np.ndarray:
    """Unfilter + unpack one (sub)image to raw sample values (h, w, ch)
    uint8.  16-bit samples reduce to their high byte (the standard 16->8
    conversion); sub-byte samples come out UNSCALED (gray scaling and
    palette indexing differ downstream).  Filters operate on bytes with
    bpp = the byte width of one pixel rounded up to 1 (spec §7.2)."""
    stride = (w_p * ch * depth + 7) // 8
    bpp = max(1, (ch * depth) // 8)
    b = _png_unfilter(raw, h_p, stride, bpp)
    if depth == 8:
        return b.reshape(h_p, w_p, ch)
    if depth == 16:
        return b.reshape(h_p, stride)[:, 0::2].reshape(h_p, w_p, ch)
    # depth 1/2/4 — single-channel by spec (gray or palette indices)
    bits = np.unpackbits(b, axis=1)[:, : w_p * depth]
    vals = bits.reshape(h_p, w_p, depth) @ (1 << np.arange(depth - 1, -1, -1))
    return vals.astype(np.uint8).reshape(h_p, w_p, 1)


def _decode_png_pixels(payload: bytes) -> np.ndarray:
    """Real decode of a PNG via stdlib zlib — the full format matrix the
    reference's Jimp reader accepts (src/ocr/code-reader.service.ts:22-30):
    bit depths 1/2/4/8/16, color types gray / RGB / palette / gray+alpha /
    RGBA, non-interlaced and Adam7-interlaced.  IHDR parse,
    concatenated-IDAT inflate, per-(sub)image unfilter, channel expansion
    to (h, w, 3) RGB.  Gray scales to 8-bit (exact 255/(2^d-1) for d<8,
    high byte for 16-bit); palette indices look up PLTE (out-of-range
    indices raise); alpha is dropped (straight, not premultiplied — luma
    is computed over the color samples as stored, the same numbers Jimp's
    bitmap exposes).  Corrupt structure raises — an error, never a silent
    stub downgrade.

    IHDR is validated BEFORE any IDAT byte is inflated: the declared
    dimensions bound the inflate output, so a decompression-bomb payload
    (tiny deflate stream, enormous expansion) is rejected as a size
    mismatch instead of allocating gigabytes in the Python worker — the
    kernel's per-row error isolation catches exceptions, not OOMs."""
    import struct
    import zlib

    ihdr = None
    idat = bytearray()
    plte = None
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            if len(data) < 13:
                raise ValueError("PNG missing IHDR")
            ihdr = data
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            if w <= 0 or h <= 0:
                raise ValueError(f"invalid PNG dimensions {w}x{h}")
            if w * h > _PNG_MAX_PX:
                raise ValueError(
                    f"PNG too large ({w}x{h} > {_PNG_MAX_PX} px cap)"
                )
            if color not in _PNG_DEPTHS or depth not in _PNG_DEPTHS[color]:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color_type={color})"
                )
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                raise ValueError(
                    f"unsupported PNG (compression={comp}, filter={filt},"
                    f" interlace={interlace})"
                )
            ch = _PNG_CHANNELS[color]
        elif ctype == b"PLTE":
            if len(data) % 3 or not 3 <= len(data) <= 768:
                raise ValueError("invalid PNG PLTE length")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            if ihdr is None:
                raise ValueError("PNG IDAT before IHDR")
            idat.extend(data)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    if interlace == 0:
        passes = ((0, 0, 1, 1),)
    else:
        passes = _ADAM7
    geo = [
        (x0, y0, dx, dy, (w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
        for x0, y0, dx, dy in passes
    ]
    expected = sum(_png_pass_bytes(w_p, h_p, depth, ch) for *_, w_p, h_p in geo)
    d = zlib.decompressobj()
    raw_b = d.decompress(bytes(idat), expected + 1)
    if len(raw_b) != expected or not d.eof or d.unconsumed_tail:
        raise ValueError(
            f"PNG pixel data size {len(raw_b)}{'+' if not d.eof else ''}"
            f" != expected {expected}"
        )
    raw = np.frombuffer(raw_b, dtype=np.uint8)
    px = np.zeros((h, w, ch), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy, w_p, h_p in geo:
        nb = _png_pass_bytes(w_p, h_p, depth, ch)
        if nb == 0:
            continue
        px[y0::dy, x0::dx] = _png_unpack(
            raw[off : off + nb], w_p, h_p, depth, ch
        )
        off += nb
    if color == 3:  # palette lookup -> RGB
        return plte[px[:, :, 0]]
    if color in (0, 4):  # gray / gray+alpha
        g = px[:, :, :1]
        if depth < 8:
            g = (g.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(
                np.uint8
            )
        return np.repeat(g, 3, axis=2)
    return px[:, :, :3]  # RGB / RGBA (alpha dropped)


def _decode_png(payload: bytes) -> dict:
    px = _decode_png_pixels(payload)
    return {
        "width": px.shape[1],
        "height": px.shape[0],
        "mean_luma": float((px.astype(np.float64) @ _LUMA).mean() / 255.0),
        "n_frames": 1,
    }


# ---------------------------------------------------------------------------
# JPEG decode (pure Python/numpy — ITU-T T.81 Huffman modes).
# The reference decodes JPEG via Jimp (src/ocr/code-reader.service.ts:22-30);
# this is the honest stdlib equivalent: entropy/quant tables come from the
# file's own DHT/DQT segments, so correctness does not depend on any built-in
# table constants.  Supported: SOF0/SOF1 (baseline + extended sequential)
# AND SOF2 progressive (spectral selection + successive approximation, EOB
# runs, AC refinement per T.81 Annex G), 8-bit, 1 or 3 components, any
# sampling factors 1..4, restart intervals.  Rejected with an explicit
# error (never stubbed): arithmetic coding (DAC/SOF9+), 12-bit precision,
# lossless, hierarchical.
# ---------------------------------------------------------------------------

_JPEG_MAX_PX = 1 << 22  # same pre-decode bomb guard discipline as PNG


def _jpeg_zigzag() -> list[int]:
    """The T.81 zigzag scan order as flat raster indices, derived from the
    diagonal-walk rule (anti-diagonal s = row+col; even s walks up-right,
    odd s walks down-left) rather than hard-coded — the test suite pins it
    against the published 64-entry constant."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        order.extend(ij if s % 2 else list(reversed(ij)))
    return [r * 8 + c for r, c in order]


_ZIGZAG = _jpeg_zigzag()

# separable IDCT basis: C[u, x] = a(u) cos((2x+1)uπ/16), spatial = Cᵀ S C
_IDCT_C = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _JpegBits:
    """Entropy-segment bit reader: removes 0xFF00 byte stuffing, stops at
    any real marker (the caller handles RSTn), raises on truncation."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("truncated JPEG entropy data")
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("truncated JPEG entropy data")
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed literal 0xFF
            else:
                raise _JpegMarker(nxt)  # real marker inside entropy data
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        # truncate the accumulator to its live bits — without this, acc
        # grows into an ever-larger bigint and every _fill shift is O(bits
        # consumed so far), turning entropy decode quadratic in stream size
        # (measured: 38.5s -> 0.59s on a 233 KB noisy stream)
        self.acc &= (1 << self.n) - 1
        return v

    def align(self) -> None:
        self.acc = 0
        self.n = 0


class _JpegMarker(Exception):
    """Raised by the bit reader when a real marker interrupts entropy data
    (expected for RSTn and EOI at segment boundaries)."""

    def __init__(self, marker: int):
        self.marker = marker
        super().__init__(f"marker 0x{marker:02x}")


def _jpeg_huff_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman decode map (length, code) → symbol from a DHT
    segment's 16 length counts + value list (T.81 Annex C)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(br: _JpegBits, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t low bits to the signed coefficient."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


class _JpegScanState:
    """Mutable per-scan entropy state for progressive decoding: DC
    predictors (per scan component) and the shared AC end-of-band run."""

    def __init__(self, n: int):
        self.pred = [0] * n
        self.eobrun = 0


def _jpeg_ac_first(br, tbl, blk, ss, se, al, st) -> None:
    """AC first scan for one block's band (T.81 G.1.1.2.2): EOB runs span
    blocks, ZRL skips 16, values arrive at the Al point transform."""
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    k = ss
    while k <= se:
        sym = _jpeg_huff_decode(br, tbl)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            # EOBRUN includes the CURRENT block (libjpeg convention)
            st.eobrun = 1 << r
            if r:
                st.eobrun += br.read(r)
            st.eobrun -= 1
            return
        k += r
        if k > se:
            raise ValueError("JPEG AC run overflows band")
        blk[k] = _jpeg_extend(br.read(s), s) << al
        k += 1


def _jpeg_ac_refine(br, tbl, blk, ss, se, al, st) -> None:
    """AC refinement scan for one block's band (T.81 G.1.2.3): newly
    significant coefficients arrive as ±1<<Al; every already-nonzero
    coefficient passed over absorbs one correction bit; EOB runs carry the
    remaining corrections of each covered block."""
    p1 = 1 << al
    k = ss

    def correct(pos: int) -> None:
        if br.read(1) and (blk[pos] & p1) == 0:
            blk[pos] += p1 if blk[pos] >= 0 else -p1

    if st.eobrun == 0:
        while k <= se:
            sym = _jpeg_huff_decode(br, tbl)
            r, s = sym >> 4, sym & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    # EOBRUN includes the CURRENT block, whose remaining
                    # corrections are read in the tail below
                    st.eobrun = 1 << r
                    if r:
                        st.eobrun += br.read(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            elif s == 1:
                val = p1 if br.read(1) else -p1
            else:
                raise ValueError("invalid JPEG AC refinement symbol")
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                elif r == 0:
                    if s:
                        blk[k] = val
                    k += 1
                    break
                else:
                    r -= 1
                k += 1
    if st.eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        st.eobrun -= 1


def _jpeg_expect_restart(br, payload: bytes) -> None:
    br.align()
    j = br.pos
    if (
        j + 1 >= len(payload)
        or payload[j] != 0xFF
        or not (0xD0 <= payload[j + 1] <= 0xD7)
    ):
        raise ValueError("JPEG missing expected restart marker")
    br.pos = j + 2


def _jpeg_scan_progressive(
    payload, pos, seg, by_id, coef, huff, ri, geom
) -> int:
    """Decode one progressive SOS segment's entropy data into the
    per-component coefficient arrays; returns the position just past the
    scan (at the next marker)."""
    mcus_x, mcus_y, hmax, vmax, w, h = geom
    ns = seg[0]
    if len(seg) < 4 + 2 * ns:
        raise ValueError("truncated JPEG SOS header")
    sc = []
    for s in range(ns):
        cs, tdta = seg[1 + 2 * s], seg[2 + 2 * s]
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        sc.append((by_id[cs], tdta >> 4, tdta & 0x0F))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
    if not (0 <= ss <= se <= 63):
        raise ValueError(f"invalid JPEG spectral band {ss}..{se}")
    if ss == 0 and se != 0:
        raise ValueError("JPEG progressive scan mixes DC and AC")
    if ss > 0 and ns != 1:
        raise ValueError("JPEG progressive AC scan must be single-component")
    if ah != 0 and ah != al + 1:
        raise ValueError(f"invalid JPEG successive approximation {ah}->{al}")
    br = _JpegBits(payload, pos)
    st = _JpegScanState(ns)
    try:
        if ss == 0 and ns > 1:  # interleaved DC scan: MCU walk
            tbls = []
            for c, td, _ta in sc:
                tbl = huff.get((0, td)) if ah == 0 else None
                if ah == 0 and tbl is None:
                    raise ValueError("JPEG scan uses an undefined Huffman table")
                tbls.append(tbl)
            total = mcus_x * mcus_y
            for mcu in range(total):
                if ri and mcu and mcu % ri == 0:
                    _jpeg_expect_restart(br, payload)
                    st = _JpegScanState(ns)
                my, mx = divmod(mcu, mcus_x)
                for ci, (c, _td, _ta) in enumerate(sc):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coef[c["ci"]][my * c["v"] + by, mx * c["h"] + bx]
                            if ah == 0:
                                t = _jpeg_huff_decode(br, tbls[ci])
                                st.pred[ci] += (
                                    _jpeg_extend(br.read(t), t) if t else 0
                                )
                                blk[0] = st.pred[ci] << al
                            else:
                                blk[0] |= br.read(1) << al
        else:  # non-interleaved: the component's own block raster
            c, td, ta = sc[0]
            cw = -(-(w * c["h"]) // hmax)
            chh = -(-(h * c["v"]) // vmax)
            cbw, cbh = -(-cw // 8), -(-chh // 8)
            tbl = huff.get((0 if ss == 0 else 1, td if ss == 0 else ta))
            if ss == 0 and ah == 0 and tbl is None:
                raise ValueError("JPEG scan uses an undefined Huffman table")
            if ss > 0 and tbl is None:
                raise ValueError("JPEG scan uses an undefined Huffman table")
            for unit in range(cbw * cbh):
                if ri and unit and unit % ri == 0:
                    _jpeg_expect_restart(br, payload)
                    st = _JpegScanState(ns)
                uy, ux = divmod(unit, cbw)
                blk = coef[c["ci"]][uy, ux]
                if ss == 0:
                    if ah == 0:
                        t = _jpeg_huff_decode(br, tbl)
                        st.pred[0] += _jpeg_extend(br.read(t), t) if t else 0
                        blk[0] = st.pred[0] << al
                    else:
                        blk[0] |= br.read(1) << al
                elif ah == 0:
                    _jpeg_ac_first(br, tbl, blk, ss, se, al, st)
                else:
                    _jpeg_ac_refine(br, tbl, blk, ss, se, al, st)
    except _JpegMarker as m:
        raise ValueError(
            f"JPEG progressive scan ended early (marker 0x{m.marker:02x})"
        )
    return br.pos


def _decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB array."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None  # (w, h, components)
    restart_interval = 0
    adobe_transform = None  # APP14: 0 = components stored as RGB, 1 = YCbCr
    progressive = False
    coef = None  # progressive: per-component (bh, bw, 64) zigzag buffers
    geom = None
    by_id: dict[int, dict] = {}
    n_scans = 0
    i = 2
    n = len(payload)
    while True:
        if i + 2 > n:
            raise ValueError("truncated JPEG (no SOS)")
        if payload[i] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {i}")
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / stray RST
            i += 2
            continue
        if marker == 0xD9:  # EOI — legal only after progressive scans
            if progressive and n_scans:
                break
            raise ValueError("JPEG EOI before image data")
        if i + 4 > n:
            raise ValueError("truncated JPEG (no SOS)")
        (seglen,) = struct.unpack_from(">H", payload, i + 2)
        seg = payload[i + 4 : i + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported JPEG (16-bit quant table)")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                huff[(tc, th)] = _jpeg_huff_table(bits, seg[j + 17 : j + 17 + nv])
                j += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            if frame is not None:
                raise ValueError("unsupported JPEG (multiple frames)")
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if w <= 0 or h <= 0:
                raise ValueError(f"invalid JPEG dimensions {w}x{h}")
            if w * h > _JPEG_MAX_PX:
                raise ValueError(f"JPEG too large ({w}x{h} > {_JPEG_MAX_PX} px cap)")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(f"invalid JPEG sampling {ch}x{cv}")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = (w, h, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG (lossless/arithmetic/hierarchical "
                f"SOF 0x{marker:02x})"
            )
        elif marker == 0xCC:  # DAC
            raise ValueError("unsupported JPEG (arithmetic coding)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14 color transform
            adobe_transform = seg[11] if len(seg) >= 12 else None
        elif marker == 0xDA:  # SOS — entropy data follows
            if not progressive:
                break
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if coef is None:  # first scan: size the coefficient buffers
                w, h, comps = frame
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                for c in comps:
                    if hmax % c["h"] or vmax % c["v"]:
                        raise ValueError(
                            f"unsupported JPEG sampling ratio ({c['h']}x"
                            f"{c['v']} vs {hmax}x{vmax} max)"
                        )
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                coef = []
                for ci, c in enumerate(comps):
                    c["ci"] = ci
                    c["bw"] = mcus_x * c["h"]
                    c["bh"] = mcus_y * c["v"]
                    coef.append(
                        np.zeros((c["bh"], c["bw"], 64), dtype=np.int64)
                    )
                by_id = {c["id"]: c for c in comps}
                geom = (mcus_x, mcus_y, hmax, vmax, w, h)
            i = _jpeg_scan_progressive(
                payload, i + 2 + seglen, seg, by_id, coef, huff,
                restart_interval, geom,
            )
            n_scans += 1
            continue
        # other APPn / COM / anything else length-framed: skip
        i += 2 + seglen

    if progressive:
        # EOI reached: dequantize + IDCT the accumulated coefficients
        mcus_x, mcus_y, hmax, vmax, w, h = geom
        planes = []
        for c in comps:
            q = qt.get(c["tq"])
            if q is None:
                raise ValueError("JPEG component uses an undefined quant table")
            plane = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.float64)
            arr = coef[c["ci"]]
            for by in range(c["bh"]):
                for bx in range(c["bw"]):
                    block = np.zeros(64, dtype=np.float64)
                    block[_ZIGZAG] = arr[by, bx]
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        _IDCT_C.T @ (block.reshape(8, 8) * q) @ _IDCT_C
                    )
            planes.append(plane)
        return _jpeg_finish(planes, comps, hmax, vmax, w, h, adobe_transform)

    if frame is None:
        raise ValueError("JPEG SOS before SOF")
    w, h, comps = frame
    ns = seg[0]
    if ns != len(comps):
        raise ValueError("unsupported JPEG (non-interleaved multi-scan)")
    by_id = {c["id"]: c for c in comps}
    for s in range(ns):
        cs, td_ta = seg[1 + 2 * s], seg[2 + 2 * s]
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        by_id[cs]["td"], by_id[cs]["ta"] = td_ta >> 4, td_ta & 0x0F

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError(
                f"unsupported JPEG sampling ratio ({c['h']}x{c['v']} vs "
                f"{hmax}x{vmax} max)"
            )
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks per row
        c["bh"] = mcus_y * c["v"]
        planes.append(np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.float64))

    br = _JpegBits(payload, i + 2 + seglen)
    pred = [0] * len(comps)
    mcu = 0
    total_mcus = mcus_x * mcus_y
    while mcu < total_mcus:
        if restart_interval and mcu and mcu % restart_interval == 0:
            _jpeg_expect_restart(br, payload)
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        try:
            for ci, c in enumerate(comps):
                dc_tbl = huff.get((0, c["td"]))
                ac_tbl = huff.get((1, c["ta"]))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("JPEG scan uses an undefined Huffman table")
                q = qt.get(c["tq"])
                if q is None:
                    raise ValueError("JPEG component uses an undefined quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeff = np.zeros(64, dtype=np.int64)
                        t = _jpeg_huff_decode(br, dc_tbl)
                        pred[ci] += _jpeg_extend(br.read(t), t) if t else 0
                        coeff[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _jpeg_huff_decode(br, ac_tbl)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("invalid JPEG AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC run overflows block")
                            coeff[k] = _jpeg_extend(br.read(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coeff
                        spat = _IDCT_C.T @ (block.reshape(8, 8) * q) @ _IDCT_C
                        py, px_ = (my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8
                        planes[ci][py : py + 8, px_ : px_ + 8] = spat
        except _JpegMarker as m:
            raise ValueError(
                f"JPEG entropy data ended early (marker 0x{m.marker:02x} "
                f"at MCU {mcu}/{total_mcus})"
            )
        mcu += 1

    return _jpeg_finish(planes, comps, hmax, vmax, w, h, adobe_transform)


def _jpeg_finish(planes, comps, hmax, vmax, w, h, adobe_transform) -> np.ndarray:
    """Shared reconstruction tail (baseline and progressive): level shift,
    chroma upsample, padding crop, color interpretation."""
    out = []
    for ci, c in enumerate(comps):
        plane = np.clip(np.round(planes[ci] + 128.0), 0, 255)
        # upsample to full resolution, then crop the MCU padding
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        g = out[0].astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    # color interpretation: JFIF 3-component streams are YCbCr; Adobe APP14
    # transform=0 and 'R','G','B' component ids both mean the planes are
    # stored as RGB directly — converting those as YCbCr would produce
    # silently wrong pixels with error=None
    comp_ids = tuple(c["id"] for c in comps)
    stored_rgb = adobe_transform == 0 or comp_ids == (0x52, 0x47, 0x42)
    if stored_rgb:
        return np.stack(out, axis=2).astype(np.uint8)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_jpeg(payload: bytes) -> dict:
    px = _decode_jpeg_pixels(payload)
    return {
        "width": px.shape[1],
        "height": px.shape[0],
        "mean_luma": float((px.astype(np.float64) @ _LUMA).mean() / 255.0),
        "n_frames": 1,
    }


# ---------------------------------------------------------------------------
# GIF decode (pure Python/numpy — GIF87a/GIF89a).  The third Jimp format
# (src/ocr/code-reader.service.ts:22-30): logical-screen + color-table
# parse, per-frame LZW decompression (variable-width codes, CLEAR/EOI,
# 12-bit dictionary cap), 4-pass GIF interlace, multi-frame walk.  Stats
# follow the established conventions: the raster is frame 1 composited on
# the logical screen's background color (what a static reader like Jimp
# shows), transparency is dropped (the PNG alpha convention — luma over
# the color samples as stored), and n_frames is the REAL image-descriptor
# count with every frame's LZW stream fully validated (the Y4M convention).
# ---------------------------------------------------------------------------

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code: int, expected: int) -> np.ndarray:
    """Decompress one GIF image's LZW stream to exactly ``expected`` color
    indices (uint8).  Variable code width from min_code+1 up to 12 bits,
    CLEAR resets the dictionary, EOI ends the stream; the deferred-clear
    case (full dictionary, no CLEAR) holds at 12 bits per spec."""
    if not 2 <= min_code <= 8:
        raise ValueError(f"invalid GIF LZW minimum code size {min_code}")
    clear = 1 << min_code
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    out = bytearray()
    prev = None
    acc = nbits = 0
    i = 0
    n = len(data)
    while True:
        while nbits < width:
            if i >= n:
                raise ValueError("truncated GIF LZW stream (no EOI)")
            acc |= data[i] << nbits  # GIF packs codes LSB-first
            nbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid GIF LZW first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("invalid GIF LZW code")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
        if len(out) > expected:
            raise ValueError(
                f"GIF LZW yields {len(out)}+ indices, frame holds {expected}"
            )
    if len(out) != expected:
        raise ValueError(
            f"GIF LZW yields {len(out)} indices, frame holds {expected}"
        )
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _gif_subblocks(payload: bytes, i: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``i``; returns (data,
    index past the 0 terminator)."""
    out = bytearray()
    n = len(payload)
    while True:
        if i >= n:
            raise ValueError("truncated GIF sub-block chain")
        size = payload[i]
        i += 1
        if size == 0:
            return bytes(out), i
        if i + size > n:
            raise ValueError("truncated GIF sub-block")
        out += payload[i : i + size]
        i += size


def _gif_walk(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Full-stream GIF walk -> (width, height, n_frames, first-frame
    canvas).  Frame 1 is composited on the background color (the raster a
    static reader like Jimp shows); EVERY frame's LZW stream is
    decompressed and validated.  Corrupt structure raises — an error,
    never a silent stub downgrade."""
    import struct

    if payload[:6] not in _GIF_MAGICS or len(payload) < 13:
        raise ValueError("not a GIF (bad header)")
    w, h, flags, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid GIF dimensions {w}x{h}")
    if w * h > _PNG_MAX_PX:
        raise ValueError(f"GIF too large ({w}x{h} > {_PNG_MAX_PX} px cap)")
    i = 13
    gct = None
    if flags & 0x80:
        ncol = 2 << (flags & 0x07)
        if i + 3 * ncol > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(payload[i : i + 3 * ncol], np.uint8).reshape(-1, 3)
        i += 3 * ncol
    n_frames = 0
    canvas = None
    while True:
        if i >= len(payload):
            raise ValueError("truncated GIF (no trailer)")
        block = payload[i]
        i += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks (skipped; GIF89a
            i += 1  # transparency is alpha, which this tier drops)
            _, i = _gif_subblocks(payload, i)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if i + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        fx, fy, fw, fh, fflags = struct.unpack_from("<HHHHB", payload, i)
        i += 9
        if fw <= 0 or fh <= 0 or fx + fw > w or fy + fh > h:
            raise ValueError(
                f"GIF frame rect {fw}x{fh}@{fx},{fy} outside {w}x{h} screen"
            )
        pal = gct
        if fflags & 0x80:  # local color table
            ncol = 2 << (fflags & 0x07)
            if i + 3 * ncol > len(payload):
                raise ValueError("truncated GIF local color table")
            pal = np.frombuffer(payload[i : i + 3 * ncol], np.uint8).reshape(
                -1, 3
            )
            i += 3 * ncol
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if i >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code = payload[i]
        lzw, i = _gif_subblocks(payload, i + 1)
        idx = _gif_lzw_decode(lzw, min_code, fw * fh).reshape(fh, fw)
        if fflags & 0x40:  # GIF 4-pass interlace
            de = np.zeros_like(idx)
            rows = np.concatenate(
                [np.arange(0, fh, 8), np.arange(4, fh, 8),
                 np.arange(2, fh, 4), np.arange(1, fh, 2)]
            )
            de[rows] = idx
            idx = de
        if int(idx.max()) >= len(pal):
            raise ValueError("GIF index outside color table")
        n_frames += 1
        if canvas is None:  # frame 1 composited on the background color
            if fw == w and fh == h:
                canvas = pal[idx]
            else:
                if gct is None or bg >= len(gct):
                    raise ValueError("GIF partial first frame without "
                                     "a background color")
                canvas = np.tile(gct[bg], (h, w, 1))
                canvas[fy : fy + fh, fx : fx + fw] = pal[idx]
    if n_frames == 0 or canvas is None:
        raise ValueError("GIF has no image frames")
    return w, h, n_frames, canvas


def _decode_gif_pixels(payload: bytes) -> np.ndarray:
    """First-frame composited (h, w, 3) RGB raster (the resize-tier view;
    the full multi-frame validation still runs)."""
    return _gif_walk(payload)[3]


def _decode_gif(payload: bytes) -> dict:
    w, h, n_frames, canvas = _gif_walk(payload)
    return {
        "width": w,
        "height": h,
        "mean_luma": float((canvas.astype(np.float64) @ _LUMA).mean() / 255.0),
        "n_frames": n_frames,
    }


# ---------------------------------------------------------------------------
# TIFF decode (pure Python/numpy — TIFF 6.0 baseline subset).  The fourth
# and last Jimp raster format (src/ocr/code-reader.service.ts:22-30):
# both byte orders, IFD walk, strip assembly, Compression 1 (none) /
# 32773 (PackBits) / 5 (LZW — the TIFF variant: MSB-first code packing
# and early width change, unlike GIF's LSB-first late change), photometric
# gray (both zero conventions), RGB, and 16-bit ColorMap palette, 8-bit
# samples, chunky planar config.  n_frames counts the IFD chain (TIFF
# stores multi-page documents the way GIF stores animation frames).
# Everything else raises explicitly — an error, never a silent stub.
# ---------------------------------------------------------------------------

_TIFF_MAGICS = (b"II*\x00", b"MM\x00*")


def _tiff_lzw_decode(data: bytes, expected: int) -> np.ndarray:
    """TIFF-variant LZW (spec §13): 8-bit symbols, CLEAR=256, EOI=257,
    codes packed MSB-first, EARLY width change (the bump fires one code
    sooner than GIF's — when the next free slot is (1<<width) - 1)."""
    clear, eoi = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    prev = None
    acc = nbits = 0
    i = 0
    n = len(data)
    while True:
        while nbits < width:
            if i >= n:
                raise ValueError("truncated TIFF LZW stream (no EOI)")
            acc = (acc << 8) | data[i]
            nbits += 8
            i += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == clear:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid TIFF LZW first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("invalid TIFF LZW code")
        out += entry
        prev = entry
        if len(table) >= (1 << width) - 1 and width < 12:  # early change
            width += 1
        if len(out) > expected:
            raise ValueError(
                f"TIFF LZW yields {len(out)}+ bytes, strip holds {expected}"
            )
    if len(out) != expected:
        raise ValueError(
            f"TIFF LZW yields {len(out)} bytes, strip holds {expected}"
        )
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _tiff_packbits_decode(data: bytes, expected: int) -> np.ndarray:
    """PackBits RLE (spec §9): n in 0..127 copies n+1 literals, n in
    -127..-1 repeats the next byte 1-n times, -128 is a no-op."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c < 128:  # literal run
            if i + c + 1 > n:
                raise ValueError("truncated TIFF PackBits literal run")
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat run of 257 - c
            if i >= n:
                raise ValueError("truncated TIFF PackBits repeat run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    if len(out) != expected:
        raise ValueError(
            f"TIFF PackBits yields {len(out)} bytes, strip holds {expected}"
        )
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _decode_tiff_pixels(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode the FIRST IFD's raster to (h, w, 3) RGB and count the IFD
    chain (multi-page documents)."""
    import struct

    if payload[:4] not in _TIFF_MAGICS:
        raise ValueError("not a TIFF (bad header)")
    end = "<" if payload[:2] == b"II" else ">"

    def u16(off):
        return struct.unpack_from(end + "H", payload, off)[0]

    def u32(off):
        return struct.unpack_from(end + "I", payload, off)[0]

    _TYPE_SIZE = {1: 1, 3: 2, 4: 4}

    def entry_values(off):
        tag, typ, count = u16(off), u16(off + 2), u32(off + 4)
        if typ not in _TYPE_SIZE:
            return tag, None  # rational/ascii/etc — not a tag we consume
        size = _TYPE_SIZE[typ] * count
        voff = off + 8 if size <= 4 else u32(off + 8)
        if voff + size > len(payload):
            raise ValueError("TIFF tag value outside file")
        rd = u32 if typ == 4 else (u16 if typ == 3 else
                                   lambda o: payload[o])
        step = _TYPE_SIZE[typ]
        return tag, [rd(voff + k * step) for k in range(count)]

    ifd = u32(4)
    if ifd == 0 or ifd + 2 > len(payload):
        raise ValueError("TIFF missing first IFD")
    # count the IFD chain (bounded walk — a cycle would loop forever)
    n_frames = 0
    seen = set()
    nxt = ifd
    while nxt:
        if nxt in seen or len(seen) > 4096:
            raise ValueError("TIFF IFD chain cycle")
        seen.add(nxt)
        if nxt + 2 > len(payload):
            raise ValueError("truncated TIFF IFD")
        cnt = u16(nxt)
        if nxt + 2 + 12 * cnt + 4 > len(payload):
            raise ValueError("truncated TIFF IFD")
        n_frames += 1
        nxt = u32(nxt + 2 + 12 * cnt)
    tags = {}
    cnt = u16(ifd)
    for k in range(cnt):
        tag, vals = entry_values(ifd + 2 + 12 * k)
        if vals is not None:
            tags[tag] = vals
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}")
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid TIFF dimensions {w}x{h}")
    if w * h > _PNG_MAX_PX:
        raise ValueError(f"TIFF too large ({w}x{h} > {_PNG_MAX_PX} px cap)")
    photo = tags.get(262, [1])[0]
    comp = tags.get(259, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [1])
    rps = tags.get(278, [2**32 - 1])[0]
    planar = tags.get(284, [1])[0]
    if any(b != 8 for b in bits) or len(bits) != spp:
        raise ValueError(f"unsupported TIFF (bits_per_sample={bits})")
    if planar != 1:
        raise ValueError(f"unsupported TIFF (planar_config={planar})")
    if photo in (0, 1, 3):
        need_spp = 1
    elif photo == 2:
        need_spp = 3
    else:
        raise ValueError(f"unsupported TIFF (photometric={photo})")
    if spp != need_spp:
        raise ValueError(
            f"unsupported TIFF (photometric={photo}, samples={spp})"
        )
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF (compression={comp})")
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts mismatch")
    parts = []
    for s, (o, c) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - s * rps)
        if rows <= 0:
            raise ValueError("TIFF has more strips than rows")
        if o + c > len(payload):
            raise ValueError("TIFF strip outside file")
        raw = payload[o : o + c]
        exp = rows * w * spp
        if comp == 1:
            if len(raw) != exp:
                raise ValueError(
                    f"TIFF strip holds {len(raw)} bytes, expected {exp}"
                )
            parts.append(np.frombuffer(raw, dtype=np.uint8))
        elif comp == 5:
            parts.append(_tiff_lzw_decode(raw, exp))
        else:
            parts.append(_tiff_packbits_decode(raw, exp))
    px = np.concatenate(parts).reshape(h, w, spp)
    if photo == 2:
        return px, n_frames
    if photo == 3:  # palette: ColorMap is 3 * 2^bits 16-bit values, RRGGBB
        cmap = tags.get(320)
        if cmap is None or len(cmap) != 3 * 256:
            raise ValueError("TIFF palette missing or short ColorMap")
        cm = (np.array(cmap, dtype=np.int64).reshape(3, 256).T >> 8).astype(
            np.uint8
        )
        return cm[px[:, :, 0]], n_frames
    g = px if photo == 1 else 255 - px  # photometric 0: white is zero
    return np.repeat(g, 3, axis=2), n_frames


def _decode_tiff(payload: bytes) -> dict:
    px, n_frames = _decode_tiff_pixels(payload)
    return {
        "width": px.shape[1],
        "height": px.shape[0],
        "mean_luma": float((px.astype(np.float64) @ _LUMA).mean() / 255.0),
        "n_frames": n_frames,
    }


_DIB_HEADER_SIZES = (40, 52, 56, 108, 124)  # known BITMAPINFO header widths


def _sniff_bmp(payload: bytes) -> bool:
    """BMP claim test: 'BM' magic + a KNOWN DIB-header-size field at offset
    14.  Deliberately does NOT require the bfSize field to match the payload
    length — the spec allows a stale/zero bfSize for uncompressed files, and
    gating on it would silently downgrade a truncated real BMP to the stub
    (fake plausible stats, error=None) instead of surfacing the truncation
    error.  Prose bytes that happen to start with 'BM' fail the header-size
    probe and take the stub, as before."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return False
    import struct

    return struct.unpack_from("<I", payload, 14)[0] in _DIB_HEADER_SIZES


def _decode(payload: bytes, media_type: str, w: int, h: int) -> dict:
    """Tiered dispatcher: real pure-Python decode for the decodable
    raster tier (magic-sniffed — PPM needs 'P6'+whitespace, BMP needs 'BM'
    plus a known DIB header size, PNG its full 8-byte magic, so prose
    bytes can't false-positive), deterministic stub for everything else.  A payload that CLAIMS a real format but
    fails to parse surfaces as a decode error — never silently downgraded
    to the stub."""
    if payload[:2] == b"P6" and payload[2:3].isspace():
        return _decode_ppm(payload)
    if _sniff_bmp(payload):
        return _decode_bmp(payload)
    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        return _decode_jpeg(payload)
    if payload[:6] in _GIF_MAGICS:
        return _decode_gif(payload)
    if payload[:4] in _TIFF_MAGICS:
        return _decode_tiff(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # real PCM WAV: no raster semantics, but the frame count (and so
        # frame_sample's byte addressing) is the file's true sample frames
        a = _decode_wav(payload)
        return {
            "width": None,
            "height": None,
            "mean_luma": None,
            "n_frames": int(a["n_samples"]),
        }
    if payload[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
        # real Y4M video: true frame count + exact mean luma (the Y plane IS
        # luma) — frame_sample's byte addressing uses the file's real frames
        v = _decode_y4m(payload)
        return {
            "width": int(v["width"]),
            "height": int(v["height"]),
            "mean_luma": v["y_sum"]
            / (v["n_frames"] * v["width"] * v["height"] * 255.0),
            "n_frames": int(v["n_frames"]),
        }
    return _decode_stub(payload, media_type, w, h)


def _decode_stub(payload: bytes, media_type: str, w: int, h: int) -> dict:
    """Deterministic fake decode: derives pixel stats from the payload hash.
    In production this is soundfile / pyav frame sampling —
    NotImplementedError-equivalent stub per the container's library set."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    digest = hashlib.sha256(payload).digest()
    rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
    mean_luma = float(rng.mean() / 255.0)
    n_frames = 1 if media_type == "image" else int(digest[0]) + 1
    return {"width": int(w), "height": int(h), "mean_luma": mean_luma, "n_frames": n_frames}


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for r in pdf.itertuples(index=False):
            payload = bytes(r.payload) if r.payload is not None else b""
            row = {
                "media_id": int(r.media_id),
                "media_type": r.media_type,
                "n_bytes": len(payload),
                "sha": hashlib.sha256(payload).hexdigest()[:16],
                "width": None,
                "height": None,
                "mean_luma": None,
                "n_frames": None,
                "error": None,
            }
            try:  # per-row isolation, mirroring the branch isolation rule
                feat = _decode(payload, r.media_type, r.declared_w, r.declared_h)
                row.update(feat)
            except Exception as e:
                row["error"] = f"decode_failed: {e}"
            out.append(row)
        yield pd.DataFrame(out, columns=[f.name for f in FEATURES.fields])


def media_features(
    spark: SparkSession, sf: str, table: DataFrame | None = None
) -> DataFrame:
    """Binary decode/feature-extract over mapInPandas (Arrow batches).
    ``table`` — a pre-filtered media frame (pass it to keep row pruning
    BELOW the decode: Catalyst cannot push a filter through the
    MapInPandas node, so filtering on the UDF output decodes and then
    discards)."""
    src = media_table(spark, sf) if table is None else table
    return src.mapInPandas(_extract_batches, schema=FEATURES)


THUMB = 8  # thumbnail grid edge (8x8 luma grid)
K_FRAMES = 4  # uniform samples per audio/video payload

RESIZED = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("grid_w", IntegerType(), True),
        StructField("grid_h", IntegerType(), True),
        StructField("luma_csv", StringType(), True),
        StructField("luma_sum", LongType(), True),
        StructField("error", StringType(), True),
    ]
)


def _resize_grid(payload: bytes, media_type: str, w: int, h: int) -> list[int]:
    """THUMB x THUMB integer luma grid, row-major.

    Real rasters (PPM/BMP/PNG/JPEG/GIF/TIFF) are genuinely resized: nearest-neighbor index
    mapping src = (dst * src_dim) // THUMB, per-pixel integer luma
    (299R + 587G + 114B) // 1000 — all floor arithmetic, so the grid is
    bit-stable across platforms.  Stubbed formats derive the grid from the
    payload digest (value i = digest[i mod 32]) — deterministic and
    oracle-reproducible from sha256 alone."""
    if payload[:2] == b"P6" and payload[2:3].isspace():
        raster = _decode_ppm_pixels(payload)
    elif _sniff_bmp(payload):
        raster = _decode_bmp_pixels(payload)
    elif payload[:8] == _PNG_MAGIC:
        raster = _decode_png_pixels(payload)
    elif payload[:3] == b"\xff\xd8\xff":
        raster = _decode_jpeg_pixels(payload)
    elif payload[:6] in _GIF_MAGICS:
        raster = _decode_gif_pixels(payload)
    elif payload[:4] in _TIFF_MAGICS:
        raster = _decode_tiff_pixels(payload)[0]
    elif payload[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
        # real Y4M video thumbnail: the first frame's Y plane is already
        # luma — skip the RGB weighting and sample it directly
        luma = _y4m_frame0_luma(payload).astype(np.int64)
        sh, sw = luma.shape
        ys = [(ty * sh) // THUMB for ty in range(THUMB)]
        xs = [(tx * sw) // THUMB for tx in range(THUMB)]
        return [int(luma[y, x]) for y in ys for x in xs]
    else:
        raster = None
    if raster is None:
        if payload is None or len(payload) == 0:
            raise ValueError("empty payload")
        digest = hashlib.sha256(payload).digest()
        return [digest[i % 32] for i in range(THUMB * THUMB)]
    px = raster.astype(np.int64)
    sh, sw = px.shape[0], px.shape[1]
    ys = [(ty * sh) // THUMB for ty in range(THUMB)]
    xs = [(tx * sw) // THUMB for tx in range(THUMB)]
    luma = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
    return [int(luma[y, x]) for y in ys for x in xs]


def _decode_ppm_pixels(payload: bytes) -> np.ndarray:
    """Pixel array of a P6 PPM (same _ppm_header walk as _decode_ppm)."""
    w, h, _maxval, off = _ppm_header(payload)
    if len(payload) < off + w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off).reshape(
        h, w, 3
    )


def _decode_bmp_pixels(payload: bytes) -> np.ndarray:
    """Pixel array of a 24-bit BI_RGB BMP (same layout walk as _decode_bmp)."""
    import struct

    _decode_bmp(payload)  # validates
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    height = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=off).reshape(
        height, stride
    )[:, : w * 3]
    px = rows.reshape(height, w, 3)[:, :, ::-1]
    if h > 0:
        px = px[::-1]
    return px


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for r in pdf.itertuples(index=False):
            payload = bytes(r.payload) if r.payload is not None else b""
            row = {
                "media_id": int(r.media_id),
                "media_type": r.media_type,
                "grid_w": THUMB,
                "grid_h": THUMB,
                "luma_csv": None,
                "luma_sum": None,
                "error": None,
            }
            try:
                grid = _resize_grid(payload, r.media_type, r.declared_w, r.declared_h)
                row["luma_csv"] = ",".join(str(v) for v in grid)
                row["luma_sum"] = int(sum(grid))
            except Exception as e:
                row["error"] = f"resize_failed: {e}"
            out.append(row)
        yield pd.DataFrame(out, columns=[f.name for f in RESIZED.fields])


def media_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Thumbnail/resize over mapInPandas: the batch-decode-and-downsample
    stage of an image-curation pipeline (dedup on thumbnails, filter on
    luma stats).  Real nearest-neighbor resize for the decodable raster
    tier, digest-derived stub grid for the rest — identical schema, batch
    shape, and per-row error isolation either way.

    Scale shape: embarrassingly parallel one-pass map, no shuffle at all
    before the presentation sort; Arrow batch size caps Python memory."""
    from . import ordered

    out = media_table(spark, sf).mapInPandas(_resize_batches, schema=RESIZED)
    return ordered(out, "media_id")


def _codec_const_hex() -> dict[str, tuple[str, str]]:
    """(prefix_hex, suffix_hex) of the four 4x4 synthetic container
    layouts used by ``codec_grid_parity``.  Headers are pure layout
    constants (dimensions, strip offsets, the GIF global color table from
    its integer rule); only the pixel/index bytes vary per row.  Built
    with struct so the layout math is readable and unit-checkable."""
    import struct as _s

    ppm = (b"P6 4 4 255\n".hex().upper(), "")
    bmp_hdr = b"BM" + _s.pack("<IHHI", 102, 0, 0, 54) + _s.pack(
        "<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, 48, 0, 0, 0, 0
    )
    bmp = (bmp_hdr.hex().upper(), "")
    entries = [
        (256, 3, 1, 4),  # ImageWidth
        (257, 3, 1, 4),  # ImageLength
        (258, 3, 3, 122),  # BitsPerSample -> blob right after the IFD
        (259, 3, 1, 1),  # Compression: none
        (262, 3, 1, 2),  # Photometric: RGB
        (273, 4, 1, 128),  # StripOffsets -> pixels after the blob
        (277, 3, 1, 3),  # SamplesPerPixel
        (278, 3, 1, 4),  # RowsPerStrip
        (279, 4, 1, 48),  # StripByteCounts
    ]
    ifd = _s.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += _s.pack("<HHII", tag, typ, cnt, val)
    ifd += _s.pack("<I", 0)
    tif = (
        (b"II*\x00" + _s.pack("<I", 8) + ifd + _s.pack("<HHH", 8, 8, 8))
        .hex()
        .upper(),
        "",
    )
    gct = bytes(
        v
        for k in range(128)
        for v in ((3 * k) % 256, (5 * k + 1) % 256, (11 * k + 2) % 256)
    )
    gif_hdr = (
        b"GIF89a"
        + _s.pack("<HHBBB", 4, 4, 0x86, 0, 0)
        + gct
        + _s.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0)
        + bytes([7, 33])  # LZW min code 7, one 33-byte sub-block
    )
    gif = (gif_hdr.hex().upper(), "003B")  # block terminator + trailer
    # PNG: stored-deflate (BTYPE=00) keeps the zlib stream arithmetic;
    # chunk CRCs are zeros (the chunk walk never checks them) but the
    # Adler-32 trailer IS validated by zlib, so the query computes it in
    # SQL.  Raw stream = 4 rows x (filter 0 + 12 RGB bytes) = 52 bytes;
    # IDAT payload = 2 (zlib hdr) + 5 (stored block hdr) + 52 + 4 = 63.
    png_hdr = (
        _PNG_MAGIC
        + _s.pack(">I", 13) + b"IHDR"
        + _s.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
        + b"\x00\x00\x00\x00"  # IHDR crc (unchecked)
        + _s.pack(">I", 63) + b"IDAT"
        + b"\x78\x01"  # zlib header
        + b"\x01" + _s.pack("<H", 52) + _s.pack("<H", 0xFFFF - 52)
    )
    png = (
        png_hdr.hex().upper(),
        # IDAT crc + IEND chunk (len 0, type, crc) — all crcs zeros
        ("00000000" + _s.pack(">I", 0).hex() + b"IEND".hex() + "00000000").upper(),
    )
    # JPEG: baseline grayscale 16x4 (two MCUs, DC-only) with GENERATED
    # uniform-length Huffman tables (16 codes of length 4 in both DC and AC
    # tables — a decoder shipping Annex-K defaults mis-decodes) and a flat
    # Q table of 8, so the dequantized DC-only IDCT is EXACT integer
    # arithmetic: MCU pixel = 128 + cumulative DC.  The 3 entropy bytes
    # (first DC value, the second MCU's DC DIFF — prediction exercised —
    # and EOBs + padding) are the per-row variance computed in SQL.
    jc = bytes([0, 0, 0, 16] + [0] * 12)  # 16 canonical codes, all length 4
    jpeg_hdr = (
        b"\xff\xd8"
        + b"\xff\xdb" + _s.pack(">H", 67) + b"\x00" + bytes([8]) * 64
        + b"\xff\xc0" + _s.pack(">H", 11) + bytes([8])
        + _s.pack(">HH", 4, 16) + bytes([1, 1, 0x11, 0])
        + b"\xff\xc4" + _s.pack(">H", 35) + bytes([0x00]) + jc + bytes(range(16))
        + b"\xff\xc4" + _s.pack(">H", 35) + bytes([0x10]) + jc + bytes(range(16))
        + b"\xff\xda" + _s.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    )
    jpeg = (jpeg_hdr.hex().upper(), "FFD9")
    # progressive twin: SOF2 + a single DC scan (Ss=Se=0, Ah=Al=0) over the
    # same two MCUs — the progressive coefficient-buffer path, scan-until-EOI
    # termination, and the same generated DC table; DC scans carry no EOB,
    # so the entropy is 2 bytes (13 bits + 1-padding)
    jpeg_prog_hdr = (
        b"\xff\xd8"
        + b"\xff\xdb" + _s.pack(">H", 67) + b"\x00" + bytes([8]) * 64
        + b"\xff\xc2" + _s.pack(">H", 11) + bytes([8])
        + _s.pack(">HH", 4, 16) + bytes([1, 1, 0x11, 0])
        + b"\xff\xc4" + _s.pack(">H", 35) + bytes([0x00]) + jc + bytes(range(16))
        + b"\xff\xda" + _s.pack(">H", 8) + bytes([1, 1, 0x00, 0, 0, 0])
    )
    jpeg_prog = (jpeg_prog_hdr.hex().upper(), "FFD9")
    return {
        "ppm": ppm, "bmp": bmp, "tiff": tif, "gif": gif, "png": png,
        "jpeg": jpeg, "jpeg_prog": jpeg_prog,
    }


def codec_grid_parity(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-hashable end-to-end check of the REAL codecs: seven container
    arms (PPM, BMP, TIFF, GIF, PNG, baseline JPEG, progressive JPEG) are
    built byte-by-byte in native Spark SQL from closed-form integer pixel
    rules — headers are layout constants, the encodings chosen are the
    stored/uncompressed ones so the byte stream stays arithmetic (GIF uses
    the clear-code-per-symbol LZW degenerate, whose 8-bit codes are plain
    bytes; PNG uses a stored-deflate block with the Adler-32 trailer
    computed by a SQL aggregate; both JPEG arms are two-MCU DC-only
    grayscale streams with GENERATED uniform-length Huffman tables and a
    flat Q=8 table, so Huffman decode, DC prediction, dequant and IDCT
    land on exact integers — 128 + cumulative DC; the progressive arm
    additionally drives the SOF2 coefficient-buffer path, the
    non-interleaved DC scan, and scan-until-EOI termination) — then
    decoded by the real decoders inside the
    one-pass Arrow resize kernel.  The
    oracle never parses a payload: it derives the same 8x8
    nearest-neighbor integer luma grid directly from the pixel rules
    (dedup's mutant-overlay trick: structure synthesized, CODEC real).
    A decode failure surfaces as a non-null error column, never a
    silently plausible grid.

    Scale shape: narrow projection (payload built JVM-side, no UDF) ->
    one mapInPandas decode pass -> presentation sort; no shuffle."""
    from . import ordered

    docs = load(spark, sf, "documents").select("doc_id")
    hx = _codec_const_hex()
    rgb_hex = (
        "array_join(transform(sequence(0, 15), p -> concat("
        "lpad(hex((doc_id * 31 + p * 7) % 256), 2, '0'),"
        "lpad(hex((doc_id * 17 + p * 11) % 256), 2, '0'),"
        "lpad(hex((doc_id * 13 + p * 5) % 256), 2, '0'))), '')"
    )
    # BMP stores bottom-up BGR: stored index q maps to image pixel
    # p = (3 - q div 4) * 4 + q % 4, channels reversed
    bmp_px = "((3 - q div 4) * 4 + q % 4)"
    bmp_hex = (
        "array_join(transform(sequence(0, 15), q -> concat("
        f"lpad(hex((doc_id * 13 + {bmp_px} * 5) % 256), 2, '0'),"
        f"lpad(hex((doc_id * 17 + {bmp_px} * 11) % 256), 2, '0'),"
        f"lpad(hex((doc_id * 31 + {bmp_px} * 7) % 256), 2, '0'))), '')"
    )
    gif_hex = (
        "concat(array_join(transform(sequence(0, 15), p -> concat('80',"
        "lpad(hex((doc_id * 7 + p * 3) % 128), 2, '0'))), ''), '81')"
    )
    # PNG stored-deflate raw stream: byte i (0..51) is a filter 0 at
    # i % 13 == 0, else a channel of pixel (i div 13) * 4 + (i % 13 - 1)
    # div 3 — and the Adler-32 trailer computed over those same bytes
    png_byte = (
        "(CASE WHEN {i} % 13 = 0 THEN 0L ELSE"
        " element_at(array("
        "(doc_id * 31 + (({i} div 13) * 4 + ({i} % 13 - 1) div 3) * 7) % 256,"
        "(doc_id * 17 + (({i} div 13) * 4 + ({i} % 13 - 1) div 3) * 11) % 256,"
        "(doc_id * 13 + (({i} div 13) * 4 + ({i} % 13 - 1) div 3) * 5) % 256"
        "), CAST(({i} % 13 - 1) % 3 + 1 AS INT)) END)"
    )
    png_raw_hex = (
        "array_join(transform(sequence(0, 3), r -> concat('00',"
        " array_join(transform(sequence(0, 3), x -> concat("
        "lpad(hex((doc_id * 31 + (r * 4 + x) * 7) % 256), 2, '0'),"
        "lpad(hex((doc_id * 17 + (r * 4 + x) * 11) % 256), 2, '0'),"
        "lpad(hex((doc_id * 13 + (r * 4 + x) * 5) % 256), 2, '0'))), ''))), '')"
    )
    adler_hex = (
        "lpad(hex(((52 + aggregate(sequence(0, 51), 0L, (acc, i) -> acc"
        f" + (52 - i) * {png_byte.format(i='i')})) % 65521) * 65536"
        " + (1 + aggregate(sequence(0, 51), 0L, (acc, i) -> acc"
        f" + {png_byte.format(i='i')})) % 65521), 8, '0')"
    )
    # JPEG entropy bytes: DC1 = 4 + (doc_id*7)%4 (category 3), DC diff
    # = 2 + (doc_id*11)%2 (category 2).  Baseline: each value + EOB,
    # padded with 1s — byte0 = 0011 v1v1v1 0, byte1 = 000 0010 1,
    # byte2 = d0 0000 111.  Progressive DC scan: no EOBs — 13 bits
    # (0011 v1v1v1 0010 dd) + 3 padding 1s in 2 bytes.
    jpeg_hex = (
        "concat(lpad(hex(56 + 2 * ((doc_id * 7) % 4)), 2, '0'), '05',"
        " lpad(hex(((doc_id * 11) % 2) * 128 + 7), 2, '0'))"
    )
    jpeg_prog_hex = (
        "concat(lpad(hex(56 + 2 * ((doc_id * 7) % 4)), 2, '0'),"
        " lpad(hex(87 + 8 * ((doc_id * 11) % 2)), 2, '0'))"
    )
    payload_hex = F.expr(
        f"""CASE doc_id % 7
          WHEN 0 THEN concat('{hx["ppm"][0]}', {rgb_hex})
          WHEN 1 THEN concat('{hx["bmp"][0]}', {bmp_hex})
          WHEN 2 THEN concat('{hx["tiff"][0]}', {rgb_hex})
          WHEN 3 THEN concat('{hx["gif"][0]}', {gif_hex}, '{hx["gif"][1]}')
          WHEN 4 THEN concat('{hx["png"][0]}', {png_raw_hex}, {adler_hex}, '{hx["png"][1]}')
          WHEN 5 THEN concat('{hx["jpeg"][0]}', {jpeg_hex}, '{hx["jpeg"][1]}')
          ELSE concat('{hx["jpeg_prog"][0]}', {jpeg_prog_hex}, '{hx["jpeg_prog"][1]}')
        END"""
    )
    m = docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(payload_hex).alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit(4).cast("int").alias("declared_w"),
        F.lit(4).cast("int").alias("declared_h"),
    )
    out = m.mapInPandas(_resize_batches, schema=RESIZED).select(
        "media_id",
        F.element_at(
            F.array(F.lit("ppm"), F.lit("bmp"), F.lit("tiff"), F.lit("gif"),
                    F.lit("png"), F.lit("jpeg"), F.lit("jpeg_prog")),
            (F.col("media_id") % 7 + 1).cast("int"),
        ).alias("fmt"),
        "grid_w",
        "grid_h",
        "luma_sum",
        "luma_csv",
        "error",
    )
    return ordered(out, "media_id")


def frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling over audio/video payloads: the decode UDF reports
    n_frames; K_FRAMES uniform sample points explode JVM-side as
    frame_idx = (k * n_frames) div K with byte-range addressing
    (chunk_len = n_bytes div n_frames) — the slice a real pipeline would
    hand to the frame decoder.  Spark-native after the one decode pass:
    the explosion, arithmetic, and ordering never leave the JVM.

    Scale shape: one mapInPandas decode pass OVER THE AUDIO/VIDEO ROWS
    ONLY (media_type is known pre-decode, and a filter cannot push through
    the MapInPandas node — so the pruning happens below it) -> generator
    explode (xK) -> presentation sort; no join, no keyed shuffle."""
    from . import ordered

    src = media_table(spark, sf).filter(F.col("media_type").isin("audio", "video"))
    feats = media_features(spark, sf, table=src).filter(F.col("error").isNull())
    frames = feats.select(
        "media_id",
        "media_type",
        "n_frames",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.explode(F.sequence(F.lit(0), F.lit(K_FRAMES - 1))).alias("sample_k"),
    )
    out = frames.select(
        "media_id",
        "media_type",
        F.col("sample_k").cast("long").alias("sample_k"),
        F.expr(f"(sample_k * n_frames) div {K_FRAMES}").alias("frame_idx"),
        F.expr(
            f"(n_bytes div n_frames) * ((sample_k * n_frames) div {K_FRAMES})"
        ).alias("byte_off"),
        F.expr("n_bytes div n_frames").alias("chunk_len"),
    )
    return ordered(out, "media_id", "sample_k")


def media_meta_sql(spark: SparkSession, sf: str) -> DataFrame:
    """The SQL-checkable half of the multimodal plumbing: byte length +
    content hash + type tagging of the binary column (no stubbed decode)."""
    m = media_table(spark, sf)
    return m.select(
        "media_id",
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.substring(F.sha2("payload", 256), 1, 16).alias("sha"),
        "declared_w",
        "declared_h",
    ).orderBy("media_id")


def thumbnail_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual image dedup on the THUMB×THUMB luma thumbnail — the
    image-corpus analog of content-key text dedup (re-hosted copies of the
    same picture differ byte-wise in metadata but share the downsampled
    luma grid; LAION-style pipelines dedup on exactly such reduced
    representations).  The benchmark overlay re-hosts every fifth image
    payload under a new media_id (+3,000,000) — every overlay row must
    land in its base image's group.

    Scale shape: media_type pruning happens BELOW the decode (a filter
    cannot push through MapInPandas); the grid is computed in ONE
    Arrow-batched pass; the keeper is the ``line_dedup`` principle — ONE
    aggregation on the grid key (map-side combine collapses a
    mass-duplicated image before the shuffle, never a window over the hot
    content key) and an equi-join marks members back."""
    from . import ordered

    base = media_table(spark, sf).filter(F.col("media_type") == "image")
    rehosted = base.filter(F.col("media_id") % 5 == 0).withColumn(
        "media_id", F.col("media_id") + 3000000
    )
    grids = base.unionByName(rehosted).mapInPandas(_resize_batches, schema=RESIZED)
    # the grid frame feeds TWO consumers (keeper aggregate + mark-back
    # join); without materialization Spark clones the whole decode subtree
    # into both branches and the Arrow pass runs twice — localCheckpoint
    # evaluates the decode ONCE (the semantic_decontaminate precedent)
    ok = (
        grids.filter(F.col("error").isNull())
        .select("media_id", "luma_csv")
        .localCheckpoint(eager=True)
    )
    groups = ok.groupBy("luma_csv").agg(
        F.min("media_id").alias("keeper"),
        F.count("*").cast("long").alias("grp_size"),
    )
    out = ok.join(groups, "luma_csv").select(
        "media_id",
        "grp_size",
        (F.col("media_id") == F.col("keeper")).cast("int").alias("canonical"),
    )
    return ordered(out, "media_id")


# ---------------------------------------------------------------------------
# Audio tier: real WAV (RIFF/PCM) decode.  WAV is the one mainstream audio
# container that needs no codec library — raw integer PCM samples behind a
# chunked header — so it moves from the stub tier to the REALLY-decoded tier
# exactly the way PPM/BMP/PNG/JPEG did for images (the reference's decode
# seam, SURVEY.md §2.1 S6).  Compressed audio (mp3/aac/ogg) and video stay
# stubbed: genuinely codec-library-bound in this container.

AUDIO = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),  # frames (per channel)
        StructField("peak_abs", IntegerType(), True),  # max |sample|, 16-bit domain
        StructField("sumsq", LongType(), True),  # exact Σ sample², 16-bit domain
        StructField("duration_ms", LongType(), True),
        StructField("error", StringType(), True),
    ]
)


def _wav_chunks(payload: bytes):
    """Chunk walk of a RIFF/WAVE container: yields (chunk_id, data_offset,
    size).  Sizes are little-endian; chunk data is word-aligned (odd sizes
    pad one byte).  A chunk whose declared size runs past the payload
    errors — a payload that CLAIMS WAVE but lies about sizes must surface,
    never downgrade to the stub."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        data = pos + 8
        if data + size > len(payload):
            raise ValueError(f"truncated WAV chunk {cid!r}")
        yield cid, data, size
        pos = data + size + (size & 1)


def _decode_wav(payload: bytes) -> dict:
    """PCM WAV decode: fmt /data chunk walk, 8-bit unsigned or 16-bit
    signed little-endian integer PCM, any channel count, extra chunks
    (LIST, fact, ...) skipped by the walk.  Returns exact integer stats in
    the 16-bit domain (8-bit samples are centered and scaled ×256):
    frames, peak |sample|, Σ sample² — all integer arithmetic, bit-stable
    and independently recomputable by a test oracle.  Non-PCM codecs and
    other bit depths raise (codec-library-bound), never silently stub."""
    import struct

    fmt = data = None
    for cid, off, size in _wav_chunks(payload):
        if cid == b"fmt " and fmt is None:
            fmt = (off, size)
        elif cid == b"data" and data is None:
            data = (off, size)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt /data chunk")
    off, size = fmt
    if size < 16:
        raise ValueError("WAV fmt chunk too short")
    audio_format, n_channels, sample_rate = struct.unpack_from("<HHI", payload, off)
    bits = struct.unpack_from("<H", payload, off + 14)[0]
    if audio_format != 1:
        raise ValueError(f"unsupported WAV codec {audio_format} (integer PCM only)")
    if bits not in (8, 16):
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if n_channels < 1 or sample_rate < 1:
        raise ValueError("degenerate WAV fmt")
    doff, dsize = data
    frame_bytes = (bits // 8) * n_channels
    n_frames = dsize // frame_bytes
    count = n_frames * n_channels
    if bits == 16:
        s = np.frombuffer(payload, dtype="<i2", count=count, offset=doff).astype(
            np.int64
        )
    else:
        s = (
            np.frombuffer(payload, dtype=np.uint8, count=count, offset=doff).astype(
                np.int64
            )
            - 128
        ) * 256
    return {
        "sample_rate": int(sample_rate),
        "n_channels": int(n_channels),
        "n_samples": int(n_frames),
        "peak_abs": int(np.abs(s).max()) if count else 0,
        "sumsq": int((s * s).sum()) if count else 0,
        "duration_ms": n_frames * 1000 // int(sample_rate),
    }


def _audio_stub(payload: bytes) -> dict:
    """Deterministic fake for codec-bound audio formats, seeded from the
    payload digest (oracle-reproducible from sha256 alone, like the
    ``_resize_grid`` stub tier)."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    d = hashlib.sha256(payload).digest()
    rate = (8000, 16000, 22050, 44100)[d[0] % 4]
    frames = int.from_bytes(d[2:4], "big") + 1
    return {
        "sample_rate": rate,
        "n_channels": d[1] % 2 + 1,
        "n_samples": frames,
        "peak_abs": int.from_bytes(d[4:6], "big") % 32768,
        "sumsq": int.from_bytes(d[6:10], "big"),
        "duration_ms": frames * 1000 // rate,
    }


def _audio_features_row(payload: bytes) -> dict:
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    return _audio_stub(payload)


def _audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for r in pdf.itertuples(index=False):
            payload = bytes(r.payload) if r.payload is not None else b""
            row = {
                "media_id": int(r.media_id),
                "n_bytes": len(payload),
                "sample_rate": None,
                "n_channels": None,
                "n_samples": None,
                "peak_abs": None,
                "sumsq": None,
                "duration_ms": None,
                "error": None,
            }
            try:  # per-row isolation, mirroring the raster tier
                row.update(_audio_features_row(payload))
            except Exception as e:
                row["error"] = f"decode_failed: {e}"
            out.append(row)
        yield pd.DataFrame(out, columns=[f.name for f in AUDIO.fields])


def audio_features(
    spark: SparkSession, sf: str, table: DataFrame | None = None
) -> DataFrame:
    """Audio feature extraction over the binary column: REAL RIFF/PCM WAV
    decode (exact integer sample stats — frames, peak, Σ sample², duration)
    with the digest-derived stub for codec-bound formats, identical schema
    and per-row error isolation either way.

    Scale shape: media_type pruning happens BELOW the decode (a filter
    cannot push through MapInPandas), then one embarrassingly-parallel
    Arrow-batched pass — no shuffle before the presentation sort."""
    from . import ordered

    src = (
        media_table(spark, sf).filter(F.col("media_type") == "audio")
        if table is None
        else table
    )
    out = src.mapInPandas(_audio_batches, schema=AUDIO)
    return ordered(out, "media_id")


# ---------------------------------------------------------------------------
# Video tier: real Y4M (YUV4MPEG2) decode.  Y4M is the one mainstream video
# container that needs no codec library — an ASCII parameter header plus raw
# planar YCbCr frames — so it moves from the stub tier to the REALLY-decoded
# tier exactly the way WAV did for audio and PPM/BMP/PNG/JPEG did for images
# (the reference's decode seam, SURVEY.md §2.1 S6).  Compressed video
# (h264/vp9/av1 in mp4/webm) stays stubbed: genuinely codec-library-bound in
# this container; swap for pyav in production.

VIDEO = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("fps_num", IntegerType(), True),
        StructField("fps_den", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("y_sum", LongType(), True),  # exact Σ Y-plane bytes, all frames
        StructField("y_peak", IntegerType(), True),  # max Y byte over all frames
        StructField("error", StringType(), True),
    ]
)

_Y4M_MAGIC = b"YUV4MPEG2"

# colorspace tag -> chroma subsampling divisors (x, y); None = no chroma
# planes.  The C420 family (jpeg/mpeg2/paldv) differs only in chroma SITING,
# not plane geometry, so one entry covers all three suffixes.
_Y4M_CHROMA = {"420": (2, 2), "422": (2, 1), "444": (1, 1), "mono": None}

# one frame may not exceed this many luma pixels (the PNG cap's analog;
# bounds the numpy allocation per frame — total payload bytes bound the rest)
_Y4M_MAX_PX = 4_000_000


def _y4m_header(payload: bytes) -> tuple[int, int, int, int, str, int]:
    """Parse the Y4M stream header: ``YUV4MPEG2`` then space-separated
    tagged parameters terminated by LF.  Returns (w, h, fps_num, fps_den,
    chroma_key, offset_past_newline).  W and H are required; F defaults to
    25:1 and C to 420jpeg per common mplayer/ffmpeg practice.  Unknown tags
    (I interlace, A aspect, X comment) are skipped — they don't change
    plane geometry."""
    if payload[: len(_Y4M_MAGIC)] != _Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n", 0, 4096)
    if nl < 0:
        raise ValueError("unterminated Y4M stream header")
    w = h = 0
    fn, fd = 25, 1
    chroma = "420"
    for tok in payload[len(_Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"C":
            cs = val.decode("ascii", errors="replace")
            key = "mono" if cs.startswith("mono") else cs[:3]
            if key not in _Y4M_CHROMA:
                raise ValueError(f"unsupported Y4M colorspace C{cs}")
            chroma = key
            continue
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"F":
                num, _, den = val.partition(b":")
                fn, fd = int(num), int(den)
        except ValueError as e:  # int() on malformed tag bytes
            raise ValueError(f"malformed Y4M header tag {tok!r}: {e}") from e
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid Y4M dimensions {w}x{h}")
    if w * h > _Y4M_MAX_PX:
        raise ValueError(f"Y4M frame too large ({w}x{h} > {_Y4M_MAX_PX} px cap)")
    if fn <= 0 or fd <= 0:
        raise ValueError(f"invalid Y4M frame rate {fn}:{fd}")
    return w, h, fn, fd, chroma, nl + 1


def _decode_y4m(payload: bytes) -> dict:
    """Real Y4M decode: header parse, then a FRAME-marker walk over raw
    planar data.  Stats are exact integers over the Y (luma) plane — Y4M
    stores luma directly, so no color conversion enters the arithmetic:
    frame count, Σ Y bytes across all frames, peak Y byte, duration from
    the header frame rate.  A truncated frame, a missing FRAME marker, or
    trailing bytes raise — a payload that CLAIMS Y4M but lies about layout
    must surface, never downgrade to the stub."""
    w, h, fn, fd, chroma, pos = _y4m_header(payload)
    div = _Y4M_CHROMA[chroma]
    ysize = w * h
    csize = 0 if div is None else 2 * (-(-w // div[0])) * (-(-h // div[1]))
    frame_size = ysize + csize
    n_frames = 0
    y_sum = 0
    y_peak = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        nl = payload.find(b"\n", pos + 5, pos + 5 + 1024)
        if nl < 0:
            raise ValueError("unterminated Y4M FRAME header")
        data = nl + 1
        if data + frame_size > n:
            raise ValueError(
                f"truncated Y4M frame {n_frames} ({n - data} of {frame_size} bytes)"
            )
        y = np.frombuffer(payload, dtype=np.uint8, count=ysize, offset=data)
        y_sum += int(y.sum(dtype=np.int64))
        y_peak = max(y_peak, int(y.max()))
        n_frames += 1
        pos = data + frame_size
    if n_frames == 0:
        raise ValueError("Y4M stream has no frames")
    return {
        "width": w,
        "height": h,
        "fps_num": fn,
        "fps_den": fd,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 * fd // fn,
        "y_sum": y_sum,
        "y_peak": y_peak,
    }


def _y4m_frame0_luma(payload: bytes) -> np.ndarray:
    """(h, w) uint8 luma plane of the FIRST frame — the video thumbnail
    source (Y4M's Y plane IS luma; no conversion)."""
    w, h, _fn, _fd, _chroma, pos = _y4m_header(payload)
    if payload[pos : pos + 5] != b"FRAME":
        raise ValueError(f"expected FRAME marker at offset {pos}")
    nl = payload.find(b"\n", pos + 5, pos + 5 + 1024)
    if nl < 0:
        raise ValueError("unterminated Y4M FRAME header")
    if nl + 1 + w * h > len(payload):
        raise ValueError("truncated Y4M frame 0")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=nl + 1).reshape(
        h, w
    )


def _video_stub(payload: bytes) -> dict:
    """Deterministic fake for codec-bound video formats, seeded from the
    payload digest (oracle-reproducible from sha256 alone, like the audio
    and raster stub tiers)."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    d = hashlib.sha256(payload).digest()
    fn = (24, 25, 30, 60)[d[2] % 4]
    frames = d[3] * 256 + d[4] + 1
    return {
        "width": d[0] * 4 + 16,
        "height": d[1] * 4 + 16,
        "fps_num": fn,
        "fps_den": 1,
        "n_frames": frames,
        "duration_ms": frames * 1000 // fn,
        "y_sum": d[5] * 16777216 + d[6] * 65536 + d[7] * 256 + d[8],
        "y_peak": d[9],
    }


def _video_features_row(payload: bytes) -> dict:
    if payload[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
        return _decode_y4m(payload)
    return _video_stub(payload)


def _video_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for r in pdf.itertuples(index=False):
            payload = bytes(r.payload) if r.payload is not None else b""
            row = {
                "media_id": int(r.media_id),
                "n_bytes": len(payload),
                "width": None,
                "height": None,
                "fps_num": None,
                "fps_den": None,
                "n_frames": None,
                "duration_ms": None,
                "y_sum": None,
                "y_peak": None,
                "error": None,
            }
            try:  # per-row isolation, mirroring the raster and audio tiers
                row.update(_video_features_row(payload))
            except Exception as e:
                row["error"] = f"decode_failed: {e}"
            out.append(row)
        yield pd.DataFrame(out, columns=[f.name for f in VIDEO.fields])


def video_features(
    spark: SparkSession, sf: str, table: DataFrame | None = None
) -> DataFrame:
    """Video feature extraction over the binary column: REAL Y4M
    (YUV4MPEG2) decode — exact integer luma-plane stats per payload (frame
    count, Σ Y bytes, peak Y, duration from the header frame rate) — with
    the digest-derived stub for codec-bound containers, identical schema
    and per-row error isolation either way.

    Scale shape: media_type pruning happens BELOW the decode (a filter
    cannot push through MapInPandas), then one embarrassingly-parallel
    Arrow-batched pass — no shuffle before the presentation sort."""
    from . import ordered

    src = (
        media_table(spark, sf).filter(F.col("media_type") == "video")
        if table is None
        else table
    )
    out = src.mapInPandas(_video_batches, schema=VIDEO)
    return ordered(out, "media_id")
