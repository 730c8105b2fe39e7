"""Multimodal binary plumbing: the mapInPandas decode/feature path must be
deterministic, schema-stable, and per-row error-isolated.  Uncompressed
rasters (PPM/BMP) are REALLY decoded — header parse + pixel math in pure
Python — through the same Arrow kernel; the stub only stands in for
compressed/audio/video formats."""

import struct

from pyspark.sql import functions as F

from ocr_mini_service_spark.operators import multimodal


def _ppm(w, h, rows_rgb):
    """Binary P6 with a comment line (header-tokenizer coverage)."""
    head = f"P6\n# synthetic fixture\n{w} {h}\n255\n".encode()
    return head + b"".join(bytes(px) for row in rows_rgb for px in row)


def _bmp(w, h, rows_rgb):
    """24-bit BI_RGB, bottom-up storage, rows padded to 4-byte stride."""
    stride = (w * 3 + 3) // 4 * 4
    pixel = b""
    for row in reversed(rows_rgb):
        rb = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        pixel += rb + b"\x00" * (stride - len(rb))
    off = 14 + 40
    fh = b"BM" + struct.pack("<IHHI", off + len(pixel), 0, 0, off)
    ih = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel), 2835, 2835, 0, 0
    )
    return fh + ih + pixel


# 2x2 test image: black, white, pure red, pure green (Rec.601 luma
# 0, 1, 0.299, 0.587 -> mean 0.4715)
_PX = [[(0, 0, 0), (255, 255, 255)], [(255, 0, 0), (0, 255, 0)]]
_WANT_LUMA = (0.0 + 1.0 + 0.299 + 0.587) / 4


def test_real_raster_decode_through_kernel(spark):
    """PPM and BMP payloads produce REAL pixel statistics (exact header
    dims, Rec.601 mean luma) through the same mapInPandas kernel; a payload
    claiming a real format but truncated surfaces as a decode error, never
    a silent stub fallback."""
    rows = [
        (1, _ppm(2, 2, _PX), "image", 99, 99),
        (2, _bmp(2, 2, _PX), "image", 99, 99),
        (3, _bmp(3, 2, [r + [(0, 0, 255)] for r in _PX]), "image", 99, 99),
        (4, _ppm(4, 4, _PX), "image", 99, 99),  # truncated: claims 4x4
    ]
    out = {
        r["media_id"]: r
        for r in spark.createDataFrame(rows, schema=multimodal.MEDIA)
        .mapInPandas(multimodal._extract_batches, schema=multimodal.FEATURES)
        .collect()
    }
    for mid in (1, 2):
        r = out[mid]
        assert r["error"] is None
        assert (r["width"], r["height"]) == (2, 2)  # header, not declared_w
        assert abs(r["mean_luma"] - _WANT_LUMA) < 1e-12
        assert r["n_frames"] == 1
    # 3-wide BMP exercises the 4-byte row padding: blue column adds luma
    r3 = out[3]
    want3 = (0.0 + 1.0 + 0.299 + 0.587 + 2 * 0.114) / 6
    assert r3["error"] is None and (r3["width"], r3["height"]) == (3, 2)
    assert abs(r3["mean_luma"] - want3) < 1e-12
    assert out[4]["error"] and "truncated PPM" in out[4]["error"]


def test_prose_payload_uses_stub_not_raster_path(spark):
    """UTF-8 text payloads (the synthetic media table) must never sniff as
    a raster: they take the deterministic stub with declared dimensions."""
    rows = [(1, "BMW words not a bitmap".encode(), "image", 32, 16)]
    out = (
        spark.createDataFrame(rows, schema=multimodal.MEDIA)
        .mapInPandas(multimodal._extract_batches, schema=multimodal.FEATURES)
        .collect()[0]
    )
    assert out["error"] is None and (out["width"], out["height"]) == (32, 16)


def test_media_features_deterministic_and_total(spark, sf_dir):
    feats = multimodal.media_features(spark, sf_dir)
    n_docs = multimodal.media_table(spark, sf_dir).count()
    rows1 = {r["media_id"]: r for r in feats.collect()}
    rows2 = {r["media_id"]: r for r in feats.collect()}
    assert len(rows1) == n_docs
    assert rows1 == rows2  # stub decode is deterministic across runs

    ok = [r for r in rows1.values() if r["error"] is None]
    assert len(ok) == sum(1 for r in rows1.values() if r["n_bytes"] > 0)
    for r in ok:
        assert r["width"] is not None and r["height"] is not None
        assert 0.0 <= r["mean_luma"] <= 1.0
        assert (r["n_frames"] == 1) == (r["media_type"] == "image")


def test_media_features_error_isolation(spark):
    """An empty payload fails decode but the row completes with metadata +
    error (mirrors the reference's branch isolation,
    image-recognition.service.ts:164-173)."""
    bad = spark.createDataFrame(
        [(1, b"", "image", 32, 32), (2, b"x", "audio", 32, 32)],
        schema=multimodal.MEDIA,
    )
    out = {r["media_id"]: r for r in
           bad.mapInPandas(multimodal._extract_batches, schema=multimodal.FEATURES).collect()}
    assert out[1]["error"] and "decode_failed" in out[1]["error"]
    assert out[1]["sha"] is not None  # metadata half still produced
    assert out[2]["error"] is None and out[2]["n_frames"] >= 1


def test_real_raster_resize_nearest_neighbor(spark):
    """A 2x2 raster resized to the 8x8 grid: nearest-neighbor index
    (t * src) // 8 maps quadrants exactly — integer lumas
    (299R+587G+114B)//1000 per source pixel, tiled 4x4 each."""
    rows = [(1, _ppm(2, 2, _PX), "image", 99, 99),
            (2, _bmp(2, 2, _PX), "image", 99, 99)]
    out = {
        r["media_id"]: r
        for r in spark.createDataFrame(rows, schema=multimodal.MEDIA)
        .mapInPandas(multimodal._resize_batches, schema=multimodal.RESIZED)
        .collect()
    }
    # quadrant lumas: black=0, white=255, red=(299*255)//1000=76,
    # green=(587*255)//1000=149
    q = [[0, 255], [76, 149]]
    want = [q[(ty * 2) // 8][(tx * 2) // 8] for ty in range(8) for tx in range(8)]
    for mid in (1, 2):
        r = out[mid]
        assert r["error"] is None and (r["grid_w"], r["grid_h"]) == (8, 8)
        assert [int(v) for v in r["luma_csv"].split(",")] == want
        assert r["luma_sum"] == sum(want)


def test_resize_stub_grid_is_digest_derived(spark):
    """Prose payloads take the stub grid: value i = sha256(payload)[i%32]."""
    import hashlib

    payload = "not an image at all".encode()
    out = (
        spark.createDataFrame([(7, payload, "image", 4, 4)], schema=multimodal.MEDIA)
        .mapInPandas(multimodal._resize_batches, schema=multimodal.RESIZED)
        .collect()[0]
    )
    digest = hashlib.sha256(payload).digest()
    want = [digest[i % 32] for i in range(64)]
    assert [int(v) for v in out["luma_csv"].split(",")] == want


def test_frame_sample_uniform_and_byte_addressed(spark, sf_dir):
    """Every audio/video payload yields exactly K_FRAMES samples with
    monotone frame indices and in-range byte windows."""
    rows = multimodal.frame_sample(spark, sf_dir).collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    feats = {
        r["media_id"]: r
        for r in multimodal.media_features(spark, sf_dir).collect()
    }
    for mid, grp in by_media.items():
        assert [g["sample_k"] for g in grp] == list(range(multimodal.K_FRAMES))
        f = feats[mid]
        assert f["media_type"] in ("audio", "video")
        idxs = [g["frame_idx"] for g in grp]
        assert idxs == sorted(idxs) and all(0 <= i < f["n_frames"] for i in idxs)
        for g in grp:
            assert g["byte_off"] + g["chunk_len"] <= f["n_bytes"]
            assert g["frame_idx"] == (g["sample_k"] * f["n_frames"]) // multimodal.K_FRAMES


def test_degenerate_raster_headers_error_not_nan(spark):
    """Zero/negative header dims must surface as decode errors — never a
    'successful' NaN-luma row (the empty-array mean)."""
    rows = [
        (1, b"P6\n0 0 255\n", "image", 9, 9),
        (2, b"P6\n-2 2 255\n" + b"\x00" * 64, "image", 9, 9),
        # a REAL truncated BMP (stale bfSize is legal, so the sniff must
        # still claim it and the decode must error — never the stub)
        (3, _bmp(2, 2, _PX)[:-1], "image", 9, 9),
    ]
    out = {
        r["media_id"]: r
        for r in spark.createDataFrame(rows, schema=multimodal.MEDIA)
        .mapInPandas(multimodal._extract_batches, schema=multimodal.FEATURES)
        .collect()
    }
    assert out[1]["error"] and "invalid PPM dimensions" in out[1]["error"]
    assert out[2]["error"] and "invalid PPM dimensions" in out[2]["error"]
    assert out[3]["error"] and "truncated BMP" in out[3]["error"]

# ---------------------------------------------------------------------------
# PNG: real stdlib-zlib decode (full Jimp matrix: depths 1/2/4/8/16, all
# five color types incl. palette, filters 0-4, Adam7 interlace)
# ---------------------------------------------------------------------------


def _png_chunk(ctype, data):
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png(w, h, rows_px, color_type=2, filters=None):
    """Minimal PNG encoder for fixtures: 8-bit, non-interlaced, one IDAT.
    ``rows_px`` — per row, per pixel, a tuple with the channel count of
    ``color_type`` (0 gray, 2 RGB, 4 gray+alpha, 6 RGBA).  ``filters`` —
    per-row filter type (default all 0); the encoder applies the spec's
    forward transform so the decoder must invert it exactly."""
    import zlib

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    filters = filters or [0] * h
    stride = w * ch
    raw = bytearray()
    prev = [0] * stride
    for y, row in enumerate(rows_px):
        cur = [v for px in row for v in px]
        assert len(cur) == stride
        f = filters[y]
        raw.append(f)
        for x in range(stride):
            left = cur[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:  # paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            raw.append((cur[x] - pred) % 256)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _png_filter_rows(rows_b, bpp, ftype):
    """Forward-filter packed rows (spec §9): one filter type for every
    row; byte-level with the decoder's bpp."""
    raw = bytearray()
    prev = bytes(len(rows_b[0]))
    for cur in rows_b:
        raw.append(ftype)
        for x in range(len(cur)):
            left = cur[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            raw.append((cur[x] - pred) % 256)
        prev = cur
    return raw


def _png_full(w, h, px_rows, color_type, depth, interlace=0, plte=None, ftype=0):
    """General PNG encoder for fixtures: any legal depth/color-type pair,
    optional Adam7 interlace and palette, one forward filter type for all
    rows.  ``px_rows`` — h rows of w tuples of RAW sample values (palette
    images: 1-tuples of indices; 16-bit: full 16-bit sample values)."""
    import zlib

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = max(1, ch * depth // 8)

    def pack_row(row):
        flat = [v for px in row for v in px]
        if depth == 8:
            return bytes(flat)
        if depth == 16:
            return b"".join(struct.pack(">H", v) for v in flat)
        out = bytearray()
        acc = nb = 0
        for v in flat:
            acc = (acc << depth) | v
            nb += depth
            if nb == 8:
                out.append(acc)
                acc = nb = 0
        if nb:
            out.append(acc << (8 - nb))
        return bytes(out)

    def sub_raw(pxs):
        return _png_filter_rows([pack_row(r) for r in pxs], bpp, ftype)

    if interlace == 0:
        raw = sub_raw(px_rows)
    else:
        raw = bytearray()
        for x0, y0, dx, dy in multimodal._ADAM7:
            sub = [row[x0::dx] for row in px_rows[y0::dy]]
            if sub and sub[0]:
                raw += sub_raw(sub)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", bytes(v for rgb in plte for v in rgb))
    return (
        out
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_decode_all_color_types_exact():
    """Exact dims + Rec.601 luma for gray, gray+alpha, RGB, RGBA — alpha
    dropped, gray expanded; all values bit-checked against hand math."""
    rgb = multimodal._decode_png(_png(2, 2, [[(0, 0, 0), (255, 255, 255)],
                                             [(255, 0, 0), (0, 255, 0)]], 2))
    assert (rgb["width"], rgb["height"], rgb["n_frames"]) == (2, 2, 1)
    assert abs(rgb["mean_luma"] - _WANT_LUMA) < 1e-12

    gray = multimodal._decode_png(_png(2, 1, [[(0,), (102,)]], 0))
    assert abs(gray["mean_luma"] - (0 + 102) / 2 / 255.0) < 1e-12

    ga = multimodal._decode_png(_png(2, 1, [[(0, 7), (102, 200)]], 4))
    assert abs(ga["mean_luma"] - (0 + 102) / 2 / 255.0) < 1e-12  # alpha ignored

    rgba = multimodal._decode_png(
        _png(2, 2, [[(0, 0, 0, 9), (255, 255, 255, 9)],
                    [(255, 0, 0, 9), (0, 255, 0, 9)]], 6)
    )
    assert abs(rgba["mean_luma"] - _WANT_LUMA) < 1e-12


def test_png_all_five_filters_roundtrip():
    """A gradient image stored once per filter type (and once with mixed
    per-row filters) must reconstruct to identical pixels: the unfilter
    pass inverts sub/up/average/paeth exactly."""
    import numpy as np

    w, h = 7, 5
    rows = [
        [((x * 37 + y * 11) % 256, (x * 5 + y * 83) % 256, (x * x + y) % 256)
         for x in range(w)]
        for y in range(h)
    ]
    want = multimodal._decode_png_pixels(_png(w, h, rows, 2))
    for f in (1, 2, 3, 4):
        got = multimodal._decode_png_pixels(_png(w, h, rows, 2, filters=[f] * h))
        assert np.array_equal(got, want), f"filter {f} mismatch"
    mixed = multimodal._decode_png_pixels(
        _png(w, h, rows, 2, filters=[0, 1, 2, 3, 4])
    )
    assert np.array_equal(mixed, want)


def test_png_unsupported_and_corrupt_error_not_stub(spark):
    """Illegal depth/color combinations, structurally incomplete files,
    and truncated payloads surface as decode errors through the kernel —
    a file claiming PNG magic never silently takes the stub."""
    good = _png(2, 2, _PX, 2)
    ihdr_bad = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)  # RGB depth 4
    png_bad = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr_bad) + _png_chunk(b"IEND", b"")
    ihdr_il2 = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)  # interlace 2
    png_il2 = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr_il2) + _png_chunk(b"IEND", b"")
    # palette image with IDAT but no PLTE
    no_plte = _png_full(2, 1, [[(0,), (1,)]], 3, 8)
    rows = [
        (1, good, "image", 9, 9),
        (2, png_bad, "image", 9, 9),
        (3, png_il2, "image", 9, 9),
        (4, no_plte, "image", 9, 9),
        (5, good[:-20], "image", 9, 9),  # IEND (and IDAT crc) clipped
    ]
    out = {
        r["media_id"]: r
        for r in spark.createDataFrame(rows, schema=multimodal.MEDIA)
        .mapInPandas(multimodal._extract_batches, schema=multimodal.FEATURES)
        .collect()
    }
    assert out[1]["error"] is None and (out[1]["width"], out[1]["height"]) == (2, 2)
    assert abs(out[1]["mean_luma"] - _WANT_LUMA) < 1e-12
    assert out[2]["error"] and "depth=4, color_type=2" in out[2]["error"]
    assert out[3]["error"] and "interlace=2" in out[3]["error"]
    assert out[4]["error"] and "PLTE" in out[4]["error"]
    assert out[5]["error"]


def test_png_palette_decode_exact():
    """Palette lookups at depths 8 and 2 reproduce the PLTE colors
    bit-exactly; an out-of-range index errors, never wraps."""
    import numpy as np

    plte = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    px = [[(0,), (1,), (2,)], [(3,), (0,), (2,)]]
    want = np.array([[plte[i[0]] for i in row] for row in px], dtype=np.uint8)
    for depth in (8, 2):
        got = multimodal._decode_png_pixels(
            _png_full(3, 2, px, 3, depth, plte=plte)
        )
        assert np.array_equal(got, want), f"palette depth {depth}"
    try:
        multimodal._decode_png_pixels(
            _png_full(3, 2, px, 3, 8, plte=plte[:3])  # index 3 out of range
        )
        raise AssertionError("out-of-range palette index did not error")
    except IndexError:
        pass


def test_png_gray_bit_depths_exact():
    """Gray at depths 1/2/4 scales by the exact 255/(2^d-1) factor; 16-bit
    reduces to the high byte."""
    import numpy as np

    for depth, vals, want in [
        (1, [0, 1], [0, 255]),
        (2, [0, 1, 2, 3], [0, 85, 170, 255]),
        (4, [0, 5, 15], [0, 85, 255]),
        (16, [0, 0x1234, 0xFFFF], [0, 0x12, 255]),
    ]:
        px = [[(v,) for v in vals]]
        got = multimodal._decode_png_pixels(_png_full(len(vals), 1, px, 0, depth))
        assert np.array_equal(
            got, np.repeat(np.array([want], np.uint8)[:, :, None], 3, axis=2)
        ), f"gray depth {depth}"
    # RGB 16-bit: per-channel high byte
    got = multimodal._decode_png_pixels(
        _png_full(1, 1, [[(0x0102, 0x8001, 0xFFFE)]], 2, 16)
    )
    assert got.tolist() == [[[0x01, 0x80, 0xFF]]]


def test_png_adam7_matches_sequential():
    """The same image encoded Adam7-interlaced and sequential decodes to
    identical pixels across sizes that exercise empty and partial passes,
    color types, depths, and a non-trivial filter."""
    import numpy as np

    for w, h in [(1, 1), (3, 5), (8, 8), (9, 10), (2, 2)]:
        rgb = [
            [((x * 37 + y * 11) % 256, (x * 5 + y * 83) % 256, (x * x + y) % 256)
             for x in range(w)]
            for y in range(h)
        ]
        for ftype in (0, 4):
            a = multimodal._decode_png_pixels(
                _png_full(w, h, rgb, 2, 8, interlace=1, ftype=ftype)
            )
            b = multimodal._decode_png_pixels(
                _png_full(w, h, rgb, 2, 8, interlace=0, ftype=ftype)
            )
            assert np.array_equal(a, b), f"rgb {w}x{h} filter {ftype}"
        g2 = [[((x + y) % 4,) for x in range(w)] for y in range(h)]
        a = multimodal._decode_png_pixels(_png_full(w, h, g2, 0, 2, interlace=1))
        b = multimodal._decode_png_pixels(_png_full(w, h, g2, 0, 2, interlace=0))
        assert np.array_equal(a, b), f"gray2 {w}x{h}"


# ---------------------------------------------------------------------------
# GIF: real LZW decode (variable-width codes, interlace, multi-frame)
# ---------------------------------------------------------------------------


def _gif_lzw_encode(indices, min_code):
    """Real LZW compressor with the GIF decoder's width timing: the
    decoder's table lags the encoder's dictionary by one code, so the
    width bump fires when next_code - 1 (the decoder's table size)
    reaches 1 << width."""
    clear = 1 << min_code
    eoi = clear + 1
    codes = []
    width = min_code + 1
    d = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    codes.append((clear, width))
    cur = b""
    for s in bytes(bytearray(indices)):
        nxt = cur + bytes([s])
        if nxt in d:
            cur = nxt
            continue
        codes.append((d[cur], width))
        if next_code < 4096:
            d[nxt] = next_code
            next_code += 1
            if next_code - 1 >= (1 << width) and width < 12:
                width += 1
        else:
            codes.append((clear, width))
            d = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        cur = bytes([s])
    if cur:
        codes.append((d[cur], width))
    codes.append((eoi, width))
    acc = nbits = 0
    out = bytearray()
    for code, wd in codes:
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_subblocks_enc(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _gif_frame(fx, fy, rows, min_code, interlace=False, lct=None):
    """One image-descriptor block.  ``rows`` — fh rows of fw indices."""
    fh, fw = len(rows), len(rows[0])
    fflags = (0x80 | (len(lct).bit_length() - 2) if lct else 0) | (
        0x40 if interlace else 0
    )
    if interlace:
        order = (
            list(range(0, fh, 8))
            + list(range(4, fh, 8))
            + list(range(2, fh, 4))
            + list(range(1, fh, 2))
        )
        rows = [rows[y] for y in order]
    flat = [v for r in rows for v in r]
    out = struct.pack("<BHHHHB", 0x2C, fx, fy, fw, fh, fflags)
    if lct:
        out += bytes(v for rgb in lct for v in rgb)
    return (
        out
        + bytes([min_code])
        + _gif_subblocks_enc(_gif_lzw_encode(flat, min_code))
    )


def _gif(w, h, frame_blocks, gct=None, bg=0, magic=b"GIF89a", exts=b""):
    flags = 0x80 | (len(gct).bit_length() - 2) if gct else 0
    out = magic + struct.pack("<HHBBB", w, h, flags, bg, 0)
    if gct:
        out += bytes(v for rgb in gct for v in rgb)
    return out + exts + b"".join(frame_blocks) + b"\x3b"


_GIF_PAL4 = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0)]


def test_gif_single_frame_exact_luma():
    """A 2x2 GIF with the standard quadrant colors must yield the same
    exact mean luma as the PNG/BMP/PPM tiers."""
    rows = [[0, 1], [2, 3]]
    gif = _gif(2, 2, [_gif_frame(0, 0, rows, 2)], gct=_GIF_PAL4)
    got = multimodal._decode_gif(gif)
    assert (got["width"], got["height"], got["n_frames"]) == (2, 2, 1)
    assert abs(got["mean_luma"] - _WANT_LUMA) < 1e-12


def test_gif_lzw_dictionary_growth_exact():
    """A 64x48 frame with a repetitive-then-varying index pattern forces
    real dictionary growth and width bumps; the decoded raster's exact
    integer luma sum must match numpy's direct computation."""
    import numpy as np

    w, h = 64, 48
    rows = [[(x * y + x // 3 + (y % 7)) % 4 for x in range(w)] for y in range(h)]
    gif = _gif(w, h, [_gif_frame(0, 0, rows, 2)], gct=_GIF_PAL4)
    got = multimodal._decode_gif(gif)
    pal = np.array(_GIF_PAL4, dtype=np.float64)
    want = (pal[np.array(rows)] @ np.array([0.299, 0.587, 0.114])).mean() / 255.0
    assert abs(got["mean_luma"] - want) < 1e-12
    assert got["n_frames"] == 1


def test_gif_interlaced_matches_sequential():
    import numpy as np

    w, h = 9, 13
    rows = [[(x * 3 + y * 5) % 4 for x in range(w)] for y in range(h)]
    seq = multimodal._decode_gif_pixels(
        _gif(w, h, [_gif_frame(0, 0, rows, 2)], gct=_GIF_PAL4)
    )
    il = multimodal._decode_gif_pixels(
        _gif(w, h, [_gif_frame(0, 0, rows, 2, interlace=True)], gct=_GIF_PAL4)
    )
    assert np.array_equal(seq, il)


def test_gif_multiframe_and_partial_first_frame():
    """n_frames counts every image descriptor (all LZW-validated); a
    partial first frame composites on the background color; a local color
    table overrides the global one."""
    import numpy as np

    # frame 1 covers the right 1x2 column of a 2x2 screen; bg = white
    f1 = _gif_frame(1, 0, [[2], [3]], 2)
    # frame 2 full-screen with a LOCAL table (still validated)
    f2 = _gif_frame(0, 0, [[0, 1], [1, 0]], 2, lct=_GIF_PAL4)
    # GIF89a graphic-control extension before each frame (skipped cleanly)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    gif = _gif(2, 2, [gce + f1, gce + f2], gct=_GIF_PAL4, bg=1)
    got = multimodal._decode_gif(gif)
    assert got["n_frames"] == 2
    px = multimodal._decode_gif_pixels(gif)
    want = np.array(
        [[(255, 255, 255), (255, 0, 0)], [(255, 255, 255), (0, 255, 0)]],
        dtype=np.uint8,
    )
    assert np.array_equal(px, want)


def test_gif_errors_not_stub(spark):
    """Truncated streams, out-of-table codes, and missing color tables
    surface as decode errors through the kernel, never the stub; a good
    animated GIF reports its true n_frames."""
    rows = [[0, 1], [2, 3]]
    good = _gif(2, 2, [_gif_frame(0, 0, rows, 2)] * 3, gct=_GIF_PAL4)
    no_ct = _gif(2, 2, [_gif_frame(0, 0, rows, 2)], gct=None)
    trunc = good[:-8]
    # valid container, LZW stream cut inside the codes
    bad_lzw = _gif(
        2, 2,
        [struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0) + b"\x02"
         + _gif_subblocks_enc(b"\x04")],
        gct=_GIF_PAL4,
    )
    out = {
        r["media_id"]: r
        for r in spark.createDataFrame(
            [
                (1, good, "image", 9, 9),
                (2, no_ct, "image", 9, 9),
                (3, trunc, "image", 9, 9),
                (4, bad_lzw, "image", 9, 9),
            ],
            schema=multimodal.MEDIA,
        )
        .mapInPandas(multimodal._extract_batches, schema=multimodal.FEATURES)
        .collect()
    }
    assert out[1]["error"] is None and out[1]["n_frames"] == 3
    assert abs(out[1]["mean_luma"] - _WANT_LUMA) < 1e-12
    assert out[2]["error"] and "color table" in out[2]["error"]
    assert out[3]["error"]
    assert out[4]["error"] and "LZW" in out[4]["error"]


def test_gif_resize_nearest_neighbor():
    """media_resize's grid path consumes the GIF decode exactly like the
    other raster tiers."""
    rows = [[0, 1], [2, 3]]
    gif = _gif(2, 2, [_gif_frame(0, 0, rows, 2)], gct=_GIF_PAL4)
    grid = multimodal._resize_grid(gif, "image", 99, 99)
    q = [[0, 255], [76, 149]]
    want = [q[(ty * 2) // 8][(tx * 2) // 8] for ty in range(8) for tx in range(8)]
    assert grid == want


# ---------------------------------------------------------------------------
# TIFF: IFD walk, strip assembly, none/PackBits/LZW, gray/RGB/palette
# ---------------------------------------------------------------------------


def _tiff_packbits_encode(data):
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and run < 127 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (
                j < len(data)
                and j - i < 127
                and not (j + 1 < len(data) and data[j] == data[j + 1])
            ):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


def _tiff_lzw_encode(data):
    """TIFF-variant LZW: MSB-first packing, EARLY width change (bump when
    the decoder's table size next_code-1 reaches (1<<width) - 1)."""
    clear, eoi = 256, 257
    codes = []
    width = 9
    d = {bytes([i]): i for i in range(256)}
    next_code = 258
    codes.append((clear, width))
    cur = b""
    for s in data:
        nxt = cur + bytes([s])
        if nxt in d:
            cur = nxt
            continue
        codes.append((d[cur], width))
        if next_code < 4094:
            d[nxt] = next_code
            next_code += 1
            if next_code - 1 >= (1 << width) - 1 and width < 12:
                width += 1
        else:
            codes.append((clear, width))
            d = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([s])
    if cur:
        codes.append((d[cur], width))
    codes.append((eoi, width))
    acc = nbits = 0
    out = bytearray()
    for code, wd in codes:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff(w, h, strips, extra_tags=(), le=True, photometric=2, spp=3,
          rows_per_strip=None, compression=1, n_pages=1):
    """Minimal TIFF writer: header + one IFD (+ optional empty chained
    page IFDs for the multi-page count) + strip data.  ``strips`` — list
    of already-compressed per-strip byte strings."""
    end = "<" if le else ">"

    def pk(fmt, *v):
        return struct.pack(end + fmt, *v)

    tags = {
        256: (3, [w]),
        257: (3, [h]),
        258: (3, [8] * spp),
        259: (3, [compression]),
        262: (3, [photometric]),
        277: (3, [spp]),
        278: (3, [rows_per_strip if rows_per_strip else h]),
    }
    for t, tv in extra_tags:
        tags[t] = tv
    # layout: header(8) IFD... then out-of-line values, then strips
    n_entries = len(tags) + 2  # + StripOffsets + StripByteCounts
    ifd0 = 8
    ifd0_end = ifd0 + 2 + 12 * n_entries + 4
    # chained empty IFDs for page counting
    extra_ifds = b""
    extra_off = ifd0_end
    next_ptrs = []
    for p in range(n_pages - 1):
        next_ptrs.append(extra_off)
        extra_ifds += pk("H", 1) + pk("HHI", 256, 3, 1) + pk("I", w) + b"\x00" * 4
        extra_off += 2 + 12 + 4
    # fix chain pointers
    blobs = b""
    blob_off = extra_off

    def val_bytes(typ, vals):
        nonlocal blobs, blob_off
        fmt = {3: "H", 4: "I", 1: "B"}[typ]
        raw = b"".join(pk(fmt, v) for v in vals)
        if len(raw) <= 4:
            return raw + b"\x00" * (4 - len(raw)), len(vals)
        off = blob_off
        blobs += raw
        blob_off += len(raw)
        return pk("I", off), len(vals)

    # strip locations come after the value blobs — compute after first pass
    entries = []
    for tag in sorted(tags):
        typ, vals = tags[tag]
        vb, cnt = val_bytes(typ, vals)
        entries.append(pk("HHI", tag, typ, cnt) + vb)
    strip_offs = []
    offs_inline = len(strips) == 1
    if not offs_inline:
        arr_off_273 = blob_off
        blob_off += 4 * len(strips)
        arr_off_279 = blob_off
        blob_off += 4 * len(strips)
    data_off = blob_off
    cur = data_off
    for s in strips:
        strip_offs.append(cur)
        cur += len(s)
    if offs_inline:
        e273 = pk("HHI", 273, 4, 1) + pk("I", strip_offs[0])
        e279 = pk("HHI", 279, 4, 1) + pk("I", len(strips[0]))
    else:
        e273 = pk("HHI", 273, 4, len(strips)) + pk("I", arr_off_273)
        e279 = pk("HHI", 279, 4, len(strips)) + pk("I", arr_off_279)
        blobs += b"".join(pk("I", o) for o in strip_offs)
        blobs += b"".join(pk("I", len(s)) for s in strips)
    entries.append(e273)
    entries.append(e279)
    entries.sort(key=lambda e: struct.unpack(end + "H", e[:2])[0])
    nxt_ifd = next_ptrs[0] if next_ptrs else 0
    ifd = pk("H", len(entries)) + b"".join(entries) + pk("I", nxt_ifd)
    # fix extra IFD chain: each points to the following, last to 0
    chain = b""
    for p in range(n_pages - 1):
        nxt = next_ptrs[p + 1] if p + 1 < len(next_ptrs) else 0
        chain += pk("H", 1) + pk("HHI", 256, 3, 1) + pk("I", w) + pk("I", nxt)
    header = (b"II*\x00" if le else b"MM\x00*") + pk("I", ifd0)
    return header + ifd + chain + blobs + b"".join(strips)


def test_tiff_rgb_uncompressed_exact_both_endians():
    raw = bytes([0, 0, 0, 255, 255, 255, 255, 0, 0, 0, 255, 0])
    for le in (True, False):
        t = _tiff(2, 2, [raw], le=le)
        got = multimodal._decode_tiff(t)
        assert (got["width"], got["height"], got["n_frames"]) == (2, 2, 1)
        assert abs(got["mean_luma"] - _WANT_LUMA) < 1e-12, f"le={le}"


def test_tiff_gray_both_zero_conventions_and_strips():
    """Photometric 1 is identity, photometric 0 inverts; multi-strip
    assembly concatenates in row order."""
    rows = bytes([10, 20]) , bytes([30, 40])
    t1 = _tiff(2, 2, list(rows), photometric=1, spp=1, rows_per_strip=1)
    got1 = multimodal._decode_tiff(t1)
    assert abs(got1["mean_luma"] - (10 + 20 + 30 + 40) / 4 / 255.0) < 1e-12
    t0 = _tiff(2, 2, list(rows), photometric=0, spp=1, rows_per_strip=1)
    got0 = multimodal._decode_tiff(t0)
    want = (255 - 10 + 255 - 20 + 255 - 30 + 255 - 40) / 4 / 255.0
    assert abs(got0["mean_luma"] - want) < 1e-12


def test_tiff_packbits_and_lzw_match_uncompressed():
    import numpy as np

    w, h = 31, 17
    raw = bytes(
        (x * y + 7 * (x // 5) + (y % 3)) % 251 for y in range(h) for x in range(w)
    )
    plain = multimodal._decode_tiff_pixels(
        _tiff(w, h, [raw], photometric=1, spp=1)
    )[0]
    pb = multimodal._decode_tiff_pixels(
        _tiff(w, h, [_tiff_packbits_encode(raw)], photometric=1, spp=1,
              compression=32773)
    )[0]
    lzw = multimodal._decode_tiff_pixels(
        _tiff(w, h, [_tiff_lzw_encode(raw)], photometric=1, spp=1,
              compression=5)
    )[0]
    assert np.array_equal(plain, pb)
    assert np.array_equal(plain, lzw)
    # a long constant run exercises PackBits repeats and LZW growth
    flat = bytes([7] * 300 + list(range(200)) + [9] * 100)
    w2, h2 = 60, 10
    a = multimodal._decode_tiff_pixels(
        _tiff(w2, h2, [flat], photometric=1, spp=1)
    )[0]
    b = multimodal._decode_tiff_pixels(
        _tiff(w2, h2, [_tiff_lzw_encode(flat)], photometric=1, spp=1,
              compression=5)
    )[0]
    assert np.array_equal(a, b)


def test_tiff_palette_and_multipage():
    import numpy as np

    # ColorMap: 16-bit, all R then all G then all B; entry k = k*257 ramp
    cmap = [0] * 768
    cmap[0], cmap[256], cmap[512] = 0xFF00, 0x1200, 0x3400  # idx 0 -> (255,18,52)
    cmap[1], cmap[257], cmap[513] = 0, 0xFF00, 0  # idx 1 -> (0,255,0)
    t = _tiff(
        2, 1, [bytes([0, 1])], photometric=3, spp=1,
        extra_tags=[(320, (3, cmap))], n_pages=3,
    )
    px, n_frames = multimodal._decode_tiff_pixels(t)
    assert n_frames == 3
    assert np.array_equal(
        px, np.array([[(255, 18, 52), (0, 255, 0)]], dtype=np.uint8)
    )


def test_tiff_errors_not_stub(spark):
    raw = bytes([0, 0, 0, 255, 255, 255, 255, 0, 0, 0, 255, 0])
    good = _tiff(2, 2, [raw])
    trunc = good[:-4]
    badcomp = _tiff(2, 2, [raw], compression=7)  # JPEG-in-TIFF: codec-bound
    short_strip = _tiff(2, 2, [raw[:-3]])
    out = {
        r["media_id"]: r
        for r in spark.createDataFrame(
            [
                (1, good, "image", 9, 9),
                (2, trunc, "image", 9, 9),
                (3, badcomp, "image", 9, 9),
                (4, short_strip, "image", 9, 9),
            ],
            schema=multimodal.MEDIA,
        )
        .mapInPandas(multimodal._extract_batches, schema=multimodal.FEATURES)
        .collect()
    }
    assert out[1]["error"] is None and (out[1]["width"], out[1]["height"]) == (2, 2)
    assert out[2]["error"]
    assert out[3]["error"] and "compression=7" in out[3]["error"]
    assert out[4]["error"]


def test_tiff_resize_nearest_neighbor():
    raw = bytes([0, 0, 0, 255, 255, 255, 255, 0, 0, 0, 255, 0])
    grid = multimodal._resize_grid(_tiff(2, 2, [raw]), "image", 99, 99)
    q = [[0, 255], [76, 149]]
    want = [q[(ty * 2) // 8][(tx * 2) // 8] for ty in range(8) for tx in range(8)]
    assert grid == want


def test_codec_grid_parity_builds_real_containers(spark, sf_dir):
    """Every codec_grid_parity payload is a genuinely decodable container
    for its claimed format: re-build one payload per format from the same
    rules and push it through the REAL per-format decoder directly, then
    check the query's grid for that media_id matches the decoder's own
    resize output (i.e., the rows went through the real codec path, not
    the stub)."""
    import numpy as np

    df = (
        multimodal.codec_grid_parity(spark, sf_dir)
        .toPandas()
        .set_index("media_id")
    )
    assert df["error"].isna().all()
    assert set(df["fmt"]) == {
        "ppm", "bmp", "tiff", "gif", "png", "jpeg", "jpeg_prog",
    }
    hx = multimodal._codec_const_hex()

    def rgb_bytes(d):
        out = bytearray()
        for p in range(16):
            out += bytes(
                [(d * 31 + p * 7) % 256, (d * 17 + p * 11) % 256, (d * 13 + p * 5) % 256]
            )
        return bytes(out)

    for d, fmt in [(0, "ppm"), (1, "bmp"), (2, "tiff"), (3, "gif"), (4, "png"),
                   (5, "jpeg"), (6, "jpeg_prog")]:
        if fmt == "bmp":
            # bottom-up rows, BGR channel order
            px = rgb_bytes(d)
            rows = [px[r * 12 : r * 12 + 12] for r in range(4)]
            flipped = bytearray()
            for row in reversed(rows):
                for x in range(4):
                    r_, g_, b_ = row[x * 3 : x * 3 + 3]
                    flipped += bytes([b_, g_, r_])
            payload = bytes.fromhex(hx["bmp"][0]) + bytes(flipped)
        elif fmt == "gif":
            body = bytearray()
            for p in range(16):
                body += bytes([0x80, (d * 7 + p * 3) % 128])
            body.append(0x81)
            payload = bytes.fromhex(hx["gif"][0]) + bytes(body) + bytes.fromhex(hx["gif"][1])
        elif fmt == "png":
            import zlib

            px = rgb_bytes(d)
            raw = b"".join(b"\x00" + px[r * 12 : r * 12 + 12] for r in range(4))
            adler = struct.pack(">I", zlib.adler32(raw))
            payload = bytes.fromhex(hx["png"][0]) + raw + adler + bytes.fromhex(hx["png"][1])
        elif fmt == "jpeg":
            # two-MCU DC-only entropy bytes from the query's integer rules
            entropy = bytes([
                56 + 2 * ((d * 7) % 4),
                0x05,
                ((d * 11) % 2) * 128 + 7,
            ])
            payload = (
                bytes.fromhex(hx["jpeg"][0]) + entropy + bytes.fromhex(hx["jpeg"][1])
            )
        elif fmt == "jpeg_prog":
            # progressive DC scan: no EOBs — 13 bits + 1-padding in 2 bytes
            entropy = bytes([
                56 + 2 * ((d * 7) % 4),
                87 + 8 * ((d * 11) % 2),
            ])
            payload = (
                bytes.fromhex(hx["jpeg_prog"][0]) + entropy
                + bytes.fromhex(hx["jpeg_prog"][1])
            )
        else:
            payload = bytes.fromhex(hx[fmt][0]) + rgb_bytes(d)
        grid = multimodal._resize_grid(payload, "image", 4, 4)
        assert ",".join(str(v) for v in grid) == df.loc[d, "luma_csv"], fmt
        # the digest stub of the same payload would give a different grid
        import hashlib

        stub = [hashlib.sha256(payload).digest()[i % 32] for i in range(64)]
        assert grid != stub, f"{fmt} fell through to the stub"


def test_png_resize_nearest_neighbor():
    """media_resize's grid path consumes the PNG decode: quadrant lumas
    tile the 8x8 grid exactly as the PPM/BMP tier does."""
    grid = multimodal._resize_grid(_png(2, 2, _PX, 2), "image", 99, 99)
    q = [[0, 255], [76, 149]]
    want = [q[(ty * 2) // 8][(tx * 2) // 8] for ty in range(8) for tx in range(8)]
    assert grid == want


def test_png_decompression_bomb_rejected_before_inflate():
    """A payload declaring enormous dimensions is rejected from the IHDR
    alone (no inflate, no allocation), and a small-dims payload whose
    deflate stream inflates past the declared size is rejected by the
    bounded decompressor — never materialized."""
    import zlib

    ihdr_huge = struct.pack(">IIBBBBB", 20000, 20000, 8, 2, 0, 0, 0)
    bomb1 = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr_huge)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 1000))
        + _png_chunk(b"IEND", b"")
    )
    try:
        multimodal._decode_png(bomb1)
        raise AssertionError("huge-dims PNG not rejected")
    except ValueError as e:
        assert "too large" in str(e)

    # declares 2x2 RGB (expected 26 raw bytes) but inflates to ~1 MB
    ihdr_small = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb2 = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr_small)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20)))
        + _png_chunk(b"IEND", b"")
    )
    try:
        multimodal._decode_png(bomb2)
        raise AssertionError("overlong inflate not rejected")
    except ValueError as e:
        assert "size" in str(e)


# ---------------------------------------------------------------------------
# WAV (RIFF/PCM) audio tier


def _wav(samples_by_channel, rate=16000, bits=16, extra_chunk=None, fmt_code=1):
    """Build a WAV payload: interleaved PCM frames, optional extra chunk
    BEFORE data (chunk-walk coverage), word-aligned odd chunks."""
    n_ch = len(samples_by_channel)
    n_frames = len(samples_by_channel[0])
    frames = b""
    for i in range(n_frames):
        for ch in samples_by_channel:
            if bits == 16:
                frames += struct.pack("<h", ch[i])
            else:
                frames += struct.pack("<B", ch[i])
    fmt = struct.pack(
        "<HHIIHH",
        fmt_code,
        n_ch,
        rate,
        rate * n_ch * bits // 8,
        n_ch * bits // 8,
        bits,
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk is not None:
        cid, payload = extra_chunk
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    body += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_16bit_stereo_exact_stats():
    """16-bit stereo PCM: frames, peak, Σ sample² computed independently
    here must match the decoder exactly (integer domain, no float)."""
    left = [0, 100, -32768, 32767, -5]
    right = [1, -2, 3, -4, 5]
    payload = _wav([left, right], rate=44100)
    got = multimodal._decode_wav(payload)
    allsamp = left + right
    assert got == {
        "sample_rate": 44100,
        "n_channels": 2,
        "n_samples": 5,
        "peak_abs": 32768,
        "sumsq": sum(s * s for s in allsamp),
        "duration_ms": 5 * 1000 // 44100,
    }


def test_wav_8bit_mono_centered_and_scaled():
    """8-bit unsigned samples center at 128 and scale ×256 into the 16-bit
    domain, so stats are comparable across bit depths."""
    raw = [128, 0, 255, 200]
    payload = _wav([raw], rate=8000, bits=8)
    got = multimodal._decode_wav(payload)
    scaled = [(s - 128) * 256 for s in raw]
    assert got["n_channels"] == 1
    assert got["n_samples"] == 4
    assert got["peak_abs"] == max(abs(s) for s in scaled)
    assert got["sumsq"] == sum(s * s for s in scaled)
    assert got["duration_ms"] == 0  # 4 frames at 8 kHz is sub-millisecond


def test_wav_extra_chunks_and_odd_padding_skipped():
    """A LIST chunk with an odd size sits between fmt and data; the chunk
    walk must skip it (with its pad byte) and still find data."""
    payload = _wav([[7, -7, 7]], extra_chunk=(b"LIST", b"INFOx"))
    got = multimodal._decode_wav(payload)
    assert got["n_samples"] == 3
    assert got["sumsq"] == 3 * 49


def test_wav_error_contract():
    """Truncated data, non-PCM codec, and unsupported bit depth raise
    ValueError (never stub-downgrade, never a raw IndexError)."""
    import pytest

    ok = _wav([[1, 2, 3]])
    with pytest.raises(ValueError, match="truncated"):
        multimodal._decode_wav(ok[:-2])
    with pytest.raises(ValueError, match="codec"):
        multimodal._decode_wav(_wav([[1, 2]], fmt_code=3))
    # 24-bit: build manually since _wav only packs 8/16
    f = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(f) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(f)) + f
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="bit depth"):
        multimodal._decode_wav(bad)
    with pytest.raises(ValueError, match="RIFF"):
        multimodal._decode_wav(b"not audio at all")


def test_wav_through_audio_kernel_and_media_features(spark):
    """A real WAV payload flows through BOTH Arrow kernels: audio_features
    reports its exact integer stats, media_features reports its true frame
    count; a prose payload next to it falls to the digest stub; a lying
    WAV surfaces as a decode error row."""
    import hashlib

    wav = _wav([[1000, -1000, 500]], rate=22050)
    prose = b"just some text bytes"
    rows = [
        (1, bytearray(wav), "audio", 16, 16),
        (2, bytearray(prose), "audio", 16, 16),
        (3, bytearray(wav[:-3]), "audio", 16, 16),
    ]
    src = spark.createDataFrame(rows, schema=multimodal.MEDIA)
    out = {
        r["media_id"]: r.asDict()
        for r in multimodal.audio_features(spark, "", table=src).collect()
    }
    assert out[1]["sample_rate"] == 22050
    assert out[1]["n_samples"] == 3
    assert out[1]["sumsq"] == 2 * 1000000 + 250000
    assert out[1]["error"] is None
    d = hashlib.sha256(prose).digest()
    assert out[2]["sample_rate"] == (8000, 16000, 22050, 44100)[d[0] % 4]
    assert out[2]["n_samples"] == int.from_bytes(d[2:4], "big") + 1
    assert out[3]["error"] is not None and "truncated" in out[3]["error"]

    feats = {
        r["media_id"]: r.asDict()
        for r in multimodal.media_features(spark, "", table=src).collect()
    }
    assert feats[1]["n_frames"] == 3  # REAL frame count, not the stub's
    assert feats[1]["width"] is None and feats[1]["mean_luma"] is None
    assert feats[3]["error"] is not None


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) video tier


def _y4m(frames, chroma="420", fps=(30, 1), frame_params=False, header_extra=""):
    """Build a Y4M payload from per-frame (y_plane, w, h) numpy arrays.
    Chroma planes are filled with a constant 128 — the decoder's stats are
    luma-only, and the constant makes any accidental chroma/luma mixup
    change the expected numbers."""
    import numpy as np

    h, w = frames[0].shape
    cs = {"420": "420jpeg", "422": "422", "444": "444", "mono": "mono"}[chroma]
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cs}{header_extra}\n"
    payload = head.encode("ascii")
    div = {"420": (2, 2), "422": (2, 1), "444": (1, 1), "mono": None}[chroma]
    for k, y in enumerate(frames):
        marker = b"FRAME Xnote\n" if frame_params else b"FRAME\n"
        payload += marker + y.astype(np.uint8).tobytes()
        if div is not None:
            cw, ch = -(-w // div[0]), -(-h // div[1])
            payload += b"\x80" * (2 * cw * ch)
    return payload


def test_y4m_exact_luma_stats_all_chroma_layouts():
    """Every chroma layout (420/422/444/mono) decodes with identical luma
    stats — the chroma planes change only the frame STRIDE, never the
    arithmetic.  Expected values computed independently here."""
    import numpy as np

    rng = np.random.RandomState(7)
    f0 = rng.randint(0, 256, (6, 8)).astype(np.uint8)
    f1 = rng.randint(0, 256, (6, 8)).astype(np.uint8)
    want_sum = int(f0.astype(int).sum() + f1.astype(int).sum())
    want_peak = int(max(f0.max(), f1.max()))
    for chroma in ("420", "422", "444", "mono"):
        got = multimodal._decode_y4m(_y4m([f0, f1], chroma=chroma))
        assert got == {
            "width": 8,
            "height": 6,
            "fps_num": 30,
            "fps_den": 1,
            "n_frames": 2,
            "duration_ms": 2 * 1000 * 1 // 30,
            "y_sum": want_sum,
            "y_peak": want_peak,
        }, chroma


def test_y4m_frame_params_fractional_fps_odd_dims():
    """FRAME headers may carry parameters; 444/mono allow odd dimensions;
    a fractional (NTSC) frame rate flows into duration exactly."""
    import numpy as np

    y = np.full((5, 7), 9, dtype=np.uint8)
    got = multimodal._decode_y4m(
        _y4m([y] * 3, chroma="mono", fps=(30000, 1001), frame_params=True)
    )
    assert got["n_frames"] == 3
    assert got["y_sum"] == 3 * 5 * 7 * 9
    assert got["duration_ms"] == 3 * 1000 * 1001 // 30000
    # unknown header tags (X...) are skipped without affecting geometry
    got2 = multimodal._decode_y4m(
        _y4m([y], chroma="444", header_extra=" Xcolorrange=FULL")
    )
    assert got2["width"] == 7 and got2["height"] == 5


def test_y4m_error_contract():
    """Truncated frame data, a missing FRAME marker, zero frames, bad
    header fields, and unsupported colorspaces raise ValueError — a payload
    that claims Y4M never downgrades to the stub."""
    import numpy as np
    import pytest

    y = np.zeros((4, 4), dtype=np.uint8)
    ok = _y4m([y])
    with pytest.raises(ValueError, match="truncated"):
        multimodal._decode_y4m(ok[:-5])
    with pytest.raises(ValueError, match="FRAME"):
        # corrupt the frame marker in place
        multimodal._decode_y4m(ok.replace(b"FRAME\n", b"FRAMX\n"))
    with pytest.raises(ValueError, match="no frames"):
        multimodal._decode_y4m(ok[: ok.index(b"\n") + 1])
    with pytest.raises(ValueError, match="dimensions"):
        multimodal._decode_y4m(b"YUV4MPEG2 W0 H4 F25:1\n")
    with pytest.raises(ValueError, match="colorspace"):
        multimodal._decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C411\n")
    with pytest.raises(ValueError, match="frame rate"):
        multimodal._decode_y4m(b"YUV4MPEG2 W4 H4 F0:1\n")
    with pytest.raises(ValueError, match="malformed"):
        multimodal._decode_y4m(b"YUV4MPEG2 Wx H4 F25:1\n")
    with pytest.raises(ValueError, match="px cap"):
        multimodal._decode_y4m(b"YUV4MPEG2 W99999 H99999 F25:1\n")
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        multimodal._decode_y4m(b"not video at all")


def test_y4m_thumbnail_is_first_frame_luma():
    """media_resize's grid for a Y4M payload samples the FIRST frame's Y
    plane with the same nearest-neighbor mapping as the raster tier —
    expected grid computed independently."""
    import numpy as np

    h, w = 16, 24
    f0 = (np.arange(h * w, dtype=np.int64) % 251).reshape(h, w).astype(np.uint8)
    f1 = np.full((h, w), 255, dtype=np.uint8)  # must NOT enter the thumbnail
    grid = multimodal._resize_grid(_y4m([f0, f1]), "video", w, h)
    T = multimodal.THUMB
    want = [
        int(f0[(ty * h) // T, (tx * w) // T]) for ty in range(T) for tx in range(T)
    ]
    assert grid == want


def test_y4m_through_video_kernel_and_media_features(spark):
    """A real Y4M payload flows through BOTH Arrow kernels: video_features
    reports exact luma stats, media_features/frame_sample see the TRUE
    frame count; a prose payload falls to the digest stub; a lying Y4M
    surfaces as a decode error row."""
    import hashlib

    import numpy as np

    y = np.full((4, 6), 10, dtype=np.uint8)
    vid = _y4m([y] * 5, fps=(25, 1))
    prose = b"just some text bytes"
    rows = [
        (1, bytearray(vid), "video", 16, 16),
        (2, bytearray(prose), "video", 16, 16),
        (3, bytearray(vid[:-4]), "video", 16, 16),
    ]
    src = spark.createDataFrame(rows, schema=multimodal.MEDIA)
    out = {
        r["media_id"]: r.asDict()
        for r in multimodal.video_features(spark, "", table=src).collect()
    }
    assert out[1]["width"] == 6 and out[1]["height"] == 4
    assert out[1]["n_frames"] == 5
    assert out[1]["y_sum"] == 5 * 4 * 6 * 10
    assert out[1]["y_peak"] == 10
    assert out[1]["duration_ms"] == 5 * 1000 // 25
    assert out[1]["error"] is None
    d = hashlib.sha256(prose).digest()
    assert out[2]["width"] == d[0] * 4 + 16
    assert out[2]["n_frames"] == d[3] * 256 + d[4] + 1
    assert out[2]["y_peak"] == d[9]
    assert out[3]["error"] is not None and "truncated" in out[3]["error"]

    feats = {
        r["media_id"]: r.asDict()
        for r in multimodal.media_features(spark, "", table=src).collect()
    }
    assert feats[1]["n_frames"] == 5  # REAL frame count, not the stub's
    assert feats[1]["width"] == 6
    assert feats[1]["mean_luma"] == 10 / 255.0
    assert feats[3]["error"] is not None
