"""Test-side baseline JPEG ENCODER (scaffolding for the decoder tests).

Produces spec-conformant baseline-sequential JFIF streams (SOF0, 8-bit,
interleaved single scan, optional 4:2:0 subsampling, optional restart
intervals) and, alongside the bytes, the EXPECTED decoded RGB array computed
through an independent dequantize → IDCT → upsample → color-convert path —
so the decoder's Huffman/bitstream/zigzag/marker plumbing is checked against
values that never flow through the decoder itself.

The Huffman tables written to DHT are GENERATED uniform-length canonical
tables (12 DC categories at 4 bits, 162 AC symbols at 8 bits — both avoid
the forbidden all-ones code), not the Annex K defaults: a decoder that
ships built-in tables instead of reading DHT would fail these fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

# the published T.81 zigzag constant, as a literal (independent of the
# engine's derived order; test_jpeg pins the two against each other)
ZIGZAG = [
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# a mild quant table (flat 8s for luma, 12s for chroma) — small steps keep
# the fixtures visually meaningful; the decoder reads whatever DQT carries
QT_LUMA = np.full((8, 8), 8, dtype=np.int32)
QT_CHROMA = np.full((8, 8), 12, dtype=np.int32)

_C = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# uniform-length canonical tables: symbol lists in canonical order
DC_SYMS = list(range(12))  # categories 0..11, all 4-bit codes
AC_SYMS = [0x00] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
] + [0xF0]
AC_SYMS = sorted(set(AC_SYMS))  # 162 symbols, all 8-bit codes


def _uniform_table(syms: list[int], length: int) -> tuple[list[int], list[int], dict]:
    """bits[16], huffval, symbol -> (code, length) for a uniform-length
    canonical Huffman table."""
    assert len(syms) < (1 << length)  # strict: keeps the all-ones code free
    bits = [0] * 16
    bits[length - 1] = len(syms)
    enc = {s: (i, length) for i, s in enumerate(syms)}
    return bits, syms, enc


DC_BITS, DC_VALS, DC_ENC = _uniform_table(DC_SYMS, 4)
AC_BITS, AC_VALS, AC_ENC = _uniform_table(AC_SYMS, 8)

# progressive AC table: adds the EOBn symbols (r<<4 | 0 for r < 15) the
# sequential alphabet has no use for
ACP_SYMS = sorted({(r << 4) | s for r in range(16) for s in range(11)})
ACP_BITS, ACP_VALS, ACP_ENC = _uniform_table(ACP_SYMS, 8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad_to_byte(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-bit padding


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int) -> int:
    """Huffman-encode one zigzagged quantized block; returns the new DC
    predictor."""
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, length = DC_ENC[t]
    w.write(code, length)
    if t:
        w.write(_amplitude(diff, t), t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = AC_ENC[0xF0]
            w.write(c, ln)
            run -= 16
        size = _category(v)
        c, ln = AC_ENC[(run << 4) | size]
        w.write(c, ln)
        w.write(_amplitude(v, size), size)
        run = 0
    if run:
        c, ln = AC_ENC[0x00]
        w.write(c, ln)
    return int(zz[0])


def _pad_edge(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    return np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize every 8x8 block; returns (bh, bw, 8, 8) int array."""
    h, w = plane.shape
    out = np.zeros((h // 8, w // 8, 8, 8), dtype=np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            b = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64)
            s = _C @ (b - 128.0) @ _C.T
            out[by, bx] = np.round(s / q).astype(np.int64)
    return out


def _plane_reconstruct(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Independent expected-value path: dequantize + IDCT + level shift."""
    bh, bw = blocks.shape[:2]
    plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    for by in range(bh):
        for bx in range(bw):
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _C.T @ (blocks[by, bx].astype(np.float64) * q) @ _C
            )
    return np.clip(np.round(plane + 128.0), 0, 255)


def _trunc(v: int, al: int) -> int:
    """The AC point transform: division by 2^Al truncating toward zero
    (T.81 G.1.1.1.2 — NOT an arithmetic shift)."""
    return v // (1 << al) if v >= 0 else -((-v) // (1 << al))


class _ProgWriter(_BitWriter):
    """Bit writer + the progressive AC bookkeeping: EOB-run accumulation
    with the covered blocks' buffered correction bits."""

    def __init__(self):
        super().__init__()
        self.eobrun = 0
        self.pending = []

    def sym(self, s):
        code, length = ACP_ENC[s]
        self.write(code, length)

    def flush_eob(self):
        if not self.eobrun:
            return
        r = self.eobrun.bit_length() - 1
        self.sym(r << 4)
        if r:
            self.write(self.eobrun - (1 << r), r)
        for b in self.pending:
            self.write(b, 1)
        self.eobrun = 0
        self.pending = []


def _prog_dc_scan(comps, mcus_x, mcus_y, ah, al):
    """Interleaved DC scan: first pass (ah=0) codes diffs of dc >> al;
    refinement (ah>0) emits the al-th bit of each block's dc."""
    w_ = _BitWriter()
    pred = [0] * len(comps)
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    dc = int(c["zz"][my * c["v"] + by, mx * c["h"] + bx, 0])
                    if ah == 0:
                        v = dc >> al  # DC point transform IS the shift
                        diff = v - pred[ci]
                        pred[ci] = v
                        t = _category(diff)
                        code, length = DC_ENC[t]
                        w_.write(code, length)
                        if t:
                            w_.write(_amplitude(diff, t), t)
                    else:
                        w_.write((dc >> al) & 1, 1)
    w_.pad_to_byte()
    return bytes(w_.out)


def _prog_ac_first(zz, cbh, cbw, ss, se, al):
    w_ = _ProgWriter()
    for unit in range(cbh * cbw):
        uy, ux = divmod(unit, cbw)
        band = [_trunc(int(zz[uy, ux, k]), al) for k in range(ss, se + 1)]
        if not any(band):
            w_.eobrun += 1
            if w_.eobrun == 0x7FFF:
                w_.flush_eob()
            continue
        w_.flush_eob()
        last_nz = max(j for j, v in enumerate(band) if v)
        run = 0
        for v in band[: last_nz + 1]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                w_.sym(0xF0)
                run -= 16
            size = _category(v)
            w_.sym((run << 4) | size)
            w_.write(_amplitude(v, size), size)
            run = 0
        if last_nz < se - ss:
            w_.eobrun = 1
    w_.flush_eob()
    w_.pad_to_byte()
    return bytes(w_.out)


def _prog_ac_refine(zz, cbh, cbw, ss, se, ah, al):
    w_ = _ProgWriter()
    for unit in range(cbh * cbw):
        uy, ux = divmod(unit, cbw)
        vals = [int(zz[uy, ux, k]) for k in range(ss, se + 1)]
        hist = [_trunc(v, ah) for v in vals]
        now = [_trunc(v, al) for v in vals]
        sig = [j for j in range(len(vals)) if hist[j] == 0 and now[j] != 0]
        if not sig:
            w_.eobrun += 1
            w_.pending += [abs(n) & 1 for hv, n in zip(hist, now) if hv != 0]
            if w_.eobrun == 0x7FFF:
                w_.flush_eob()
            continue
        w_.flush_eob()
        last_sig = max(sig)
        run = 0
        buf = []  # (zero-history zeros before this correction, bit)
        for j in range(last_sig + 1):
            if hist[j] != 0:
                buf.append((run, abs(now[j]) & 1))
            elif now[j] == 0:
                run += 1
            else:  # newly significant: ±1 at the al scale
                while run > 15:
                    w_.sym(0xF0)
                    for z, b in (e for e in buf if e[0] < 16):
                        w_.write(b, 1)
                    buf = [(z - 16, b) for z, b in buf if z >= 16]
                    run -= 16
                w_.sym((run << 4) | 1)
                w_.write(1 if now[j] > 0 else 0, 1)
                for _z, b in buf:
                    w_.write(b, 1)
                buf = []
                run = 0
        if last_sig < se - ss:
            w_.eobrun = 1
            w_.pending = [
                abs(now[j]) & 1
                for j in range(last_sig + 1, len(vals))
                if hist[j] != 0
            ]
    w_.flush_eob()
    w_.pad_to_byte()
    return bytes(w_.out)


def encode_progressive(
    img: np.ndarray, subsample: bool = False
) -> tuple[bytes, np.ndarray]:
    """Encode as progressive JPEG (SOF2) with spectral selection AND
    successive approximation — the scan script every web encoder ships:
    interleaved DC first (Al=1), per-component AC first in two bands
    (Al=1), DC refinement (Ah=1), per-component AC refinement (Ah=1).
    The scans are collectively lossless w.r.t. the quantized
    coefficients, so expected_rgb equals the baseline reconstruction of
    the same blocks."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": img.astype(np.float64)}]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        sf = 2 if subsample else 1
        if subsample:
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            cb = _pad_edge(cb, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = _pad_edge(cr, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        comps = [
            {"id": 1, "h": sf, "v": sf, "tq": 0, "plane": y},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qts = {0: QT_LUMA, 1: QT_CHROMA}
    for c in comps:
        ph, pw = mcus_y * c["v"] * 8, mcus_x * c["h"] * 8
        c["blocks"] = _plane_blocks(_pad_edge(c["plane"], ph, pw), qts[c["tq"]])
        bh, bw_ = c["blocks"].shape[:2]
        c["zz"] = c["blocks"].reshape(bh, bw_, 64)[:, :, ZIGZAG]
        # non-interleaved scans cover the component's OWN block grid,
        # which can be smaller than the MCU-padded grid
        cw = -(-(w * c["h"]) // hmax)
        chh = -(-(h * c["v"]) // vmax)
        c["cbw"] = -(-cw // 8)
        c["cbh"] = -(-chh // 8)

    rec = []
    for c in comps:
        plane = _plane_reconstruct(c["blocks"], qts[c["tq"]])
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        rec.append(plane[:h, :w])
    if gray:
        expected = np.repeat(rec[0].astype(np.uint8)[:, :, None], 3, axis=2)
    else:
        yy, rcb, rcr = rec
        r = yy + 1.402 * (rcr - 128.0)
        g = yy - 0.344136 * (rcb - 128.0) - 0.714136 * (rcr - 128.0)
        b = yy + 1.772 * (rcb - 128.0)
        expected = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq in sorted({c["tq"] for c in comps}):
        zzq = np.zeros(64, dtype=np.uint8)
        zzq[:] = qts[tq].reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(zzq)
    nf = len(comps)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    for tc, (bits, vals) in ((0, (DC_BITS, DC_VALS)), (1, (ACP_BITS, ACP_VALS))):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc << 4]) + bytes(bits) + bytes(vals)

    def sos(sc, ss, se, ah, al):
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(sc), len(sc))
        for c in sc:
            hdr += bytes([c["id"], 0x00])
        return hdr + bytes([ss, se, (ah << 4) | al])

    # scan script: DC first, AC first (two bands for comp 0), DC refine,
    # AC refine — covers EOB runs, ZRL, and both refinement paths
    out += sos(comps, 0, 0, 0, 1)
    out += _prog_dc_scan(comps, mcus_x, mcus_y, 0, 1)
    for ci, c in enumerate(comps):
        bands = [(1, 5), (6, 63)] if ci == 0 else [(1, 63)]
        for ss, se in bands:
            out += sos([c], ss, se, 0, 1)
            out += _prog_ac_first(c["zz"], c["cbh"], c["cbw"], ss, se, 1)
    out += sos(comps, 0, 0, 1, 0)
    out += _prog_dc_scan(comps, mcus_x, mcus_y, 1, 0)
    for c in comps:
        out += sos([c], 1, 63, 1, 0)
        out += _prog_ac_refine(c["zz"], c["cbh"], c["cbw"], 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out), expected


def encode_baseline(
    img: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
    store_rgb: bool = False,
) -> tuple[bytes, np.ndarray]:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as baseline
    JPEG.  Returns (jpeg_bytes, expected_rgb) where expected_rgb is the
    exact (h, w, 3) uint8 array a conforming decoder produces.

    ``store_rgb`` encodes the three components as R/G/B directly and marks
    the stream with an Adobe APP14 segment (ColorTransform=0) — the
    Photoshop-style variant a decoder must NOT YCbCr-convert."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": img.astype(np.float64)}]
        hmax = vmax = 1
    elif store_rgb:
        assert not subsample, "RGB-stored fixtures are 4:4:4 only"
        comps = [
            {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": img[:, :, k].astype(np.float64)}
            for k in range(3)
        ]
        for c, cid in zip(comps, (1, 2, 3)):
            c["id"] = cid
        hmax = vmax = 1
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        sf = 2 if subsample else 1
        if subsample:
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            cb = _pad_edge(cb, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = _pad_edge(cr, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        comps = [
            {"id": 1, "h": sf, "v": sf, "tq": 0, "plane": y},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr},
        ]
        hmax, vmax = sf, sf
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qts = {0: QT_LUMA, 1: QT_CHROMA}

    for c in comps:
        ph, pw = mcus_y * c["v"] * 8, mcus_x * c["h"] * 8
        c["blocks"] = _plane_blocks(_pad_edge(c["plane"], ph, pw), qts[c["tq"]])

    # ---- expected decode (independent reconstruction path) ----
    rec = []
    for c in comps:
        plane = _plane_reconstruct(c["blocks"], qts[c["tq"]])
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        rec.append(plane[:h, :w])
    if gray:
        expected = np.repeat(rec[0].astype(np.uint8)[:, :, None], 3, axis=2)
    elif store_rgb:
        expected = np.stack(rec, axis=2).astype(np.uint8)
    else:
        yy, rcb, rcr = rec
        r = yy + 1.402 * (rcr - 128.0)
        g = yy - 0.344136 * (rcb - 128.0) - 0.714136 * (rcr - 128.0)
        b = yy + 1.772 * (rcb - 128.0)
        expected = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)

    # ---- marker stream ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if store_rgb:  # Adobe APP14, ColorTransform=0 (components are RGB)
        out += b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" + bytes(
            [0, 100, 0, 0, 0, 0, 0]
        )
    for tq in sorted({c["tq"] for c in comps}):
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = qts[tq].reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(zz)
    nf = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    for tc, (bits, vals) in ((0, (DC_BITS, DC_VALS)), (1, (AC_BITS, AC_VALS))):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc << 4]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nf, nf)
    for c in comps:
        out += bytes([c["id"], 0x00])  # DC table 0, AC table 0
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    bw = _BitWriter()
    pred = [0] * nf
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.pad_to_byte()
            out += bytes(bw.out)
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
            pred = [0] * nf
        my, mx = divmod(mcu, mcus_x)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = c["blocks"][my * c["v"] + by, mx * c["h"] + bx]
                    zz = blk.reshape(-1)[ZIGZAG]
                    pred[ci] = _encode_block(bw, zz, pred[ci])
    bw.pad_to_byte()
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out), expected
