"""Baseline JPEG decoder tests: round-trips against the test-side encoder
(tests/jpeg_codec.py), with expected pixels computed through an INDEPENDENT
dequantize → IDCT → upsample → color-convert path that never touches the
decoder.  The encoder writes GENERATED uniform-length Huffman tables into
DHT, so a decoder relying on built-in Annex K defaults would fail here —
the decode path under test is the file's own table plumbing.

Reference stake: the reference accepts image/* and decodes JPEG via Jimp
(src/ocr/image-recognition.controller.ts:87, code-reader.service.ts:22-30);
this moves JPEG from the stub tier to the really-decoded tier.
"""

import numpy as np
import pytest

from ocr_mini_service_spark.operators.multimodal import (
    _decode,
    _decode_jpeg,
    _decode_jpeg_pixels,
    _resize_grid,
    _ZIGZAG,
    THUMB,
)
from tests.jpeg_codec import ZIGZAG, encode_baseline, encode_progressive


def _gradient(h, w, channels=3, seed=7):
    """Deterministic structured test image (gradients + a block pattern)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 5 + xx * 3 + seed) % 256
    if channels == 1:
        return base.astype(np.uint8)
    return np.stack(
        [base, (base * 2 + 31) % 256, (255 - base + (yy // 4) * 8) % 256], axis=2
    ).astype(np.uint8)


def test_zigzag_matches_published_constant():
    """The engine derives the scan order from the diagonal-walk rule; pin
    it against the published 64-entry T.81 constant (independent literal)."""
    assert _ZIGZAG == ZIGZAG


def test_roundtrip_grayscale():
    img = _gradient(24, 17, channels=1)
    data, expected = encode_baseline(img)
    got = _decode_jpeg_pixels(data)
    assert got.shape == (24, 17, 3)
    assert np.array_equal(got, expected)


def test_roundtrip_rgb_444():
    img = _gradient(16, 16)
    data, expected = encode_baseline(img)
    assert np.array_equal(_decode_jpeg_pixels(data), expected)


def test_roundtrip_rgb_444_odd_dims():
    """Non-multiple-of-8 dims exercise MCU padding + crop."""
    img = _gradient(19, 13)
    data, expected = encode_baseline(img)
    got = _decode_jpeg_pixels(data)
    assert got.shape == (19, 13, 3)
    assert np.array_equal(got, expected)


def test_roundtrip_rgb_420_subsampled():
    """4:2:0 chroma subsampling: 2x2 luma blocks per MCU, chroma upsampled
    back by pixel replication; odd dims exercise both paddings."""
    img = _gradient(21, 18, seed=3)
    data, expected = encode_baseline(img, subsample=True)
    got = _decode_jpeg_pixels(data)
    assert got.shape == (21, 18, 3)
    assert np.array_equal(got, expected)


def test_roundtrip_with_restart_markers():
    """DRI + RSTn: DC predictors reset and the bit reader realigns at every
    restart boundary."""
    img = _gradient(32, 32, seed=11)
    data, expected = encode_baseline(img, subsample=True, restart_interval=2)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data  # markers really present
    assert np.array_equal(_decode_jpeg_pixels(data), expected)


def test_progressive_roundtrip_gray_and_rgb():
    """Progressive (SOF2) with spectral selection + successive
    approximation decodes bit-exactly: the scan script restores the full
    quantized coefficients, so the result equals the independent baseline
    reconstruction of the same blocks."""
    for shape in [(16, 16), (24, 31), (8, 8)]:
        img = _gradient(*shape, channels=1, seed=sum(shape))
        data, expected = encode_progressive(img)
        assert b"\xff\xc2" in data
        assert data.count(b"\xff\xda") >= 4  # genuinely multi-scan
        assert np.array_equal(_decode_jpeg_pixels(data), expected), shape
    data, expected = encode_progressive(_gradient(21, 18, seed=5))
    assert data.count(b"\xff\xda") >= 8
    assert np.array_equal(_decode_jpeg_pixels(data), expected)


def test_progressive_roundtrip_noisy_and_subsampled():
    """Noise maximizes AC refinement traffic (ZRL spans, newly-significant
    coefficients, EOB-run corrections); 4:2:0 exercises the interleaved DC
    scan and the non-interleaved component grids that are SMALLER than the
    MCU-padded grid."""
    rng = np.random.RandomState(7)
    noisy = rng.randint(0, 256, size=(40, 56, 3)).astype(np.uint8)
    data, expected = encode_progressive(noisy, subsample=True)
    assert np.array_equal(_decode_jpeg_pixels(data), expected)
    data, expected = encode_progressive(noisy[:, :, 0])
    assert np.array_equal(_decode_jpeg_pixels(data), expected)


def test_progressive_malformed_scan_rejected():
    """A baseline-shaped full scan under an SOF2 header (DC and AC mixed
    in one scan) is structurally invalid and must error, not guess."""
    data, _ = encode_baseline(_gradient(16, 16))
    patched = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="mixes DC and AC"):
        _decode_jpeg_pixels(patched)


def test_12bit_precision_rejected():
    data, _ = encode_baseline(_gradient(16, 16))
    i = data.index(b"\xff\xc0")
    patched = data[: i + 4] + bytes([12]) + data[i + 5 :]
    with pytest.raises(ValueError, match="precision"):
        _decode_jpeg_pixels(patched)


def test_truncated_stream_raises():
    data, _ = encode_baseline(_gradient(16, 16))
    with pytest.raises(ValueError):
        _decode_jpeg_pixels(data[: len(data) // 2])


def test_oversize_dimensions_rejected_before_scan():
    """The pre-decode bomb guard: huge declared dims raise at SOF, before
    any entropy byte is decoded."""
    data, _ = encode_baseline(_gradient(16, 16))
    i = data.index(b"\xff\xc0")
    # patch h=w=0x7fff (32767x32767 ≈ 1.07 Gpx, far over the 4 Mpx cap)
    patched = data[: i + 5] + b"\x7f\xff\x7f\xff" + data[i + 9 :]
    with pytest.raises(ValueError, match="too large"):
        _decode_jpeg_pixels(patched)


def test_decode_dispatch_reports_real_geometry():
    """_decode routes FF D8 FF payloads to the real decoder: width/height
    come from SOF, not from the declared metadata columns."""
    img = _gradient(20, 30)
    data, expected = encode_baseline(img)
    feat = _decode(data, "image", 999, 777)
    assert (feat["width"], feat["height"], feat["n_frames"]) == (30, 20, 1)
    luma = (expected.astype(np.float64) @ np.array([0.299, 0.587, 0.114])).mean() / 255.0
    assert feat["mean_luma"] == pytest.approx(luma, abs=0)
    assert feat == _decode_jpeg(data)


def test_resize_grid_jpeg_is_real_not_digest():
    """media_resize's nearest-neighbor thumbnail runs over the REAL raster:
    the grid equals the integer-luma grid computed from the independently
    reconstructed pixels."""
    img = _gradient(40, 25, seed=5)
    data, expected = encode_baseline(img)
    grid = _resize_grid(data, "image", 0, 0)
    px = expected.astype(np.int64)
    luma = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
    want = [
        int(luma[(ty * 40) // THUMB, (tx * 25) // THUMB])
        for ty in range(THUMB)
        for tx in range(THUMB)
    ]
    assert grid == want


def test_rgb_stored_adobe_app14_not_color_converted():
    """Adobe APP14 ColorTransform=0 marks the three components as literal
    R/G/B — YCbCr-converting them would be silently wrong pixels.  The
    fixture's planes round-trip exactly, so any conversion step fails it."""
    img = _gradient(17, 22, seed=9)
    data, expected = encode_baseline(img, store_rgb=True)
    assert b"Adobe" in data
    got = _decode_jpeg_pixels(data)
    assert np.array_equal(got, expected)


def test_truncated_at_restart_boundary_raises_valueerror():
    """A stream cut exactly where a restart marker should be raises the
    documented ValueError, not IndexError."""
    img = _gradient(32, 32, seed=11)
    data, _ = encode_baseline(img, subsample=True, restart_interval=2)
    rst = data.index(b"\xff\xd0")
    with pytest.raises(ValueError):
        _decode_jpeg_pixels(data[:rst])
    with pytest.raises(ValueError):
        _decode_jpeg_pixels(data[: rst + 1])


def test_large_noisy_stream_decodes_in_linear_time():
    """Regression for the quadratic bit-reader accumulator: a high-entropy
    256x256 image (a ~200 KB entropy stream with no restart markers, so
    align() never trims the accumulator) must decode in seconds, not
    minutes.  Before the acc truncation fix this took ~40s+ (O(n²) bigint
    shifts); with it, well under the bound."""
    import time

    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, size=(256, 256, 3), dtype=np.uint8).astype(np.uint8)
    data, expected = encode_baseline(img)
    t0 = time.monotonic()
    got = _decode_jpeg_pixels(data)
    wall = time.monotonic() - t0
    assert np.array_equal(got, expected)
    assert wall < 20.0, f"entropy decode took {wall:.1f}s — quadratic reader?"
