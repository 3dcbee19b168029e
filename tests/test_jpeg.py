"""Pure-numpy baseline JPEG codec (operators/jpeg.py).

No external codec exists in this container (no PIL), so correctness
evidence is three-legged:
1. encoder→decoder round trips with error bounded by the quantization
   step (the two directions are implemented from the spec independently
   of each other — forward DCT/quant/Huffman-encode vs
   Huffman-decode/dequant/IDCT);
2. real-world golden files (from CPython's own test data, baseline
   SOF0; the color one is 4:2:0 subsampled) decode to pinned rasters;
3. non-baseline and malformed streams fail loudly.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from nebula_importer_spark.operators.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
)

DATA = Path(__file__).parent / "data"


def _gradient_gray(h=48, w=64):
    return np.linspace(0, 255, h * w).reshape(h, w).astype(np.uint8)


def _gradient_rgb(h=40, w=56):
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[..., 0] = np.linspace(0, 255, w)[None, :]
    rgb[..., 1] = np.linspace(0, 255, h)[:, None]
    rgb[..., 2] = 128
    return rgb


def test_round_trip_gray_bounded_error():
    img = _gradient_gray()
    for q, tol in ((95, 3), (85, 8), (50, 12)):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= tol, (q, err)


def test_round_trip_rgb_bounded_error():
    img = _gradient_rgb()
    dec = decode_jpeg(encode_jpeg(img, quality=92))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 10


def test_round_trip_non_multiple_of_8_dims():
    # edge-replication padding must crop back exactly; a smooth ramp
    # keeps quantization error tiny (noise is the adversarial case for
    # DCT compression quality, not for codec correctness)
    img = np.linspace(40, 210, 13 * 21).reshape(13, 21).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (13, 21)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6


def test_round_trip_flat_image_is_near_exact():
    img = np.full((16, 16), 200, np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=50))
    assert np.abs(dec.astype(int) - 200).max() <= 1


def test_restart_markers_round_trip():
    img = _gradient_gray(32, 80)  # 40 MCUs
    enc = encode_jpeg(img, quality=90, restart_interval=3)
    assert b"\xff\xdd" in enc  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    dec = decode_jpeg(enc)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    # restart markers change the byte stream, not the raster
    assert np.array_equal(dec, base)


def test_golden_gray_2x2():
    dec = decode_jpeg((DATA / "sample_gray.jpg").read_bytes())
    assert dec.shape == (2, 2) and dec.dtype == np.uint8
    # uniform mid-gray test image from CPython's suite
    assert np.array_equal(dec, np.full((2, 2), 128, np.uint8))


def test_golden_color_420():
    dec = decode_jpeg((DATA / "sample_color.jpg").read_bytes())
    assert dec.shape == (16, 16, 3) and dec.dtype == np.uint8
    # pinned regression raster stats (decoded with this module; the file
    # itself exercises 4:2:0 subsampling + separate chroma quant tables)
    assert abs(float(dec.mean()) - 92.4) < 1.0
    # pinned per-channel means (this module's decode of the golden)
    want = (98.13, 102.47, 76.61)
    got = tuple(float(dec[:, :, c].mean()) for c in range(3))
    assert all(abs(a - b) < 0.5 for a, b in zip(got, want)), got


def test_progressive_rejected():
    # flip the golden's SOF0 marker to SOF2 (progressive)
    data = bytearray((DATA / "sample_gray.jpg").read_bytes())
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(data))


def test_malformed_rejected():
    with pytest.raises(JpegError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")  # not a JPEG at all
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    truncated = (DATA / "sample_color.jpg").read_bytes()[:80]
    with pytest.raises((JpegError, Exception)):
        decode_jpeg(truncated)


def test_decode_image_routes_jpeg():
    from nebula_importer_spark.operators.multimodal import decode_image

    img = _gradient_gray(16, 16)
    arr = decode_image(encode_jpeg(img, quality=95))
    assert arr.shape == (16, 16, 1)
    rgb = decode_image((DATA / "sample_color.jpg").read_bytes())
    assert rgb.shape == (16, 16, 3)


def test_phash_now_decodes_jpeg():
    """perceptual_hashes' decoded flag flips to True for baseline JPEG —
    the stand-in path is now reserved for genuinely undecodable formats."""
    from nebula_importer_spark.operators.multimodal import _phash_pair

    decoded, a, d = _phash_pair(encode_jpeg(_gradient_gray(32, 32)))
    assert decoded is True
    decoded2, _, _ = _phash_pair(b"RIFF....WEBPVP8 ")  # WebP-ish → stand-in
    assert decoded2 is False


def test_noise_round_trip_error_bounded_by_quant_step():
    """Random noise is the adversarial content for DCT coding; with the
    correct zigzag-aligned quantizer the reconstruction error stays near
    the quantization step (review finding: dividing zigzag-ordered
    coefficients by the natural-order table passed the smooth-gradient
    tests while being ~9x off on noise)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=85))
    err = np.abs(dec.astype(int) - img.astype(int)).max()
    assert err <= 40, err  # was 161 with the misaligned quantizer


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2: any run of 0xFF fill bytes may precede a marker."""
    data = (DATA / "sample_color.jpg").read_bytes()
    i = data.find(b"\xff\xdb")
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(data))


def test_phash_degrades_on_corrupt_jpeg(spark):
    """A truncated FF D8 payload must hit the deterministic stand-in
    (decoded=False), not crash the kernel (review finding: only
    NotImplementedError was caught, JpegError escaped)."""
    from nebula_importer_spark.operators.multimodal import _phash_pair

    truncated = (DATA / "sample_color.jpg").read_bytes()[:60]
    decoded, a, d = _phash_pair(truncated)
    assert decoded is False and a >= 0 and d >= 0
