"""Baseline JPEG codec (operators/jpeg.py): exactness, entropy-coding
paths, color/subsampling/restart, and the multimodal dispatch seam."""

import numpy as np
import pytest

from strawboat_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    synthesize_jpeg_bytes,
)


def test_constant_blocks_decode_bit_exact():
    """With the all-ones quant table a constant 8x8 block is DC-only,
    and IDCT of a DC-only block is exactly constant — the decode must
    reproduce the analytic mean bit-for-bit (this is what the
    multimodal_jpeg_decode oracle relies on)."""
    for doc_id in (0, 1, 7, 123, 255):
        w, h = 8 * (1 + doc_id % 3), 8 * (1 + doc_id % 2)
        dw, dh, mean = decode_jpeg(synthesize_jpeg_bytes(doc_id, w, h))
        n_blocks = (w // 8) * (h // 8)
        vals = (np.arange(n_blocks, dtype=np.int64) * 41 + doc_id) % 256
        assert (dw, dh) == (w, h)
        assert mean == round(float(vals.mean()), 4)


def test_random_gray_roundtrip_exercises_ac_paths():
    """Random pixels produce dense AC coefficients (ZRL, long runs,
    every magnitude category) — with quant=1 the DCT roundtrip must
    stay within rounding distance of the source mean."""
    rng = np.random.default_rng(42)
    for shape in ((8, 8), (24, 40), (64, 16)):
        px = rng.integers(0, 256, size=shape).astype(np.uint8)
        w, h, mean = decode_jpeg(encode_jpeg(px))
        assert (w, h) == (shape[1], shape[0])
        assert abs(mean - px.mean()) < 1.0


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(px))
    restarted = decode_jpeg(encode_jpeg(px, restart_interval=3))
    assert plain == restarted


@pytest.mark.parametrize("subsampling", ["444", "422", "420"])
def test_color_roundtrip(subsampling):
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(32, 48, 3)).astype(np.uint8)
    w, h, mean = decode_jpeg(encode_jpeg(rgb, subsampling=subsampling))
    assert (w, h) == (48, 32)
    # subsampled chroma averages neighbors, so random data moves more
    tol = 1.0 if subsampling == "444" else 3.0
    assert abs(mean - rgb.mean()) < tol


def test_constant_color_420_is_near_exact():
    """Constant color: chroma subsampling loses nothing, only the
    color-transform roundtrip rounds."""
    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 100, 50
    _, _, mean = decode_jpeg(encode_jpeg(rgb, subsampling="420"))
    assert abs(mean - (200 + 100 + 50) / 3) < 1.5


def test_unsupported_modes_raise():
    good = bytearray(synthesize_jpeg_bytes(1, 8, 8))
    # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must raise, not
    # silently misdecode
    i = bytes(good).index(b"\xff\xc0")
    good[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(good))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"NOTAJPEG")


def test_multimodal_dispatch_decodes_jpeg():
    from strawboat_spark.operators.multimodal import _decode_image_bytes

    b = synthesize_jpeg_bytes(3, 16, 8)
    w, h, mean = _decode_image_bytes(b, deterministic_fake=False)
    vals = (np.arange(2, dtype=np.int64) * 41 + 3) % 256
    assert (w, h, mean) == (16, 8, round(float(vals.mean()), 4))


def test_quantized_lossy_encode_decodes():
    """A non-trivial quant table (coarse high frequencies) is the
    realistic corpus case; the decoder must apply dequantization."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    quant = np.clip(np.arange(64) * 2 + 1, 1, 99)
    w, h, mean = decode_jpeg(encode_jpeg(px, quant=quant))
    assert (w, h) == (16, 16)
    assert abs(mean - px.mean()) < 12.0  # lossy, but sane
