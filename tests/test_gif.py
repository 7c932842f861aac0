"""GIF codec (operators/gif.py): lossless LZW roundtrip including
width growth and table-full resets, interlace, palettes, extension
skipping, animated first-frame, and the multimodal dispatch seam."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from strawboat_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_pixels,
    encode_gif,
    synthesize_gif_bytes,
)

_GRAY = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)


def test_lzw_roundtrip_grows_width_and_clears():
    rng = np.random.default_rng(11)
    # 200k random bytes force widths 9..12 AND the 4096-entry CLEAR reset
    a = rng.integers(0, 256, size=200_000, dtype=np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(a, 8), 8, len(a)), a)


def test_lzw_kwkwk_case():
    # 'aaaa...' emits the code-being-defined (KwKwK) immediately
    a = np.zeros(50, dtype=np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(a, 2), 2, 50), a)


def test_container_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(12)
    for h, w in ((1, 1), (7, 5), (33, 40)):
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        for il in (False, True):
            px = decode_gif_pixels(encode_gif(img, _GRAY, interlace=il))
            assert px.shape == (h, w, 3)
            assert np.array_equal(px[:, :, 0], img)
            assert np.array_equal(px[:, :, 1], img)  # gray palette


def test_small_palette_uses_narrow_codes():
    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, size=(4, 3)).astype(np.uint8)
    idx = rng.integers(0, 4, size=(9, 9), dtype=np.uint8)
    px = decode_gif_pixels(encode_gif(idx, pal))
    assert np.array_equal(px, pal[idx])


def test_extension_blocks_are_skipped():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = bytearray(encode_gif(img, _GRAY))
    # splice a Graphic Control Extension right before the image separator
    sep = raw.index(0x2C, 13 + 768)
    gce = bytes((0x21, 0xF9, 4, 0, 0, 0, 0, 0))
    spliced = bytes(raw[:sep]) + gce + bytes(raw[sep:])
    assert np.array_equal(decode_gif_pixels(spliced), decode_gif_pixels(bytes(raw)))


def test_local_palette_overrides_global():
    img = np.arange(6, dtype=np.uint8).reshape(2, 3)
    raw = bytearray(encode_gif(img, _GRAY))
    sep = raw.index(0x2C, 13 + 768)
    local = np.repeat(np.arange(255, -1, -1, dtype=np.uint8), 3).reshape(256, 3)
    # set the local-color-table flag (size bits 7 = 256 entries) on the
    # packed byte (sep + 8-byte geometry) and splice the table between
    # the descriptor and the LZW min-code-size byte
    raw[sep + 9] |= 0x87
    spliced = bytes(raw[: sep + 10]) + local.tobytes() + bytes(raw[sep + 10 :])
    px = decode_gif_pixels(spliced)
    assert np.array_equal(px[:, :, 0], 255 - img)


def test_animated_gif_decodes_first_frame():
    a = np.full((4, 4), 7, dtype=np.uint8)
    b = np.full((4, 4), 250, dtype=np.uint8)
    one = bytearray(encode_gif(a, _GRAY))
    two = bytearray(encode_gif(b, _GRAY))
    sep2 = two.index(0x2C, 13 + 768)
    animated = bytes(one[:-1]) + bytes(two[sep2:])  # drop trailer, append frame 2
    assert np.array_equal(decode_gif_pixels(animated)[:, :, 0], a)


def test_synthesized_matches_analytic_formula():
    for doc_id in (0, 9, 200):
        w0, h0 = 6 + doc_id % 11, 4 + doc_id % 8
        w, h, mean = decode_gif(synthesize_gif_bytes(doc_id, w0, h0))
        vals = (np.arange(w0 * h0, dtype=np.int64) * 29 + doc_id) % 256
        assert (w, h, mean) == (w0, h0, round(float(vals.mean()), 4))


def test_corrupt_streams_raise():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF")
    img = np.zeros((4, 4), dtype=np.uint8)
    raw = bytearray(encode_gif(img, _GRAY))
    raw[-4] ^= 0xFF  # flip a data byte near the end of the LZW stream
    with pytest.raises(ValueError):
        decode_gif_pixels(bytes(raw))
    headless = struct.pack("<6sHHBBB", b"GIF89a", 2, 2, 0, 0, 0) + bytes((0x3B,))
    with pytest.raises(ValueError, match="no image"):
        decode_gif_pixels(headless)


def test_multimodal_dispatch_decodes_gif():
    from strawboat_spark.operators.multimodal import _decode_image_bytes

    b = synthesize_gif_bytes(3, 10, 6)
    vals = (np.arange(60, dtype=np.int64) * 29 + 3) % 256
    assert _decode_image_bytes(b, deterministic_fake=False) == (
        10, 6, round(float(vals.mean()), 4))


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
    st.booleans(),
    st.sampled_from([2, 4, 16, 256]),
)
def test_property_roundtrip_bit_exact(w, h, seed, interlace, ncolors):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncolors, 3)).astype(np.uint8)
    idx = rng.integers(0, ncolors, size=(h, w), dtype=np.uint8)
    px = decode_gif_pixels(encode_gif(idx, pal, interlace=interlace))
    assert np.array_equal(px, pal[idx])
