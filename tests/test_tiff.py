"""TIFF codec (operators/tiff.py): lossless roundtrip across
compressions/predictor/strip layouts, big-endian reads, palette and
white-is-zero photometrics, and the multimodal dispatch seam."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from strawboat_spark.operators.tiff import (
    _packbits_decode,
    _packbits_encode,
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    decode_tiff,
    decode_tiff_pixels,
    encode_tiff,
    synthesize_tiff_bytes,
)


def test_tiff_lzw_roundtrip_with_width_growth_and_reset():
    rng = np.random.default_rng(21)
    a = rng.integers(0, 256, 120_000, dtype=np.uint8).tobytes()
    assert _tiff_lzw_decode(_tiff_lzw_encode(a), len(a)) == a


def test_tiff_lzw_differs_from_gif_lzw():
    """Early change: the TIFF stream widens one code earlier — the two
    LZW variants must NOT be bit-compatible on a stream long enough to
    hit the first width boundary."""
    from strawboat_spark.operators.gif import _lzw_encode as gif_encode

    rng = np.random.default_rng(22)
    a = rng.integers(0, 256, 2000, dtype=np.uint8)
    tiff_bits = _tiff_lzw_encode(a)
    gif_bits = gif_encode(a, 8)
    assert tiff_bits != gif_bits


def test_packbits_roundtrip_and_runs():
    rng = np.random.default_rng(23)
    for data in (
        b"",
        b"\x07",
        b"\x00" * 300,
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
        bytes(rng.integers(0, 3, 5000, dtype=np.uint8)),
    ):
        assert _packbits_decode(_packbits_encode(data), len(data)) == data
    # runs >= 3 actually compress
    assert len(_packbits_encode(b"\x05" * 100)) == 2


def test_container_matrix_roundtrip():
    rng = np.random.default_rng(24)
    for shape in ((1, 1), (7, 5), (33, 40), (15, 20, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for comp in (1, 5, 32773):
            for pred in (1, 2) if comp == 5 else (1,):
                for rps in (None, 4):
                    px = decode_tiff_pixels(encode_tiff(img, comp, pred, rps))
                    assert np.array_equal(px, img), (shape, comp, pred, rps)


def test_big_endian_reads():
    """Hand-build a minimal MM (big-endian) gray TIFF; the II-writing
    encoder can't produce one, so this pins the byte-order path."""
    w, h = 4, 3
    px = np.arange(12, dtype=np.uint8).reshape(h, w)
    strip = px.tobytes()
    entries = [
        (256, 3, 1, struct.pack(">HH", w, 0)),
        (257, 3, 1, struct.pack(">HH", h, 0)),
        (258, 3, 1, struct.pack(">HH", 8, 0)),
        (259, 3, 1, struct.pack(">HH", 1, 0)),
        (262, 3, 1, struct.pack(">HH", 1, 0)),
        (273, 4, 1, None),  # patched below
        (278, 3, 1, struct.pack(">HH", h, 0)),
        (279, 4, 1, struct.pack(">I", len(strip))),
    ]
    ifd_size = 2 + len(entries) * 12 + 4
    strip_off = 8 + ifd_size
    out = b"MM" + struct.pack(">HI", 42, 8) + struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        if val is None:
            val = struct.pack(">I", strip_off)
        out += struct.pack(">HHI", tag, typ, cnt) + val
    out += struct.pack(">I", 0) + strip
    assert np.array_equal(decode_tiff_pixels(out), px)


def test_white_is_zero_inverts():
    w, h = 3, 2
    px = np.arange(6, dtype=np.uint8).reshape(h, w)
    raw = bytearray(encode_tiff(px))
    # photometric tag 262 value: flip 1 (black-is-zero) -> 0
    ifd_off = struct.unpack_from("<I", raw, 4)[0]
    (n,) = struct.unpack_from("<H", raw, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + i * 12
        tag = struct.unpack_from("<H", raw, base)[0]
        if tag == 262:
            struct.pack_into("<H", raw, base + 8, 0)
    assert np.array_equal(decode_tiff_pixels(bytes(raw)), 255 - px)


def test_unsupported_variants_raise():
    with pytest.raises(ValueError, match="byte order"):
        decode_tiff(b"XX\x2a\x00garbage")
    img = np.zeros((4, 4), dtype=np.uint8)
    raw = bytearray(encode_tiff(img))
    ifd_off = struct.unpack_from("<I", raw, 4)[0]
    (n,) = struct.unpack_from("<H", raw, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + i * 12
        if struct.unpack_from("<H", raw, base)[0] == 259:
            struct.pack_into("<H", raw, base + 8, 4)  # CCITT G.4
    with pytest.raises(ValueError, match="compression"):
        decode_tiff_pixels(bytes(raw))


def test_multimodal_dispatch_decodes_tiff():
    from strawboat_spark.operators.multimodal import _decode_image_bytes

    b = synthesize_tiff_bytes(3, 10, 6)
    vals = (np.arange(60, dtype=np.int64) * 31 + 3) % 256
    assert _decode_image_bytes(b, deterministic_fake=False) == (
        10, 6, round(float(vals.mean()), 4))


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
    st.sampled_from([1, 5, 32773]),
    st.booleans(),
)
def test_property_roundtrip_bit_exact(w, h, seed, comp, rgb):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    pred = 2 if comp == 5 else 1
    px = decode_tiff_pixels(encode_tiff(img, comp, pred, rows_per_strip=max(1, h // 3)))
    assert np.array_equal(px, img)
