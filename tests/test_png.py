"""PNG codec (operators/png.py): lossless roundtrip, every row
filter, palette images, and the multimodal dispatch seam."""

import struct
import zlib

import numpy as np
import pytest

from strawboat_spark.operators.png import (
    _SIG,
    _chunk,
    decode_png,
    encode_png,
    synthesize_png_bytes,
)


def test_roundtrip_is_bit_exact():
    rng = np.random.default_rng(2)
    for shape in ((13, 17), (9, 5, 3), (6, 8, 4)):
        px = rng.integers(0, 256, size=shape).astype(np.uint8)
        w, h, mean = decode_png(encode_png(px))
        assert (w, h) == (shape[1], shape[0])
        assert mean == round(float(px.mean()), 4)


def test_synthesized_matches_analytic_formula():
    for doc_id in (0, 9, 200):
        w0, h0 = 8 + doc_id % 9, 5 + doc_id % 6
        w, h, mean = decode_png(synthesize_png_bytes(doc_id, w0, h0))
        vals = (np.arange(w0 * h0, dtype=np.int64) * 23 + doc_id) % 256
        assert (w, h, mean) == (w0, h0, round(float(vals.mean()), 4))


def _raw_png(ihdr_fields, chunks):
    out = _SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    for ctype, data in chunks:
        out += _chunk(ctype, data)
    return out + _chunk(b"IEND", b"")


def test_all_five_row_filters_decode():
    """Foreign encoders use Sub/Up/Average/Paeth; hand-filter one row
    with each type and require exact reconstruction."""
    rng = np.random.default_rng(3)
    w, h, bpp = 8, 5, 3
    px = rng.integers(0, 256, size=(h, w, bpp)).astype(np.uint8)
    rows = px.reshape(h, -1).astype(np.int64)
    scan = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y]
        left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            enc = (cur - (left + prev) // 2) % 256
        else:
            enc = np.zeros(w * bpp, np.int64)
            for i in range(w * bpp):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) % 256
        scan += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = cur
    payload = _raw_png((w, h, 8, 2, 0, 0, 0), [(b"IDAT", zlib.compress(bytes(scan)))])
    assert decode_png(payload) == (w, h, round(float(px.mean()), 4))


def test_palette_images_resolve_to_rgb():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, size=(4, 6)).astype(np.uint8)
    scan = b"".join(bytes([0]) + bytes(idx[y]) for y in range(4))
    payload = _raw_png(
        (6, 4, 8, 3, 0, 0, 0),
        [(b"PLTE", pal.tobytes()), (b"IDAT", zlib.compress(scan))],
    )
    assert decode_png(payload) == (6, 4, round(float(pal[idx.reshape(-1)].mean()), 4))


def test_multiple_idat_chunks_concatenate():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    full = encode_png(px)
    # re-split the IDAT stream into two chunks
    scan = np.concatenate([np.zeros((8, 1), np.uint8), px], axis=1)
    comp = zlib.compress(scan.tobytes())
    payload = _raw_png(
        (8, 8, 8, 0, 0, 0, 0),
        [(b"IDAT", comp[:10]), (b"IDAT", comp[10:])],
    )
    assert decode_png(payload) == decode_png(full)


def test_unsupported_variants_raise():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOTPNG")
    px16 = _raw_png((4, 4, 16, 0, 0, 0, 0), [(b"IDAT", zlib.compress(b"\x00" * 36))])
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(px16)
    adam7 = _raw_png((4, 4, 8, 0, 0, 0, 1), [(b"IDAT", zlib.compress(b"\x00" * 20))])
    with pytest.raises(ValueError, match="interlace"):
        decode_png(adam7)


def test_multimodal_dispatch_decodes_png():
    from strawboat_spark.operators.multimodal import _decode_image_bytes

    b = synthesize_png_bytes(3, 10, 6)
    vals = (np.arange(60, dtype=np.int64) * 23 + 3) % 256
    assert _decode_image_bytes(b, deterministic_fake=False) == (
        10, 6, round(float(vals.mean()), 4))
