"""Pure-numpy PNG codec (RFC 2083 / ISO 15948) — stdlib zlib carries
the inflate, so unlike JPEG no external library is needed at all and
the decode is LOSSLESS: synthesized images roundtrip bit-exact, which
makes the `multimodal_png_decode` oracle a plain analytic formula.

Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA); interlace 0. Adam7 interlace and 16-bit
depth raise. All five row filters decode; `sub` uses a per-lane
cumsum instead of a byte loop, `average`/`paeth` fall back to the
sequential recurrence the spec defines (the encoder emits filter 0,
so the hot synthesis path never pays it).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Lossless PNG encoder for uint8 (h, w) gray, (h, w, 3) RGB or
    (h, w, 4) RGBA arrays. Rows use filter 0 (None) — simple, exact,
    and zlib still collapses the synthetic test patterns well."""
    if pixels.ndim == 2:
        color_type = 0
    elif pixels.shape[2] == 3:
        color_type = 2
    elif pixels.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported channel count {pixels.shape[2]}")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = pixels.reshape(h, -1).astype(np.uint8)
    scan = np.concatenate([np.zeros((h, 1), np.uint8), raw], axis=1)  # filter byte 0
    idat = zlib.compress(scan.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth_row(raw: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    out = np.zeros_like(raw, dtype=np.int64)
    for i in range(len(raw)):
        a = out[i - bpp] if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (int(raw[i]) + pred) & 0xFF
    return out.astype(np.uint8)


def _avg_row(raw: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    out = np.zeros_like(raw, dtype=np.int64)
    for i in range(len(raw)):
        a = out[i - bpp] if i >= bpp else 0
        out[i] = (int(raw[i]) + (a + int(prev[i])) // 2) & 0xFF
    return out.astype(np.uint8)


def _unfilter(scan: np.ndarray, h: int, row_bytes: int, bpp: int) -> np.ndarray:
    """scanlines (h, 1 + row_bytes) -> reconstructed bytes (h, row_bytes)."""
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    prev = np.zeros(row_bytes, dtype=np.uint8)
    for y in range(h):
        ftype = int(scan[y, 0])
        raw = scan[y, 1:]
        if ftype == 0:
            rec = raw.copy()
        elif ftype == 1:  # Sub: per-lane cumsum mod 256
            lanes = raw.reshape(-1, bpp).astype(np.int64)
            rec = np.cumsum(lanes, axis=0).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            rec = raw + prev  # uint8 wraps mod 256
        elif ftype == 3:
            rec = _avg_row(raw, prev, bpp)
        elif ftype == 4:
            rec = _paeth_row(raw, prev, bpp)
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    return out


def decode_png(payload: bytes):
    """Returns (width, height, mean) — mean over every stored sample
    (alpha included for types 4/6; palette entries resolved to RGB),
    rounded to 4, matching the multimodal decoder contract."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit depth supported (got {depth})")
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid compression/filter method")
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    row_bytes = w * ch
    scan = np.frombuffer(raw, dtype=np.uint8, count=h * (1 + row_bytes)).reshape(
        h, 1 + row_bytes
    )
    px = _unfilter(scan, h, row_bytes, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette image without PLTE chunk")
        px = plte[px.reshape(-1)]  # indices -> RGB
    return w, h, round(float(px.astype(np.float64).mean()), 4)


def synthesize_png_bytes(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic grayscale PNG: pixel i (row-major) is
    ((i*23 + doc_id) % 256). PNG is lossless, so the decoded mean is
    exactly the analytic mean — the multimodal_png_decode oracle."""
    px = ((np.arange(width * height, dtype=np.int64) * 23 + doc_id) % 256).astype(np.uint8)
    return encode_png(px.reshape(height, width))
