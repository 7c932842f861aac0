"""QOI — the "Quite OK Image" format (qoiformat.org, public-domain
one-page spec). Lossless byte-oriented RGB(A) compression: 64-entry
hash-indexed color cache, small per-channel diffs, luma diffs, runs.
Increasingly common as a fast intermediate format in image pipelines;
decoding is strictly sequential per image but embarrassingly parallel
across a corpus's payload column, like every other codec here.

Pure Python/numpy encode + decode; dispatched from
multimodal._decode_image_bytes on the 'qoif' magic.
"""

from __future__ import annotations

import struct

import numpy as np

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(pixels: np.ndarray) -> bytes:
    """(h, w, 3) or (h, w, 4) uint8 -> QOI bytes."""
    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4):
        raise ValueError("QOI encodes (h, w, 3|4) uint8 arrays")
    h, w, ch = pixels.shape
    out = bytearray(b"qoif" + struct.pack(">IIBB", w, h, ch, 0))
    px = pixels.reshape(-1, ch).astype(np.int64)
    if ch == 3:
        px = np.concatenate([px, np.full((len(px), 1), 255, dtype=np.int64)], axis=1)
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for p in map(tuple, px):
        if p == prev:
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        i = _hash(*p)
        if index[i] == p:
            out.append(_OP_INDEX | i)
        else:
            index[i] = p
            r, g, b, a = p
            pr, pg, pb, pa = prev
            if a == pa:
                dr, dg, db = (r - pr) & 255, (g - pg) & 255, (b - pb) & 255
                dr = dr - 256 if dr > 127 else dr
                dg = dg - 256 if dg > 127 else dg
                db = db - 256 if db > 127 else db
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                    out.append(_OP_LUMA | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((_OP_RGB, r, g, b))
            else:
                out += bytes((_OP_RGBA, r, g, b, a))
        prev = p
    if run:
        out.append(_OP_RUN | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_qoi_pixels(payload: bytes) -> np.ndarray:
    """QOI bytes -> (h, w, channels) uint8."""
    if payload[:4] != b"qoif":
        raise ValueError("not a QOI payload (bad magic)")
    if len(payload) < 14 + 8:  # header + end marker minimum
        raise ValueError("truncated QOI header")
    w, h, ch, _cs = struct.unpack_from(">IIBB", payload, 4)
    if w * h > 100_000_000:
        raise ValueError(f"implausible QOI dimensions {w}x{h}")
    if ch not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {ch}")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    data = payload
    while i < n:
        if pos >= len(data) - 7:
            raise ValueError("truncated QOI stream")
        byte = data[pos]
        pos += 1
        if byte == _OP_RGB:
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == _OP_RGBA:
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte & 0xC0
            if tag == _OP_INDEX:
                r, g, b, a = index[byte & 0x3F]
            elif tag == _OP_DIFF:
                r = (r + ((byte >> 4) & 3) - 2) & 255
                g = (g + ((byte >> 2) & 3) - 2) & 255
                b = (b + (byte & 3) - 2) & 255
            elif tag == _OP_LUMA:
                dg = (byte & 0x3F) - 32
                b2 = data[pos]
                pos += 1
                r = (r + dg + ((b2 >> 4) & 0x0F) - 8) & 255
                g = (g + dg) & 255
                b = (b + dg + (b2 & 0x0F) - 8) & 255
            else:  # run
                run = (byte & 0x3F) + 1
                if i + run > n:
                    # without this, the numpy slice silently clips, i
                    # jumps past n, and a corrupt stream surfaces later
                    # as a misleading 'missing QOI end marker'
                    raise ValueError(
                        f"QOI run of {run} at pixel {i} overruns pixel count {n}"
                    )
                out[i : i + run] = (r, g, b, a)
                i += run
                index[_hash(r, g, b, a)] = (r, g, b, a)
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if data[pos : pos + 8] != b"\x00" * 7 + b"\x01":
        raise ValueError("missing QOI end marker")
    return out[:, :ch].reshape(h, w, ch)


def decode_qoi(payload: bytes):
    """(width, height, mean) — the image-decoder contract of
    multimodal._decode_image_bytes (mean over all channels)."""
    px = decode_qoi_pixels(payload)
    h, w = px.shape[:2]
    return w, h, round(float(px.astype(np.float64).mean()), 4)


def synthesize_qoi_bytes(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic RGB gate payload: pixel i has channels
    ((3i + doc_id) % 256, (5i + doc_id) % 256, (7i + doc_id) % 256) —
    exercises DIFF/LUMA/RGB/INDEX/RUN paths and gives the oracle an
    analytic mean."""
    i = np.arange(width * height, dtype=np.int64)
    px = np.stack(
        [(3 * i + doc_id) % 256, (5 * i + doc_id) % 256, (7 * i + doc_id) % 256],
        axis=1,
    ).astype(np.uint8)
    return encode_qoi(px.reshape(height, width, 3))
