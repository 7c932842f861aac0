"""Pure-numpy baseline JPEG (ITU-T T.81) codec — no external imaging
libraries, so `multimodal_image_decode` covers the format real corpora
actually use (VERDICT r4 stretch #8).

Scope: baseline sequential DCT (SOF0), 8-bit, Huffman entropy coding,
grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, restart
markers. Progressive (SOF2) and arithmetic coding raise.

The encoder exists for test/oracle synthesis: with an all-ones quant
table and CONSTANT 8x8 blocks, every block is DC-only, and the IDCT of
a DC-only block is exactly constant — so the decode is bit-exact and
the expected mean is an SQL-computable function of doc_id (same
pattern as synthesize_ppm_bytes / synthesize_bmp_bytes).

Huffman table data is the public ITU-T T.81 Annex K recommendation.
Entropy decode walks bits in Python — fine for the test/metadata path
this serves; bulk pixel math (IDCT, upsample, color convert) is numpy.
"""

from __future__ import annotations

import functools
import struct
import types

import numpy as np

# zigzag position -> natural (row-major) index, ITU-T T.81 Figure 5
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K.3 typical luminance tables (public spec data)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


@functools.lru_cache(maxsize=64)
def _canonical_codes_t(bits: tuple, vals: tuple) -> "types.MappingProxyType":
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    # read-only view: the cache hands the SAME object to every caller,
    # so a mutation would silently corrupt all later encodes/decodes
    return types.MappingProxyType(out)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical assignment of
    ITU-T T.81 Annex C. Content-keyed cache (r17 opt): the encoder
    rebuilt the two Annex K tables for EVERY frame (profiled ~20% of
    tiny-frame encode); callers treat the dict as read-only."""
    return _canonical_codes_t(tuple(bits), tuple(vals))


@functools.lru_cache(maxsize=64)
def _decode_table_t(bits: tuple, vals: tuple) -> "types.MappingProxyType":
    return types.MappingProxyType(
        {(ln, code): sym for sym, (code, ln) in _canonical_codes_t(bits, vals).items()}
    )


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-at-a-time decoding (same
    content-keyed cache as the encode side: MJPEG decodes re-parse the
    identical DHT segment once per frame)."""
    return _decode_table_t(tuple(bits), tuple(vals))


# 8x8 DCT basis: block = C.T @ coeffs @ C ; coeffs = C @ block @ C.T
_X = np.arange(8, dtype=np.float64)
_C = np.cos((2 * _X[None, :] + 1) * _X[:, None] * np.pi / 16) / 2.0
_C[0, :] /= np.sqrt(2.0)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec)


class _BitReader:
    """Reads the entropy-coded segment: 0xFF00 unstuffing, stops at any
    real marker (RSTn handled by the MCU loop via `restart`)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24 and self.pos < len(d):
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt != 0x00:
                    break  # real marker: stop feeding bits
                self.pos += 2
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
            if self.nbits < n:  # ran off the segment: pad (spec: 1-bits)
                self.acc = (self.acc << (n - self.nbits)) | ((1 << (n - self.nbits)) - 1)
                self.nbits = n
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected RST marker")


def _extend(v: int, t: int) -> int:
    """DIFF/AC magnitude decoding (T.81 F.12)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, raw bits) for encoding."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_block(bw, block, qnat, pred, dc_codes, ac_codes) -> int:
    """Forward DCT + quantize + Huffman one 8x8 block; returns the new
    DC predictor."""
    coeffs = _C @ block @ _C.T
    zz = np.round(coeffs / qnat).astype(np.int64).reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    t, raw = _magnitude(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    bw.write(raw, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run = 0
            continue
        t, raw = _magnitude(v)
        code, ln = ac_codes[(run << 4) | t]
        bw.write(code, ln)
        bw.write(raw, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range color transform, float64 (h, w, 3) -> (h, w, 3)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def encode_jpeg(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder: grayscale ((h, w) uint8) or RGB
    ((h, w, 3) uint8), 4:4:4 / 4:2:2 / 4:2:0 chroma, optional restart
    markers. Dimensions must be multiples of 8 (16 when chroma is
    subsampled). All components
    share the Annex K luminance tables and quant table 0 (legal, and
    what keeps constant-color images bit-exact with the default
    all-ones quant table)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    blk = 16 if (not gray and subsampling in ("420", "422")) else 8
    if h % blk or w % blk:
        raise ValueError(f"encoder requires multiple-of-{blk} dimensions")
    q = np.ones(64, dtype=np.int64) if quant is None else np.asarray(quant).reshape(64)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)

    if gray:
        comps = [(pixels.astype(np.float64), 1, 1)]
    else:
        ycc = rgb_to_ycbcr(pixels.astype(np.float64))
        if subsampling == "420":
            cb = ycc[:, :, 1].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = ycc[:, :, 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            comps = [(ycc[:, :, 0], 2, 2), (cb, 1, 1), (cr, 1, 1)]
        elif subsampling == "422":
            cb = ycc[:, :, 1].reshape(h, w // 2, 2).mean(axis=2)
            cr = ycc[:, :, 2].reshape(h, w // 2, 2).mean(axis=2)
            comps = [(ycc[:, :, 0], 2, 1), (cb, 1, 1), (cr, 1, 1)]
        elif subsampling == "444":
            comps = [(ycc[:, :, 0], 1, 1), (ycc[:, :, 1], 1, 1), (ycc[:, :, 2], 1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")

    out = bytearray(b"\xff\xd8")  # SOI
    qz = q[ZIGZAG].astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qz.tobytes()
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for i, (_, ch, cv) in enumerate(comps):
        out += bytes([i + 1, (ch << 4) | cv, 0])
    for tc, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc << 4)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for i in range(len(comps)):
        out += bytes([i + 1, 0x00])
    out += bytes([0, 63, 0])

    bw = _BitWriter()
    qnat = q.reshape(8, 8).astype(np.float64)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)
    preds = [0] * len(comps)
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, (plane, ch, cv) in enumerate(comps):
                for v in range(cv):
                    for u in range(ch):
                        y0, x0 = (my * cv + v) * 8, (mx * ch + u) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        preds[ci] = _encode_block(bw, block, qnat, preds[ci], dc_codes, ac_codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray(pixels: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    return encode_jpeg(pixels, quant=quant)


def synthesize_jpeg_bytes(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic grayscale baseline JPEG: 8x8 block j (row-major)
    is the constant value ((j*41 + doc_id) % 256). With the all-ones
    quant table each block is DC-only, so the decode is EXACT and the
    image mean is an SQL-computable function of doc_id (every block
    contributes its value with equal weight)."""
    if width % 8 or height % 8:
        raise ValueError("width/height must be multiples of 8")
    bw_, bh_ = width // 8, height // 8
    vals = (np.arange(bw_ * bh_, dtype=np.int64) * 41 + doc_id) % 256
    px = np.repeat(np.repeat(vals.reshape(bh_, bw_), 8, axis=0), 8, axis=1)
    return encode_jpeg_gray(px.astype(np.uint8))


def _parse_dht(body: bytes, tables: dict) -> None:
    pos = 0
    while pos < len(body):
        tc_th = body[pos]
        bits = list(body[pos + 1 : pos + 17])
        n = sum(bits)
        vals = list(body[pos + 17 : pos + 17 + n])
        tables[(tc_th >> 4, tc_th & 0xF)] = _decode_table(bits, vals)
        pos += 17 + n


def _parse_dqt(body: bytes, tables: dict) -> None:
    pos = 0
    while pos < len(body):
        pq_tq = body[pos]
        if pq_tq >> 4:  # 16-bit table
            q = np.frombuffer(body, dtype=">u2", count=64, offset=pos + 1).astype(np.int64)
            pos += 1 + 128
        else:
            q = np.frombuffer(body, dtype=np.uint8, count=64, offset=pos + 1).astype(np.int64)
            pos += 1 + 64
        nat = np.zeros(64, dtype=np.int64)
        nat[ZIGZAG] = q
        tables[pq_tq & 0xF] = nat.reshape(8, 8)


def decode_jpeg(payload: bytes):
    """Baseline JPEG decode, pure numpy + Python Huffman walk.

    Returns (width, height, mean) where mean is over all output
    channels (RGB for color, Y for grayscale), rounded to 4 — the
    same contract as the PPM/BMP decoders in multimodal.py."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    huff: dict = {}
    quant: dict = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        while payload[pos + 1] == 0xFF:  # fill bytes before a marker
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xC4:
            _parse_dht(body, huff)
        elif marker == 0xDB:
            _parse_dqt(body, quant)
        elif marker == 0xC0 or marker == 0xC1:
            precision, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG mode (SOF{marker - 0xC0})")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            byid = {c["id"]: c for c in frame[2]}
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                c = byid[cs]
                scan.append({**c, "dc": tdta >> 4, "ac": tdta & 0xF})
            return _decode_scan(payload, pos, frame, scan, huff, quant, restart_interval)
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, frame, scan, huff, quant, restart_interval):
    w, h, _ = frame
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in scan:
        cw, ch = mcux * c["h"] * 8, mcuy * c["v"] * 8
        planes.append(np.zeros((ch, cw), dtype=np.float64))
    br = _BitReader(payload, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                preds = [0] * len(scan)
            mcu_count += 1
            for ci, c in enumerate(scan):
                qtab = quant[c["tq"]]
                dc_tab, ac_tab = huff[(0, c["dc"])], huff[(1, c["ac"])]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = br.decode_symbol(dc_tab)
                        if t > 15:
                            # magnitude categories are <= 11 in 8-bit
                            # baseline; a corrupt Huffman table would
                            # otherwise ask for a 200-bit DC diff and
                            # overflow the int64 coefficient block
                            raise ValueError("corrupt JPEG: DC category out of range")
                        preds[ci] += _extend(br.read(t), t)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[ZIGZAG] = zz
                        block = _C.T @ (coeffs.reshape(8, 8) * qtab) @ _C
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + u) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # crop to component resolution, upsample to full size, color-convert
    full = []
    for ci, c in enumerate(scan):
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        p = planes[ci][:ch, :cw] + 128.0
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255)
        return w, h, round(float(out.mean()), 4)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.round(np.stack([r, g, b])), 0, 255)
    return w, h, round(float(rgb.mean()), 4)
