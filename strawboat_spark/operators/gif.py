"""Pure-python/numpy GIF codec (GIF87a/89a, the public CompuServe spec
plus the variable-width LZW scheme it mandates). Like the PNG/FLAC
decoders this is LOSSLESS, so synthesized images roundtrip bit-exact
and the `multimodal_gif_decode` oracle is a plain analytic formula.

Decode scope: global and local color tables, interlaced and
non-interlaced frames, 89a extension blocks (skipped), transparency
ignored (the palette color is used). Animated GIFs: the FIRST image
descriptor is decoded; later frames are ignored — a frame-sampling
treatment would explode them the way decode_y4m_frames does.

The LZW streams use the canonical code-width schedule (widths grow
when the next free code crosses a power of two, capped at 12 bits;
encoder emits CLEAR when the table fills), mirroring giflib/Go
`compress/lzw` timing — the encoder bumps the width DURING the emit
of the code that makes the next-free pointer reach 1<<width, the
decoder after READING it, which is the same bit position in the
stream. Property tests roundtrip random images large enough to force
both the width growth and the 4096-entry CLEAR reset.

No counterpart in the reference (a columnar storage format); this
supports the multimodal-column treatment of SURVEY.md §2C ⊕.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21
_MAX_CODE = 4096  # 12-bit cap, per spec


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes)
# --------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-LZW compress a flat uint8 index array."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    width = min_code_size + 1
    nxt = eoi + 1  # next code to assign

    def emit(code: int) -> None:
        # giflib timing: the width check runs as part of emitting, AFTER
        # the bits are written, using the CURRENT next-free pointer.
        nonlocal acc, nbits, width
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if nxt >= (1 << width) and width < 12:
            width += 1

    table: dict[bytes, int] = {}
    emit(clear)
    w = b""
    for k in indices.tobytes():
        wk = w + bytes((k,))
        if wk in table or len(wk) == 1:
            w = wk
            continue
        emit(table[w] if len(w) > 1 else w[0])
        if nxt >= _MAX_CODE:
            emit(clear)
            table.clear()
            width = min_code_size + 1
            nxt = eoi + 1
        else:
            table[wk] = nxt
            nxt += 1
        w = bytes((k,))
    if w:
        emit(table[w] if len(w) > 1 else w[0])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Decompress a GIF-LZW stream to exactly n_pixels uint8 indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # prefix chain per code; roots have prefix -1
    prefix = np.full(_MAX_CODE, -1, dtype=np.int32)
    suffix = np.zeros(_MAX_CODE, dtype=np.uint8)
    suffix[:clear] = np.arange(clear, dtype=np.uint8)
    first = np.zeros(_MAX_CODE, dtype=np.uint8)  # first byte of each string
    first[:clear] = np.arange(clear, dtype=np.uint8)

    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # `hi` is the slot the NEXT table entry lands in (Go compress/lzw
    # convention: store at hi, then hi++ — it also advances on the
    # storeless first code after a clear, so it starts at eoi and the
    # first stored entry lands at eoi+1).
    hi = eoi
    last = -1
    acc = 0
    nbits = 0
    pos = 0
    scratch = np.empty(_MAX_CODE, dtype=np.uint8)

    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            width = min_code_size + 1
            hi = eoi
            last = -1
            continue
        if code == eoi:
            break
        if code > hi or (code == hi and last == -1):
            raise ValueError(f"corrupt LZW stream (code {code}, hi {hi})")

        if code == hi:
            # KwKwK: the code being defined right now —
            # string = string(last) + first(last)
            cur = last
            extra = int(first[last])
        else:
            cur = code
            extra = -1
        # materialize the string for `cur` by walking the prefix chain
        n = 0
        c = cur
        while c >= 0:
            scratch[n] = suffix[c]
            c = prefix[c]
            n += 1
        entry_len = n + (1 if extra >= 0 else 0)
        if n_out + entry_len > n_pixels:
            raise ValueError("LZW stream decodes past the pixel count")
        out[n_out : n_out + n] = scratch[:n][::-1]
        if extra >= 0:
            out[n_out + n] = extra
        n_out += entry_len

        if last >= 0 and hi < _MAX_CODE:
            prefix[hi] = last
            suffix[hi] = out[n_out - entry_len]
            first[hi] = first[last]
        hi += 1
        if hi >= (1 << width) and width < 12:
            width += 1
        last = code
    return out


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return np.asarray(order, dtype=np.int64)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    out = np.empty_like(rows)
    out[_interlace_order(rows.shape[0])] = rows
    return out


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """GIF89a encoder: (h, w) uint8 palette indices + (n, 3) uint8
    palette (n a power of two, >= 2). Single frame, global color table."""
    h, w = indices.shape
    n = palette.shape[0]
    size_bits = max(1, (n - 1).bit_length())
    if n != 1 << size_bits or n < 2:
        raise ValueError("palette length must be a power of two >= 2")
    mcs = max(2, size_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes((0x80 | ((size_bits - 1) << 4) | (size_bits - 1), 0, 0))
    out += palette.astype(np.uint8).tobytes()
    rows = indices
    if interlace:
        rows = indices[_interlace_order(h)]
    out += bytes((_IMAGE_SEP,))
    out += struct.pack("<HHHH", 0, 0, w, h)
    out += bytes((0x40 if interlace else 0,))
    out += bytes((mcs,))
    lzw = _lzw_encode(rows.reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out += bytes((len(block),)) + block
    out += bytes((0, _TRAILER))
    return bytes(out)


def decode_gif_pixels(payload: bytes) -> np.ndarray:
    """Decode the first frame to an (h, w, 3) uint8 RGB array."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = (
            np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
            .reshape(n, 3)
            .copy()
        )
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            pos += 1  # label
            while payload[pos]:  # sub-blocks until a zero terminator
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != _IMAGE_SEP:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", payload, pos)
        pos += 8
        if (left, top) != (0, 0) or (w, h) != (sw, sh):
            # compositing a sub-rectangle frame onto the logical-screen
            # canvas is out of scope, like the other declared variants —
            # raise rather than return a frame with wrong dimensions
            raise ValueError(
                f"GIF frame at ({left},{top}) size {w}x{h} does not cover "
                f"the {sw}x{sh} logical screen (compositing unsupported)"
            )
        ipacked = payload[pos]
        pos += 1
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = (
                np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
                .reshape(n, 3)
                .copy()
            )
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any color table")
        mcs = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos]:
            ln = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(lzw), mcs, w * h).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        return pal[idx]
    raise ValueError("GIF contains no image descriptor")


def decode_gif(payload: bytes):
    """Returns (width, height, mean) over the decoded RGB samples,
    rounded to 4 — the multimodal decoder contract (see decode_png)."""
    px = decode_gif_pixels(payload)
    h, w = px.shape[:2]
    return w, h, round(float(px.astype(np.float64).mean()), 4)


def synthesize_gif_bytes(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic 256-gray-palette GIF: pixel i (row-major) is
    ((i*29 + doc_id) % 256). GIF is lossless, so the decoded mean is
    exactly the analytic mean — the multimodal_gif_decode oracle."""
    px = ((np.arange(width * height, dtype=np.int64) * 29 + doc_id) % 256).astype(
        np.uint8
    )
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
    return encode_gif(px.reshape(height, width), pal)
