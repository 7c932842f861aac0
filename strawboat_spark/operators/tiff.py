"""Pure-python/numpy TIFF codec (TIFF 6.0, the public Adobe/Aldus
spec). Lossless like PNG/GIF/FLAC, so synthesized images roundtrip
bit-exact and the `multimodal_tiff_decode` oracle is analytic.

Decode scope: both byte orders (II/MM), baseline IFD tags, strip
organization (any RowsPerStrip), 8-bit grayscale / RGB / palette,
compressions 1 (none), 32773 (PackBits) and 5 (LZW — the TIFF
variant: MSB-first bit packing and the "early change" schedule, which
grows the code width ONE CODE EARLIER than GIF's LZW; see
operators/gif.py for the GIF variant), and predictor 2 (horizontal
differencing, undone with a row cumsum). Tiles, 16-bit, and planar
configuration 2 raise.

No counterpart in the reference (a columnar storage format); this
supports the multimodal-column treatment of SURVEY.md §2C ⊕.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-LZW compress (MSB-first, early-change width schedule)."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9
    nxt = 258  # 256=Clear, 257=EOI

    def emit(code: int) -> None:
        nonlocal acc, nbits, width
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        # early change: the width grows when the next assignable code
        # is the LAST expressible one (GIF waits until it overflows)
        if nxt >= (1 << width) - 1 and width < 12:
            width += 1

    table: dict[bytes, int] = {}
    emit(256)
    w = b""
    for k in data:
        wk = w + bytes((k,))
        if wk in table or len(wk) == 1:
            w = wk
            continue
        emit(table[w] if len(w) > 1 else w[0])
        if nxt >= _MAX_CODE - 2:
            emit(256)
            table.clear()
            width = 9
            nxt = 258
        else:
            table[wk] = nxt
            nxt += 1
        w = bytes((k,))
    if w:
        emit(table[w] if len(w) > 1 else w[0])
    emit(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_lzw_decode(data: bytes, n_bytes: int) -> bytes:
    """Decompress a TIFF-LZW strip to exactly n_bytes."""
    width = 9
    prefix = np.full(_MAX_CODE, -1, dtype=np.int32)
    suffix = np.zeros(_MAX_CODE, dtype=np.uint8)
    suffix[:256] = np.arange(256, dtype=np.uint8)
    first = np.zeros(_MAX_CODE, dtype=np.uint8)
    first[:256] = np.arange(256, dtype=np.uint8)

    out = np.empty(n_bytes, dtype=np.uint8)
    n_out = 0
    hi = 258  # next table slot (TIFF tables start AT 258, no dead slot)
    last = -1
    acc = 0
    nbits = 0
    pos = 0
    scratch = np.empty(_MAX_CODE, dtype=np.uint8)

    while n_out < n_bytes:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF-LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width

        if code == 256:
            width = 9
            hi = 258
            last = -1
            continue
        if code == 257:
            break
        if code > hi or (code == hi and last == -1):
            raise ValueError(f"corrupt TIFF-LZW stream (code {code}, hi {hi})")

        if code == hi:
            cur, extra = last, int(first[last])
        else:
            cur, extra = code, -1
        n = 0
        c = cur
        while c >= 0:
            scratch[n] = suffix[c]
            c = prefix[c]
            n += 1
        entry_len = n + (1 if extra >= 0 else 0)
        if n_out + entry_len > n_bytes:
            raise ValueError("TIFF-LZW stream decodes past the strip size")
        out[n_out : n_out + n] = scratch[:n][::-1]
        if extra >= 0:
            out[n_out + n] = extra
        n_out += entry_len

        if last >= 0 and hi < _MAX_CODE:
            prefix[hi] = last
            suffix[hi] = out[n_out - entry_len]
            first[hi] = first[last]
            hi += 1
        # early change: mirror the encoder — widen while the NEXT
        # assignable slot is the last 9/10/11-bit code
        if hi >= (1 << width) - 1 and width < 12:
            width += 1
        last = code
    return out.tobytes()


def _packbits_decode(data: bytes, n_bytes: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < n_bytes and pos < len(data):
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            out += bytes((data[pos],)) * (257 - n)
            pos += 1
        # 128 = noop
    if len(out) < n_bytes:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:n_bytes])


def _packbits_encode(data: bytes) -> bytes:
    """Simple literal-run PackBits (runs >= 3 compressed)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes((257 - run, data[i]))
            i += run
            continue
        # literal chunk: extend until a >=3 run starts or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        chunk = data[i:j]
        out += bytes((len(chunk) - 1,)) + chunk
        i = j
    return bytes(out)


# tag ids
_W, _H, _BITS, _COMP, _PHOTO, _STRIPOFF, _SPP, _RPS, _STRIPCNT, _PRED, _CMAP = (
    256, 257, 258, 259, 262, 273, 277, 278, 279, 317, 320,
)


def encode_tiff(
    pixels: np.ndarray,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """Little-endian TIFF writer for uint8 (h, w) gray or (h, w, 3) RGB.
    compression: 1 none, 5 LZW, 32773 PackBits; predictor 2 = horizontal
    differencing (LZW only, per spec usage)."""
    if pixels.ndim == 2:
        spp, photo = 1, 1
    elif pixels.shape[2] == 3:
        spp, photo = 3, 2
    else:
        raise ValueError("gray or RGB only")
    h, w = pixels.shape[:2]
    rps = rows_per_strip or h
    raw = pixels.reshape(h, w * spp)
    if predictor == 2:
        p = raw.reshape(h, w, spp).astype(np.int16)
        diff = p.copy()
        diff[:, 1:, :] = (p[:, 1:, :] - p[:, :-1, :]) % 256
        raw = diff.astype(np.uint8).reshape(h, w * spp)
    strips = []
    for y0 in range(0, h, rps):
        chunk = raw[y0 : y0 + rps].tobytes()
        if compression == 5:
            chunk = _tiff_lzw_encode(chunk)
        elif compression == 32773:
            chunk = _packbits_encode(chunk)
        elif compression != 1:
            raise ValueError(f"unsupported compression {compression}")
        strips.append(chunk)

    entries = []  # (tag, type, count, value_or_bytes)
    def short(tag, v):
        entries.append((tag, 3, 1, struct.pack("<HH", v, 0)))
    def long_(tag, v):
        entries.append((tag, 4, 1, struct.pack("<I", v)))

    header = b"II" + struct.pack("<HI", 42, 8)
    # base: W, H, BITS, COMP, PHOTO, STRIPOFF, RPS, STRIPCNT
    n_entries = 8 + (1 if predictor == 2 else 0) + (1 if spp == 3 else 0)
    ifd_size = 2 + n_entries * 12 + 4
    data_pos = 8 + ifd_size
    # bits-per-sample array for RGB lives out-of-line
    bits_extra = b""
    if spp == 3:
        bits_off = data_pos
        bits_extra = struct.pack("<HHH", 8, 8, 8)
        data_pos += 6
    off_pos = data_pos
    offsets, counts = [], []
    for sdata in strips:
        offsets.append(off_pos)
        counts.append(len(sdata))
        off_pos += len(sdata)
    # strip offset/count arrays (out-of-line when >1 strip)
    arrays = b""
    if len(strips) > 1:
        stripoff_off = off_pos
        arrays += b"".join(struct.pack("<I", o) for o in offsets)
        stripcnt_off = off_pos + 4 * len(strips)
        arrays += b"".join(struct.pack("<I", c) for c in counts)

    short(_W, w)
    short(_H, h)
    if spp == 3:
        entries.append((_BITS, 3, 3, struct.pack("<I", bits_off)))
    else:
        short(_BITS, 8)
    short(_COMP, compression)
    short(_PHOTO, photo)
    if len(strips) > 1:
        entries.append((_STRIPOFF, 4, len(strips), struct.pack("<I", stripoff_off)))
    else:
        long_(_STRIPOFF, offsets[0])
    if spp == 3:
        short(_SPP, 3)
    short(_RPS, rps)
    if len(strips) > 1:
        entries.append((_STRIPCNT, 4, len(strips), struct.pack("<I", stripcnt_off)))
    else:
        long_(_STRIPCNT, counts[0])
    if predictor == 2:
        short(_PRED, 2)
    entries.sort(key=lambda t: t[0])
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHI", tag, typ, cnt) + val.ljust(4, b"\x00")[:4]
    ifd += struct.pack("<I", 0)
    return header + ifd + bits_extra + b"".join(strips) + arrays


def _read_ifd_value(payload: bytes, bo: str, typ: int, cnt: int, raw: bytes):
    size = {1: 1, 3: 2, 4: 4}.get(typ)
    if size is None:
        return None
    total = size * cnt
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        buf = payload[off : off + total]
    fmt = {1: "B", 3: "H", 4: "I"}[typ]
    return list(struct.unpack(bo + fmt * cnt, buf))


def decode_tiff_pixels(payload: bytes) -> np.ndarray:
    """Decode the first IFD to (h, w) gray or (h, w, 3) RGB uint8."""
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload (bad byte order mark)")
    magic, ifd_off = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise ValueError("not a TIFF payload (bad magic)")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, base)
        v = _read_ifd_value(payload, bo, typ, cnt, payload[base + 8 : base + 12])
        if v is not None:
            tags[tag] = v
    w, h = tags[_W][0], tags[_H][0]
    comp = tags.get(_COMP, [1])[0]
    photo = tags.get(_PHOTO, [1])[0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])
    pred = tags.get(_PRED, [1])[0]
    if any(b != 8 for b in bits):
        raise ValueError("only 8-bit samples supported")
    rps = tags.get(_RPS, [h])[0]
    offsets = tags[_STRIPOFF]
    counts = tags[_STRIPCNT]
    row_bytes = w * spp
    raw = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - i * rps)
        expect = rows * row_bytes
        strip = payload[off : off + cnt]
        if comp == 1:
            chunk = bytes(strip[:expect])
        elif comp == 5:
            chunk = _tiff_lzw_decode(strip, expect)
        elif comp == 32773:
            chunk = _packbits_decode(strip, expect)
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
        raw += chunk
    px = np.frombuffer(bytes(raw), dtype=np.uint8, count=h * row_bytes).reshape(
        h, w, spp
    )
    if pred == 2:
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    if photo == 3:
        cmap = tags.get(_CMAP)
        if cmap is None:
            raise ValueError("palette TIFF without ColorMap")
        n = len(cmap) // 3
        # TIFF colormaps are 16-bit; fold to 8
        table = (np.array(cmap, dtype=np.uint16).reshape(3, n).T >> 8).astype(np.uint8)
        px = table[px[:, :, 0]]
        return px
    if photo == 0:  # white-is-zero gray
        px = 255 - px
    return px[:, :, 0] if spp == 1 else px


def decode_tiff(payload: bytes):
    """Returns (width, height, mean) — the multimodal decoder contract."""
    px = decode_tiff_pixels(payload)
    h, w = px.shape[:2]
    return w, h, round(float(px.astype(np.float64).mean()), 4)


def synthesize_tiff_bytes(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic grayscale LZW+predictor TIFF: pixel i (row-major)
    is ((i*31 + doc_id) % 256). Lossless, so the decoded mean is the
    analytic mean — the multimodal_tiff_decode oracle."""
    px = ((np.arange(width * height, dtype=np.int64) * 31 + doc_id) % 256).astype(
        np.uint8
    )
    return encode_tiff(
        px.reshape(height, width), compression=5, predictor=2,
        rows_per_strip=max(1, height // 2),
    )
