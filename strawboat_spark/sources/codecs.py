"""Adaptive per-page compression codecs.

Re-expresses the reference's compression module (strawboat
`src/compression/` — codec ids at `src/compression/mod.rs:36-108`,
chooser at `src/compression/integer/mod.rs:231-308`) as vectorized
numpy kernels. NOT a translation: the reference is scalar Rust over
raw buffers; here every encode/decode is a whole-page numpy operation
so the Python data-source path stays Arrow-batch-speed.

Codec ids are kept identical to the reference so `stat()` output is
comparable:
  None=0 Lz4=1 Zstd=2 Snappy=3
  Rle=10 Dict=11 OneValue=12 Freq=13 Bitpacking=14 DeltaBitpacking=15

Payload layouts are this implementation's own (documented per codec).
Every page is self-describing: header = codec(1B) | compressed_size
(4B LE) | uncompressed_size(4B LE), then the payload — readers never
need the writer's choice out-of-band (reference parity:
`src/read/read_basic.rs:181-189`).

Selection (the btrblocks idea, reference `choose_compressor`): collect
page stats once, compute an *analytic* size estimate per eligible
specialized codec, trial-compress a sample for the general codec, pick
the best ratio above a threshold, else fall back to the general codec.
Env forcing for tests mirrors `src/util/env.rs`:
STRAWBOAT_{ONEVALUE,RLE,DICT,FREQ,BITPACK,DELTABP}_COMPRESSION=1.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from enum import IntEnum

import numpy as np
import pyarrow as pa


class Codec(IntEnum):
    NONE = 0
    LZ4 = 1
    ZSTD = 2
    SNAPPY = 3
    RLE = 10
    DICT = 11
    ONE_VALUE = 12
    FREQ = 13
    BITPACKING = 14
    DELTA_BITPACKING = 15
    PATAS = 16
    PATAS_PACKED = 17


_ARROW_CODEC_NAMES = {Codec.LZ4: "lz4", Codec.ZSTD: "zstd", Codec.SNAPPY: "snappy"}

HEADER_FMT = "<BII"  # codec, compressed_size, uncompressed_size
HEADER_SIZE = struct.calcsize(HEADER_FMT)

DEFAULT_COMPRESS_RATIO = 2.0  # reference: default_compress_ratio
SAMPLE_BYTES = 64 * 1024

_FORCE_ENV = {
    Codec.ONE_VALUE: "STRAWBOAT_ONEVALUE_COMPRESSION",
    Codec.RLE: "STRAWBOAT_RLE_COMPRESSION",
    Codec.DICT: "STRAWBOAT_DICT_COMPRESSION",
    Codec.FREQ: "STRAWBOAT_FREQ_COMPRESSION",
    Codec.BITPACKING: "STRAWBOAT_BITPACK_COMPRESSION",
    Codec.DELTA_BITPACKING: "STRAWBOAT_DELTABP_COMPRESSION",
    Codec.PATAS: "STRAWBOAT_PATAS_COMPRESSION",
    Codec.PATAS_PACKED: "STRAWBOAT_PATAS_PACKED_COMPRESSION",
}


def _forced(memo: dict | None = None) -> list[Codec]:
    """Codecs forced via env. The 8 environ lookups cost real time at
    one-call-per-candidate-per-page scale, so writers snapshot the
    result once into each per-leaf memo dict ("forced" key) and the
    hot path reads that; standalone calls (no memo) stay live."""
    if memo is not None and "forced" in memo:
        return memo["forced"]
    return [c for c, env in _FORCE_ENV.items() if os.environ.get(env) == "1"]


# --------------------------------------------------------------------------
# Page stats (reference: IntegerStats/DoubleStats/... §2B)
# --------------------------------------------------------------------------


@dataclass
class PageStats:
    count: int
    null_count: int
    unique_count: int
    run_count: int
    is_sorted: bool
    min_val: object
    max_val: object
    top_count: int  # occurrences of the most frequent value
    top_val: object
    # Exact-path byproducts (sorted uniques + counts + dict codes),
    # kept so the Dict/Freq encoders reuse them instead of re-sorting
    # the page.
    uniques: object = None
    counts: object = None
    codes: object = None


def collect_stats(values: np.ndarray, null_count: int = 0) -> PageStats:
    """Whole-page stats, vectorized. min/max/runs/sortedness are exact
    O(n) passes; uniqueness uses btrblocks-style sampling — the full
    O(n log n) unique sort only runs when a 1024-value sample already
    looks dictionary-eligible (sample uniques < 1/3 of sample), so
    high-entropy pages never pay for it. unique_count<=1 (the OneValue
    gate, which truncates data if wrong) is only ever produced by the
    exact path."""
    n = len(values)
    if n == 0:
        return PageStats(0, null_count, 0, 0, True, None, None, 0, None)

    exact = n <= 2048
    if not exact:
        sample = values[:: max(1, n // 1024)]
        su, sc = np.unique(sample, return_counts=True)
        m = len(sample)
        exact = len(su) * 3 < m  # low-card by sample → exact pass pays off

    uniques = counts = codes = None
    if exact:
        # return_inverse rides along (argsort instead of sort): exact
        # pages are precisely the Dict candidates, and the inverse IS
        # the Dict code stream — computing it here saves the encoder
        # a second full pass.
        uniques, codes, counts = np.unique(
            values, return_inverse=True, return_counts=True
        )
        top_i = int(np.argmax(counts))
        unique_count = len(uniques)
        top_count = int(counts[top_i])
        top_val = uniques[top_i]
    else:
        # high-entropy page: scale the sample (Dict/OneValue/Freq all
        # become ineligible at these ratios, which is the point)
        ti = int(np.argmax(sc))
        unique_count = min(n, len(su) * max(1, n // m))
        top_count = min(n, int(sc[ti]) * max(1, n // m))
        top_val = su[ti]

    changes = int(np.count_nonzero(values[1:] != values[:-1])) + 1 if n > 1 else 1
    is_sorted = bool(np.all(values[1:] >= values[:-1])) if n > 1 else True
    return PageStats(
        count=n,
        null_count=null_count,
        unique_count=unique_count,
        run_count=changes,
        is_sorted=is_sorted,
        min_val=values.min() if uniques is None else uniques[0],
        max_val=values.max() if uniques is None else uniques[-1],
        top_count=top_count,
        top_val=top_val,
        uniques=uniques,
        counts=counts,
        codes=codes,
    )


# --------------------------------------------------------------------------
# General (basic) block codecs — pyarrow's lz4/zstd/snappy
# --------------------------------------------------------------------------


_CODEC_CACHE: dict[Codec, "pa.Codec"] = {}


def _arrow_codec(codec: Codec) -> "pa.Codec":
    # pa.Codec construction costs ~0.2ms; cache per process (hot path:
    # multiple calls per page).
    c = _CODEC_CACHE.get(codec)
    if c is None:
        c = _CODEC_CACHE[codec] = pa.Codec(_ARROW_CODEC_NAMES[codec])
    return c


def _basic_compress(codec: Codec, raw: bytes) -> bytes:
    if codec == Codec.NONE:
        return raw
    return _arrow_codec(codec).compress(raw, asbytes=True)


def _basic_decompress(codec: Codec, payload: bytes, uncompressed_size: int) -> bytes:
    if codec == Codec.NONE:
        return payload
    return _arrow_codec(codec).decompress(payload, uncompressed_size, asbytes=True)


def write_block(out: bytearray, codec: Codec, payload: bytes, uncompressed_size: int) -> None:
    out += struct.pack(HEADER_FMT, int(codec), len(payload), uncompressed_size)
    out += payload


def read_block(buf: memoryview, pos: int) -> tuple[Codec, memoryview, int, int]:
    """-> (codec, payload, uncompressed_size, next_pos)"""
    codec, csize, usize = struct.unpack_from(HEADER_FMT, buf, pos)
    start = pos + HEADER_SIZE
    return Codec(codec), buf[start : start + csize], usize, start + csize


# --------------------------------------------------------------------------
# Bit packing kernels (vectorized; payload: u8 width | packed bits)
# --------------------------------------------------------------------------


def _bits_needed(max_val: int) -> int:
    return max(1, int(max_val).bit_length())


_BIT_IDX_CACHE: dict[int, np.ndarray] = {}


def _bit_idx(width: int) -> np.ndarray:
    a = _BIT_IDX_CACHE.get(width)
    if a is None:
        a = _BIT_IDX_CACHE[width] = np.arange(width, dtype=np.uint64)
    return a


def _as_u64(values: np.ndarray) -> np.ndarray:
    # Values are non-negative by every caller's contract, so an i64
    # page reinterprets as u64 for free; other dtypes pay the cast.
    if values.dtype == np.int64:
        return values.view(np.uint64)
    if values.dtype == np.uint64:
        return values
    return values.astype(np.uint64)


def _pack_bits(values: np.ndarray, width: int) -> bytes:
    """LSB-first bit-pack of non-negative int64 values at fixed width."""
    n = len(values)
    if n == 0:
        return b""
    if width in (8, 16, 32):
        # Byte-aligned narrow widths: packing is a narrowing cast.
        return values.astype(f"<u{width >> 3}").tobytes()
    # Merge-rounds fast path: pick the smallest group size k (2/4/8)
    # whose packed group is byte-aligned (k*width % 8 == 0) and fits in
    # at most 64+56 bits; log2(k) shift-or rounds collapse k neighbors
    # into one (or two) u64 words whose low k*width/8 bytes ARE the
    # LSB-first stream. ~3 whole-array ops instead of 8 strided lane
    # ORs — covers every width < 16 plus even widths to 30.
    for k in (8, 4, 2):  # bigger groups amortize better (measured ~2x)
        gbits = k * width
        if gbits % 8 == 0 and gbits <= 120 and (k >> 1) * width <= 60:
            ng = n // k
            out = bytearray()
            if ng:
                a = _as_u64(values[: ng * k])
                cb, g = width, 1
                while g * 2 <= k and 2 * cb <= 64:
                    a = a[0::2] | (a[1::2] << np.uint64(cb))
                    cb, g = cb * 2, g * 2
                gbytes = gbits >> 3
                if g < k:  # final merge overflows u64: lo/hi split
                    lo = a[0::2] | (a[1::2] << np.uint64(cb))
                    hi = a[1::2] >> np.uint64(64 - cb)
                    block = np.empty((ng, gbytes), dtype=np.uint8)
                    block[:, :8] = lo.view(np.uint8).reshape(ng, 8)
                    block[:, 8:] = hi.view(np.uint8).reshape(ng, 8)[:, : gbytes - 8]
                else:
                    block = (
                        np.ascontiguousarray(a)
                        .view(np.uint8)
                        .reshape(ng, 8)[:, :gbytes]
                    )
                out += block.tobytes()
            tail = values[ng * k :]
            if len(tail):
                acc, pos = 0, 0
                for t in tail.tolist():
                    acc |= int(t) << pos
                    pos += width
                out += acc.to_bytes((pos + 7) >> 3, "little")
            return bytes(out)
    if width <= 57:
        # Lane encode (mirror of _unpack_bits): 8 values span exactly
        # `width` bytes; lane j ORs its shifted u64 little-endian bytes
        # at a fixed offset — 8 vector ops, no (n, width) bit matrix.
        # width<=56 so value<<shift(<=7) stays within 64 bits.
        nb = n >> 3
        out = bytearray()
        if nb:
            vals = _as_u64(values[: nb * 8]).reshape(nb, 8)
            block = np.zeros((nb, width + 8), dtype=np.uint8)
            tmp = np.empty(nb, dtype=np.uint64)  # reused shift buffer
            for j in range(8):
                b0, sh = (j * width) >> 3, np.uint64((j * width) & 7)
                np.left_shift(vals[:, j], sh, out=tmp)
                block[:, b0 : b0 + 8] |= tmp.view(np.uint8).reshape(nb, 8)
            out += block[:, :width].tobytes()
        tail = values[nb * 8 :]
        if len(tail):
            # <=7 values: accumulate into one Python int — cheaper than
            # building a bit matrix and round-tripping packbits.
            acc, pos = 0, 0
            for v in tail.tolist():
                acc |= int(v) << pos
                pos += width
            out += acc.to_bytes((pos + 7) >> 3, "little")
        return bytes(out)
    bit_idx = _bit_idx(width)
    # (n, width) matrix of bits, flattened LSB-first, then packbits.
    bits = ((_as_u64(values)[:, None] >> bit_idx) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(n * width), bitorder="little").tobytes()


def _block_widths(values: np.ndarray) -> np.ndarray:
    """Per-128-value-block bit widths (reference BitPacker4x semantics,
    src/compression/integer/bp.rs:36-101): one outlier no longer
    inflates the whole page."""
    n = len(values)
    nb = (n + 127) >> 7
    padded = (
        values
        if n == nb * 128
        else np.concatenate([values, np.zeros(nb * 128 - n, dtype=values.dtype)])
    )
    maxes = padded.reshape(nb, 128).max(axis=1)
    return np.array(
        [max(1, int(m).bit_length()) for m in maxes.tolist()], dtype=np.uint8
    )


def _pack_bits_blocked(values: np.ndarray, widths: np.ndarray) -> bytes:
    """u32 n_blocks | u8 widths[n_blocks] | packed runs. Blocks sharing
    a width are packed in one vector call (runs, not per-block loops)."""
    n = len(values)
    nb = len(widths)
    out = bytearray(struct.pack("<I", nb))
    out += widths.tobytes()
    b = 0
    while b < nb:
        e = b + 1
        while e < nb and widths[e] == widths[b]:
            e += 1
        lo, hi = b * 128, min(e * 128, n)
        out += _pack_bits(values[lo:hi], int(widths[b]))
        b = e
    return bytes(out)


def _unpack_bits_blocked(payload: memoryview, n: int) -> np.ndarray:
    (nb,) = struct.unpack_from("<I", payload, 0)
    widths = np.frombuffer(payload, dtype=np.uint8, count=nb, offset=4)
    out = np.empty(n, dtype=np.int64)
    pos = 4 + nb
    b = 0
    while b < nb:
        e = b + 1
        while e < nb and widths[e] == widths[b]:
            e += 1
        lo, hi = b * 128, min(e * 128, n)
        cnt = hi - lo
        w = int(widths[b])
        nbytes = (cnt * w + 7) >> 3
        out[lo:hi] = _unpack_bits(payload[pos : pos + nbytes], cnt, w)
        pos += nbytes
        b = e
    return out


def _unpack_bits(data: bytes, n: int, width: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if width <= 57:
        # Fast path: 8 consecutive values span exactly `width` bytes, so
        # lane j of every 8-value block sits at a FIXED byte offset and
        # bit shift within its block. Eight strided unaligned u64 loads
        # (np.ndarray with byte strides — zero copies) + shifts decode
        # the whole page — no per-value gather, no bit matrix.
        # Valid while shift(<=7) + width fits in 64 bits, i.e. width<=57.
        arr = np.frombuffer(data, dtype=np.uint8)
        mask = np.uint64((1 << width) - 1)
        if width & 7 == 0:
            # Byte-aligned width: every value starts on a byte boundary,
            # so decode is a view (1/2/4-byte) or ONE strided load.
            wb = width >> 3
            if wb in (1, 2, 4):
                return arr[: n * wb].view(f"<u{wb}").astype(np.int64)
            pad = np.empty(n * wb + 8, np.uint8)
            pad[: n * wb] = arr[: n * wb]
            v = np.ndarray((n,), dtype="<u8", buffer=pad.data, strides=(wb,))
            return (v & mask).astype(np.int64)
        out = np.empty(n, dtype=np.uint64)
        nb = n >> 3
        if nb:
            pad = np.empty(nb * width + 8, dtype=np.uint8)
            pad[: nb * width] = arr[: nb * width]
            lanes = out[: nb * 8].reshape(nb, 8)
            for j in range(8):
                b0, sh = (j * width) >> 3, np.uint64((j * width) & 7)
                v = np.ndarray((nb,), dtype="<u8", buffer=pad.data, offset=b0, strides=(width,))
                lanes[:, j] = (v >> sh) & mask
        tail = n - nb * 8
        if tail:
            a = np.concatenate([arr[nb * width :], np.zeros(8, dtype=np.uint8)])
            bitpos = np.arange(tail, dtype=np.int64) * width
            g = np.ascontiguousarray(a[(bitpos >> 3)[:, None] + np.arange(8)])
            out[nb * 8 :] = (
                g.view(np.uint64).ravel() >> (bitpos & 7).astype(np.uint64)
            ) & mask
        return out.astype(np.int64)
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), count=n * width, bitorder="little"
    )
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64)).astype(np.uint64)
    return (bits.reshape(n, width).astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64
    ).astype(np.int64)


# --------------------------------------------------------------------------
# Integer family (ints, dates, timestamps — any numpy integer dtype)
# --------------------------------------------------------------------------


def compress_integer(
    values: np.ndarray,
    default_codec: Codec = Codec.ZSTD,
    forbidden: frozenset[Codec] = frozenset(),
    stats: PageStats | None = None,
    ratio: float | None = None,
    memo: dict | None = None,
    stats_out: dict | None = None,
) -> bytes:
    """Encode one page of integers; returns header+payload bytes.
    stats_out, when given, receives {"unique_count": page NDV estimate}
    (exact for low-cardinality pages, sampled otherwise) — the write
    path aggregates it into the footer's per-leaf NDV."""
    out = bytearray()
    _compress_integer_into(
        out, values, default_codec, forbidden, stats, ratio, memo, stats_out
    )
    return bytes(out)


def _candidate_ratios_int(values: np.ndarray, s: PageStats) -> dict[Codec, float]:
    raw = values.nbytes or 1
    itemsize = values.dtype.itemsize
    est: dict[Codec, float] = {}
    # OneValue/Freq payloads serialize scalars as signed i64; DeltaBP/
    # Bitpacking work in i64 space — gate them for values outside it
    # (uint64 pages above 2^63 still get RLE/Dict/basic, whose payloads
    # keep the raw dtype bytes).
    fits_i64 = (
        s.count == 0
        or (int(s.min_val) >= -(1 << 63) and int(s.max_val) < (1 << 63))
    )
    if s.unique_count <= 1 and fits_i64:
        est[Codec.ONE_VALUE] = raw / float(itemsize + 8)
    if s.count:
        est[Codec.RLE] = raw / float(4 + s.run_count * (4 + itemsize))
        if s.unique_count * 3 < s.count:  # reference Dict eligibility
            idx_bits = _bits_needed(max(s.unique_count - 1, 1))
            est[Codec.DICT] = raw / float(
                8 + s.unique_count * itemsize + s.count * idx_bits / 8 + 16
            )
        if s.top_count * 10 >= s.count * 9 and fits_i64:  # top ≥90% (Freq rule)
            n_exc = s.count - s.top_count
            est[Codec.FREQ] = raw / float(itemsize + 8 + n_exc * (4 + itemsize) + 16)
        if int(s.min_val) >= 0 and int(s.max_val) <= (1 << 62):
            width = _bits_needed(int(s.max_val))
            size = 2.0 + s.count * width / 8
            if width > 12 and s.count > 256:
                # wide page max may be one outlier — per-block widths
                # (reference BitPacker4x) recover the tight encoding
                widths = _block_widths(values.astype(np.int64))
                blocked = 7 + len(widths) + int(widths.astype(np.int64).sum()) * 16
                size = min(size, float(blocked))
            est[Codec.BITPACKING] = raw / size
        if s.is_sorted and s.count > 1 and int(s.min_val) >= 0 and fits_i64:
            deltas_max = int(np.diff(values).max()) if s.count > 1 else 0
            width = _bits_needed(max(deltas_max, 1))
            est[Codec.DELTA_BITPACKING] = raw / float(10 + s.count * width / 8)
    return est


def _compress_codes_into(
    out: bytearray,
    codes: np.ndarray,
    n_uniq: int,
    forbidden: frozenset[Codec] = frozenset(),
    ratio: float | None = None,
) -> None:
    """Fast path for dictionary index streams: bounded non-negative
    ints whose max is known. Picks RLE vs Bitpacking by EXACT payload
    size — no stats pass, no sampled trial compression (those cost
    more than encoding the codes themselves). The page stays readable
    by the normal integer decoder; only the writer-side search is
    short-circuited (the reference also restricts recursive codec
    choice — integer/dict.rs:59-62). The WriteOptions compress_ratio
    threshold still applies, as in _compress_offsets_into: if the exact
    RLE/bitpack ratio misses the bar, fall back to the general codec."""
    n = len(codes)
    codes = np.ascontiguousarray(codes, dtype=np.int64)
    width = _bits_needed(max(n_uniq - 1, 1))
    changes = (int(np.count_nonzero(codes[1:] != codes[:-1])) + 1) if n > 1 else n
    rle_size = 4 + changes * 12
    bp_size = 2 + (n * width + 7) // 8
    best = min(rle_size, bp_size)
    threshold = DEFAULT_COMPRESS_RATIO if ratio is None else ratio
    if best > 0 and codes.nbytes / best < threshold:
        raw = codes.tobytes()
        write_block(out, Codec.ZSTD, _basic_compress(Codec.ZSTD, raw), len(raw))
    elif rle_size < bp_size and Codec.RLE not in forbidden:
        write_block(out, Codec.RLE, _rle_encode(codes), codes.nbytes)
    elif Codec.BITPACKING not in forbidden:
        payload = struct.pack("<BB", width, 0) + _pack_bits(codes, width)
        write_block(out, Codec.BITPACKING, payload, codes.nbytes)
    else:
        _compress_integer_into(out, codes, Codec.ZSTD, forbidden | {Codec.DICT})


def _compress_offsets_into(
    out: bytearray,
    offsets: np.ndarray,
    default_codec: Codec = Codec.ZSTD,
    threshold: float | None = None,
) -> None:
    """Fast path for binary/list offset streams: monotone non-negative
    by construction, so delta-bitpack is (near-)optimal — skip the
    stats pass and trial compression. Readable by the normal integer
    decoder. The WriteOptions compress_ratio threshold still applies
    (an absurd threshold must force the general codec)."""
    v64 = np.ascontiguousarray(offsets, dtype=np.int64)
    deltas = np.diff(v64)
    width = _bits_needed(int(deltas.max()) if len(deltas) else 1)
    est = v64.nbytes / (9.0 + len(deltas) * width / 8)
    if est < (DEFAULT_COMPRESS_RATIO if threshold is None else threshold):
        raw = v64.tobytes()
        write_block(out, default_codec, _basic_compress(default_codec, raw), len(raw))
        return
    payload = struct.pack("<qB", int(v64[0]) if len(v64) else 0, width) + _pack_bits(
        deltas, width
    )
    write_block(out, Codec.DELTA_BITPACKING, payload, v64.nbytes)


def _compress_integer_into(
    out: bytearray,
    values: np.ndarray,
    default_codec: Codec,
    forbidden: frozenset[Codec],
    stats: PageStats | None = None,
    ratio: float | None = None,
    memo: dict | None = None,
    stats_out: dict | None = None,
) -> None:
    values = np.ascontiguousarray(values)
    nraw = values.nbytes
    sticky = _memo_sticky(memo)
    if sticky is not None:
        raw = values.tobytes()
        write_block(out, sticky, _basic_compress(sticky, raw), nraw)
        return
    s = stats if stats is not None else collect_stats(values)
    if stats_out is not None:
        stats_out["unique_count"] = int(s.unique_count)
        if s.uniques is not None and len(s.uniques) <= 32:
            # exact-path page with a small dictionary: surface the full
            # distinct set for footer-level membership pruning (the
            # int twin of the binary path's dict stat)
            stats_out["distinct"] = [int(v) for v in s.uniques]

    est = _candidate_ratios_int(values, s)
    # raw bytes materialize lazily: a page that picks a specialized
    # codec never pays the full-page copy.
    choice = _choose(est, forbidden, values.tobytes, default_codec, ratio, memo)
    _memo_store(memo, choice, est, ratio)
    raw = b""  # only basic codecs below read it
    if choice in _BASIC_CODECS:
        raw = values.tobytes()

    if choice == Codec.ONE_VALUE:
        payload = struct.pack("<q", int(values[0]) if len(values) else 0)
        write_block(out, Codec.ONE_VALUE, payload, nraw)
    elif choice == Codec.RLE:
        payload = _rle_encode(values)
        write_block(out, Codec.RLE, payload, nraw)
    elif choice == Codec.DICT:
        if s.uniques is not None and s.codes is not None:
            uniques, codes = s.uniques, s.codes
        else:
            uniques, codes = np.unique(values, return_inverse=True)
        body = bytearray()
        body += struct.pack("<II", len(uniques), values.dtype.itemsize)
        body += np.ascontiguousarray(uniques).tobytes()
        _compress_codes_into(body, codes, len(uniques), forbidden)
        write_block(out, Codec.DICT, bytes(body), nraw)
    elif choice == Codec.FREQ:
        top = values.dtype.type(s.top_val)
        exc_pos = np.flatnonzero(values != top).astype(np.uint32)
        body = bytearray()
        body += struct.pack("<qI", int(top), len(exc_pos))
        body += exc_pos.tobytes()
        _compress_integer_into(
            body,
            values[exc_pos].astype(np.int64),
            default_codec,
            forbidden | {Codec.FREQ},
            ratio=ratio,
        )
        write_block(out, Codec.FREQ, bytes(body), nraw)
    elif choice == Codec.BITPACKING:
        v64 = values.astype(np.int64)
        width = _bits_needed(int(s.max_val)) if len(values) else 1
        single = 2 + (len(v64) * width + 7) // 8
        payload = None
        if width > 1 and len(v64) > 256:
            widths = _block_widths(v64)
            blocked = 7 + len(widths) + int(widths.astype(np.int64).sum()) * 16
            if blocked + 64 < single:
                # width byte 0 marks the per-block-widths layout
                payload = struct.pack("<BB", 0, 0) + _pack_bits_blocked(v64, widths)
        if payload is None:
            payload = struct.pack("<BB", width, 0) + _pack_bits(v64, width)
        write_block(out, Codec.BITPACKING, payload, nraw)
    elif choice == Codec.DELTA_BITPACKING:
        v64 = values.astype(np.int64)
        deltas = np.diff(v64)
        width = _bits_needed(int(deltas.max()) if len(deltas) else 1)
        first = int(v64[0]) if len(v64) else 0
        single = 9 + (len(deltas) * width + 7) // 8
        payload = None
        if width > 1 and len(deltas) > 256:
            widths = _block_widths(deltas)
            blocked = 14 + len(widths) + int(widths.astype(np.int64).sum()) * 16
            if blocked + 64 < single:
                payload = struct.pack("<qB", first, 0) + _pack_bits_blocked(
                    deltas, widths
                )
        if payload is None:
            payload = struct.pack("<qB", first, width) + _pack_bits(deltas, width)
        write_block(out, Codec.DELTA_BITPACKING, payload, nraw)
    else:
        write_block(out, choice, _basic_compress(choice, raw), nraw)


def decompress_integer(buf: memoryview, pos: int, n: int, dtype: np.dtype) -> tuple[np.ndarray, int]:
    codec, payload, usize, nxt = read_block(buf, pos)
    if codec == Codec.ONE_VALUE:
        (v,) = struct.unpack("<q", payload)
        return np.full(n, v, dtype=dtype), nxt
    if codec == Codec.RLE:
        return _rle_decode(bytes(payload), dtype, n), nxt
    if codec == Codec.DICT:
        n_uniq, itemsize = struct.unpack_from("<II", payload, 0)
        off = 8
        uniques = np.frombuffer(payload, dtype=dtype, count=n_uniq, offset=off)
        off += n_uniq * itemsize
        codes, _ = decompress_integer(payload, off, n, np.dtype(np.int64))
        return uniques[codes], nxt
    if codec == Codec.FREQ:
        top, n_exc = struct.unpack_from("<qI", payload, 0)
        off = 12
        exc_pos = np.frombuffer(payload, dtype=np.uint32, count=n_exc, offset=off)
        off += 4 * n_exc
        exc, _ = decompress_integer(payload, off, n_exc, np.dtype(np.int64))
        outv = np.full(n, top, dtype=dtype)
        outv[exc_pos] = exc.astype(dtype)
        return outv, nxt
    if codec == Codec.BITPACKING:
        width, _ = struct.unpack_from("<BB", payload, 0)
        if width == 0:  # per-block widths layout
            return _unpack_bits_blocked(payload[2:], n).astype(dtype), nxt
        return _unpack_bits(bytes(payload[2:]), n, width).astype(dtype), nxt
    if codec == Codec.DELTA_BITPACKING:
        first, width = struct.unpack_from("<qB", payload, 0)
        if width == 0:  # per-block widths layout
            deltas = _unpack_bits_blocked(payload[9:], max(n - 1, 0))
        else:
            deltas = _unpack_bits(bytes(payload[9:]), max(n - 1, 0), width)
        outv = np.empty(n, dtype=np.int64)
        if n:
            outv[0] = first
            np.cumsum(deltas, out=outv[1:]) if n > 1 else None
            if n > 1:
                outv[1:] += first
        return outv.astype(dtype), nxt
    raw = _basic_decompress(codec, bytes(payload), usize)
    return np.frombuffer(raw, dtype=dtype, count=n), nxt


def _rle_encode(values: np.ndarray) -> bytes:
    n = len(values)
    if n == 0:
        return struct.pack("<I", 0)
    starts = np.concatenate(([0], np.flatnonzero(values[1:] != values[:-1]) + 1))
    lengths = np.diff(np.concatenate((starts, [n]))).astype(np.uint32)
    run_vals = np.ascontiguousarray(values[starts])
    return struct.pack("<I", len(starts)) + lengths.tobytes() + run_vals.tobytes()


def _rle_decode(payload: bytes, dtype: np.dtype, n: int) -> np.ndarray:
    (n_runs,) = struct.unpack_from("<I", payload, 0)
    lengths = np.frombuffer(payload, dtype=np.uint32, count=n_runs, offset=4)
    run_vals = np.frombuffer(payload, dtype=dtype, count=n_runs, offset=4 + 4 * n_runs)
    return np.repeat(run_vals, lengths.astype(np.int64))[:n]


def _ratio_sample(raw: bytes) -> bytes:
    """Spread sample for general-codec ratio estimation (reference
    compress_sample_ratio: SAMPLE_COUNT runs of SAMPLE_SIZE rows —
    compressing the WHOLE page to estimate its ratio defeats the
    purpose of estimating)."""
    if len(raw) <= 8192:
        return raw
    step = len(raw) // 8
    return b"".join(raw[i * step : i * step + 1024] for i in range(8))


# --------------------------------------------------------------------------
# Page bloom filters (opt-in, for high-cardinality string equality).
# Self-contained vectorized rolling hash — NOT python-hash/pandas-hash,
# whose seeds can drift across versions: a bloom read by a future
# version must probe with bit-identical hashes or it would prune pages
# that DO contain the value (wrong results, not just a missed prune).
# --------------------------------------------------------------------------

_BLOOM_BITS = 2048  # 256 B per page per column
_BLOOM_K = 4
_HASH_R = np.uint64(0x9E3779B97F4A7C15 | 1)  # odd -> invertible mod 2^64
_HASH_RINV = np.uint64(pow(int(_HASH_R), -1, 1 << 64))


def _mix64(h: np.ndarray) -> np.ndarray:
    # splitmix64 finalizer: diffuses the polynomial hash's low bits
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _stable_segment_hashes(data: bytes, offsets: np.ndarray) -> np.ndarray:
    """64-bit hash per [offsets[i], offsets[i+1]) byte segment, fully
    vectorized: polynomial prefix sums in wrapping uint64 arithmetic,
    segment value = (prefix[e] - prefix[s]) * r^-s, then splitmix."""
    n_bytes = len(data)
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    rpow = np.ones(n_bytes + 1, dtype=np.uint64)
    if n_bytes:
        rpow[1:] = np.multiply.accumulate(np.full(n_bytes, _HASH_R, dtype=np.uint64))
    prefix = np.zeros(n_bytes + 1, dtype=np.uint64)
    if n_bytes:
        np.cumsum(b * rpow[:n_bytes], out=prefix[1:])
    offs = offsets.astype(np.int64)
    starts, ends = offs[:-1], offs[1:]
    rinv_pow = np.ones(n_bytes + 1, dtype=np.uint64)
    if n_bytes:
        rinv_pow[1:] = np.multiply.accumulate(
            np.full(n_bytes, _HASH_RINV, dtype=np.uint64)
        )
    seg = (prefix[ends] - prefix[starts]) * rinv_pow[starts]
    lengths = (ends - starts).astype(np.uint64)
    return _mix64(seg ^ (lengths * np.uint64(0xC2B2AE3D27D4EB4F)))


def _bloom_build(hashes: np.ndarray) -> bytes:
    """Blob = u32 m_bits | filter bytes. m sized at ~10 bits per value
    (~1% FP at k=4), power of two, floor _BLOOM_BITS."""
    m = _BLOOM_BITS
    target = 10 * max(len(hashes), 1)
    while m < target:
        m <<= 1
    bloom = np.zeros(m >> 3, dtype=np.uint8)
    h1 = hashes & np.uint64(0xFFFFFFFF)
    h2 = (hashes >> np.uint64(32)) | np.uint64(1)
    for i in range(_BLOOM_K):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(bloom, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint64(1) << (pos & np.uint64(7))).astype(np.uint8))
    return struct.pack("<I", m) + bloom.tobytes()


def _bloom_may_contain(blob: bytes, value: bytes) -> bool:
    (m,) = struct.unpack_from("<I", blob, 0)
    bloom = blob[4:]
    offs = np.array([0, len(value)], dtype=np.int64)
    h = _stable_segment_hashes(value, offs)[0]
    h1 = int(h & np.uint64(0xFFFFFFFF))
    h2 = int((h >> np.uint64(32)) | np.uint64(1))
    for i in range(_BLOOM_K):
        pos = (h1 + i * h2) % m
        if not (bloom[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


_BASIC_CODECS = (Codec.NONE, Codec.LZ4, Codec.ZSTD, Codec.SNAPPY)
_MEMO_REPROBE = 16


def _memo_sticky(memo: dict | None) -> Codec | None:
    """Per-leaf sticky codec choice. When the previous page of a column
    fell through to a basic codec (high-entropy data: stats, candidate
    estimates, and sample compressions were all wasted work), reuse it
    for the next pages and only re-probe every _MEMO_REPROBE pages.
    Pages are self-describing, so a stale stick costs ratio on up to 15
    pages, never correctness. Specialized choices never stick — their
    eligibility genuinely varies page to page."""
    if memo is None or _forced(memo):
        return None
    c = memo.get("choice")
    if c in _BASIC_CODECS and memo.get("countdown", 0) > 0:
        memo["countdown"] -= 1
        return c
    return None


def _memo_store(
    memo: dict | None,
    choice: Codec,
    est: dict | None = None,
    threshold: float | None = None,
) -> None:
    """Record a page's full-path outcome. Stick only when the choice is
    a basic codec AND no specialized candidate even reached the ratio
    bar — a contested page (specialized estimate above the bar, basic
    won on the sampled ratio) must keep re-probing, because the winner
    there flips with page content."""
    if memo is None:
        return
    bar = DEFAULT_COMPRESS_RATIO if threshold is None else threshold
    uncontested = not est or max(est.values()) < bar
    memo["choice"] = choice if (choice in _BASIC_CODECS and uncontested) else None
    memo["countdown"] = _MEMO_REPROBE - 1


def _choose(
    est: dict[Codec, float],
    forbidden: frozenset[Codec],
    raw,  # bytes, or a zero-arg callable producing them (lazy)
    default_codec: Codec,
    threshold: float | None = None,
    memo: dict | None = None,
) -> Codec:
    if threshold is None:
        threshold = DEFAULT_COMPRESS_RATIO
    """Pick the best-estimated specialized codec above threshold, else
    the general codec (reference `choose_compressor` semantics)."""
    forced = [c for c in _forced(memo) if c in est and c not in forbidden]
    if forced:
        return forced[0]
    est = {c: r for c, r in est.items() if c not in forbidden}
    if est:
        best = max(est, key=est.get)  # type: ignore[arg-type]
        if est[best] >= threshold:
            # Early exit on very high ratios (reference early-exits on
            # perfect sample ratios); otherwise compare against a quick
            # sampled general-codec ratio so zstd keeps winning on noise.
            if est[best] >= 50:
                return best
            # The sampled general-codec ratio is a column property far
            # more than a page property: reuse it for a window of pages
            # instead of paying a sample compression on every contested
            # page — but ONLY when the decision isn't close. A marginal
            # comparison keeps per-page sampling, so one unlucky sample
            # can never flip a whole column (the same isolation rule
            # the sticky memo applies to basic-codec wins).
            gr = memo.get("gen_ratio") if memo is not None else None
            clear_cut = (
                gr is not None
                and gr[1] > 0
                and abs(est[best] * 1.3 - gr[0]) > 0.25 * gr[0]
            )
            if clear_cut:
                general_ratio = gr[0]
                memo["gen_ratio"] = (general_ratio, gr[1] - 1)
            else:
                sample = _ratio_sample(raw() if callable(raw) else raw)
                try:
                    general_ratio = len(sample) / max(
                        1, len(_basic_compress(default_codec, sample))
                    )
                except Exception:
                    general_ratio = 1.0
                if memo is not None:
                    memo["gen_ratio"] = (general_ratio, _MEMO_REPROBE - 1)
            # 1.3x bias toward the specialized codec: sampled general
            # ratios are optimistic (small-sample zstd), and specialized
            # encodings decode faster and expose structure (dict ids,
            # run bounds) downstream — same preference btrblocks makes.
            if est[best] * 1.3 >= general_ratio:
                return best
    return default_codec


# --------------------------------------------------------------------------
# Double family (float32/float64): OneValue, RLE, Dict, basic
# --------------------------------------------------------------------------

_PATAS_BLOCK = 128  # reference ring-buffer size (patas.rs:45)


def _patas_refs(n: int, bits: np.ndarray) -> np.ndarray:
    """Per-element reference index, reference-Patas semantics
    (patas.rs:59-65): the most recent earlier occurrence of the exact
    same bit pattern if it lies within the last 128 positions, else the
    previous element — except that a never-seen value inside the first
    128 positions references element 0 (the `unwrap_or(0)` path).

    Vectorized prev-occurrence: stable argsort groups equal bit
    patterns while keeping positional order inside each group, so the
    previous element of a sorted run IS the previous occurrence.
    """
    idx = np.arange(n, dtype=np.int64)
    order = np.argsort(bits, kind="stable")
    sb = bits[order]
    prev = np.full(n, -1, dtype=np.int64)
    if n > 1:
        same = sb[1:] == sb[:-1]
        prev[order[1:]] = np.where(same, order[:-1], -1)
    ref = np.where(prev >= 0, prev, 0)
    ref = np.where(idx - ref >= _PATAS_BLOCK, idx - 1, ref)
    return ref


def _patas_pack_body(bits: np.ndarray) -> bytes:
    """Encode a page of float bit patterns into the Patas packed-u16
    layout (reference src/compression/double/patas.rs:36-105): value i
    XORs against a reference value (see _patas_refs), and each record
    is a u16 `(ref_diff:7 | sig_bytes:3 | trailing_zeros:6)` plus
    `sig_bytes` little-endian bytes of `xor >> trailing_zeros`.

    Layout difference, deliberately: the reference interleaves header
    and payload per value (AoS); this implementation stores first value
    | all headers | all payloads (SoA) so both directions are whole-
    page numpy kernels and the header stream — highly repetitive on
    real data — sits contiguously for the outer general codec. The
    per-value information content is identical to the reference.
    """
    n = len(bits)
    itemsize = bits.dtype.itemsize
    nbits = itemsize * 8
    first = bits[:1].tobytes()
    if n <= 1:
        return first
    idx = np.arange(n, dtype=np.int64)
    ref = _patas_refs(n, bits)
    ref_diff = (idx - ref).astype(np.uint16)
    xor = bits ^ bits[ref]
    xor = xor[1:]  # element 0 is stored raw
    ref_diff = ref_diff[1:]

    is_zero = xor == 0
    # trailing zeros: lowest set bit is an exact power of two, and
    # float64 represents powers of two exactly, so log2 is exact.
    lowbit = xor & (~xor + np.uint64(1) if itemsize == 8 else ~xor + np.uint32(1))
    safe = np.where(is_zero, 1, lowbit)
    tz = np.log2(safe.astype(np.float64)).astype(np.uint8)
    shifted = xor >> tz.astype(bits.dtype)
    # significant bytes = ceil(bit_length(shifted)/8) via thresholds
    sig = np.ones(len(xor), dtype=np.uint8)
    for k in range(1, itemsize):
        sig += (shifted >= (1 << (8 * k))).astype(np.uint8)
    sig[is_zero] = 0
    tz[is_zero] = nbits - 1  # sentinel: tz==nbits-1 & sig==0 -> equal

    packed = (
        (ref_diff.astype(np.uint16) << 9)
        | ((sig.astype(np.uint16) & 7) << 6)
        | tz.astype(np.uint16)
    )
    # payload: low `sig` bytes of each shifted xor, row-major
    mat = np.ascontiguousarray(shifted.astype(f"<u{itemsize}")).view(np.uint8)
    mat = mat.reshape(len(xor), itemsize)
    mask = np.arange(itemsize, dtype=np.uint8)[None, :] < sig[:, None]
    payload = mat[mask]
    return first + packed.astype("<u2").tobytes() + payload.tobytes()


def _patas_unpack_body(body: bytes, n: int, bits_dtype: np.dtype) -> np.ndarray:
    """Decode _patas_pack_body. The reconstruction chain
    value[i] = xor[i] ^ value[i - ref_diff[i]] is sequential in the
    reference (patas.rs:119-130); here it is solved in O(log n)
    vectorized rounds of pointer doubling — each value's result is the
    XOR of contributions along its reference-ancestor path to value 0,
    so gather-and-double computes all paths at once."""
    itemsize = bits_dtype.itemsize
    nbits = itemsize * 8
    if n == 0:
        return np.empty(0, dtype=bits_dtype)
    first = np.frombuffer(body, dtype=bits_dtype, count=1)[0]
    if n == 1:
        return np.full(1, first, dtype=bits_dtype)
    headers = np.frombuffer(body, dtype="<u2", count=n - 1, offset=itemsize)
    ref_diff = (headers >> 9).astype(np.int64)
    sig = ((headers >> 6) & 7).astype(np.uint8)
    tz = (headers & 63).astype(np.uint8)
    # sig==0 means either xor==0 (tz at sentinel) or a full-width value
    is_zero = (sig == 0) & (tz == nbits - 1)
    sig = np.where((sig == 0) & ~is_zero, itemsize, sig).astype(np.uint8)
    sig[is_zero] = 0

    ends = np.cumsum(sig.astype(np.int64))
    payload = np.frombuffer(body, dtype=np.uint8, offset=itemsize + 2 * (n - 1))
    if len(payload) < (ends[-1] if len(ends) else 0):
        raise ValueError("patas payload truncated")
    mat = np.zeros((n - 1, itemsize), dtype=np.uint8)
    mask = np.arange(itemsize, dtype=np.uint8)[None, :] < sig[:, None]
    mat[mask] = payload[: ends[-1]]
    shifted = mat.reshape(-1).view(f"<u{itemsize}").astype(bits_dtype, copy=False)
    xor = shifted << np.where(is_zero, 0, tz).astype(bits_dtype)
    xor[is_zero] = 0

    # contribution per node; node 0 contributes the raw first value
    acc = np.empty(n, dtype=bits_dtype)
    acc[0] = first
    acc[1:] = xor
    # Walk-shaped data references the direct predecessor for almost
    # every record (the exceptions are the first ~128 values, which the
    # reference's unwrap_or(0) path points at element 0). Split at the
    # last non-1 reference: the head resolves by pointer doubling (it
    # is tiny), the tail is a plain cumulative XOR scan.
    nz = np.flatnonzero(ref_diff != 1)
    split = int(nz[-1]) + 1 if len(nz) else 0  # values[1+split:] all diff-1
    head_n = split + 1  # values 0..split resolve via doubling
    if head_n < n:
        head = _patas_resolve_chain(acc[:head_n], ref_diff[:split])
        tail = np.empty(n - split, dtype=bits_dtype)
        tail[0] = head[-1]
        tail[1:] = acc[head_n:]
        out = np.empty(n, dtype=bits_dtype)
        out[:head_n] = head
        out[head_n:] = np.bitwise_xor.accumulate(tail)[1:]
        return out
    return _patas_resolve_chain(acc, ref_diff)


def _patas_resolve_chain(acc: np.ndarray, ref_diff: np.ndarray) -> np.ndarray:
    """Resolve value[i] = acc[i] ^ value[i - ref_diff[i-1]] for all i
    (value[0] = acc[0]) by pointer doubling: O(log chain-length)
    vectorized rounds instead of the reference's sequential loop."""
    n = len(acc)
    parent = np.empty(n, dtype=np.int64)
    parent[0] = -1
    parent[1:] = np.arange(1, n, dtype=np.int64) - ref_diff
    # Invariant after k rounds: res[i] = XOR of acc over the path
    # segment from i up to (not including) parent[i], where parent[i]
    # is i's 2^k-th ancestor (-1 = past the root, segment complete).
    # Each round gathers res[p]/parent[p] BEFORE writing, which gives
    # snapshot semantics without copying the full arrays: an updated
    # entry is never re-read within the same round.
    res = acc.copy()
    act = np.flatnonzero(parent >= 0)
    while len(act):
        p = parent[act]
        rp = res[p]
        pp = parent[p]
        res[act] ^= rp
        parent[act] = pp
        act = act[pp >= 0]
    return res


def compress_double(
    values: np.ndarray,
    default_codec: Codec = Codec.ZSTD,
    forbidden: frozenset[Codec] = frozenset(),
    ratio: float | None = None,
    memo: dict | None = None,
    stats_out: dict | None = None,
) -> bytes:
    out = bytearray()
    values = np.ascontiguousarray(values)
    nraw = values.nbytes
    sticky = _memo_sticky(memo)
    if sticky is not None:
        raw = values.tobytes()
        write_block(out, sticky, _basic_compress(sticky, raw), nraw)
        return bytes(out)
    # Stats over the bit patterns (OrderedFloat-style total order,
    # reference DoubleStats) — NaN-safe because we compare bits.
    bits = values.view(np.uint32 if values.dtype.itemsize == 4 else np.uint64)
    s = collect_stats(bits)
    if stats_out is not None:
        stats_out["unique_count"] = int(s.unique_count)
    itemsize = values.dtype.itemsize
    est: dict[Codec, float] = {}
    if s.unique_count <= 1:
        est[Codec.ONE_VALUE] = (nraw or 1) / float(itemsize + 8)
    if s.count:
        est[Codec.RLE] = (nraw or 1) / float(4 + s.run_count * (4 + itemsize))
        if s.unique_count * 3 < s.count:
            idx_bits = _bits_needed(max(s.unique_count - 1, 1))
            est[Codec.DICT] = (nraw or 1) / float(
                8 + s.unique_count * itemsize + s.count * idx_bits / 8 + 16
            )
        if s.top_count * 10 >= s.count * 9:
            # Freq: dominant value + exception scatter (double/freq.rs)
            n_exc = s.count - s.top_count
            est[Codec.FREQ] = (nraw or 1) / float(
                itemsize + 8 + n_exc * (4 + itemsize) + 16
            )
    # PATAS (simplified): XOR each value with its predecessor, then
    # general-compress the xor stream. Slowly-varying floats share
    # sign/exponent/leading mantissa bits, so the xor stream is mostly
    # zeros and compresses far better than the raw stream (the same
    # insight as DuckDB's Patas / Gorilla, vectorized instead of
    # bit-serial; reference: src/compression/double/patas.rs).
    if s.count > 8 and s.unique_count * 3 >= s.count:
        xored = np.empty_like(bits)
        xored[0] = bits[0]
        np.bitwise_xor(bits[1:], bits[:-1], out=xored[1:])
        sample = xored.tobytes()[:SAMPLE_BYTES]
        try:
            patas_ratio = (
                min(nraw, SAMPLE_BYTES) / max(1, len(_basic_compress(Codec.ZSTD, sample)))
            )
        except Exception:
            patas_ratio = 1.0
        if patas_ratio >= DEFAULT_COMPRESS_RATIO:
            est[Codec.PATAS] = patas_ratio
        # True Patas (packed-u16 records, reference patas.rs): encode a
        # sample through the real kernel + outer zstd for the estimate.
        # The xor-sample ratio above is a free pre-filter: pages where
        # even the xor stream barely compresses (random mantissas) can
        # never clear the 2x bar, so don't pay the sample encode.
        packed_forced = Codec.PATAS_PACKED in _forced(memo)
        if packed_forced or patas_ratio >= DEFAULT_COMPRESS_RATIO * 0.75:
            n_sample = min(s.count, SAMPLE_BYTES // (2 * itemsize))
            try:
                body_s = _patas_pack_body(bits[:n_sample])
                packed_ratio = (n_sample * itemsize) / max(
                    1, len(_basic_compress(Codec.ZSTD, body_s))
                )
            except Exception:
                packed_ratio = 1.0
            if packed_forced or packed_ratio >= DEFAULT_COMPRESS_RATIO:
                est[Codec.PATAS_PACKED] = packed_ratio
    choice = _choose(est, forbidden, values.tobytes, default_codec, ratio, memo)
    _memo_store(memo, choice, est, ratio)
    raw = values.tobytes() if choice in _BASIC_CODECS else b""

    if choice == Codec.ONE_VALUE:
        payload = values[:1].tobytes() if len(values) else bytes(itemsize)
        payload += bytes(8 - len(payload)) if len(payload) < 8 else b""
        write_block(out, Codec.ONE_VALUE, payload, nraw)
    elif choice == Codec.PATAS:
        xored = np.empty_like(bits)
        if len(bits):
            xored[0] = bits[0]
            np.bitwise_xor(bits[1:], bits[:-1], out=xored[1:])
        # inner stream always zstd so the decoder needs no out-of-band info
        write_block(out, Codec.PATAS, _basic_compress(Codec.ZSTD, xored.tobytes()), nraw)
    elif choice == Codec.PATAS_PACKED:
        # payload = u32 body_len | zstd(body): the block header's
        # uncompressed_size stays the raw page size (stat parity), so
        # the zstd frame's own size rides in front of it.
        body = _patas_pack_body(bits)
        payload = struct.pack("<I", len(body)) + _basic_compress(Codec.ZSTD, body)
        write_block(out, Codec.PATAS_PACKED, payload, nraw)
    elif choice == Codec.RLE:
        write_block(out, Codec.RLE, _rle_encode_via_bits(values), nraw)
    elif choice == Codec.FREQ:
        top = s.top_val  # a bit pattern (uint view)
        exc_pos = np.flatnonzero(bits != top).astype(np.int64)
        body = bytearray()
        body += np.array([top], dtype=bits.dtype).tobytes().ljust(8, b"\0")
        body += struct.pack("<I", len(exc_pos))
        _compress_integer_into(body, exc_pos, default_codec, forbidden | {Codec.FREQ}, ratio=ratio)
        body += np.ascontiguousarray(values[exc_pos]).tobytes()
        write_block(out, Codec.FREQ, bytes(body), nraw)
    elif choice == Codec.DICT:
        if s.uniques is not None and s.codes is not None:
            uniq_bits, codes = s.uniques, s.codes
        else:
            uniq_bits, codes = np.unique(bits, return_inverse=True)
        uniques = uniq_bits.view(values.dtype)
        body = bytearray()
        body += struct.pack("<II", len(uniques), itemsize)
        body += np.ascontiguousarray(uniques).tobytes()
        _compress_codes_into(body, codes, len(uniques), forbidden)
        write_block(out, Codec.DICT, bytes(body), nraw)
    else:
        write_block(out, choice, _basic_compress(choice, raw), nraw)
    return bytes(out)


def _rle_encode_via_bits(values: np.ndarray) -> bytes:
    bits = values.view(np.uint32 if values.dtype.itemsize == 4 else np.uint64)
    return _rle_encode(bits)


def decompress_double(buf: memoryview, pos: int, n: int, dtype: np.dtype) -> tuple[np.ndarray, int]:
    codec, payload, usize, nxt = read_block(buf, pos)
    bits_dtype = np.dtype(np.uint32 if dtype.itemsize == 4 else np.uint64)
    if codec == Codec.ONE_VALUE:
        v = np.frombuffer(payload[: dtype.itemsize], dtype=dtype)[0] if n else 0
        return np.full(n, v, dtype=dtype), nxt
    if codec == Codec.PATAS:
        # payload is zstd(xor stream); codec byte says PATAS, the inner
        # basic codec is the writer's default — recover via zstd first,
        # falling back to lz4/snappy probing is unnecessary because the
        # uncompressed size disambiguates a raw stream.
        raw = _basic_decompress(Codec.ZSTD, bytes(payload), usize)
        xored = np.frombuffer(raw, dtype=bits_dtype, count=n).copy()
        return np.bitwise_xor.accumulate(xored).view(dtype), nxt
    if codec == Codec.PATAS_PACKED:
        (body_len,) = struct.unpack_from("<I", payload, 0)
        body = _basic_decompress(Codec.ZSTD, bytes(payload[4:]), body_len)
        return _patas_unpack_body(body, n, bits_dtype).view(dtype), nxt
    if codec == Codec.FREQ:
        top = np.frombuffer(payload[: dtype.itemsize], dtype=dtype)[0]
        (n_exc,) = struct.unpack_from("<I", payload, 8)
        out_arr = np.full(n, top, dtype=dtype)
        if n_exc:
            exc_pos, p2 = decompress_integer(payload, 12, n_exc, np.dtype(np.int64))
            out_arr[exc_pos] = np.frombuffer(payload, dtype=dtype, count=n_exc, offset=p2)
        return out_arr, nxt
    if codec == Codec.RLE:
        return _rle_decode(bytes(payload), bits_dtype, n).view(dtype), nxt
    if codec == Codec.DICT:
        n_uniq, itemsize = struct.unpack_from("<II", payload, 0)
        off = 8
        uniques = np.frombuffer(payload, dtype=dtype, count=n_uniq, offset=off)
        off += n_uniq * itemsize
        codes, _ = decompress_integer(payload, off, n, np.dtype(np.int64))
        return uniques[codes], nxt
    raw = _basic_decompress(codec, bytes(payload), usize)
    return np.frombuffer(raw, dtype=dtype, count=n), nxt


# --------------------------------------------------------------------------
# Boolean family: OneValue, RLE, basic over bit-packed bytes
# --------------------------------------------------------------------------


def compress_boolean(
    values: np.ndarray,  # bool array, one element per row
    default_codec: Codec = Codec.ZSTD,
    forbidden: frozenset[Codec] = frozenset(),
    ratio: float | None = None,
) -> bytes:
    out = bytearray()
    values = np.ascontiguousarray(values, dtype=np.uint8)
    packed = np.packbits(values, bitorder="little").tobytes()
    s = collect_stats(values)
    est: dict[Codec, float] = {}
    if s.unique_count <= 1:
        est[Codec.ONE_VALUE] = (len(packed) or 1) / 1.0 * 8
    if s.count:
        est[Codec.RLE] = (len(packed) or 1) / float(4 + s.run_count * 5)
    choice = _choose(est, forbidden, packed, default_codec, ratio)
    if choice == Codec.ONE_VALUE:
        payload = struct.pack("<B", int(values[0]) if len(values) else 0)
        write_block(out, Codec.ONE_VALUE, payload, len(packed))
    elif choice == Codec.RLE:
        write_block(out, Codec.RLE, _rle_encode(values), len(packed))
    else:
        write_block(out, choice, _basic_compress(choice, packed), len(packed))
    return bytes(out)


def decompress_boolean(buf: memoryview, pos: int, n: int) -> tuple[np.ndarray, int]:
    codec, payload, usize, nxt = read_block(buf, pos)
    if codec == Codec.ONE_VALUE:
        return np.full(n, bool(payload[0]), dtype=bool), nxt
    if codec == Codec.RLE:
        return _rle_decode(bytes(payload), np.dtype(np.uint8), n).astype(bool), nxt
    raw = _basic_decompress(codec, bytes(payload), usize)
    return np.unpackbits(
        np.frombuffer(raw, dtype=np.uint8), count=n, bitorder="little"
    ).astype(bool), nxt


# --------------------------------------------------------------------------
# Fixed-width family (decimal128 / fixed_size_binary). The reference
# treats Int128 as an integer physical type and routes it through the
# full integer-codec family (src/compression/integer/traits.rs:30-39);
# numpy has no int128, so 16-byte pages are split into lo/hi 64-bit
# words (arrow decimal128 is two's-complement little-endian: bytes 0-7
# = low word) and each half goes through the integer family. Typical
# decimal data (prices, quantities) has a constant hi word (0 or -1,
# sign extension) -> OneValue, and a dict/delta-friendly lo word — so
# this reaches the same codec leverage as the reference's Int128 path.
# A leading layout byte makes pages self-describing:
#   0x00 opaque (one basic-codec block over raw bytes — non-16B widths)
#   0x01 lo/hi integer-family split (two integer blocks of n values)
# --------------------------------------------------------------------------


def compress_fixed(
    raw: bytes,
    default_codec: Codec = Codec.ZSTD,
    width: int | None = None,
    forbidden: frozenset[Codec] = frozenset(),
    ratio: float | None = None,
) -> bytes:
    out = bytearray()
    if width == 16 and len(raw) % 16 == 0 and len(raw) > 0:
        out.append(1)
        words = np.frombuffer(raw, dtype=np.int64)
        _compress_integer_into(out, words[0::2], default_codec, forbidden, ratio=ratio)
        _compress_integer_into(out, words[1::2], default_codec, forbidden, ratio=ratio)
    else:
        out.append(0)
        write_block(out, default_codec, _basic_compress(default_codec, raw), len(raw))
    return bytes(out)


def decompress_fixed(buf: memoryview, pos: int, n: int) -> tuple[bytes, int]:
    layout = buf[pos]
    pos += 1
    if layout == 1:
        lo, pos = decompress_integer(buf, pos, n, np.dtype(np.int64))
        hi, nxt = decompress_integer(buf, pos, n, np.dtype(np.int64))
        words = np.empty(2 * n, dtype=np.int64)
        words[0::2] = lo
        words[1::2] = hi
        return words.tobytes(), nxt
    codec, payload, usize, nxt = read_block(buf, pos)
    return _basic_decompress(codec, bytes(payload), usize), nxt


# --------------------------------------------------------------------------
# Binary/Utf8 family: two blocks — offsets (integer family) + values
# (OneValue/Dict/basic). Reference: src/compression/binary/mod.rs.
# --------------------------------------------------------------------------


def compress_binary(
    offsets: np.ndarray,  # int64, len n+1, rebased to 0
    data: bytes,
    default_codec: Codec = Codec.ZSTD,
    forbidden: frozenset[Codec] = frozenset(),
    ratio: float | None = None,
    stats_out: dict | None = None,
    memo: dict | None = None,
) -> bytes:
    out = bytearray()
    # Block 1: offsets — monotone by construction, direct delta-bitpack.
    if Codec.DELTA_BITPACKING not in forbidden:
        _compress_offsets_into(out, offsets, default_codec, ratio)
    else:
        _compress_integer_into(out, offsets.astype(np.int64), default_codec, forbidden, ratio=ratio)
    # Block 2: value bytes. Dict-style dedup happens naturally via zstd;
    # an explicit Dict codec for binary pays off on low-cardinality pages.
    sticky = _memo_sticky(memo)
    if sticky is not None:
        write_block(out, sticky, _basic_compress(sticky, data), len(data))
        return bytes(out)
    n = len(offsets) - 1
    est: dict[Codec, float] = {}
    denc = None  # arrow DictionaryArray when the page looks low-card
    if (
        n > 0
        and len(data) == n
        and int(offsets[-1]) == n
        and bool((np.diff(offsets) == 1).all())
    ):
        # Every value is exactly one byte (single-char status/flag
        # columns): the whole pipeline — uniqueness, top-value, Dict/
        # Freq encode — runs as numpy u8 kernels, skipping the Arrow
        # array build + dictionary_encode round-trip entirely. Payload
        # layouts are bit-identical to the general path below.
        b = np.frombuffer(data, dtype=np.uint8)
        byte_counts = np.bincount(b, minlength=256)
        uniq = np.flatnonzero(byte_counts).astype(np.uint8)
        n_uniq = len(uniq)
        counts = byte_counts[uniq]
        lut = np.zeros(256, dtype=np.int64)
        lut[uniq] = np.arange(n_uniq)
        codes = lut[b]
        top_code = int(np.argmax(counts))
        top_count = int(counts[top_code])
        if stats_out is not None:
            stats_out["unique_count"] = int(n_uniq)
            if n_uniq <= 32:
                stats_out["distinct"] = [bytes([u]) for u in uniq.tolist()]
        if n_uniq <= 1:
            est[Codec.ONE_VALUE] = (len(data) or 1) / float(len(data) / max(n, 1) + 8)
        if n_uniq * 3 < n:
            idx_bits = _bits_needed(max(n_uniq - 1, 1))
            est[Codec.DICT] = len(data) / float(n_uniq + 8 * n_uniq + n * idx_bits / 8 + 24)
        if top_count * 10 >= n * 9 and n_uniq > 1:
            n_exc = n - top_count
            est[Codec.FREQ] = len(data) / float(4 + 1 + 4 + n_exc * 13 + n_exc + 24)
        choice = _choose(est, forbidden, data, default_codec, ratio, memo)
        _memo_store(memo, choice, est, ratio)
        if choice == Codec.ONE_VALUE:
            payload = struct.pack("<I", 1) + data[:1]
            write_block(out, Codec.ONE_VALUE, payload, len(data))
        elif choice == Codec.DICT:
            body = bytearray()
            body += struct.pack("<I", n_uniq)
            body += np.arange(n_uniq + 1, dtype=np.int64).tobytes()
            body += uniq.tobytes()
            _compress_codes_into(body, codes, n_uniq, forbidden)
            write_block(out, Codec.DICT, bytes(body), len(data))
        elif choice == Codec.FREQ:
            exc_pos = np.flatnonzero(codes != top_code).astype(np.int64)
            body = bytearray()
            body += struct.pack("<I", 1) + bytes([int(uniq[top_code])])
            body += struct.pack("<I", len(exc_pos))
            _compress_integer_into(body, exc_pos, default_codec, forbidden | {Codec.FREQ}, ratio=ratio)
            _compress_integer_into(
                body, np.ones(len(exc_pos), dtype=np.int64), default_codec, forbidden | {Codec.FREQ}, ratio=ratio
            )
            body += b[exc_pos].tobytes()
            write_block(out, Codec.FREQ, bytes(body), len(data))
        else:
            write_block(out, choice, _basic_compress(choice, data), len(data))
        return bytes(out)
    if n > 0 and len(data) > 0:
        # Two-stage uniqueness probe: count distinct over a 256-value
        # sample first (Arrow C++ over a zero-copy slice), and only
        # when the sample looks low-cardinality pay for the full
        # dictionary_encode, which the Dict encoding needs anyway.
        import pyarrow.compute as pc

        arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            n,
            [None, pa.py_buffer(np.ascontiguousarray(offsets, dtype=np.int64)), pa.py_buffer(data)],
        )
        sample_n = min(n, 256)
        sample_uniq = pc.count_distinct(arr.slice(0, sample_n)).as_py()
        if stats_out is not None:
            # sampled NDV estimate (same scaling rule as collect_stats);
            # overwritten with the exact count when the dictionary is built
            stats_out["unique_count"] = min(n, int(sample_uniq) * max(1, n // sample_n))
        if sample_uniq * 3 < max(sample_n, 3):
            denc = arr.dictionary_encode()
            n_uniq = len(denc.dictionary)
            if stats_out is not None:
                stats_out["unique_count"] = int(n_uniq)
            if stats_out is not None and n_uniq <= 32:
                # surface the page's full distinct set (cheap: already
                # computed) for footer-level membership pruning
                stats_out["distinct"] = denc.dictionary.to_pylist()
            codes_np = denc.indices.to_numpy(zero_copy_only=False)
            counts = np.bincount(codes_np, minlength=n_uniq)
            top_code = int(np.argmax(counts))
            top_count = int(counts[top_code])
            if n_uniq <= 1:
                est[Codec.ONE_VALUE] = (len(data) or 1) / float(len(data) / max(n, 1) + 8)
            if n_uniq * 3 < n:
                uniq_bytes = denc.dictionary.nbytes - 8 * (n_uniq + 1)
                idx_bits = _bits_needed(max(n_uniq - 1, 1))
                est[Codec.DICT] = (len(data) or 1) / float(
                    uniq_bytes + 8 * n_uniq + n * idx_bits / 8 + 24
                )
            if top_count * 10 >= n * 9 and n_uniq > 1:
                # Freq: one dominant value + exception scatter
                # (reference binary/freq.rs). Wins over Dict when the
                # exceptions are high-cardinality.
                top_len = len(denc.dictionary[top_code].as_py())
                n_exc = n - top_count
                exc_bytes = len(data) - top_count * top_len
                est[Codec.FREQ] = (len(data) or 1) / float(
                    4 + top_len + 4 + n_exc * 13 + exc_bytes + 24
                )
    choice = _choose(est, forbidden, data, default_codec, ratio, memo)
    _memo_store(memo, choice, est, ratio)
    if choice == Codec.ONE_VALUE and denc is not None:
        first = data[offsets[0] : offsets[1]] if n else b""
        payload = struct.pack("<I", len(first)) + first
        write_block(out, Codec.ONE_VALUE, payload, len(data))
    elif choice == Codec.DICT and denc is not None:
        uniq = denc.dictionary
        n_uniq = len(uniq)
        ub = uniq.buffers()  # [validity, int64 offsets, data]
        uniq_offsets = np.frombuffer(ub[1], dtype=np.int64, count=n_uniq + 1)
        body = bytearray()
        body += struct.pack("<I", n_uniq)
        body += uniq_offsets.tobytes()
        body += ub[2].to_pybytes()[: uniq_offsets[-1]]
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        _compress_codes_into(body, codes, n_uniq, forbidden)
        write_block(out, Codec.DICT, bytes(body), len(data))
    elif choice == Codec.FREQ and denc is not None:
        codes_np = denc.indices.to_numpy(zero_copy_only=False)
        counts = np.bincount(codes_np, minlength=len(denc.dictionary))
        top_code = int(np.argmax(counts))
        top = denc.dictionary[top_code].as_py()
        exc_pos = np.flatnonzero(codes_np != top_code).astype(np.int64)
        exc_lens = (offsets[exc_pos + 1] - offsets[exc_pos]).astype(np.int64)
        body = bytearray()
        body += struct.pack("<I", len(top)) + top
        body += struct.pack("<I", len(exc_pos))
        _compress_integer_into(body, exc_pos, default_codec, forbidden | {Codec.FREQ}, ratio=ratio)
        _compress_integer_into(body, exc_lens, default_codec, forbidden | {Codec.FREQ}, ratio=ratio)
        body += b"".join(
            data[offsets[i] : offsets[i + 1]] for i in exc_pos
        )
        write_block(out, Codec.FREQ, bytes(body), len(data))
    else:
        if choice in (Codec.ONE_VALUE, Codec.DICT):
            choice = default_codec
        write_block(out, choice, _basic_compress(choice, data), len(data))
    return bytes(out)


def _take_binary(
    uniq_offsets: np.ndarray, blob: bytes, codes: np.ndarray
) -> tuple[np.ndarray, bytes]:
    """Gather codes from a values table in Arrow C++; return (offsets,
    data) for the reconstructed page.

    Inputs are validated FIRST: from_buffers performs no checking, so
    non-monotone/out-of-range offsets or codes from a corrupted page
    (Dict or Freq) would crash pc.take natively instead of raising —
    the corruption-fuzz property test requires a clean Python error."""
    import pyarrow.compute as pc

    k = len(uniq_offsets) - 1
    if (
        k < 0
        or int(uniq_offsets[0]) != 0
        or (k > 0 and bool((np.diff(uniq_offsets) < 0).any()))
        or int(uniq_offsets[-1]) > len(blob)
    ):
        raise ValueError("corrupt page: invalid dictionary offsets")
    if len(codes) and (k == 0 or int(codes.min()) < 0 or int(codes.max()) >= k):
        raise ValueError("corrupt page: dictionary code out of range")
    uniq_arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(uniq_offsets) - 1,
        [None, pa.py_buffer(np.ascontiguousarray(uniq_offsets)), pa.py_buffer(blob)],
    )
    taken = pc.take(uniq_arr, pa.array(codes, type=pa.int64()))
    tb = taken.buffers()
    n = len(codes)
    out_off = np.frombuffer(tb[1], dtype=np.int64, count=n + 1).copy()
    data = tb[2].to_pybytes()[: out_off[-1]] if tb[2] is not None else b""
    return out_off, data


def decompress_binary(buf: memoryview, pos: int, n: int) -> tuple[np.ndarray, bytes, int]:
    """-> (offsets int64 (n+1), data bytes, next_pos)"""
    offsets, pos = decompress_integer(buf, pos, n + 1, np.dtype(np.int64))
    codec, payload, usize, nxt = read_block(buf, pos)
    if codec == Codec.ONE_VALUE:
        (ln,) = struct.unpack_from("<I", payload, 0)
        one = bytes(payload[4 : 4 + ln])
        return offsets, one * n, nxt
    if codec == Codec.DICT:
        (n_uniq,) = struct.unpack_from("<I", payload, 0)
        off = 4
        if 8 * (n_uniq + 1) > len(payload) - off:
            raise ValueError("corrupt dict page: offsets table exceeds payload")
        uniq_offsets = np.frombuffer(payload, dtype=np.int64, count=n_uniq + 1, offset=off)
        off += 8 * (n_uniq + 1)
        blob_len = int(uniq_offsets[-1]) if n_uniq >= 0 else -1
        # Validate BEFORE handing buffers to Arrow: from_buffers does no
        # checking, and non-monotone/out-of-range offsets from a
        # corrupted page crash pc.take natively instead of raising
        # (found by the corruption fuzz property test).
        if (
            blob_len < 0
            or blob_len > len(payload) - off
            or int(uniq_offsets[0]) != 0
            or (n_uniq > 0 and bool((np.diff(uniq_offsets) < 0).any()))
        ):
            raise ValueError("corrupt dict page: invalid value offsets")
        blob = bytes(payload[off : off + blob_len])
        off += blob_len
        codes, _ = decompress_integer(payload, off, n, np.dtype(np.int64))
        if len(codes) and (
            n_uniq == 0 or int(codes.min()) < 0 or int(codes.max()) >= n_uniq
        ):
            raise ValueError("corrupt dict page: code out of range")
        out_off, data = _take_binary(uniq_offsets, blob, codes)
        return out_off, data, nxt
    if codec == Codec.FREQ:
        (top_len,) = struct.unpack_from("<I", payload, 0)
        top = bytes(payload[4 : 4 + top_len])
        (n_exc,) = struct.unpack_from("<I", payload, 4 + top_len)
        p = 8 + top_len
        if n_exc:
            exc_pos, p = decompress_integer(payload, p, n_exc, np.dtype(np.int64))
            exc_lens, p = decompress_integer(payload, p, n_exc, np.dtype(np.int64))
        else:
            exc_pos = exc_lens = np.empty(0, dtype=np.int64)
        exc_data = bytes(payload[p:])
        # values table: [top, exc0, exc1, ...]; codes 0 except exceptions
        uniq_offsets = np.concatenate(
            ([0], np.cumsum(np.concatenate(([top_len], exc_lens))))
        ).astype(np.int64)
        codes = np.zeros(n, dtype=np.int64)
        codes[exc_pos] = 1 + np.arange(n_exc, dtype=np.int64)
        out_off, data = _take_binary(uniq_offsets, top + exc_data, codes)
        return out_off, data, nxt
    raw = _basic_decompress(codec, bytes(payload), usize)
    return offsets, raw, nxt
