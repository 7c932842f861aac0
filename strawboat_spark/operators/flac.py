"""Pure-numpy/stdlib FLAC decoder (xiph.org format spec) — closes the
compressed-audio seam the way operators/png.py closed images: WAV
covers uncompressed PCM, FLAC covers the lossless compressed format
real audio corpora ship; MP3's deterministic frame-level surface is
operators/mp3.py, its PCM path decided out (COVERAGE.md).

Scope: STREAMINFO parse, frame decode with CONSTANT / VERBATIM /
FIXED (orders 0-4) / LPC subframes, 4- and 5-bit Rice partitions with
escape codes, independent + left/right/mid-side stereo decorrelation,
UTF-8 frame numbers, wasted bits. CRCs are written by the encoder and
skipped by the decoder (transport integrity is the format layer's
job). The encoder exists for test/oracle synthesis: FLAC is lossless,
so a CONSTANT-subframe stream decodes bit-exact and the oracle is the
plain analytic formula (same pattern as the PNG gate).
"""

from __future__ import annotations

import struct

import numpy as np


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bytepos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            self.acc = (self.acc << 8) | self.data[self.bytepos]
            self.bytepos += 1
            self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def read_utf8_number(self) -> int:
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        n = 0
        while (b0 << n) & 0x80:
            n += 1
        v = b0 & (0x7F >> n)
        for _ in range(n - 1):
            v = (v << 6) | (self.read(8) & 0x3F)
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# frame-header block size codes we emit: 4096 has a dedicated code (12)
_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}


def encode_flac_constant(
    block_values: list[int], sample_rate: int = 8000, block_size: int = 4096,
    bits_per_sample: int = 16,
) -> bytes:
    """Mono FLAC where block b is CONSTANT at block_values[b] — the
    smallest spec-valid stream, and bit-exact on decode (the oracle
    trick: analytic mean/RMS over the block values)."""
    n_samples = len(block_values) * block_size
    out = bytearray(b"fLaC")
    # STREAMINFO (is_last, type 0, length 34)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)  # channels - 1
    si.write(bits_per_sample - 1, 5)
    si.write(n_samples, 36)
    si.align()
    out += bytes([0x80, 0, 0, 34])  # is_last | STREAMINFO, length 34
    out += si.out + b"\x00" * 16  # md5 unset (decoder skips)
    for idx, v in enumerate(block_values):
        out += _encode_frame_constant(idx, int(v), block_size, sample_rate, bits_per_sample)
    return bytes(out)


def _frame_header(idx: int, block_size: int, sample_rate: int, bits_per_sample: int,
                  channel_assign: int = 0) -> bytes:
    hw = _BitWriter()
    hw.write(0b11111111111110, 14)
    hw.write(0, 1)  # reserved
    hw.write(0, 1)  # fixed blocksize strategy (frame number coded)
    bs_code = _BLOCKSIZE_CODES.get(block_size, 7)
    hw.write(bs_code, 4)
    hw.write(0, 4)  # sample rate: from STREAMINFO
    hw.write(channel_assign, 4)
    hw.write({8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}[bits_per_sample], 3)
    hw.write(0, 1)  # reserved
    # UTF-8 frame number (idx < 128 -> one byte)
    assert idx < 128
    hw.write(idx, 8)
    if bs_code == 7:
        hw.write(block_size - 1, 16)
    hw.align()
    hdr = bytes(hw.out)
    return hdr + bytes([_crc8(hdr)])


def _encode_frame_constant(idx, v, block_size, sample_rate, bits_per_sample) -> bytes:
    body = _frame_header(idx, block_size, sample_rate, bits_per_sample)
    sw = _BitWriter()
    sw.write(0, 1)  # padding
    sw.write(0, 6)  # SUBFRAME_CONSTANT
    sw.write(0, 1)  # no wasted bits
    sw.write(v & ((1 << bits_per_sample) - 1), bits_per_sample)
    sw.align()
    frame = body + bytes(sw.out)
    return frame + struct.pack(">H", _crc16(frame))


def encode_flac_verbatim(samples: np.ndarray, sample_rate: int = 8000,
                         block_size: int = 4096, bits_per_sample: int = 16) -> bytes:
    """Mono FLAC with VERBATIM subframes (arbitrary samples, lossless,
    uncompressed) — exercises the decoder's verbatim path and the
    multi-frame walk with a partial final block."""
    samples = np.asarray(samples, dtype=np.int64)
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(len(samples), 36)
    si.align()
    out += bytes([0x80, 0, 0, 34]) + si.out + b"\x00" * 16
    for idx in range(0, (len(samples) + block_size - 1) // block_size):
        chunk = samples[idx * block_size : (idx + 1) * block_size]
        body = _frame_header(idx, len(chunk) if len(chunk) != block_size else block_size,
                             sample_rate, bits_per_sample)
        sw = _BitWriter()
        sw.write(0, 1)
        sw.write(1, 6)  # SUBFRAME_VERBATIM
        sw.write(0, 1)
        for s in chunk.tolist():
            sw.write(int(s) & ((1 << bits_per_sample) - 1), bits_per_sample)
        sw.align()
        frame = body + bytes(sw.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def _write_rice(sw: _BitWriter, residuals: np.ndarray, param: int) -> None:
    """Single-partition Rice coding (partition order 0, 4-bit param)."""
    sw.write(0, 2)  # coding method 0 (4-bit rice)
    sw.write(0, 4)  # partition order 0
    sw.write(param, 4)
    for e in residuals.tolist():
        zz = (e << 1) ^ (e >> 63)  # zigzag
        q = zz >> param
        for _ in range(q):
            sw.write(0, 1)
        sw.write(1, 1)
        if param:
            sw.write(zz & ((1 << param) - 1), param)


def encode_flac_fixed(
    samples: np.ndarray, order: int = 2, sample_rate: int = 8000,
    block_size: int = 4096, bits_per_sample: int = 16,
) -> bytes:
    """Mono FLAC with FIXED-predictor subframes + Rice residuals — the
    layout a real encoder emits for smooth signals; exercises warmup,
    prediction reconstruction, and the Rice decoder."""
    samples = np.asarray(samples, dtype=np.int64)
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(len(samples), 36)
    si.align()
    out += bytes([0x80, 0, 0, 34]) + si.out + b"\x00" * 16
    for idx in range(0, (len(samples) + block_size - 1) // block_size):
        chunk = samples[idx * block_size : (idx + 1) * block_size]
        bs = len(chunk)
        # a block shorter than the predictor order can't carry its
        # warmup — clamp per frame (real encoders do the same for the
        # short final block)
        eff = min(order, bs - 1)
        coefs = _FIXED_COEFFS[eff]
        body = _frame_header(idx, bs, sample_rate, bits_per_sample)
        sw = _BitWriter()
        sw.write(0, 1)
        sw.write(8 + eff, 6)  # SUBFRAME_FIXED
        sw.write(0, 1)
        for s in chunk[:eff].tolist():
            sw.write(int(s) & ((1 << bits_per_sample) - 1), bits_per_sample)
        res = np.array(
            [
                int(chunk[i]) - sum(c * int(chunk[i - 1 - j]) for j, c in enumerate(coefs))
                for i in range(eff, bs)
            ],
            dtype=np.int64,
        )
        mean_abs = float(np.abs(res).mean()) if len(res) else 0.0
        param = min(14, max(0, int(mean_abs).bit_length()))
        _write_rice(sw, res, param)
        sw.align()
        frame = body + bytes(sw.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def _levinson_durbin(x: np.ndarray, order: int) -> np.ndarray:
    """LPC coefficients a[1..order] (s[i] ~ sum a[j]*s[i-j]) from the
    autocorrelation of x — the standard recursion every FLAC encoder
    uses for its quantized predictor."""
    r = np.array([float(np.dot(x[: len(x) - k], x[k:])) for k in range(order + 1)])
    if r[0] == 0.0:
        return np.zeros(order)
    a = np.zeros(order + 1)
    err = r[0]
    for i in range(1, order + 1):
        acc = r[i] - np.dot(a[1:i], r[1:i][::-1])
        k = acc / err if err != 0 else 0.0
        a[1:i] = a[1:i] - k * a[1:i][::-1]
        a[i] = k
        err *= 1.0 - k * k
        if err <= 0:
            break
    return a[1:]


def encode_flac_lpc(
    samples: np.ndarray, order: int = 4, precision: int = 12,
    sample_rate: int = 8000, block_size: int = 4096, bits_per_sample: int = 16,
) -> bytes:
    """Mono FLAC with quantized-LPC subframes (subframe type 32+):
    Levinson-Durbin coefficients quantized to `precision` bits with a
    power-of-two shift, residuals Rice-coded. Lossless for ANY signal
    (the residual carries whatever the predictor misses) — the
    encoder-side twin that lets the LPC decode path be property-tested
    instead of pinned by one hand-crafted bitstream."""
    samples = np.asarray(samples, dtype=np.int64)
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(len(samples), 36)
    si.align()
    out += bytes([0x80, 0, 0, 34]) + si.out + b"\x00" * 16
    for idx in range(0, (len(samples) + block_size - 1) // block_size):
        chunk = samples[idx * block_size : (idx + 1) * block_size]
        bs = len(chunk)
        eff = min(order, bs - 1)
        body = _frame_header(idx, bs, sample_rate, bits_per_sample)
        sw = _BitWriter()
        sw.write(0, 1)
        if eff < 1:
            sw.write(1, 6)  # VERBATIM fallback for 1-sample tails
            sw.write(0, 1)
            for s in chunk.tolist():
                sw.write(int(s) & ((1 << bits_per_sample) - 1), bits_per_sample)
        else:
            a = _levinson_durbin(chunk.astype(np.float64), eff)
            cmax = float(np.max(np.abs(a))) if len(a) else 0.0
            shift = 0
            if cmax > 0:
                # largest shift keeping round(a * 2^shift) in precision bits
                shift = max(0, min(15, precision - 2 - int(np.floor(np.log2(cmax) + 1e-9))))
            lim = 1 << (precision - 1)
            q = np.clip(np.round(a * (1 << shift)).astype(np.int64), -lim, lim - 1)
            sw.write(32 + (eff - 1), 6)  # SUBFRAME_LPC
            sw.write(0, 1)
            for s in chunk[:eff].tolist():
                sw.write(int(s) & ((1 << bits_per_sample) - 1), bits_per_sample)
            sw.write(precision - 1, 4)
            sw.write(shift & 0x1F, 5)
            for c in q.tolist():
                sw.write(int(c) & ((1 << precision) - 1), precision)
            res = np.array(
                [
                    int(chunk[i])
                    - (sum(int(q[j]) * int(chunk[i - 1 - j]) for j in range(eff)) >> shift)
                    for i in range(eff, bs)
                ],
                dtype=np.int64,
            )
            mean_abs = float(np.abs(res).mean()) if len(res) else 0.0
            _write_rice(sw, res, min(14, max(0, int(mean_abs).bit_length())))
        sw.align()
        frame = body + bytes(sw.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def encode_flac_stereo_leftside(
    left: np.ndarray, right: np.ndarray, sample_rate: int = 8000,
    block_size: int = 4096, bits_per_sample: int = 16,
) -> bytes:
    """Stereo FLAC with left/side decorrelation (channel assignment 8),
    verbatim subframes — exercises the side channel's bps+1 width and
    the inter-channel reconstruction."""
    left = np.asarray(left, dtype=np.int64)
    right = np.asarray(right, dtype=np.int64)
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(1, 3)  # 2 channels
    si.write(bits_per_sample - 1, 5)
    si.write(len(left), 36)
    si.align()
    out += bytes([0x80, 0, 0, 34]) + si.out + b"\x00" * 16
    side_all = left - right
    for idx in range(0, (len(left) + block_size - 1) // block_size):
        sl = slice(idx * block_size, (idx + 1) * block_size)
        lch, sch = left[sl], side_all[sl]
        body = _frame_header(idx, len(lch), sample_rate, bits_per_sample, channel_assign=8)
        sw = _BitWriter()
        for vals, bps in ((lch, bits_per_sample), (sch, bits_per_sample + 1)):
            sw.write(0, 1)
            sw.write(1, 6)  # VERBATIM
            sw.write(0, 1)
            for s in vals.tolist():
                sw.write(int(s) & ((1 << bps) - 1), bps)
        sw.align()
        frame = body + bytes(sw.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_residuals(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 + method  # rice parameter width
    po = br.read(4)
    nparts = 1 << po
    if block_size - order < 0 or (po and block_size % nparts):
        raise ValueError(
            f"invalid residual layout (block {block_size}, order {order}, partitions {nparts})"
        )
    out = np.empty(block_size - order, dtype=np.int64)
    filled = 0
    for p in range(nparts):
        n = (block_size >> po) - (order if p == 0 else 0)
        param = br.read(plen)
        if param == (1 << plen) - 1:  # escape: raw n-bit residuals
            raw_bits = br.read(5)
            for i in range(n):
                out[filled + i] = br.read_signed(raw_bits) if raw_bits else 0
        else:
            for i in range(n):
                q = br.unary()
                r = br.read(param) if param else 0
                zz = (q << param) | r
                out[filled + i] = (zz >> 1) ^ -(zz & 1)  # zigzag
        filled += n
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(block_size, br.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(block_size)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residuals(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFFS[order]
        for i in range(order, block_size):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = res[i - order] + pred
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        shift = br.read_signed(5)
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residuals(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            pred = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs)) >> shift
            out[i] = res[i - order] + pred
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return out << wasted if wasted else out


_BS_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608, 8: 256, 9: 512,
             10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768}
_BPS_TABLE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


def decode_flac(payload: bytes):
    """Returns (sample_rate, n_frames, duration_sec, rms) — the same
    contract as multimodal.decode_wav, RMS over all channels."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        hdr = payload[pos : pos + 4]
        is_last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        if btype == 0:
            si = _BitReader(payload, pos + 4)
            si.read(16), si.read(16), si.read(24), si.read(24)
            sample_rate = si.read(20)
            n_channels = si.read(3) + 1
            bps = si.read(5) + 1
            total = si.read(36)
            streaminfo = (sample_rate, n_channels, bps, total)
        pos += 4 + length
        if is_last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    sample_rate, n_channels, bps, total = streaminfo
    chunks = []
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        br = _BitReader(payload, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {pos}")
        br.read(1)
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_assign = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        br.read_utf8_number()
        if bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BS_TABLE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        fbps = _BPS_TABLE.get(bps_code, bps)
        br.read(8)  # header CRC-8 (not validated)
        if chan_assign < 8:
            nch = chan_assign + 1
            subs = [_decode_subframe(br, block_size, fbps) for _ in range(nch)]
        elif chan_assign == 8:  # left/side
            left = _decode_subframe(br, block_size, fbps)
            side = _decode_subframe(br, block_size, fbps + 1)
            subs = [left, left - side]
        elif chan_assign == 9:  # right/side
            side = _decode_subframe(br, block_size, fbps + 1)
            right = _decode_subframe(br, block_size, fbps)
            subs = [right + side, right]
        elif chan_assign == 10:  # mid/side
            mid = _decode_subframe(br, block_size, fbps)
            side = _decode_subframe(br, block_size, fbps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {chan_assign}")
        br.align()
        pos = br.bytepos + 2  # frame CRC-16 (not validated)
        take = block_size if total == 0 else min(block_size, total - got)
        chunks.append(np.stack([s[:take] for s in subs]))
        got += take
    if not chunks:
        return sample_rate, 0, 0.0, 0.0
    all_samples = np.concatenate(chunks, axis=1)
    n_frames = all_samples.shape[1]
    rms = float(np.sqrt(np.mean(all_samples.astype(np.float64) ** 2)))
    return sample_rate, n_frames, round(n_frames / sample_rate, 6), round(rms, 4)
