"""IMA ADPCM (DVI4) audio codec — pure numpy/stdlib, public spec
(IMA Digital Audio Compatibility Project, 1992; WAV format tag 0x11).

4:1 compressed PCM: each 4-bit code advances a (predictor, step-index)
state machine over the canonical 89-entry step table. WAV IMA blocks
are SELF-CONTAINED (every block header carries its own predictor +
index), which is what makes this codec parallelizable at 100 TB: a
corpus of ADPCM blobs decodes block-parallel inside Arrow batches with
no cross-block state.

Reference parity: the reference engine (strawboat, a columnar format
library) has no audio codecs at all — this extends the engine's
multimodal column story alongside WAV/G.711/FLAC (operators/g711.py,
flac.py). MP3 (MPEG-1 Layer III) remains a declared seam: its Huffman
code tables are normative ISO 11172-3 data unavailable offline, and a
from-memory reconstruction would silently decode garbage, so the
honest stub stays (multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# Canonical IMA step table (89 entries) and 4-bit index adjustments.
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)

INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _decode_step(code: int, pred: int, idx: int) -> tuple[int, int]:
    """One IMA ADPCM state transition: returns (new_pred, new_idx)."""
    step = int(STEP_TABLE[idx])
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    if code & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    idx = max(0, min(88, idx + int(INDEX_TABLE[code & 7])))
    return pred, idx


def decode_ima_codes(codes, pred: int = 0, idx: int = 0) -> np.ndarray:
    """Decode a 4-bit code sequence to int16 samples. The block-header
    predictor is the FIRST output sample (WAV IMA convention); each
    code then yields one sample."""
    out = np.empty(len(codes) + 1, dtype=np.int16)
    out[0] = pred
    for i, c in enumerate(codes):
        pred, idx = _decode_step(int(c), pred, idx)
        out[i + 1] = pred
    return out


def encode_ima_adpcm(samples: np.ndarray, pred: int = 0, idx: int = 0) -> np.ndarray:
    """Encode int16 samples (AFTER the initial header sample) to 4-bit
    codes with the standard quantizer: code bits chosen greedily from
    the current step, mirroring the decoder's reconstruction."""
    codes = np.empty(len(samples), dtype=np.uint8)
    for i, s in enumerate(np.asarray(samples, dtype=np.int64)):
        step = int(STEP_TABLE[idx])
        diff = int(s) - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        codes[i] = code
        pred, idx = _decode_step(code, pred, idx)
    return codes


def _pack_nibbles(codes: np.ndarray) -> bytes:
    """Little-nibble-first packing (WAV IMA layout); even count required."""
    if len(codes) % 2:
        raise ValueError("IMA ADPCM nibble stream must have even length")
    c = np.asarray(codes, dtype=np.uint8)
    return ((c[0::2] & 0x0F) | (c[1::2] << 4)).tobytes()


def _unpack_nibbles(data: bytes) -> np.ndarray:
    b = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(2 * len(b), dtype=np.uint8)
    out[0::2] = b & 0x0F
    out[1::2] = b >> 4
    return out


WAVE_FORMAT_IMA_ADPCM = 0x0011


def wrap_ima_wav(
    codes: np.ndarray, sample_rate: int = 8000, pred: int = 0, idx: int = 0
) -> bytes:
    """Mono WAV (fmt tag 0x11) with ONE IMA block: 4-byte block header
    (predictor int16, index u8, reserved u8) + packed nibbles. Total
    samples = 1 + len(codes)."""
    payload = struct.pack("<hBB", pred, idx, 0) + _pack_nibbles(codes)
    block_align = len(payload)
    samples_per_block = 1 + len(codes)
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM,
        1,
        sample_rate,
        sample_rate * block_align // samples_per_block,
        block_align,
        4,
        2,  # cbSize
        samples_per_block,
    )
    fact = struct.pack("<I", samples_per_block)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_ima_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a mono fmt-0x11 WAV and decode every IMA block (blocks are
    independent — the per-corpus scale path decodes them in parallel).
    Returns (sample_rate, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    samples_per_block = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        ln = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] != WAVE_FORMAT_IMA_ADPCM:
                raise ValueError(f"not IMA ADPCM (fmt tag 0x{fmt[0]:04x})")
            if fmt[1] != 1:
                raise ValueError("only mono IMA ADPCM supported")
            if len(body) >= 20:
                samples_per_block = struct.unpack_from("<H", body, 18)[0]
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    sample_rate, block_align = fmt[2], fmt[4]
    if samples_per_block is None:
        samples_per_block = 1 + 2 * (block_align - 4)
    out = []
    for off in range(0, len(data) - 3, block_align):
        block = data[off : off + block_align]
        pred, idx, _ = struct.unpack_from("<hBB", block, 0)
        codes = _unpack_nibbles(block[4:])[: samples_per_block - 1]
        out.append(decode_ima_codes(codes, pred, idx))
    return sample_rate, np.concatenate(out) if out else np.empty(0, dtype=np.int16)


def synthesize_ima_wav_bytes(doc_id: int, n_codes: int = 64, sample_rate: int = 8000) -> bytes:
    """Deterministic gate payload: code i = (i * 7 + doc_id) % 16, one
    block, predictor 0 / index 0 — so the decoded sample trace is an
    analytic function of doc_id that a SQL oracle can replay through
    the same public state machine."""
    if n_codes % 2:
        raise ValueError("n_codes must be even")
    codes = (np.arange(n_codes, dtype=np.int64) * 7 + int(doc_id)) % 16
    return wrap_ima_wav(codes.astype(np.uint8), sample_rate=sample_rate)


def ima_oracle_sql_fragment(n_codes: int) -> str:
    """DuckDB replay of decode_ima_codes for the synthesized gate
    payloads (code k = (k*7 + doc_id) % 16, initial pred/idx 0):
    list_reduce over the code list with a {p: pred, i: idx, s: sum}
    struct accumulator and the step/index tables inlined as literals.
    Generated next to the decoder so the two state machines cannot
    drift apart. list_reduce takes its initial accumulator as the
    list's first element and lists are homogeneous, so codes ride in
    as same-shaped structs (the code is x.p); lambdas have no lets, so
    the step/diff subexpressions repeat textually.

    DuckDB 1.0 binds struct-literal fields SEQUENTIALLY inside the
    lambda (a later field's acc.p sees the p computed two tokens
    earlier — let* semantics, verified by minimal repro), so the sum
    field comes FIRST and accumulates the PREVIOUS predictor; the
    caller adds the final predictor: total = (r).s + (r).p."""
    steps = "[" + ", ".join(str(int(s)) for s in STEP_TABLE) + "]"
    idxt = "[" + ", ".join(str(int(i)) for i in INDEX_TABLE) + "]"
    step = f"({steps}[acc.i + 1])"
    diff = (
        f"({step} // 8"
        f" + CASE WHEN x.p % 2 = 1 THEN {step} // 4 ELSE 0 END"
        f" + CASE WHEN (x.p // 2) % 2 = 1 THEN {step} // 2 ELSE 0 END"
        f" + CASE WHEN (x.p // 4) % 2 = 1 THEN {step} ELSE 0 END)"
    )
    sdiff = f"(CASE WHEN x.p >= 8 THEN -{diff} ELSE {diff} END)"
    newp = f"GREATEST(-32768, LEAST(32767, acc.p + {sdiff}))"
    newi = f"GREATEST(0, LEAST(88, acc.i + ({idxt}[(x.p % 8) + 1])))"
    zero = "CAST(0 AS BIGINT)"
    codes = (
        f"list_transform(generate_series(0, {n_codes - 1}), "
        f"k -> {{'s': {zero}, 'p': CAST((k * 7 + doc_id) % 16 AS BIGINT), 'i': {zero}}})"
    )
    return (
        f"list_reduce(list_prepend({{'s': {zero}, 'p': {zero}, 'i': {zero}}}, {codes}), "
        f"(acc, x) -> {{'s': acc.s + acc.p, 'p': {newp}, 'i': {newi}}})"
    )
