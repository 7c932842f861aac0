"""G.711 codec (operators/g711.py): canonical decode anchors, code
roundtrip, optimal quantization, and the WAV format-tag dispatch."""

import numpy as np
import pytest

from strawboat_spark.operators.g711 import (
    alaw_to_linear,
    linear_to_alaw,
    linear_to_ulaw,
    ulaw_to_linear,
)
from strawboat_spark.operators.multimodal import (
    decode_wav,
    synthesize_g711_wav_bytes,
)

_CODES = np.arange(256, dtype=np.uint8)


def test_canonical_anchor_values():
    u = ulaw_to_linear(_CODES)
    # ITU-T G.711 / CCITT reference values
    assert (u[0xFF], u[0x7F]) == (0, 0)  # ± zero pair
    assert (u[0x80], u[0x00]) == (32124, -32124)  # extrema
    a = alaw_to_linear(_CODES)
    assert (a[0xD5], a[0x55]) == (8, -8)  # smallest magnitudes
    assert (a[0xAA], a[0x2A]) == (32256, -32256)  # extrema


def test_code_roundtrip_all_256():
    ur = linear_to_ulaw(ulaw_to_linear(_CODES))
    # the -0 twin 0x7F re-encodes to the canonical +0 (0xFF); all else exact
    assert [c for c in range(256) if ur[c] != c] == [0x7F]
    assert ur[0x7F] == 0xFF
    ar = linear_to_alaw(alaw_to_linear(_CODES))
    assert np.array_equal(ar, _CODES)  # A-law levels are all distinct


def test_encode_is_nearest_level():
    rng = np.random.default_rng(6)
    x = rng.integers(-32768, 32768, 4000).astype(np.int16)
    for enc, dec in ((linear_to_ulaw, ulaw_to_linear), (linear_to_alaw, alaw_to_linear)):
        levels = dec(_CODES).astype(np.int64)
        got = dec(enc(x)).astype(np.int64)
        best = np.min(np.abs(levels[None, :] - x.astype(np.int64)[:, None]), axis=1)
        assert np.array_equal(np.abs(got - x), best)


def test_wav_dispatch_both_laws():
    for law, dec in (("ulaw", ulaw_to_linear), ("alaw", alaw_to_linear)):
        b = synthesize_g711_wav_bytes(9, 500, law)
        rate, n, dur, rms = decode_wav(b)
        codes = ((np.arange(500) * 7 + 9) % 256).astype(np.uint8)
        expected = round(float(np.sqrt(np.mean(dec(codes).astype(np.float64) ** 2))), 4)
        assert (rate, n, rms) == (8000, 500, expected)


def test_unknown_format_tag_raises():
    import struct

    data = b"\x00" * 8
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 2, 1, 8000, 8000, 1, 8)  # tag 2 = ADPCM
    hdr += b"data" + struct.pack("<I", len(data)) + data
    with pytest.raises(ValueError, match="A-law"):
        decode_wav(hdr)
