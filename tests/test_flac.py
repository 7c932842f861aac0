"""FLAC codec (operators/flac.py): lossless decode across subframe
types, Rice residuals, stereo decorrelation, and error paths."""

import numpy as np
import pytest

from strawboat_spark.operators.flac import (
    decode_flac,
    encode_flac_constant,
    encode_flac_fixed,
    encode_flac_stereo_leftside,
    encode_flac_verbatim,
)


def _rms(x):
    return round(float(np.sqrt(np.mean(np.asarray(x, dtype=np.float64) ** 2))), 4)


def test_constant_blocks_decode_bit_exact():
    """The oracle path: equal CONSTANT blocks -> analytic RMS."""
    for doc_id in (0, 5, 99):
        nb = 3 + doc_id % 4
        vals = [(b * 53 + doc_id * 7) % 2048 - 1024 for b in range(nb)]
        sr, n, dur, rms = decode_flac(encode_flac_constant(vals, block_size=256))
        assert (sr, n, dur) == (8000, nb * 256, round(nb * 256 / 8000, 6))
        assert rms == _rms(np.repeat(np.array(vals, np.float64), 256))


def test_verbatim_roundtrip_with_partial_final_block():
    rng = np.random.default_rng(0)
    s = rng.integers(-32768, 32768, size=1000)
    sr, n, dur, rms = decode_flac(encode_flac_verbatim(s, sample_rate=16000, block_size=256))
    assert (sr, n, rms) == (16000, 1000, _rms(s))


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_predictor_with_rice_residuals(order):
    """Every fixed order: warmup samples + Rice-coded residuals must
    reconstruct the signal exactly (lossless)."""
    t = np.arange(5000)
    s = (1000 * np.sin(t / 50) + 200 * np.sin(t / 7)).astype(np.int64)
    sr, n, dur, rms = decode_flac(encode_flac_fixed(s, order=order, block_size=1024))
    assert (n, rms) == (5000, _rms(s))


def test_fixed_actually_compresses_smooth_signals():
    t = np.arange(4096)
    s = (1000 * np.sin(t / 50)).astype(np.int64)
    smooth = len(encode_flac_fixed(s, order=3, block_size=1024))
    raw = len(encode_flac_verbatim(s, block_size=1024))
    assert smooth < raw / 3  # prediction + Rice should crush a sine


def test_stereo_left_side_decorrelation():
    rng = np.random.default_rng(1)
    left = rng.integers(-2000, 2000, size=3000)
    right = left + rng.integers(-50, 50, size=3000)
    sr, n, dur, rms = decode_flac(encode_flac_stereo_leftside(left, right, block_size=1024))
    assert (n, rms) == (3000, _rms(np.stack([left, right])))


def test_lpc_subframe_decodes():
    """The LPC branch has no synthesis encoder, so pin it with a
    hand-crafted subframe bitstream: order-2 predictor with known
    coefficients/shift, residuals Rice-coded, decoded against an
    independent numpy reconstruction."""
    from strawboat_spark.operators.flac import (
        _BitReader,
        _BitWriter,
        _decode_subframe,
        _write_rice,
    )

    bps, order, shift = 16, 2, 5
    coefs = [40, -12]  # applied to out[i-1], out[i-2], then >> shift
    warm = [100, 130]
    res = [3, -2, 7, 0, -5, 1, 4, -1, 0, 2, -3, 6, -4, 0]
    block_size = order + len(res)
    # independent reference reconstruction
    out = list(warm)
    for e in res:
        pred = (coefs[0] * out[-1] + coefs[1] * out[-2]) >> shift
        out.append(e + pred)

    sw = _BitWriter()
    sw.write(0, 1)  # padding
    sw.write(32 + (order - 1), 6)  # SUBFRAME_LPC, order bits = order-1
    sw.write(0, 1)  # no wasted bits
    for s in warm:
        sw.write(s & ((1 << bps) - 1), bps)
    prec = 7
    sw.write(prec - 1, 4)
    sw.write(shift & 0x1F, 5)
    for c in coefs:
        sw.write(c & ((1 << prec) - 1), prec)
    _write_rice(sw, np.array(res, dtype=np.int64), 2)
    sw.align()

    got = _decode_subframe(_BitReader(bytes(sw.out)), block_size, bps)
    assert got.tolist() == out


def test_bad_payloads_raise():
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(b"RIFFxxxxWAVE")
    good = bytearray(encode_flac_constant([5], block_size=256))
    good[42] ^= 0xFF  # corrupt inside the first frame's sync region
    # either a sync error or a reserved-field error — never a silent
    # wrong answer
    with pytest.raises((ValueError, IndexError)):
        sr, n, dur, rms = decode_flac(bytes(good))
        assert rms == 5.0  # unreachable unless decode silently passed


def test_lpc_encoder_compresses_and_roundtrips():
    """Levinson-Durbin LPC beats verbatim on tonal signals and stays
    lossless; exercises the same decode path as the hand-crafted
    bitstream test, but end-to-end."""
    from strawboat_spark.operators.flac import encode_flac_lpc, encode_flac_verbatim

    t = np.arange(5000)
    s = (3000 * np.sin(t / 30) + 500 * np.sin(t / 5)).astype(np.int64)
    b = encode_flac_lpc(s, order=4, block_size=1024)
    sr, n, dur, rms = decode_flac(b)
    assert (n, rms) == (5000, _rms(s))
    assert len(b) < len(encode_flac_verbatim(s, block_size=1024)) / 2
