"""IMA ADPCM codec unit tests (operators/adpcm.py): state-machine
edges, WAV container parsing, multi-block decode, encoder sanity."""

from __future__ import annotations

import numpy as np
import pytest

from strawboat_spark.operators.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    _pack_nibbles,
    _unpack_nibbles,
    decode_ima_codes,
    decode_ima_wav,
    encode_ima_adpcm,
    ima_oracle_sql_fragment,
    synthesize_ima_wav_bytes,
    wrap_ima_wav,
)


def test_step_table_shape():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[-1] == 32767
    assert (np.diff(STEP_TABLE) > 0).all()
    assert list(INDEX_TABLE) == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_nibble_pack_roundtrip():
    codes = np.array([0, 15, 7, 8, 3, 12], dtype=np.uint8)
    assert list(_unpack_nibbles(_pack_nibbles(codes))) == list(codes)
    with pytest.raises(ValueError, match="even"):
        _pack_nibbles(np.array([1], dtype=np.uint8))


def test_predictor_clamps_and_index_saturates():
    # all-max positive codes drive predictor to the int16 ceiling and
    # the index to 88 without overflow
    codes = np.full(200, 7, dtype=np.uint8)  # +step+step/2+step/4 every step
    out = decode_ima_codes(codes)
    assert out.max() == 32767
    # all-negative afterwards reaches the floor
    out2 = decode_ima_codes(np.full(400, 15, dtype=np.uint8))
    assert out2.min() == -32768


def test_header_predictor_is_first_sample():
    out = decode_ima_codes(np.array([0, 0], dtype=np.uint8), pred=1234, idx=3)
    assert out[0] == 1234


def test_wav_roundtrip_multi_block():
    # two one-block payloads concatenated at the data level: build a
    # WAV whose data holds 2 blocks, decode must chain both headers
    codes = ((np.arange(32, dtype=np.int64) * 5 + 9) % 16).astype(np.uint8)
    one = wrap_ima_wav(codes, sample_rate=16000)
    sr, samples = decode_ima_wav(one)
    assert sr == 16000 and len(samples) == 33
    assert samples[0] == 0
    ref = decode_ima_codes(codes)
    assert (samples == ref).all()


def test_encode_decode_converges():
    """The greedy quantizer tracks an arbitrary waveform: RMS error is
    bounded by the step size once the adapter locks on."""
    t = np.arange(512)
    wave = (3000 * np.sin(t / 10.0)).astype(np.int16)
    codes = encode_ima_adpcm(wave)
    rec = decode_ima_codes(codes)[1:]
    err = np.abs(rec.astype(np.int64) - wave.astype(np.int64))
    assert float(np.sqrt(np.mean(err[64:] ** 2))) < 500  # post-lock-on


def test_decode_rejects_non_adpcm():
    with pytest.raises(ValueError, match="RIFF"):
        decode_ima_wav(b"nope")
    from strawboat_spark.operators.multimodal import synthesize_wav_bytes

    with pytest.raises(ValueError, match="IMA ADPCM"):
        decode_ima_wav(synthesize_wav_bytes(1, 16))  # PCM16 WAV, wrong tag


def test_decode_wav_dispatches_adpcm():
    from strawboat_spark.operators.multimodal import decode_wav

    payload = synthesize_ima_wav_bytes(42, 64)
    rate, n, dur, rms = decode_wav(payload)
    assert rate == 8000 and n == 65
    _, ref = decode_ima_wav(payload)
    assert rms == round(float(np.sqrt(np.mean(ref.astype(np.float64) ** 2))), 4)


def test_sql_fragment_matches_decoder_exactly():
    import duckdb

    frag = ima_oracle_sql_fragment(48)
    for doc in (0, 3, 88, 1999):
        payload = synthesize_ima_wav_bytes(doc, 48)
        _, samples = decode_ima_wav(payload)
        got = duckdb.sql(
            f"SELECT (({frag}).s + ({frag}).p) AS s FROM (SELECT {doc}::BIGINT AS doc_id)"
        ).fetchall()[0][0]
        assert got == int(samples.astype(np.int64).sum())


def test_property_sql_replay_equals_decoder():
    """Hypothesis: ANY code stream decodes identically in numpy and in
    the DuckDB list_reduce replay (same clamps, same saturation)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from strawboat_spark.operators.adpcm import STEP_TABLE, INDEX_TABLE

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=120))
    def check(codes):
        ref = decode_ima_codes(np.array(codes, dtype=np.uint8))
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
        lit = ", ".join(f"{{'s': 0, 'p': {c}, 'i': 0}}" for c in codes)
        q = (
            f"SELECT list_reduce(list_prepend({{'s': 0, 'p': 0, 'i': 0}}, [{lit}]), "
            f"(acc, x) -> {{'s': acc.s + acc.p, 'p': {newp}, 'i': {newi}}}) AS r"
        )
        r = duckdb.sql(q).fetchall()[0][0]
        assert r["s"] + r["p"] == int(ref.astype(np.int64).sum())
        assert r["p"] == int(ref[-1])

    check()


def test_fuzz_wav_truncation_and_byteflips_never_hang():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = synthesize_ima_wav_bytes(9, 32)

    @settings(max_examples=100, deadline=None)
    @given(
        pos=st.integers(min_value=0, max_value=len(base) - 1),
        val=st.integers(min_value=1, max_value=255),
        mode=st.sampled_from(["truncate", "flip"]),
    )
    def check(pos, val, mode):
        data = base[:pos] if mode == "truncate" else bytes(
            bytearray(base[:pos]) + bytes([base[pos] ^ val]) + bytearray(base[pos + 1:])
        )
        try:
            decode_ima_wav(data)
        except (ValueError, IndexError, KeyError) as _:
            pass
        except Exception as e:  # struct.error etc. are acceptable clean raises
            import struct as _struct

            assert isinstance(e, _struct.error), e

    check()
