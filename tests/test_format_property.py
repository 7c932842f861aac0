"""Property-based round-trip tests (hypothesis): arbitrary values,
lengths, null densities, and page sizes must survive write→read
bit-exactly. Complements the seeded-random matrix in
test_format_roundtrip.py the way the reference's randomized generators
complement its fixed all-types chunk (SURVEY.md §5).
"""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from strawboat_spark.sources.codecs import Codec
from strawboat_spark.sources.pagefile import StrawboatReader, StrawboatWriter

SETTINGS = dict(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _rt(table: pa.Table, page_size: int) -> pa.Table:
    buf = io.BytesIO()
    w = StrawboatWriter(buf, table.schema, page_size=page_size, default_codec=Codec.ZSTD)
    w.write_table(table)
    w.finish()
    buf.seek(0)
    return StrawboatReader(buf).read_table()


def _check(table: pa.Table, page_size: int) -> None:
    got = _rt(table, page_size)
    assert got.schema == table.schema
    assert got.num_rows == table.num_rows
    for name in table.column_names:
        a, b = got.column(name).combine_chunks(), table.column(name).combine_chunks()
        assert a == b, f"{name}: {a} != {b}"


ints = st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1))
floats = st.one_of(
    st.none(),
    st.floats(allow_nan=False, width=64),  # NaN breaks pa equality, tested separately
)
texts = st.one_of(st.none(), st.text(max_size=40))
blobs = st.one_of(st.none(), st.binary(max_size=40))
bools = st.one_of(st.none(), st.booleans())


@given(
    vals=st.lists(ints, min_size=1, max_size=500),
    page=st.sampled_from([7, 64, 2048]),
)
@settings(**SETTINGS)
def test_int64_roundtrip(vals, page):
    _check(pa.table({"x": pa.array(vals, type=pa.int64())}), page)


@given(
    vals=st.lists(floats, min_size=1, max_size=500),
    page=st.sampled_from([7, 64, 2048]),
)
@settings(**SETTINGS)
def test_float64_roundtrip(vals, page):
    _check(pa.table({"x": pa.array(vals, type=pa.float64())}), page)


@given(
    vals=st.lists(texts, min_size=1, max_size=300),
    page=st.sampled_from([7, 64, 2048]),
)
@settings(**SETTINGS)
def test_utf8_roundtrip(vals, page):
    _check(pa.table({"x": pa.array(vals, type=pa.string())}), page)


@given(
    vals=st.lists(blobs, min_size=1, max_size=300),
    page=st.sampled_from([7, 64]),
)
@settings(**SETTINGS)
def test_binary_roundtrip(vals, page):
    _check(pa.table({"x": pa.array(vals, type=pa.binary())}), page)


@given(
    vals=st.lists(bools, min_size=1, max_size=500),
    page=st.sampled_from([7, 2048]),
)
@settings(**SETTINGS)
def test_bool_roundtrip(vals, page):
    _check(pa.table({"x": pa.array(vals, type=pa.bool_())}), page)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.lists(ints, max_size=8)), min_size=1, max_size=200
    ),
    page=st.sampled_from([16, 256]),
)
@settings(**SETTINGS)
def test_list_int_roundtrip(vals, page):
    _check(pa.table({"x": pa.array(vals, type=pa.list_(pa.int64()))}), page)


@given(
    a=st.lists(ints, min_size=1, max_size=200),
    b=st.lists(texts, min_size=1, max_size=200),
    page=st.sampled_from([32, 512]),
)
@settings(**SETTINGS)
def test_struct_roundtrip(a, b, page):
    n = min(len(a), len(b))
    _check(
        pa.table(
            {
                "s": pa.StructArray.from_arrays(
                    [pa.array(a[:n], type=pa.int64()), pa.array(b[:n], type=pa.string())],
                    names=["i", "t"],
                )
            }
        ),
        page,
    )


def test_nan_and_inf_floats():
    """NaN payload bits round-trip (checked via numpy, since Arrow
    equality treats NaN != NaN)."""
    vals = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0, 1e308, 5e-324])
    got = _rt(pa.table({"x": pa.array(vals)}), 4)
    out = got.column("x").combine_chunks().to_numpy(zero_copy_only=False)
    assert np.array_equal(out, vals, equal_nan=True)
    # -0.0 sign preserved
    assert np.signbit(out[4])


@given(
    vals=st.lists(floats, min_size=1, max_size=500),
    page=st.sampled_from([7, 64, 2048]),
)
@settings(**SETTINGS)
def test_float64_roundtrip_forced_patas_packed(vals, page):
    """Packed-Patas path under arbitrary doubles (incl. infinities,
    subnormals, nulls) at awkward page sizes."""
    import os

    os.environ["STRAWBOAT_PATAS_PACKED_COMPRESSION"] = "1"
    try:
        _check(pa.table({"x": pa.array(vals, type=pa.float64())}), page)
    finally:
        os.environ.pop("STRAWBOAT_PATAS_PACKED_COMPRESSION", None)


@given(
    bits=st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=400),
)
@settings(**SETTINGS)
def test_patas_packed_body_any_bit_patterns(bits):
    """The raw pack/unpack kernels over arbitrary uint64 bit patterns
    (covers every NaN payload arrow equality can't)."""
    import numpy as np

    from strawboat_spark.sources.codecs import _patas_pack_body, _patas_unpack_body

    arr = np.array(bits, dtype=np.uint64)
    out = _patas_unpack_body(_patas_pack_body(arr), len(arr), np.dtype(np.uint64))
    assert np.array_equal(out, arr)


# ---------------------------------------------------------------------------
# Media codec properties (operators/png.py, operators/jpeg.py,
# operators/flac.py): lossless paths must roundtrip bit-exactly for
# ARBITRARY inputs, not just the seeded test vectors.
# ---------------------------------------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**SETTINGS)
def test_png_roundtrip_any_image(w, h, ch, seed):
    from strawboat_spark.operators.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    px = rng.integers(0, 256, size=shape).astype(np.uint8)
    assert decode_png(encode_png(px)) == (w, h, round(float(px.mean()), 4))


@given(
    bw=st.integers(min_value=1, max_value=5),
    bh=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**SETTINGS)
def test_jpeg_constant_blocks_any_values(bw, bh, seed):
    """DC-only blocks decode bit-exactly for ANY block values/layout
    (the invariant the multimodal_jpeg_decode oracle rests on)."""
    from strawboat_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, size=(bh, bw))
    px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    dw, dh, mean = decode_jpeg(encode_jpeg(px))
    assert (dw, dh) == (bw * 8, bh * 8)
    assert mean == round(float(vals.mean()), 4)


@given(
    n=st.integers(min_value=1, max_value=2000),
    order=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**SETTINGS)
def test_flac_fixed_roundtrip_any_signal(n, order, seed):
    from strawboat_spark.operators.flac import decode_flac, encode_flac_fixed

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n)
    sr, nf, dur, rms = decode_flac(encode_flac_fixed(s, order=order, block_size=512))
    assert nf == n
    assert rms == round(float(np.sqrt(np.mean(s.astype(np.float64) ** 2))), 4)


@given(
    n=st.integers(min_value=1, max_value=2000),
    order=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**SETTINGS)
def test_flac_lpc_roundtrip_any_signal(n, order, seed):
    """Quantized-LPC subframes are lossless for ANY signal and order —
    the residual carries whatever the predictor misses."""
    from strawboat_spark.operators.flac import decode_flac, encode_flac_lpc

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n)
    sr, nf, dur, rms = decode_flac(encode_flac_lpc(s, order=order, block_size=512))
    assert nf == n
    assert rms == round(float(np.sqrt(np.mean(s.astype(np.float64) ** 2))), 4)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_reader_rejects_corruption_cleanly(data):
    """Fuzz the standalone page-file reader: random truncations and
    byte flips of a valid file must either raise (any exception class
    is fine — ValueError, struct.error, arrow/zstd errors...) or, when
    the flip lands in unread padding or a value region that still
    decodes, return SOME well-formed table — never hang, crash the
    interpreter, or return rows of the wrong schema."""
    import io

    import numpy as np
    import pyarrow as pa

    from strawboat_spark.sources.pagefile import (
        StrawboatReader,
        StrawboatWriter,
        read_footer,
    )

    tbl = pa.table(
        {
            "a": pa.array(np.arange(300, dtype=np.int64)),
            "b": pa.array((np.arange(300) % 7).astype(np.float64)),
            "s": pa.array([f"v{i % 11}" for i in range(300)]),
        }
    )
    buf = io.BytesIO()
    w = StrawboatWriter(buf, tbl.schema, page_size=64)
    w.write_table(tbl)
    w.finish()
    raw = bytearray(buf.getvalue())

    mode = data.draw(st.sampled_from(["truncate", "flip"]))
    if mode == "truncate":
        cut = data.draw(st.integers(1, len(raw) - 1))
        corrupted = bytes(raw[:cut])
    else:
        i = data.draw(st.integers(0, len(raw) - 1))
        raw[i] ^= data.draw(st.integers(1, 255))
        corrupted = bytes(raw)

    try:
        f = io.BytesIO(corrupted)
        schema, meta = read_footer(f)
        r = StrawboatReader(io.BytesIO(corrupted), schema=schema, meta=meta)
        out = list(r.iter_batches())
        # decoded despite the corruption (flip hit padding or a value):
        # schema must still be the declared one
        for b in out:
            assert b.schema.names == ["a", "b", "s"]
    except Exception:
        pass  # clean rejection is the expected common case
