"""Format round-trip tests, modeled on the reference's strategy
(SURVEY.md §5: seeded random shapes, all-types chunk, codec-targeted
datasets, codec forcing via env) — reference tests/it/io.rs.
"""

from __future__ import annotations

import io
import os

import numpy as np
import pyarrow as pa
import pytest

from strawboat_spark.sources.codecs import Codec
from strawboat_spark.sources.pagefile import (
    StrawboatReader,
    StrawboatWriter,
    read_footer,
)

RNG = np.random.default_rng(42)


def roundtrip(table: pa.Table, page_size: int = 2048, codec: Codec = Codec.ZSTD) -> pa.Table:
    buf = io.BytesIO()
    w = StrawboatWriter(buf, table.schema, page_size=page_size, default_codec=codec)
    w.write_table(table)
    w.finish()
    buf.seek(0)
    return StrawboatReader(buf).read_table()


def assert_rt(table: pa.Table, **kw):
    got = roundtrip(table, **kw)
    assert got.schema == table.schema, f"schema: {got.schema} != {table.schema}"
    assert got.num_rows == table.num_rows
    for name in table.column_names:
        assert got.column(name).combine_chunks() == table.column(name).combine_chunks(), name


def _with_nulls(arr, density=0.1):
    mask = RNG.random(len(arr)) < density
    return pa.array(
        [None if m else v for v, m in zip(arr, mask)],
        type=pa.array(arr).type if not isinstance(arr, pa.Array) else arr.type,
    )


N = 5000


def all_types_table() -> pa.Table:
    n = N
    cols = {
        "c_bool": pa.array(RNG.integers(0, 2, n).astype(bool)),
        "c_i8": pa.array(RNG.integers(-128, 127, n).astype(np.int8)),
        "c_i16": pa.array(RNG.integers(-30000, 30000, n).astype(np.int16)),
        "c_i32": pa.array(RNG.integers(-(2**31) + 1, 2**31 - 1, n).astype(np.int32)),
        "c_i64": pa.array(RNG.integers(-(2**62), 2**62, n).astype(np.int64)),
        "c_u8": pa.array(RNG.integers(0, 255, n).astype(np.uint8)),
        "c_u16": pa.array(RNG.integers(0, 60000, n).astype(np.uint16)),
        "c_u32": pa.array(RNG.integers(0, 2**31, n).astype(np.uint32)),
        "c_f32": pa.array(RNG.normal(size=n).astype(np.float32)),
        "c_f64": pa.array(RNG.normal(size=n) * 1e6),
        "c_str": pa.array([f"val-{i % 97}-{RNG.integers(0, 10)}" for i in range(n)]),
        "c_bin": pa.array([bytes(RNG.integers(0, 255, RNG.integers(0, 20)).astype(np.uint8)) for _ in range(n)], type=pa.binary()),
        "c_date": pa.array(RNG.integers(0, 20000, n).astype(np.int32), type=pa.date32()),
        "c_ts": pa.array(RNG.integers(0, 2**48, n), type=pa.timestamp("us")),
    }
    return pa.table(cols)


def test_all_types_roundtrip():
    assert_rt(all_types_table())


@pytest.mark.parametrize("codec", [Codec.NONE, Codec.LZ4, Codec.ZSTD, Codec.SNAPPY])
def test_basic_codecs(codec):
    assert_rt(all_types_table().select(["c_i64", "c_f64", "c_str", "c_bool"]), codec=codec)


def test_nullable_roundtrip():
    n = N
    t = pa.table(
        {
            "i": _with_nulls(RNG.integers(0, 1000, n).tolist()),
            "f": _with_nulls((RNG.normal(size=n)).tolist()),
            "s": _with_nulls([f"s{i % 13}" for i in range(n)]),
            "b": _with_nulls(RNG.integers(0, 2, n).astype(bool).tolist()),
        }
    )
    assert_rt(t)


def test_all_null_column():
    t = pa.table({"x": pa.array([None] * 100, type=pa.int64())})
    assert_rt(t)


def test_empty_table():
    t = pa.table({"x": pa.array([], type=pa.int64()), "s": pa.array([], type=pa.string())})
    assert_rt(t)


# codec-targeted datasets (reference tests/it/io.rs:104-179)


def test_one_value_pages():
    t = pa.table({"x": pa.array([7] * 10000), "s": pa.array(["same"] * 10000)})
    assert_rt(t)


def test_dict_friendly():
    t = pa.table(
        {
            "x": pa.array(RNG.integers(0, 8, 10000)),
            "s": pa.array([f"cat{v}" for v in RNG.integers(0, 8, 10000)]),
        }
    )
    assert_rt(t)


def test_freq_skewed():
    vals = np.full(10000, 42)
    idx = RNG.choice(10000, 500, replace=False)
    vals[idx] = RNG.integers(0, 1000, 500)
    assert_rt(pa.table({"x": pa.array(vals)}))


def test_sorted_delta_bp():
    assert_rt(pa.table({"x": pa.array(np.sort(RNG.integers(0, 10**9, 20000)))}))


def test_small_range_bitpack():
    assert_rt(pa.table({"x": pa.array(RNG.integers(0, 100, 20000))}))


@pytest.mark.parametrize(
    "env",
    [
        "STRAWBOAT_RLE_COMPRESSION",
        "STRAWBOAT_DICT_COMPRESSION",
        "STRAWBOAT_FREQ_COMPRESSION",
        "STRAWBOAT_BITPACK_COMPRESSION",
        "STRAWBOAT_DELTABP_COMPRESSION",
    ],
)
def test_codec_forcing(env, monkeypatch):
    """Reference CI re-runs the suite under each forced codec
    (.github/workflows/rust.yml:21-24)."""
    monkeypatch.setenv(env, "1")
    vals = np.sort(RNG.integers(0, 50, 10000))  # eligible for everything
    assert_rt(pa.table({"x": pa.array(vals)}))


# nested coverage (reference tests/it/io.rs:168-278)


def test_list_roundtrip():
    n = 3000
    t = pa.table(
        {
            "l": pa.array(
                [None if i % 17 == 0 else RNG.integers(0, 100, i % 7).tolist() for i in range(n)],
                type=pa.list_(pa.int64()),
            )
        }
    )
    assert_rt(t)


def test_list_of_floats_embeddings_shape():
    n = 500
    t = pa.table(
        {"embedding": pa.array([RNG.normal(size=64).astype(np.float32).tolist() for _ in range(n)], type=pa.list_(pa.float32()))}
    )
    assert_rt(t)


def test_struct_roundtrip():
    n = 2000
    t = pa.table(
        {
            "st": pa.array(
                [
                    None if i % 19 == 0 else {"a": int(i), "b": f"s{i % 5}", "c": float(i) / 3}
                    for i in range(n)
                ],
                type=pa.struct([("a", pa.int64()), ("b", pa.string()), ("c", pa.float64())]),
            )
        }
    )
    assert_rt(t)


def test_map_roundtrip():
    n = 1000
    t = pa.table(
        {
            "m": pa.array(
                [None if i % 11 == 0 else [(f"k{j}", j * i) for j in range(i % 4)] for i in range(n)],
                type=pa.map_(pa.string(), pa.int64()),
            )
        }
    )
    assert_rt(t)


def test_list_of_struct():
    n = 800
    t = pa.table(
        {
            "ls": pa.array(
                [[{"x": i, "y": f"v{i % 3}"}] * (i % 3) for i in range(n)],
                type=pa.list_(pa.struct([("x", pa.int64()), ("y", pa.string())])),
            )
        }
    )
    assert_rt(t)


def test_list_of_list():
    n = 600
    t = pa.table(
        {
            "ll": pa.array(
                [[[j for j in range(i % 3)]] * (i % 4) for i in range(n)],
                type=pa.list_(pa.list_(pa.int64())),
            )
        }
    )
    assert_rt(t)


# footer / meta / pruning


def test_footer_only_schema():
    buf = io.BytesIO()
    t = all_types_table()
    w = StrawboatWriter(buf, t.schema)
    w.write_table(t)
    w.finish()
    buf.seek(0)
    schema, meta = read_footer(buf)
    assert schema == t.schema
    assert meta.num_rows == t.num_rows
    # per-page min/max persisted for int columns (our §4.1 extension)
    i64_leaf = next(lf for lf in meta.leaves if lf.name == "c_i64")
    assert all(p.min is not None and p.max is not None for p in i64_leaf.pages)


def test_column_pruning_reads_subset():
    buf = io.BytesIO()
    t = all_types_table()
    w = StrawboatWriter(buf, t.schema)
    w.write_table(t)
    w.finish()
    buf.seek(0)
    got = StrawboatReader(buf).read_table(columns=["c_i64", "c_str"])
    assert got.column_names == ["c_i64", "c_str"]
    assert got.column("c_i64").combine_chunks() == t.column("c_i64").combine_chunks()


def test_page_skipping():
    buf = io.BytesIO()
    vals = np.arange(100000)  # sorted → page min/max are tight ranges
    t = pa.table({"x": pa.array(vals)})
    w = StrawboatWriter(buf, t.schema, page_size=8192)
    w.write_table(t)
    w.finish()
    buf.seek(0)

    def page_filter(leaf_pages, n_pages):
        pages = leaf_pages["x"]
        return [not (p.max < 50000 or p.min > 60000) for p in pages]

    got = StrawboatReader(buf).read_table(page_filter=page_filter)
    xs = got.column("x").to_numpy()
    # kept pages cover [50000, 60000] and nothing like the full file
    assert xs.min() <= 50000 and xs.max() >= 60000
    assert len(xs) < len(vals) / 2


def test_parquet_tables_roundtrip():
    """Round-trip the driver's actual tables (flat + list<float>)."""
    import pyarrow.parquet as pq

    for name in ["lineitem", "orders", "customer", "embeddings", "documents"]:
        t = pq.read_table(f"/root/testdata/sf0.001/{name}.parquet")
        assert_rt(t, page_size=4096)


def test_decimal128_roundtrip():
    """Reference stores Int128 via its integer codecs
    (src/compression/integer/traits.rs:30-39); decimal128 pages are
    split into lo/hi 64-bit words, each through the integer family
    (hi word of typical decimals is constant sign extension ->
    OneValue; lo word dict/delta-compresses)."""
    import decimal

    t = pa.table(
        {
            "d": pa.array(
                [None if i % 7 == 0 else decimal.Decimal(i * 100 + i) / 100 for i in range(3000)],
                type=pa.decimal128(20, 2),
            )
        }
    )
    assert_rt(t)
    # negatives: hi word is all-ones sign extension, still OneValue
    neg = pa.table(
        {
            "d": pa.array(
                [decimal.Decimal(-i) / 4 for i in range(4000)], type=pa.decimal128(20, 2)
            )
        }
    )
    assert_rt(neg)
    # the split must actually pay: sorted decimals (delta-friendly lo,
    # constant hi) should compress far below the 16 B/value raw size
    buf = io.BytesIO()
    w = StrawboatWriter(buf, neg.schema)
    w.write_table(neg)
    w.finish()
    assert buf.tell() < neg.num_rows * 4, buf.tell()


def test_uint64_extremes():
    """uint64 above 2^63 must avoid the i64-space codecs."""
    vals = np.array([2**64 - 1, 2**63 + 5, 7, 0] * 1000, dtype=np.uint64)
    assert_rt(pa.table({"u": pa.array(vals)}))
    # constant page of huge values: OneValue is gated, RLE handles it
    assert_rt(pa.table({"u": pa.array(np.full(5000, 2**64 - 2, dtype=np.uint64))}))


def test_fixed_size_binary_roundtrip():
    t = pa.table({"f": pa.array([bytes([i % 250] * 8) for i in range(2000)], type=pa.binary(8))})
    assert_rt(t)


def test_patas_float_roundtrip(monkeypatch):
    """Patas-style XOR-preconditioned float pages (slowly-varying
    series compress well; forcing pins the codec path)."""
    monkeypatch.setenv("STRAWBOAT_PATAS_COMPRESSION", "1")
    walk = np.cumsum(RNG.normal(scale=0.01, size=20000)) + 100.0
    assert_rt(pa.table({"x": pa.array(walk)}))
    assert_rt(pa.table({"y": pa.array(walk.astype(np.float32))}))


def test_patas_packed_roundtrip(monkeypatch):
    """True Patas layout (packed-u16 records, reference patas.rs):
    forced roundtrip over walk / repeat-heavy / special-value pages."""
    monkeypatch.setenv("STRAWBOAT_PATAS_PACKED_COMPRESSION", "1")
    walk = np.cumsum(RNG.normal(scale=0.01, size=20000)) + 100.0
    assert_rt(pa.table({"x": pa.array(walk)}))
    assert_rt(pa.table({"y": pa.array(walk.astype(np.float32))}))
    periodic = np.tile(np.round(RNG.normal(20, 5, 96), 1), 200)
    assert_rt(pa.table({"p": pa.array(periodic)}))
    # NaN != NaN under Arrow equality — compare bit patterns via numpy
    special = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0] * 2000)
    got = roundtrip(pa.table({"s": pa.array(special)}))
    out = got.column("s").combine_chunks().to_numpy(zero_copy_only=False)
    assert np.array_equal(out.view(np.uint64), special.view(np.uint64))


def test_patas_packed_matches_reference_semantics():
    """The vectorized encoder must emit exactly the reference's
    per-record (ref_diff, sig_bytes, trailing_zeros) stream
    (patas.rs:52-101: most recent equal value within the 128-slot
    ring, else previous element; unseen values inside the first 128
    positions reference element 0)."""
    from strawboat_spark.sources.codecs import _patas_pack_body

    vals = np.repeat(RNG.normal(0, 1, 40), 50)[RNG.permutation(2000)]
    bits = np.ascontiguousarray(vals).view(np.uint64)

    indices: dict[int, int] = {}
    expect = []
    blist = [int(b) for b in bits]
    for i, val in enumerate(blist):
        if i:
            ref = indices.get(val, 0)
            if ref > i or (i - ref) >= 128:
                ref = i - 1
            xor = val ^ blist[ref]
            if xor == 0:
                tz_stored, sig = 63, 0
            else:
                tz = (xor & -xor).bit_length() - 1
                sig_bits = xor.bit_length() - tz
                tz_stored, sig = tz, (sig_bits + 7) >> 3
            expect.append((i - ref, sig & 7, tz_stored))
        indices[val] = i
    body = _patas_pack_body(bits)
    hdr = np.frombuffer(body, "<u2", len(bits) - 1, offset=8)
    got = list(zip((hdr >> 9).tolist(), ((hdr >> 6) & 7).tolist(), (hdr & 63).tolist()))
    assert got == expect


def test_patas_chosen_adaptively():
    """A smooth series should pick PATAS over plain zstd on merit."""
    from strawboat_spark.sources.pagefile import write_file
    from strawboat_spark.sources.stat import stat_file

    # timestamp-like doubles: shared exponent/top-mantissa, unique values
    # (dict-ineligible) — xor stream compresses ~2x better than raw
    ts = 1.7e9 + np.arange(30000) * 0.001 + RNG.normal(scale=1e-6, size=30000)
    write_file("/tmp/patas_adaptive.strb", pa.table({"x": pa.array(ts)}))
    st = next(s for s in stat_file("/tmp/patas_adaptive.strb") if s.name == "x")
    assert "PATAS" in st.codecs, st.codecs


def test_null_type_column():
    """Arrow NullType column round-trips (reference supports Null
    arrays — README.md:84-97 support matrix)."""
    t = pa.table({"n": pa.nulls(2000, type=pa.null()), "x": pa.array(range(2000))})
    assert_rt(t, page_size=256)


def test_struct_binary_and_list():
    """struct{binary, list(int)} — the mixed nested case from the
    reference's test matrix (tests/it/io.rs:168-278)."""
    s = pa.StructArray.from_arrays(
        [
            pa.array([bytes([i % 250]) * (i % 7) for i in range(3000)], type=pa.binary()),
            pa.array([[i, i + 1, i + 2][: i % 4] for i in range(3000)], type=pa.list_(pa.int64())),
        ],
        names=["b", "l"],
    )
    assert_rt(pa.table({"s": s}), page_size=512)


def test_freq_double_and_binary():
    """Freq codec on doubles and strings: one dominant value with
    high-cardinality exceptions (dict-hostile, freq-friendly) —
    reference double/freq.rs, binary/freq.rs."""
    n = 20000
    exc = RNG.random(n) < 0.05
    d = np.full(n, 3.14)
    d[exc] = RNG.random(int(exc.sum())) * 1e6
    vals = [
        bytes(RNG.integers(0, 256, 64, dtype=np.uint8)) if e else b"common"
        for e in exc
    ]
    t = pa.table({"d": pa.array(d), "s": pa.array(vals, type=pa.binary())})
    assert_rt(t)

    from strawboat_spark.sources.pagefile import write_file
    from strawboat_spark.sources.stat import stat_file

    write_file("/tmp/freq_db.strb", t)
    codecs = {s.name: s.codecs for s in stat_file("/tmp/freq_db.strb")}
    assert any("FREQ" in c for c in codecs["d"]), codecs
    assert any("FREQ" in c for c in codecs["s"]), codecs


def test_freq_forced_roundtrip(monkeypatch):
    monkeypatch.setenv("STRAWBOAT_FREQ_COMPRESSION", "1")
    n = 5000
    d = np.full(n, 1.5)
    d[::97] = RNG.random(len(d[::97]))
    strs = ["x"] * n
    for i in range(0, n, 83):
        strs[i] = f"exc{i}"
    assert_rt(pa.table({"d": pa.array(d), "s": pa.array(strs)}))


def test_writer_memory_bounded():
    """The writer encodes pages incrementally: peak Arrow allocation
    during a many-batch write stays O(one page + one batch), never
    O(raw partition) (reference streams page-by-page, SURVEY §3.2)."""
    import io

    from strawboat_spark.sources.pagefile import StrawboatReader, StrawboatWriter

    schema = pa.schema([("s", pa.string()), ("v", pa.int64())])
    sink = io.BytesIO()
    w = StrawboatWriter(sink, schema, page_size=4096)
    base = pa.total_allocated_bytes()
    batch_rows, n_batches = 10_000, 30
    raw = 0
    peak = 0
    for i in range(n_batches):
        batch = pa.record_batch(
            [
                pa.array([f"row-{i}-{j % 7}" * 8 for j in range(batch_rows)]),
                pa.array(np.arange(batch_rows, dtype=np.int64) + i),
            ],
            schema=schema,
        )
        raw += batch.nbytes
        w.write_batch(batch)
        del batch
        peak = max(peak, pa.total_allocated_bytes() - base)
        assert w._pending is None or w._pending.num_rows < 4096
    w.finish()
    assert raw > 20_000_000
    assert peak < raw // 4, f"writer retained {peak} of {raw} raw bytes"
    sink.seek(0)
    t = StrawboatReader(sink).read_table()
    assert t.num_rows == batch_rows * n_batches
    assert t.column("v").length() == batch_rows * n_batches


def test_reader_coalesces_ranged_reads():
    """A full scan of a many-page file does one ranged read per leaf
    (plus the footer), not one read per page per leaf."""
    import io

    from strawboat_spark.sources.pagefile import StrawboatReader, StrawboatWriter

    t = pa.table(
        {
            "a": pa.array(np.arange(128 * 256, dtype=np.int64)),
            "b": pa.array([f"s{i % 100}" for i in range(128 * 256)]),
        }
    )
    sink = io.BytesIO()
    w = StrawboatWriter(sink, t.schema, page_size=256)
    w.write_table(t)
    meta = w.finish()
    assert len(meta.leaves[0].pages) == 128

    class CountingIO(io.BytesIO):
        reads = 0

        def read(self, *a):
            CountingIO.reads += 1
            return super().read(*a)

    src = CountingIO(sink.getvalue())
    r = StrawboatReader(src)
    after_footer = CountingIO.reads
    out = r.read_table()
    assert out.num_rows == t.num_rows
    data_reads = CountingIO.reads - after_footer
    assert data_reads <= len(meta.leaves), f"{data_reads} reads for {len(meta.leaves)} leaves"


def test_bitpack_per_block_widths():
    """One outlier value must not inflate the whole page: per-128-block
    widths (reference BitPacker4x) keep the payload near the tight
    encoding, and round-trip exactly."""
    from strawboat_spark.sources import codecs as C

    n = 8192
    small = RNG.integers(0, 16, n).astype(np.int64)  # width 4
    outlier = small.copy()
    outlier[5000] = 1 << 40  # single wide value

    enc_small = C.compress_integer(small, forbidden=frozenset({C.Codec.DICT, C.Codec.RLE, C.Codec.FREQ}))
    enc_out = C.compress_integer(outlier, forbidden=frozenset({C.Codec.DICT, C.Codec.RLE, C.Codec.FREQ}))
    dec, _ = C.decompress_integer(memoryview(enc_out), 0, n, np.dtype(np.int64))
    assert (dec == outlier).all()
    # the outlier page must cost far less than a whole-page width-41
    # encoding (~42KB) — within 2x of the clean page
    assert len(enc_out) < 2 * len(enc_small) + 1024, (len(enc_out), len(enc_small))

    # sorted-with-jump: delta stream gets the same treatment
    sorted_v = np.cumsum(RNG.integers(0, 4, n)).astype(np.int64)
    sorted_v[4000:] += 1 << 40
    enc_sj = C.compress_integer(sorted_v, forbidden=frozenset({C.Codec.DICT, C.Codec.RLE, C.Codec.FREQ, C.Codec.BITPACKING}))
    dec2, _ = C.decompress_integer(memoryview(enc_sj), 0, n, np.dtype(np.int64))
    assert (dec2 == sorted_v).all()
    assert len(enc_sj) < 8192, len(enc_sj)


def test_corrupt_file_errors_are_clear():
    """Truncated or mangled files must raise recognizable errors at
    open/read time — never silently return wrong data (the reference's
    EOS/footer validation contract, src/read/reader.rs)."""
    import pytest

    from strawboat_spark.sources.pagefile import StrawboatReader, read_footer

    t = pa.table({"a": pa.array(np.arange(5000)), "s": pa.array([f"v{i}" for i in range(5000)])})
    buf = io.BytesIO()
    w = StrawboatWriter(buf, t.schema, page_size=1024)
    w.write_table(t)
    w.finish()
    full = buf.getvalue()

    # truncated tail (footer gone)
    with pytest.raises(ValueError, match="strawboat"):
        read_footer(io.BytesIO(full[: len(full) // 2]))

    # bad magic: footer reads are tail-only by design, but the full
    # reader must reject the file
    with pytest.raises(ValueError, match="magic"):
        StrawboatReader(io.BytesIO(b"NOTMAGIC" + full[8:])).read_table()

    # flipped byte inside the footer meta JSON: planning must fail
    # loudly, never plan from garbage
    body = bytearray(full)
    body[len(full) - 30] ^= 0xFF
    with pytest.raises(Exception):
        read_footer(io.BytesIO(bytes(body)))


def test_batch_dict_fast_path_chunked_writes_and_stats():
    """The batch-level dictionary fast path (r11): low-card string
    columns must round-trip exactly when written through multiple
    write_table calls with non-page-aligned sizes (ctx cursor realigns
    per call; tails fall back to the per-page chooser), and the pages
    must carry EXACT distinct/ndv stats like the per-page path did."""
    import io

    import numpy as np
    import pyarrow as pa

    from strawboat_spark.sources.codecs import Codec
    from strawboat_spark.sources.pagefile import StrawboatReader, StrawboatWriter

    rng = np.random.default_rng(7)
    n = 10_000
    vals = np.array([f"k{i}" for i in range(9)])
    t = pa.table(
        {
            "s": pa.array(vals[rng.integers(0, 9, n)]),
            "hi": pa.array([f"unique-{i}" for i in range(n)]),  # high-card: general path
            "x": pa.array(rng.integers(0, 1000, n)),
        }
    )
    buf = io.BytesIO()
    w = StrawboatWriter(buf, t.schema, page_size=1024, default_codec=Codec.ZSTD)
    # odd chunk sizes: leftovers cross write_table calls, tail at finish
    for lo in range(0, n, 3000):
        w.write_table(t.slice(lo, 3000))
    meta = w.finish()
    buf.seek(0)
    back = pa.Table.from_batches(list(StrawboatReader(buf).iter_batches()))
    assert back.equals(t)
    # the low-card leaf's pages carry exact distinct sets -> exact NDV
    leaf = meta.leaves[0]
    assert leaf.ndv == 9
    assert all(p.distinct is not None and p.min is not None for p in leaf.pages)
    full = set()
    for p in leaf.pages:
        full.update(p.distinct)
    assert full == set(vals.tolist())


def test_batch_dict_fast_path_disabled_with_nulls_and_forced_codec(monkeypatch):
    """Nullable slices and env-forced codecs must bypass the batch-dict
    fast path (nulls: ctx is never built; forced: adaptive choice is
    overridden) and still round-trip."""
    import io

    import numpy as np
    import pyarrow as pa

    from strawboat_spark.sources.codecs import Codec
    from strawboat_spark.sources.pagefile import StrawboatReader, StrawboatWriter

    rng = np.random.default_rng(11)
    n = 5000
    vals = [None if i % 17 == 0 else f"v{i % 5}" for i in range(n)]
    t = pa.table({"s": pa.array(vals, type=pa.string())})
    buf = io.BytesIO()
    w = StrawboatWriter(buf, t.schema, page_size=1024, default_codec=Codec.ZSTD)
    assert not w._dict_ctx
    w.write_table(t)
    assert not w._dict_ctx  # nulls -> no ctx
    w.finish()
    buf.seek(0)
    assert pa.Table.from_batches(list(StrawboatReader(buf).iter_batches())).equals(t)

    monkeypatch.setenv("STRAWBOAT_RLE_COMPRESSION", "1")
    t2 = pa.table({"s": pa.array([f"v{i % 5}" for i in range(n)])})
    buf2 = io.BytesIO()
    w2 = StrawboatWriter(buf2, t2.schema, page_size=1024, default_codec=Codec.ZSTD)
    w2.write_table(t2)
    assert not w2._dict_ctx  # forced codec -> adaptive fast path off
    w2.finish()
    buf2.seek(0)
    assert pa.Table.from_batches(list(StrawboatReader(buf2).iter_batches())).equals(t2)
