"""The strawboat file: magic | per-leaf page streams | footer.

Layout parity with the reference (SURVEY.md §1.3, strawboat
`src/write/writer.rs:96-166`): a single logical row group per file;
every leaf column is its own contiguous byte range of pages, readable
independently (column pruning = seek to that leaf's offset and read
only its bytes); the footer carries the Arrow IPC schema + per-leaf
page metadata + fixed-size trailer, so schema inference reads only the
file tail (reference `src/read/reader.rs:227-241`).

Extensions over the reference (SURVEY.md §4.1): per-page
min/max/null_count are PERSISTED in the footer meta, enabling
filter-pushdown page skipping (the reference computes these stats for
codec choice but throws them away — its `skip_page` mechanism has no
metadata to drive it).

Page alignment invariant: top-level rows are sliced into fixed
`page_size` chunks FIRST, then each chunk is decomposed into leaves —
so page i of every leaf covers the same top-level rows, and skipping
page i skips it across all leaves consistently (including nested
children, whose per-page value counts vary).

Nested types: List/LargeList/Struct/Map decompose into leaf streams
depth-first (offsets leaf carries the nest's validity; struct gets a
validity-only leaf). The reference delegates this to parquet2 rep/def
levels; we store Arrow-native offsets+validity instead — simpler and
loss-free for the supported tree (no unions/dictionaries, matching
the reference's declared support at README.md:84-97).
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from strawboat_spark.sources.codecs import (
    Codec,
    _compress_codes_into,
    _compress_offsets_into,
    collect_stats,
    compress_binary,
    compress_boolean,
    compress_double,
    compress_fixed,
    compress_integer,
    decompress_binary,
    decompress_boolean,
    decompress_double,
    decompress_fixed,
    decompress_integer,
    write_block,
)

MAGIC = b"STRWBOT1"
EOS = b"STRWBEND"
DEFAULT_PAGE_SIZE = 8192


# --------------------------------------------------------------------------
# Leaf model
# --------------------------------------------------------------------------

_INT_KINDS = ("int", "uint", "date", "timestamp", "time", "duration")


def _leaf_kind(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t) or pa.types.is_date(t) or pa.types.is_timestamp(t) or pa.types.is_time(t) or pa.types.is_duration(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_decimal(t) or pa.types.is_fixed_size_binary(t):
        return "fixed"
    if pa.types.is_null(t):
        return "null"
    # Dictionary/union unsupported — same boundary as the reference
    # (unreachable! at src/write/serialize.rs:122-127).
    raise NotImplementedError(f"unsupported leaf type: {t}")


def _numpy_dtype(t: pa.DataType) -> np.dtype:
    if pa.types.is_date32(t) or pa.types.is_time32(t):
        return np.dtype(np.int32)
    if pa.types.is_date64(t) or pa.types.is_timestamp(t) or pa.types.is_time64(t) or pa.types.is_duration(t):
        return np.dtype(np.int64)
    return np.dtype(t.to_pandas_dtype())


def _flatten_type(name: str, t: pa.DataType, leaves: list[dict]) -> dict:
    """Build the field tree and append leaf descriptors depth-first."""
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        node = {"kind": "list", "leaf": len(leaves), "large": pa.types.is_large_list(t)}
        leaves.append({"name": f"{name}.offsets", "kind": "offsets"})
        node["child"] = _flatten_type(f"{name}.item", t.value_type, leaves)
        return node
    if pa.types.is_map(t):
        node = {"kind": "map", "leaf": len(leaves)}
        leaves.append({"name": f"{name}.offsets", "kind": "offsets"})
        node["key"] = _flatten_type(f"{name}.key", t.key_type, leaves)
        node["item"] = _flatten_type(f"{name}.value", t.item_type, leaves)
        return node
    if pa.types.is_struct(t):
        node = {"kind": "struct", "leaf": len(leaves), "children": []}
        leaves.append({"name": f"{name}.validity", "kind": "validity"})
        for i in range(t.num_fields):
            f = t.field(i)
            node["children"].append(_flatten_type(f"{name}.{f.name}", f.type, leaves))
        return node
    kind = _leaf_kind(t)
    node = {"kind": kind, "leaf": len(leaves)}
    leaves.append({"name": name, "kind": kind})
    return node


# --------------------------------------------------------------------------
# Array (de)composition helpers
# --------------------------------------------------------------------------


def _validity_np(arr: pa.Array) -> np.ndarray | None:
    if arr.null_count == 0:
        return None
    return np.asarray(arr.is_valid())


def _pack_validity(valid: np.ndarray | None) -> bytes:
    if valid is None:
        return struct.pack("<I", 0)
    packed = np.packbits(valid.astype(np.uint8), bitorder="little").tobytes()
    return struct.pack("<I", len(packed)) + packed


def _read_validity(buf: memoryview, pos: int, n: int) -> tuple[np.ndarray | None, int]:
    (ln,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if ln == 0:
        return None, pos
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8, count=ln, offset=pos),
        count=n,
        bitorder="little",
    ).astype(bool)
    return bits, pos + ln


def _validity_buffer(valid: np.ndarray | None) -> pa.Buffer | None:
    if valid is None:
        return None
    return pa.py_buffer(np.packbits(valid.astype(np.uint8), bitorder="little").tobytes())


# --------------------------------------------------------------------------
# Meta structures
# --------------------------------------------------------------------------


@dataclass
class PageMeta:
    length: int  # compressed bytes incl. validity section
    num_values: int
    null_count: int = 0
    min: object = None
    max: object = None
    # Full distinct-value list for low-cardinality string pages (<=32
    # uniques, each json-safe) — enables exact membership pruning on
    # EqualTo/In where min/max can't prove absence (reference surfaces
    # the same dict stats via stat(), src/stat.rs:63-152). None = stat
    # absent; never prune on its absence.
    distinct: list | None = None
    # base64 bloom blob (codecs._bloom_build) for opt-in string
    # equality pruning on high-cardinality pages. None = stat absent.
    bloom: str | None = None
    # Page NDV estimate (exact for low-cardinality pages, sampled
    # otherwise) — WRITE-TIME ONLY: aggregated into LeafMeta.ndv at
    # finish(), never serialized per page.
    ndv: int | None = None


@dataclass
class LeafMeta:
    name: str
    offset: int = 0
    pages: list[PageMeta] = field(default_factory=list)
    # Leaf-level NDV estimate, persisted in the footer (and thus the
    # manifest's embedded meta): exact union when every page carried a
    # distinct list, else the sum of page estimates (an upper-leaning
    # estimate: cross-page duplicates double-count).  Lets the table
    # layer size join broadcasts and report cardinality from METADATA —
    # no distinct-count job.  None on legacy files.
    ndv: int | None = None
    # Leaf-level distinct set (<=32 values, json-safe) when every page
    # carried one — lets Table.ndv_est() union across FILES for an
    # exact table-wide NDV on low-cardinality columns.
    distinct: list | None = None


@dataclass
class FileMeta:
    num_rows: int
    page_size: int
    fields: list[dict]  # type tree per top-level field
    leaves: list[LeafMeta]

    def to_json(self) -> bytes:
        return json.dumps(
            {
                "version": 1,
                "num_rows": self.num_rows,
                "page_size": self.page_size,
                "fields": self.fields,
                "leaves": [
                    {
                        "name": lf.name,
                        "offset": lf.offset,
                        **({"ndv": lf.ndv} if lf.ndv is not None else {}),
                        **({"distinct": lf.distinct} if lf.distinct is not None else {}),
                        "pages": [
                            [p.length, p.num_values, p.null_count, p.min, p.max]
                            + (
                                [p.distinct, p.bloom]
                                if p.bloom is not None
                                else ([p.distinct] if p.distinct is not None else [])
                            )
                            for p in lf.pages
                        ],
                    }
                    for lf in self.leaves
                ],
            }
        ).encode()

    @staticmethod
    def from_json(raw: bytes) -> "FileMeta":
        d = json.loads(raw.decode())
        return FileMeta(
            num_rows=d["num_rows"],
            page_size=d["page_size"],
            fields=d["fields"],
            leaves=[
                LeafMeta(
                    name=lf["name"],
                    offset=lf["offset"],
                    pages=[PageMeta(*p) for p in lf["pages"]],
                    ndv=lf.get("ndv"),
                    distinct=lf.get("distinct"),
                )
                for lf in d["leaves"]
            ],
        )


def _json_safe(v):
    if v is None:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if (f != f) else f  # NaN -> no stat
    if isinstance(v, bytes):
        try:
            s = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
        return s if len(s) <= 64 else None  # truncated stats unsafe for pruning
    if isinstance(v, str):
        return v if len(v) <= 64 else None
    return int(v) if isinstance(v, (int,)) else v


# --------------------------------------------------------------------------
# Writer
# --------------------------------------------------------------------------


class StrawboatWriter:
    """Single-row-group columnar writer (reference NativeWriter,
    `src/write/writer.rs` — state machine start→write→finish)."""

    def __init__(
        self,
        sink,  # file-like with write(); caller owns lifecycle
        schema: pa.Schema,
        page_size: int = DEFAULT_PAGE_SIZE,
        default_codec: Codec = Codec.ZSTD,
        forbidden: frozenset = frozenset(),
        compress_ratio: float | None = None,
        bloom_columns: frozenset = frozenset(),
    ):
        # `forbidden` mirrors the reference WriteOptions
        # forbidden_compressions (src/write/common.rs:37-45): codecs the
        # adaptive chooser must not pick (the codec byte keeps files
        # readable regardless — dropping a codec is a config choice,
        # not a format break).
        self.sink = sink
        # Dictionary-encoded inputs are decoded to their value type at
        # the boundary (dictionary is an ENCODING here, chosen per-page
        # by the adaptive chooser — not a logical type; the reference
        # rejects Dictionary outright, serialize.rs:122-127).
        self.schema = pa.schema(
            [
                f.with_type(f.type.value_type) if pa.types.is_dictionary(f.type) else f
                for f in schema
            ],
            metadata=schema.metadata,
        )
        self.page_size = page_size
        self.default_codec = default_codec
        self.forbidden = frozenset(forbidden)
        # Opt-in per-page bloom filters for string equality pruning on
        # high-cardinality columns dict-distinct stats can't cover
        # (~10 bits/value footer cost + a vectorized hash pass per
        # page, so it is a choice, not a default).
        self.bloom_columns = frozenset(bloom_columns)
        # reference WriteOptions.default_compress_ratio: minimum
        # estimated ratio a specialized codec needs to be considered.
        self.compress_ratio = compress_ratio
        # Streaming state: pages are encoded as soon as a full
        # page_size of rows is buffered, so peak memory is
        # O(compressed output + one raw page), never O(raw partition)
        # (the reference's bounded-memory write loop,
        # src/write/common.rs:49-119).
        self._leaf_descr: list[dict] = []
        self._fields_tree = [
            _flatten_type(f.name, f.type, self._leaf_descr) for f in self.schema
        ]
        self._leaves = [LeafMeta(name=d["name"]) for d in self._leaf_descr]
        self._streams: list[bytearray] = [bytearray() for _ in self._leaves]
        # Per-leaf sticky codec choice (codecs._memo_sticky): columns
        # whose pages keep falling through to the general codec skip
        # the stats/estimate/sample pipeline on subsequent pages. The
        # "forced" key snapshots the env-forced codec list once per
        # writer so the per-candidate hot path skips environ lookups
        # (tests set the env before constructing the writer).
        from strawboat_spark.sources.codecs import _forced

        forced_snapshot = _forced()
        self._codec_memo: list[dict] = [
            {"forced": forced_snapshot} for _ in self._leaves
        ]
        self._pending: pa.Table | None = None
        # Batch-level dictionary contexts (leaf_i -> ctx): low-card
        # string/binary columns dictionary-encode ONCE per write_table
        # call; each page then remaps a numpy slice of the batch codes
        # instead of paying an Arrow probe + dictionary_encode per page
        # (~2x on low-card string write throughput — FORMAT_BENCH r11).
        self._dict_ctx: dict[int, dict] = {}
        self._num_rows = 0
        self._finished = False

    def write_table(self, table: pa.Table) -> None:
        if any(pa.types.is_dictionary(f.type) for f in table.schema):
            table = table.cast(self.schema)
        self._pending = (
            table if self._pending is None else pa.concat_tables([self._pending, table])
        )
        n_full = (self._pending.num_rows // self.page_size) * self.page_size
        self._prepare_dict_ctx(n_full)
        while self._pending.num_rows >= self.page_size:
            page = self._pending.slice(0, self.page_size)
            self._pending = self._pending.slice(self.page_size)
            self._encode_page(page.combine_chunks())
        if self._pending.num_rows == 0:
            # Drop slice references so flushed input buffers can free.
            self._pending = None

    def write_batch(self, batch: pa.RecordBatch) -> None:
        self.write_table(pa.Table.from_batches([batch]))

    def _prepare_dict_ctx(self, n_full: int) -> None:
        """Batch-level dictionary pass for low-cardinality TOP-LEVEL
        string/binary columns: probe + dictionary_encode ONCE over the
        `n_full` rows about to be paged out (always a whole number of
        pages), so each page's encode is a pure-numpy remap of a codes
        slice — no per-page Arrow calls.  Pages stay bit-compatible
        with the per-page Dict layout (self-describing; each page's
        dictionary holds exactly its own values), and per-page stats
        stay EXACT (distinct/ndv from the page's code set), so footer
        NDV exactness and membership pruning are unchanged.

        Disabled (falls back to the per-page chooser) for: nested
        types, nullable slices, bloom-filter columns (they hash raw
        segments), env-forced codecs, custom compress_ratio thresholds,
        and DICT-forbidden writers."""
        self._dict_ctx = {}
        if (
            n_full == 0
            or Codec.DICT in self.forbidden
            or self.compress_ratio is not None
            or not self._codec_memo
            or self._codec_memo[0]["forced"]
        ):
            return
        for col_i in range(len(self.schema)):
            node = self._fields_tree[col_i]
            if node["kind"] != "binary":
                continue
            if self.schema.field(col_i).name in self.bloom_columns:
                continue
            col = self._pending.column(col_i).slice(0, n_full).combine_chunks()
            arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
            if arr.null_count:
                continue
            sample_n = min(len(arr), 256)
            if pc.count_distinct(arr.slice(0, sample_n)).as_py() * 3 >= max(sample_n, 3):
                continue
            denc = arr.dictionary_encode()
            n_uniq = len(denc.dictionary)
            if n_uniq * 3 >= len(arr):
                continue  # sample lied: not actually low-card
            d_off, d_data = _binary_parts(denc.dictionary)
            self._dict_ctx[node["leaf"]] = {
                "codes": denc.indices.to_numpy(zero_copy_only=False).astype(np.int64),
                "d_off": np.ascontiguousarray(d_off, dtype=np.int64),
                "d_data": d_data,
                "pyvals": denc.dictionary.to_pylist(),
                "cursor": 0,
                "rows": n_full,
            }

    def _encode_binary_dict_page(self, ctx: dict, n: int) -> tuple[bytes, "PageMeta"]:
        """One page off a batch dictionary context: numpy-only remap of
        the batch codes slice into a self-describing Dict page (same
        payload layout compress_binary emits: validity + offsets block
        + DICT block whose dictionary holds exactly this page's
        values)."""
        cur = ctx["cursor"]
        ctx["cursor"] = cur + n
        codes_page = ctx["codes"][cur : cur + n]
        d_off, d_data = ctx["d_off"], ctx["d_data"]
        out = bytearray(_pack_validity(None))
        # Block 1: per-row offsets, rebased to 0 (monotone -> delta-bitpack)
        row_lens = d_off[codes_page + 1] - d_off[codes_page]
        page_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(row_lens, out=page_offsets[1:])
        _compress_offsets_into(out, page_offsets, self.default_codec, self.compress_ratio)
        # Block 2: Dict payload over the page's own value set.
        # bincount-based remap instead of np.unique: the batch
        # cardinality K is small by construction (ctx exists only when
        # K*3 < rows), so an O(n + K) counting pass beats the O(n log n)
        # sort unique does.  uniqc ascends, exactly like np.unique.
        counts = np.bincount(codes_page, minlength=len(ctx["pyvals"]))
        uniqc = np.flatnonzero(counts)
        lut = np.zeros(len(counts), dtype=np.int64)
        lut[uniqc] = np.arange(len(uniqc))
        inv = lut[codes_page]
        n_uniq = len(uniqc)
        lens_u = d_off[uniqc + 1] - d_off[uniqc]
        po = np.zeros(n_uniq + 1, dtype=np.int64)
        np.cumsum(lens_u, out=po[1:])
        parts = [d_data[d_off[u] : d_off[u + 1]] for u in uniqc.tolist()]
        body = bytearray()
        body += struct.pack("<I", n_uniq)
        body += po.tobytes()
        body += b"".join(parts)
        _compress_codes_into(body, inv.astype(np.int64), n_uniq, self.forbidden)
        write_block(out, Codec.DICT, bytes(body), int(page_offsets[-1]))
        # Page stats: EXACT — the page's value set is right here.
        # (utf8 byte order == code point order, so min/max over the
        # python values match pc.min_max on the raw page.)
        vals = [ctx["pyvals"][int(u)] for u in uniqc]
        mn, mx = _json_safe(min(vals)), _json_safe(max(vals))
        distinct = None
        if n_uniq <= 32:
            safe = [_json_safe(v) for v in vals]
            distinct = sorted(safe) if None not in safe else None
        return bytes(out), PageMeta(
            len(out), n, 0, mn, mx, distinct, None, ndv=n_uniq
        )

    def _encode_page(self, page: pa.Table) -> None:
        self._num_rows += page.num_rows
        for col_i in range(page.num_columns):
            arr = page.column(col_i).chunk(0)
            self._encode_array(arr, self._fields_tree[col_i], self._streams, self._leaves)

    def finish(self) -> FileMeta:
        if self._finished:
            raise RuntimeError("writer already finished")
        self._finished = True
        if self._pending is not None and self._pending.num_rows:
            self._encode_page(self._pending.combine_chunks())
        self._pending = None

        self.sink.write(MAGIC)
        offset = len(MAGIC)
        for leaf, stream in zip(self._leaves, self._streams):
            leaf.offset = offset
            self.sink.write(bytes(stream))
            offset += len(stream)
            # Footer NDV: exact union when every page carried a full
            # distinct list, else the sum of per-page estimates (an
            # upper-leaning estimate; cross-page dups double-count).
            if leaf.pages:
                if all(p.distinct is not None for p in leaf.pages):
                    u: set = set()
                    for p in leaf.pages:
                        u.update(p.distinct)
                    leaf.ndv = len(u)
                    if len(u) <= 32:
                        leaf.distinct = sorted(u)
                else:
                    leaf.ndv = int(
                        sum(
                            p.ndv
                            if p.ndv is not None
                            else max(p.num_values - p.null_count, 0)
                            for p in leaf.pages
                        )
                    )
            else:
                leaf.ndv = 0

        meta = FileMeta(
            num_rows=self._num_rows,
            page_size=self.page_size,
            fields=[
                {"tree": t, "name": f.name}
                for t, f in zip(self._fields_tree, self.schema)
            ],
            leaves=self._leaves,
        )
        schema_bytes = self.schema.serialize().to_pybytes()
        meta_bytes = meta.to_json()
        self.sink.write(schema_bytes)
        self.sink.write(meta_bytes)
        self.sink.write(struct.pack("<II", len(schema_bytes), len(meta_bytes)))
        self.sink.write(EOS)
        return meta

    # -- encoding ---------------------------------------------------------

    def _encode_array(
        self, arr: pa.Array, node: dict, streams: list[bytearray], leaves: list[LeafMeta]
    ) -> None:
        kind = node["kind"]
        leaf_i = node["leaf"]
        if kind == "list":
            offsets, child, valid = _list_parts(arr)
            page = bytearray(_pack_validity(valid))
            page += compress_integer(offsets, self.default_codec, self.forbidden, ratio=self.compress_ratio)
            streams[leaf_i] += page
            leaves[leaf_i].pages.append(
                PageMeta(len(page), len(arr), arr.null_count)
            )
            self._encode_array(child, node["child"], streams, leaves)
        elif kind == "map":
            offsets, keys, items, valid = _map_parts(arr)
            page = bytearray(_pack_validity(valid))
            page += compress_integer(offsets, self.default_codec, self.forbidden, ratio=self.compress_ratio)
            streams[leaf_i] += page
            leaves[leaf_i].pages.append(
                PageMeta(len(page), len(arr), arr.null_count)
            )
            self._encode_array(keys, node["key"], streams, leaves)
            self._encode_array(items, node["item"], streams, leaves)
        elif kind == "struct":
            valid = _validity_np(arr)
            page = bytearray(_pack_validity(valid))
            streams[leaf_i] += page
            leaves[leaf_i].pages.append(
                PageMeta(len(page), len(arr), arr.null_count)
            )
            for i, child_node in enumerate(node["children"]):
                child = arr.field(i)
                self._encode_array(child, child_node, streams, leaves)
        elif kind == "null":
            leaves[leaf_i].pages.append(PageMeta(0, len(arr), len(arr)))
        else:
            page, pm = self._encode_flat(arr, kind, leaf_i)
            streams[leaf_i] += page
            leaves[leaf_i].pages.append(pm)

    def _encode_flat(self, arr: pa.Array, kind: str, leaf_i: int = -1) -> tuple[bytes, PageMeta]:
        n = len(arr)
        null_count = arr.null_count
        if kind == "binary" and leaf_i >= 0:
            ctx = self._dict_ctx.get(leaf_i)
            # ctx covers exactly the whole-page rows of this write_table
            # call (cursor advances page by page in slice order); the
            # null-free guard is structural — ctx only exists when the
            # whole covered slice had no nulls
            if ctx is not None and null_count == 0 and ctx["cursor"] + n <= ctx["rows"]:
                return self._encode_binary_dict_page(ctx, n)
        valid = _validity_np(arr)
        out = bytearray(_pack_validity(valid))
        mn = mx = None
        distinct = None
        bloom = None
        ndv = None  # page NDV estimate -> footer leaf NDV (finish())
        memo = self._codec_memo[leaf_i] if leaf_i >= 0 else None
        ps: dict = {}
        if kind == "bool":
            vals = np.asarray(arr.fill_null(False))
            if n - null_count > 0:
                nn = vals if valid is None else vals[valid]
                ndv = 1 if len(nn) == 0 or bool(nn.min() == nn.max()) else 2
            out += compress_boolean(vals, self.default_codec, self.forbidden, ratio=self.compress_ratio)
        elif kind == "int":
            dtype = _numpy_dtype(arr.type)
            vals = _int_values(arr, dtype)
            if n - null_count > 0:
                nn = vals if valid is None else vals[valid]
                mn, mx = _json_safe(nn.min()), _json_safe(nn.max())
            out += compress_integer(
                vals, self.default_codec, self.forbidden, ratio=self.compress_ratio,
                memo=memo, stats_out=ps,
            )
            raw_d = ps.get("distinct")
            if raw_d is not None:
                # low-card int page: persist the distinct set (json-safe
                # ints) for EqualTo/In membership pruning + exact NDV
                distinct = sorted(_json_safe(v) for v in raw_d)
        elif kind == "float":
            dtype = _numpy_dtype(arr.type)
            if arr.null_count:
                arr = arr.fill_null(0.0)
            vals = np.asarray(arr).astype(dtype, copy=False)
            if n - null_count > 0:
                nn = vals if valid is None else vals[valid]
                # Spark orders NaN greater than every double, so a page
                # whose only rows matching `x > c` are NaN must not be
                # pruned; parquet-writer convention: no stats when the
                # page contains NaN.
                if not np.isnan(nn).any():
                    mn, mx = _json_safe(nn.min()), _json_safe(nn.max())
            out += compress_double(
                vals, self.default_codec, self.forbidden, ratio=self.compress_ratio,
                memo=memo, stats_out=ps,
            )
        elif kind == "binary":
            offsets, data = _binary_parts(arr)
            if n - null_count > 0:
                if (
                    null_count == 0
                    and len(data) == n
                    and int(offsets[-1]) == n
                    and bool((np.diff(offsets) == 1).all())
                ):
                    # single-byte values (flag/status columns): byte
                    # order == utf8/binary order, numpy beats Arrow
                    bview = np.frombuffer(data, dtype=np.uint8)
                    lo, hi = int(bview.min()), int(bview.max())
                    as_str = pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
                    mn = _json_safe(chr(lo) if as_str else bytes([lo]))
                    mx = _json_safe(chr(hi) if as_str else bytes([hi]))
                else:
                    mm = pc.min_max(arr)
                    mn, mx = _json_safe(mm["min"].as_py()), _json_safe(mm["max"].as_py())
            bstats: dict = {}
            out += compress_binary(
                offsets,
                data,
                self.default_codec,
                self.forbidden,
                ratio=self.compress_ratio,
                stats_out=bstats,
                memo=memo,
            )
            if (
                leaf_i >= 0
                and self._leaf_descr[leaf_i]["name"] in self.bloom_columns
                and n - null_count > 0
            ):
                import base64

                from strawboat_spark.sources.codecs import (
                    _bloom_build,
                    _stable_segment_hashes,
                )

                hashes = _stable_segment_hashes(data, offsets)
                bloom = base64.b64encode(_bloom_build(hashes)).decode()
            raw_distinct = bstats.get("distinct")
            if raw_distinct is not None:
                safe = [_json_safe(v) for v in raw_distinct]
                # nulls are encoded as "" placeholders: "" may appear in
                # the dict without being a real value — extra entries
                # only make pruning less aggressive, so keep them. Any
                # unrepresentable entry (non-utf8 / >64B) voids the stat.
                distinct = sorted(safe) if None not in safe else None
        elif kind == "fixed":
            width = arr.type.byte_width
            buf = arr.buffers()[1]
            raw = bytes(memoryview(buf)[arr.offset * width : (arr.offset + n) * width])
            out += compress_fixed(
                raw, self.default_codec, width, self.forbidden, ratio=self.compress_ratio
            )
        else:
            raise NotImplementedError(kind)
        if ndv is None:
            ndv = ps.get("unique_count")
        if kind == "binary":
            ndv = bstats.get("unique_count", ndv)
        return bytes(out), PageMeta(
            len(out), n, null_count, mn, mx, distinct, bloom, ndv=ndv
        )


def _int_values(arr: pa.Array, dtype: np.dtype) -> np.ndarray:
    """Raw fixed-width values with nulls zeroed (deterministic bytes)."""
    if arr.null_count:
        zero = pa.scalar(0, type=pa.int64()).cast(arr.type)
        arr = pc.fill_null(arr, zero)
    view = arr.buffers()[1]
    off = arr.offset
    return np.frombuffer(view, dtype=dtype, count=len(arr), offset=off * dtype.itemsize).copy()


def _binary_parts(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    if arr.null_count:
        arr = arr.fill_null(b"" if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type) else "")
    large = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    odt = np.int64 if large else np.int32
    raw_off = np.frombuffer(arr.buffers()[1], dtype=odt, count=len(arr) + 1, offset=arr.offset * np.dtype(odt).itemsize)
    data_buf = arr.buffers()[2]
    # memoryview slice: avoid copying the whole table's value buffer per page
    data = bytes(memoryview(data_buf)[int(raw_off[0]) : int(raw_off[-1])]) if data_buf is not None else b""
    offsets = (raw_off.astype(np.int64) - int(raw_off[0]))
    return offsets, data


def _list_parts(arr: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray | None]:
    large = pa.types.is_large_list(arr.type)
    odt = np.int64 if large else np.int32
    raw_off = np.frombuffer(arr.buffers()[1], dtype=odt, count=len(arr) + 1, offset=arr.offset * np.dtype(odt).itemsize)
    child = arr.values.slice(int(raw_off[0]), int(raw_off[-1] - raw_off[0]))
    offsets = raw_off.astype(np.int64) - int(raw_off[0])
    return offsets, child, _validity_np(arr)


def _map_parts(arr: pa.Array):
    raw_off = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(arr) + 1, offset=arr.offset * 4)
    lo, hi = int(raw_off[0]), int(raw_off[-1])
    keys = arr.keys.slice(lo, hi - lo)
    items = arr.items.slice(lo, hi - lo)
    offsets = raw_off.astype(np.int64) - lo
    return offsets, keys, items, _validity_np(arr)


# --------------------------------------------------------------------------
# Reader
# --------------------------------------------------------------------------


_FOOTER_PREFETCH = 64 * 1024


def read_footer(fobj) -> tuple[pa.Schema, FileMeta]:
    """Footer-only read (reference infer_schema/read_meta: seek End(-16)).

    Reads one `min(total, 64 KiB)` tail slice and parses from memory,
    re-reading only if the footer is larger — the reference's
    read_meta_async optimization (src/read/reader.rs:180-225): one
    ranged GET for planning against an object store instead of three.
    """
    fobj.seek(0, 2)
    total = fobj.tell()
    pre = min(total, _FOOTER_PREFETCH)
    fobj.seek(total - pre)
    tail = fobj.read(pre)
    schema_size, meta_size = struct.unpack("<II", tail[-16:-8])
    if tail[-8:] != EOS:
        raise ValueError("not a strawboat file (bad EOS)")
    footer_len = 16 + schema_size + meta_size
    if footer_len <= pre:
        footer = tail[-footer_len:]
    else:
        fobj.seek(total - footer_len)
        footer = fobj.read(footer_len)
    schema = pa.ipc.read_schema(pa.py_buffer(footer[:schema_size]))
    meta = FileMeta.from_json(footer[schema_size : schema_size + meta_size])
    return schema, meta


class StrawboatReader:
    """Streaming page-at-a-time reader with column pruning and
    min/max page skipping (reference read path §3.2 + our §4.1 ext)."""

    def __init__(self, fobj, schema: pa.Schema | None = None, meta: FileMeta | None = None):
        self.fobj = fobj
        if schema is None or meta is None:
            schema, meta = read_footer(fobj)
            # Full read path: also validate the leading magic (footer
            # reads alone stay tail-only — one ranged GET at planning).
            fobj.seek(0)
            if fobj.read(len(MAGIC)) != MAGIC:
                raise ValueError("not a strawboat file (bad magic)")
        self.schema = schema
        self.meta = meta
        self._leaf_descr: list[dict] = []
        self._trees = [
            _flatten_type(f.name, f.type, self._leaf_descr) for f in schema
        ]
        # Absolute page offsets per leaf, computed once (the naive
        # per-access prefix sum is O(pages²) per stripe and one
        # seek+read syscall per page per leaf).
        self._page_offsets: list[list[int]] = []
        for lf in self.meta.leaves:
            offs = [lf.offset]
            for p in lf.pages:
                offs.append(offs[-1] + p.length)
            self._page_offsets.append(offs)
        # page_i -> bytes, filled by ranged-read prefetch, drained as
        # pages are consumed so buffers free incrementally.
        self._page_cache: dict[int, dict[int, memoryview]] = {}

    def _tree_leaf_ids(self, node: dict) -> list[int]:
        ids = [node["leaf"]]
        kind = node["kind"]
        if kind == "list":
            ids += self._tree_leaf_ids(node["child"])
        elif kind == "map":
            ids += self._tree_leaf_ids(node["key"]) + self._tree_leaf_ids(node["item"])
        elif kind == "struct":
            for c in node["children"]:
                ids += self._tree_leaf_ids(c)
        return ids

    def _prefetch(self, leaf_ids: list[int], keep: list[bool]) -> None:
        """One ranged read per contiguous run of kept pages per leaf
        (object-store friendly: a 64-page stripe costs <= n_leaves GETs
        instead of n_leaves * 64)."""
        runs: list[tuple[int, int]] = []
        i, n = 0, len(keep)
        while i < n:
            if keep[i]:
                j = i
                while j < n and keep[j]:
                    j += 1
                runs.append((i, j))
                i = j
            else:
                i += 1
        for leaf_i in leaf_ids:
            offs = self._page_offsets[leaf_i]
            cache = self._page_cache.setdefault(leaf_i, {})
            for a, b in runs:
                if offs[b] == offs[a]:
                    continue  # zero-length pages (null leaves)
                self.fobj.seek(offs[a])
                buf = memoryview(self.fobj.read(offs[b] - offs[a]))
                for i in range(a, b):
                    cache[i] = buf[offs[i] - offs[a] : offs[i + 1] - offs[a]]

    def _page_selection(self, predicate) -> list[bool]:
        """predicate: callable(leaf_name -> list[PageMeta]) decides pages.
        Returns keep-mask over page indexes (top-level row pages)."""
        n_pages = len(self.meta.leaves[0].pages) if self.meta.leaves else 0
        if predicate is None:
            return [True] * n_pages
        return predicate({lf.name: lf.pages for lf in self.meta.leaves}, n_pages)

    def iter_batches(
        self,
        columns: list[str] | None = None,
        page_filter=None,
    ):
        """Yield one RecordBatch per kept page. ``columns`` prunes to the
        named top-level fields (only their byte ranges are read)."""
        names = [f.name for f in self.schema]
        col_idx = [names.index(c) for c in (columns or names)]
        keep = self._page_selection(page_filter)

        needed: list[int] = []
        for ci in col_idx:
            needed += self._tree_leaf_ids(self._trees[ci])
        self._prefetch(needed, keep)

        for page_i, keep_page in enumerate(keep):
            if not keep_page:
                continue
            arrays, out_fields = [], []
            for ci in col_idx:
                tree = self._trees[ci]
                arr = self._read_node_page(tree, page_i, self.schema.field(ci).type)
                arrays.append(arr)
                out_fields.append(self.schema.field(ci))
            # Drop consumed slices so each run buffer frees once its
            # last page has been yielded.
            for c in self._page_cache.values():
                c.pop(page_i, None)
            yield pa.RecordBatch.from_arrays(arrays, schema=pa.schema(out_fields))

    # -- per-leaf page IO ---------------------------------------------------

    def _page_bytes(self, leaf_i: int, page_i: int) -> memoryview:
        cached = self._page_cache.get(leaf_i)
        if cached is not None and page_i in cached:
            return cached[page_i]
        offs = self._page_offsets[leaf_i]
        self.fobj.seek(offs[page_i])
        return memoryview(self.fobj.read(offs[page_i + 1] - offs[page_i]))

    def _read_node_page(self, node: dict, page_i: int, f_type: pa.DataType) -> pa.Array:
        kind = node["kind"]
        leaf_i = node["leaf"]
        n = self.meta.leaves[leaf_i].pages[page_i].num_values
        if kind in ("list", "map"):
            buf = self._page_bytes(leaf_i, page_i)
            valid, pos = _read_validity(buf, 0, n)
            offsets, _ = decompress_integer(buf, pos, n + 1, np.dtype(np.int64))
            if kind == "list":
                child = self._read_node_page(node["child"], page_i, f_type.value_type)
                return _build_list(f_type, offsets, child, valid)
            keys = self._read_node_page(node["key"], page_i, f_type.key_type)
            items = self._read_node_page(node["item"], page_i, f_type.item_type)
            return _build_map(f_type, offsets, keys, items, valid)
        if kind == "struct":
            buf = self._page_bytes(leaf_i, page_i)
            valid, _ = _read_validity(buf, 0, n)
            children = [
                self._read_node_page(c, page_i, f_type.field(i).type)
                for i, c in enumerate(node["children"])
            ]
            return pa.StructArray.from_buffers(
                f_type, n, [_validity_buffer(valid)], children=children
            )
        if kind == "null":
            return pa.nulls(n, type=pa.null())
        return self._read_flat_page(node, page_i, f_type, n)

    def _read_flat_page(self, node: dict, page_i: int, f_type: pa.DataType, n: int) -> pa.Array:
        buf = self._page_bytes(node["leaf"], page_i)
        valid, pos = _read_validity(buf, 0, n)
        kind = node["kind"]
        if kind == "bool":
            vals, _ = decompress_boolean(buf, pos, n)
            data = pa.py_buffer(np.packbits(vals.astype(np.uint8), bitorder="little").tobytes())
            return pa.Array.from_buffers(pa.bool_(), n, [_validity_buffer(valid), data])
        if kind == "int":
            dtype = _numpy_dtype(f_type)
            vals, _ = decompress_integer(buf, pos, n, dtype)
            return pa.Array.from_buffers(
                f_type, n, [_validity_buffer(valid), pa.py_buffer(np.ascontiguousarray(vals).tobytes())]
            )
        if kind == "float":
            dtype = _numpy_dtype(f_type)
            vals, _ = decompress_double(buf, pos, n, dtype)
            return pa.Array.from_buffers(
                f_type, n, [_validity_buffer(valid), pa.py_buffer(np.ascontiguousarray(vals).tobytes())]
            )
        if kind == "binary":
            offsets, data, _ = decompress_binary(buf, pos, n)
            large = pa.types.is_large_string(f_type) or pa.types.is_large_binary(f_type)
            odt = np.int64 if large else np.int32
            obuf = pa.py_buffer(offsets.astype(odt).tobytes())
            return pa.Array.from_buffers(
                f_type, n, [_validity_buffer(valid), obuf, pa.py_buffer(data)]
            )
        if kind == "fixed":
            raw, _ = decompress_fixed(buf, pos, n)
            return pa.Array.from_buffers(
                f_type, n, [_validity_buffer(valid), pa.py_buffer(raw)]
            )
        raise NotImplementedError(kind)

    def read_table(self, columns: list[str] | None = None, page_filter=None) -> pa.Table:
        batches = list(self.iter_batches(columns, page_filter))
        if not batches:
            names = [f.name for f in self.schema]
            sel = columns or names
            return pa.schema([self.schema.field(c) for c in sel]).empty_table()
        return pa.Table.from_batches(batches)


def _build_list(f_type, offsets: np.ndarray, child: pa.Array, valid) -> pa.Array:
    large = pa.types.is_large_list(f_type)
    odt = np.int64 if large else np.int32
    obuf = pa.py_buffer(offsets.astype(odt).tobytes())
    return pa.Array.from_buffers(
        f_type, len(offsets) - 1, [_validity_buffer(valid), obuf], children=[child]
    )


def _build_map(f_type, offsets: np.ndarray, keys, items, valid) -> pa.Array:
    obuf = pa.py_buffer(offsets.astype(np.int32).tobytes())
    entries = pa.StructArray.from_arrays([keys, items], names=["key", "value"])
    return pa.Array.from_buffers(
        f_type, len(offsets) - 1, [_validity_buffer(valid), obuf], children=[entries]
    )


# --------------------------------------------------------------------------
# Convenience API
# --------------------------------------------------------------------------


def write_file(path: str, table: pa.Table, page_size: int = DEFAULT_PAGE_SIZE, default_codec: Codec = Codec.ZSTD) -> FileMeta:
    from strawboat_spark.sources.fileio import get_fs

    with get_fs(path).create(path) as f:
        w = StrawboatWriter(f, table.schema, page_size, default_codec)
        w.write_table(table)
        return w.finish()


def read_file(path: str, columns: list[str] | None = None, page_filter=None) -> pa.Table:
    from strawboat_spark.sources.fileio import get_fs

    with get_fs(path).open_read(path) as f:
        return StrawboatReader(f).read_table(columns, page_filter)
