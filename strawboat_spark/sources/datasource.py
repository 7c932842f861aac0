"""Spark Python DataSource for the strawboat format.

Usage:
    from strawboat_spark.sources.datasource import register
    register(spark)
    df.write.format("strawboat").mode("overwrite").save(path)
    spark.read.format("strawboat").load(path)

Scale design:
- One input partition per (file, page-range stripe): a directory of
  files written by W writer tasks yields >= W read partitions, and
  large files split into page-aligned stripes of ~STRIPE_PAGES pages
  so a 1000-executor cluster gets even work without any row-level
  coordination (pages are independently decodable by construction).
- Filter pushdown (`pushFilters`) keeps the conjuncts we can evaluate
  against persisted per-page min/max and RETURNS ALL filters to Spark,
  so Spark re-applies them — page skipping is a pure IO reduction,
  never a correctness dependency (SURVEY.md §7.3 risk note).
- The writer is Arrow-native (DataSourceArrowWriter): one strawboat
  file per task, uuid names, two-phase commit via temp dir rename
  semantics (write final names; abort deletes its own files).

Reference parity: read side = §3.2 streaming page iterator (bounded
memory per column); write side = §3.1; schema inference = footer-only
read (§3.4) of ONE file.
"""

from __future__ import annotations

import glob as _glob
import os
import uuid
from dataclasses import dataclass

import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

FILE_EXT = ".strb"
STRIPE_PAGES = 64  # pages per read partition (64 * 8192 rows ≈ 0.5M rows)


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, f"*{FILE_EXT}")))
    return [path]


@dataclass
class _Stripe(InputPartition):
    file: str
    page_start: int
    page_end: int  # exclusive


@dataclass
class _Commit(WriterCommitMessage):
    files: list


class StrawboatDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "strawboat"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        from strawboat_spark.sources.pagefile import read_footer

        path = self.options.get("path")
        if not path:
            raise ValueError("strawboat: 'path' option is required")
        files = _list_files(path)
        if not files:
            raise ValueError(f"strawboat: no {FILE_EXT} files under {path}")
        with open(files[0], "rb") as f:
            arrow_schema, _ = read_footer(f)
        # tz-less arrow timestamps -> TimestampNTZ (what Spark's parquet
        # reader infers); tz-aware ones still map to TimestampType.
        return from_arrow_schema(arrow_schema, prefer_timestamp_ntz=True)

    def reader(self, schema: StructType) -> "StrawboatReaderImpl":
        return StrawboatReaderImpl(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "StrawboatWriterImpl":
        return StrawboatWriterImpl(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):  # noqa: N802
        return StrawboatStreamWriterImpl(self.options, schema, overwrite)


# --------------------------------------------------------------------------
# Read path
# --------------------------------------------------------------------------

_RANGE_OPS = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In)


class StrawboatReaderImpl(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        self.schema = schema
        self._filters: list[Filter] = []

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        for f in filters:
            if isinstance(f, _RANGE_OPS) and len(f.attribute) == 1:
                self._filters.append(f)
            elif isinstance(f, IsNotNull) and len(f.attribute) == 1:
                self._filters.append(f)
        # Return everything: Spark re-applies; our evaluation only skips pages.
        return filters

    def partitions(self):
        from strawboat_spark.sources.pagefile import read_footer

        parts: list[_Stripe] = []
        for file in _list_files(self.path):
            with open(file, "rb") as f:
                _, meta = read_footer(f)
            n_pages = len(meta.leaves[0].pages) if meta.leaves else 0
            if n_pages == 0:
                parts.append(_Stripe(file, 0, 0))
                continue
            for s in range(0, n_pages, STRIPE_PAGES):
                parts.append(_Stripe(file, s, min(s + STRIPE_PAGES, n_pages)))
        return parts

    def read(self, partition: _Stripe):
        from pyspark.sql.pandas.types import to_arrow_schema

        from strawboat_spark.sources.pagefile import StrawboatReader

        want = to_arrow_schema(self.schema)
        with open(partition.file, "rb") as f:
            reader = StrawboatReader(f)
            keep = self._page_mask(reader.meta, partition)
            if not any(keep):
                return
            columns = [c for c in want.names]

            def page_filter(leaf_pages, n_pages):
                return keep

            for batch in reader.iter_batches(columns=columns, page_filter=page_filter):
                # Align arrow types with what Spark expects (e.g. tz).
                yield batch.cast(want, safe=False) if batch.schema != want else batch

    def _page_mask(self, meta, partition: _Stripe) -> list[bool]:
        n_pages = len(meta.leaves[0].pages) if meta.leaves else 0
        keep = [partition.page_start <= i < partition.page_end for i in range(n_pages)]
        pages_by_leaf = {lf.name: lf.pages for lf in meta.leaves}
        for f in self._filters:
            col = f.attribute[0]
            pages = pages_by_leaf.get(col)
            if pages is None:
                continue
            for i in range(n_pages):
                if not keep[i]:
                    continue
                p = pages[i]
                if not _page_may_match(f, p):
                    keep[i] = False
        return keep


def _page_may_match(f: Filter, p) -> bool:
    """Conservative: False only when min/max PROVE no row matches."""
    if isinstance(f, IsNotNull):
        return p.null_count < p.num_values
    mn, mx = p.min, p.max
    if mn is None or mx is None:
        return True
    try:
        if isinstance(f, EqualTo):
            return mn <= f.value <= mx
        if isinstance(f, GreaterThan):
            return mx > f.value
        if isinstance(f, GreaterThanOrEqual):
            return mx >= f.value
        if isinstance(f, LessThan):
            return mn < f.value
        if isinstance(f, LessThanOrEqual):
            return mn <= f.value
        if isinstance(f, In):
            return any(mn <= v <= mx for v in f.value)
    except TypeError:
        return True  # incomparable types (e.g. ts literal vs int stat)
    return True


# --------------------------------------------------------------------------
# Write path
# --------------------------------------------------------------------------


class StrawboatWriterImpl(DataSourceArrowWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        self.options = options
        self.path = options.get("path")
        if not self.path:
            raise ValueError("strawboat: 'path' option is required")
        self.schema = schema
        self.page_size = int(options.get("page_size", 8192))
        self.codec_name = options.get("compression", "zstd")
        # Runs on the driver: prepare the output directory.
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for f in _list_files(self.path):
                os.remove(f)

    def write(self, iterator):
        from pyspark.sql.pandas.types import to_arrow_schema

        from strawboat_spark.sources.codecs import Codec
        from strawboat_spark.sources.pagefile import StrawboatWriter

        codec = {"none": Codec.NONE, "lz4": Codec.LZ4, "zstd": Codec.ZSTD, "snappy": Codec.SNAPPY}[
            self.codec_name.lower()
        ]
        arrow_schema = to_arrow_schema(self.schema)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}{FILE_EXT}")
        tmp = out + ".tmp"
        n = 0
        with open(tmp, "wb") as f:
            w = StrawboatWriter(f, arrow_schema, page_size=self.page_size, default_codec=codec)
            for batch in iterator:
                if batch.schema != arrow_schema:
                    batch = batch.cast(arrow_schema, safe=False)
                w.write_batch(batch)
                n += batch.num_rows
            w.finish()
        os.rename(tmp, out)
        return _Commit(files=[out])

    def commit(self, messages):
        return None

    def abort(self, messages):
        for m in messages:
            if m is not None:
                for f in m.files:
                    try:
                        os.remove(f)
                    except OSError:
                        pass


class StrawboatStreamWriterImpl(DataSourceStreamArrowWriter):
    """Microbatch Arrow sink: each task writes one strawboat file per
    microbatch; abort deletes that batch's files (file-level
    exactly-once under the streaming checkpoint)."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        self.options = options
        self.path = options.get("path")
        if not self.path:
            raise ValueError("strawboat: 'path' option is required")
        self.schema = schema
        self.page_size = int(options.get("page_size", 8192))
        self.codec_name = options.get("compression", "zstd")
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        from pyspark.sql.pandas.types import to_arrow_schema

        from strawboat_spark.sources.codecs import Codec
        from strawboat_spark.sources.pagefile import StrawboatWriter

        codec = {"none": Codec.NONE, "lz4": Codec.LZ4, "zstd": Codec.ZSTD, "snappy": Codec.SNAPPY}[
            self.codec_name.lower()
        ]
        arrow_schema = to_arrow_schema(self.schema)
        out = os.path.join(self.path, f"stream-{uuid.uuid4().hex}{FILE_EXT}")
        tmp = out + ".tmp"
        wrote = False
        with open(tmp, "wb") as f:
            w = StrawboatWriter(f, arrow_schema, page_size=self.page_size, default_codec=codec)
            for batch in iterator:
                if batch.schema != arrow_schema:
                    batch = batch.cast(arrow_schema, safe=False)
                w.write_batch(batch)
                wrote = True
            w.finish()
        if wrote:
            os.rename(tmp, out)
            return _Commit(files=[out])
        os.remove(tmp)
        return _Commit(files=[])

    def commit(self, messages, batchId=None):  # noqa: N803
        return None

    def abort(self, messages, batchId=None):  # noqa: N803
        for m in messages:
            if m is not None:
                for f in m.files:
                    try:
                        os.remove(f)
                    except OSError:
                        pass


def register(spark) -> None:
    """Idempotently register the strawboat format with a session."""
    # pushFilters support requires this conf (runtime-settable).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(StrawboatDataSource)
    except Exception as e:  # already registered in this session
        if "already" not in str(e).lower():
            raise
