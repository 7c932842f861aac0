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
- KNOWN UPSTREAM ISSUE (pyspark 4.1.2, reproducible with a minimal
  pure-API source): after a FILTERED action on a DataFrame from any
  Python data source with filter pushdown enabled, the same DataFrame
  object's LATER actions reuse the filtered scan plan (the JVM caches
  the python-planned partitions in the shared relation and pushdown
  overwrites them). Workaround: create the DataFrame fresh per query
  (`spark.read.format("strawboat").load(path)` — cheap here, planning
  is manifest-cached). Our reader additionally snapshots filters into
  each partition at planning time, so executors never read pruning
  state from the shared reader instance.
- The writer is Arrow-native (DataSourceArrowWriter): one strawboat
  file per task, uuid names, two-phase commit via temp dir rename
  semantics (write final names; abort deletes its own files).

Reference parity: read side = §3.2 streaming page iterator (bounded
memory per column); write side = §3.1; schema inference = footer-only
read (§3.4) of ONE file.
"""

from __future__ import annotations

import os
import re
import uuid
from dataclasses import dataclass
from typing import NamedTuple

import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from strawboat_spark.sources.fileio import backend_path, get_fs, split_scheme

FILE_EXT = ".strb"
STRIPE_BYTES = 32 << 20  # compressed bytes per read partition cap (splits fat pages)
STRIPE_PAGES = 16  # pages per read partition (16 * 8192 rows ≈ 131k rows — the
# analog of spark.sql.files.maxPartitionBytes: fine enough that a handful of
# large files still fans out across executors, coarse enough that per-task
# overhead (Python worker round-trip, footer ranged read) stays amortized

# r18 (guide §4.2): target rows / buffered bytes per batch YIELDED to the
# JVM — pages are decoded page-at-a-time as before but cross the Arrow
# stream as few large frames instead of one frame per 8k-row page.
READ_BATCH_ROWS = int(os.environ.get("SPARK_GRAFT_READ_BATCH_ROWS", "131072"))
READ_BATCH_BYTES = int(os.environ.get("SPARK_GRAFT_READ_BATCH_BYTES", str(64 << 20)))


def _combine_batches(bufs: list) -> "pa.RecordBatch":
    if len(bufs) == 1:
        return bufs[0]
    return pa.Table.from_batches(bufs).combine_chunks().to_batches()[0]
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_INT_LIT = re.compile(r"^-?\d+$")
_DEC_LIT = re.compile(r"^-?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")


# Sentinel for "caller did not supply a pre-read manifest": planning
# reads the manifest ONCE and passes it to every property extractor —
# on an object store each separate read_manifest() is a GET + probe.
_UNSET_MAN = object()


def _manifest_for(root: str, at_generation: int | None = None) -> dict | None:
    return (
        read_manifest_at(root, at_generation)
        if at_generation is not None
        else read_manifest(root)
    )


def column_mapping(
    root: str, at_generation: int | None = None, man=_UNSET_MAN
) -> dict[str, list[str]]:
    """logical column -> historical physical names (newest first), from
    the manifest's `column_mapping` property (metadata-only RENAME —
    Delta column-mapping analog).  Files written before a rename store
    an alias; files written after store the logical name.  Time-travel
    reads resolve against the PINNED generation's mapping, so a
    snapshot renders the names it had then (Delta semantics)."""
    if man is _UNSET_MAN:
        man = _manifest_for(root, at_generation)
    cm = ((man or {}).get("properties") or {}).get("column_mapping") or {}
    return {k: list(v) for k, v in cm.items()}


# Logical-name prefix marking a DROPPED column's tombstone: the
# tombstone owns the dropped column's stored names, so a LATER column
# re-added under the same name can never resurrect the old data.
_DROPPED_PREFIX = "__strawboat_dropped_"


def _file_side_name(file_names, logical: str, cmap) -> str | None:
    """The name `logical` is stored under in a file with `file_names`.

    Ownership rule: a file-side name n belongs to the logical column
    inv.get(n, n) — so a name CLAIMED as some other column's alias
    (after a rename or drop) never resolves directly, even if a newer
    column reuses it (no data resurrection)."""
    cmap = dict(cmap)
    inv = {a: lg for lg, aliases in cmap.items() for a in aliases}
    if logical in file_names and inv.get(logical, logical) == logical:
        return logical
    for alias in cmap.get(logical, ()):
        if alias in file_names:
            return alias
    return None


def _to_logical_schema(arrow_schema, cmap):
    """Rename a footer schema's alias fields to their logical names and
    remove fields owned by a drop tombstone."""
    if not cmap:
        return arrow_schema
    inv = {a: lg for lg, aliases in dict(cmap).items() for a in aliases}
    if not any(f.name in inv for f in arrow_schema):
        return arrow_schema
    fields = [f.with_name(inv.get(f.name, f.name)) for f in arrow_schema]
    return pa.schema([f for f in fields if not f.name.startswith(_DROPPED_PREFIX)])


def _scalar_type(ddl: str):
    """Spark type for an add_column DDL string, resolved WITHOUT an
    active session (schema() runs in the planning worker, where
    DataType.fromDDL cannot).  Declared columns are scalar by
    contract (their defaults are JSON scalars)."""
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    types = {
        "tinyint": ByteType(),
        "smallint": ShortType(),
        "int": IntegerType(),
        "integer": IntegerType(),
        "bigint": LongType(),
        "long": LongType(),
        "float": FloatType(),
        "double": DoubleType(),
        "string": StringType(),
        "boolean": BooleanType(),
        "date": DateType(),
        "timestamp": TimestampType(),
        "timestamp_ntz": TimestampNTZType(),
    }
    t = types.get(ddl.strip().lower())
    if t is None:
        raise ValueError(
            f"strawboat: add_column supports scalar types only, got {ddl!r} "
            f"(supported: {sorted(types)})"
        )
    return t


def declared_columns(
    root: str, at_generation: int | None = None, man=_UNSET_MAN
) -> dict[str, dict]:
    """Columns declared via Table.add_column: name -> {"type": spark
    DDL type, "default": JSON scalar}.  They are part of the LOGICAL
    schema even before any file stores them; files that predate the
    declaration render the default at read time (Delta's
    existingDefault) — the add-a-column-to-100TB-without-rewriting
    operation.  Generation-pinned like column_mapping."""
    if man is _UNSET_MAN:
        man = _manifest_for(root, at_generation)
    return dict(((man or {}).get("properties") or {}).get("column_defaults") or {})


# Metadata-only type widening (Delta type-widening analog): DDL name
# -> (family, bit rank).  Only lossless same-family widenings are
# declarable; everything else must rewrite data.
_WIDEN_FAMILIES = {
    "tinyint": ("int", 8),
    "smallint": ("int", 16),
    "int": ("int", 32),
    "integer": ("int", 32),
    "bigint": ("int", 64),
    "long": ("int", 64),
    "float": ("float", 32),
    "double": ("float", 64),
}

_WIDEN_ARROW = {
    "tinyint": pa.int8(),
    "smallint": pa.int16(),
    "int": pa.int32(),
    "integer": pa.int32(),
    "bigint": pa.int64(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
}


def widened_columns(
    root: str, at_generation: int | None = None, man=_UNSET_MAN
) -> dict[str, str]:
    """Columns re-typed via Table.alter_column_type: logical name ->
    target Spark DDL type.  One manifest flip; files keep their stored
    (narrower) physical type and the read path upcasts — losslessly,
    so stats/page pruning against the narrow page min/max stays exact
    (int widenings are value-preserving; float32 -> float64 is exact,
    and the stored Python-float stats ARE the upcast values).
    Generation-pinned like column_mapping, so time travel renders each
    snapshot under its generation's declared types."""
    if man is _UNSET_MAN:
        man = _manifest_for(root, at_generation)
    return dict(((man or {}).get("properties") or {}).get("column_types") or {})


def bucket_spec(
    root: str, at_generation: int | None = None, man=_UNSET_MAN
) -> dict | None:
    """Hash-bucket layout declared by a bucketed write: {"col": key
    column, "n": bucket count, "dir_col": hive directory column}.
    The bucket id is `pmod(crc32(cast(col AS STRING)), n)` — chosen
    because Spark's crc32 and Python's zlib.crc32 agree bit-for-bit,
    so the PLANNER can hash a pushed equality/IN value and prune to
    1/n of the files without touching a footer.  At 100 TB that turns
    a point lookup from a stats-dependent scan into O(files/n)."""
    if man is _UNSET_MAN:
        man = _manifest_for(root, at_generation)
    return ((man or {}).get("properties") or {}).get("bucket")


def partition_layout(
    root: str, at_generation: int | None = None, man=_UNSET_MAN
) -> list[str] | None:
    """Declared plain-column hive layout (Iceberg partition-spec
    analog): the column list bare appends derive their directory
    layout from.  Declared by an overwrite's explicit partition_by or
    EVOLVED by Table.set_partition_layout — a metadata-only flip, so
    files written under earlier specs keep their layout (directory
    values where they had them, in-file pages where they didn't) and
    are never rewritten.  The read side is per-file already: a stripe
    renders a partition column from its own directory when present,
    from its pages otherwise, and planning's _value_may_match keeps
    any file whose layout doesn't encode the filtered column."""
    if man is _UNSET_MAN:
        man = _manifest_for(root, at_generation)
    return ((man or {}).get("properties") or {}).get("partition_layout")


def partition_layout_types(
    root: str, at_generation: int | None = None, man=_UNSET_MAN
) -> dict:
    """{column: 'bigint'|'double'|'string'} recorded with the declared
    layout — the TYPE AUTHORITY for partition columns.  Directory-name
    inference alone mistypes an evolved column: a STRING column with
    numeric values ('0','1','2') infers bigint from its directory
    names, silently flipping the logical type against the epochs that
    store it in pages.  The declaration knows the real column type, so
    it overrides inference wherever partition fields are typed."""
    if man is _UNSET_MAN:
        man = _manifest_for(root, at_generation)
    return ((man or {}).get("properties") or {}).get("partition_layout_types") or {}


def transform_spec(
    root: str, at_generation: int | None = None, man=_UNSET_MAN
) -> dict | None:
    """Hidden time partitioning (Iceberg `days(ts)` transform):
    {"col": source column, "kind": "days", "dir_col": hive directory
    column}.  The dir value is the ISO date of each row's timestamp —
    ISO strings order lexicographically like the dates themselves, so
    the PLANNER turns a pushed range filter on the RAW timestamp into
    a directory-name interval and prunes whole days without reading a
    footer.  The canonical 100 TB event-table layout: a one-week query
    over three years of data plans 7/1095 of the directories."""
    if man is _UNSET_MAN:
        man = _manifest_for(root, at_generation)
    return ((man or {}).get("properties") or {}).get("partition_transform")


def _transform_prunable(filters, spec: dict | None):
    """Allowed [lo, hi] directory-string interval proven by pushed
    filters on the transform's source column, or None when nothing
    narrows it.  Bounds carry one unit (day/month) of slack so the
    interval is safe regardless of the timestamp's timezone handling
    (a tz skew can move a row at most across one boundary); Spark
    re-applies the exact filter after the scan.  Directory strings
    ('2024-03-07' / '2024-03') sort exactly like the periods they
    name, so comparison stays lexicographic."""
    import datetime as _dt

    if not spec:
        return None
    kind = spec.get("kind", "days")

    def _day(v):
        if isinstance(v, _dt.datetime):
            return v.date()
        if isinstance(v, _dt.date):
            return v
        return None

    def _fmt(d, shift):
        if kind == "months":
            n = d.year * 12 + (d.month - 1) + shift
            return f"{n // 12:04d}-{n % 12 + 1:02d}"
        return (d + _dt.timedelta(days=shift)).isoformat()

    lo = hi = None
    for f in filters:
        if f.attribute[0] != spec["col"]:
            continue
        if isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)):
            d = _day(f.value)
            if d is None:
                continue
            if not isinstance(f, (LessThan, LessThanOrEqual)):
                b = _fmt(d, -1)
                lo = max(lo, b) if lo else b
            if not isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                b = _fmt(d, +1)
                hi = min(hi, b) if hi else b
    if lo is None and hi is None:
        return None
    return (lo, hi)


def _transform_may_match(dval, interval) -> bool:
    if dval is None:
        return True  # null-period dir: never prune
    d = str(dval)
    lo, hi = interval
    if lo is not None and d < lo:
        return False
    if hi is not None and d > hi:
        return False
    return True


def bucket_id(value, n: int) -> int:
    """Python twin of the write-side Spark expression
    pmod(crc32(cast(col AS STRING)), n); values arrive from pushed
    filters as int/str/bytes."""
    import zlib

    if isinstance(value, bytes):
        b = value
    else:
        b = str(value).encode("utf-8")
    return zlib.crc32(b) % n


def _bucket_prunable(filters, spec: dict | None):
    """The set of allowed bucket ids proven by pushed filters on the
    bucket key column, or None when no filter narrows it."""
    if not spec:
        return None
    allowed = None
    for f in filters:
        if f.attribute[0] != spec["col"]:
            continue
        if isinstance(f, EqualTo):
            ids = {bucket_id(f.value, spec["n"])}
        elif isinstance(f, In):
            ids = {bucket_id(v, spec["n"]) for v in f.value}
        else:
            continue
        allowed = ids if allowed is None else (allowed & ids)
    return allowed


def _widened_arrow_field(f: pa.Field, ddl: str) -> pa.Field:
    """Apply one widening declaration to a stored field — only when the
    stored type is a strictly narrower member of the target's family.
    A declaration that no longer matches (column re-typed by a later
    overwrite, non-numeric, already wide) is inert, never an error:
    the footer is the physical truth and widening may only lift it."""
    tgt = _WIDEN_ARROW.get(ddl)
    if tgt is None:
        return f
    t = f.type
    same_int = pa.types.is_signed_integer(t) and pa.types.is_signed_integer(tgt)
    same_float = pa.types.is_floating(t) and pa.types.is_floating(tgt)
    if (same_int or same_float) and t.bit_width < tgt.bit_width:
        return f.with_type(tgt)
    return f


def _apply_widening(arrow_schema: pa.Schema, wmap: dict[str, str]) -> pa.Schema:
    if not wmap:
        return arrow_schema
    return pa.schema(
        [
            _widened_arrow_field(f, wmap[f.name]) if f.name in wmap else f
            for f in arrow_schema
        ]
    )


def entry_abs(root: str, p: str) -> str:
    """Manifest entry -> absolute file path.  Entries are root-relative
    EXCEPT shallow-clone external references (Table.clone), which carry
    a scheme or an absolute backend path: scheme'd entries return
    verbatim; os.path.join already yields plain absolutes unchanged."""
    if split_scheme(p)[0]:
        return p
    return os.path.join(root, p)


def is_external_entry(p: str) -> bool:
    """True when a manifest entry references a file OUTSIDE its table
    root (a shallow-clone reference)."""
    return bool(split_scheme(p)[0]) or os.path.isabs(p)


def _list_files(path: str, at_generation: int | None = None, man=_UNSET_MAN) -> list[str]:
    fs = get_fs(path)
    if fs.isdir(path):
        if man is _UNSET_MAN:
            man = _manifest_for(path, at_generation)
        if man is not None:
            # Manifest present: its entry list IS the committed
            # generation (snapshot isolation for compact/appends), and
            # its embedded footers pre-warm planning.
            _seed_footer_cache(path, man)
            return sorted(entry_abs(path, e["path"]) for e in man["entries"])
        if at_generation is not None:
            raise ValueError(
                f"strawboat: at_generation={at_generation} but {path} has no manifest"
            )
        return fs.list_files(path, FILE_EXT)
    return [path]


def _partition_values(file: str, root: str) -> dict[str, str | None]:
    """Hive-style `col=value` directory components between root and file."""
    import urllib.parse

    vals: dict[str, str | None] = {}
    f_p, r_p = backend_path(file), backend_path(root)
    if not split_scheme(file)[0]:
        f_p, r_p = os.path.abspath(f_p), os.path.abspath(r_p)
    rel = os.path.relpath(os.path.dirname(f_p), r_p)
    for seg in rel.split(os.sep):
        if "=" in seg:
            k, v = seg.split("=", 1)
            vals[k] = None if v == _HIVE_NULL else urllib.parse.unquote(v)
    return vals


def _infer_partition_fields(
    root: str, files: list[str], man=_UNSET_MAN
) -> list[tuple[str, str]]:
    """(name, spark_type) for each hive partition column, inferred like
    Spark's parquet source: all-long -> bigint, all-numeric -> double,
    else string. Nulls don't veto a numeric type. A declared layout's
    recorded types OVERRIDE inference (partition_layout_types) —
    directory names alone mistype string columns with numeric values."""
    declared = partition_layout_types(root, man=man)
    cols: dict[str, list[str | None]] = {}
    for f in files:
        for k, v in _partition_values(f, root).items():
            cols.setdefault(k, []).append(v)

    def _type(vals: list[str | None]) -> str:
        # Strict literal forms only: Python int()/float() accept values
        # Spark's cast would not ('1_0' -> 10, 'inf'/'nan'), which would
        # make the reattached constant diverge from the written string.
        non_null = [v for v in vals if v is not None]
        if non_null and all(_INT_LIT.match(v) for v in non_null):
            return "bigint"
        if non_null and all(_DEC_LIT.match(v) for v in non_null):
            return "double"
        return "string"

    return [(k, declared.get(k) or _type(v)) for k, v in cols.items()]


def _cast_partition_value(v: str | None, spark_type: str):
    if v is None:
        return None
    if spark_type == "bigint":
        return int(v)
    if spark_type == "double":
        return float(v)
    return v


@dataclass
class _Stripe(InputPartition):
    file: str
    page_start: int
    page_end: int  # exclusive
    part_values: tuple = ()  # ((col, value), ...) from hive-style dirs
    # The query's pushed filters ride INSIDE the partition: executors
    # prune pages from the snapshot the planner took, never from
    # mutable reader state (the upstream plan-cache issue in the module
    # docstring makes reader-held state untrustworthy across plans).
    filters: tuple = ()
    # Merge-on-read deletion vector: PHYSICAL row ordinals (file-wide,
    # pre-deletion numbering) falling inside this stripe's page range,
    # sorted. Rows at these ordinals are dropped at decode time.
    deletes: tuple = ()
    row_start: int = 0  # file-wide ordinal of the stripe's first row
    # Column mapping (metadata-only RENAME): ((logical, (alias, ...)),
    # ...) — files written before a rename store an alias; lookup is
    # logical first, then aliases in recency order. Rides the partition
    # so executors never read the manifest.
    colmap: tuple = ()
    # Declared-column read-time defaults: ((name, json_value), ...) —
    # files predating a Table.add_column render the default, not null.
    defaults: tuple = ()
    # Deletion-vector SIDECAR refs (absolute paths) for this stripe's
    # file: decoded executor-side in read() and unioned with `deletes`,
    # so positions never pass through the driver. Whole-file vectors —
    # the reader clips by page offsets anyway.
    dv_refs: tuple = ()


@dataclass
class _Commit(WriterCommitMessage):
    files: list
    # parallel to `files`: footer meta (FileMeta JSON dict) and base64
    # arrow-IPC schema per file, so the driver can publish a manifest
    # without re-reading any footer. Optional for compatibility.
    metas: list | None = None
    schemas_b64: list | None = None


# --------------------------------------------------------------------------
# Directory manifest: the committed file set + embedded footer meta.
#
# `_strawboat_manifest.json` at the table root makes the directory a
# (single-writer) table: readers that find it list exactly one committed
# generation — a crashed write's orphan files are invisible, and
# compact() swaps generations atomically instead of exposing the
# mid-swap duplicate window (the object-store pattern: the manifest is
# one atomic PUT). Entries carry each file's footer meta + schema, so
# planning (schema()/partitions()) costs ONE manifest read instead of
# one footer round-trip per file. Absent manifest = legacy directory:
# globbing behaves exactly as before.
# --------------------------------------------------------------------------

MANIFEST_NAME = "_strawboat_manifest.json"


class ManifestConflictError(RuntimeError):
    """A concurrent committer published the generation this writer was
    about to claim. Retry with a fresh read (publish_manifest does) or
    surface to the user — never silently drop the other commit."""


def _manifest_path(root: str) -> str:
    return os.path.join(root, MANIFEST_NAME)


def _gen_path(root: str, generation: int) -> str:
    return os.path.join(root, f"_strawboat_manifest.gen.{generation:012d}.json")


def _read_manifest_file(fs, mp: str) -> dict | None:
    import json

    try:
        if not fs.exists(mp):
            return None
        with fs.open_read(mp) as f:
            d = json.loads(f.read().decode())
        if not isinstance(d.get("entries"), list):
            return None
        return d
    except (OSError, KeyError, ValueError):
        return None  # unreadable manifest -> fall back to listing


def read_manifest(root: str) -> dict | None:
    """Current committed generation. Two-level layout for concurrency
    safety: each generation is an immutable CAS-created
    `_strawboat_manifest.gen.N.json`; `_strawboat_manifest.json` is a
    lagging cache of the newest one (kept for pre-CAS directories and
    cheap reads). Resolve the true head by probing forward from the
    cache — in the no-race steady state that is one exists() miss."""
    fs = get_fs(root)
    man = _read_manifest_file(fs, _manifest_path(root))
    head = man.get("generation", 0) if man else 0
    while True:
        nxt = _read_manifest_file(fs, _gen_path(root, head + 1))
        if nxt is None:
            return man
        man, head = nxt, head + 1


def read_manifest_at(root: str, generation: int) -> dict:
    """Time travel: the manifest exactly as of `generation`. Generation
    files are immutable and retained until vacuum() retires them, so
    snapshot reads of earlier generations work until maintenance
    reclaims the horizon (same contract as Delta's VERSION AS OF +
    VACUUM). Raises when that generation is gone or never existed."""
    fs = get_fs(root)
    man = _read_manifest_file(fs, _gen_path(root, generation))
    if man is not None:
        return man
    cur = read_manifest(root)  # pre-CAS directory: cache may BE gen N
    if cur is not None and cur.get("generation", 0) == generation:
        return cur
    raise ValueError(
        f"strawboat: generation {generation} of {root} is not available "
        f"(current: {cur.get('generation') if cur else None}; older "
        f"generations are retired by vacuum())"
    )


def find_commit(root: str, commit_uuid: str, after_generation: int = 0) -> dict | None:
    """Locate the manifest generation a specific job published, by the
    `commit_uuid` stamp it wrote (writer option of the same name).
    Scans forward from `after_generation`+1 to the head — O(concurrent
    commits) small JSON reads, exact under racing committers (each
    commit is its own immutable generation file carrying its own
    commit_metrics). Returns the manifest doc, or None when the stamp
    is not found (e.g. the write path didn't plumb the option)."""
    fs = get_fs(root)
    cur = read_manifest(root)
    head = cur.get("generation", 0) if cur else 0
    for gen in range(after_generation + 1, head + 1):
        man = _read_manifest_file(fs, _gen_path(root, gen))
        if man is None and gen == head:
            man = cur
        if man is not None and man.get("commit_uuid") == commit_uuid:
            return man
    return None


def list_generations(root: str) -> list[dict]:
    """Table history: [{generation, n_files, current}] for every
    generation still on disk, oldest first."""
    fs = get_fs(root)
    cur = read_manifest(root)
    head = cur.get("generation", 0) if cur else 0
    out = []
    for gen in range(1, head + 1):
        man = _read_manifest_file(fs, _gen_path(root, gen))
        if man is None and gen == head:
            man = cur
        if man is not None:
            out.append(
                {
                    "generation": gen,
                    "n_files": len(man["entries"]),
                    "current": gen == head,
                    "committed_at_us": man.get("committed_at_us"),
                    "operation": man.get("operation"),
                    "entry_paths": sorted(e["path"] for e in man["entries"]),
                }
            )
    return out


def generation_at_timestamp(root: str, ts_us: int) -> int:
    """TIMESTAMP AS OF resolution: the newest generation whose commit
    time is <= ts_us (µs since epoch).  Commit times come from the
    manifest's own `committed_at_us` stamp; pre-stamp (legacy)
    generation files fall back to their file mtime.  Raises when the
    timestamp predates the first retained generation — same contract
    as Delta (vacuum retires the horizon)."""
    fs = get_fs(root)
    cur = read_manifest(root)
    if cur is None:
        raise ValueError(f"strawboat: {root} has no manifest (no commits to travel to)")
    head = cur.get("generation", 0)
    best = None
    for gen in range(1, head + 1):
        man = _read_manifest_file(fs, _gen_path(root, gen))
        if man is None:
            if gen == head:
                man = cur
            else:
                continue  # retired by vacuum
        at = man.get("committed_at_us")
        if at is None:
            try:
                at = fs.mtime_ns(_gen_path(root, gen)) // 1000
            except (OSError, KeyError):
                continue
        if at <= ts_us:
            best = gen
    if best is None:
        raise ValueError(
            f"strawboat: no generation of {root} committed at or before "
            f"timestamp {ts_us} µs (earliest retained generation is newer, "
            f"or older generations were vacuumed)"
        )
    return best


def write_manifest(
    root: str,
    entries: list[dict],
    generation: int | None = None,
    properties: dict | None = None,
    operation: str | None = None,
    extra: dict | None = None,
) -> None:
    """Publish `entries` as the next manifest generation via CAS: the
    generation file is create-if-absent, so of two racing committers
    exactly one wins and the loser gets ManifestConflictError (with the
    winner's entries durable and readable for a retry-merge). `entries`:
    [{path: rel, sig: [..]|None, meta: dict|None, schema_b64: str|None}].

    `properties` is a free-form table-level dict riding the manifest
    (Delta TBLPROPERTIES analog; carries e.g. the incremental-view txn
    horizon).  None means CARRY FORWARD the current head's properties —
    an unrelated commit must not drop them; pass an explicit dict
    (possibly {}) to replace."""
    import json

    fs = get_fs(root)
    prev = None
    if generation is None:
        prev = read_manifest(root)
        generation = (prev.get("generation", 0) + 1) if prev else 1
    if properties is None:
        if prev is None:
            prev = read_manifest(root)
        properties = (prev or {}).get("properties") or {}
    import time

    doc = {
        "version": 1,
        "generation": generation,
        # commit wall-clock (µs) — the TIMESTAMP AS OF resolution key;
        # stored in the manifest itself so it survives file copies and
        # object-store mtime quirks
        "committed_at_us": int(time.time() * 1_000_000),
        "entries": sorted(entries, key=lambda e: e["path"]),
    }
    if properties:
        doc["properties"] = properties
    if operation:
        # commit verb (DESCRIBE HISTORY's operation column) — a fact
        # about THIS commit, never carried forward like properties
        doc["operation"] = operation
    if extra:
        # per-commit facts (commit_uuid stamp, commit_metrics) — like
        # `operation`, they describe THIS commit and never carry forward
        doc.update(extra)
    payload = json.dumps(doc).encode()
    try:
        with fs.create_exclusive(_gen_path(root, generation)) as h:
            h.write(payload)
    except FileExistsError as e:
        raise ManifestConflictError(
            f"manifest generation {generation} at {root} was published by a "
            f"concurrent committer"
        ) from e
    # Refresh the cache pointer only forward: a slow loser must not roll
    # it back (harmless if it did — readers probe past it — but the probe
    # chain stays short when the cache is the true head).
    cached = _read_manifest_file(fs, _manifest_path(root))
    if cached is None or cached.get("generation", 0) < generation:
        with fs.create(_manifest_path(root)) as h:
            h.write(payload)
    # Old generation files are retained until vacuum(): deleting them
    # here could strand a racing committer's forward probe.


def delete_manifest(root: str) -> None:
    """Remove the cache manifest and every generation file — used by
    overwrite (fresh table: generation counter restarts) and by
    compact()'s temporary leaf manifests."""
    fs = get_fs(root)
    man = _read_manifest_file(fs, _manifest_path(root))
    head = man.get("generation", 0) if man else 0
    # generations are contiguous from 1; probe past the cache pointer
    # (the head can run ahead of it) until the first gap beyond head
    gen = 1
    while True:
        gp = _gen_path(root, gen)
        if fs.exists(gp):
            try:
                fs.remove(gp)
            except (OSError, KeyError):
                pass
        elif gen > head:
            break
        gen += 1
    try:
        if fs.exists(_manifest_path(root)):
            fs.remove(_manifest_path(root))
    except (OSError, KeyError):
        pass


def _meta_json_dict(meta) -> dict:
    import json

    return json.loads(meta.to_json().decode())


def _schema_b64(arrow_schema: pa.Schema) -> str:
    import base64

    return base64.b64encode(arrow_schema.serialize().to_pybytes()).decode()


def _manifest_entry(root: str, file: str, meta=None, schema_b64: str | None = None) -> dict:
    fs = get_fs(file)
    sig = None
    stat_sig = getattr(fs, "stat_sig", None)
    if stat_sig is not None:
        try:
            sig = list(stat_sig(file))
        except (OSError, KeyError):
            sig = None
    rel = os.path.relpath(backend_path(file), backend_path(root))
    meta_dict = None
    if meta is not None:
        import json

        meta_dict = json.loads(meta.to_json().decode()) if hasattr(meta, "to_json") else meta
    return {"path": rel, "sig": sig, "meta": meta_dict, "schema_b64": schema_b64}


def publish_manifest(
    root: str,
    messages=None,
    replace: bool = False,
    properties: dict | None = None,
    operation: str | None = None,
    commit_uuid: str | None = None,
) -> None:
    """Commit-time manifest refresh: prior entries still on disk plus
    the just-committed files (with executor-provided footer meta).

    `replace=True` (overwrite commits) publishes a generation listing
    ONLY this commit's files: the previous generation's files stay on
    disk and stay listed by their own (immutable) generation manifests,
    so time travel reads across an overwrite keep working and
    generation numbering stays monotonic for the life of the table —
    an `at_generation=N` pin can never silently resolve to a different
    table's snapshot (Delta's overwrite-as-new-version semantics).
    vacuum() reclaims the replaced files once their generations age
    out.

    Deliberately STRICT: files on disk that neither the previous
    manifest nor this commit's messages vouch for stay out — a failed
    job's leftover task files must not be legitimized by the next
    successful commit (that would double-count data after a retry).
    vacuum() reclaims them. To adopt a legacy directory of hand-placed
    files, delete the manifest (readers fall back to globbing) or call
    publish_manifest(root) with no messages BEFORE the first managed
    write — with no prior manifest, everything on disk is adopted as
    the initial generation.

    Concurrency-safe: the generation PUT is a CAS (write_manifest), and
    on conflict this re-reads the winner's manifest — which vouches for
    the winner's files — and merges this commit's files on top, so two
    jobs appending at once both land in the final manifest."""
    fs = get_fs(root)

    # Compare scheme-normalized paths: commit messages carry the
    # caller's URL form (file:///t/x.strb) while the backend listing is
    # plain (/t/x.strb) — a raw string match would drop valid files.
    def _norm(p: str) -> str:
        return os.path.normpath(backend_path(p))

    # Per-commit metrics from THIS commit's own messages (footer metas
    # carry num_rows) — the exact "rows this INSERT landed" under
    # concurrency, where a before/after table-wide count_rows() delta
    # would attribute a racing committer's rows to this commit.
    extra: dict | None = None
    if messages:
        rows_written = 0
        files_added = 0
        for m in messages:
            if m is None:
                continue
            files_added += len(m.files)
            for meta in m.metas or ():
                if meta:
                    rows_written += int(meta.get("num_rows", 0))
        extra = {
            "commit_metrics": {
                "rows_written": rows_written,
                "files_added": files_added,
            }
        }
        if commit_uuid:
            extra["commit_uuid"] = commit_uuid

    for _attempt in range(50):
        on_disk = (
            {_norm(f): f for f in fs.list_files(root, FILE_EXT)} if fs.isdir(root) else {}
        )
        prev = read_manifest(root)
        entries: dict[str, dict] = {}
        if prev and not replace:
            for e in prev["entries"]:
                key = _norm(entry_abs(root, e["path"]))
                if is_external_entry(e["path"]):
                    # shallow-clone references live OUTSIDE this root:
                    # the clone's manifest vouches for them, not the
                    # listing (they would otherwise be dropped by the
                    # orphan guard on the clone's first append)
                    entries[key] = e
                elif key in on_disk:
                    entries[key] = e
        if messages:
            for m in messages:
                if m is None:
                    continue
                metas = m.metas or [None] * len(m.files)
                schemas = m.schemas_b64 or [None] * len(m.files)
                for f, meta, sch in zip(m.files, metas, schemas):
                    if _norm(f) in on_disk:
                        entries[_norm(f)] = _manifest_entry(root, f, meta, sch)
        if prev is None and not messages and not replace:
            # Explicit bootstrap (publish_manifest(root) with no
            # messages): adopt pre-existing files as the first
            # generation. When commit messages ARE present, unvouched
            # on-disk files stay out — they are crashed-job orphans,
            # not legacy data (the documented legacy-adoption path is
            # an explicit no-message publish before the first managed
            # write).
            for key, f in on_disk.items():
                if key not in entries:
                    entries[key] = _manifest_entry(root, f)
        gen = (prev.get("generation", 0) + 1) if prev else 1
        if properties is not None:
            props = properties
        else:
            # carry the freshly-read head's properties forward — except
            # that an OVERWRITE resets column_mapping: every old file is
            # superseded, so the new epoch starts with clean names
            # (older generations keep their own mapping for time travel)
            props = dict((prev or {}).get("properties") or {})
            if replace:
                props.pop("column_mapping", None)
                # an overwrite's layout is whatever IT declares — a
                # carried-forward bucket/transform/plain spec from the
                # replaced epoch would mis-prune the new files
                props.pop("bucket", None)
                props.pop("partition_transform", None)
                props.pop("partition_layout", None)
                props.pop("partition_layout_types", None)
        try:
            # explicit properties (e.g. an incremental-view txn marker)
            # land atomically with this commit
            write_manifest(
                root,
                list(entries.values()),
                generation=gen,
                properties=props,
                operation=operation
                or ("adopt" if not messages else "overwrite" if replace else "append"),
                extra=extra,
            )
            return
        except ManifestConflictError:
            continue  # winner's entries are durable; re-read and merge
    raise ManifestConflictError(
        f"publish_manifest({root}): lost the generation race 50 times"
    )


def _seed_footer_cache(root: str, man: dict) -> None:
    """Warm _FOOTER_CACHE from manifest entries so planning skips the
    per-file footer reads (sig still guards staleness at lookup)."""
    import base64
    import json

    from strawboat_spark.sources.pagefile import FileMeta

    for e in man.get("entries", ()):
        sig, meta, sch = e.get("sig"), e.get("meta"), e.get("schema_b64")
        if sig is None or meta is None or sch is None:
            continue
        absf = entry_abs(root, e["path"])
        if absf in _FOOTER_CACHE:
            continue
        try:
            schema = pa.ipc.read_schema(pa.py_buffer(base64.b64decode(sch)))
            fmeta = FileMeta.from_json(json.dumps(meta).encode())
        except Exception:
            continue
        if len(_FOOTER_CACHE) < _FOOTER_CACHE_MAX:
            _FOOTER_CACHE[absf] = (tuple(sig), schema, fmeta)


def self_partition_cols(options) -> list[str]:
    return [c.strip() for c in options.get("partition_by", "").split(",") if c.strip()]


def _parse_forbidden(options) -> frozenset:
    """forbid_codecs=dict,rle — reference WriteOptions
    forbidden_compressions; lets deployments disable codecs without a
    format break (the page codec byte keeps old files readable)."""
    from strawboat_spark.sources.codecs import Codec

    raw = options.get("forbid_codecs", "")
    return frozenset(Codec[c.strip().upper()] for c in raw.split(",") if c.strip())


class StrawboatDataSource(DataSource):
    def __init__(self, options):
        # `branch=<name>` resolves every read/write/stream against the
        # branch's own root (table.py Table.branch) — one rewrite here
        # covers schema/reader/writer/streamReader uniformly
        br = options.get("branch")
        path = options.get("path")
        if br and path:
            options["path"] = f"{path}/_branches/{br}"
        super().__init__(options)

    @classmethod
    def name(cls) -> str:
        return "strawboat"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("strawboat: 'path' option is required")
        man = _manifest_for(path, _at_generation(self.options))
        files = _list_files(path, _at_generation(self.options), man=man)
        if not files:
            raise ValueError(f"strawboat: no {FILE_EXT} files under {path}")
        files_opt = _files_option(self.options)
        all_files = files  # partition-column inference always sees the full table
        if files_opt is not None:
            files = [entry_abs(path, rel) for rel in files_opt]
            if not files:
                raise ValueError("strawboat: 'files' option names no files")
        cmap = column_mapping(path, man=man)
        wmap = widened_columns(path, man=man)
        arrow_schema, _ = _cached_footer(files[0])
        arrow_schema = _apply_widening(_to_logical_schema(arrow_schema, cmap), wmap)
        # Force nullable like Spark's parquet source does for file-based
        # schemas: other files in the directory may predate a column
        # (read-side null-fills it), and a footer that recorded a
        # non-nullable field (e.g. written from F.lit()) would otherwise
        # make codegen NPE on those nulls.
        arrow_schema = pa.schema([f.with_nullable(True) for f in arrow_schema])
        if self.options.get("merge_schema", "").lower() == "true":
            # Schema evolution: union footer schemas across files
            # (first-file column order, later additions appended).
            # Read-side fills columns a file lacks with nulls — so every
            # merged field must be nullable regardless of how any one
            # file declared it.
            fields = {f.name: f.with_nullable(True) for f in arrow_schema}
            order = list(arrow_schema.names)
            for file in files[1:]:
                sch, _ = _cached_footer(file)
                sch = _apply_widening(_to_logical_schema(sch, cmap), wmap)
                for fld in sch:
                    have = fields.get(fld.name)
                    if have is None:
                        fields[fld.name] = fld.with_nullable(True)
                        order.append(fld.name)
                    elif have.type != fld.type:
                        raise ValueError(
                            f"strawboat: merge_schema type conflict on "
                            f"{fld.name!r}: {have.type} vs {fld.type}"
                        )
            arrow_schema = pa.schema([fields[n] for n in order])
        # tz-less arrow timestamps -> TimestampNTZ (what Spark's parquet
        # reader infers); tz-aware ones still map to TimestampType.
        schema = from_arrow_schema(arrow_schema, prefer_timestamp_ntz=True)
        # Declared columns (Table.add_column) are part of the logical
        # schema even before any file stores them; pre-declaration
        # files fill the default (or null) at read time.
        for dname, dspec in declared_columns(path, man=man).items():
            if dname not in schema.fieldNames():
                schema = schema.add(dname, _scalar_type(dspec["type"]))
        # Hive-style partition columns discovered from the layout are
        # appended after the stored columns (parquet-source convention).
        from pyspark.sql.types import DoubleType, LongType, StringType

        spark_types = {"bigint": LongType(), "double": DoubleType(), "string": StringType()}
        for name, tp in _infer_partition_fields(path, all_files, man=man):
            if name not in schema.fieldNames():
                schema = schema.add(name, spark_types[tp])
        if self.options.get("with_file_path", "").lower() == "true":
            # Virtual provenance column (parquet's _metadata.file_path
            # analog): each stripe emits its source file as a constant.
            # This is what lets DELETE/UPDATE find affected files in
            # ONE distributed, stats-pruned scan (maintenance.py).
            schema = schema.add("_strawboat_file", StringType())
        if self.options.get("change_feed", "").lower() == "true":
            # streaming change-feed schema: the table's columns plus the
            # change metadata (Delta CDF column analogs)
            schema = schema.add("_change_type", StringType()).add(
                "_generation", LongType()
            )
        if self.options.get("with_row_pos", "").lower() == "true":
            # Physical row ordinal within the file (pre-deletion
            # numbering — stable across merge-on-read deletes), the
            # _metadata.row_index analog; what MOR DELETE records.
            schema = schema.add("_strawboat_pos", LongType())
        # Projection pushdown at the API level: the Python DataSource API
        # (4.1) has no column-pruning hook Catalyst could call, so the
        # projection is an explicit read option — `columns=a,b` narrows
        # the scan schema, and the reader then decodes ONLY those leaves
        # (reference parity: the read API's projection argument,
        # src/read/reader.rs read path takes a leaf subset). Without it
        # a 2-column query over a 16-column file decodes all 16.
        cols = [c.strip() for c in self.options.get("columns", "").split(",") if c.strip()]
        if cols:
            have = set(schema.fieldNames())
            unknown = [c for c in cols if c not in have]
            if unknown:
                raise ValueError(
                    f"strawboat: columns option names unknown columns {unknown}; "
                    f"available: {sorted(have)}"
                )
            schema = StructType([schema[c] for c in cols])
        return schema

    def reader(self, schema: StructType) -> "StrawboatReaderImpl":
        if self.options.get("change_feed", "").lower() == "true":
            raise ValueError(
                "strawboat: change_feed=true is a STREAM option "
                "(spark.readStream); batch diffs come from Table.changes()"
            )
        return StrawboatReaderImpl(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "StrawboatWriterImpl":
        return StrawboatWriterImpl(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):  # noqa: N802
        return StrawboatStreamWriterImpl(self.options, schema, overwrite)

    def streamReader(self, schema: StructType):  # noqa: N802
        if self.options.get("change_feed", "").lower() == "true":
            return StrawboatCDFStreamReaderImpl(self.options, schema)
        return StrawboatStreamReaderImpl(self.options, schema)


# --------------------------------------------------------------------------
# Read path
# --------------------------------------------------------------------------

_RANGE_OPS = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In)


def _at_generation(options) -> int | None:
    """Time-travel read option: `at_generation=N` pins the scan to the
    manifest exactly as of generation N (files retained until
    vacuum()/compact() reclaim them)."""
    v = options.get("at_generation", "").strip() if hasattr(options, "get") else ""
    return int(v) if v else None


def _dv_pack(ordinals) -> bytes:
    """LEB128 varints of first value then gaps, zlib-compressed --
    ~1-2 bytes/row before zlib vs ~10 for JSON ints (a roaring bitmap
    would go denser still; both carriers are format-tagged so that
    swap is a pure codec change)."""
    import zlib

    out = bytearray()
    prev = -1
    for v in ordinals:
        if v <= prev or v < 0:
            # a non-positive gap would never terminate the varint loop
            raise ValueError(
                f"deletion vector: ordinals must be sorted, unique and "
                f"non-negative (got {v} after {prev})"
            )
        gap = v - prev - 1 if prev >= 0 else v
        prev = v
        while True:
            b = gap & 0x7F
            gap >>= 7
            if gap:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return zlib.compress(bytes(out), 6)


def _dv_unpack(blob: bytes) -> tuple:
    import zlib

    raw = zlib.decompress(blob)
    out = []
    acc = 0
    shift = 0
    prev = -1
    for b in raw:
        acc |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
            continue
        prev = prev + 1 + acc if out else acc
        out.append(prev)
        acc = 0
        shift = 0
    return tuple(out)


def encode_deletes(ordinals) -> str:
    """Compact INLINE deletion-vector encoding: sorted physical
    ordinals -> 'dv1:' + base64(varint+zlib).  The manifest stays
    manifest-sized even for vectors masking millions of rows.  New MOR
    mutations write sidecar FILES instead (write_dv_sidecar) so row
    positions never pass through the driver; the inline form remains
    for legacy tables and tiny vectors."""
    import base64

    return "dv1:" + base64.b64encode(_dv_pack(ordinals)).decode()


def decode_deletes(v) -> tuple:
    """Accepts the 'dv1:' string form or a legacy JSON int list."""
    if not v:
        return ()
    if isinstance(v, (list, tuple)):
        return tuple(v)
    if not isinstance(v, str) or not v.startswith("dv1:"):
        raise ValueError(f"unknown deletion-vector encoding: {v!r:.40}")
    import base64

    return _dv_unpack(base64.b64decode(v[4:]))


# Deletion-vector sidecar files: executors write one blob per (file,
# mutation) under <root>/_strawboat_dv/ and the manifest entry carries
# only {"deletes_refs": [rel, ...], "n_deletes": total} -- row positions
# never ride through the driver (the Delta DV-file posture).  Refs are
# APPEND-ONLY and pairwise disjoint by construction: a mutation's scan
# subtracts existing vectors, so re-deleting an already-masked row is
# impossible.  Content-addressed names make speculative task retries
# idempotent (same positions -> same blob -> same name).
DV_DIR = "_strawboat_dv"
_DV_MAGIC = b"SBDV1\n"


def write_dv_sidecar(root: str, ordinals) -> str:
    """Write a deletion-vector sidecar for `ordinals` (sorted, unique)
    under root/_strawboat_dv; returns its root-relative path.  Safe to
    call from executors (fs.create is atomic publish-on-close)."""
    import hashlib

    blob = _DV_MAGIC + _dv_pack(ordinals)
    name = hashlib.sha256(blob).hexdigest()[:24] + ".dv"
    rel = f"{DV_DIR}/{name}"
    fs = get_fs(root)
    dv_abs = os.path.join(root, rel)
    if not fs.exists(dv_abs):
        fs.makedirs(os.path.join(root, DV_DIR))
        with fs.create(dv_abs) as h:
            h.write(blob)
    return rel


def read_dv_sidecar(path: str) -> tuple:
    """Decode one sidecar file -> sorted ordinal tuple (executor- or
    driver-side; the hot scan path keeps this executor-side)."""
    with get_fs(path).open_read(path) as h:
        blob = h.read()
    if not blob.startswith(_DV_MAGIC):
        raise ValueError(f"not a deletion-vector sidecar: {path}")
    return _dv_unpack(blob[len(_DV_MAGIC):])


def entry_dv_refs(root: str, e: dict) -> tuple:
    """Absolute sidecar paths referenced by a manifest entry."""
    return tuple(entry_abs(root, r) for r in e.get("deletes_refs") or ())


def entry_dv_count(root: str, e: dict) -> int:
    """Deleted-row count for an entry from METADATA alone (n_deletes is
    committed with every sidecar ref; disjointness makes it additive).
    Legacy inline-only entries fall back to decoding the inline blob."""
    n = e.get("n_deletes")
    if n is not None:
        return int(n)
    return len(decode_deletes(e.get("deletes")))


def dv_positions(root: str, e: dict) -> tuple:
    """Full decoded deletion vector of one entry: inline + sidecars.
    Driver-side use is reserved for change-sized work (CDF diffs,
    branch diffs); the scan path ships refs to executors instead."""
    pos = set(decode_deletes(e.get("deletes")))
    for ref in entry_dv_refs(root, e):
        pos.update(read_dv_sidecar(ref))
    return tuple(sorted(pos))


class _DV(NamedTuple):
    """Per-file deletion-vector handle: small inline ordinals decoded,
    sidecar refs carried as paths (decoded executor-side), and the
    metadata deleted-row count."""

    inline: tuple
    refs: tuple
    n: int


def _deletes_by_rel(root: str, at_generation: int | None, man=_UNSET_MAN) -> dict:
    """Per-file merge-on-read deletion-vector handles from the
    generation's manifest: {absolute path: _DV}.  Positions inside
    sidecars are NOT decoded here -- planning stays metadata-only.
    Tables without a manifest (legacy directories) have none."""
    if man is _UNSET_MAN:
        man = _manifest_for(root, at_generation)
    if man is None:
        return {}
    return {
        entry_abs(root, e["path"]): _DV(
            decode_deletes(e.get("deletes")),
            entry_dv_refs(root, e),
            entry_dv_count(root, e),
        )
        for e in man.get("entries", ())
        if e.get("deletes") or e.get("deletes_refs")
    }


def _files_option(options) -> list[str] | None:
    """`files=<JSON array of root-relative paths>` pins the scan to
    exactly those data files, bypassing the manifest listing (the
    manifest still seeds footer caches when present). This is what
    keeps DELETE/UPDATE/MERGE rewrite plans at ONE scan node per leaf
    regardless of candidate-file count — the alternative (a
    unionByName leg per file) blows up Catalyst analysis at ~10k
    files. Hive partition columns are still inferred from the FULL
    table listing, so a single-leaf restriction cannot flip a
    partition column's inferred type."""
    import json

    v = options.get("files", "").strip() if hasattr(options, "get") else ""
    if not v:
        return None
    lst = json.loads(v)
    if not isinstance(lst, list) or not all(isinstance(x, str) for x in lst):
        raise ValueError("strawboat: 'files' option must be a JSON array of relative paths")
    return sorted(lst)


class StrawboatReaderImpl(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        self.schema = schema
        self.at_generation = _at_generation(options)
        self.files_opt = _files_option(options)
        self._filters: list[Filter] = []

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        # Reset per pushdown pass: the JVM plan cache can reuse one
        # reader instance across queries, and a stale union of filters
        # from a previous query would prune pages this one must read.
        self._filters = []
        for f in filters:
            if isinstance(f, _RANGE_OPS) and len(f.attribute) == 1:
                self._filters.append(f)
            elif isinstance(f, (IsNotNull, IsNull, StringStartsWith)) and len(f.attribute) == 1:
                self._filters.append(f)
        # Return everything: Spark re-applies; our evaluation only skips pages.
        return filters

    def partitions(self):
        from concurrent.futures import ThreadPoolExecutor

        # ONE manifest read feeds the listing and every metadata-only
        # property below (mapping/defaults/bucket/deletes) — each
        # separate read is a round-trip on an object store.
        man = _manifest_for(self.path, self.at_generation)
        files = _list_files(self.path, self.at_generation, man=man)
        part_types = dict(_infer_partition_fields(self.path, files, man=man))
        cmap = tuple(
            (lg, tuple(aliases))
            for lg, aliases in column_mapping(self.path, man=man).items()
        )
        defaults = tuple(
            (n, d.get("default"))
            for n, d in declared_columns(self.path, man=man).items()
            if d.get("default") is not None
        )
        if self.files_opt is not None:
            files = [entry_abs(self.path, rel) for rel in self.files_opt]
        # Bucket pruning: an equality/IN filter on the bucket key
        # hashes its value(s) to the only directories that can hold
        # matching rows — O(files/n) planning with zero footer reads.
        spec = bucket_spec(self.path, man=man)
        allowed_buckets = _bucket_prunable(self._filters, spec)
        tspec = transform_spec(self.path, man=man)
        day_interval = _transform_prunable(self._filters, tspec)
        survivors: list[tuple[str, dict]] = []
        for file in files:
            pvals = {
                k: _cast_partition_value(v, part_types[k])
                for k, v in _partition_values(file, self.path).items()
            }
            # Partition pruning: a filter on a partition column that the
            # constant value fails eliminates the whole file before any
            # footer read — the directory layout IS the index.
            if allowed_buckets is not None and spec:
                b = pvals.get(spec["dir_col"])
                if b is not None and int(b) not in allowed_buckets:
                    continue
            # Hidden partitioning: a range filter on the RAW timestamp
            # prunes by the days() directory value.
            if day_interval is not None and tspec:
                if not _transform_may_match(pvals.get(tspec["dir_col"]), day_interval):
                    continue
            if all(_value_may_match(f, pvals) for f in self._filters):
                survivors.append((file, pvals))

        def _plan(file: str):
            """(n_pages, per-page compressed bytes, per-page rows, keep)
            for one file. keep=False when the file's AGGREGATED column
            stats prove no page can match a pushed filter — the whole
            file is dropped at planning, so no task is ever scheduled
            for it (at 100 TB the saved scheduling dwarfs the
            per-stripe page skip that would otherwise reject the same
            pages one task at a time)."""
            _, meta = _cached_footer(file)
            if not meta.leaves:
                return 0, [], [], True
            n_pages = len(meta.leaves[0].pages)
            pages_by_leaf = {lf.name: lf.pages for lf in meta.leaves}
            for f in self._filters:
                side = _file_side_name(pages_by_leaf, f.attribute[0], cmap)
                pages = pages_by_leaf.get(side) if side else None
                if pages and not _page_may_match(f, _aggregate_page_stats(pages)):
                    return n_pages, [], [], False
            per_page = [
                sum(lf.pages[i].length for lf in meta.leaves if i < len(lf.pages))
                for i in range(n_pages)
            ]
            rows_per_page = [p.num_values for p in meta.leaves[0].pages]
            return n_pages, per_page, rows_per_page, True

        # Footer reads are independent ranged reads — overlap them
        # (matters against object stores where each is a round-trip).
        with ThreadPoolExecutor(max_workers=min(16, max(1, len(survivors)))) as ex:
            plans = list(ex.map(_plan, [f for f, _ in survivors]))

        dmap = _deletes_by_rel(self.path, self.at_generation, man=man)
        import bisect

        parts: list[_Stripe] = []
        for (file, pvals), (n_pages, per_page, rows_per_page, keep) in zip(
            survivors, plans
        ):
            pv = tuple(sorted(pvals.items()))
            if not keep:
                continue
            fdv = dmap.get(file)
            fdel = fdv.inline if fdv else ()
            frefs = fdv.refs if fdv else ()
            fsnap = tuple(self._filters)
            if n_pages == 0:
                parts.append(_Stripe(file, 0, 0, pv, fsnap, colmap=cmap, defaults=defaults))
                continue
            # file-wide row ordinal at the start of each page
            offsets = [0]
            for r in rows_per_page:
                offsets.append(offsets[-1] + r)
            # Stripes are capped by BOTH page count and compressed
            # bytes: the page cap keeps slim-row files fanning out as
            # before; the byte cap splits fat-page files (wide rows,
            # embedded media) so a task's working set stays bounded —
            # the maxPartitionBytes analog for this format.
            s = 0
            while s < n_pages:
                e, acc = s, 0
                while (
                    e < n_pages
                    and e - s < STRIPE_PAGES
                    and (acc == 0 or acc + per_page[e] <= STRIPE_BYTES)
                ):
                    acc += per_page[e]
                    e += 1
                sdel = (
                    tuple(
                        fdel[
                            bisect.bisect_left(fdel, offsets[s]) : bisect.bisect_left(
                                fdel, offsets[e]
                            )
                        ]
                    )
                    if fdel
                    else ()
                )
                parts.append(
                    _Stripe(file, s, e, pv, fsnap, sdel, offsets[s], cmap, defaults, frefs)
                )
                s = e
        return parts

    def read(self, partition: _Stripe):
        """Yield the stripe's pages COALESCED into ~READ_BATCH_ROWS-row
        batches (r18 opt, guide §4.2): every yielded batch is one Arrow
        IPC frame on the Python→JVM stream and one columnar batch the
        JVM consumes, so 16 per-page 8k-row frames per stripe pay 16x
        the per-frame overhead of one 131k-row frame.  Coalescing
        copies each page's arrays once (combine_chunks) — cheap next
        to the frame round-trips it removes.  A byte cap bounds the
        buffered working set for blob-heavy rows; READ_BATCH_ROWS<=0
        restores per-page yields (the pre-r18 behavior)."""
        gen = self._read_stripe(partition)
        if READ_BATCH_ROWS <= 0:
            yield from gen
            return
        buf: list = []
        rows = nbytes = 0
        for b in gen:
            buf.append(b)
            rows += b.num_rows
            nbytes += b.nbytes
            if rows >= READ_BATCH_ROWS or nbytes >= READ_BATCH_BYTES:
                yield _combine_batches(buf)
                buf, rows, nbytes = [], 0, 0
        if buf:
            yield _combine_batches(buf)

    def _read_stripe(self, partition: _Stripe):
        from pyspark.sql.pandas.types import to_arrow_schema

        from strawboat_spark.sources.pagefile import StrawboatReader

        if partition is None:
            # planning pruned every file: Spark still runs one task
            return iter(())
        import numpy as np

        want = to_arrow_schema(self.schema)
        pvals = dict(partition.part_values)
        if "_strawboat_file" in want.names:
            pvals["_strawboat_file"] = partition.file
        want_pos = "_strawboat_pos" in want.names
        dels = np.asarray(partition.deletes, dtype=np.int64)
        if partition.dv_refs:
            # sidecar vectors decode HERE, on the executor — the driver
            # only ever handled their paths
            dels = np.unique(
                np.concatenate(
                    [dels]
                    + [
                        np.asarray(read_dv_sidecar(r), dtype=np.int64)
                        for r in partition.dv_refs
                    ]
                )
            )
        fschema, fmeta = _cached_footer(partition.file)
        with get_fs(partition.file).open_read(partition.file) as f:
            reader = StrawboatReader(f, schema=fschema, meta=fmeta)
            keep = self._page_mask(reader.meta, partition)
            if not any(keep):
                return
            # file-wide ordinal at the start of every page (deletion
            # vectors and _strawboat_pos both number PHYSICAL rows)
            pages0 = reader.meta.leaves[0].pages if reader.meta.leaves else []
            offsets = [0]
            for pg in pages0:
                offsets.append(offsets[-1] + pg.num_values)

            def _pos_and_mask(page_i: int, n: int):
                """(physical positions, keep-mask) for page page_i —
                mask is None when the page has no deleted rows."""
                pos = np.arange(offsets[page_i], offsets[page_i] + n, dtype=np.int64)
                if not len(dels):
                    return pos, None
                lo = np.searchsorted(dels, offsets[page_i])
                hi = np.searchsorted(dels, offsets[page_i] + n)
                if lo == hi:
                    return pos, None
                mask = np.ones(n, dtype=bool)
                mask[dels[lo:hi] - offsets[page_i]] = False
                return pos[mask], mask

            avail = set(reader.schema.names)
            dflts = dict(partition.defaults)
            # column mapping: the name each wanted logical column is
            # stored under in THIS file (itself post-rename, an alias
            # pre-rename, absent if the file predates the column)
            side = {
                c: _file_side_name(avail, c, partition.colmap)
                for c in want.names
                if c not in pvals
            }
            stored = [side[c] for c in want.names if c not in pvals and side.get(c)]
            # Schema evolution: columns this file predates are
            # null-filled (parquet-source convention). _strawboat_pos is
            # synthesized below, never null-filled.
            missing = [
                c
                for c in want.names
                if c not in pvals and side.get(c) is None and c != "_strawboat_pos"
            ]

            def page_filter(leaf_pages, n_pages):
                return keep

            def _assemble(page_i: int, n: int, byname: dict):
                pos, mask = _pos_and_mask(page_i, n)
                arrays = []
                for fld in want:
                    if fld.name == "_strawboat_pos":
                        arrays.append(pa.array(pos, type=fld.type))
                    elif fld.name in pvals:
                        arrays.append(_const_array(pvals[fld.name], len(pos), fld.type))
                    elif side.get(fld.name) in byname:
                        col = byname[side[fld.name]]
                        if mask is not None:
                            col = col.filter(pa.array(mask))
                        if col.type != fld.type:
                            # metadata-only type widening: the file
                            # stores the narrow type, upcast losslessly
                            col = col.cast(fld.type, safe=False)
                        arrays.append(col)
                    elif fld.name in dflts:
                        # declared-column default (Delta existingDefault):
                        # files predating add_column render it, not null
                        arrays.append(_const_array(dflts[fld.name], len(pos), fld.type))
                    else:
                        arrays.append(pa.nulls(len(pos), fld.type))
                return pa.RecordBatch.from_arrays(arrays, schema=want)

            if not stored:
                # No overlap with the stored columns: emit constant/null
                # batches sized by the kept pages' surviving row counts.
                for i, k in enumerate(keep):
                    if not k or i >= len(pages0):
                        continue
                    yield _assemble(i, pages0[i].num_values, {})
                return

            kept_ids = [i for i, k in enumerate(keep) if k]
            for page_i, batch in zip(
                kept_ids, reader.iter_batches(columns=stored, page_filter=page_filter)
            ):
                if pvals or missing or want_pos or len(dels):
                    byname = {n: batch.column(i) for i, n in enumerate(batch.schema.names)}
                    batch = _assemble(page_i, batch.num_rows, byname)
                elif list(batch.schema.names) != list(want.names):
                    # column mapping: this file stores aliases; columns
                    # arrive in want order, so rename positionally
                    batch = pa.RecordBatch.from_arrays(
                        list(batch.columns), names=list(want.names)
                    )
                # Align arrow types with what Spark expects (e.g. tz).
                yield batch.cast(want, safe=False) if batch.schema != want else batch

    def _page_mask(self, meta, partition: _Stripe) -> list[bool]:
        n_pages = len(meta.leaves[0].pages) if meta.leaves else 0
        keep = [partition.page_start <= i < partition.page_end for i in range(n_pages)]
        pages_by_leaf = {lf.name: lf.pages for lf in meta.leaves}
        for f in partition.filters:
            col = _file_side_name(pages_by_leaf, f.attribute[0], partition.colmap)
            pages = pages_by_leaf.get(col) if col else None
            if pages is None:
                continue
            for i in range(n_pages):
                if not keep[i]:
                    continue
                p = pages[i]
                if not _page_may_match(f, p):
                    keep[i] = False
        return keep


# Footer cache: strawboat files are immutable once renamed/PUT into
# place, so (size, mtime/version) identifies content. Planning touches
# every file's footer per query; caching makes repeat queries (and the
# schema()/partitions()/read() triple within one query) pay the read
# once per process — on an object store that is one saved round-trip
# per file per query.
_FOOTER_CACHE: dict[str, tuple] = {}
_FOOTER_CACHE_MAX = 8192


def _cached_footer(file: str):
    from strawboat_spark.sources.pagefile import read_footer

    fs = get_fs(file)
    sig = None
    stat_sig = getattr(fs, "stat_sig", None)
    if stat_sig is not None:
        try:
            sig = stat_sig(file)
        except (OSError, KeyError):
            sig = None
    if sig is not None:
        hit = _FOOTER_CACHE.get(file)
        if hit is not None and hit[0] == sig:
            return hit[1], hit[2]
    with fs.open_read(file) as f:
        schema, meta = read_footer(f)
    if sig is not None:
        if len(_FOOTER_CACHE) >= _FOOTER_CACHE_MAX:
            _FOOTER_CACHE.pop(next(iter(_FOOTER_CACHE)))
        _FOOTER_CACHE[file] = (sig, schema, meta)
    return schema, meta


def _const_array(value, n: int, typ: pa.DataType) -> pa.Array:
    if value is None:
        return pa.nulls(n, typ)
    return pa.array([value] * n, type=typ)


def _value_may_match(f: Filter, pvals: dict) -> bool:
    """Evaluate a pushed filter against a file's constant partition
    values. True unless the constant PROVABLY fails the predicate
    (filters on non-partition columns never eliminate here)."""
    col = f.attribute[0]
    if col not in pvals:
        return True
    v = pvals[col]
    if isinstance(f, IsNotNull):
        return v is not None
    if v is None:
        return True  # Spark re-applies; null semantics left to the engine
    try:
        if isinstance(f, EqualTo):
            return v == f.value
        if isinstance(f, GreaterThan):
            return v > f.value
        if isinstance(f, GreaterThanOrEqual):
            return v >= f.value
        if isinstance(f, LessThan):
            return v < f.value
        if isinstance(f, LessThanOrEqual):
            return v <= f.value
        if isinstance(f, In):
            return v in f.value
    except TypeError:
        return True
    return True


def _aggregate_page_stats(pages):
    """Whole-file column stats from per-page stats, conservative: a
    single stat-less page voids the file-level min/max (absence must
    never prune); the distinct union survives only when EVERY page has
    one and the union stays small."""
    from strawboat_spark.sources.pagefile import PageMeta

    mins = [p.min for p in pages]
    maxs = [p.max for p in pages]
    mn = None if any(m is None for m in mins) else min(mins)
    mx = None if any(m is None for m in maxs) else max(maxs)
    distinct = None
    if all(getattr(p, "distinct", None) is not None for p in pages):
        u: set = set()
        for p in pages:
            u.update(p.distinct)
        if len(u) <= 256:
            distinct = sorted(u)
    return PageMeta(
        length=0,
        num_values=sum(p.num_values for p in pages),
        null_count=sum(p.null_count for p in pages),
        min=mn,
        max=mx,
        distinct=distinct,
    )


def _page_may_match(f: Filter, p) -> bool:
    """Conservative: False only when stats PROVE no row matches."""
    if isinstance(f, IsNotNull):
        return p.null_count < p.num_values
    if isinstance(f, IsNull):
        return p.null_count > 0
    # Dict-membership pruning: low-cardinality string pages carry their
    # full distinct set, so equality predicates prune exactly even when
    # the value falls inside [min, max] (e.g. 'CLERK#5' between
    # 'CLERK#1' and 'CLERK#9' but absent from the page).
    distinct = getattr(p, "distinct", None)
    if distinct is not None and isinstance(f, (EqualTo, In)):
        values = [f.value] if isinstance(f, EqualTo) else list(f.value)
        decoded = []
        for v in values:
            if isinstance(v, bytes):
                try:
                    v = v.decode("utf-8")
                except UnicodeDecodeError:
                    return True  # incomparable with the stored stat
            decoded.append(v)
        if all(isinstance(v, str) for v in decoded):
            return any(v in distinct for v in decoded)
        # r9: low-cardinality INT pages persist their distinct set too
        # (status codes, enum ids) — equality/IN prunes exactly where
        # min/max can't prove absence.  The stored set is a SUPERSET of
        # live values (nulls encode a 0 placeholder), so a miss proves
        # absence while a spurious hit only weakens pruning.
        if all(isinstance(v, int) and not isinstance(v, bool) for v in decoded) and all(
            isinstance(d, int) and not isinstance(d, bool) for d in distinct
        ):
            dset = set(distinct)
            return any(v in dset for v in decoded)
    bloom_b64 = getattr(p, "bloom", None)
    if bloom_b64 is not None and isinstance(f, (EqualTo, In)):
        import base64

        from strawboat_spark.sources.codecs import _bloom_may_contain

        try:
            blob = base64.b64decode(bloom_b64)
            values = [f.value] if isinstance(f, EqualTo) else list(f.value)
            probes = []
            for v in values:
                probes.append(v.encode("utf-8") if isinstance(v, str) else v)
            if all(isinstance(v, bytes) for v in probes):
                if not any(_bloom_may_contain(blob, v) for v in probes):
                    return False
        except Exception:
            pass  # unreadable stat never prunes
    mn, mx = p.min, p.max
    if mn is None or mx is None:
        return True
    if isinstance(f, StringStartsWith):
        # a value with prefix v can live in [mn, mx] only if v sits
        # between the stats' same-length prefixes (stats are stored
        # un-truncated: _json_safe voids anything >64 chars)
        v = f.value
        if not (isinstance(v, str) and isinstance(mn, str) and isinstance(mx, str)):
            return True
        return mn[: len(v)] <= v <= mx[: len(v)]
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
# Stream read path: the directory as an unbounded table — each new file
# is a micro-batch increment (file-source semantics for the format).
#
# APPEND-ONLY CONTRACT (same as Spark's file source over a Delta
# directory): increments are whole committed files, replayed
# immutably from checkpoints. Mutation verbs are NOT reflected —
# merge-on-read deletion vectors never retro-apply to files already
# streamed (a replay must be deterministic), and a COW rewrite or
# compact lands NEW files whose rows would re-emit as if appended.
# Stream from append-only tables; for mutation-aware streaming,
# consume Table.changes() feeds between generations (batch CDF)
# until a streaming CDF source exists.
# --------------------------------------------------------------------------


class StrawboatStreamReaderImpl(DataSourceStreamReader):
    """Offset = (mtime watermark, files inside a lookback window).

    Compaction: a long-running stream must not carry every file it has
    ever seen in each offset, so the offset holds only files whose
    mtime is within `max_file_age` (default 15 min) of the watermark —
    anything older is assumed already processed, the same aging
    assumption Spark's own FileStreamSource makes (`maxFileAge`). A
    batch is the set difference of two offsets' `recent` lists, so a
    committed batch replays deterministically WITHOUT re-listing the
    directory. Files are immutable once renamed/PUT into place, so
    file granularity gives exactly-once.

    A file that lands with an mtime older than (watermark − lookback)
    — e.g. restored from a backup with timestamps preserved — is
    missed, exactly as with Spark's file source; widen max_file_age
    for such layouts. Offsets from the previous list-of-all-files
    format (`{"seen": [...]}`) are still understood, so existing
    checkpoints keep working.

    Rate limiting (`max_files_per_trigger`, Spark's maxFilesPerTrigger
    analog): each planned offset advances by at most K files, oldest
    mtime first — the knob that turns a 100 TB backfill from one
    giant micro-batch into a bounded-memory stream of K-file batches.
    The capped offset takes a PREFIX of the backlog ordered by
    (mtime, path), so every un-taken file's mtime is >= the new
    watermark and the aging assumption ("older than watermark −
    lookback ⇒ processed") can never skip an unprocessed file.
    Capping holds no engine-visible state beyond the offsets
    themselves, and `partitions` makes restart safe without relying
    on any call-order guarantee: a batch emits only files that are in
    the end offset, absent from the start offset, absent from every
    OTHER offset the engine has shown this reader (those boundaries
    belong to already-planned batches), and not aged out relative to
    the start watermark — so a post-restart planner rebuilding its
    window from scratch can never re-emit a processed file, it just
    spends a couple of empty batches catching back up.
    """

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("strawboat: 'path' option is required")
        self.schema = schema
        self.lookback_ns = int(float(options.get("max_file_age_sec", "900")) * 1_000_000_000)
        self.max_files = int(options.get("max_files_per_trigger", "0") or 0)
        self.max_bytes = int(options.get("max_bytes_per_trigger", "0") or 0)
        if self.max_bytes and not self.max_files:
            self.max_files = 1 << 30  # bytes-only cap: file count unbounded
        self._last: dict | None = None  # capped mode: newest planned offset
        self._offsets_seen: list = []  # engine-provided (w, frozenset(recent))

    def _listing(self) -> list[tuple[str, int]]:
        """(relpath, mtime_ns) for every data file under the root.

        One stat per file here; against a real object store the mtime
        arrives with the LIST response (S3 LastModified), so a
        production backend folds this into list_files.
        """
        root = backend_path(self.path)
        fs = get_fs(self.path)
        out = []
        for f in _list_files(self.path):
            rel = os.path.relpath(backend_path(f), root)
            try:
                out.append((rel, fs.mtime_ns(f)))
            except (OSError, KeyError):
                continue  # vanished between list and stat
        return out

    def initialOffset(self) -> dict:  # noqa: N802
        return {"w": 0, "recent": []}

    def latestOffset(self) -> dict:  # noqa: N802
        listing = self._listing()
        if self.max_files:
            return self._capped_offset(listing)
        w = max((m for _, m in listing), default=0)
        return {
            "w": w,
            "recent": sorted(rel for rel, m in listing if m >= w - self.lookback_ns),
        }

    def _capped_offset(self, listing: list[tuple[str, int]]) -> dict:
        """Advance the offset by at most max_files, oldest mtime first.
        Taken files always enter `recent` (the batch diff emits only
        recent-members); the prefix order keeps every un-taken file's
        mtime >= the new watermark, so aging can't skip one."""
        base = self._last or {"w": 0, "recent": []}
        bw = base.get("w", 0)
        done = set(base.get("recent", []))
        m_by_rel = dict(listing)
        cand = sorted(
            (m, rel)
            for rel, m in listing
            if rel not in done and (bw == 0 or m >= bw - self.lookback_ns)
        )
        take = cand[: self.max_files]
        if self.max_bytes and len(take) > 1:
            # maxBytesPerTrigger analog: shrink the prefix to the byte
            # budget — always at least one file, so the stream advances
            fs = get_fs(self.path)
            kept, acc = [], 0
            for m, rel in take:
                try:
                    size = fs.stat_sig(entry_abs(self.path, rel))[0]
                except (OSError, KeyError):
                    size = 0  # vanished: keep, the batch read handles it
                if kept and acc + size > self.max_bytes:
                    break
                kept.append((m, rel))
                acc += size
            take = kept
        if not take:
            self._last = base
            return base
        w = max([bw] + [m for m, _ in take])
        recent = {
            rel for rel in done if m_by_rel.get(rel, -1) >= w - self.lookback_ns
        }
        recent.update(rel for _, rel in take)
        off = {"w": w, "recent": sorted(recent)}
        self._last = off
        return off

    def _capped_batch_filter(self, start: dict, end: dict, new: set) -> set:
        """Restart-safe emission filter for capped mode (see class
        docstring) — also re-seeds the planning window from the
        engine's own offsets, so a reader that restarted with a
        checkpoint ahead of its in-memory state catches up instead of
        replaying history."""
        key_end = (end.get("w", 0), frozenset(end.get("recent", ())))
        # files inside any OTHER engine-shown offset boundary belong to
        # already-planned batches — never this one's
        for w_seen, recent_seen in self._offsets_seen:
            if (w_seen, recent_seen) != key_end:
                new -= recent_seen
        # aging rule vs the start watermark: anything older than the
        # lookback was processed (or pre-aged) before `start`
        cutoff = start.get("w", 0) - self.lookback_ns
        if new and cutoff > 0:
            fs = get_fs(self.path)
            kept = set()
            for rel in new:
                try:
                    if fs.mtime_ns(entry_abs(self.path, rel)) >= cutoff:
                        kept.add(rel)
                except (OSError, KeyError):
                    continue  # vanished between list and stat
            new = kept
        for off in (start, end):
            k = (off.get("w", 0), frozenset(off.get("recent", ())))
            if k not in self._offsets_seen:
                self._offsets_seen.append(k)
        del self._offsets_seen[:-64]  # bounded memory
        for off in (start, end):
            if self._last is None or (
                off.get("w", 0),
                len(off.get("recent", ())),
            ) > (self._last.get("w", 0), len(self._last.get("recent", ()))):
                self._last = {
                    "w": off.get("w", 0),
                    "recent": list(off.get("recent", ())),
                }
        return new

    def partitions(self, start: dict, end: dict):
        if "seen" in start or "seen" in end:  # legacy offset format
            new = sorted(set(end.get("seen", end.get("recent", []))) - set(start.get("seen", start.get("recent", []))))
            return [_Stripe(entry_abs(self.path, rel), 0, -1) for rel in new]
        new = set(end.get("recent", [])) - set(start.get("recent", []))
        if self.max_files:
            new = self._capped_batch_filter(start, end, new)
        if (
            start.get("w", 0) == 0
            and not start.get("recent")
            and not self.max_files
        ):
            # First batch: also pick up pre-existing files older than the
            # lookback window (they are in no offset's `recent`). This
            # re-lists, so a replayed FIRST batch could in principle see
            # a late old-mtime file a prior attempt missed — the same
            # startup-only caveat as Spark's file source.
            w = end.get("w", 0)
            for rel, m in self._listing():
                if m < w - self.lookback_ns:
                    new.add(rel)
        return [_Stripe(entry_abs(self.path, rel), 0, -1) for rel in sorted(new)]

    def read(self, partition: _Stripe):
        from pyspark.sql.pandas.types import to_arrow_schema

        from strawboat_spark.sources.pagefile import StrawboatReader

        if partition is None:
            # planning pruned every file: Spark still runs one task
            return iter(())
        want = to_arrow_schema(self.schema)
        fschema, fmeta = _cached_footer(partition.file)
        with get_fs(partition.file).open_read(partition.file) as f:
            reader = StrawboatReader(f, schema=fschema, meta=fmeta)
            for batch in reader.iter_batches(columns=list(want.names)):
                yield batch.cast(want, safe=False) if batch.schema != want else batch

    def commit(self, end: dict) -> None:
        return None


@dataclass
class _CDFPart(InputPartition):
    kind: str  # "insert" (new file) | "delete" (removed file) | "delete_rows"
    file: str
    generation: int
    part_values: tuple = ()
    skip: tuple = ()  # ordinals to EXCLUDE (the file's DV at `generation`)
    only: tuple = ()  # delete_rows: ordinals to EMIT (the DV delta)
    colmap: tuple = ()  # column-mapping aliases (see _Stripe.colmap)
    defaults: tuple = ()  # declared-column defaults (see _Stripe.defaults)
    # sidecar refs (absolute paths) decoded executor-side and unioned
    # into skip/only respectively — DV positions stay off the driver
    skip_refs: tuple = ()
    only_refs: tuple = ()


class StrawboatCDFStreamReaderImpl(DataSourceStreamReader):
    """Streaming change data feed: offsets are manifest GENERATIONS,
    each micro-batch emits the row-level changes of the generations in
    (start, end] — the streaming twin of Table.changes().

    Per-generation increments are per-file, so every partition is
    independently computable from immutable manifests (deterministic
    checkpoint replay, like the file stream source):
      - a file added at generation g -> its live rows as 'insert'
      - a file removed at g          -> its prior live rows as 'delete'
      - a surviving file whose deletion vector GREW at g -> exactly the
        newly-masked ordinals as 'delete' rows (merge-on-read verbs
        stream EXACTLY)
      - a generation whose manifest records operation 'update-mor'
        emits its DV delta as 'update_preimage' and its landed files
        as 'update_postimage' (Delta CDF's update images) — only that
        verb qualifies, because only there do the masked rows and the
        landed rows correspond exactly to the changed rows
    Copy-on-write rewrites and compaction are remove+add pairs, so they
    re-emit surviving rows as delete+insert (the documented Delta
    ignoreChanges-style over-report; MOR verbs avoid it entirely).
    Replay reaches only generations vacuum() still retains — the same
    retention horizon as time travel."""

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        self.schema = schema
        self.start_gen = int(options.get("starting_generation", 0) or 0)
        # maxFilesPerTrigger analog for the CDF: each micro-batch
        # covers at most K generations.  Trivially restart-safe:
        # offsets are scalar generations and a batch is the range
        # (start, end], so a cold planner that regresses the offset
        # yields an EMPTY range (never a replay), re-seeds from the
        # engine's own offsets at the next partitions() call, and
        # advances capped from there.
        self.max_gens = int(options.get("max_generations_per_trigger", "0") or 0)
        self._last_gen: int | None = None

    def initialOffset(self) -> dict:  # noqa: N802
        if self.start_gen > 0:
            return {"gen": self.start_gen - 1}
        man = read_manifest(self.path)
        return {"gen": man.get("generation", 0) if man else 0}

    def latestOffset(self) -> dict:  # noqa: N802
        man = read_manifest(self.path)
        head = man.get("generation", 0) if man else 0
        if self.max_gens:
            base = self._last_gen
            if base is None and self.start_gen > 0:
                base = self.start_gen - 1
            if base is not None:
                head = min(head, base + self.max_gens)
            self._last_gen = head
        return {"gen": head}

    def partitions(self, start: dict, end: dict):
        if self.max_gens:
            seed = max(start.get("gen", 0), end.get("gen", 0))
            if self._last_gen is None or seed > self._last_gen:
                self._last_gen = seed
        all_files = _list_files(self.path)
        part_types = dict(_infer_partition_fields(self.path, all_files))

        def _pv(file: str) -> tuple:
            return tuple(
                sorted(
                    (k, _cast_partition_value(v, part_types[k]))
                    for k, v in _partition_values(file, self.path).items()
                )
            )

        parts: list[_CDFPart] = []
        cmap = tuple(
            (lg, tuple(aliases)) for lg, aliases in column_mapping(self.path).items()
        )
        defaults = tuple(
            (n, d.get("default"))
            for n, d in declared_columns(self.path).items()
            if d.get("default") is not None
        )
        for g in range(start.get("gen", 0) + 1, end.get("gen", 0) + 1):
            prev = (
                read_manifest_at(self.path, g - 1)
                if g > 1
                else {"entries": []}
            )
            cur = read_manifest_at(self.path, g)
            # DV-ref consolidation swaps many sidecar refs for ONE
            # merged ref WITHOUT changing any decoded vector — pure
            # metadata (Delta dataChange=false).  Diffing its ref sets
            # would re-emit every historical deleted row of the file as
            # a fresh delete event, so the generation is skipped
            # outright (it never adds/removes files or positions by
            # construction — maintenance.consolidate_dv_refs).
            if cur.get("operation") == "consolidate-dv":
                continue
            # A merge-on-read UPDATE generation identifies its changed
            # rows exactly: the DV delta is the pre-update versions,
            # the landed files are the post-update versions — so the
            # feed can emit Delta's update_preimage/update_postimage
            # instead of delete+insert.  Only update-mor qualifies:
            # COW rewrites carry untouched neighbor rows, and merges
            # mix true inserts into the landed files.
            is_update = cur.get("operation") == "update-mor"
            # (inline ordinals decoded, sidecar ref paths NOT decoded) —
            # refs are append-only, so the delta between generations is
            # metadata-computable and positions stay off the driver
            ent_prev = {
                e["path"]: (decode_deletes(e.get("deletes")), entry_dv_refs(self.path, e))
                for e in prev["entries"]
            }
            ent_cur = {
                e["path"]: (decode_deletes(e.get("deletes")), entry_dv_refs(self.path, e))
                for e in cur["entries"]
            }
            for rel, (dv, refs) in sorted(ent_cur.items()):
                file = entry_abs(self.path, rel)
                pv = _pv(file)
                if rel not in ent_prev:
                    kind = "update_post" if is_update else "insert"
                    parts.append(
                        _CDFPart(kind, file, g, pv, skip=dv, colmap=cmap,
                                 defaults=defaults, skip_refs=refs)
                    )
                elif (dv, refs) != ent_prev[rel]:
                    pdv, prefs = ent_prev[rel]
                    delta = tuple(sorted(set(dv) - set(pdv)))
                    new_refs = tuple(r for r in refs if r not in prefs)
                    if delta or new_refs:
                        kind = "update_pre" if is_update else "delete_rows"
                        parts.append(
                            _CDFPart(kind, file, g, pv, only=delta, colmap=cmap,
                                     defaults=defaults, only_refs=new_refs)
                        )
            for rel, (dv, refs) in sorted(ent_prev.items()):
                if rel not in ent_cur:
                    file = entry_abs(self.path, rel)
                    parts.append(
                        _CDFPart("delete", file, g, _pv(file), skip=dv,
                                 colmap=cmap, defaults=defaults, skip_refs=refs)
                    )
        return parts

    def read(self, partition: _CDFPart):
        import numpy as np

        from pyspark.sql.pandas.types import to_arrow_schema

        from strawboat_spark.sources.pagefile import StrawboatReader

        if partition is None:
            return
        want = to_arrow_schema(self.schema)
        change_type = {
            "insert": "insert",
            "update_post": "update_postimage",
            "update_pre": "update_preimage",
            "delete_rows": "delete",
            "delete": "delete",
        }[partition.kind]
        pvals = dict(partition.part_values)
        consts = {
            "_change_type": change_type,
            "_generation": partition.generation,
            **pvals,
        }
        skip = np.asarray(partition.skip, dtype=np.int64)
        only = np.asarray(partition.only, dtype=np.int64)
        if partition.skip_refs:
            skip = np.unique(np.concatenate(
                [skip] + [np.asarray(read_dv_sidecar(r), dtype=np.int64)
                          for r in partition.skip_refs]))
        if partition.only_refs:
            only = np.unique(np.concatenate(
                [only] + [np.asarray(read_dv_sidecar(r), dtype=np.int64)
                          for r in partition.only_refs]))
        fschema, fmeta = _cached_footer(partition.file)
        with get_fs(partition.file).open_read(partition.file) as f:
            reader = StrawboatReader(f, schema=fschema, meta=fmeta)
            avail = set(reader.schema.names)
            dflts = dict(partition.defaults)
            side = {
                c: _file_side_name(avail, c, partition.colmap)
                for c in want.names
                if c not in consts
            }
            stored = [side[c] for c in want.names if c not in consts and side.get(c)]
            pages = reader.meta.leaves[0].pages if reader.meta.leaves else []
            offsets = [0]
            for pg in pages:
                offsets.append(offsets[-1] + pg.num_values)
            for page_i, batch in enumerate(reader.iter_batches(columns=stored)):
                lo, hi = offsets[page_i], offsets[page_i] + batch.num_rows
                if partition.kind in ("delete_rows", "update_pre"):
                    sel = only[(only >= lo) & (only < hi)] - lo
                    if not len(sel):
                        continue
                    mask = np.zeros(batch.num_rows, dtype=bool)
                    mask[sel] = True
                else:
                    mask = np.ones(batch.num_rows, dtype=bool)
                    if len(skip):
                        drop = skip[(skip >= lo) & (skip < hi)] - lo
                        mask[drop] = False
                    if not mask.any():
                        continue
                n = int(mask.sum())
                byname = {nm: batch.column(i) for i, nm in enumerate(batch.schema.names)}
                arrays = []
                for fld in want:
                    if fld.name in consts:
                        arrays.append(_const_array(consts[fld.name], n, fld.type))
                    elif side.get(fld.name) in byname:
                        col = byname[side[fld.name]].filter(pa.array(mask))
                        if col.type != fld.type:
                            # metadata-only type widening (see _Stripe path)
                            col = col.cast(fld.type, safe=False)
                        arrays.append(col)
                    elif fld.name in dflts:
                        arrays.append(_const_array(dflts[fld.name], n, fld.type))
                    else:
                        arrays.append(pa.nulls(n, fld.type))
                out = pa.RecordBatch.from_arrays(arrays, schema=want)
                yield out.cast(want, safe=False) if out.schema != want else out

    def commit(self, end: dict) -> None:
        return None


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
        self.forbidden = _parse_forbidden(options)
        self.compress_ratio = float(options["compress_ratio"]) if "compress_ratio" in options else None
        self.bloom_columns = frozenset(
            c.strip() for c in options.get("bloom_columns", "").split(",") if c.strip()
        )
        # Hive-style layout: partition columns become directories, not
        # stored pages (option because the Python DataSource API has no
        # partitionBy passthrough).
        self.partition_by = [c.strip() for c in options.get("partition_by", "").split(",") if c.strip()]
        for c in self.partition_by:
            if c not in schema.fieldNames():
                raise ValueError(f"strawboat: partition_by column {c!r} not in schema")
        # Optional JSON dict committed as the new manifest's table
        # properties ATOMICALLY with this write (same generation flip)
        # — the txn-marker hook for idempotent foreachBatch folds.
        import json

        mp = options.get("manifest_properties")
        self.manifest_properties = json.loads(mp) if mp else None
        # Caller-supplied stamp written into the committed manifest so
        # the caller can find THE generation this job published (and
        # its commit_metrics) under concurrent committers — the SQL
        # INSERT rows_inserted path rides this.
        self.commit_uuid = options.get("commit_uuid") or None
        # Runs on the driver: prepare the output directory.
        self.overwrite = overwrite
        fs = get_fs(self.path)
        fs.makedirs(self.path)
        if overwrite:
            # Overwrite is a MANIFEST generation flip, not a physical
            # purge: commit() publishes a generation listing ONLY this
            # job's files (replace=True). Old files stay on disk,
            # listed by their own immutable generation manifests, so
            # time travel across the overwrite works and a concurrent
            # reader planned against the old generation finishes its
            # scan — vacuum() reclaims them later. Orphans from crashed
            # jobs are never adopted (the replace manifest lists only
            # committed files). A legacy dir without a manifest gets
            # one FIRST so its pre-overwrite state is snapshotted as a
            # readable generation (and globbing readers never see the
            # mixed old+new file set).
            if (
                fs.isdir(self.path)
                and read_manifest(self.path) is None
                and fs.list_files(self.path, FILE_EXT)
            ):
                publish_manifest(self.path)
        else:
            # Append: the directory's footer schema is the contract —
            # a second schema would silently corrupt later reads (the
            # reader takes the first file's footer as truth).
            existing = _list_files(self.path) if fs.isdir(self.path) else []
            if existing:
                from pyspark.sql.pandas.types import from_arrow_schema

                cmap = column_mapping(self.path)
                # a DROPPED or RENAMED-AWAY name cannot be re-introduced
                # by append: old files still store data under it, and
                # name-based resolution would ambiguously claim the new
                # column's values for the tombstone (or vice versa).
                # Overwrite resets the mapping and frees the name.
                claimed = {a for aliases in cmap.values() for a in aliases}
                bad = [f.name for f in schema.fields if f.name in claimed]
                if bad:
                    raise ValueError(
                        f"strawboat: append reintroduces historical column "
                        f"name(s) {bad} (renamed away or dropped; old files "
                        f"still store data under them). Pick fresh names or "
                        f"overwrite the table."
                    )
                have, _ = _cached_footer(existing[0])
                # column mapping: compare under LOGICAL names (an old
                # file's footer may store pre-rename aliases); type
                # widening: compare under the DECLARED (wide) types
                have = _apply_widening(
                    _to_logical_schema(have, cmap), widened_columns(self.path)
                )
                have_spark = from_arrow_schema(have, prefer_timestamp_ntz=True)
                # declared columns (add_column) belong to the logical
                # contract even when the probe file predates them
                for dname, dspec in declared_columns(self.path).items():
                    if dname not in have_spark.fieldNames():
                        have_spark = have_spark.add(dname, _scalar_type(dspec["type"]))
                incoming = StructType(
                    [fld for fld in schema.fields if fld.name not in self_partition_cols(options)]
                )
                if options.get("merge_schema", "").lower() == "true":
                    # Evolution-tolerant guard: columns may be added or
                    # dropped across appends (read side null-fills),
                    # but a shared name must keep its type.
                    have_types = {f.name: f.dataType for f in have_spark.fields}
                    for fld in incoming.fields:
                        if fld.name in have_types and have_types[fld.name] != fld.dataType:
                            raise ValueError(
                                f"strawboat: append type conflict on {fld.name!r}: "
                                f"{have_types[fld.name]} vs {fld.dataType}"
                            )
                elif [
                    (f.name, f.dataType) for f in have_spark.fields
                ] != [(f.name, f.dataType) for f in incoming.fields]:
                    # Partition-spec evolution: a column may legitimately
                    # move between page storage and directory storage
                    # across epochs (set_partition_layout). The LOGICAL
                    # column set must still match — stored ∪ directory on
                    # the probe file vs stored ∪ this write's partition
                    # cols — and any column physically stored by BOTH
                    # epochs must keep its type.
                    log_have = {f.name for f in have_spark.fields} | set(
                        _partition_values(existing[0], self.path)
                    )
                    log_inc = {f.name for f in schema.fields}
                    inc_types = {f.name: f.dataType for f in incoming.fields}
                    conflict = [
                        f.name
                        for f in have_spark.fields
                        if f.name in inc_types and inc_types[f.name] != f.dataType
                    ]
                    if log_have != log_inc or conflict:
                        raise ValueError(
                            "strawboat: append schema mismatch — existing "
                            f"{have_spark.simpleString()} vs incoming "
                            f"{incoming.simpleString()}"
                        )

    def write(self, iterator):
        from pyspark.sql.pandas.types import to_arrow_schema

        from strawboat_spark.sources.codecs import Codec
        from strawboat_spark.sources.pagefile import StrawboatWriter

        codec = {"none": Codec.NONE, "lz4": Codec.LZ4, "zstd": Codec.ZSTD, "snappy": Codec.SNAPPY}[
            self.codec_name.lower()
        ]
        arrow_schema = to_arrow_schema(self.schema)
        if self.partition_by:
            return self._write_partitioned(iterator, arrow_schema, codec)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}{FILE_EXT}")
        with get_fs(out).create(out) as f:
            w = StrawboatWriter(f, arrow_schema, page_size=self.page_size, default_codec=codec, forbidden=self.forbidden, compress_ratio=self.compress_ratio, bloom_columns=self.bloom_columns)
            for batch in iterator:
                if batch.schema != arrow_schema:
                    batch = batch.cast(arrow_schema, safe=False)
                w.write_batch(batch)
            meta = w.finish()
        return _Commit(
            files=[out],
            metas=[_meta_json_dict(meta)],
            schemas_b64=[_schema_b64(arrow_schema)],
        )

    def _write_partitioned(self, iterator, arrow_schema: pa.Schema, codec):
        """One open file per partition value seen by this task; the
        partition columns are encoded in the directory name and dropped
        from the stored pages (hive convention — readers reattach them
        as constants, so they cost zero bytes and prune for free).

        Scale note: tasks writing the same value produce separate files
        (no coordination); pre-`repartition(partition_cols)` upstream to
        get one file per value when that matters."""
        import urllib.parse

        import pyarrow.compute as pc

        from strawboat_spark.sources.pagefile import StrawboatWriter

        part_cols = self.partition_by
        stored = pa.schema([f for f in arrow_schema if f.name not in part_cols])
        open_files: dict[str, tuple] = {}  # reldir -> (handle, writer, final)

        def _writer_for(reldir: str):
            if reldir not in open_files:
                d = os.path.join(self.path, reldir)
                fs = get_fs(d)
                fs.makedirs(d)
                final = os.path.join(d, f"part-{uuid.uuid4().hex}{FILE_EXT}")
                h = fs.create(final)
                w = StrawboatWriter(h, stored, page_size=self.page_size, default_codec=codec, forbidden=self.forbidden, compress_ratio=self.compress_ratio, bloom_columns=self.bloom_columns)
                open_files[reldir] = (h, w, final)
            return open_files[reldir][1]

        try:
            for batch in iterator:
                if batch.schema != arrow_schema:
                    batch = batch.cast(arrow_schema, safe=False)
                tbl = pa.Table.from_batches([batch])
                # distinct partition tuples in this batch (cheap: group_by on
                # the already-in-memory arrow batch)
                combos = tbl.select(part_cols).group_by(part_cols).aggregate([]).to_pylist()
                for combo in combos:
                    mask = None
                    for c in part_cols:
                        m = (
                            pc.is_null(tbl[c])
                            if combo[c] is None
                            else pc.equal(tbl[c], pa.scalar(combo[c], type=tbl.schema.field(c).type))
                        )
                        mask = m if mask is None else pc.and_kleene(mask, m)
                    sub = tbl.filter(pc.fill_null(mask, False)).select(stored.names)
                    reldir = os.sep.join(
                        f"{c}={_HIVE_NULL if combo[c] is None else urllib.parse.quote(str(combo[c]), safe='')}"
                        for c in part_cols
                    )
                    w = _writer_for(reldir)
                    for b in sub.to_batches():
                        w.write_batch(b)
            files = []
            metas = []
            for h, w, final in open_files.values():
                metas.append(_meta_json_dict(w.finish()))
                h.close()
                files.append(final)
        except BaseException:
            # a failed task must DISCARD its open handles: on an object
            # store close() publishes (PutObject), so the default
            # close-on-GC path would durably PUT truncated files
            for h, _w, _final in open_files.values():
                try:
                    getattr(h, "abort", h.close)()
                except Exception:  # noqa: BLE001 - best-effort cleanup
                    pass
            raise
        return _Commit(
            files=files, metas=metas, schemas_b64=[_schema_b64(stored)] * len(files)
        )

    def commit(self, messages):
        publish_manifest(
            self.path,
            messages,
            replace=self.overwrite,
            properties=self.manifest_properties,
            commit_uuid=self.commit_uuid,
        )
        return None

    def abort(self, messages):
        for m in messages:
            if m is not None:
                for f in m.files:
                    try:
                        get_fs(f).remove(f)
                    except (OSError, KeyError):
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
        self.forbidden = _parse_forbidden(options)
        self.compress_ratio = float(options["compress_ratio"]) if "compress_ratio" in options else None
        get_fs(self.path).makedirs(self.path)

    def write(self, iterator):
        from pyspark.sql.pandas.types import to_arrow_schema

        from strawboat_spark.sources.codecs import Codec
        from strawboat_spark.sources.pagefile import StrawboatWriter

        codec = {"none": Codec.NONE, "lz4": Codec.LZ4, "zstd": Codec.ZSTD, "snappy": Codec.SNAPPY}[
            self.codec_name.lower()
        ]
        arrow_schema = to_arrow_schema(self.schema)
        out = os.path.join(self.path, f"stream-{uuid.uuid4().hex}{FILE_EXT}")
        wrote = False
        h = get_fs(out).create(out)
        w = StrawboatWriter(h, arrow_schema, page_size=self.page_size, default_codec=codec, forbidden=self.forbidden, compress_ratio=self.compress_ratio)
        try:
            for batch in iterator:
                if batch.schema != arrow_schema:
                    batch = batch.cast(arrow_schema, safe=False)
                w.write_batch(batch)
                wrote = True
            meta = w.finish()
        except BaseException:
            h.abort()
            raise
        if wrote:
            h.close()
            return _Commit(
                files=[out],
                metas=[_meta_json_dict(meta)],
                schemas_b64=[_schema_b64(arrow_schema)],
            )
        h.abort()
        return _Commit(files=[])

    def commit(self, messages, batchId=None):  # noqa: N803
        publish_manifest(self.path, messages, operation="stream-append")
        return None

    def abort(self, messages, batchId=None):  # noqa: N803
        for m in messages:
            if m is not None:
                for f in m.files:
                    try:
                        get_fs(f).remove(f)
                    except (OSError, KeyError):
                        pass


def ensure_active_session(spark) -> None:
    """Pin `spark` as the ACTIVE session on the calling thread's JVM
    twin. py4j pinned-thread mode (the default) maps every Python
    thread to its own fresh JVM thread whose active SparkSession is
    UNSET — a `.save()`/`.load()` of a Python data source from such a
    thread then fails with DATA_SOURCE_NOT_FOUND (the JVM-side lookup
    resolves Python sources through the active session's manager).
    Cheap and idempotent; called by register() and Table._write so
    every table verb is safe from concurrent committer threads."""
    try:
        jss = spark._jsparkSession
    except Exception:  # pragma: no cover - connect-mode sessions
        return
    for cls in ("classic.SparkSession", "SparkSession"):
        try:
            obj = spark._jvm.org.apache.spark.sql
            for part in cls.split("."):
                obj = getattr(obj, part)
            obj.setActiveSession(jss)
            return
        except Exception:
            continue


def register(spark) -> None:
    """Idempotently register the strawboat format with a session."""
    ensure_active_session(spark)
    # pushFilters support requires this conf (runtime-settable).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(StrawboatDataSource)
    except Exception as e:  # already registered in this session
        if "already" not in str(e).lower():
            raise
