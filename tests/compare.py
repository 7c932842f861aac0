"""Driver-style Spark-vs-DuckDB comparison: row count, column names,
order-insensitive value multiset, and result-column TYPE families.

Values are normalized (floats compared on BOTH 9 significant digits and
6 absolute decimal places, dates/timestamps stringified) before the
multiset comparison so we catch real semantic drift — including
sub-unit drift at large magnitudes — not representation noise.  The actual driver, however, hashes
RAW values — Decimal(123) != int(123) — so on top of the normalized
compare we check that each oracle column's DuckDB type lands in the
same representation family as the Spark column (r6 post-mortem: the
graph_pagerank oracle's un-CAST SUM came back HUGEINT → arrow decimal
→ driver hash mismatch while values were identical; this module is the
local gate that would have caught it).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
from collections import Counter


def _norm(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        # Magnitude-independent normalization (r7 post-mortem): a pure
        # 9-sig-digit rule equated values a CENT apart at 1e9 magnitude
        # (1223725771.54 ≡ 1223725771.44 under %.9g), so the
        # strawboat_merge_when half-cent drift passed locally while the
        # driver's raw-value hash failed it.  We now require BOTH a
        # relative match (9 significant digits — catches drift in
        # small-magnitude scores) AND an absolute match (6 decimal
        # places — catches sub-unit drift at any magnitude the test
        # tables produce).  Either axis differing fails the compare.
        return f"{v:.9g}|{v:.6f}"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


# Representation families as the driver's raw-value hash sees them.
# DuckDB type name -> family; Spark simpleString -> family.  A
# mismatch means identical values would still hash differently
# (e.g. HUGEINT fetches as Decimal, BIGINT as int).
_DUCK_FAMILY = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "HUGEINT": "decimal",
    "UHUGEINT": "decimal",
    "FLOAT": "float",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BLOB": "bytes",
}

_SPARK_FAMILY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "bytes",
}


def _duck_family(type_str: str) -> str | None:
    t = str(type_str).upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    return _DUCK_FAMILY.get(t)


def _spark_family(simple: str) -> str | None:
    if simple.startswith("decimal"):
        return "decimal"
    return _SPARK_FAMILY.get(simple)


def type_mismatches(spark_df, duck_rel) -> list[str]:
    """Column-type-family mismatches that would survive a value-equal
    comparison but fail the driver's raw-value hash."""
    out: list[str] = []
    duck_types = {c[0]: t for c, t in zip(duck_rel.description, duck_rel.types)}
    for field in spark_df.schema.fields:
        if field.name not in duck_types:
            continue
        sf = _spark_family(field.dataType.simpleString())
        df_ = _duck_family(duck_types[field.name])
        if sf is None or df_ is None:
            continue  # nested/exotic types: multiset compare covers them
        if sf != df_:
            out.append(
                f"column {field.name!r}: spark {field.dataType.simpleString()} "
                f"({sf}) vs duckdb {duck_types[field.name]} ({df_}) — "
                f"driver raw-value hash would mismatch even on equal values"
            )
    return out


def compare_frames(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    d_cols = [c[0] for c in duck_rel.description]
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems

    problems.extend(type_mismatches(spark_df, duck_rel))

    order = sorted(s_cols)
    s_idx = [s_cols.index(c) for c in order]
    d_idx = [d_cols.index(c) for c in order]

    s_rows = [tuple(_norm(r[i]) for i in s_idx) for r in spark_df.collect()]
    d_rows = [tuple(_norm(r[i]) for i in d_idx) for r in duck_rel.fetchall()]

    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")

    sc, dc = Counter(s_rows), Counter(d_rows)
    if sc != dc:
        only_s = list((sc - dc).items())[:5]
        only_d = list((dc - sc).items())[:5]
        problems.append(f"values differ; spark-only={only_s} duck-only={only_d}")
    return problems
