"""Driver-style Spark-vs-DuckDB comparison: row count, column names,
order-insensitive value multiset. Values normalized (floats rounded to
9 sig places, dates/timestamps stringified) before comparison so we
catch real semantic drift, not representation noise — the actual
driver hashes raw values, which is why every query rounds its float
aggregates explicitly.
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
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def compare_frames(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    d_cols = [c[0] for c in duck_rel.description]
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems

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
