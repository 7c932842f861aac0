"""Slowly-changing-dimension (type 2) history from a change stream.

Given per-key timestamped observations of an attribute, produce the
SCD2 version table: one row per (key, run of equal attribute values),
with validity interval [valid_from, valid_to) and an is_current flag —
the standard warehouse shape for "what was this entity's state at
time T" joins (pairs with joins.py's as-of join on the consumer side).

Spark-first plan: ONE shuffle on the key; two window passes over the
same partitioning (change detection via lag on the full stream, then
interval closing via lead over the CHANGE ROWS ONLY — the second
window runs on the shrunken stream).  No join, no Python.  Per-key
state is a single lag value, so skew only affects sort width, and the
output is bounded by the number of attribute CHANGES, not events —
the right scaling for 100 TB event logs where attributes change
rarely.

Null semantics: attribute comparisons are null-safe (`<=>`), so a
null-valued run is a version like any other; the first observation of
a key always opens a version.

The reference format library has no operators (src/lib.rs:20-29);
engine-side extension like timeseries.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(key, ver, attr, valid_from_us, valid_to_us, is_current) —
    ver numbers versions 1..n per key in time order; valid_to_us is
    NULL on the open (current) version.  Timestamps are integer
    microseconds (exact across engines).  `tiebreak_col` breaks
    equal-timestamp ordering deterministically (required when the
    stream can carry same-microsecond observations)."""
    order = [F.col("__ts_us")] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    obs = df.select(
        key_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__ts_us"),
        F.col(attr_col).alias("__attr"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
    )
    starts = (
        obs.withColumn("__prev", F.lag("__attr").over(w))
        .withColumn("__rn", F.row_number().over(w))
        # a version opens on the first observation or any null-safe change
        .filter((F.col("__rn") == 1) | (~F.col("__attr").eqNullSafe(F.col("__prev"))))
    )
    w2 = Window.partitionBy(key_col).orderBy("__ts_us", *(
        [F.col(tiebreak_col)] if tiebreak_col else []
    ))
    return starts.select(
        F.col(key_col),
        F.row_number().over(w2).cast("long").alias("ver"),
        F.col("__attr").alias(attr_col),
        F.col("__ts_us").alias("valid_from_us"),
        F.lead("__ts_us").over(w2).alias("valid_to_us"),
        F.lead("__ts_us").over(w2).isNull().alias("is_current"),
    )
