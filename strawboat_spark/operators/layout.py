"""Data-layout operators: clustering the write so persisted page
stats prune on MORE than one column.

A single-column sort gives tight per-page min/max on that column only;
Z-ORDERING interleaves the bits of several columns' ranks so rows
close in the multi-dimensional key space land in the same pages — the
standard lakehouse layout trick for multi-predicate workloads. Pure
JVM bit arithmetic (shift/or loops unroll into codegen), one
repartitionByRange + sortWithinPartitions shuffle at write time,
amortized over every later pruned scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_ZBITS = 21  # bits per dimension (2 dims fit a bigint with room)


def _rank_scale(col, mn, mx, bits: int = _ZBITS):
    """Scale a numeric column to an integer [0, 2^bits) rank given its
    min/max (driver-computed once; constant-folded into the plan)."""
    span = float(mx) - float(mn)
    if span <= 0:
        return F.lit(0).cast("bigint")
    scale = ((1 << bits) - 1) / span
    r = ((col.cast("double") - float(mn)) * scale).cast("bigint")
    return F.greatest(F.lit(0), F.least(r, F.lit((1 << bits) - 1)))


def zorder_key(a, b, bits: int = _ZBITS):
    """Interleave the low `bits` bits of two non-negative bigint ranks
    (a even positions, b odd): pure shift/and/or expressions."""
    z = F.lit(0).cast("bigint")
    for k in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, k).bitwiseAND(F.lit(1)), 2 * k)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, k).bitwiseAND(F.lit(1)), 2 * k + 1))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 4,
    page_size: int = 1024,
) -> None:
    """Write `df` as a strawboat directory Z-ORDERED on (col_a, col_b):
    range-partition + sort by the interleaved key, so the persisted
    per-page min/max stats prune selective filters on EITHER column.

    Scale shape: ONE shuffle (repartitionByRange on the z-key) no
    matter how many later queries prune; min/max of both columns come
    from a single lightweight agg (two scalars to the driver)."""
    mm = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    za = _rank_scale(F.col(col_a), mm[0], mm[1])
    zb = _rank_scale(F.col(col_b), mm[2], mm[3])
    keyed = df.withColumn("__zkey", zorder_key(za, zb))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.format("strawboat")
        .option("page_size", str(page_size))
        .mode("overwrite")
        .save(path)
    )
