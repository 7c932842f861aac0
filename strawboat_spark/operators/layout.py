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
from pyspark.sql import Column, DataFrame

_ZBITS = 21  # bits per dimension at 2 dims; n dims get 62 // n


def _rank_scale(col, mn, mx, bits: int):
    """Scale a numeric column to an integer [0, 2^bits) rank given its
    min/max (driver-computed once; constant-folded into the plan)."""
    if mn is None or mx is None:
        return F.lit(0).cast("bigint")  # all-null column: constant rank
    span = float(mx) - float(mn)
    if span <= 0:
        return F.lit(0).cast("bigint")
    scale = ((1 << bits) - 1) / span
    r = ((col.cast("double") - float(mn)) * scale).cast("bigint")
    return F.greatest(F.lit(0), F.least(r, F.lit((1 << bits) - 1)))


def zorder_key(ranks: list[Column], bits: int) -> Column:
    """Interleave the low `bits` bits of n non-negative bigint ranks
    (rank j occupies bit positions j, j+n, j+2n, ...): pure
    shift/and/or expressions, whole-stage-codegen friendly."""
    n = len(ranks)
    z = F.lit(0).cast("bigint")
    for k in range(bits):
        for j, r in enumerate(ranks):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(r, k).bitwiseAND(F.lit(1)), k * n + j)
            )
    return z


def with_zorder_key(df: DataFrame, cols: list[str], out_col: str = "__zkey") -> DataFrame:
    """Attach the Z-order key over `cols` (2+ numeric columns). Column
    min/max come from ONE lightweight agg (2n scalars to the driver)."""
    if len(cols) < 2:
        raise ValueError("zorder needs at least 2 columns")
    bits = min(_ZBITS, 62 // len(cols))
    aggs = []
    for c in cols:
        aggs += [F.min(c), F.max(c)]
    mm = df.agg(*aggs).collect()[0]
    ranks = [
        _rank_scale(F.col(c), mm[2 * i], mm[2 * i + 1], bits) for i, c in enumerate(cols)
    ]
    return df.withColumn(out_col, zorder_key(ranks, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *more_cols: str,
    n_files: int = 4,
    page_size: int = 1024,
) -> None:
    """Write `df` as a strawboat directory Z-ORDERED on the given
    columns: range-partition + sort by the interleaved key, so the
    persisted per-page min/max stats prune selective filters on ANY of
    the clustered columns.

    Scale shape: ONE shuffle (repartitionByRange on the z-key) no
    matter how many later queries prune; column min/max come from a
    single lightweight agg."""
    keyed = with_zorder_key(df, [col_a, col_b, *more_cols])
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.format("strawboat")
        .option("page_size", str(page_size))
        .mode("overwrite")
        .save(path)
    )


def hilbert_index_np(ranks, bits: int):
    """Vectorized Skilling transform (public-domain 'Programming the
    Hilbert curve', AIP 2004): n-dim integer coordinates in [0, 2^bits)
    -> Hilbert curve distance. Unlike Z-order, consecutive curve
    positions are ALWAYS grid-adjacent, so equal-size pages cut from
    the sorted order cover more compact (tighter min/max) regions —
    the clustering used by lakehouse 'liquid' layouts.

    ranks: (rows, n) integer array. Returns uint64 distances (n * bits
    must be <= 63)."""
    import numpy as np

    X = np.ascontiguousarray(ranks, dtype=np.uint64).copy()
    rows, n = X.shape
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds 63 bits")
    M = np.uint64(1 << (bits - 1))
    # inverse undo excess work
    Q = M
    while Q > np.uint64(1):
        P = Q - np.uint64(1)
        for i in range(n):
            hot = (X[:, i] & Q) != 0
            X[hot, 0] ^= P  # invert low bits of axis 0
            t = (X[~hot, 0] ^ X[~hot, i]) & P  # exchange with axis i
            X[~hot, 0] ^= t
            X[~hot, i] ^= t
        Q >>= np.uint64(1)
    # Gray encode
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(rows, dtype=np.uint64)
    Q = M
    while Q > np.uint64(1):
        hot = (X[:, n - 1] & Q) != 0
        t[hot] ^= Q - np.uint64(1)
        Q >>= np.uint64(1)
    for i in range(n):
        X[:, i] ^= t
    # interleave the transpose: bit q of axis i lands at output bit
    # position q*n + (n-1-i) (axis 0 most significant within each level)
    out = np.zeros(rows, dtype=np.uint64)
    for q in range(bits):
        for i in range(n):
            bit = (X[:, i] >> np.uint64(q)) & np.uint64(1)
            out |= bit << np.uint64(q * n + (n - 1 - i))
    return out


def with_hilbert_key(df: DataFrame, cols: list[str], out_col: str = "__hkey") -> DataFrame:
    """Attach the Hilbert-curve key over `cols`. Ranks are computed
    JVM-side exactly like the Z-order path; the curve transform runs
    once per row at WRITE time in an Arrow-batched pandas UDF (the
    data-dependent axis swaps of the Skilling transform would explode
    whole-stage codegen as Column expressions — a write-time UDF
    amortized over every later pruned scan is the right trade)."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    if len(cols) < 2:
        raise ValueError("hilbert clustering needs at least 2 columns")
    bits = min(_ZBITS, 62 // len(cols))
    aggs = []
    for c in cols:
        aggs += [F.min(c), F.max(c)]
    mm = df.agg(*aggs).collect()[0]
    ranks = [
        _rank_scale(F.col(c), mm[2 * i], mm[2 * i + 1], bits) for i, c in enumerate(cols)
    ]
    n = len(cols)

    def _curve(*rank_cols):
        import numpy as np

        stacked = np.stack([r.to_numpy(dtype="int64") for r in rank_cols], axis=1)
        return pd.Series(hilbert_index_np(stacked, bits).astype("int64"))

    curve = pandas_udf(_curve, "bigint")
    tmp = [f"__r{i}" for i in range(n)]
    keyed = df
    for name, r in zip(tmp, ranks):
        keyed = keyed.withColumn(name, r)
    return keyed.withColumn(out_col, curve(*[F.col(t) for t in tmp])).drop(*tmp)


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *more_cols: str,
    n_files: int = 4,
    page_size: int = 1024,
) -> None:
    """Write `df` Hilbert-clustered on the given columns: same ONE
    repartitionByRange + sortWithinPartitions shuffle as the Z-order
    writer, tighter page min/max on average (curve adjacency)."""
    keyed = with_hilbert_key(df, [col_a, col_b, *more_cols])
    (
        keyed.repartitionByRange(n_files, "__hkey")
        .sortWithinPartitions("__hkey")
        .drop("__hkey")
        .write.format("strawboat")
        .option("page_size", str(page_size))
        .mode("overwrite")
        .save(path)
    )
