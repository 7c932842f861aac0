"""Join operators beyond Spark's built-in strategies.

As-of join: the reference format has no joins at all (SURVEY.md §2C);
this is the engine-layer capability expressed Spark-first. The
union+window formulation below is the scale-correct one: it is a
single shuffle on (keys) + one sort within partitions — never a
pairwise time-condition join, whose intermediate blows up quadratically
per key at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before
    its timestamp (``direction='backward'``, inclusive, DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics), or the earliest
    at-or-after (``'forward'``).

    Requirements: ``left`` and ``right`` share the key columns ``on``
    and the timestamp column ``ts_col``; ``right_value_cols`` must not
    collide with left column names. Left rows with no match keep NULL
    values (filter afterwards for inner-asof semantics).

    Execution shape: union → single hash shuffle on ``on`` → per-key
    sort → last(ignorenulls) running window → filter. One shuffle,
    no join node, linear in |left|+|right|.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    keys = list(on)
    lhs = left.withColumn(_SIDE, F.lit(1))
    rhs = right.select(*keys, ts_col, *right_value_cols).withColumn(_SIDE, F.lit(0))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    if direction == "backward":
        # Right rows sort before left rows at equal ts → inclusive match.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.asc(ts_col), F.asc(_SIDE))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.asc(ts_col), F.desc(_SIDE))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first

    out = unioned
    for c in right_value_cols:
        out = out.withColumn(c, pick(c, ignorenulls=True).over(w))
    return out.filter(F.col(_SIDE) == 1).drop(_SIDE)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's keys into `salt`
    sub-keys and replicate the small side once per sub-key, so a hot
    key's rows spread over `salt` reducers instead of one straggler.

    Use when a handful of keys dominate (power-law ids) and the small
    side is too big to broadcast — otherwise prefer plain `join`
    (AQE's skew-join splitting handles moderate skew without the
    `salt`-factor replication cost). Result is identical to
    `big.join(small, on, how)` for how in (inner, left).

    Execution shape: one shuffle each side on (keys..., salt); the
    small side grows `salt`×, the big side's hot partitions shrink
    `salt`×. No driver participation.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    keys = list(on)
    salt_col = "__salt"
    b = big.withColumn(salt_col, (F.rand(seed=0) * salt).cast("int"))
    s = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, keys + [salt_col], how).drop(salt_col)
