"""Query registry: the declared query surface of the engine.

Every capability row of SURVEY.md §2C gets one named query here, with
(a) a Spark DataFrame implementation `(spark, sf_dir) -> DataFrame` and
(b) an equivalent ANSI-SQL oracle string for DuckDB, or None for
genuinely non-SQL-expressible operators (the driver then records a
weaker rows-only check).

Contract notes (see repo README / driver docs):
- the driver sorts columns BY NAME before value-hashing, so the Spark
  result and the oracle must use identical column aliases;
- float aggregates are rounded identically on both sides so that
  summation-order differences between engines don't flip the hash;
- DuckDB sums of integer columns return HUGEINT — oracles cast them
  back to BIGINT to match Spark's LongType.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QueryDef"] = {}


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""
    # Round in which this gate's SEMANTICS last changed (new leg in a
    # composite, oracle rewrite). A gate revised after its most recent
    # driver observation re-fronts into the 50-entry window like a
    # never-checked one — without this, a revised composite sits at its
    # old rotation position and the revision ships with no hard
    # correctness row until age alone rotates it back in (r17 lesson:
    # the distributed-trainer leg folded into similarity_ann_recall,
    # which was 27 slots outside the window).
    revised: int | None = None


def spread_small_input(df: DataFrame) -> DataFrame:
    """Spread a degenerate input layout across the cluster before
    heavy per-row work (r17 opt, guide §2.2): a small file source
    yields ONE input split, so a Python-codec synthesis map or an
    opaque Python-datasource write runs serially on one core. When the
    input has fewer partitions than defaultParallelism, repartition up
    to it; any at-scale source already has at least that many splits,
    so this only ever scales UP a degenerate layout and is a no-op in
    production. NOT applied where a gate pins its layout explicitly
    (coalesce/repartition in the gate body) or where an oracle counts
    files/pages — those keep their declared layout."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    # JVM-side partition probe (VERDICT r17 minor): df.rdd would build
    # the full Python RDD wrapper (plan conversion + pickle-map setup)
    # per gate call just to ask a count; the JVM Dataset's own rdd()
    # answers the same question without the Python-side machinery.
    if df._jdf.rdd().getNumPartitions() < n:
        return df.repartition(n)
    return df


def query(
    name: str,
    oracle: str | None = None,
    description: str = "",
    revised: int | None = None,
):
    """Decorator registering a query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, description, revised)
        return fn

    return deco


def _load_all_modules() -> None:
    # Import for registration side effects.
    from strawboat_spark.queries import (  # noqa: F401
        format_rt,
        llm,
        relational,
        streaming_q,
        udf_q,
    )


# The driver records a CORRECTNESS row for the first 50 entries of
# queries() only. Instead of a hand-maintained priority list (which in
# round 2 silently left 11 queries outside every round's window), the
# order is derived from the repo's own CORRECTNESS_r*.json history:
#   1. queries with NO driver row in any round (hard signal still owed),
#   2. queries whose most recent driver row FAILED (need the re-check),
#   3. everything else, least-recently-verified first (so verification
#      rotates and provably accumulates across rounds).
# Ties keep registration order. Adding a query automatically front-loads
# it next round; nothing to maintain.


def _driver_history() -> dict[str, tuple[int, bool, bool]]:
    """name -> (last round with a driver row, passed, was rows-only).

    A no_oracle row counts as passed: the driver's rows-only check is
    the strongest signal that query can ever get *while it has no
    oracle*. The third element records that the row was rows-only so
    the ordering can re-front a query whose oracle landed AFTER its
    last driver observation (r11 lesson: dedup_minhash_lsh gained an
    exact oracle in r10 but rotated on age for two rounds)."""
    import json
    import re
    from pathlib import Path

    history: dict[str, tuple[int, bool, bool]] = {}
    root = Path(__file__).resolve().parents[2]
    try:
        files = sorted(root.glob("CORRECTNESS_r*.json"))
    except OSError:
        return history
    for path in files:
        m = re.search(r"CORRECTNESS_r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            rows_only = row.get("err") == "no_oracle"
            ok = bool(row.get("hash_match")) or rows_only
            prev = history.get(name)
            if prev is None or rnd >= prev[0]:
                history[name] = (rnd, ok, rows_only)
    return history


def all_queries() -> dict[str, QueryDef]:
    _load_all_modules()
    history = _driver_history()
    reg_order = {n: i for i, n in enumerate(_REGISTRY)}

    def key(item: tuple[str, QueryDef]):
        name, qdef = item
        row = history.get(name)
        if row is None:
            return (0, 0, reg_order[name])  # never driver-checked
        rnd, ok, rows_only = row
        if qdef.revised is not None and qdef.revised > rnd:
            # Semantics changed after the last driver observation: the
            # exact check of the REVISED gate is still owed. Front it
            # like a never-checked entry (keyed by last-observed round
            # so multiple revisions order oldest-observation first).
            return (0, rnd, reg_order[name])
        if rows_only and qdef.oracle is not None:
            # The oracle landed after the last driver row: the exact
            # check is still owed, regardless of how recent the weaker
            # rows-only row is. Front it like a never-checked entry.
            return (0, rnd, reg_order[name])
        if not ok:
            return (1, rnd, reg_order[name])  # last driver row failed
        return (2, rnd, reg_order[name])  # verified: oldest round first

    return dict(sorted(_REGISTRY.items(), key=key))


def spark_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
