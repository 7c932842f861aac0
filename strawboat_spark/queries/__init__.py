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


def query(name: str, oracle: str | None = None, description: str = ""):
    """Decorator registering a query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, description)
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


def all_queries() -> dict[str, QueryDef]:
    _load_all_modules()
    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
