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


# The driver records a CORRECTNESS row for the first 50 entries of
# queries() only. This explicit order front-loads (a) queries that had
# no driver row in round 1 and (b) queries whose implementation changed
# this round, so that across rounds every query gets the hard signal.
# Names absent from the list keep registration order after it.
_DRIVER_WINDOW_ORDER = [
    # round-1 driver-unverified (registered after the 50-entry cutoff)
    "q4_priority_late_ship",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive_bands",
    "agg_percentiles",
    "agg_statistics",
    "window_distribution_funcs",
    "window_range_frame",
    "join_salted_skew",
    "scalar_math_funcs",
    "scalar_json_extract",
    "scalar_subquery",
    "subquery_correlated_exists",
    "scalar_higher_order_array",
    "scalar_map_funcs",
    "stream_tumbling_window",
    "stream_session_window",
    "stream_sliding_window",
    "udf_pandas_scalar",
    "udf_pandas_grouped_agg",
    "udf_apply_in_pandas",
    "udtf_explode_priorities",
    # new / implementation-changed this round
    "similarity_lsh_recall",
    "similarity_ivf_recall",
    "corpus_decontamination",
    "corpus_train_test_split",
    "corpus_pack_sequences",
    "corpus_pii_redaction",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "strawboat_roundtrip_agg",
    "strawboat_roundtrip_filter",
    "strawboat_roundtrip_nested",
    "strawboat_partitioned_scan",
    "dedup_minhash_lsh",
    "similarity_lsh_ann",
    "similarity_ivf_ann",
    "similarity_topk_bruteforce",
    "similarity_topk_vectorized",
    "embedding_neardup_cosine",
    # high-value stable coverage
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "join_asof_clicks",
    "join_range_band",
    "window_rank_orders",
    "agg_distinct",
    "dedup_exact_documents",
    "dedup_clusters",
    "llm_corpus_pipeline",
]


def all_queries() -> dict[str, QueryDef]:
    _load_all_modules()
    rank = {n: i for i, n in enumerate(_DRIVER_WINDOW_ORDER)}
    tail = len(rank)
    ordered = sorted(
        _REGISTRY.items(),
        key=lambda kv: (rank.get(kv[0], tail), list(_REGISTRY).index(kv[0])),
    )
    return dict(ordered)


def spark_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
