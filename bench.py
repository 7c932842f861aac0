"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a count-style collect (the
driver-side cheap terminal op) after a warm-up of the input scans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: scan-heavy agg, multi-join, window, as-of, dedup,
# similarity, text — the operators whose plans matter at 100 TB.
# The r1 set is kept intact for round-over-round comparability; r2
# adds q18 (big-big sort-merge join) and the BLAS top-k variant.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "window_rank_orders",
    "join_asof_clicks",
    "agg_distinct",
    "stream_session_window",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
    "text_quality_scores",
    "strawboat_roundtrip_agg",
    "q18_large_orders",
    "similarity_topk_vectorized",
    # r7: mutation-path headline — write + MOR delete (deletion vectors,
    # zero files rewritten) + DV-subtracting read, so table-layer
    # regressions show up in BENCH_rN and not only in pytest timings
    "strawboat_mor_delete",
    # r7: LLM-pipeline headliners — sketch-candidates + exact recount,
    # and the corpus-LM scoring joins (the pipeline ops' plan shapes
    # get perf tracking, not only correctness gates)
    "text_heavy_hitter_tokens",
    "text_lm_perplexity",
]


def _warm_python_paths(spark) -> None:
    import tempfile

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register

    register(spark)
    tiny = spark.range(256).select(
        F.col("id"), F.col("id").cast("double").alias("x"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    path = tempfile.mkdtemp(prefix="strawboat_warm_") + "/t"
    tiny.write.format("strawboat").mode("overwrite").save(path)
    spark.read.format("strawboat").load(path).count()
    # warm the pandas-UDF worker path too
    tiny.groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf.head(1), schema=tiny.schema
    ).count()


def main() -> None:
    from strawboat_spark.queries import all_queries
    from strawboat_spark.session import get_spark

    spark = get_spark("strawboat-bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    # Warm the JVM + file cache + Python worker pools once (not timed).
    # The datasource/UDF paths each spawn a Python worker pool on first
    # use (~seconds of one-time process startup); at real scale that
    # amortizes to zero, so warm it with a tiny synthetic roundtrip to
    # keep the timed loop measuring steady-state throughput.
    for name in names[:1]:
        registry[name].fn(spark, SF_DIR).collect()
    _warm_python_paths(spark)

    # Best-of-2: a single local[32] JVM has seconds-scale GC/scheduling
    # jitter; the min of two runs is the steady-state number a cluster
    # would see per-executor.
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in names:
            t0 = time.perf_counter()
            df = registry[name].fn(spark, SF_DIR)
            df.collect()
            el = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, el), el)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
