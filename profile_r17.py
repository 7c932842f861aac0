"""r17 optimization-round profiler: per-query explain capture + phase
timing for the headline set.

Usage:
  python profile_r17.py explains [query ...]   # dump .explain("formatted")
                                               # to plans/r17/<q>_<tag>.txt
  python profile_r17.py phases                 # phase-split timings for the
                                               # expensive composite queries
Env: SPARK_GRAFT_PROFILE_TAG=before|after (default before)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = os.environ.get("SPARK_GRAFT_PROFILE_TAG", "before")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r17")

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
    "strawboat_mor_delete",
    "text_heavy_hitter_tokens",
    "text_lm_perplexity",
]


def _spark():
    from strawboat_spark.session import get_spark

    return get_spark("strawboat-profile-r17")


def dump_explains(names: list[str]) -> None:
    from strawboat_spark.queries import all_queries

    spark = _spark()
    registry = all_queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"explain:{name}")
        t0 = time.perf_counter()
        df = registry[name].fn(spark, SF_DIR)
        build_s = time.perf_counter() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{TAG}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: wrote {path} (build {build_s:.2f}s)")


def _timed(label, df):
    t0 = time.perf_counter()
    df.collect()
    dt = time.perf_counter() - t0
    print(f"    {label}: {dt:.3f}s")
    return dt


def phases() -> None:
    """Decompose the expensive composite queries into phases."""
    import tempfile

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.tables import load_table

    spark = _spark()
    register(spark)

    # warm everything once
    from strawboat_spark.queries import all_queries

    registry = all_queries()
    for q in ("strawboat_roundtrip_agg", "strawboat_mor_delete"):
        registry[q].fn(spark, SF_DIR).collect()

    print("== strawboat_roundtrip_agg phases ==")
    for _ in range(3):
        path = f"{tempfile.mkdtemp(prefix='prof_rt_')}/lineitem"
        src = load_table(spark, SF_DIR, "lineitem")
        t0 = time.perf_counter()
        src.write.format("strawboat").mode("overwrite").save(path)
        t_write = time.perf_counter() - t0
        rd = (
            spark.read.format("strawboat")
            .option(
                "columns",
                "l_returnflag,l_quantity,l_extendedprice,l_discount,l_orderkey",
            )
            .load(path)
        )
        agg = (
            rd.groupBy("l_returnflag")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("sum_disc_price"),
                F.countDistinct("l_orderkey").alias("n_orders"),
                F.count(F.lit(1)).alias("n"),
            )
            .orderBy("l_returnflag")
        )
        t0 = time.perf_counter()
        agg.collect()
        t_read = time.perf_counter() - t0
        print(f"    write: {t_write:.3f}s  read+agg: {t_read:.3f}s")

    print("== strawboat_mor_delete phases ==")
    from strawboat_spark.table import Table

    for _ in range(3):
        path = f"{tempfile.mkdtemp(prefix='prof_mor_')}/orders"
        o = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t = Table(spark, path)
        t0 = time.perf_counter()
        t.overwrite(o)
        t_w = time.perf_counter() - t0
        t0 = time.perf_counter()
        t.delete("o_orderkey % 3 = 0 AND o_orderstatus = 'O'", mode="mor")
        t_d = time.perf_counter() - t0
        agg = (
            t.read()
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
            .orderBy("o_orderstatus")
        )
        t0 = time.perf_counter()
        agg.collect()
        t_r = time.perf_counter() - t0
        print(f"    overwrite: {t_w:.3f}s  delete(mor): {t_d:.3f}s  read+agg: {t_r:.3f}s")

    print("== dedup_minhash_lsh phases ==")
    from strawboat_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    for _ in range(3):
        d = load_table(spark, SF_DIR, "documents")
        t0 = time.perf_counter()
        sigs = minhash_signatures(d, "text", "doc_id", 32, 3, 42, "md5")
        from pyspark import StorageLevel

        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
        sigs.count()
        t_sig = time.perf_counter() - t0
        t0 = time.perf_counter()
        pairs = lsh_candidate_pairs(sigs, "doc_id", 8, hash_family="md5")
        a = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
        b = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
        est = F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ) / F.size("sig_a")
        out = (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .select("id_a", "id_b", est.alias("est_jaccard"))
            .orderBy("id_a", "id_b")
        )
        out.collect()
        t_rest = time.perf_counter() - t0
        sigs.unpersist()
        print(f"    signatures(count): {t_sig:.3f}s  pairs+join: {t_rest:.3f}s")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "explains"
    if mode == "explains":
        names = sys.argv[2:] or HEADLINE
        dump_explains(names)
    elif mode == "phases":
        phases()
    else:
        raise SystemExit(f"unknown mode {mode}")
