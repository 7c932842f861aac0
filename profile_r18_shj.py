"""r18 probe: validate (or refute) the r17 session posture
`preferSortMergeJoin=false` + AQE maxShuffledHashJoinLocalMapThreshold
at sf1 (VERDICT r17 #4) — find a registry-shaped join where the
planner actually picks ShuffledHashJoin over SortMergeJoin, measure
both, and stress the skewed-key case (join_salted_skew's shape) for an
OOM/regression check.

Usage:
    SPARK_GRAFT_PREFER_SMJ=false python profile_r18_shj.py   # posture on
    SPARK_GRAFT_PREFER_SMJ=true  SPARK_GRAFT_SHJ_LOCAL_MAP_THRESHOLD=0 \
        python profile_r18_shj.py                            # default Spark
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/strawboat_sf1")
N = int(os.environ.get("PROBE_RUNS", "3"))


def joins(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for tag in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        c = plan.count(tag)
        if c:
            out.append(f"{tag}x{c}")
    return out


def main() -> None:
    from strawboat_spark.session import get_spark
    from strawboat_spark.tables import load_table

    spark = get_spark("r18-shj-probe")
    print(
        "preferSortMergeJoin =",
        spark.conf.get("spark.sql.join.preferSortMergeJoin"),
        "| shjLocalMapThreshold =",
        spark.conf.get("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"),
    )
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    # Mid-size join: orders (1.5M rows at sf1) is past the 10MB broadcast
    # threshold but hashes comfortably per partition — the posture's
    # target case. Aggregate keeps the collect tiny.
    def midjoin():
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy()
            .agg(F.count(F.lit(1)), F.sum("l_extendedprice"), F.sum("o_totalprice"))
        )

    # Skew stress: 90% of the probe side lands on ONE key (the OOM
    # worry in ADVICE r17) — AQE skew-join splitting must keep working
    # under the SHJ conversion.
    ev = load_table(spark, SF_DIR, "events")
    skew = ev.select(
        F.when(F.col("event_id") % 10 != 0, F.lit(7)).otherwise(
            F.col("event_id") % 1000
        ).alias("k"),
        "value",
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    ).repartition(8)

    def skewjoin():
        return (
            skew.join(dim.hint("shuffle_hash"), "k")
            .groupBy()
            .agg(F.count(F.lit(1)), F.sum(F.col("value") + F.col("w")))
        )

    for name, fn in (("midjoin", midjoin), ("skewjoin", skewjoin)):
        fn().collect()  # warm
        times = []
        df = None
        for run in range(N):
            spark.sparkContext.setJobDescription(f"shj {name} {run}")
            df = fn()
            t0 = time.perf_counter()
            df.collect()
            times.append(time.perf_counter() - t0)
        print(f"{name}: joins={joins(df)} best={min(times):.3f}s runs={[round(t,3) for t in times]}")
    spark.stop()


if __name__ == "__main__":
    main()
