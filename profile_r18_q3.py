"""r18 probe: q3 agg-below-join (r17 shape) vs join-then-agg (pre-r17
shape) at an arbitrary SF dir — the sf1 adjudication VERDICT r17 #3
asked for.  Prints best-of-N per shape plus executed-plan exchange
counts.  Usage:
    SPARK_GRAFT_SF_DIR=/tmp/strawboat_sf1 python profile_r18_q3.py [q3|q18]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/strawboat_sf1")
N = int(os.environ.get("PROBE_RUNS", "3"))


def _t(spark, name):
    from strawboat_spark.tables import load_table

    return load_table(spark, SF_DIR, name)


def q3_inputs(spark):
    c = _t(spark, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return c, o, li


def q3_new(spark):
    c, o, li = q3_inputs(spark)
    rev = li.groupBy("l_orderkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return (
        rev.join(o, rev.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q3_old(spark):
    c, o, li = q3_inputs(spark)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q18_new(spark):
    li = _t(spark, "lineitem")
    o = _t(spark, "orders")
    c = _t(spark, "customer")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        qty.join(o, qty.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q18_old(spark):
    li = _t(spark, "lineitem")
    o = _t(spark, "orders")
    c = _t(spark, "customer")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(c, o.o_custkey == c.c_custkey)
    return (
        joined.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange ")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "q3"
    from strawboat_spark.session import get_spark

    spark = get_spark("r18-q3-probe")
    shapes = {
        "q3": [("new", q3_new), ("old", q3_old)],
        "q18": [("new", q18_new), ("old", q18_old)],
    }[which]
    # warm both shapes once (codegen/JIT), then interleave timed runs
    for _name, fn in shapes:
        fn(spark).collect()
    times: dict[str, list[float]] = {n: [] for n, _ in shapes}
    for run in range(N):
        for name, fn in shapes:
            spark.sparkContext.setJobDescription(f"{which} {name} {run}")
            df = fn(spark)
            t0 = time.perf_counter()
            rows = df.collect()
            times[name].append(time.perf_counter() - t0)
            if run == 0:
                print(f"{name}: exchanges={exchanges(df)} rows={len(rows)}", flush=True)
    for name, ts in times.items():
        print(f"{which} {name}: best {min(ts):.3f}s  runs {[round(t,3) for t in ts]}")
    spark.stop()
