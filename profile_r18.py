"""r18 probes: phase-split + A/B measurements for the format-layer
gates (roundtrip write/read, MOR delete) and the Arrow-boundary floor.

Usage: python profile_r18.py <probe> [args]
Probes:
  rt_phases     - strawboat_roundtrip_agg split into write / read+agg
  mor_phases    - strawboat_mor_delete split into overwrite / delete / read
  arrow_floor   - mapInArrow identity round-trip of the 5-column lineitem
  bench_one <q> - best-of-N one bench query end to end

Every timed action uses collect() (same as bench.py) or a noop sink
where noted; job descriptions label the UI.  SPARK_GRAFT_* env knobs
apply (READ_BATCH_ROWS etc.) so A/B runs are `env VAR=... python
profile_r18.py ...` invocations.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROBE_RUNS", "3"))


def get_session():
    from strawboat_spark.session import get_spark

    return get_spark("r18-probe")


def _warm(spark):
    from bench import _warm_python_paths

    _warm_python_paths(spark)


def rt_phases(spark):
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.tables import load_table

    register(spark)
    cols = ["l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_orderkey"]
    for run in range(N):
        path = tempfile.mkdtemp(prefix="rt18_") + "/li"
        src = load_table(spark, SF_DIR, "lineitem").select(*cols)
        spark.sparkContext.setJobDescription(f"rt write {run}")
        t0 = time.perf_counter()
        src.write.format("strawboat").mode("overwrite").save(path)
        t1 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"rt read+agg {run}")
        rd = (
            spark.read.format("strawboat")
            .option("columns", ",".join(cols))
            .load(path)
            .groupBy("l_returnflag")
            .agg(
                F.round(F.sum("l_quantity"), 2),
                F.countDistinct("l_orderkey"),
                F.count(F.lit(1)),
            )
        )
        rd.collect()
        t2 = time.perf_counter()
        print(f"run {run}: write {t1-t0:.3f}s  read+agg {t2-t1:.3f}s", flush=True)


def mor_phases(spark):
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table
    from strawboat_spark.tables import load_table

    register(spark)
    for run in range(N):
        path = tempfile.mkdtemp(prefix="mor18_") + "/orders"
        o = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t = Table(spark, path)
        spark.sparkContext.setJobDescription(f"mor overwrite {run}")
        t0 = time.perf_counter()
        t.overwrite(o)
        t1 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"mor delete {run}")
        t.delete("o_orderkey % 3 = 0 AND o_orderstatus = 'O'", mode="mor")
        t2 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"mor read {run}")
        t.read().groupBy("o_orderstatus").agg(
            F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2)
        ).collect()
        t3 = time.perf_counter()
        print(
            f"run {run}: overwrite {t1-t0:.3f}s  delete {t2-t1:.3f}s  read {t3-t2:.3f}s",
            flush=True,
        )


def arrow_floor(spark):
    import pyspark.sql.functions as F

    from strawboat_spark.tables import load_table

    cols = ["l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_orderkey"]

    def _ident(batches):
        yield from batches

    src = load_table(spark, SF_DIR, "lineitem").select(*cols)
    schema = src.schema
    for run in range(N):
        spark.sparkContext.setJobDescription(f"arrow floor {run}")
        t0 = time.perf_counter()
        src.mapInArrow(_ident, schema).write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"jvm floor {run}")
        src.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(
            f"run {run}: mapInArrow ident {t1-t0:.3f}s  plain scan {t2-t1:.3f}s",
            flush=True,
        )


def bench_one(spark, name):
    from strawboat_spark.queries import all_queries

    registry = all_queries()
    for run in range(N):
        spark.sparkContext.setJobDescription(f"{name} {run}")
        t0 = time.perf_counter()
        registry[name].fn(spark, SF_DIR).collect()
        print(f"{name} run {run}: {time.perf_counter()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    probe = sys.argv[1]
    spark = get_session()
    _warm(spark)
    if probe == "bench_one":
        bench_one(spark, sys.argv[2])
    else:
        globals()[probe](spark)
    spark.stop()
