"""Heavy-hitters operator (operators/sketches.py): exactness property
vs a plain groupBy, MG candidate guarantee under skew, bounded sketch
output, broadcast recount plan."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _exact(spark, df, col, num, den):
    tot = df.count()
    return {
        (r[col], r["cnt"])
        for r in df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * den >= F.lit(tot) * num)
        .collect()
    }


@pytest.mark.parametrize("num,den", [(1, 100), (1, 20), (1, 7)])
def test_matches_exact_groupby_on_zipf(spark, num, den):
    from strawboat_spark.operators.sketches import heavy_hitters

    # Zipf-ish skew over 2000 distinct items, scattered over partitions
    df = (
        spark.range(0, 30000, 1, 8)
        .selectExpr("cast(cast(pow(id % 997 + 1, 0.5) as int) as string) as item")
    )
    got = {(r["item"], r["cnt"]) for r in heavy_hitters(df, "item", num, den).collect()}
    assert got == _exact(spark, df, "item", num, den)


def test_uniform_data_no_false_requirement(spark):
    """Uniform data: nothing reaches 5%; result must be empty, not
    arbitrary survivors of the sketch."""
    from strawboat_spark.operators.sketches import heavy_hitters

    df = spark.range(0, 10000, 1, 4).selectExpr("cast(id % 500 as string) as item")
    assert heavy_hitters(df, "item", 5, 100).count() == 0


def test_sketch_output_bounded_per_partition(spark):
    """The pass-1 summary must stay at <= k + 1 rows per partition even
    for high-cardinality input — the whole point at 100 TB."""
    from strawboat_spark.operators.sketches import _mg_partition

    df = spark.range(0, 50000, 1, 4).selectExpr("cast(id as string) as item")
    k = 40
    sketch = df.mapInArrow(_mg_partition("item", k), schema="item string, c long")
    per_part = (
        sketch.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    assert per_part and all(r["rows"] <= k + 1 for r in per_part)


def test_recount_join_is_broadcast(spark):
    from strawboat_spark.operators.sketches import heavy_hitters

    df = spark.range(0, 5000, 1, 4).selectExpr("cast(id % 37 as string) as item")
    plan = heavy_hitters(df, "item", 1, 100)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
