"""Spark DataFrame read/write through format("strawboat") — the
reference's write→read round-trip contract at the engine surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def registered(spark):
    from strawboat_spark.sources.datasource import register

    register(spark)
    return spark


def test_write_read_roundtrip(registered, tmp_path):
    spark = registered
    src = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    path = str(tmp_path / "lineitem.strawboat")
    src.write.format("strawboat").mode("overwrite").save(path)

    back = spark.read.format("strawboat").load(path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    a = src.agg(
        F.round(F.sum("l_extendedprice"), 2).alias("s"),
        F.countDistinct("l_orderkey").alias("d"),
    ).collect()[0]
    b = back.agg(
        F.round(F.sum("l_extendedprice"), 2).alias("s"),
        F.countDistinct("l_orderkey").alias("d"),
    ).collect()[0]
    assert a == b


def test_embeddings_nested_roundtrip(registered, tmp_path):
    spark = registered
    src = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    path = str(tmp_path / "emb.strawboat")
    src.write.format("strawboat").mode("overwrite").save(path)
    back = spark.read.format("strawboat").load(path)
    assert back.count() == src.count()
    a = src.select(F.sum(F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x)).alias("s")).collect()[0]["s"]
    b = back.select(F.sum(F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x)).alias("s")).collect()[0]["s"]
    assert abs(a - b) < 1e-6


def test_filter_and_projection(registered, tmp_path):
    spark = registered
    src = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    path = str(tmp_path / "orders.strawboat")
    src.write.format("strawboat").mode("overwrite").save(path)
    back = spark.read.format("strawboat").load(path)
    got = (
        back.filter(F.col("o_orderkey") <= 100)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .collect()
    )
    want = (
        src.filter(F.col("o_orderkey") <= 100)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .collect()
    )
    assert got == want


def test_append_mode(registered, tmp_path):
    spark = registered
    src = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    path = str(tmp_path / "region.strawboat")
    src.write.format("strawboat").mode("overwrite").save(path)
    src.write.format("strawboat").mode("append").save(path)
    assert spark.read.format("strawboat").load(path).count() == 2 * src.count()
