"""UDF / UDAF / UDTF / higher-order-function coverage (SURVEY.md §2C).

Policy: UDFs are the slow path — every UDF here is Arrow-vectorized
(pandas_udf / applyInPandas / arrow-optimized UDTF), never row-at-a-
time Python. Each computes something deterministic so the DuckDB
oracle can replicate it in SQL: the gate then proves the UDF plumbing
(Arrow batches, grouped semantics) is value-correct, not just runnable.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from strawboat_spark.queries import query
from strawboat_spark.tables import load_table




@query(
    "udf_pandas_suite",
    oracle="""
    SELECT * FROM (
      SELECT 'grouped' AS gate, o_orderpriority AS k1, NULL AS k2,
             ROUND(AVG(o_totalprice), 4) AS v1,
             ROUND(MAX(o_totalprice) - MIN(o_totalprice), 4) AS v2
      FROM orders GROUP BY o_orderpriority
      UNION ALL
      SELECT 'scalar', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
             l_extendedprice * (1 - l_discount) * (1 + l_tax), NULL
      FROM lineitem WHERE l_orderkey <= 200
    ) ORDER BY gate, k1, k2
    """,
    description=(
        "composite pandas-UDF gate (r9 fold of udf_pandas_scalar/"
        "grouped_agg): Arrow-vectorized scalar net-price kernel per "
        "lineitem row + grouped-agg UDAF over orders, one oracle"
    ),
)
def udf_pandas_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value columns stay typed DOUBLE so the comparator's float
    normalization applies; the scalar leg is un-rounded on purpose —
    per-row IEEE math in identical op order is bit-identical across
    engines, while ROUND disagrees exactly on the .XXXX5 boundaries
    this 6-decimal product hits (pre-fold gate notes, r5)."""

    @pandas_udf("double")
    def net_price(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    @pandas_udf("double")
    def mean_price(v: pd.Series) -> float:
        return float(v.mean())

    @pandas_udf("double")
    def price_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    scalar = li.select(
        F.lit("scalar").alias("gate"),
        F.col("l_orderkey").cast("string").alias("k1"),
        F.col("l_linenumber").cast("string").alias("k2"),
        net_price("l_extendedprice", "l_discount", "l_tax").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
    )
    o = load_table(spark, sf_dir, "orders")
    # F.round outside the UDFs (python round() is banker's rounding)
    grouped = (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(mean_price("o_totalprice"), 4).alias("v1"),
            F.round(price_range("o_totalprice"), 4).alias("v2"),
        )
        .select(
            F.lit("grouped").alias("gate"),
            F.col("o_orderpriority").alias("k1"),
            F.lit(None).cast("string").alias("k2"),
            "v1",
            "v2",
        )
    )
    return grouped.unionByName(scalar).orderBy("gate", "k1", "k2")


@query(
    "udf_apply_in_pandas",
    oracle="""
    WITH cents AS (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ), ranked AS (
      SELECT o_custkey, o_orderkey, c,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY c DESC, o_orderkey) AS rn,
             SUM(c) OVER (PARTITION BY o_custkey) AS sum_c,
             COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
      FROM cents
    )
    SELECT o_custkey, o_orderkey,
           (c * cnt - sum_c) / (100.0 * cnt) AS delta_from_avg
    FROM ranked WHERE rn = 1 ORDER BY o_custkey
    """,
    description="applyInPandas: per-group dataframe kernel (top order vs group mean)",
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grain note: grouping by raw o_custkey would invoke Python once
    per customer (~150k tiny calls at sf1 — per-group overhead swamps
    the work). Group by a hash bucket instead and vectorize the
    per-customer logic inside the kernel with pandas groupby: same
    result, ~constant number of Python invocations at any scale.

    Determinism note: o_totalprice has 2 decimals, so all arithmetic is
    done in exact integer cents (int64 sums are order-independent); the
    single final division of exact integers is correctly rounded IEEE,
    so the double is bit-identical regardless of shuffle arrival order
    — a float mean() here was accumulation-order-dependent and flipped
    ROUND(x, 4) on boundary rows."""

    def top_vs_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["c"] = (pdf["o_totalprice"].to_numpy() * 100).round().astype("int64")
        s = pdf.sort_values(["c", "o_orderkey"], ascending=[False, True])
        g = s.groupby("o_custkey", sort=False)
        top = g.head(1)[["o_custkey", "o_orderkey", "c"]].copy()
        sums = g["c"].sum()
        cnts = g["c"].count()
        sum_c = sums.loc[top["o_custkey"]].to_numpy()
        cnt = cnts.loc[top["o_custkey"]].to_numpy()
        top["delta_from_avg"] = (top["c"].to_numpy() * cnt - sum_c) / (100.0 * cnt)
        return top[["o_custkey", "o_orderkey", "delta_from_avg"]]

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        o.groupBy(F.pmod(F.col("o_custkey"), F.lit(512)).alias("bucket"))
        .applyInPandas(
            top_vs_mean, schema="o_custkey long, o_orderkey long, delta_from_avg double"
        )
        .select("o_custkey", "o_orderkey", "delta_from_avg")
        .orderBy("o_custkey")
    )


@query(
    "udtf_explode_priorities",
    oracle="""
    SELECT o_orderpriority AS priority, t.klass, COUNT(*) AS n
    FROM orders
    CROSS JOIN (SELECT unnest(['URGENT-CLASS', 'STANDARD-CLASS']) AS klass) t
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    description="UDTF (table function): one input row -> multiple typed output rows",
)
def udtf_explode_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="klass string")
    class ClassEmitter:
        def eval(self, priority: str):
            # deterministic fan-out per row, like the oracle's unnest
            yield ("URGENT-CLASS",)
            yield ("STANDARD-CLASS",)

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    o.createOrReplaceTempView("udtf_orders")
    spark.udtf.register("class_emitter", ClassEmitter)
    return spark.sql(
        """
        SELECT o_orderpriority AS priority, t.klass, COUNT(*) AS n
        FROM udtf_orders, LATERAL class_emitter(o_orderpriority) t
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    )


@query(
    "scalar_props_extract",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k
      FROM events
    )
    SELECT * FROM (
      SELECT 'json' AS gate, event_type,
             CAST(SUM(k) AS BIGINT) AS v1,
             CAST(MAX(k) AS BIGINT) AS v2,
             COUNT(*) AS v3
      FROM m GROUP BY event_type
      UNION ALL
      SELECT 'map', event_type,
             CAST(COUNT(DISTINCT k) AS BIGINT),
             CAST(MIN(k) AS BIGINT),
             CAST(MAX(k) AS BIGINT)
      FROM m GROUP BY event_type
    ) ORDER BY gate, event_type
    """,
    description=(
        "composite props-extraction gate (r9 fold of scalar_json_extract/"
        "map_funcs): get_json_object field extraction + MapType "
        "construction/map_entries consumption over the same parsed field"
    ),
)
def scalar_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    kj = F.get_json_object("props", "$.k").cast("int")
    json_leg = (
        e.groupBy("event_type")
        .agg(
            F.sum(kj).cast("bigint").alias("v1"),
            F.max(kj).cast("bigint").alias("v2"),
            F.count(F.lit(1)).alias("v3"),
        )
        .select(F.lit("json").alias("gate"), "event_type", "v1", "v2", "v3")
    )
    # build a map column then consume it via map functions (coverage for
    # MapType expressions; the aggregation itself matches the oracle)
    km = F.regexp_extract("props", r'"k": (\d+)', 1).cast("int")
    mapped = e.select("event_type", F.create_map(F.lit("k"), km).alias("m"))
    kv = mapped.select(
        "event_type", F.explode(F.map_entries("m")).alias("ent")
    ).select("event_type", F.col("ent.value").alias("k"))
    map_leg = (
        kv.groupBy("event_type")
        .agg(
            F.countDistinct("k").cast("bigint").alias("v1"),
            F.min("k").cast("bigint").alias("v2"),
            F.max("k").cast("bigint").alias("v3"),
        )
        .select(F.lit("map").alias("gate"), "event_type", "v1", "v2", "v3")
    )
    return json_leg.unionByName(map_leg).orderBy("gate", "event_type")


@query(
    "scalar_higher_order_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4) AS vec_sum,
           ROUND(list_aggregate([x * x for x in CAST(embedding AS DOUBLE[])], 'sum'), 4) AS vec_sq_sum,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INT) AS n_positive,
           ROUND(list_max(CAST(embedding AS DOUBLE[])), 4) AS vec_max
    FROM embeddings WHERE vec_id < 100 ORDER BY vec_id
    """,
    description="higher-order array functions: transform/filter/aggregate/array_max",
)
def scalar_higher_order_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    v = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 4).alias("vec_sum"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x), 4).alias("vec_sq_sum"),
        F.size(F.filter(v, lambda x: x > 0)).cast("int").alias("n_positive"),
        F.round(F.array_max(v), 4).alias("vec_max"),
    ).orderBy("vec_id")



@query(
    "subquery_correlated_exists",
    oracle="""
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND c_acctbal > 0
    ORDER BY c_custkey
    """,
    description="correlated EXISTS subquery (decorrelated to semi join by Catalyst)",
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND c_acctbal > 0
        ORDER BY c_custkey
        """
    )
