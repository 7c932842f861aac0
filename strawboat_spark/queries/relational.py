"""Relational query surface over the TPC-H-ish tables (SURVEY.md §2C).

Each query is idiomatic DataFrame API — Catalyst supplies predicate
pushdown, column pruning, partial aggregation, and join-strategy
selection. Dimension tables are explicitly broadcast-hinted where the
100 TB posture wants a map-side join (region/nation/customer/part/
supplier stay small relative to the fact tables at every SF).

Reference parity: the reference (strawboat, a storage format) has no
relational operators — this module IS the engine layer its host
(Databend) supplied; see SURVEY.md §2C for the capability matrix.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from strawboat_spark.operators.joins import asof_join
from strawboat_spark.queries import query
from strawboat_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
           ROUND(AVG(l_discount), 4)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1: scan-heavy multi-aggregate groupBy (partial+final agg)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6: pure filter+sum; predicates must push to the scan",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "agg_percentile_suite",
    oracle="""
    SELECT * FROM (
      SELECT 'approx' AS gate, o_orderpriority AS k,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p_a,
             ROUND(quantile_cont(o_totalprice, 0.95), 2) AS p_b,
             CAST(NULL AS DOUBLE) AS p_c,
             TRUE AS ok
      FROM orders GROUP BY o_orderpriority
      UNION ALL
      SELECT 'exact', o_orderstatus, NULL,
             ROUND(quantile_cont(o_totalprice, 0.5), 2),
             ROUND(quantile_cont(o_totalprice, 0.9), 2),
             ROUND(quantile_cont(o_totalprice, 0.99), 2),
             TRUE
      FROM orders GROUP BY o_orderstatus
    ) ORDER BY gate, k
    """,
    description=(
        "composite percentile gate (r9 fold of agg_percentiles/"
        "approx_percentiles): exact interpolated p50/p90/p99 per group "
        "(Spark percentile == DuckDB quantile_cont) + percentile_approx "
        "(mergeable quantile sketch, one shuffle at any accuracy) with "
        "its documented rank-error bound checked in-Spark against the "
        "exact ranks"
    ),
)
def agg_percentile_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    exact = (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p_a"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p_b"),
            F.round(F.percentile("o_totalprice", F.lit(0.99)), 2).alias("p_c"),
        )
        .select(
            F.lit("exact").alias("gate"),
            F.col("o_orderstatus").alias("k"),
            F.lit(None).cast("bigint").alias("n"),
            "p_a",
            "p_b",
            "p_c",
            F.lit(True).alias("ok"),
        )
    )

    op = o.select("o_orderpriority", "o_totalprice")
    accuracy = 1000
    agg = op.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p_a"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 2).alias("p_b"),
        F.expr(f"percentile_approx(o_totalprice, 0.5, {accuracy})").alias("a50"),
        F.expr(f"percentile_approx(o_totalprice, 0.95, {accuracy})").alias("a95"),
    )
    # rank-error check WITHOUT buffering group values: re-aggregate the
    # fact side counting rows <= each approx answer (the per-group agg
    # result is tiny, so the join back is broadcast-sized) — the rank
    # of the sketch's answer must lie within n/accuracy of the target
    # rank, percentile_approx's documented guarantee.
    ranks = (
        op.join(broadcast(agg.select("o_orderpriority", "a50", "a95")), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_totalprice") <= F.col("a50"), 1).otherwise(0)).alias("r50"),
            F.sum(F.when(F.col("o_totalprice") <= F.col("a95"), 1).otherwise(0)).alias("r95"),
        )
    )
    tol = F.greatest((F.col("n") / accuracy) + 1, F.lit(2.0))
    ok = (
        (F.abs(F.col("r50") - 0.5 * F.col("n")) <= tol)
        & (F.abs(F.col("r95") - 0.95 * F.col("n")) <= tol)
    )
    approx = (
        agg.join(ranks, "o_orderpriority")
        .select(
            F.lit("approx").alias("gate"),
            F.col("o_orderpriority").alias("k"),
            "n",
            "p_a",
            "p_b",
            F.lit(None).cast("double").alias("p_c"),
            ok.alias("ok"),
        )
    )
    return approx.unionByName(exact).orderBy("gate", "k")


@query(
    "agg_grouping_suite",
    oracle="""
    SELECT * FROM (
      SELECT 'cube' AS gate, l_returnflag AS k1, l_linestatus AS k2,
             ROUND(SUM(l_quantity), 2) AS metric, COUNT(*) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      UNION ALL
      SELECT 'gsets', c_mktsegment, CAST(c_nationkey AS VARCHAR),
             ROUND(SUM(c_acctbal), 2), COUNT(*)
      FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
      UNION ALL
      SELECT 'rollup', o_orderpriority, o_orderstatus,
             ROUND(SUM(o_totalprice), 2), COUNT(*)
      FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    )
    """,
    description=(
        "composite multi-grouping gate (r9 fold of agg_cube/rollup/"
        "grouping_sets): CUBE over lineitem, ROLLUP over orders, "
        "explicit GROUPING SETS over customer, normalized to one "
        "(gate, k1, k2, metric, n) shape"
    ),
)
def agg_grouping_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    cube = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("metric"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.lit("cube").alias("gate"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "metric",
            "n",
        )
    )
    rollup = (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("metric"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.lit("rollup").alias("gate"),
            F.col("o_orderpriority").alias("k1"),
            F.col("o_orderstatus").alias("k2"),
            "metric",
            "n",
        )
    )
    gsets = spark.sql(
        """
        SELECT 'gsets' AS gate, c_mktsegment AS k1,
               CAST(c_nationkey AS STRING) AS k2,
               ROUND(SUM(c_acctbal), 2) AS metric, COUNT(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )
    return cube.unionByName(gsets).unionByName(rollup)


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    description="multi count-distinct (expand-based distinct aggregation)",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )





@query(
    "agg_conditional_pivot",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS price_f,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS price_o,
           ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS price_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="pivot via groupBy().pivot() with explicit values (single-pass)",
)
def agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # Explicit pivot values: avoids the extra distinct-values job and
    # pins the output schema (matters when the driver checks schema).
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("price_f"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("price_o"),
        F.coalesce(F.col("P"), F.lit(0.0)).alias("price_p"),
    ).orderBy("o_orderpriority")


@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_tol
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="approx_count_distinct (HyperLogLog++) per event type, gated within 5% of exact",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ estimate vs exact count per group, reduced to an exactly
    oracle-able boolean: the engine-specific estimate itself can't be
    reproduced in SQL, but |approx-exact|/exact <= 0.05 (2.5x the
    configured 2% rsd) must ALWAYS hold — the same recall-gate trick
    the ANN queries use (queries/llm.py)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("within_tol"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    revised=17,  # r17 rewrite not in the r17 driver sample (VERDICT r17 #7)
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3: 3-way join + agg + top-k (AQE picks join strategy)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No broadcast hints: customer/orders grow with SF, so a forced
    # broadcast OOMs at scale; AQE's size-based choice broadcasts them
    # only while they actually fit.
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    # r17 opt (guide §2.3 aggregate-before-shuffle): revenue groups by
    # (l_orderkey, o_orderdate) and l_orderkey is the orders PK, so the
    # per-orderkey aggregate can run BELOW the joins — lineitem crosses
    # exactly one exchange as partial-aggregated (key, revenue) rows
    # instead of full-width joined rows, and the orderkey join then
    # reuses that exchange's partitioning.  Same groups, same addends;
    # the date filter on orders and the segment filter via customer
    # drop whole aggregated rows afterwards, exactly as the join did.
    rev = li.groupBy("l_orderkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return (
        rev.join(o, rev.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    description="TPC-H Q5: 6-way star join, bounded dims broadcast",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Broadcast only nation/region (bounded at 25/5 rows at every SF);
    # orders/customer/supplier scale linearly, so their join strategy is
    # left to AQE's runtime size estimates.
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(c_acctbal, 2) AS acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10: join + agg + top-20 by revenue",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    # r17 opt NOT taken: pre-aggregating lineitem to per-order revenue
    # below the joins (the q3/q18 rewrite) REGROUPS the customer-level
    # float sum (per-order subtotals instead of raw lineitem terms) and
    # at sf0.01 one customer's revenue lands on the other side of a
    # half-cent (378060.51 vs .52) — the oracle hash flips.  q3/q18 are
    # safe because their group key IS the orderkey (same addend sets);
    # here the regroup changes the computed result, so the joined-then-
    # aggregated shape stays.
    # nation is the only bounded dim here; orders/customer go to AQE.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "join_semi",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
    ORDER BY o_orderkey
    """,
    description="left-semi join (EXISTS)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy("o_orderkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    description="left-anti join (NOT EXISTS)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_range_band",
    oracle="""
    WITH bands(band_name, lo, hi) AS (
        VALUES ('small',  0.0,      100000.0),
               ('medium', 100000.0, 200000.0),
               ('large',  200000.0, 1000000000.0)
    )
    SELECT band_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_name ORDER BY band_name
    """,
    description="non-equi range join (broadcast nested-loop against tiny band table)",
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 1e5), ("medium", 1e5, 2e5), ("large", 2e5, 1e9)],
        "band_name string, lo double, hi double",
    )
    return (
        o.join(
            broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("band_name")
    )


@query(
    "join_asof_clicks",
    oracle="""
    WITH purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         clicks    AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts
    FROM purchases p ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    description="as-of join: latest prior click per purchase (union+window, no pairwise blowup)",
)
def join_asof_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts_col="ts",
        right_value_cols=["click_ts"],
    )
    return (
        joined.filter(F.col("click_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("last_click_ts"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Window functions / sort / top-k
# --------------------------------------------------------------------------


@query(
    "window_rank_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
             CAST(RANK() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderstatus) AS BIGINT) AS status_rank
      FROM orders) t
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    description="ranking window functions: top-3 orders per customer",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w2).cast("bigint").alias("status_rank"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_functions_suite",
    oracle="""
    SELECT * FROM (
      WITH daily_t AS (
        SELECT event_type, CAST(ts AS DATE) AS day, ROUND(SUM(value), 2) AS revenue
        FROM events GROUP BY event_type, CAST(ts AS DATE)
      ), daily AS (
        SELECT CAST(ts AS DATE) AS day, ROUND(SUM(value), 2) AS total
        FROM events GROUP BY CAST(ts AS DATE)
      ), q AS (
        SELECT o_orderpriority, o_totalprice,
               NTILE(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders
      )
      SELECT 'distribution' AS gate, CAST(o_custkey AS VARCHAR) AS k1,
             CAST(o_orderkey AS VARCHAR) AS k2,
             CAST(NTILE(4) OVER w AS DOUBLE) AS v1,
             ROUND(PERCENT_RANK() OVER w, 6) AS v2,
             ROUND(CUME_DIST() OVER w, 6) AS v3
      FROM orders WHERE o_custkey < 200
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      UNION ALL
      SELECT 'lag_daily', event_type, CAST(day AS VARCHAR), revenue,
             ROUND(revenue - COALESCE(LAG(revenue) OVER
               (PARTITION BY event_type ORDER BY day), 0.0), 2), NULL
      FROM daily_t
      UNION ALL
      SELECT 'moving_avg', CAST(day AS VARCHAR), NULL, total,
             ROUND(AVG(total) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4), NULL
      FROM daily
      UNION ALL
      SELECT 'ntile', o_orderpriority, CAST(quartile AS VARCHAR),
             CAST(COUNT(*) AS DOUBLE), ROUND(SUM(o_totalprice), 2), NULL
      FROM q GROUP BY o_orderpriority, quartile
      UNION ALL
      SELECT 'range_frame', CAST(day AS VARCHAR), NULL, total,
             ROUND(SUM(total) OVER (ORDER BY day
                   RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW), 2), NULL
      FROM daily
    ) ORDER BY gate, k1, k2
    """,
    description=(
        "composite window-function gate (r9 fold of window_lag_daily/"
        "moving_avg/ntile/distribution_funcs/range_frame): lag deltas, "
        "7-row moving average, ntile(4) per bucket, percent_rank/"
        "cume_dist, and an interval RANGE frame — every family member "
        "exact under one oracle, values typed DOUBLE so the float "
        "comparator applies"
    ),
)
def window_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    daily_t = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("revenue")
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("total")
    )

    wl = Window.partitionBy("event_type").orderBy("day")
    lag_daily = daily_t.select(
        F.lit("lag_daily").alias("gate"),
        F.col("event_type").alias("k1"),
        F.col("day").cast("string").alias("k2"),
        F.col("revenue").alias("v1"),
        F.round(
            F.col("revenue") - F.coalesce(F.lag("revenue").over(wl), F.lit(0.0)), 2
        ).alias("v2"),
        F.lit(None).cast("double").alias("v3"),
    )

    wm = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    moving_avg = daily.select(
        F.lit("moving_avg").alias("gate"),
        F.col("day").cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("total").alias("v1"),
        F.round(F.avg("total").over(wm), 4).alias("v2"),
        F.lit(None).cast("double").alias("v3"),
    )

    wn = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ntile = (
        o.select("o_orderpriority", "o_totalprice", F.ntile(4).over(wn).alias("quartile"))
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).cast("double").alias("v1"),
            F.round(F.sum("o_totalprice"), 2).alias("v2"),
        )
        .select(
            F.lit("ntile").alias("gate"),
            F.col("o_orderpriority").alias("k1"),
            F.col("quartile").cast("string").alias("k2"),
            "v1",
            "v2",
            F.lit(None).cast("double").alias("v3"),
        )
    )

    wd = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    dist = o.filter(F.col("o_custkey") < 200).select(
        F.lit("distribution").alias("gate"),
        F.col("o_custkey").cast("string").alias("k1"),
        F.col("o_orderkey").cast("string").alias("k2"),
        F.ntile(4).over(wd).cast("double").alias("v1"),
        F.round(F.percent_rank().over(wd), 6).alias("v2"),
        F.round(F.cume_dist().over(wd), 6).alias("v3"),
    )

    daily.createOrReplaceTempView("daily_totals")
    range_frame = spark.sql(
        """
        SELECT 'range_frame' AS gate, CAST(day AS STRING) AS k1,
               CAST(NULL AS STRING) AS k2, total AS v1,
               ROUND(SUM(total) OVER (ORDER BY day
                     RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW), 2) AS v2,
               CAST(NULL AS DOUBLE) AS v3
        FROM daily_totals
        """
    )
    return (
        dist.unionByName(lag_daily)
        .unionByName(moving_avg)
        .unionByName(ntile)
        .unionByName(range_frame)
        .orderBy("gate", "k1", "k2")
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING), 2) AS running_total
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
    description="analytic window: running total per customer (rows frame)",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")




@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
    description="global top-k (TakeOrderedAndProject — no full sort at scale)",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------



@query(
    "set_operations",
    oracle="""
    SELECT * FROM (
      SELECT 'except' AS op, CAST(nationkey AS VARCHAR) AS k, CAST(1 AS BIGINT) AS n
      FROM (SELECT c_nationkey AS nationkey FROM customer
            EXCEPT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'intersect', CAST(nationkey AS VARCHAR), CAST(1 AS BIGINT)
      FROM (SELECT c_nationkey AS nationkey FROM customer
            INTERSECT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'union_all', side, COUNT(*) FROM (
        SELECT 'customer' AS side FROM customer
        UNION ALL SELECT 'supplier' FROM supplier
      ) GROUP BY side
    ) ORDER BY op, k
    """,
    description=(
        "composite set-operation gate (r9 fold of set_except/intersect/"
        "union_counts): EXCEPT + INTERSECT distinct semantics and "
        "UNION ALL cardinality, labeled per operator"
    ),
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    ck = c.select(F.col("c_nationkey").cast("int").alias("nationkey"))
    sk = s.select(F.col("s_nationkey").cast("int").alias("nationkey"))

    def keyed(df, op):
        return df.select(
            F.lit(op).alias("op"),
            F.col("nationkey").cast("string").alias("k"),
            F.lit(1).cast("bigint").alias("n"),
        )

    union_counts = (
        c.select(F.lit("customer").alias("side"))
        .unionByName(s.select(F.lit("supplier").alias("side")))
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("union_all").alias("op"), F.col("side").alias("k"), "n")
    )
    return (
        keyed(ck.subtract(sk), "except")
        .unionByName(keyed(ck.intersect(sk), "intersect"))
        .unionByName(union_counts)
        .orderBy("op", "k")
    )


def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.trim(F.lower("p_type")).alias("type_lower"),
    ).orderBy("p_partkey")


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    ).orderBy("o_orderkey")


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000), 2).alias("abs_diff"),
        F.round(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_bucket"),
        F.ceil(F.col("l_tax") * 100).cast("bigint").alias("tax_pct"),
        F.round(F.log(F.col("l_extendedprice")), 4).alias("ln_price"),
        (F.col("l_quantity").cast("int") % 7).alias("qty_mod"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "scalar_funcs_suite",
    oracle="""
    SELECT * FROM (
      SELECT 'string:brand_upper' AS gate, CAST(p_partkey AS BIGINT) AS k1,
             CAST(0 AS BIGINT) AS k2, UPPER(p_brand) AS sval,
             CAST(NULL AS DOUBLE) AS nval FROM part
      UNION ALL SELECT 'string:name_prefix', p_partkey, 0,
             SUBSTRING(p_name, 1, 5), NULL FROM part
      UNION ALL SELECT 'string:name_len', p_partkey, 0,
             NULL, CAST(LENGTH(p_name) AS DOUBLE) FROM part
      UNION ALL SELECT 'string:brand_type', p_partkey, 0,
             CONCAT(p_brand, ':', p_type), NULL FROM part
      UNION ALL SELECT 'string:brand_num', p_partkey, 0,
             NULL, CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS DOUBLE)
             FROM part
      UNION ALL SELECT 'string:type_short', p_partkey, 0,
             REPLACE(p_type, 'ECONOMY', 'ECO'), NULL FROM part
      UNION ALL SELECT 'string:type_lower', p_partkey, 0,
             TRIM(LOWER(p_type)), NULL FROM part
      UNION ALL SELECT 'date:order_year', o_orderkey, 0,
             NULL, CAST(year(o_orderdate) AS DOUBLE) FROM orders
      UNION ALL SELECT 'date:order_month', o_orderkey, 0,
             NULL, CAST(month(o_orderdate) AS DOUBLE) FROM orders
      UNION ALL SELECT 'date:order_day', o_orderkey, 0,
             NULL, CAST(dayofmonth(o_orderdate) AS DOUBLE) FROM orders
      UNION ALL SELECT 'date:month_start', o_orderkey, 0,
             CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR),
             NULL FROM orders
      UNION ALL SELECT 'date:days_since_95', o_orderkey, 0,
             NULL,
             CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS DOUBLE)
             FROM orders
      UNION ALL SELECT 'date:ym', o_orderkey, 0,
             strftime(o_orderdate, '%Y-%m'), NULL FROM orders
      UNION ALL SELECT 'math:abs_diff', l_orderkey, l_linenumber,
             NULL, ROUND(ABS(l_extendedprice - l_quantity * 1000), 2)
             FROM lineitem WHERE l_orderkey <= 100
      UNION ALL SELECT 'math:sqrt_qty', l_orderkey, l_linenumber,
             NULL, ROUND(SQRT(l_quantity), 4)
             FROM lineitem WHERE l_orderkey <= 100
      UNION ALL SELECT 'math:disc_sq', l_orderkey, l_linenumber,
             NULL, ROUND(POW(1 + l_discount, 2), 6)
             FROM lineitem WHERE l_orderkey <= 100
      UNION ALL SELECT 'math:qty_bucket', l_orderkey, l_linenumber,
             NULL, CAST(FLOOR(l_quantity / 10) AS DOUBLE)
             FROM lineitem WHERE l_orderkey <= 100
      UNION ALL SELECT 'math:tax_pct', l_orderkey, l_linenumber,
             NULL, CAST(CEIL(l_tax * 100) AS DOUBLE)
             FROM lineitem WHERE l_orderkey <= 100
      UNION ALL SELECT 'math:ln_price', l_orderkey, l_linenumber,
             NULL, ROUND(LN(l_extendedprice), 4)
             FROM lineitem WHERE l_orderkey <= 100
      UNION ALL SELECT 'math:qty_mod', l_orderkey, l_linenumber,
             NULL, CAST(CAST(l_quantity AS INT) % 7 AS DOUBLE)
             FROM lineitem WHERE l_orderkey <= 100
    ) ORDER BY gate, k1, k2
    """,
    description=(
        "composite scalar-function gate (r14 fold of scalar_string_funcs"
        " + scalar_date_funcs + scalar_math_funcs): the three batteries "
        "unpivoted to one long format (gate, keys, string value, "
        "numeric value) — every per-row function value keeps exact hash "
        "coverage (ints < 2^53 are exact in the DOUBLE column; rounded "
        "doubles pass through unchanged), labeled member:field"
    ),
)
def scalar_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gate, 20 scalar functions across string/date/math; a red
    row's `gate` column names member and field. Members stay separate
    fns; the suite unpivots each with stack() — JVM-side, no UDF."""
    s = scalar_string_funcs(spark, sf_dir).select(
        F.col("p_partkey").cast("bigint").alias("k1"),
        F.lit(0).cast("bigint").alias("k2"),
        F.expr(
            "stack(7,"
            " 'string:brand_upper', brand_upper, CAST(NULL AS DOUBLE),"
            " 'string:name_prefix', name_prefix, CAST(NULL AS DOUBLE),"
            " 'string:name_len', CAST(NULL AS STRING), CAST(name_len AS DOUBLE),"
            " 'string:brand_type', brand_type, CAST(NULL AS DOUBLE),"
            " 'string:brand_num', CAST(NULL AS STRING), CAST(brand_num AS DOUBLE),"
            " 'string:type_short', type_short, CAST(NULL AS DOUBLE),"
            " 'string:type_lower', type_lower, CAST(NULL AS DOUBLE)"
            ") AS (gate, sval, nval)"
        ),
    )
    d = scalar_date_funcs(spark, sf_dir).select(
        F.col("o_orderkey").cast("bigint").alias("k1"),
        F.lit(0).cast("bigint").alias("k2"),
        F.expr(
            "stack(6,"
            " 'date:order_year', CAST(NULL AS STRING), CAST(order_year AS DOUBLE),"
            " 'date:order_month', CAST(NULL AS STRING), CAST(order_month AS DOUBLE),"
            " 'date:order_day', CAST(NULL AS STRING), CAST(order_day AS DOUBLE),"
            " 'date:month_start', CAST(month_start AS STRING), CAST(NULL AS DOUBLE),"
            " 'date:days_since_95', CAST(NULL AS STRING), CAST(days_since_95 AS DOUBLE),"
            " 'date:ym', ym, CAST(NULL AS DOUBLE)"
            ") AS (gate, sval, nval)"
        ),
    )
    m = scalar_math_funcs(spark, sf_dir).select(
        F.col("l_orderkey").cast("bigint").alias("k1"),
        F.col("l_linenumber").cast("bigint").alias("k2"),
        F.expr(
            "stack(7,"
            " 'math:abs_diff', CAST(NULL AS STRING), abs_diff,"
            " 'math:sqrt_qty', CAST(NULL AS STRING), sqrt_qty,"
            " 'math:disc_sq', CAST(NULL AS STRING), disc_sq,"
            " 'math:qty_bucket', CAST(NULL AS STRING), CAST(qty_bucket AS DOUBLE),"
            " 'math:tax_pct', CAST(NULL AS STRING), CAST(tax_pct AS DOUBLE),"
            " 'math:ln_price', CAST(NULL AS STRING), ln_price,"
            " 'math:qty_mod', CAST(NULL AS STRING), CAST(qty_mod AS DOUBLE)"
            ") AS (gate, sval, nval)"
        ),
    )
    return (
        s.unionByName(d)
        .unionByName(m)
        .select("gate", "k1", "k2", "sval", "nval")
        .orderBy("gate", "k1", "k2")
    )



@query(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
    description="scalar subquery in predicate (spark.sql)",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT s_nationkey,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey ORDER BY s_nationkey
    """,
    description="skew-resistant salted equi-join (big lineitem x supplier), identical result to plain join",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    return (
        salted_join(li, s, ["l_suppkey"], salt=8)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "q4_priority_late_ship",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="TPC-H Q4 analog: orders with any line shipped >60d after order date, counted by priority (EXISTS → left-semi)",
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single big-big join (orders scanned once), then distinct on the
    # order grain — same result as EXISTS but half the join work of the
    # naive "find late keys, then semi-join orders again" shape.
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
    """,
    description="TPC-H Q14 analog: promo-type revenue share over a ship-date year",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # part grows with SF (SF x 200k rows) — no broadcast hint; AQE picks
    # broadcast at small SF and falls back to shuffle join at scale.
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o_totalprice, 2) AS totalprice,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(l_quantity) > 150
    ORDER BY totalprice DESC, o_orderkey
    """,
    description="TPC-H Q18 analog: large-volume orders (groupBy+having over 3-table join)",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # customer grows with SF (SF x 150k rows) — unhinted; AQE decides.
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # r17 opt: aggregate BELOW the joins (o_orderkey is the orders PK,
    # so it functionally determines every other grouping column — the
    # per-orderkey sum is the same set of addends as the joined
    # groupBy).  The HAVING > 150 then cuts the order list to a sliver
    # BEFORE any join, so the join inputs are (tiny qualifying orders)
    # x orders x customer instead of shuffling the full
    # lineitem-joined-wide rows into the aggregate: lineitem is
    # touched by exactly one narrow (key, qty) partial-aggregated
    # exchange at any SF, and AQE broadcasts the qualifying side.
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
    )


@query(
    "q19_disjunctive_bands",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    description="TPC-H Q19 analog: disjunction of brand/size/quantity bands (single join, OR-of-ANDs predicate)",
)
def q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # part grows with SF — unhinted; AQE decides the join strategy.
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(p, li.l_partkey == p.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return j.filter(band).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )



@query(
    "agg_statistics",
    oracle="""
    SELECT o_orderstatus,
           ROUND(STDDEV_SAMP(o_totalprice), 3) AS sd_price,
           ROUND(VAR_SAMP(o_totalprice) / 1e6, 3) AS var_price_m,
           ROUND(CORR(o_totalprice, o_custkey), 6) AS corr_pc,
           ROUND(COVAR_SAMP(o_totalprice, o_custkey) / 1e6, 3) AS covar_m
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description="statistical aggregates: stddev / variance / correlation / covariance",
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 3).alias("sd_price"),
            F.round(F.var_samp("o_totalprice") / 1e6, 3).alias("var_price_m"),
            F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("corr_pc"),
            F.round(F.covar_samp("o_totalprice", "o_custkey") / 1e6, 3).alias("covar_m"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# TPC-H breadth: the remaining structurally-distinct TPC-H shapes the
# testdata supports (no partsupp/comment/phone/receiptdate columns, so
# q2/q9/q11/q12/q16/q20 have no analog and q21/q22 are adapted).
# --------------------------------------------------------------------------


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7 analog: bilateral nation-pair trade volume by ship year (6-table join, nation dims broadcast)",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # Nation is bounded (25 rows at every SF) -> broadcast; supplier/
    # customer/orders grow with SF -> AQE picks their join strategy.
    n1 = broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region ON n1.n_regionkey = r_regionkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    ) GROUP BY o_year ORDER BY o_year
    """,
    description="TPC-H Q8 analog: one nation's market share of ECONOMY-part revenue into a region, by order year (8-table join)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
        )
    )
    n2 = broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
        )
    )
    r = broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13 analog: order-count-per-customer distribution (left outer join + double aggregation)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    # Outer join on the customer grain; both sides SF-scaled -> no
    # hint, AQE chooses (and handles the null-key skew of customers
    # with no orders, which land on one key only AFTER the count).
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    description="TPC-H Q15 analog: supplier(s) with max quarterly revenue (agg view + scalar max subquery)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    # Scalar subquery as a 1-row broadcast cross join: the max is
    # computed once, shipped to every executor — no second shuffle of
    # the revenue view. Rounding BEFORE the max comparison keeps the
    # float tie decision identical on both engines.
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(broadcast(mx), rev.total_revenue == F.col("__mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT ROUND(0.5 * AVG(l2.l_quantity), 2) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    description="TPC-H Q17 analog: small-quantity revenue vs per-part average (correlated AVG subquery -> agg+rejoin)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Correlated AVG decorrelated into one aggregation over the full
    # fact table + an equi-join back on the part key (the plan Spark's
    # own decorrelation would produce; one shuffle on l_partkey).
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.round(0.5 * F.avg("l_quantity"), 2).alias("qty_threshold")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
    description=(
        "TPC-H Q21 analog (late = shipped >90d after order date): suppliers who "
        "were the sole late shipper in multi-supplier finished orders. The "
        "EXISTS/NOT-EXISTS pair decorrelates into per-order distinct-supplier "
        "counts — two aggregations instead of two correlated self-joins"
    ),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    l = li.join(o, li.l_orderkey == o.o_orderkey)  # ONE fact-fact join, reused below
    late = l.filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
    per_order = l.groupBy("l_orderkey").agg(F.count_distinct("l_suppkey").alias("n_supp"))
    late_per_order = late.groupBy(F.col("l_orderkey").alias("lo_key")).agg(
        F.count_distinct("l_suppkey").alias("n_late_supp"),
        F.min("l_suppkey").alias("sole_late_supp"),
    )
    # Sole-late-supplier orders with >=2 suppliers: the NOT EXISTS
    # becomes n_late_supp == 1, the EXISTS becomes n_supp >= 2.
    qualifying = (
        per_order.filter(F.col("n_supp") >= 2)
        .join(late_per_order, F.col("l_orderkey") == F.col("lo_key"))
        .filter(F.col("n_late_supp") == 1)
        .select("l_orderkey", "sole_late_supp")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # Count l1 ROWS (a supplier's multiple late lines in one order all
    # count, matching the oracle's row-per-l1 semantics).
    return (
        late.join(
            qualifying,
            (late.l_orderkey == qualifying.l_orderkey)
            & (late.l_suppkey == F.col("sole_late_supp")),
        )
        .join(s, late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@query(
    "q22_dormant_customers",
    oracle="""
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT CAST(c_custkey % 10 AS BIGINT) AS cntrycode, c_acctbal
      FROM customer
      WHERE c_acctbal > (
          SELECT ROUND(AVG(c_acctbal), 2) FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01'
        )
    ) GROUP BY cntrycode ORDER BY cntrycode
    """,
    description=(
        "TPC-H Q22 analog (country code = custkey mod 10 — no phone column; "
        "dormant = no orders since 1999, since every testdata customer has "
        "some order): above-average-balance dormant customers by code "
        "(scalar AVG subquery + anti join)"
    ),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("__avg")
    )
    return (
        c.join(broadcast(avg_bal))  # 1-row scalar, broadcast cross join
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.pmod("c_custkey", F.lit(10)).cast("bigint").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description=(
        "fact-fact join through BUCKETED tables: both sides pre-shuffled "
        "by the join key at write time (bucketBy+sortBy), so the join "
        "itself plans with no Exchange — the one-shuffle cost is paid "
        "once at layout time and amortized over every later join"
    ),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from strawboat_spark.operators.bucketing import read_bucketed, write_bucketed

    base = tempfile.mkdtemp(prefix="sb_buckets_")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    write_bucketed(o, "sb_orders_bucketed", "o_orderkey", 8, path=f"{base}/orders")
    write_bucketed(li, "sb_lineitem_bucketed", "l_orderkey", 8, path=f"{base}/lineitem")
    ob = read_bucketed(spark, "sb_orders_bucketed")
    lb = read_bucketed(spark, "sb_lineitem_bucketed")
    return (
        ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "events_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_tus
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, tus,
             CASE WHEN prev_tus IS NULL OR tus - prev_tus > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), sessions AS (
      SELECT user_id, tus,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY tus, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), stats AS (
      SELECT user_id, session_id, COUNT(*) AS n_events,
             MAX(tus) - MIN(tus) AS duration_us
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT COUNT(*) AS n_sessions,
           ROUND(AVG(n_events), 4) AS avg_events,
           CAST(MAX(n_events) AS BIGINT) AS max_events,
           CAST(SUM(duration_us) AS BIGINT) AS total_duration_us
    FROM stats
    """,
    description="batch sessionization: 30-min-gap sessions via lag + running sum (no UDF, no state store)",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as pure window algebra: flag gaps >30min
    with lag(), number sessions with a running sum of flags — the
    standard batch twin of the streaming session window. One shuffle on
    user_id; duration kept in exact integer microseconds so the driver
    hash is float-free until the final rounded average.

    Tie-break: (ts, event_id) ordering makes lag deterministic when two
    events share a timestamp."""
    from pyspark.sql.types import TimestampNTZType
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    # events.ts reads as TIMESTAMP_NTZ from native-micros parquet and as
    # TIMESTAMP from the legacy nanos path; both need tz-free epoch
    # micros (DuckDB's epoch_us treats the naive value as the instant).
    if isinstance(ev.schema["ts"].dataType, TimestampNTZType):
        tus = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    else:
        tus = F.unix_micros(F.col("ts"))
    e = ev.select("user_id", "event_id", tus.alias("tus"))
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        "tus",
        F.when(
            F.lag("tus").over(w).isNull() | (F.col("tus") - F.lag("tus").over(w) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = flagged.select(
        "user_id", "tus", F.sum("new_session").over(ws).alias("session_id")
    )
    stats = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("tus") - F.min("tus")).alias("duration_us"),
    )
    return stats.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.max("n_events").cast("bigint").alias("max_events"),
        F.sum("duration_us").cast("bigint").alias("total_duration_us"),
    )


@query(
    "join_full_outer",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nk, COUNT(*) AS n_rich
      FROM customer WHERE c_acctbal > 7500 GROUP BY c_nationkey
    ), s AS (
      SELECT s_nationkey AS nk, COUNT(*) AS n_poor
      FROM supplier WHERE s_acctbal < -500 GROUP BY s_nationkey
    )
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_rich, 0) AS n_rich,
           COALESCE(n_poor, 0) AS n_poor
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    ORDER BY nationkey
    """,
    description="full outer join of two filtered aggregates (null-completing both sides)",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER shape: selective filters leave nations present on
    only one side, so both null-completion directions are exercised.
    Aggregate-then-join keeps the outer join's inputs tiny (<=25 rows
    each at any SF) — the shuffle is on the pre-aggregated keys."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7500)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_rich"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < -500)
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count(F.lit(1)).alias("n_poor"))
    )
    return (
        c.join(s, c.nk == s.snk, "full_outer")
        .select(
            F.coalesce(c.nk, s.snk).alias("nationkey"),
            F.coalesce("n_rich", F.lit(0)).alias("n_rich"),
            F.coalesce("n_poor", F.lit(0)).alias("n_poor"),
        )
        .orderBy("nationkey")
    )



@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             ROUND(MIN(l_extendedprice / l_quantity), 2) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM part, ps, supplier, nation, region
    WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
      AND p_size = 15 AND p_type = 'LARGE'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND unit_cost = (
        SELECT MIN(ps2.unit_cost)
        FROM ps ps2, supplier s2, nation n2, region r2
        WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    description=(
        "TPC-H Q2 analog (supplier-part catalog derived from lineitem — no "
        "partsupp table; unit cost = min observed extendedprice/quantity): "
        "min-cost EUROPE supplier per LARGE size-15 part. The correlated MIN "
        "subquery decorrelates into one per-part aggregation + equality "
        "rejoin; dims broadcast, ONE shuffle of the derived catalog"
    ),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    # Derived supplier-part catalog: one shuffle on (partkey, suppkey).
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2).alias("unit_cost")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name")
    )
    eu_supp = (
        _t(spark, sf_dir, "supplier")
        .join(broadcast(_t(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(_t(spark, sf_dir, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # EUROPE offers for the qualifying parts only (both dims broadcast).
    # part and supplier both scale with SF — no pinned broadcast;
    # AQE picks broadcast at small SF and shuffle at large.
    offers = ps.join(p, ps.l_partkey == p.p_partkey).join(
        eu_supp, ps.l_suppkey == F.col("s_suppkey")
    )
    # Correlated MIN decorrelated into a per-part WINDOW min: an
    # agg+rejoin would duplicate the whole offers subtree (two lineitem
    # scans); the window keeps ONE scan and adds only a per-part sort
    # after the shuffle on p_partkey.
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("__min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("__min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           ROUND(CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity) * 100, 0) AS BIGINT))
                 AS DOUBLE) / 100, 2) AS sum_profit
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%widget%'
    GROUP BY n_name, CAST(YEAR(o_orderdate) AS BIGINT)
    ORDER BY 1, 2 DESC
    """,
    description=(
        "TPC-H Q9 analog (profit = revenue - 10% of retail price as the "
        "supply-cost stand-in — no partsupp table): profit by supplier "
        "nation and order year for widget parts. part/supplier/nation "
        "broadcast; lineitem-orders is the one fact-fact shuffle"
    ),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(broadcast(_t(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)  # part/supplier scale with
        .join(s, li.l_suppkey == F.col("s_suppkey"))  # SF: AQE decides
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        # Per-line profit quantized to integer cents BEFORE the sum: the
        # per-row double is identical on any engine (same inputs, same
        # expression), and a bigint sum is exact — so summation order
        # (partial aggs, AQE splits) can never flip a half-cent boundary.
        .agg(
            F.round(
                F.sum(F.round(profit * 100, 0).cast("long")).cast("double") / 100, 2
            ).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS ps_partkey,
             SUM(l_extendedprice * (1 - l_discount)) AS raw_value
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT ps_partkey, ROUND(raw_value, 2) AS part_value
    FROM v
    WHERE ROUND(raw_value, 2) > (SELECT ROUND(SUM(raw_value) * 0.001, 2) FROM v)
    ORDER BY part_value DESC, ps_partkey
    """,
    description=(
        "TPC-H Q11 analog (part value = traded revenue through NATION_7 "
        "suppliers — no partsupp availqty): parts holding more than 0.1% of "
        "the nation's total value. Scalar-subquery threshold = 1-row "
        "broadcast over the SAME aggregated view (no second lineitem scan); "
        "both sides rounded to cents before the comparison so summation "
        "order can't flip boundary rows"
    ),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        _t(spark, sf_dir, "supplier")
        .join(broadcast(_t(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    v = (
        li.join(s, li.l_suppkey == s.s_suppkey)  # supplier scales: AQE decides
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("raw_value"))
    )
    total = v.agg(F.round(F.sum("raw_value") * 0.001, 2).alias("__threshold"))
    return (
        v.join(broadcast(total))  # 1-row scalar, broadcast cross join
        .filter(F.round(F.col("raw_value"), 2) > F.col("__threshold"))
        .select("ps_partkey", F.round("raw_value", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


@query(
    "q12_shipping_delay",
    oracle="""
    SELECT delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY THEN 'LATE'
                  WHEN l_shipdate >= o_orderdate + INTERVAL 21 DAY THEN 'SLOW'
                  ELSE 'FAST' END AS delay_bucket
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
    )
    GROUP BY delay_bucket ORDER BY delay_bucket
    """,
    description=(
        "TPC-H Q12 analog (delay bucket FAST/SLOW/LATE from shipdate - "
        "orderdate — no l_shipmode/receiptdate columns): high- vs "
        "low-priority line counts per shipping-delay bucket. Date filter "
        "pushes to the lineitem scan before the fact-fact join"
    ),
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .select("l_orderkey", "l_shipdate")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    bucket = (
        F.when(F.col("l_shipdate") >= F.date_add(F.col("o_orderdate"), 60), "LATE")
        .when(F.col("l_shipdate") >= F.date_add(F.col("o_orderdate"), 21), "SLOW")
        .otherwise("FAST")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(bucket.alias("delay_bucket"), high.alias("__high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("__high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("__high"), 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@query(
    "q16_parts_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    description=(
        "TPC-H Q16 analog (supplier-part relation from lineitem; negative "
        "account balance stands in for the complaints exclusion): distinct "
        "supplier count per brand/type/size. NOT IN -> broadcast left-anti "
        "join; part dim broadcast; one distinct-agg shuffle"
    ),
)
def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)  # part scales: AQE decides
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 50
      )
    ORDER BY s_name
    """,
    description=(
        "TPC-H Q20 analog (heavy shipper = >50 units of one small-part in "
        "1997, standing in for the availqty > half-shipped test — no "
        "partsupp): NATION_3 suppliers qualifying for the promotion. "
        "Nested IN chain -> broadcast semi joins; HAVING gate aggregates "
        "before the supplier semi join"
    ),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .select("l_suppkey", "l_partkey", "l_quantity")
    )
    heavy = (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")  # part scales: AQE decides
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        _t(spark, sf_dir, "supplier")
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "events_funnel",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e
          JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e
          JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id),
    staged AS (
      SELECT u.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  WHEN v.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS stage
      FROM u LEFT JOIN v ON v.user_id = u.user_id
             LEFT JOIN c ON c.user_id = u.user_id
             LEFT JOIN p ON p.user_id = u.user_id
    )
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM staged GROUP BY stage ORDER BY stage
    """,
    description=(
        "funnel analysis (view -> click -> purchase, strictly ordered "
        "timestamps): users per deepest stage reached. ONE shuffle on "
        "user_id + a JVM fold over the sorted event list runs the state "
        "machine — the oracle's three correlated MIN subqueries would be "
        "three fact-table joins; the fold replaces them all"
    ),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    ev = F.sort_array(F.collect_list(F.struct("ts", "event_type")))
    zero = F.struct(
        F.lit(None).cast("timestamp").alias("v"),
        F.lit(None).cast("timestamp").alias("c"),
        F.lit(None).cast("timestamp").alias("p"),
    )

    def step(acc, x):
        is_view = (x["event_type"] == "view") & acc["v"].isNull()
        is_click = (
            (x["event_type"] == "click")
            & acc["v"].isNotNull()
            & (x["ts"] > acc["v"])
            & acc["c"].isNull()
        )
        is_purchase = (
            (x["event_type"] == "purchase")
            & acc["c"].isNotNull()
            & (x["ts"] > acc["c"])
            & acc["p"].isNull()
        )
        return F.struct(
            F.when(is_view, x["ts"]).otherwise(acc["v"]).alias("v"),
            F.when(is_click, x["ts"]).otherwise(acc["c"]).alias("c"),
            F.when(is_purchase, x["ts"]).otherwise(acc["p"]).alias("p"),
        )

    stage = F.aggregate(
        ev,
        zero,
        step,
        lambda acc: F.when(acc["p"].isNotNull(), 3)
        .when(acc["c"].isNotNull(), 2)
        .when(acc["v"].isNotNull(), 1)
        .otherwise(0),
    )
    return (
        e.groupBy("user_id")
        .agg(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
      GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
             e.user_id
      FROM events e JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT cohort_day, CAST(day_offset AS INT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
    description=(
        "cohort retention: users grouped by first-seen day, distinct "
        "active users at each day offset <= 7. Two shuffles (first-day "
        "agg on user_id reused by the join under AQE, then the "
        "cohort/offset distinct-count); all-integer arithmetic, exact"
    ),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("day"))
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(firsts, "user_id")  # user-cardinality side: AQE decides
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .filter(F.col("day_offset") <= 7)
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


def _pagerank_oracle(n_iterations: int = 3) -> str:
    """Chained-CTE replay of the integer fixed-point PageRank — built
    programmatically so the three iterations can't drift apart."""
    scale = 1_000_000_000_000
    parts = [
        """
    WITH nodes AS (
      SELECT 2 * c_custkey AS node FROM customer
      UNION ALL SELECT 2 * s_suppkey + 1 FROM supplier
    ), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    edges AS (
      SELECT DISTINCT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), outdeg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
    ),
    r0 AS (SELECT node, ({scale} // nn.n) AS rank FROM nodes, nn)
    """.format(scale=scale)
    ]
    for k in range(1, n_iterations + 1):
        prev = f"r{k - 1}"
        parts.append(
            """
    , d{k} AS (
      SELECT CAST(COALESCE(SUM(rank), 0) AS BIGINT) AS dang
      FROM {prev} LEFT JOIN outdeg ON {prev}.node = outdeg.src
      WHERE outdeg.outdeg IS NULL
    ), c{k} AS (
      SELECT edges.dst AS node,
             CAST(SUM({prev}.rank // outdeg.outdeg) AS BIGINT) AS sum_in
      FROM {prev}
      JOIN outdeg ON {prev}.node = outdeg.src
      JOIN edges ON edges.src = {prev}.node
      GROUP BY edges.dst
    ), r{k} AS (
      SELECT {prev}.node,
             CAST((15 * ({scale} // nn.n)) // 100
             + (85 * (COALESCE(c{k}.sum_in, 0) + (d{k}.dang // nn.n))) // 100
               AS BIGINT) AS rank
      FROM {prev} LEFT JOIN c{k} ON c{k}.node = {prev}.node, d{k}, nn
    )""".format(k=k, prev=prev, scale=scale)
        )
    parts.append(
        f"""
    SELECT node, rank FROM r{n_iterations}
    ORDER BY rank DESC, node LIMIT 20
    """
    )
    return "".join(parts)


@query(
    "graph_pagerank",
    oracle=_pagerank_oracle(3),
    description=(
        "damped PageRank over the customer->supplier purchase graph, 3 "
        "iterations in EXACT integer fixed point (bigint micro-units, "
        "integer division everywhere) — summation order can't drift the "
        "result, so an iterative distributed algorithm hash-matches a "
        "chained-CTE SQL replay; one shuffle per iteration, dangling "
        "mass as a 1-row broadcast scalar"
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.graph import pagerank_fixed_point

    c = _t(spark, sf_dir, "customer").select((2 * F.col("c_custkey")).alias("node"))
    s = _t(spark, sf_dir, "supplier").select((2 * F.col("s_suppkey") + 1).alias("node"))
    nodes = c.unionAll(s)
    edges = (
        _t(spark, sf_dir, "orders")
        .join(_t(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (2 * F.col("o_custkey")).alias("src"),
            (2 * F.col("l_suppkey") + 1).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank_fixed_point(nodes, edges, n_iterations=3)
    return ranks.orderBy(F.desc("rank"), "node").limit(20)



@query(
    "agg_histogram",
    oracle="""
    WITH b AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / 60000) AS BIGINT), 9) AS bucket
      FROM orders
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    description=(
        "equi-width histogram (10 fixed 60k-wide buckets, top bucket "
        "open-ended): a single partial+final count aggregation — the "
        "classic profile/data-quality scan shape"
    ),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 60000).cast("bigint"), F.lit(9))
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )
