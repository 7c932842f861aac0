"""Incrementally maintained aggregate views over strawboat tables.

The change data feed (readStream change_feed=true) emits exact
row-level inserts/deletes per generation, which makes additive
aggregates (COUNT, SUM) incrementally maintainable WITHOUT rescanning
the base table: each microbatch folds its net deltas into the view.
This is the Delta-Live-Tables-style "incremental ETL" primitive — the
view refresh costs the size of the CHANGES, not the table, and the
view itself is a strawboat table (generations, time travel, CDF of
its own).

Scale shape per refresh: one groupBy over the batch's changes (tiny),
one full-outer join against the current view keyed on the group
columns (view-sized, not table-sized), one overwrite commit. The base
table is never scanned after the seed generation.

Idempotency: foreachBatch is AT-LEAST-ONCE — a failure after the view
overwrite but before the streaming checkpoint commits replays the
batch.  Each fold therefore commits a txn marker {app, batch} as the
view manifest's table properties IN THE SAME generation flip as the
fold result (the Delta txnAppId/txnVersion pattern), and a replayed
batch whose id is <= the recorded horizon is skipped instead of
double-applied.  The marker is keyed by the checkpoint location: a
NEW checkpoint restarts batch ids AND re-reads the CDF from its
starting generation, so it must re-seed the view — its distinct app
id deliberately does not match the old horizon.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _fold_batch(
    view,
    view_path: str,
    group_col: str,
    value_col: str,
    txn_app: str,
    batch_df: DataFrame,
    batch_id: int,
) -> None:
    """Fold one CDF microbatch into the view, exactly once per batch
    id: skip ids at or below the committed horizon, and commit the new
    horizon atomically with the fold result."""
    from strawboat_spark.sources.datasource import read_manifest

    man = read_manifest(view_path)
    props = dict((man or {}).get("properties") or {})
    txn = props.get("txn") or {}
    if txn.get("app") == txn_app and batch_id <= txn.get("batch", -1):
        return  # at-least-once replay of an already-folded batch

    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = batch_df.groupBy(F.col(group_col).alias("g")).agg(
        F.sum(sign).alias("d_n"),
        F.sum(sign * F.col(value_col)).alias("d_sum"),
    )
    # explicit first-fold detection: a read failure on an EXISTING
    # view must propagate (masking it would silently reset the
    # view to this batch's deltas and corrupt every later total)
    if man is None:
        cur = None
    else:
        cur = view.read().select(
            F.col(group_col).alias("g"),
            F.col("n_rows").alias("cur_n"),
            F.col("sum_value").alias("cur_sum"),
        )
    if cur is not None:
        merged = cur.join(delta, "g", "full_outer").select(
            "g",
            (F.coalesce("cur_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
                "n_rows"
            ),
            (
                F.coalesce("cur_sum", F.lit(0.0)) + F.coalesce("d_sum", F.lit(0.0))
            ).alias("sum_value"),
        )
    else:
        merged = delta.select(
            "g", F.col("d_n").alias("n_rows"), F.col("d_sum").alias("sum_value")
        )
    out = merged.filter(F.col("n_rows") > 0).select(
        F.col("g").alias(group_col), "n_rows", "sum_value"
    )
    props["txn"] = {"app": txn_app, "batch": int(batch_id)}
    view.overwrite(out, manifest_properties=json.dumps(props))


def maintain_count_sum_view(
    spark: SparkSession,
    table_path: str,
    view_path: str,
    group_col: str,
    value_col: str,
    checkpoint: str,
    starting_generation: int = 1,
) -> DataFrame:
    """Run one availableNow maintenance cycle: fold every unprocessed
    CDF generation into the (group, n_rows, sum_value) view and return
    the refreshed view. Re-running with the same checkpoint processes
    only NEW generations (the CDF offsets are checkpointed), so a cron
    of this function is a continuously-maintained materialized view."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    view = Table(spark, view_path)
    txn_app = f"incremental_view:{checkpoint}"

    def fold(batch_df, batch_id):
        _fold_batch(view, view_path, group_col, value_col, txn_app, batch_df, batch_id)

    q = (
        spark.readStream.format("strawboat")
        .option("change_feed", "true")
        .option("starting_generation", str(starting_generation))
        .load(table_path)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return view.read()


def maintain_join_agg_view(
    spark: SparkSession,
    a_path: str,
    b_path: str,
    view_path: str,
    on: list[str],
    group_col: str,
    value_col: str,
    _plan_hook=None,
) -> DataFrame:
    """One refresh of an incrementally maintained JOIN-aggregate view:

        V = SELECT group_col, COUNT(*) n_rows, SUM(value_col) sum_value
            FROM A JOIN B USING (on) GROUP BY group_col

    maintained by the delta identity  A'⋈B' = A⋈B + ΔA⋈B + A'⋈ΔB:
    each side's batch change feed (Table.changes — net multiset
    deltas, so compactions cancel out) joins the OTHER side's pinned
    snapshot with a +1/-1 sign, the signed rows aggregate into group
    deltas, and the deltas fold into the view exactly like the
    count/sum view.  Refresh cost: two |Δ|-driven joins (each scans
    one table once but shuffles only the delta), never a full A⋈B
    after the seed — the materialized-view shape that stays viable
    when A is 100 TB and the day's changes are gigabytes.

    Consistency/idempotence: the processed (genA, genB) horizon
    commits ATOMICALLY with the fold in the view manifest's
    properties; a re-run at the same heads is a no-op, a crashed
    refresh replays from the committed horizon.  Snapshot pinning
    (B @ old horizon, A @ new head) makes the two delta joins
    consistent regardless of writes racing the refresh.  Requires the
    horizon generations still retained (vacuum) and A/B column names
    disjoint apart from the join keys."""
    from strawboat_spark.sources.datasource import read_manifest, register
    from strawboat_spark.table import Table

    register(spark)
    A, B, view = Table(spark, a_path), Table(spark, b_path), Table(spark, view_path)
    man_a, man_b = read_manifest(a_path), read_manifest(b_path)
    if man_a is None or man_b is None:
        raise ValueError("maintain_join_agg_view: both base tables need a commit")
    ga1, gb1 = man_a.get("generation", 0), man_b.get("generation", 0)
    vman = read_manifest(view_path)
    props = dict((vman or {}).get("properties") or {})
    hz = props.get("join_view_horizon") or {}
    ga0, gb0 = hz.get("a"), hz.get("b")
    if ga0 == ga1 and gb0 == gb1:
        return view.read()  # already at the heads: exact no-op

    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))

    def _gv(df):
        return df.select(
            F.col(group_col).alias("g"), F.col(value_col).alias("v"), "_s"
        )

    if vman is None or ga0 is None:
        # seed: one full join at the pinned heads
        joined = (
            A.read(at_generation=ga1)
            .join(B.read(at_generation=gb1), on)
            .select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        )
        merged = joined.groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_value")
        )
    else:
        parts = []
        if ga1 > ga0:
            d_a = A.changes(ga0, ga1).withColumn("_s", sign)
            parts.append(_gv(d_a.join(B.read(at_generation=gb0), on)))
        if gb1 > gb0:
            d_b = B.changes(gb0, gb1).withColumn("_s", sign)
            parts.append(_gv(A.read(at_generation=ga1).join(d_b, on)))
        delta_rows = parts[0]
        for p in parts[1:]:
            delta_rows = delta_rows.unionByName(p)
        delta = delta_rows.groupBy("g").agg(
            F.sum("_s").alias("d_n"), F.sum(F.col("_s") * F.col("v")).alias("d_sum")
        )
        cur = view.read().select(
            F.col(group_col).alias("g"),
            F.col("n_rows").alias("cur_n"),
            F.col("sum_value").alias("cur_sum"),
        )
        merged = cur.join(delta, "g", "full_outer").select(
            "g",
            (F.coalesce("cur_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
                "n_rows"
            ),
            (
                F.coalesce("cur_sum", F.lit(0)) + F.coalesce("d_sum", F.lit(0))
            ).alias("sum_value"),
        )
    out = merged.filter(F.col("n_rows") > 0).select(
        F.col("g").alias(group_col), "n_rows", "sum_value"
    )
    if _plan_hook is not None:
        _plan_hook(out)  # plan-shape tests audit the refresh plan
    props["join_view_horizon"] = {"a": int(ga1), "b": int(gb1)}
    view.overwrite(out, manifest_properties=json.dumps(props))
    return view.read()
