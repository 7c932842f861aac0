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
