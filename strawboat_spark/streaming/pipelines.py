"""Streaming pipelines: watermarked windowed aggregation, session
windows, and custom stateful processing over an events stream.

Batch/stream parity is the design invariant: every aggregation here
uses the exact operators the batch queries use (F.window,
F.session_window), so a pipeline validated against the DuckDB oracle
in batch mode computes the same thing incrementally under a trigger.
At scale the stream is Kafka/file-source partitions; state lives in
the state store keyed by (group, window) — no driver involvement.

The stubbed-out bits are none: everything below runs in this container
(file source → availableNow trigger → memory/strawboat sink).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# Events schema as DDL; value is double, props a json-ish string.
EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    """File-source stream over a directory of parquet event files
    (stand-in for Kafka; same downstream operators)."""
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def tumbling_counts(events: DataFrame, window: str = "1 day", watermark: str = "2 days") -> DataFrame:
    """Watermarked tumbling-window aggregation. Late rows beyond the
    watermark are dropped; state for closed windows is evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 days") -> DataFrame:
    """Watermarked session windows (gap-based), the streaming twin of
    the batch stream_session_window gate query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


RUNNING_STATE_SCHEMA = "user_id long, n_events long, total_value double"
RUNNING_OUT_SCHEMA = "user_id long, n_events long, total_value double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count + value total across microbatches.

    This is the escape hatch for semantics window functions can't
    express incrementally (the reference format has no streaming at
    all — SURVEY.md §2C; this is the Spark-native capability row).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        # key arrives as a tuple of grouping values
        (user_id,) = key
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUT_SCHEMA,
        stateStructType="n_events long, total_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_strawboat_stream(df: DataFrame, path: str, checkpoint: str, trigger_available_now: bool = True):
    """Stream sink into the strawboat format via the DataSource's
    streamWriter (exactly-once per microbatch: files carry the batch id;
    commit/abort reconcile)."""
    w = (
        df.writeStream.format("strawboat")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def dedup_within_watermark(events: DataFrame, keys: list[str] | None = None, watermark: str = "2 days") -> DataFrame:
    """Streaming exact dedup: drop repeats of the same key arriving
    within the watermark horizon. State holds one entry per key seen in
    the horizon and is evicted as the watermark advances — bounded
    state, unlike a batch distinct over an unbounded stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def enrich_stream_stream_join(
    events: DataFrame, clicks: DataFrame, horizon: str = "1 hour", watermark: str = "2 days"
) -> DataFrame:
    """Stream-stream inner join: match each event to same-user rows of a
    second stream within a bounded time band. The band condition is what
    lets Spark evict join state (both sides watermarked; state per side
    bounded by horizon), the canonical scale pattern for stream joins.
    """
    left = events.withWatermark("ts", watermark).alias("l")
    right = (
        clicks.select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
            F.col("event_type").alias("c_event_type"),
        )
        .withWatermark("c_ts", watermark)
        .alias("r")
    )
    return left.join(
        right,
        F.expr(
            f"user_id = c_user_id AND c_ts BETWEEN ts AND ts + INTERVAL {horizon}"
        ),
        "inner",
    )


TOPK_OUT_SCHEMA = "user_id long, n_seen long, rank int, value double, event_id long"


def top_events_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Per-user top-k event values via transformWithStateInPandas —
    Spark 4's arbitrary-state API (typed ListState/ValueState in the
    state store, TTL- and timer-capable), the successor of
    applyInPandasWithState used by running_user_totals above.

    State per user is BOUNDED (k rows + one counter) regardless of
    stream length — the incremental top-k a batch window can't give
    you without reprocessing. Deterministic tiebreak (value desc,
    event_id asc). Emits the current top-k per user per microbatch
    with n_seen as the progress stamp (update mode).

    DEPENDENCY GATE: transformWithState's state-store protocol speaks
    protobuf; this container ships no `google.protobuf`, so the parity
    test (`test_transform_with_state_topk`) importorskips and the
    VERIFIED stateful path in this environment remains
    running_user_totals (applyInPandasWithState, no protobuf). On a
    cluster with protobuf installed the test runs as-is."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.top = handle.getListState("topk", "value double, event_id long")
            self.seen = handle.getValueState("seen", "n long")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            cur = [tuple(t) for t in self.top.get()] if self.top.exists() else []
            n = self.seen.get()[0] if self.seen.exists() else 0
            for pdf in rows:
                n += len(pdf)
                cur.extend(
                    zip(pdf["value"].astype(float), pdf["event_id"].astype("int64"))
                )
            cur.sort(key=lambda t: (-t[0], t[1]))
            cur = cur[:k]
            self.top.put([(float(v), int(e)) for v, e in cur])
            self.seen.update((int(n),))
            (user_id,) = key
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)] * len(cur),
                    "n_seen": [int(n)] * len(cur),
                    "rank": list(range(1, len(cur) + 1)),
                    "value": [v for v, _ in cur],
                    "event_id": [e for _, e in cur],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TopKProcessor(),
        outputStructType=TOPK_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def maintain_dedup_index(
    spark,
    docs_path: str,
    index_path: str,
    pairs_path: str,
    text_col: str,
    id_col: str,
    checkpoint: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
):
    """Continuously maintained near-dup detection: one availableNow
    cycle streams NEW documents out of the strawboat table at
    `docs_path` (file-set offsets — only unseen files per batch),
    dedups each batch against the corpus via the incremental Jaccard
    index, lands the candidate pairs in a `pairs_path` table, and
    appends the batch's postings to the index.

    Exactly-once under foreachBatch replays (the Delta txnAppId
    pattern, per TABLE since two tables cannot commit atomically):
    - the pairs append commits {app, batch} in ITS flip; a replayed
      batch that already landed pairs skips them;
    - the index append commits its own marker in ITS flip; pairs are
      computed against the PRE-append generation, so the
      crash-between-the-two case replays to the identical result
      (pairs skipped, postings appended once).

    Re-running with the same checkpoint processes only new documents —
    a cron of this function is a continuously-deduped corpus."""
    import json

    from strawboat_spark.operators.dedup import (
        jaccard_index_append,
        jaccard_index_ingest,
    )
    from strawboat_spark.sources.datasource import read_manifest, register
    from strawboat_spark.table import Table

    register(spark)
    txn_app = f"dedup_index:{checkpoint}"

    def _marker(path: str) -> int:
        props = (read_manifest(path) or {}).get("properties") or {}
        txn = props.get("txn") or {}
        return txn.get("batch", -1) if txn.get("app") == txn_app else -1

    def _props_with_marker(path: str, batch_id: int) -> str:
        props = dict((read_manifest(path) or {}).get("properties") or {})
        props["txn"] = {"app": txn_app, "batch": int(batch_id)}
        return json.dumps(props)

    def fold(batch_df, batch_id):
        batch_df = batch_df.select(id_col, text_col)
        pairs_done = _marker(pairs_path) >= batch_id
        index_done = _marker(index_path) >= batch_id
        if pairs_done and index_done:
            return  # fully replayed batch
        pairs = jaccard_index_append(
            spark,
            index_path,
            batch_df,
            text_col,
            id_col,
            shingle_n=shingle_n,
            threshold=threshold,
            max_doc_freq=max_doc_freq,
            # postings append (skipped entirely when already applied)
            # carries ITS marker atomically; ingest LAST so the pairs
            # computation below reads the pre-append generation
            ingest=False,
        )
        if not pairs_done:
            Table(spark, pairs_path).append(
                pairs.withColumn("batch_id", F.lit(int(batch_id)).cast("long")),
                manifest_properties=_props_with_marker(pairs_path, batch_id),
            )
        if not index_done:
            jaccard_index_ingest(
                spark,
                index_path,
                batch_df,
                text_col,
                id_col,
                shingle_n=shingle_n,
                manifest_properties=_props_with_marker(index_path, batch_id),
            )

    q = (
        spark.readStream.format("strawboat")
        .load(docs_path)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return Table(spark, pairs_path).read()
