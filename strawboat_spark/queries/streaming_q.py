"""Streaming-semantics queries (session windows, tumbling windows)
runnable in batch mode — same operators Structured Streaming uses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from strawboat_spark.queries import query
from strawboat_spark.tables import load_table


class _scoped_state_partitions:
    """Scale-adaptive state-partition count for FRESH-checkpoint
    streaming drains (r17 opt, guide §2: partitioning follows data
    volume, never a constant). Stateful operators pay a per-partition
    state-store init + commit in EVERY microbatch (RocksDB instance
    open, snapshot/changelog upload), so a drain over n rows wants
    ~n / rows_per_part state partitions, not the session's
    cluster-sized shuffle constant — measured warm at sf0.1:
    stream_running_totals 5.49 -> 3.02 s, stream_topk_state 6.36 ->
    5.11 s for 32 -> 8 partitions, identical results (state partition
    count never changes per-key grouping, only how keys spread).

    The derived count is CAPPED at the session setting, so at real
    scale (rows >> rows_per_part x session constant) this is a no-op
    and the cluster-sized setting wins; the gate scales DOWN only.
    `SPARK_GRAFT_STREAM_STATE_ROWS_PER_PART` overrides the density
    (0 disables the scaling entirely). Only valid around checkpoint
    CREATION — resuming an existing checkpoint pins its original
    partition count, which is why this scopes the gates' fresh drains
    and not the operators in streaming/pipelines.py.

    Concurrency note (r18, ADVICE r17): this temporarily mutates the
    SESSION-global shuffle-partition setting. Declared gates run
    serially (bench.py / the driver / the tests all execute one query
    at a time on the session), so nothing else plans under the reduced
    count; if concurrent gate execution is ever introduced, scope the
    setting per-query instead (session clone or writeStream option)."""

    def __init__(self, spark: SparkSession, n_rows: int | None):
        import os

        self._spark = spark
        self._prev: str | None = None
        per_part = int(os.environ.get("SPARK_GRAFT_STREAM_STATE_ROWS_PER_PART", "12500"))
        if not n_rows or per_part <= 0:
            self._target = None
            return
        cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
        self._target = min(cur, max(4, -(-n_rows // per_part)))
        if self._target == cur:
            self._target = None

    def __enter__(self):
        if self._target is not None:
            self._prev = self._spark.conf.get("spark.sql.shuffle.partitions")
            self._spark.conf.set("spark.sql.shuffle.partitions", str(self._target))
        return self

    def __exit__(self, *exc):
        if self._prev is not None:
            self._spark.conf.set("spark.sql.shuffle.partitions", self._prev)
        return False


def _events_nrows(sf_dir: str) -> int | None:
    """Row count of the events source from parquet footer metadata —
    no Spark job. Best-effort: None (no scaling) when unreadable."""
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    except Exception:  # noqa: BLE001 - sizing is best-effort
        return None



@query(
    "stream_window_aggs",
    oracle="""
    SELECT * FROM (
      SELECT 'sliding' AS gate, event_type,
             strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
             COUNT(*) AS n_events,
             ROUND(SUM(value), 2) AS sum_value
      FROM (
        SELECT event_type, value, ts,
               unnest([date_trunc('day', ts) - INTERVAL 12 HOUR
                         + CASE WHEN ts >= date_trunc('day', ts) + INTERVAL 12 HOUR
                                THEN INTERVAL 12 HOUR ELSE INTERVAL 0 HOUR END,
                       date_trunc('day', ts)
                         + CASE WHEN ts >= date_trunc('day', ts) + INTERVAL 12 HOUR
                                THEN INTERVAL 12 HOUR ELSE INTERVAL 0 HOUR END]) AS ws
        FROM events
      )
      WHERE ts >= ws AND ts < ws + INTERVAL 24 HOUR
      GROUP BY event_type, ws
      UNION ALL
      SELECT 'tumbling', event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),
             COUNT(*),
             ROUND(SUM(value), 2)
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ) ORDER BY gate, event_type, window_start
    """,
    description=(
        "composite window-agg gate (r9 fold of stream_tumbling/"
        "sliding_window): 1-day tumbling and 24h/12h sliding window "
        "aggregates over events — the exact operators Structured "
        "Streaming uses, replayed batch-side under one oracle"
    ),
)
def stream_window_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def win(wspec, gate):
        return (
            e.groupBy("event_type", wspec.alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .select(
                F.lit(gate).alias("gate"),
                "event_type",
                F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "n_events",
                "sum_value",
            )
        )

    return (
        win(F.window("ts", "24 hours", "12 hours"), "sliding")
        .unionByName(win(F.window("ts", "1 day"), "tumbling"))
        .orderBy("gate", "event_type", "window_start")
    )


@query(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    description="session windows (30 min gap) — F.session_window, streaming-compatible",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
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
        .orderBy("user_id", "session_start")
    )



@query(
    "strawboat_stream_cdf",
    oracle="""
    SELECT 'delete' AS change_type, CAST(2 AS BIGINT) AS generation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey % 4 = 2 AND o_orderstatus = 'F'
    UNION ALL
    SELECT 'insert' AS change_type, CAST(1 AS BIGINT) AS generation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    ORDER BY change_type, generation
    """,
    description=(
        "streaming change data feed gate: generation-tailing readStream "
        "(change_feed=true) over a seed + MOR delete emits exactly the "
        "seed as generation-1 inserts and the masked rows as "
        "generation-2 deletes — hash-matched against the analytic replay"
    ),
)
def strawboat_stream_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the CDF stream to completion (availableNow) over a table
    given one overwrite + one merge-on-read delete, then aggregates the
    feed per (change_type, generation). MOR changes stream EXACTLY
    (row-level deletes from the deletion-vector delta), which is what
    makes an exact oracle possible for a streaming source."""
    import tempfile
    import uuid

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_scdf_')}/orders"
    t = Table(spark, path)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.overwrite(o)  # generation 1
    t.delete("o_orderkey % 4 = 2 AND o_orderstatus = 'F'", mode="mor")  # gen 2
    name = f"scdf_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("strawboat")
        .option("change_feed", "true")
        .option("starting_generation", "1")
        .load(path)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.table(name)
        .groupBy(
            F.col("_change_type").alias("change_type"),
            F.col("_generation").alias("generation"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("change_type", "generation")
    )


@query(
    "stream_topk_state",
    revised=17,  # r17 rewrite not in the r17 driver sample (VERDICT r17 #7)
    oracle="""
    SELECT user_id, rank, ROUND(value, 4) AS value, event_id FROM (
      SELECT user_id, value, event_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY value DESC, event_id) AS INT) AS rank
      FROM events
    ) WHERE rank <= 3 ORDER BY user_id, rank
    """,
    description=(
        "transformWithStateInPandas gate: typed ListState/ValueState "
        "incremental top-k over a 2-microbatch stream; the drained "
        "final emissions hash-match the batch window oracle"
    ),
)
def stream_topk_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 arbitrary-state operator, driver-verifiable: events
    stream in two microbatches (state must survive the batch boundary)
    through streaming/pipelines.top_events_per_user, whose per-user
    ListState holds the running top-3 (bounded state regardless of
    stream length). The state-server protocol needs a protobuf runtime
    in every Python worker: protostub.install(spark) ships the
    vendored wire-format stub via addPyFile when the real package is
    absent, so this runs under ANY session, not just ones whose JVM
    inherited our PYTHONPATH. RocksDB state store (multi-column-family
    support) is set for the run and restored after."""
    import tempfile
    import uuid

    from pyspark.sql import Window

    from strawboat_spark.streaming.pipelines import top_events_per_user
    from strawboat_spark.streaming.protostub import install

    install(spark)
    src = f"{tempfile.mkdtemp(prefix='strawboat_twstate_')}/events"
    e = load_table(spark, sf_dir, "events").select("user_id", "value", "event_id")
    # two files -> two microbatches: state must carry across the boundary
    e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/a")
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/b")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    name = f"twstate_{uuid.uuid4().hex[:8]}"
    try:
        stream = (
            spark.readStream.schema("user_id long, value double, event_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        with _scoped_state_partitions(spark, _events_nrows(sf_dir)):
            q = (
                top_events_per_user(stream, k=3)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    got = spark.table(name)
    w = Window.partitionBy("user_id")
    return (
        got.withColumn("__mx", F.max("n_seen").over(w))
        .filter(F.col("n_seen") == F.col("__mx"))
        .select(
            "user_id", "rank", F.round("value", 4).alias("value"), "event_id"
        )
        .orderBy("user_id", "rank")
    )


def _two_file_stream_src(spark, sf_dir: str, cols, dup: bool = False) -> str:
    """Batch-write events columns as two parquet files (two
    microbatches — state must survive the boundary). value is
    FLOOR(value*100): an integer-valued double, so per-batch float
    accumulation is order-independent and exact against a SQL SUM.
    dup=True appends a duplicate copy of every row to each file (for
    the dedup gate)."""
    import tempfile

    src = f"{tempfile.mkdtemp(prefix='strawboat_stream_')}/events"
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.floor(F.col("value") * 100).cast("double").alias("value"),
    ).select(*cols)
    for name, flt in (("a", F.col("event_id") % 2 == 0), ("b", F.col("event_id") % 2 == 1)):
        part = e.filter(flt)
        if dup:
            part = part.unionAll(part)
        part.coalesce(1).write.parquet(f"{src}/{name}")
    return f"{src}/*"


def _drain(spark, stream_df, name: str, output_mode: str, n_rows: int | None = None):
    with _scoped_state_partitions(spark, n_rows):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(name)


@query(
    "stream_running_totals",
    revised=17,  # r17 rewrite not in the r17 driver sample (VERDICT r17 #7)
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(FLOOR(value * 100)), 2) AS total_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    description=(
        "applyInPandasWithState gate: running per-user count+total "
        "across 2 microbatches; drained final state equals the batch "
        "aggregate exactly (integer-valued doubles -> order-free sums)"
    ),
)
def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandasWithState stateful operator, driver-verified:
    GroupState carries (n, total) per user across the microbatch
    boundary; the final emission per user must equal the batch GROUP
    BY. value is floored to integer cents so per-batch accumulation
    order cannot move the hash."""
    import uuid

    from pyspark.sql import Window

    from strawboat_spark.streaming.pipelines import running_user_totals

    path = _two_file_stream_src(spark, sf_dir, ["user_id", "event_id", "value"])
    stream = (
        spark.readStream.schema("user_id long, event_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    got = _drain(
        spark,
        running_user_totals(stream),
        f"rt_{uuid.uuid4().hex[:8]}",
        "update",
        n_rows=_events_nrows(sf_dir),
    )
    w = Window.partitionBy("user_id")
    return (
        got.withColumn("__mx", F.max("n_events").over(w))
        .filter(F.col("n_events") == F.col("__mx"))
        .select("user_id", "n_events", F.round("total_value", 2).alias("total_value"))
        .orderBy("user_id")
    )


@query(
    "stream_dedup_watermark",
    revised=17,  # r17 rewrite not in the r17 driver sample (VERDICT r17 #7)
    oracle="""
    WITH d AS (SELECT DISTINCT event_id, event_type FROM events)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM d GROUP BY event_type ORDER BY event_type
    """,
    description=(
        "dropDuplicatesWithinWatermark gate: every row duplicated in "
        "BOTH microbatches; the drained stream equals DISTINCT exactly "
        "(full-retention watermark keeps all keys live)"
    ),
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: each file carries every row twice and
    batch 2 repeats keys from batch 1's horizon — state must both
    dedup within a batch and across the boundary. The 3650-day
    watermark keeps all keys retained so the result is exactly
    DISTINCT; the production trade-off (bounded state vs horizon) is
    the watermark parameter."""
    import uuid

    from strawboat_spark.streaming.pipelines import dedup_within_watermark

    path = _two_file_stream_src(
        spark, sf_dir, ["user_id", "event_id", "ts", "event_type"], dup=True
    )
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    deduped = dedup_within_watermark(stream, keys=["event_id"], watermark="3650 days")
    n = _events_nrows(sf_dir)
    got = _drain(
        spark, deduped, f"dw_{uuid.uuid4().hex[:8]}", "append",
        n_rows=2 * n if n else None,  # dup=True doubles every row
    )
    return (
        got.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query(
    "stream_stream_band_join",
    revised=17,  # r17 rewrite not in the r17 driver sample (VERDICT r17 #7)
    oracle="""
    SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM events e JOIN events c
      ON e.user_id = c.user_id
     AND c.ts BETWEEN e.ts AND e.ts + INTERVAL 1 HOUR
    GROUP BY e.user_id ORDER BY e.user_id
    """,
    description=(
        "stream-stream band join gate: two watermarked streams of the "
        "events table inner-join within a 1-hour band across 2 "
        "microbatches; pair counts equal the batch band self-join"
    ),
)
def stream_stream_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical scale pattern for stream joins: both sides
    watermarked, band condition bounds the join state. The
    full-retention watermark makes the drained result complete (equal
    to the batch band self-join) even though pairs straddle the
    microbatch boundary in both directions."""
    import uuid

    from strawboat_spark.streaming.pipelines import enrich_stream_stream_join

    path = _two_file_stream_src(
        spark, sf_dir, ["user_id", "event_id", "ts", "event_type"]
    )
    schema = "user_id long, event_id long, ts timestamp, event_type string"

    def rd():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(path)
        )

    joined = enrich_stream_stream_join(
        rd(), rd(), horizon="1 hour", watermark="3650 days"
    )
    got = _drain(
        spark, joined, f"ssj_{uuid.uuid4().hex[:8]}", "append",
        n_rows=_events_nrows(sf_dir),
    )
    return (
        got.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


@query(
    "strawboat_stream_source",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description=(
        "plain strawboat stream source gate (non-CDF): two appended "
        "generations drain through readStream and aggregate to the "
        "full source exactly"
    ),
)
def strawboat_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The format's file-tailing stream source: a table built by two
    appends drains with availableNow and must aggregate to the whole
    source — offsets tail committed files, so both generations' files
    arrive exactly once."""
    import tempfile
    import uuid

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_ss_')}/orders"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = Table(spark, path)
    t.overwrite(o.filter("o_orderkey % 2 = 0"))
    t.append(o.filter("o_orderkey % 2 = 1"))
    name = f"ss_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("strawboat")
        .load(path)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.table(name)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "strawboat_stream_rate_limit",
    revised=18,  # r18 one-job backlog rewrite — front for driver re-check
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           CAST(4 AS BIGINT) AS n_batches
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description=(
        "rate-limited stream source (maxFilesPerTrigger analog): a "
        "12-file backlog drains in exactly ceil(12/3)=4 capped "
        "micro-batches — the sink table's own history counts the "
        "stream-append commits — and the union equals the source "
        "exactly (no file skipped or doubled)"
    ),
)
def strawboat_stream_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datasource.py StrawboatStreamReaderImpl._capped_offset: the
    backfill knob — offsets advance oldest-first by at most
    max_files_per_trigger files (offset algebra unit-tested in
    tests/test_streaming.py::test_stream_rate_limit_caps_each_batch)."""
    import tempfile
    import uuid

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_rl_")
    src, sink = f"{root}/src", f"{root}/sink"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = Table(spark, src)
    # r18 opt (guide §1.2/§2): the rate limit is FILE-based — offsets
    # advance oldest-(mtime, path)-first over the bare file listing, so
    # the 12-file backlog does not need 12 generations.  One overwrite
    # of the round-robin 12-partition frame writes the same 12-file
    # backlog in ONE Spark job + ONE manifest publish where the old
    # shape paid 12 sequential jobs (each a full orders scan) + 12
    # commits; measured warm at sf0.1: backlog 7.0-13.3 -> 0.9-2.0 s,
    # whole gate 13.3 -> 6.9 s best-of-3 interleaved.  The drained
    # union (= all of orders) and n_batches = ceil(12/3) are unchanged
    # — oracle-verified (rows byte-identical in the A/B probe).
    t.overwrite(o.repartition(12))              # 12 files, one write job
    q = (
        spark.readStream.format("strawboat")
        .option("max_files_per_trigger", "3")
        .load(src)
        .writeStream.format("strawboat")
        .option("path", sink)
        .option("checkpointLocation", f"{root}/ckpt_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n_batches = sum(
        1 for g in Table(spark, sink).history() if g["operation"] == "stream-append"
    )
    return (
        Table(spark, sink)
        .read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .withColumn("n_batches", F.lit(n_batches).cast("long"))
        .orderBy("o_orderstatus")
    )


@query(
    "strawboat_cdf_update_images",
    oracle="""
    SELECT 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    UNION ALL
    SELECT 'update_preimage',
           CAST(COUNT(*) AS BIGINT),
           ROUND(SUM(o_totalprice), 2)
    FROM orders WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT 'update_postimage',
           CAST(COUNT(*) AS BIGINT),
           ROUND(SUM(o_totalprice + 1.0), 2)
    FROM orders WHERE o_orderkey % 5 = 0
    ORDER BY change_type
    """,
    description=(
        "CDF update images (Delta parity): a merge-on-read UPDATE "
        "generation streams its DV delta as update_preimage and its "
        "landed rows as update_postimage — row-exact on both sides, "
        "because MOR identifies precisely the changed rows"
    ),
)
def strawboat_cdf_update_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datasource.py StrawboatCDFStreamReaderImpl: generations whose
    manifest records operation 'update-mor' emit update_preimage /
    update_postimage instead of delete+insert (contract in
    tests/test_streaming.py CDF tests; fold parity in streaming/views.py)."""
    import tempfile
    import uuid

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_upi_')}/orders"
    t = Table(spark, path)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.overwrite(o)                                                   # gen 1
    t.update("o_orderkey % 5 = 0", {"o_totalprice": "o_totalprice + 1.0"}, mode="mor")
    name = f"upi_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("strawboat")
        .option("change_feed", "true")
        .option("starting_generation", "1")
        .load(path)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.table(name)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("change_type")
    )


@query(
    "strawboat_join_view",
    oracle="""
    WITH a AS (
        SELECT o_custkey AS k,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    a2 AS (SELECT * FROM a WHERE cents % 3 <> 0),
    b AS (
        SELECT c_custkey AS k, c_mktsegment AS seg
        FROM customer WHERE c_mktsegment <> 'BUILDING'
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_value
    FROM a2 JOIN b USING (k) GROUP BY seg ORDER BY seg
    """,
    description=(
        "incrementally maintained JOIN-aggregate view: seeded from half "
        "the facts, then fact appends + MOR delete + dim delete fold in "
        "via the delta identity A'⋈B' = A⋈B + ΔA⋈B + A'⋈ΔB — the view "
        "equals the full recompute exactly, at |Δ|-shuffle cost"
    ),
)
def strawboat_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming/views.py maintain_join_agg_view: net multiset deltas
    from Table.changes join the other side's pinned snapshot; horizons
    commit atomically with each fold (contract in
    tests/test_streaming.py::test_join_view_incremental_maintenance)."""
    import tempfile

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.streaming.views import maintain_join_agg_view
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_jv_")
    ap, bp, vp = f"{root}/facts", f"{root}/dims", f"{root}/view"
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg")
    )
    A, B = Table(spark, ap), Table(spark, bp)
    A.overwrite(o.filter("o_orderkey % 2 = 0").drop("o_orderkey"))
    B.overwrite(c)
    maintain_join_agg_view(spark, ap, bp, vp, ["k"], "seg", "cents")  # seed
    A.append(o.filter("o_orderkey % 2 = 1").drop("o_orderkey"))
    A.delete("cents % 3 = 0", mode="mor")
    B.delete("seg = 'BUILDING'")
    return maintain_join_agg_view(spark, ap, bp, vp, ["k"], "seg", "cents").orderBy(
        "seg"
    )


@query(
    "strawboat_cdf_rate_limit",
    oracle="""
    SELECT 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           CAST(3 AS BIGINT) AS n_data_batches
    FROM orders WHERE o_orderkey % 2 = 0
    """,
    description=(
        "generation-capped CDF stream (maxFilesPerTrigger twin): a "
        "6-generation backlog drains in exactly ceil(6/2)=3 data "
        "micro-batches and the feed equals the table exactly — "
        "bounded-memory CDF backfill"
    ),
)
def strawboat_cdf_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datasource.py StrawboatCDFStreamReaderImpl max_generations_per_trigger
    (offset algebra in tests/test_streaming.py::test_cdf_generation_rate_limit)."""
    import tempfile
    import uuid

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_crl_')}/orders"
    t = Table(spark, path)
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey % 2 = 0").select(
        "o_orderkey", "o_totalprice"
    )
    t.overwrite(o.filter("o_orderkey % 12 = 0"))
    for i in (2, 4, 6, 8, 10):
        t.append(o.filter(f"o_orderkey % 12 = {i}"))   # 6 generations
    name = f"crl_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("strawboat")
        .option("change_feed", "true")
        .option("starting_generation", "1")
        .option("max_generations_per_trigger", "2")
        .load(path)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    n_data = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    q.stop()
    return (
        spark.table(name)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .withColumn("n_data_batches", F.lit(n_data).cast("long"))
        .orderBy("change_type")
    )
