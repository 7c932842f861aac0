"""Structured Streaming tests: batch/stream parity of windowed aggs,
custom stateful op, and the strawboat stream sink. Streams run with
trigger(availableNow) over a parquet copy of the events table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from strawboat_spark.streaming.pipelines import (
    read_events_stream,
    running_user_totals,
    session_counts,
    tumbling_counts,
    write_strawboat_stream,
)
from strawboat_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events with micros ts (the nanos source can't stream-read),
    split into several files so availableNow does multiple batches."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_SMOKE, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def _run_to_memory(spark, df, name, output_mode="complete"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files=1)
    got = _run_to_memory(spark, tumbling_counts(stream), "t_tumble").collect()

    batch_events = spark.read.parquet(events_dir)
    want = (
        batch_events.groupBy("event_type", F.window("ts", "1 day").alias("w"))
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
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_session_stream_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files=2)
    got = _run_to_memory(spark, session_counts(stream), "t_sess").collect()
    batch_events = spark.read.parquet(events_dir)
    want = (
        batch_events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
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
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_stateful_running_totals(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files=2)
    got = _run_to_memory(spark, running_user_totals(stream), "t_state", output_mode="update")
    # update mode emits one row per user per batch; the LAST emission per
    # user must equal the batch totals.
    latest = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
        .collect()
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    )
    assert sorted(map(tuple, latest)) == sorted(map(tuple, batch))


def test_strawboat_stream_sink(spark, events_dir, tmp_path):
    from strawboat_spark.sources.datasource import register

    register(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, events_dir, max_files=2)
    q = write_strawboat_stream(stream, out, ckpt)
    q.awaitTermination(120)
    back = spark.read.format("strawboat").load(out)
    src = spark.read.parquet(events_dir)
    assert back.count() == src.count()
    a = back.agg(F.round(F.sum("value"), 2).alias("s")).collect()[0]["s"]
    b = src.agg(F.round(F.sum("value"), 2).alias("s")).collect()[0]["s"]
    assert a == b


def test_dedup_within_watermark(spark, events_dir, tmp_path):
    """Duplicated input stream → dropDuplicatesWithinWatermark restores
    exact-once per event_id."""
    from strawboat_spark.streaming.pipelines import EVENTS_DDL, dedup_within_watermark

    dup_dir = str(tmp_path / "dup_events")
    src = spark.read.parquet(events_dir)
    src.unionAll(src).repartition(4).write.mode("overwrite").parquet(dup_dir)

    stream = (
        spark.readStream.schema(EVENTS_DDL).option("maxFilesPerTrigger", 2).parquet(dup_dir)
    )
    got = _run_to_memory(
        spark, dedup_within_watermark(stream), "t_dedup", output_mode="append"
    )
    assert got.count() == src.count()
    assert got.select("event_id").distinct().count() == src.count()


def test_stream_stream_join(spark, events_dir):
    """Events joined to a second stream of the same events within a
    0-second band must match each row to itself (plus any same-user
    rows in the band) — checked against the equivalent batch join."""
    from strawboat_spark.streaming.pipelines import EVENTS_DDL, enrich_stream_stream_join

    left = spark.readStream.schema(EVENTS_DDL).parquet(events_dir)
    right = spark.readStream.schema(EVENTS_DDL).parquet(events_dir)
    joined = enrich_stream_stream_join(left, right, horizon="10 minutes")
    got = _run_to_memory(spark, joined, "t_ssjoin", output_mode="append").count()

    b = spark.read.parquet(events_dir)
    want = (
        b.alias("l")
        .join(
            b.select(
                F.col("user_id").alias("c_user_id"),
                F.col("ts").alias("c_ts"),
                F.col("event_type").alias("c_event_type"),
            ).alias("r"),
            F.expr("user_id = c_user_id AND c_ts BETWEEN ts AND ts + INTERVAL 10 minutes"),
        )
        .count()
    )
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """Rows older than the watermark horizon arriving in a later batch
    must be dropped from the windowed aggregation (late-data policy)."""
    import pandas as pd

    from strawboat_spark.streaming.pipelines import EVENTS_DDL, tumbling_counts

    d = str(tmp_path / "late_events")
    base = pd.Timestamp("2024-01-10 00:00:00")
    on_time = pd.DataFrame(
        {
            "event_id": range(10),
            "ts": [base + pd.Timedelta(hours=h) for h in range(10)],
            "user_id": [1] * 10,
            "event_type": ["click"] * 10,
            "value": [1.0] * 10,
            "props": ["{}"] * 10,
        }
    )
    # 10 days older than anything above — far beyond the 2-day watermark
    late = on_time.assign(
        event_id=range(100, 110), ts=[base - pd.Timedelta(days=10)] * 10
    )
    spark.createDataFrame(on_time, EVENTS_DDL).write.mode("overwrite").parquet(f"{d}/b0")
    spark.createDataFrame(late, EVENTS_DDL).write.mode("overwrite").parquet(f"{d}/b1")

    # file source lists b0 before b1 (lexicographic), one file per batch
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/b*")
    )
    got = _run_to_memory(
        spark, tumbling_counts(stream, window="1 day", watermark="2 days"),
        "t_late", output_mode="append",
    )
    starts = {r["window_start"] for r in got.collect()}
    # the late day never appears; the on-time day does once it closes
    assert "2023-12-31 00:00:00" not in starts


def test_strawboat_stream_source(spark, tmp_path):
    """The format as a readStream SOURCE: each new file becomes a
    micro-batch; restarting from the checkpoint picks up only files
    not yet seen (file-set offsets)."""
    from strawboat_spark.sources.datasource import register

    register(spark)
    src_dir = str(tmp_path / "src")
    out_ckpt = str(tmp_path / "ckpt")

    first = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    first.coalesce(2).write.format("strawboat").mode("overwrite").save(src_dir)

    out_dir = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.format("strawboat").load(src_dir)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", out_ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    assert run_once().count() == 100

    # add more data; same checkpoint → only the delta arrives
    more = spark.range(100, 150).select(F.col("id"), (F.col("id") * 2).alias("v"))
    more.coalesce(1).write.format("strawboat").mode("append").save(src_dir)
    got2 = run_once()
    assert got2.count() == 150, got2.count()
    assert {r["id"] for r in got2.collect()} == set(range(150))


def test_stream_offsets_compact(spark, tmp_path):
    """Offsets carry only files inside the lookback window (watermark
    aging), not every file ever seen — a long-running stream's offset
    stays bounded. Old files outside the window still load in the
    FIRST batch, and legacy `{"seen": [...]}` offsets keep working."""
    import os as _os

    from strawboat_spark.sources.datasource import StrawboatStreamReaderImpl, register

    register(spark)
    src = str(tmp_path / "src")
    spark.range(10).coalesce(1).write.format("strawboat").mode("overwrite").save(src)
    old = [f for f in _os.listdir(src) if f.endswith(".strb")]
    # Age the first file far past the lookback window.
    past = 1_000_000_000  # 2001-09-09, seconds
    _os.utime(f"{src}/{old[0]}", (past, past))
    spark.range(10, 20).coalesce(1).write.format("strawboat").mode("append").save(src)

    rdr = StrawboatStreamReaderImpl({"path": src, "max_file_age_sec": "900"}, None)
    end = rdr.latestOffset()
    # Compaction: only the fresh file is inside the window.
    assert len(end["recent"]) == 1
    assert old[0] not in end["recent"]
    # First batch still includes the pre-existing old file.
    first_batch = {p.file for p in rdr.partitions(rdr.initialOffset(), end)}
    assert {_os.path.basename(f) for f in first_batch} == {
        f for f in _os.listdir(src) if f.endswith(".strb")
    }
    # Steady state: batch = diff of recent lists, no re-list needed.
    spark.range(20, 30).coalesce(1).write.format("strawboat").mode("append").save(src)
    end2 = rdr.latestOffset()
    delta = rdr.partitions(end, end2)
    assert len(delta) == 1 and _os.path.basename(delta[0].file) not in (
        {_os.path.basename(f) for f in first_batch}
    )
    # Legacy full-list offsets from an old checkpoint still diff correctly.
    legacy_start = {"seen": sorted(_os.path.basename(f) for f in first_batch)}
    legacy_delta = rdr.partitions(legacy_start, {"seen": legacy_start["seen"] + [_os.path.basename(delta[0].file)]})
    assert [_os.path.basename(p.file) for p in legacy_delta] == [_os.path.basename(delta[0].file)]


def test_transform_with_state_topk(spark, events_dir):
    """transformWithStateInPandas top-k: after the stream drains, each
    user's final emission must equal the batch top-3 window (value
    desc, event_id asc). Needs google.protobuf (the transformWithState
    state protocol) — absent in this container, present on real
    clusters; applyInPandasWithState covers the stateful path here."""
    pytest.importorskip("google.protobuf")  # satisfied by the vendored stub
    from pyspark.sql import Window

    from strawboat_spark.streaming.pipelines import top_events_per_user

    # transformWithState needs a multi-column-family state store: the
    # default HDFSBacked provider rejects it, RocksDB (bundled with
    # Spark) supports it
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, events_dir, max_files=2)
        got = _run_to_memory(spark, top_events_per_user(stream, k=3), "t_twstate",
                             output_mode="update")
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    # driver-side final-emission pick (a self-join of the memory sink
    # with its own aggregate trips Spark's conflicting-reference check)
    rows = got.collect()
    max_seen: dict = {}
    for r in rows:
        max_seen[r.user_id] = max(max_seen.get(r.user_id, -1), r.n_seen)
    latest = [
        (r.user_id, r.rank, r.value, r.event_id)
        for r in rows
        if r.n_seen == max_seen[r.user_id]
    ]
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    batch = (
        spark.read.parquet(events_dir)
        .select("user_id", "value", "event_id", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 3)
        .select("user_id", "rank", "value", "event_id")
        .collect()
    )
    assert sorted(map(tuple, latest)) == sorted(map(tuple, batch))


def test_stream_change_feed_exact_for_mor(spark, tmp_path):
    """Streaming CDF: generation-tailing offsets, exact row-level
    inserts/deletes for append + MOR verbs, checkpoint-incremental
    across restarts, hive partition constants attached."""
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    t = Table(spark, path)
    t.overwrite(spark.range(10).select(F.col("id"), (F.col("id") * 10).alias("v")))
    t.delete("id % 4 = 1", mode="mor")

    sink = str(tmp_path / "sink")

    def run():
        q = (
            spark.readStream.format("strawboat")
            .option("change_feed", "true")
            .option("starting_generation", "1")
            .load(path)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    first = {
        (r._generation, r._change_type, r.id, r.v)
        for r in spark.read.parquet(sink).collect()
    }
    assert first == {(1, "insert", i, i * 10) for i in range(10)} | {
        (2, "delete", i, i * 10) for i in (1, 5, 9)
    }

    # new generations between runs stream INCREMENTALLY from the
    # checkpoint (no re-emission of generations 1-2)
    t.update("id = 2", {"v": "222"}, mode="mor")
    run()
    second = {
        (r._generation, r._change_type, r.id, r.v)
        for r in spark.read.parquet(sink).collect()
    }
    assert second - first == {
        (3, "update_preimage", 2, 20),
        (3, "update_postimage", 2, 222),
    }
    assert len(second) == len(first) + 2  # nothing re-emitted

    # hive layouts: partition constants ride the feed
    h = Table(spark, str(tmp_path / "h"))
    h.overwrite(
        spark.range(6).select(F.col("id"), (F.col("id") % 2).alias("p")),
        partition_by="p",
    )
    h.delete("p = 1 AND id = 3", mode="mor")
    q = (
        spark.readStream.format("strawboat")
        .option("change_feed", "true")
        .option("starting_generation", "1")
        .load(str(tmp_path / "h"))
        .writeStream.format("memory")
        .queryName("h_cdf")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    hr = {(r._generation, r._change_type, r.id, r.p) for r in spark.table("h_cdf").collect()}
    assert hr == {(1, "insert", i, i % 2) for i in range(6)} | {(2, "delete", 3, 1)}

    # batch reads reject the stream-only option with a clear error
    import pytest as _pytest

    with _pytest.raises(Exception, match="STREAM option"):
        spark.read.format("strawboat").option("change_feed", "true").load(path).collect()


def test_incremental_view_folds_only_new_generations(spark, tmp_path):
    """Two maintenance cycles over one checkpoint: cycle 2 must fold
    ONLY the generations committed after cycle 1 (CDF offsets are
    checkpointed) and still converge to the batch aggregate after
    append + MOR delete + MOR update."""
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.streaming.views import maintain_count_sum_view
    from strawboat_spark.table import Table

    register(spark)
    root = str(tmp_path)
    t = Table(spark, f"{root}/t")
    t.overwrite(
        spark.range(100).select(
            F.col("id"), (F.col("id") % 4).alias("g"), (F.col("id") * 1.0).alias("v")
        )
    )
    args = (spark, f"{root}/t", f"{root}/view", "g", "v")
    view1 = maintain_count_sum_view(*args, checkpoint=f"{root}/ckpt")
    got1 = {r["g"]: (r["n_rows"], r["sum_value"]) for r in view1.collect()}
    assert got1[0] == (25, sum(float(i) for i in range(0, 100, 4)))

    # more generations: append, MOR delete, MOR update
    t.append(spark.range(100, 120).select(
        F.col("id"), (F.col("id") % 4).alias("g"), (F.col("id") * 1.0).alias("v")))
    t.delete("id < 8", mode="mor")
    t.update("id >= 116", {"v": "v + 1000"}, mode="mor")

    view2 = maintain_count_sum_view(*args, checkpoint=f"{root}/ckpt")
    expect = {
        r["g"]: (r["n_rows"], r["sum_value"])
        for r in t.read()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_value"))
        .collect()
    }
    got2 = {r["g"]: (r["n_rows"], r["sum_value"]) for r in view2.collect()}
    assert got2 == expect
    # the view is itself a table with history: cycle 1's state is gen 1
    assert Table(spark, f"{root}/view").read(at_generation=1).count() == 4


def test_incremental_view_fold_is_idempotent_on_replay(spark, tmp_path):
    """foreachBatch is at-least-once: a crash after the view overwrite
    but before the checkpoint commit replays the batch.  The fold
    commits a {app, batch} txn marker atomically with the result, so a
    replayed batch id must be a no-op instead of double-applying its
    deltas — and a NEW batch id must still apply."""
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.streaming.views import _fold_batch
    from strawboat_spark.table import Table

    register(spark)
    root = str(tmp_path)
    view = Table(spark, f"{root}/view")

    batch = spark.range(8).select(
        (F.col("id") % 2).alias("g"),
        (F.col("id") * 1.0).alias("v"),
        F.lit("insert").alias("_change_type"),
    )
    args = (view, f"{root}/view", "g", "v", "incremental_view:ckptA")
    _fold_batch(*args, batch, 0)
    once = {r["g"]: (r["n_rows"], r["sum_value"]) for r in view.read().collect()}
    assert once == {0: (4, 0.0 + 2 + 4 + 6), 1: (4, 1.0 + 3 + 5 + 7)}
    gen_after_first = view.history()[-1]["generation"]

    # replay of the SAME batch id: no state change, no new generation
    _fold_batch(*args, batch, 0)
    assert {
        r["g"]: (r["n_rows"], r["sum_value"]) for r in view.read().collect()
    } == once
    assert view.history()[-1]["generation"] == gen_after_first
    assert view.properties()["txn"] == {"app": "incremental_view:ckptA", "batch": 0}

    # a NEW batch id applies its deltas
    batch2 = spark.range(2).select(
        F.lit(0).alias("g"), F.lit(100.0).alias("v"), F.lit("insert").alias("_change_type")
    )
    _fold_batch(*args, batch2, 1)
    got = {r["g"]: (r["n_rows"], r["sum_value"]) for r in view.read().collect()}
    assert got[0] == (6, 12.0 + 200.0)
    assert view.properties()["txn"]["batch"] == 1


def test_manifest_properties_survive_unrelated_commits(spark, tmp_path):
    """Table properties (the txn-horizon carrier) must be carried
    forward by every commit path — append, MOR delete, compaction-style
    generation flips — not silently dropped by the next writer."""
    import json

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = str(tmp_path)
    t = Table(spark, f"{root}/t")
    t.overwrite(
        spark.range(50).select(F.col("id"), (F.col("id") * 1.0).alias("v")),
        manifest_properties=json.dumps({"txn": {"app": "a", "batch": 7}, "owner": "x"}),
    )
    assert t.properties() == {"txn": {"app": "a", "batch": 7}, "owner": "x"}

    t.append(spark.range(50, 60).select(F.col("id"), (F.col("id") * 1.0).alias("v")))
    assert t.properties()["txn"]["batch"] == 7  # append carries forward

    t.delete("id < 5", mode="mor")
    assert t.properties()["owner"] == "x"  # _flip_generation carries forward

    # an overwrite WITHOUT explicit properties also carries forward
    t.overwrite(spark.range(3).select(F.col("id"), (F.col("id") * 1.0).alias("v")))
    assert t.properties()["txn"] == {"app": "a", "batch": 7}


def test_stream_rate_limit_caps_each_batch(tmp_path, spark):
    """max_files_per_trigger: offsets advance by at most K files,
    oldest mtime first; the union of all batches is exactly the file
    set, with no file emitted twice (driving the reader directly so
    the offset algebra — not the engine — is under test)."""
    import os as _os

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import StrawboatStreamReaderImpl
    from strawboat_spark.table import Table

    root = f"{tmp_path}/src"
    t = Table(spark, root)
    t.overwrite(spark.range(1).select(F.col("id")).coalesce(1))
    for i in range(1, 10):
        t.append(spark.range(i, i + 1).coalesce(1))
    # distinct mtimes so the oldest-first prefix order is deterministic
    files = sorted(
        f for f in _os.listdir(root) if f.endswith(".strb")
    )
    for i, f in enumerate(files):
        _os.utime(f"{root}/{f}", ns=(1_000_000_000 * (i + 1),) * 2)

    r = StrawboatStreamReaderImpl(
        {"path": root, "max_files_per_trigger": "4"}, spark.range(1).schema
    )
    off = r.initialOffset()
    seen, batch_sizes = [], []
    for _ in range(10):
        end = r.latestOffset()
        if end == off:
            break
        parts = r.partitions(off, end)
        batch_sizes.append(len(parts))
        seen.extend(p.file for p in parts)
        off = end
    assert batch_sizes == [4, 4, 2]
    assert len(seen) == len(set(seen)) == 10  # no file twice, none missed
    assert {_os.path.basename(f) for f in seen} == set(files)

    # restart path: a fresh reader instance rebuilds its window from
    # scratch — its cold capped offset may cover already-processed
    # files, but the batch filter emits none of them, the planner
    # re-seeds from the engine's (checkpointed) start offset, and the
    # stream then advances capped over only the genuinely new files
    for i in range(10, 16):
        t.append(spark.range(i, i + 1).coalesce(1))
    r2 = StrawboatStreamReaderImpl(
        {"path": root, "max_files_per_trigger": "4"}, spark.range(1).schema
    )
    end2 = r2.latestOffset()  # cold window: oldest (processed) files
    assert r2.partitions(off, end2) == []  # catch-up batch, no replays
    end3 = r2.latestOffset()  # re-seeded -> advances past checkpoint
    parts3 = [p.file for p in r2.partitions(end2, end3)]
    assert len(parts3) == 4 and not (set(parts3) & set(seen))
    end4 = r2.latestOffset()
    parts4 = [p.file for p in r2.partitions(end3, end4)]
    assert len(parts4) == 2 and not (set(parts4) & set(seen) & set(parts3))
    assert len(set(parts3) | set(parts4)) == 6  # all new files, once each


def test_stream_rate_limit_bytes_cap(tmp_path, spark):
    """max_bytes_per_trigger: the offset prefix shrinks to the byte
    budget (always >= 1 file so the stream advances); with a budget
    below any single file size, batches degrade to one file each."""
    import os as _os

    from strawboat_spark.sources.datasource import StrawboatStreamReaderImpl
    from strawboat_spark.table import Table

    root = f"{tmp_path}/src"
    t = Table(spark, root)
    t.overwrite(spark.range(1).coalesce(1))
    for i in range(1, 6):
        t.append(spark.range(i, i + 1).coalesce(1))
    files = sorted(f for f in _os.listdir(root) if f.endswith(".strb"))
    for i, f in enumerate(files):
        _os.utime(f"{root}/{f}", ns=(1_000_000_000 * (i + 1),) * 2)

    r = StrawboatStreamReaderImpl(
        {"path": root, "max_bytes_per_trigger": "1"}, spark.range(1).schema
    )
    off = r.initialOffset()
    sizes, seen = [], []
    for _ in range(10):
        end = r.latestOffset()
        if end == off:
            break
        parts = r.partitions(off, end)
        sizes.append(len(parts))
        seen.extend(p.file for p in parts)
        off = end
    assert sizes == [1] * 6          # 1-byte budget -> one file per batch
    assert len(set(seen)) == 6

    # a budget of two files' bytes -> two files per batch
    sz = _os.path.getsize(f"{root}/{files[0]}")
    r2 = StrawboatStreamReaderImpl(
        {"path": root, "max_bytes_per_trigger": str(2 * sz + 64)},
        spark.range(1).schema,
    )
    off2 = r2.initialOffset()
    end2 = r2.latestOffset()
    assert len(r2.partitions(off2, end2)) == 2


def test_join_view_incremental_maintenance(tmp_path, spark):
    """Join-aggregate view maintained by the delta identity
    A'⋈B' = A⋈B + ΔA⋈B + A'⋈ΔB: every refresh matches the full
    recompute through appends, MOR deletes, dim deletes, two-sided
    change batches and an update; a refresh at unchanged heads is an
    exact no-op (no new view generation)."""
    import pyspark.sql.functions as F

    from strawboat_spark.streaming.views import maintain_join_agg_view
    from strawboat_spark.table import Table

    ap, bp, vp = f"{tmp_path}/a", f"{tmp_path}/b", f"{tmp_path}/v"
    A, B = Table(spark, ap), Table(spark, bp)
    A.overwrite(
        spark.range(1000).select(
            (F.col("id") % 100).alias("k"), (F.col("id") * 3).alias("cents")
        )
    )
    B.overwrite(
        spark.range(100).select(
            F.col("id").alias("k"),
            F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("seg"),
        )
    )

    def refresh():
        return {
            tuple(r)
            for r in maintain_join_agg_view(
                spark, ap, bp, vp, ["k"], "seg", "cents"
            ).collect()
        }

    def want():
        return {
            tuple(r)
            for r in A.read()
            .join(B.read(), "k")
            .groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("cents").alias("sum_value"))
            .collect()
        }

    assert refresh() == want()  # seed
    A.append(
        spark.range(1000, 1500).select(
            (F.col("id") % 100).alias("k"), (F.col("id") * 3).alias("cents")
        )
    )
    A.delete("cents % 7 = 0", mode="mor")
    assert refresh() == want()  # fact-side delta
    B.delete("seg = 's3'")
    assert refresh() == want()  # dim-side delta
    A.append(
        spark.range(1500, 1600).select(
            (F.col("id") % 100).alias("k"), (F.col("id") * 3).alias("cents")
        )
    )
    B.update("k = 5", {"seg": "'s9'"}, mode="mor")
    assert refresh() == want()  # both sides in one refresh

    V = Table(spark, vp)
    gen = V.history()[-1]["generation"]
    assert refresh() == want()  # heads unchanged
    assert V.history()[-1]["generation"] == gen  # exact no-op, no commit


def test_cdf_generation_rate_limit(tmp_path, spark):
    """max_generations_per_trigger on the CDF stream: a 6-generation
    backlog drains in ceil(6/2)=3 capped micro-batches with exactly
    the full feed emitted once."""
    import uuid

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    path = str(tmp_path / "t")
    t = Table(spark, path)
    t.overwrite(spark.range(10).select("id"))
    for i in range(1, 6):
        t.append(spark.range(10 * i, 10 * i + 10).select("id"))

    name = f"cdfrl_{uuid.uuid4().hex[:8]}"
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
    n_batches = len(q.recentProgress)
    q.stop()
    got = spark.table(name)
    assert got.count() == 60  # whole feed, exactly once
    assert got.filter("_change_type = 'insert'").count() == 60
    assert got.select("_generation").distinct().count() == 6
    # 3 data batches (plus possibly one trailing empty batch)
    data_batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    assert data_batches == 3


def test_maintain_dedup_index_streaming_exactly_once(spark, tmp_path):
    """Streamed corpus dedup: new documents flow from a strawboat table
    through foreachBatch into the incremental Jaccard index; candidate
    pairs accumulate in a pairs table; a REPLAYED batch (same batch_id)
    is a no-op on both tables (per-table txn markers)."""
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.streaming.pipelines import maintain_dedup_index
    from strawboat_spark.table import Table

    register(spark)
    docs_p = str(tmp_path / "docs")
    index_p = str(tmp_path / "idx")
    pairs_p = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    docs = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "one two three four five six"),
    ]
    Table(spark, docs_p).overwrite(
        spark.createDataFrame(docs, "doc_id long, text string")
    )
    # seed the (empty) index + pairs tables
    from strawboat_spark.operators.dedup import jaccard_index_init

    jaccard_index_init(
        spark, index_p, spark.createDataFrame([], "doc_id long, text string"),
        "text", "doc_id",
    )
    Table(spark, pairs_p).overwrite(
        spark.createDataFrame([], "id_a long, id_b long, jaccard double, batch_id long")
    )

    out1 = maintain_dedup_index(
        spark, docs_p, index_p, pairs_p, "text", "doc_id", ckpt, threshold=0.3
    )
    assert out1.count() == 0  # nothing similar in the seed batch
    assert Table(spark, index_p).read().select("doc_id").distinct().count() == 2

    # a second corpus batch containing a near-dup of doc 0
    more = [
        (2, "alpha beta gamma delta zeta"),
        (3, "completely unrelated words here"),
    ]
    Table(spark, docs_p).append(spark.createDataFrame(more, "doc_id long, text string"))
    out2 = maintain_dedup_index(
        spark, docs_p, index_p, pairs_p, "text", "doc_id", ckpt, threshold=0.3
    )
    got = {(r.id_a, r.id_b) for r in out2.collect()}
    assert got == {(0, 2)}
    assert Table(spark, index_p).read().select("doc_id").distinct().count() == 4

    # replay: re-running the SAME checkpoint with no new docs is a
    # no-op — no duplicate pairs, no duplicate postings, no new
    # generations beyond the stream's own bookkeeping
    gens_idx = len(Table(spark, index_p).history())
    gens_pairs = len(Table(spark, pairs_p).history())
    out3 = maintain_dedup_index(
        spark, docs_p, index_p, pairs_p, "text", "doc_id", ckpt, threshold=0.3
    )
    assert {(r.id_a, r.id_b) for r in out3.collect()} == {(0, 2)}
    assert Table(spark, index_p).read().count() == Table(spark, index_p).read().dropDuplicates(["doc_id", "shingle"]).count()
    assert len(Table(spark, index_p).history()) == gens_idx
    assert len(Table(spark, pairs_p).history()) == gens_pairs


def test_scoped_state_partitions_derivation_and_restore(spark, monkeypatch):
    """r17 opt: fresh-checkpoint streaming drains size their state
    partitions to data volume. The scope must (a) derive
    ceil(n/rows_per_part) clamped to [4, session setting], (b) be a
    no-op at/above the session setting and when disabled or unsized,
    and (c) restore the session conf on exit, exceptions included."""
    from strawboat_spark.queries.streaming_q import _scoped_state_partitions

    key = "spark.sql.shuffle.partitions"
    base = spark.conf.get(key)
    try:
        spark.conf.set(key, "32")
        monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_ROWS_PER_PART", "12500")
        with _scoped_state_partitions(spark, 100_000):
            assert spark.conf.get(key) == "8"  # ceil(100k/12.5k)
        assert spark.conf.get(key) == "32"
        with _scoped_state_partitions(spark, 10):
            assert spark.conf.get(key) == "4"  # floor
        assert spark.conf.get(key) == "32"
        # at scale the derived count exceeds the session setting -> no-op
        with _scoped_state_partitions(spark, 10**9):
            assert spark.conf.get(key) == "32"
        # unsized input and env-disabled -> no-op
        with _scoped_state_partitions(spark, None):
            assert spark.conf.get(key) == "32"
        monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_ROWS_PER_PART", "0")
        with _scoped_state_partitions(spark, 100_000):
            assert spark.conf.get(key) == "32"
        monkeypatch.delenv("SPARK_GRAFT_STREAM_STATE_ROWS_PER_PART")
        # restore must survive an exception inside the scope
        try:
            with _scoped_state_partitions(spark, 100_000):
                assert spark.conf.get(key) == "8"
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert spark.conf.get(key) == "32"
    finally:
        spark.conf.set(key, base)
