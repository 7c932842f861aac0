"""SparkSession factory tuned for this engine.

Local testing runs on local[N] (single JVM); the conf below is written
for the 1000-executor / 100 TB posture and degrades gracefully to
local mode:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) — at 100 TB static shuffle-partition counts are
  always wrong, AQE re-plans from map-output sizes.
- shuffle partitions default to the local core count; on a real
  cluster this is overridden to ~2-3x total cores and AQE coalesces.
- Arrow-optimized Python<->JVM transfer for the pandas/Arrow UDF paths
  (the format layer and the vector ops ride on this).
- broadcast threshold left at default 10MB; dimension tables in the
  TPC-H-ish schema (region/nation/supplier/customer/part) are all
  broadcastable at any realistic SF — queries also hint explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _default_driver_mem() -> str:
    """min(24g, ~60% of physical RAM), floor 2g: big enough that a
    32-thread local session doesn't GC-thrash (the r9 adjudication),
    small enough that hosts with less RAM than the dev box still
    launch instead of failing at JVM start / getting OOM-killed."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gb = int(line.split()[1]) / (1024 * 1024)
                    break
            else:
                return "24g"
    except OSError:
        return "24g"
    return f"{max(2, min(24, int(total_gb * 0.6)))}g"


def get_spark(app_name: str = "strawboat-spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    # transformWithStateInPandas needs a protobuf runtime in every
    # Python worker; vendor the minimal stub when none is installed.
    # Must run BEFORE the JVM launches so workers inherit PYTHONPATH.
    from strawboat_spark.streaming.protostub import install as _install_protostub

    _install_protostub()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: the driver JVM IS the executor; 32 threads on an
        # 8g heap GC-thrash under multi-query sessions (adjudicated r9:
        # the minhash bench regression tracked heap pressure + codegen
        # cache eviction, not a plan change — plans fingerprint-equal).
        # Clamped to ~60% of physical RAM so smaller hosts still launch
        # (a fixed 24g default would OOM-kill an 8 GB laptop's JVM);
        # SPARK_GRAFT_DRIVER_MEM stays the explicit override.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM") or _default_driver_mem(),
        )
        # Default compiled-class cache is 100 entries; a multi-query
        # session (19 headline queries x several codegen stages each)
        # evicts and recompiles hot stages every pass.  A long-lived
        # cluster session wants the same headroom.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.sql.autoBroadcastJoinThreshold", "10485760")
        # r17 (guide §3.1/§9): let the planner pick a shuffled-hash join
        # when one side's per-partition build fits instead of always
        # sorting both sides — at 100 TB the mid-size joins that are too
        # big to broadcast but small enough to hash per partition skip
        # two full sorts.  The AQE analog converts a planned sort-merge
        # to shuffled-hash at runtime when every post-shuffle partition
        # is under the threshold (default 0 = off; set to the advisory
        # partition size so the build side is bounded by exactly the
        # partition sizing AQE already targets).  Both are env-
        # overridable for clusters where the build-side OOM margin is
        # tighter; local bench effect is neutral (AQE broadcasts the
        # small sides at bench SFs either way) — this is a scale
        # posture, not a local tune.  Bucketed co-located joins keep
        # their sort-merge (no local map without a shuffle).
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP_THRESHOLD", "64m"),
        )
        # guide §6: zstd for any parquet the engine writes (smaller than
        # snappy at similar read speed; read side is codec-agnostic)
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
