"""Time-series resampling: per-key regular grid with linear
interpolation (gap filling) — metrics/sensor pipelines' standard
preprocessing before windowed features.

Spark-first shape: the grid is generated per key with
sequence()+explode (JVM, no Python), unioned with the observations,
and a single window partition per key fills previous/next observation
via last/first with ignoreNulls over the two frame directions — ONE
shuffle on the key, no join, no driver loops. At 100 TB the partition
key is (key), the same key any downstream per-entity feature job
shuffles on, so the exchange is reusable.

Interpolation is computed on integer microseconds (exact) with one
final double division — deterministic and SQL-replayable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def resample_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    round_digits: int = 4,
) -> DataFrame:
    """Per-key regular grid from floor(min ts) to max ts at `step`,
    value linearly interpolated between the neighboring observations
    (exact at observation points; grid points outside the observed
    range carry the nearest observation — "hold" extrapolation).
    Output: (key, grid_ts, value)."""
    # integer microseconds (Spark's cast to long truncates to seconds;
    # unix_micros is exact)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))

    obs = df.select(
        F.col(key_col).alias("k"),
        us.alias("t"),
        F.col(value_col).cast("double").alias("v"),
    )
    bounds = obs.groupBy("k").agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
    # accept the few step units pipelines actually use
    import re

    m = re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", step.strip())
    if not m:
        raise ValueError(f"unsupported step {step!r} (use N second/minute/hour/day)")
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[m.group(2)]
    step_us = int(m.group(1)) * mult * 1_000_000

    grid = bounds.select(
        "k",
        F.explode(
            F.sequence(
                (F.floor(F.col("lo") / step_us) * step_us).cast("long"),
                F.col("hi"),
                F.lit(step_us),
            )
        ).alias("t"),
    ).withColumn("v", F.lit(None).cast("double"))

    unioned = obs.select("k", "t", "v", F.lit(1).alias("is_obs")).unionByName(
        grid.select("k", "t", "v", F.lit(0).alias("is_obs"))
    )
    # observations win ties with grid points at the same microsecond
    w_prev = (
        Window.partitionBy("k")
        .orderBy("t", F.desc("is_obs"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("k")
        .orderBy("t", F.desc("is_obs"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = (
        unioned.withColumn("pv", F.last("v", ignorenulls=True).over(w_prev))
        .withColumn("pt", F.last(F.when(F.col("v").isNotNull(), F.col("t")), True).over(w_prev))
        .withColumn("nv", F.first("v", ignorenulls=True).over(w_next))
        .withColumn("nt", F.first(F.when(F.col("v").isNotNull(), F.col("t")), True).over(w_next))
        .filter(F.col("is_obs") == 0)
    )
    interp = (
        F.when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("nt") == F.col("pt"), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((F.col("t") - F.col("pt")) / (F.col("nt") - F.col("pt")))
        )
    )
    # scale-0 quantization (cent convention): ROUND(x, n) is
    # engine-unstable when x's shortest repr lands on a half at digit
    # n+1 — and midpoint interpolation of fixed-decimal inputs
    # CONCENTRATES on such halves (the strawboat_merge_when r7 class).
    # Halves of x*10^n are exactly representable, so scale-0 rounding
    # agrees across engines.
    scale = float(10**round_digits)
    return filled.select(
        F.col("k").alias(key_col),
        F.timestamp_micros(F.col("t")).alias("grid_ts"),
        (F.round(interp * scale).cast("long") / scale).alias("value"),
    )


def ewma_last(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    round_digits: int = 4,
) -> DataFrame:
    """Exponentially weighted moving average per key — the recurrence
    y_i = alpha*x_i + (1-alpha)*y_(i-1) that window frames cannot
    express (every output depends on the entire prefix). Spark-first:
    ONE groupBy(key) collecting the (ts, value) series sorted by time,
    then a JVM F.aggregate fold — no Python, no per-row UDF calls, one
    shuffle on the same key downstream feature jobs use. Per-key
    series must fit an aggregation buffer (same contract as the funnel
    fold in queries/relational.py); beyond that, chunk by time range.

    Returns (key, n_points, ewma) with the fold's final value. The
    fold multiplies in a fixed written order (alpha*x + beta*y), so a
    SQL oracle replaying the same expression matches bit-for-bit."""
    beta = 1.0 - alpha
    series = (
        df.select(
            F.col(key_col).alias("k"),
            F.struct(
                F.col(ts_col).cast("timestamp").alias("t"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("tv"),
        )
        .groupBy("k")
        .agg(F.sort_array(F.collect_list("tv")).alias("s"))
    )
    fold = F.aggregate(
        F.expr("slice(s, 2, size(s) - 1)"),
        F.element_at(F.col("s"), 1)["v"],
        lambda acc, x: F.lit(alpha) * x["v"] + F.lit(beta) * acc,
    )
    # scale-0 quantization — same cross-engine ROUND rationale as
    # resample_linear above
    scale = float(10**round_digits)
    return series.select(
        F.col("k").alias(key_col),
        F.size("s").cast("long").alias("n_points"),
        (F.round(fold * scale).cast("long") / scale).alias("ewma"),
    )
