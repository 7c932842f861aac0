"""resample_linear unit tests: exact interpolation on a hand-built
series, hold extrapolation, observation-on-grid ties, single window
shuffle plan."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, ts timestamp, v double")


def test_linear_values_exact(spark):
    from strawboat_spark.operators.timeseries import resample_linear

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 10.0),                                # 00:30 -> 10
        (1, t0 + dt.timedelta(hours=2), 30.0),        # 02:30 -> 30
    ]
    out = resample_linear(_df(spark, rows), "k", "ts", "v", step="1 hour")
    got = {r["grid_ts"].strftime("%H:%M"): r["value"] for r in out.collect()}
    # grid 00:00..02:00; 00:00 holds the first obs, others interpolate
    assert got == {"00:00": 10.0, "01:00": 15.0, "02:00": 25.0}


def test_observation_exactly_on_grid_wins(spark):
    from strawboat_spark.operators.timeseries import resample_linear

    t0 = dt.datetime(2024, 1, 1, 1, 0)
    rows = [(1, t0, 7.0), (1, t0 + dt.timedelta(hours=1), 9.0)]
    out = resample_linear(_df(spark, rows), "k", "ts", "v", step="1 hour")
    got = {r["grid_ts"].strftime("%H:%M"): r["value"] for r in out.collect()}
    assert got == {"01:00": 7.0, "02:00": 9.0}


def test_single_observation_holds(spark):
    from strawboat_spark.operators.timeseries import resample_linear

    rows = [(1, dt.datetime(2024, 1, 1, 0, 20), 5.0)]
    out = resample_linear(_df(spark, rows), "k", "ts", "v", step="1 hour")
    got = [(r["grid_ts"].strftime("%H:%M"), r["value"]) for r in out.collect()]
    assert got == [("00:00", 5.0)]


def test_one_shuffle_no_join(spark):
    from strawboat_spark.operators.timeseries import resample_linear

    rows = [(1, dt.datetime(2024, 1, 1, 0, 20), 5.0),
            (2, dt.datetime(2024, 1, 1, 3, 0), 6.0)]
    plan = (
        resample_linear(_df(spark, rows), "k", "ts", "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # grid union + windows, never a join


def test_ewma_exact_fold(spark):
    from strawboat_spark.operators.timeseries import ewma_last

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 10.0),
        (1, dt.datetime(2024, 1, 1, 1, 0), 20.0),
        (1, dt.datetime(2024, 1, 1, 2, 0), 30.0),
        (2, dt.datetime(2024, 1, 1, 0, 0), 4.0),
    ]
    out = {r["k"]: (r["n_points"], r["ewma"])
           for r in ewma_last(_df(spark, rows), "k", "ts", "v", alpha=0.5).collect()}
    # user 1: y=10 -> .5*20+.5*10=15 -> .5*30+.5*15=22.5 ; user 2: single point
    assert out == {1: (3, 22.5), 2: (1, 4.0)}


def test_ewma_no_python_in_plan(spark):
    from strawboat_spark.operators.timeseries import ewma_last

    rows = [(1, dt.datetime(2024, 1, 1, 0, 0), 1.0)]
    plan = (
        ewma_last(_df(spark, rows), "k", "ts", "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan  # JVM fold, not a UDF


def test_scd2_history_runs_nulls_and_ties(spark):
    """SCD2 version table: runs of equal values collapse to one
    version, null runs are versions too (null-safe change detection),
    single observations yield one open version, same-timestamp rows
    order by the tiebreak, and intervals chain exactly."""
    import datetime as dt

    from strawboat_spark.operators.scd import scd2_history

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # key 1: A A B B A  -> versions A, B, A
        (1, ts(0), 0, "A"), (1, ts(1), 1, "A"), (1, ts(2), 2, "B"),
        (1, ts(3), 3, "B"), (1, ts(4), 4, "A"),
        # key 2: NULL NULL X NULL -> versions NULL, X, NULL
        (2, ts(0), 0, None), (2, ts(1), 1, None), (2, ts(2), 2, "X"),
        (2, ts(3), 3, None),
        # key 3: single observation -> one open version
        (3, ts(5), 0, "Z"),
        # key 4: same timestamp, tiebreak by event_id -> P then Q
        (4, ts(7), 1, "P"), (4, ts(7), 2, "Q"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = scd2_history(df, "user_id", "ts", "event_type", tiebreak_col="event_id")
    got = {
        (r.user_id, r.ver): (r.event_type, r.valid_from_us, r.valid_to_us, r.is_current)
        for r in out.collect()
    }
    us = lambda s: int(ts(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert got[(1, 1)] == ("A", us(0), us(2), False)
    assert got[(1, 2)] == ("B", us(2), us(4), False)
    assert got[(1, 3)] == ("A", us(4), None, True)
    assert got[(2, 1)] == (None, us(0), us(2), False)
    assert got[(2, 2)] == ("X", us(2), us(3), False)
    assert got[(2, 3)] == (None, us(3), None, True)
    assert got[(3, 1)] == ("Z", us(5), None, True)
    assert got[(4, 1)] == ("P", us(7), us(7), False)
    assert got[(4, 2)] == ("Q", us(7), None, True)
    assert len(got) == 9
