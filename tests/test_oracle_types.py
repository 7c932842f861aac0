"""Oracle result-type hygiene.

The driver hashes RAW values, so an oracle column that DuckDB types as
HUGEINT (its SUM(BIGINT) promotion) fetches as Decimal and hash-fails
against a value-identical Spark BIGINT column.  Repo convention: every
integer aggregate in an oracle is CAST(... AS BIGINT).  These tests
make that convention enforceable locally so no driver round is spent
discovering a typing bug (r6: graph_pagerank).
"""

from __future__ import annotations

import pytest

from strawboat_spark.queries import all_queries
from tests.compare import compare_frames, type_mismatches


def test_no_oracle_column_is_hugeint(duck):
    """Plan-only sweep of every registered oracle: no HUGEINT/UHUGEINT
    result columns (they fetch as Decimal and break the driver hash)."""
    offenders = {}
    for name, q in sorted(all_queries().items()):
        if q.oracle is None:
            continue
        rel = duck.sql(q.oracle)
        bad = [
            (c[0], str(t))
            for c, t in zip(rel.description, rel.types)
            if str(t).upper() in ("HUGEINT", "UHUGEINT")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"un-CAST integer aggregates in oracles: {offenders}"


def test_uncast_sum_oracle_fails_locally(spark, duck):
    """A deliberately un-CAST SUM (HUGEINT) vs a Spark BIGINT must be
    flagged even though the values are identical — the exact gap that
    let the r6 graph_pagerank oracle ship."""
    sdf = spark.createDataFrame([(3,)], "x bigint")
    rel = duck.sql("SELECT SUM(v) AS x FROM (VALUES (1::BIGINT), (2::BIGINT)) t(v)")
    assert str(rel.types[0]).upper() == "HUGEINT"  # DuckDB promotion, sanity
    problems = compare_frames(sdf, rel)
    assert any("raw-value hash" in p for p in problems), problems
    # and the dedicated checker names the column
    rel2 = duck.sql("SELECT SUM(v) AS x FROM (VALUES (1::BIGINT), (2::BIGINT)) t(v)")
    assert type_mismatches(sdf, rel2)


def test_cent_drift_at_1e9_fails_locally(spark, duck):
    """r7 post-mortem: %.9g normalization equated values a CENT apart
    at 1e9 magnitude, so the strawboat_merge_when half-cent drift
    passed locally while the driver's raw-value hash failed.  A
    deliberately injected ROUND(x/2, 2)-style drift must now fail."""
    sdf = spark.createDataFrame([(1223725771.54,)], "total double")
    rel = duck.sql("SELECT 1223725771.44::DOUBLE AS total")
    problems = compare_frames(sdf, rel)
    assert any("values differ" in p for p in problems), (
        "cent-level drift at 1e9 magnitude must fail the local compare"
    )


def test_ulp_noise_still_passes(spark, duck):
    """The hardened normalization must still collapse representation
    noise: 0.1 + 0.2 vs 0.3 are the same value for our purposes."""
    sdf = spark.createDataFrame([(0.1 + 0.2,)], "x double")
    rel = duck.sql("SELECT 0.3::DOUBLE AS x")
    assert compare_frames(sdf, rel) == []


def test_cast_sum_oracle_passes(spark, duck):
    sdf = spark.createDataFrame([(3,)], "x bigint")
    rel = duck.sql(
        "SELECT CAST(SUM(v) AS BIGINT) AS x FROM (VALUES (1::BIGINT), (2::BIGINT)) t(v)"
    )
    assert compare_frames(sdf, rel) == []
