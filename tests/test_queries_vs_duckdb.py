"""Every registered query with an oracle must match DuckDB at sf0.01 —
the same check the driver's correctness gate runs.
"""

from __future__ import annotations

import pytest

from strawboat_spark.queries import all_queries
from tests.compare import compare_frames
from tests.conftest import SF_CORRECT

_QUERIES = None


def _queries():
    global _QUERIES
    if _QUERIES is None:
        _QUERIES = all_queries()
    return _QUERIES


def pytest_generate_tests(metafunc):
    if "query_name" in metafunc.fixturenames:
        metafunc.parametrize("query_name", sorted(_queries().keys()))


def test_query_matches_oracle(spark, duck, query_name):
    q = _queries()[query_name]
    df = q.fn(spark, SF_CORRECT)
    if q.oracle is None:
        # rows-only check, like the driver's weak path
        n = df.count()
        assert n >= 0
        return
    problems = compare_frames(df, duck.sql(q.oracle))
    assert not problems, f"{query_name}: {problems}"
