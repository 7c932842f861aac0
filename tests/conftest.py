from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


# S3 end-to-end (test_s3_datasource_e2e.py): the moto server's
# endpoint + dummy credentials must be in the environment BEFORE the
# JVM launches — Spark's Python workers inherit the JVM's env, so
# setting these later would leave executors pointing at real AWS.
# Harmless otherwise: only consulted for s3:// paths.
S3_TEST_ENDPOINT = "http://127.0.0.1:5543"
os.environ.setdefault("STRAWBOAT_S3_ENDPOINT", S3_TEST_ENDPOINT)
os.environ.setdefault("AWS_ACCESS_KEY_ID", "test")
os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "test")
os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")


@pytest.fixture(scope="session")
def spark():
    from strawboat_spark.session import get_spark

    s = get_spark("strawboat-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_CORRECT}/{name}.parquet'"
        )
    return con
