"""Bucketed (pre-shuffled) table layout for co-located joins.

The 100 TB problem this solves: a fact-fact equi-join (orders ⋈
lineitem on orderkey) shuffles BOTH sides every time it runs. If the
tables are written bucketed by the join key into the same number of
buckets, every future join/aggregation on that key is co-located —
Spark plans a SortMergeJoin with NO Exchange on either side, because
the bucket layout IS the hash partitioning, persisted. One shuffle
paid at write time amortizes over every subsequent query.

This is Spark-native bucketing (`DataFrameWriter.bucketBy` +
`saveAsTable`): the bucket spec lives in the catalog, files are
parquet. `sortBy` the same key so the SMJ's per-bucket sort is also
pre-paid (Spark still sorts unless bucket file counts line up, but
the data being clustered makes it near-free).

Scale notes:
- n_buckets is a layout-time choice: at 100 TB pick buckets so one
  bucket ≈ one task's worth (e.g. 2048); both join sides MUST use the
  same count for co-location.
- Writing requires one shuffle (`repartition(n, key)`) so each task
  produces ONE file per bucket instead of every task writing a sliver
  of every bucket (tasks × buckets small files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed catalog table (overwrite semantics)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # Align task partitioning with the bucket function so each task
    # holds whole buckets -> one file per bucket, not tasks*buckets.
    w = df.repartition(n_buckets, F.col(bucket_col)).write.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.mode("overwrite").format("parquet").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table; the catalog carries the bucket spec, so
    joins/aggs on the bucket key skip their Exchange."""
    return spark.table(table_name)
