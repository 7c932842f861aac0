"""SQL DML front-end (strawboat_spark/sql.py): each statement is a
thin parse -> Table method dispatch; these tests pin the parse and the
end-to-end semantics against the Python API they wrap."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from strawboat_spark.sql import execute_sql
from strawboat_spark.table import Table


def _tbl(spark, tmp_path, name="t", n=20):
    path = str(tmp_path / name)
    t = Table(spark, path)
    t.overwrite(
        spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("g"),
            (F.col("id") * 10).alias("v"),
        )
    )
    return t, path


def test_sql_update_delete_cow_and_mor(spark, tmp_path):
    t, path = _tbl(spark, tmp_path)
    res = execute_sql(spark, f"UPDATE strawboat.`{path}` SET v = v + 1 WHERE g = 2")
    assert res["rows_updated"] == 4
    res = execute_sql(
        spark, f"DELETE FROM strawboat.`{path}` WHERE g = 0 WITH (mode = 'mor')"
    )
    assert res["rows_deleted"] == 4
    got = {(r.k, r.v) for r in t.read().collect()}
    want = {(i, i * 10 + (1 if i % 5 == 2 else 0)) for i in range(20) if i % 5 != 0}
    assert got == want
    # the MOR delete landed as sidecar refs, not a rewrite
    from strawboat_spark.sources.datasource import read_manifest

    assert any(e.get("deletes_refs") for e in read_manifest(path)["entries"])


def test_sql_merge_full_clause_surface(spark, tmp_path):
    t, path = _tbl(spark, tmp_path)
    src = spark.range(15, 25).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        F.lit(7).alias("v"),
        (F.col("id") % 3).alias("delta"),
    )
    src.createOrReplaceTempView("sqlmerge_src")
    res = execute_sql(
        spark,
        f"""
        MERGE INTO strawboat.`{path}` AS t
        USING sqlmerge_src AS s
        ON t.k = s.k
        WHEN MATCHED AND s.delta = 0 THEN DELETE
        WHEN MATCHED AND s.delta = 1 THEN UPDATE SET v = t.v + s.delta * 100
        WHEN NOT MATCHED AND s.g >= 2 THEN INSERT *
        """,
    )
    assert res["rows_deleted"] > 0 and res["rows_updated"] > 0 and res["rows_inserted"] > 0
    got = {(r.k, r.v) for r in t.read().collect()}
    want = {}
    for i in range(20):
        want[i] = i * 10
    for i in range(15, 25):
        d = i % 3
        if i < 20:  # matched
            if d == 0:
                want.pop(i)
            elif d == 1:
                want[i] = i * 10 + 100
        elif i % 5 >= 2:  # unmatched + insert condition
            want[i] = 7
    assert got == {(k, v) for k, v in want.items()}


def test_sql_merge_subquery_source_and_insert_column_list(spark, tmp_path):
    t, path = _tbl(spark, tmp_path, n=5)
    execute_sql(
        spark,
        f"""
        MERGE INTO strawboat.`{path}` t
        USING (SELECT id + 100 AS k, CAST(1 AS bigint) AS g,
                      CAST(5 AS bigint) AS v FROM range(3)) s
        ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT (k, g, v) VALUES (s.k, s.g, s.v)
        """,
    )
    assert t.read().count() == 8
    assert t.read().filter("k >= 100").count() == 3


def test_sql_merge_rejects_out_of_subset(spark, tmp_path):
    t, path = _tbl(spark, tmp_path, n=5)
    spark.range(3).select(F.col("id").alias("k")).createOrReplaceTempView("s_v")
    with pytest.raises(ValueError, match="equality conjunctions"):
        execute_sql(
            spark,
            f"MERGE INTO strawboat.`{path}` t USING s_v s ON t.k > s.k "
            f"WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="INSERT"):
        execute_sql(
            spark,
            f"MERGE INTO strawboat.`{path}` t USING s_v s ON t.k = s.k "
            f"WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k + 1)",
        )
    with pytest.raises(ValueError, match="source columns only"):
        execute_sql(
            spark,
            f"MERGE INTO strawboat.`{path}` t USING s_v s ON t.k = s.k "
            f"WHEN NOT MATCHED AND t.v > 0 THEN INSERT *",
        )


def test_sql_restore_optimize_vacuum_describe(spark, tmp_path):
    t, path = _tbl(spark, tmp_path)
    execute_sql(spark, f"DELETE FROM strawboat.`{path}` WHERE k < 10")
    assert t.read().count() == 10
    execute_sql(spark, f"RESTORE TABLE strawboat.`{path}` TO VERSION AS OF 1")
    assert t.read().count() == 20
    t.tag("v1")
    execute_sql(spark, f"DELETE FROM strawboat.`{path}` WHERE k < 5")
    execute_sql(spark, f"RESTORE TABLE strawboat.`{path}` TO TAG 'v1'")
    assert t.read().count() == 20

    res = execute_sql(spark, f"OPTIMIZE strawboat.`{path}`")
    assert isinstance(res, dict)
    dry = execute_sql(spark, f"VACUUM strawboat.`{path}` RETAIN 0 HOURS DRY RUN")
    assert "planned" in dry
    h = execute_sql(spark, f"DESCRIBE HISTORY strawboat.`{path}`")
    ops = [r.operation for r in h.collect()]
    assert "restore" in ops
    d = execute_sql(spark, f"DESCRIBE DETAIL strawboat.`{path}`")
    assert d.collect()[0].n_rows == 20


def test_sql_alter_table_verbs(spark, tmp_path):
    t, path = _tbl(spark, tmp_path, n=4)
    execute_sql(spark, f"ALTER TABLE strawboat.`{path}` ADD COLUMN w int DEFAULT 9")
    assert t.read().select("w").distinct().collect()[0][0] == 9
    execute_sql(spark, f"ALTER TABLE strawboat.`{path}` RENAME COLUMN w TO w2")
    assert "w2" in t.read().columns and "w" not in t.read().columns
    execute_sql(spark, f"ALTER TABLE strawboat.`{path}` ALTER COLUMN w2 TYPE bigint")
    assert dict(t.read().dtypes)["w2"] == "bigint"
    execute_sql(spark, f"ALTER TABLE strawboat.`{path}` DROP COLUMN w2")
    assert "w2" not in t.read().columns


def test_sql_set_partitioned_by(spark, tmp_path):
    t, path = _tbl(spark, tmp_path, n=4)
    execute_sql(spark, f"ALTER TABLE strawboat.`{path}` SET PARTITIONED BY (k)")
    t.append(spark.createDataFrame([(100, 0, 1), (101, 1, 2)], t.read().schema))
    import glob
    import os

    dirs = {
        os.path.basename(os.path.dirname(f))
        for f in glob.glob(f"{path}/**/*.strb", recursive=True)
    }
    assert {"k=100", "k=101"} <= dirs
    execute_sql(spark, f"ALTER TABLE strawboat.`{path}` SET PARTITIONED BY ()")
    t.append(spark.createDataFrame([(102, 2, 3)], t.read().schema))
    assert t.count_rows() == 7


def test_sql_select_falls_through(spark):
    assert execute_sql(spark, "SELECT 1 AS x").collect()[0].x == 1


def test_sql_update_string_literals_survive_rewrite(spark, tmp_path):
    t, path = _tbl(spark, tmp_path, n=6)
    src = spark.range(3).select(
        F.col("id").alias("k"), F.lit(0).alias("g"), F.lit(0).alias("v")
    )
    src.createOrReplaceTempView("lit_src")
    # 's.k' inside the string literal must NOT be rewritten to src_k
    execute_sql(
        spark,
        f"MERGE INTO strawboat.`{path}` t USING lit_src s ON t.k = s.k "
        f"WHEN MATCHED THEN UPDATE SET v = length('s.k literal') + s.v",
    )
    assert t.read().filter("k < 3").select("v").distinct().collect()[0][0] == 11


def test_sql_insert_into_and_overwrite(spark, tmp_path):
    t, path = _tbl(spark, tmp_path, n=5)
    res = execute_sql(
        spark,
        f"INSERT INTO strawboat.`{path}` "
        f"SELECT id + 100 AS k, CAST(9 AS bigint) AS g, id AS v FROM range(3)",
    )
    assert res == {"rows_inserted": 3}
    assert t.read().count() == 8
    # column-list form reorders by NAME
    execute_sql(
        spark,
        f"INSERT INTO strawboat.`{path}` (g, k, v) "
        f"SELECT CAST(1 AS bigint), id + 200, CAST(0 AS bigint) FROM range(2)",
    )
    assert t.read().filter("k >= 200 AND g = 1").count() == 2
    # VALUES form
    execute_sql(
        spark,
        f"INSERT INTO strawboat.`{path}` (k, g, v) "
        f"VALUES (CAST(300 AS bigint), CAST(2 AS bigint), CAST(5 AS bigint))",
    )
    assert t.read().filter("k = 300").count() == 1
    # OVERWRITE replaces the snapshot (history intact)
    execute_sql(
        spark,
        f"INSERT OVERWRITE strawboat.`{path}` "
        f"SELECT id AS k, id AS g, id AS v FROM range(4)",
    )
    assert t.read().count() == 4
    assert len(t.history()) >= 4


def test_sql_create_table_as_select(spark, tmp_path):
    p = str(tmp_path / "ctas")
    res = execute_sql(
        spark,
        f"CREATE TABLE strawboat.`{p}` AS SELECT id AS k, id % 3 AS g FROM range(9)",
    )
    assert res == {"rows_inserted": 9}
    t = Table(spark, p)
    assert t.read().count() == 9
    # plain CREATE refuses an existing table
    with pytest.raises(ValueError, match="already exists"):
        execute_sql(spark, f"CREATE TABLE strawboat.`{p}` AS SELECT 1 AS k, 1 AS g")
    # OR REPLACE overwrites, history intact
    execute_sql(
        spark,
        f"CREATE OR REPLACE TABLE strawboat.`{p}` AS SELECT id AS k, id AS g FROM range(4)",
    )
    assert t.read().count() == 4
    assert len(t.history()) == 2

    # partitioned CTAS with a hidden time transform
    p2 = str(tmp_path / "ctas_part")
    execute_sql(
        spark,
        f"CREATE TABLE strawboat.`{p2}` PARTITIONED BY (g, days(ts)) AS "
        f"SELECT CAST(id % 2 AS STRING) AS g, "
        f"TIMESTAMP '2024-01-01' + make_interval(0, 0, 0, CAST(id AS INT)) AS ts, "
        f"id AS v FROM range(6)",
    )
    t2 = Table(spark, p2)
    assert t2.read().count() == 6
    assert t2.read().filter("ts >= '2024-01-04'").count() == 3


def test_sql_strip_is_string_aware(spark, tmp_path):
    """'--' and whitespace runs inside string literals are payload;
    comments outside them are stripped."""
    path = str(tmp_path / "t")
    t = Table(spark, path)
    t.overwrite(
        spark.createDataFrame(
            [(1, "a--b"), (2, "x  y"), (3, "z")], "k long, s string"
        )
    )
    res = execute_sql(
        spark,
        f"""
        -- a comment line
        DELETE FROM strawboat.`{path}`
        WHERE s = 'a--b'  -- trailing comment
        """,
    )
    assert res["rows_deleted"] == 1
    res = execute_sql(spark, f"DELETE FROM strawboat.`{path}` WHERE s = 'x  y'")
    assert res["rows_deleted"] == 1
    assert [r.s for r in t.read().collect()] == ["z"]


def test_sql_script_multi_statement(spark, tmp_path):
    from strawboat_spark.sql import execute_sql_script

    p = str(tmp_path / "s")
    results = execute_sql_script(
        spark,
        f"""
        CREATE TABLE strawboat.`{p}` AS SELECT id AS k, id * 2 AS v FROM range(6);
        UPDATE strawboat.`{p}` SET v = v + 1 WHERE k = 0;   -- comment
        DELETE FROM strawboat.`{p}` WHERE k = 5;
        INSERT INTO strawboat.`{p}` VALUES (CAST(100 AS bigint), CAST(0 AS bigint));
        """,
    )
    assert len(results) == 4
    t = Table(spark, p)
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {(0, 1), (1, 2), (2, 4), (3, 6), (4, 8), (100, 0)}
    # ';' inside a literal is payload, not a separator
    t.overwrite(spark.createDataFrame([(1, "a;b"), (2, "c")], "k long, s string"))
    res = execute_sql_script(spark, f"DELETE FROM strawboat.`{p}` WHERE s = 'a;b'")
    assert res[0]["rows_deleted"] == 1


def test_sql_constraints_and_tblproperties(spark, tmp_path):
    t, path = _tbl(spark, tmp_path, n=4)
    execute_sql(
        spark, f"ALTER TABLE strawboat.`{path}` ADD CONSTRAINT pos CHECK (v >= 0)"
    )
    with pytest.raises(ValueError, match="pos"):
        execute_sql(
            spark,
            f"INSERT INTO strawboat.`{path}` "
            f"VALUES (CAST(99 AS bigint), CAST(0 AS bigint), CAST(-1 AS bigint))",
        )
    execute_sql(spark, f"ALTER TABLE strawboat.`{path}` DROP CONSTRAINT pos")
    execute_sql(
        spark,
        f"INSERT INTO strawboat.`{path}` "
        f"VALUES (CAST(99 AS bigint), CAST(0 AS bigint), CAST(-1 AS bigint))",
    )
    assert t.read().filter("v = -1").count() == 1

    t.tag("v1")  # tags live in a side file, properties in the manifest
    execute_sql(
        spark,
        f"CREATE OR REPLACE TABLE strawboat.`{path}2` AS SELECT 1 AS x",
    )
    props = execute_sql(spark, f"SHOW TBLPROPERTIES strawboat.`{path}`")
    assert props.columns == ["key", "value"]

    d = execute_sql(spark, f"DESCRIBE DETAIL strawboat.`{path}`")
    assert "n_deleted_rows" in d.columns
    execute_sql(spark, f"DELETE FROM strawboat.`{path}` WHERE k = 0 WITH (mode='mor')")
    d2 = execute_sql(spark, f"DESCRIBE DETAIL strawboat.`{path}`").collect()[0]
    assert d2.n_deleted_rows == 1 and d2.n_rows == 4


def test_insert_counts_landed_rows_not_precount(spark, tmp_path):
    """INSERT's rows_inserted derives from the manifest row-count delta
    AFTER the write lands (metadata-only) — a pre-write df.count()
    would execute the source query twice, which is wrong for
    non-deterministic sources and an extra scan for every INSERT."""
    t, path = _tbl(spark, tmp_path, n=20)
    # non-deterministic row COUNT: a second execution would almost
    # surely land a different number of rows than the one counted
    res = execute_sql(
        spark,
        f"INSERT INTO strawboat.`{path}` "
        "SELECT id AS k, id % 5 AS g, id * 10 AS v "
        "FROM range(2000) WHERE rand() < 0.5",
    )
    assert res["rows_inserted"] == t.count_rows() - 20
    before = t.count_rows()
    res = execute_sql(
        spark,
        f"INSERT INTO strawboat.`{path}` "
        "SELECT id AS k, id % 5 AS g, id * 10 AS v FROM range(7)",
    )
    assert res["rows_inserted"] == 7 == t.count_rows() - before


def test_default_driver_memory_clamps_to_host(monkeypatch):
    """The 24g local-session default clamps to ~60% of physical RAM so
    hosts smaller than the dev box still launch a JVM."""
    from strawboat_spark.session import _default_driver_mem

    v = _default_driver_mem()
    assert v.endswith("g")
    n = int(v[:-1])
    assert 2 <= n <= 24


def test_sql_describe_partitions(spark, tmp_path):
    t, path = _tbl(spark, tmp_path, n=10)
    execute_sql(spark, f"ALTER TABLE strawboat.`{path}` SET PARTITIONED BY (g)")
    t.append(
        spark.createDataFrame([(100, 0, 1), (101, 1, 2)], t.read().schema)
    )
    rows = execute_sql(
        spark, f"DESCRIBE PARTITIONS strawboat.`{path}`"
    ).collect()
    parts = {r.partition: r.n_live for r in rows}
    assert parts["{}"] == 10  # the unpartitioned epoch
    assert parts['{"g": "0"}'] == 1 and parts['{"g": "1"}'] == 1


def test_sql_optimize_rewrite_epoch(spark, tmp_path):
    """OPTIMIZE <t> REWRITE EPOCH — the Iceberg rewrite_data_files
    analog as SQL: migrates pre-evolution files under the declared
    layout (Table.rewrite_epoch; contract in test_epoch_rewrite.py)."""
    import os

    from strawboat_spark.sources.datasource import read_manifest

    t, path = _tbl(spark, tmp_path, n=10)
    execute_sql(spark, f"ALTER TABLE strawboat.`{path}` SET PARTITIONED BY (g)")
    # scoped form first: the unpartitioned epoch's leaves carry NULL
    # directory values, so a value-match predicate selects nothing —
    # the call is a consistent no-op (directory-epoch discipline)
    res = execute_sql(
        spark, f"OPTIMIZE strawboat.`{path}` REWRITE EPOCH WHERE g = -1"
    )
    assert res["rewritten"] == 0
    res = execute_sql(spark, f"OPTIMIZE strawboat.`{path}` REWRITE EPOCH")
    assert res["rewritten"] > 0
    rels = [e["path"] for e in read_manifest(path)["entries"]]
    assert rels and all(r.split(os.sep)[0].startswith("g=") for r in rels)
    assert t.read().count() == 10
