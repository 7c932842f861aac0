"""Round-trip queries through the strawboat columnar format: prove at
the correctness gate that format("strawboat") write→read is loss-free
(oracle runs on the original parquet — any format corruption breaks
the hash match).
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from strawboat_spark.queries import query
from strawboat_spark.tables import load_table


def _roundtrip(
    spark: SparkSession, sf_dir: str, table: str, columns: list[str] | None = None
) -> DataFrame:
    from strawboat_spark.sources.datasource import register

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_rt_')}/{table}"
    src = load_table(spark, sf_dir, table)
    if columns:
        # r17 opt (guide §4.1/§2.3): the Python-datasource write is
        # OPAQUE to Catalyst — it cannot column-prune the scan feeding
        # an exchange-free write, so every unprojected column pays the
        # parquet decode + the JVM→Arrow→Python transfer + the page
        # encode just to be ignored by the aggregate that follows.
        # Projecting the write to the columns the query consumes is the
        # query-side projection pushdown the API can't do for us; the
        # round-trip still proves those leaves loss-free (the nested /
        # decimal / filter / partitioned gates cover the other types).
        src = src.select(*columns)
    # No pre-write repartition: writers take the upstream partitioning
    # as-is (at 100 TB a forced repartition is a full extra shuffle of
    # the dataset). Output files are therefore input-split-sized, and
    # the READER fans large files back out via page-range stripes
    # (datasource.STRIPE_PAGES), so read parallelism never depends on
    # how many tasks happened to write.
    # r17 opt attempt REVERTED after measurement: spreading the write
    # to defaultParallelism (parallel page encode) was A/B-measured
    # WORSE warm at sf0.1 (roundtrip_agg 2.88 -> 4.11 s) — the extra
    # full-data shuffle plus the many-small-files overhead on every
    # subsequent scan (per-file footer + per-task Python datasource
    # init) exceed the ~1 s serial-encode saving at gate scale.
    src.write.format("strawboat").mode("overwrite").save(path)
    rd = spark.read.format("strawboat")
    if columns:
        # Explicit projection pushdown: decode only the leaves the query
        # touches (the Python DataSource API can't learn this from the
        # plan — see datasource.py schema()).
        rd = rd.option("columns", ",".join(columns))
    return rd.load(path)


@query(
    "strawboat_roundtrip_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    description="lineitem → strawboat file → read back → aggregate (loss-free format proof)",
)
def strawboat_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _roundtrip(
        spark,
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_orderkey"],
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "strawboat_roundtrip_filter",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS totalprice
    FROM orders WHERE o_totalprice > 300000 ORDER BY o_orderkey
    """,
    description="orders → strawboat → filtered read (exercises pushdown + page skipping)",
)
def strawboat_roundtrip_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _roundtrip(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    return (
        o.filter(F.col("o_totalprice") > 300000)
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy("o_orderkey")
    )


@query(
    "strawboat_roundtrip_nested",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           ROUND(SUM(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')), 2) AS sum_all
    FROM embeddings GROUP BY label ORDER BY label
    """,
    description="embeddings (list<float>) → strawboat → nested-type aggregation",
)
def strawboat_roundtrip_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _roundtrip(spark, sf_dir, "embeddings")
    vec_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(vec_sum), 2).alias("sum_all"),
        )
        .orderBy("label")
    )


@query(
    "strawboat_partitioned_scan",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description=(
        "orders → hive-partitioned strawboat layout (partition_by=o_orderstatus) → "
        "filtered scan: the status predicate prunes whole directories at planning time"
    ),
)
def strawboat_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.sources.datasource import register

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_part_')}/orders"
    src = load_table(spark, sf_dir, "orders")
    # Partition-aligned shuffle: co-locate each status in a few salted
    # buckets so every task writes ONE file for one status (3 statuses
    # x 8 buckets = ~24 right-sized files) instead of every task
    # writing a sliver of every status (tasks x statuses small files).
    src = src.repartition(24, F.col("o_orderstatus"), F.pmod(F.col("o_orderkey"), F.lit(8)))
    src.write.format("strawboat").option("partition_by", "o_orderstatus").mode(
        "overwrite"
    ).save(path)
    o = spark.read.format("strawboat").load(path)
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


_LINEITEM_COLS = (
    "l_orderkey l_partkey l_suppkey l_linenumber l_quantity l_extendedprice "
    "l_discount l_tax l_returnflag l_linestatus l_shipdate"
).split()

_STAT_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column",
       CAST(ceil(COUNT(*) / 8192.0) AS BIGINT) AS n_pages,
       COUNT(*) AS n_values,
       COUNT(*) - COUNT({c}) AS null_count,
       TRUE AS compressed_ok, TRUE AS codecs_reported
    FROM lineitem"""
    for c in _LINEITEM_COLS
)


@query(
    "strawboat_stat_report",
    oracle=f'SELECT * FROM ({_STAT_ORACLE}) ORDER BY "column"',
    description=(
        "write lineitem as strawboat, report per-column page/value/null stats with "
        "codec/size sanity gates (reference stat module parity: src/stat.rs:63-152)"
    ),
)
def strawboat_stat_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE-style format introspection: per-column page counts,
    value counts, null counts (all exactly SQL-reproducible: the writer
    slices pages every 8192 rows), plus the adaptive-codec facts the
    oracle can't recompute — codec names and compressed footprint —
    reduced to booleans that must always hold (the recall-gate trick):
    compressed_ok  = 0 < compressed_bytes <= 16 B/value + page slack
    codecs_reported = the chooser recorded at least one codec.
    Stats are footer/page-header metadata (bytes per column, not rows),
    so assembling the report on the driver is O(columns), scale-safe."""
    import glob as _g

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.sources.stat import stat_file

    register(spark)
    out = f"{tempfile.mkdtemp(prefix='strawboat_stat_')}/lineitem"
    src = load_table(spark, sf_dir, "lineitem")
    src.coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    rows = []
    for f in sorted(_g.glob(f"{out}/*.strb")):
        for st in stat_file(f):
            rows.append(
                (
                    st.name,
                    st.n_pages,
                    st.total_values,
                    st.null_count,
                    0 < st.total_compressed <= st.total_values * 16 + st.n_pages * 4096,
                    len(st.codecs) > 0,
                )
            )
    return spark.createDataFrame(
        rows,
        "column string, n_pages long, n_values long, null_count long, "
        "compressed_ok boolean, codecs_reported boolean",
    ).orderBy("column")


def _interop_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """orders → Spark-native {orc,json,csv} files → read back. Proves
    the engine round-trips through every columnar/row format a user
    would stage data in (the reference only speaks its own format +
    parquet/csv/json via Arrow; Spark gives ORC for free)."""
    path = f"{tempfile.mkdtemp(prefix='strawboat_interop_')}/orders_{fmt}"
    src = load_table(spark, sf_dir, "orders")
    w = src.write.mode("overwrite")
    rd = spark.read
    if fmt in ("json", "csv"):
        # schema-carrying read: text formats don't persist types
        rd = rd.schema(src.schema)
        if fmt == "csv":
            w = w.option("header", "false")
    getattr(w.format(fmt), "save")(path)
    return getattr(rd.format(fmt), "load")(path)


_INTEROP_ORACLE = """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           ROUND(SUM(o_totalprice), 2) AS total,
           CAST(MIN(o_orderdate) AS DATE) AS first_date
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def _interop_agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_custkey").alias("n_cust"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.min("o_orderdate").cast("date").alias("first_date"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "format_interop_roundtrip",
    oracle=f"""
    SELECT f.fmt, a.* FROM (
      SELECT 'csv' AS fmt UNION ALL SELECT 'json' UNION ALL SELECT 'orc'
    ) f CROSS JOIN ({_INTEROP_ORACLE.strip()}) a
    ORDER BY f.fmt, a.o_orderpriority
    """,
    description=(
        "composite interop gate (r9 fold of format_csv/json/orc_roundtrip): "
        "orders -> CSV, JSON lines and ORC -> read back -> identical "
        "aggregates per format, one oracle"
    ),
)
def format_interop_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every staging format a user would hand the engine round-trips
    losslessly: each format's read-back aggregate must match the same
    parquet-side oracle, labeled by format so a single red row names
    the broken codec path."""
    frames = [
        _interop_agg(_interop_roundtrip(spark, sf_dir, fmt)).select(
            F.lit(fmt).alias("fmt"), "*"
        )
        for fmt in ("csv", "json", "orc")
    ]
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("fmt", "o_orderpriority")


@query(
    "strawboat_roundtrip_decimal",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
           CAST(MIN(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS min_disc,
           CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    description="decimal(12,2) columns through the format: exact decimal aggregates, cast to double only at the end",
)
def strawboat_roundtrip_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal pages through the full datasource path (the lo/hi-word
    integer-codec route, reference decimal parity src/compression/
    integer/traits.rs:30-39). Sums are computed IN decimal — exact at
    2 dp — and cast to double only in the final projection, so both
    engines produce bit-identical doubles with no rounding epsilon."""
    from strawboat_spark.sources.datasource import register

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_dec_')}/lineitem_dec"
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        F.col("l_discount").cast("decimal(12,2)").alias("disc"),
    )
    src.write.format("strawboat").mode("overwrite").save(path)
    back = spark.read.format("strawboat").load(path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.sum("price").cast("double").alias("total_price"),
            F.min("disc").cast("double").alias("min_disc"),
            F.max("price").cast("double").alias("max_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "strawboat_sql_view",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description="SQL DDL surface: CREATE TEMP VIEW ... USING strawboat, then pure spark.sql",
)
def strawboat_sql_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textual-SQL path over the format: a temp view created with
    `USING strawboat` and a plain spark.sql aggregate — what a SQL-only
    user of the engine actually types."""
    from strawboat_spark.sources.datasource import register

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_sqlv_')}/orders"
    load_table(spark, sf_dir, "orders").write.format("strawboat").mode("overwrite").save(path)
    spark.sql("DROP VIEW IF EXISTS sb_orders_sql_view")
    spark.sql(
        f"CREATE TEMPORARY VIEW sb_orders_sql_view USING strawboat OPTIONS (path '{path}')"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
        FROM sb_orders_sql_view GROUP BY o_orderstatus ORDER BY o_orderstatus
        """
    )


@query(
    "strawboat_travel_suite",
    oracle="""
    WITH full_agg AS (
      SELECT o_orderstatus AS k, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(o_totalprice), 2) AS total
      FROM orders GROUP BY o_orderstatus
    )
    SELECT * FROM (
      SELECT 'restore' AS gate, k, n, total FROM full_agg
      UNION ALL
      SELECT 'tag', k, n, total FROM full_agg
      UNION ALL
      SELECT 'ts_asof', 'asof', CAST(COUNT(*) AS BIGINT),
             ROUND(SUM(o_totalprice), 2)
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT 'ts_asof', 'head', CAST(COUNT(*) AS BIGINT),
             ROUND(SUM(o_totalprice), 2)
      FROM orders WHERE o_orderkey % 5 = 0 AND o_totalprice >= 150000
    ) ORDER BY gate, k
    """,
    description=(
        "composite travel gate (r9 fold of strawboat_tag_read/restore/"
        "timestamp_travel): tagged generation survives a zero-grace "
        "vacuum and reads the full seed; RESTORE after a MOR delete "
        "hash-matches the untouched source with history intact; "
        "TIMESTAMP AS OF between two commits resolves to the earlier "
        "generation while head reads post-delete"
    ),
)
def strawboat_travel_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three table-history behaviors under one exact oracle, labeled
    per gate.  Semantics per member unchanged from the pre-fold gates
    (git history r5-r8); the too-early-timestamp error stays pinned by
    tests/test_table_contract.py::test_timestamp_time_travel_and_restore."""
    import time

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_travel_")
    o3 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def agg3(df, gate):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        ).select(F.lit(gate).alias("gate"), F.col("o_orderstatus").alias("k"), "n", "total")

    # tag: seed (tagged v1) -> overwrite fragment -> zero-grace vacuum;
    # the tag still reads the full seed (tagged generations survive)
    t_tag = Table(spark, f"{root}/tag")
    t_tag.overwrite(o3)
    t_tag.tag("v1")
    t_tag.overwrite(o3.filter("o_orderkey % 7 = 0"))
    t_tag.vacuum(grace_seconds=0.0)
    tag_frame = agg3(t_tag.read_tag("v1"), "tag")

    # restore: seed -> MOR delete -> restore(1); reads equal the seed,
    # history shows three generations (restore commits, never rewrites)
    t_res = Table(spark, f"{root}/restore")
    t_res.overwrite(o3)
    t_res.delete("o_orderkey % 3 = 0 AND o_orderstatus = 'O'", mode="mor")
    t_res.restore(1)
    assert len(t_res.history()) == 3
    res_frame = agg3(t_res.read(), "restore")

    # TIMESTAMP AS OF: an instant between two commits resolves to the
    # earlier generation (manifest committed_at_us, not fs mtimes)
    t_ts = Table(spark, f"{root}/ts")
    t_ts.overwrite(o3.filter("o_orderkey % 5 = 0").select("o_orderkey", "o_totalprice"))
    time.sleep(0.25)
    mid = time.time()
    time.sleep(0.25)
    t_ts.delete("o_totalprice < 150000", mode="mor")

    def agg_ts(df, side):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        ).select(F.lit("ts_asof").alias("gate"), F.lit(side).alias("k"), "n", "total")

    ts_frame = agg_ts(t_ts.read(at_timestamp=mid), "asof").unionByName(
        agg_ts(t_ts.read(), "head")
    )
    return (
        res_frame.unionByName(tag_frame).unionByName(ts_frame).orderBy("gate", "k")
    )


@query(
    "strawboat_snapshot_metrics",
    oracle="""
    SELECT * FROM (
      SELECT 'retention' AS gate, 'gen1_rows' AS metric, CAST(20 AS BIGINT) AS value
      UNION ALL SELECT 'retention', 'gen2_after_vacuum', 40
      UNION ALL SELECT 'retention', 'gen2_rows', 40
      UNION ALL SELECT 'retention', 'gen3_rows', 35
      UNION ALL SELECT 'retention', 'head_rows', 10
      UNION ALL SELECT 'retention', 'src_anchor',
        (SELECT CAST(SUM(c_custkey) AS BIGINT) FROM customer)
      UNION ALL SELECT 'travel', 'gen1_rows', 10
      UNION ALL SELECT 'travel', 'gen2_rows', 30
      UNION ALL SELECT 'travel', 'gen3_rows', 60
      UNION ALL SELECT 'travel', 'head_rows', 60
      UNION ALL SELECT 'travel', 'n_generations', 3
      UNION ALL SELECT 'travel', 'src_anchor',
        (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders)
    ) ORDER BY gate, metric
    """,
    description=(
        "composite snapshot gate (r9 fold of strawboat_time_travel/"
        "snapshot_retention): at_generation reads over an append "
        "history, and the retention contract — DELETE/OVERWRITE leave "
        "superseded generations readable; a graceful vacuum keeps them"
    ),
)
def strawboat_snapshot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation snapshots + retention as (gate, metric, value) rows.
    Semantics per member unchanged from the pre-fold gates (the
    retention half is the r6 fix for the r5 verdict's confirmed
    break)."""
    from strawboat_spark.sources.datasource import list_generations, register
    from strawboat_spark.sources.maintenance import delete_where, vacuum

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_snap_")
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr("id", "id * 2 as v")  # noqa: E731

    rows = []
    # travel: three appends, three pinned snapshot counts + an anchor
    p1 = f"{root}/travel"
    mk(0, 10).coalesce(1).write.format("strawboat").mode("overwrite").save(p1)
    mk(10, 30).coalesce(1).write.format("strawboat").mode("append").save(p1)
    mk(30, 60).coalesce(1).write.format("strawboat").mode("append").save(p1)
    at1 = lambda g: (  # noqa: E731
        spark.read.format("strawboat").option("at_generation", g).load(p1).count()
    )
    anchor_o = load_table(spark, sf_dir, "orders").agg(
        F.sum("o_orderkey").cast("bigint")
    ).collect()[0][0]
    rows += [
        ("travel", "gen1_rows", at1(1)),
        ("travel", "gen2_rows", at1(2)),
        ("travel", "gen3_rows", at1(3)),
        ("travel", "head_rows", spark.read.format("strawboat").load(p1).count()),
        ("travel", "n_generations", len(list_generations(p1))),
        ("travel", "src_anchor", anchor_o),
    ]
    # retention: DELETE/OVERWRITE keep superseded generations readable
    p2 = f"{root}/retention"
    mk(0, 20).coalesce(1).write.format("strawboat").mode("overwrite").save(p2)
    mk(20, 40).coalesce(1).write.format("strawboat").mode("append").save(p2)
    delete_where(spark, p2, "id < 5")
    mk(100, 110).coalesce(1).write.format("strawboat").mode("overwrite").save(p2)
    at2 = lambda g: (  # noqa: E731
        spark.read.format("strawboat").option("at_generation", g).load(p2).count()
    )
    rows += [
        ("retention", "gen1_rows", at2(1)),
        ("retention", "gen2_rows", at2(2)),
        ("retention", "gen3_rows", at2(3)),
        ("retention", "head_rows", spark.read.format("strawboat").load(p2).count()),
    ]
    vacuum(p2, grace_seconds=3600.0)  # graceful: retains all generations
    anchor_c = load_table(spark, sf_dir, "customer").agg(
        F.sum("c_custkey").cast("bigint")
    ).collect()[0][0]
    rows += [
        ("retention", "gen2_after_vacuum", at2(2)),
        ("retention", "src_anchor", anchor_c),
    ]
    return spark.createDataFrame(
        [(g, m, int(v)) for g, m, v in rows], "gate string, metric string, value bigint"
    ).orderBy("gate", "metric")


@query(
    "strawboat_zorder_scan",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_custkey > 1000 AND o_totalprice > 50000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="Z-ordered layout scan: 2-column clustering, selective 2-predicate filter through page stats",
)
def strawboat_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column pruning end-to-end: orders Z-ORDERED on
    (o_custkey, o_totalprice), then a conjunctive filter on both —
    page min/max stats prune on each predicate independently
    (operators/layout.py; test_zorder_layout_prunes_both_columns pins
    the skip fractions)."""
    from strawboat_spark.operators.layout import write_zordered
    from strawboat_spark.sources.datasource import register

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_zo_')}/orders_z"
    write_zordered(
        load_table(spark, sf_dir, "orders"), path, "o_custkey", "o_totalprice", n_files=4
    )
    back = spark.read.format("strawboat").load(path)
    return (
        back.filter((F.col("o_custkey") > 1000) & (F.col("o_totalprice") > 50000))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )



@query(
    "strawboat_delete_update",
    oracle="""
    SELECT 1 AS del_files_rewritten, CAST(3 AS BIGINT) AS rows_deleted,
           1 AS upd_files_rewritten, CAST(5 AS BIGINT) AS rows_updated,
           CAST(27 AS BIGINT) AS rows_after,
           CAST(435 - 25 - 26 - 27 + 5000 AS BIGINT) AS vsum_check
    """,
    description="copy-on-write DELETE/UPDATE: one stats-pruned scan finds affected files, only those rewrite",
)
def strawboat_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table mutations over the format (Delta-style COW): DELETE and
    UPDATE locate affected files in ONE distributed scan via the
    `_strawboat_file` provenance column (file/page stats prune the
    untouched bulk to footer-only planning), rewrite just those files,
    and flip the manifest generation via CAS. vsum_check pins the
    exact surviving values: ids 0..29 minus deleted 25-27, with
    v = id*2 except the 5 updated even ids < 10 get +1000 each."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.sources.maintenance import delete_where, update_where

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_mut_')}/t"
    for i in range(3):
        (
            spark.range(i * 10, (i + 1) * 10)
            .selectExpr("id", "id * 2 as v")
            .coalesce(1)
            .write.format("strawboat")
            .mode("overwrite" if i == 0 else "append")
            .save(path)
        )
    d = delete_where(spark, path, "id >= 25 and id < 28")
    u = update_where(spark, path, "id % 2 = 0 and id < 10", {"v": "v + 1000"})
    rd = lambda: spark.read.format("strawboat").load(path)  # noqa: E731
    rows_after = rd().count()
    # sum(id) + sum of untouched v adjustments: all v = 2*id, +1000 x5
    vsum = rd().agg((F.sum("v") - F.sum("id")).cast("bigint")).collect()[0][0]
    return spark.createDataFrame(
        [
            (
                d["files_rewritten"],
                d["rows_deleted"],
                u["files_rewritten"],
                u["rows_updated"],
                rows_after,
                vsum,
            )
        ],
        "del_files_rewritten int, rows_deleted bigint, upd_files_rewritten int, "
        "rows_updated bigint, rows_after bigint, vsum_check bigint",
    )


@query(
    "strawboat_merge_upsert",
    oracle="""
    SELECT 2 AS files_rewritten, CAST(2 AS BIGINT) AS rows_updated,
           CAST(1 AS BIGINT) AS rows_inserted, CAST(31 AS BIGINT) AS rows_after,
           CAST(5000 + 15000 + 100000 AS BIGINT) AS upserted_vsum
    """,
    description="MERGE upsert: bound-pruned candidate scan, left-anti rewrite, atomic flip",
)
def strawboat_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third Delta-class mutation verb: matched target rows are
    replaced by source rows, unmatched source rows insert — one CAS
    manifest flip, candidate files bound-pruned by the source keys'
    min/max before the broadcast semi join (maintenance.merge_upsert)."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.sources.maintenance import merge_upsert

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_merge_')}/t"
    for i in range(3):
        (
            spark.range(i * 10, (i + 1) * 10)
            .selectExpr("id", "id * 2 as v")
            .coalesce(1)
            .write.format("strawboat")
            .mode("overwrite" if i == 0 else "append")
            .save(path)
        )
    source = spark.createDataFrame(
        [(5, 5000), (15, 15000), (100, 100000)], "id long, v long"
    )
    stats = merge_upsert(spark, path, source, on=["id"])
    rd = lambda: spark.read.format("strawboat").load(path)  # noqa: E731
    rows_after = rd().count()
    vsum = rd().filter("v >= 5000").agg(F.sum("v").cast("bigint")).collect()[0][0]
    return spark.createDataFrame(
        [
            (
                stats["files_rewritten"],
                stats["rows_updated"],
                stats["rows_inserted"],
                rows_after,
                vsum,
            )
        ],
        "files_rewritten int, rows_updated bigint, rows_inserted bigint, "
        "rows_after bigint, upserted_vsum bigint",
    )



@query(
    "strawboat_maintenance_cycle",
    oracle="""
    SELECT 6 AS files_before, 2 AS files_after,
           CAST(1 AS BIGINT) AS orphans_removed,
           (SELECT COUNT(*) FROM orders) AS rows_intact
    """,
    description="maintenance verbs end-to-end: write 6 files -> orphan drop -> OPTIMIZE ZORDER -> vacuum; deterministic stats",
)
def strawboat_maintenance_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table-upkeep lifecycle as a hash-verifiable query: a 6-file
    write, a simulated crashed-write orphan, an OPTIMIZE ZORDER BY
    rewrite to 2 files (atomic manifest flip), then vacuum() reclaiming
    the orphan — every count deterministic, and the row set provably
    intact afterwards."""
    import os
    import shutil

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.sources.maintenance import optimize, vacuum

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_maint_')}/orders"
    src = load_table(spark, sf_dir, "orders")
    src.repartition(6).write.format("strawboat").mode("overwrite").save(path)
    files = sorted(f for f in os.listdir(path) if f.endswith(".strb"))
    files_before = len(files)

    stats = optimize(spark, path, zorder_by=["o_custkey", "o_totalprice"], target_files=2)

    # a crashed write's leftover lands after the rewrite: on disk,
    # never committed — invisible to readers, reclaimed by vacuum
    survivors = sorted(f for f in os.listdir(path) if f.endswith(".strb"))
    orphan = os.path.join(path, "part-orphan.strb")
    shutil.copy(os.path.join(path, survivors[0]), orphan)
    os.utime(orphan, (1, 1))
    vac = vacuum(path, grace_seconds=3600)

    rows = spark.read.format("strawboat").load(path).count()
    return spark.createDataFrame(
        [(files_before, stats["after"], vac["removed"], rows)],
        "files_before int, files_after int, orphans_removed bigint, rows_intact bigint",
    )


@query(
    "strawboat_schema_merge",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL
                ELSE o_orderpriority END AS priority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY 1 ORDER BY priority NULLS FIRST
    """,
    description=(
        "schema evolution gate: write (key, price), append (key, price, "
        "priority) under merge_schema, read the union — files that "
        "predate the column null-fill it (Delta/parquet mergeSchema "
        "semantics), proven by the hash against an oracle that nulls "
        "the same rows analytically"
    ),
)
def strawboat_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.sources.datasource import register

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_sm_')}/orders"
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    new = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    old.write.format("strawboat").mode("overwrite").save(path)
    new.write.format("strawboat").option("merge_schema", "true").mode("append").save(path)
    merged = spark.read.format("strawboat").option("merge_schema", "true").load(path)
    return (
        merged.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(F.asc_nulls_first("priority"))
    )


@query(
    "strawboat_metadata_count",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitem,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders
    FROM lineitem
    """,
    description=(
        "metadata-only COUNT(*): Table.count_rows sums footer num_rows "
        "per committed file — zero data pages read (the parquet "
        "metadata-count optimization), hash-checked against SQL COUNT(*)"
    ),
)
def strawboat_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    base = tempfile.mkdtemp(prefix="strawboat_mc_")
    counts = {}
    for t in ("lineitem", "orders"):
        path = f"{base}/{t}"
        load_table(spark, sf_dir, t).write.format("strawboat").mode("overwrite").save(path)
        counts[t] = Table(spark, path).count_rows()
    return spark.createDataFrame(
        [(counts["lineitem"], counts["orders"])], "n_lineitem long, n_orders long"
    )


@query(
    "strawboat_change_feed",
    oracle="""
    SELECT 'delete' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'F'
    UNION ALL
    SELECT 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey % 2 = 1
    ORDER BY change_type
    """,
    description=(
        "change data feed gate (Delta CDF analog): seed even orders, "
        "append odd orders, DELETE even 'F' rows, then changes(gen1) must "
        "report exactly the appended rows as inserts and the deleted rows "
        "as deletes — file-pruned via the generation manifests, "
        "hash-matched against the analytic replay"
    ),
)
def strawboat_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_cf_')}/orders"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = Table(spark, path)
    t.overwrite(o.filter(F.col("o_orderkey") % 2 == 0))  # generation 1
    t.append(o.filter(F.col("o_orderkey") % 2 == 1))  # generation 2
    t.delete("o_orderkey % 2 = 0 AND o_orderstatus = 'F'")  # generation 3
    return (
        t.changes(1)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("change_type")
    )


@query(
    "strawboat_constraints",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS bad_append_rejected,
           TRUE AS table_unchanged
    FROM orders WHERE o_totalprice > 0
    """,
    description=(
        "CHECK constraint gate: add `o_totalprice > 0` (holds for the "
        "seed), then a violating append must be rejected atomically — "
        "the row count afterwards equals the valid seed exactly"
    ),
)
def strawboat_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_ck_')}/orders"
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t = Table(spark, path)
    t.overwrite(o.filter(F.col("o_totalprice") > 0))
    n_before = t.count_rows()
    t.add_constraint("price_positive", "o_totalprice > 0")
    rejected = False
    try:
        t.append(
            spark.range(5).select(
                F.col("id").alias("o_orderkey"),
                F.lit(-1.0).alias("o_totalprice"),
            )
        )
    except ValueError:
        rejected = True
    n = t.count_rows()
    return spark.createDataFrame(
        [(n, rejected, n == n_before)],
        "n_rows long, bad_append_rejected boolean, table_unchanged boolean",
    )


@query(
    "strawboat_mor_suite",
    oracle="""
    SELECT * FROM (
      SELECT 'merge' AS gate, o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                            ELSE o_totalprice END), 2) AS total
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT 'update', o_orderstatus,
             CAST(COUNT(*) AS BIGINT),
             ROUND(SUM(CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000
                            ELSE o_totalprice END), 2)
      FROM orders GROUP BY o_orderstatus
    ) ORDER BY gate, o_orderstatus
    """,
    description=(
        "composite merge-on-read gate (r9 fold of strawboat_mor_update/"
        "mor_merge): deletion vectors mask old row versions, updated/"
        "merged versions land as new files in one generation flip — "
        "each verb's post-state hash-matches the analytic replay"
    ),
)
def strawboat_mor_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_mor_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def agg(t, gate):
        return (
            t.read()
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
            .select(F.lit(gate).alias("gate"), "o_orderstatus", "n", "total")
        )

    t_u = Table(spark, f"{root}/upd")
    t_u.overwrite(o)
    t_u.update("o_orderkey % 5 = 0", {"o_totalprice": "o_totalprice + 1000"}, mode="mor")

    t_m = Table(spark, f"{root}/mrg")
    t_m.overwrite(o)
    src_rows = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    t_m.merge(src_rows, on=["o_orderkey"], mode="mor")
    return agg(t_m, "merge").unionByName(agg(t_u, "update")).orderBy(
        "gate", "o_orderstatus"
    )


@query(
    "strawboat_mor_delete",
    revised=17,  # r17 rewrite not in the r17 driver sample (VERDICT r17 #7)
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE NOT (o_orderkey % 3 = 0 AND o_orderstatus = 'O')
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description=(
        "merge-on-read DELETE gate: deletion vectors recorded in the "
        "manifest (zero data files rewritten), subtracted at decode time "
        "— the post-delete aggregate hash-matches the analytic replay"
    ),
)
def strawboat_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_mor_')}/orders"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = Table(spark, path)
    t.overwrite(o)
    t.delete("o_orderkey % 3 = 0 AND o_orderstatus = 'O'", mode="mor")
    return (
        t.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )




@query(
    "strawboat_profile",
    oracle="""
    SELECT 'o_orderkey' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS n_nulls,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(COUNT(*) AS BIGINT),
           CAST(0 AS BIGINT),
           MIN(o_orderstatus),
           MAX(o_orderstatus)
    FROM orders
    ORDER BY col_name
    """,
    description=(
        "metadata-only column profile: per-column rows/nulls/min/max "
        "aggregated from page stats without reading a data page — the "
        "drift-check primitive (profile(g1) vs profile(g2) at manifest "
        "cost)"
    ),
)
def strawboat_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders into the format, then profile from page metadata
    only: counts/nulls from page headers, min/max as the fold of page
    stats — hash-matched against SQL MIN/MAX/COUNT over the source."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_prof_')}/orders"
    t = Table(spark, path)
    t.overwrite(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    )
    return t.profile().withColumnRenamed("column", "col_name").orderBy("col_name")


@query(
    "strawboat_incremental_view",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(FLOOR(o_totalprice * 100)), 2) AS sum_value
    FROM orders
    WHERE NOT (o_orderkey % 5 = 0 AND o_orderstatus = 'O')
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description=(
        "incrementally maintained aggregate view: CDF generations fold "
        "into a (group, count, sum) view without rescanning the base "
        "table — after an overwrite + MOR delete the view hash-matches "
        "the batch replay"
    ),
)
def strawboat_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed orders (generation 1), MOR-delete a slice (generation 2),
    then run one availableNow maintenance cycle: the view folds the
    insert and delete feeds additively (value pre-floored to integer
    cents so fold order can't move the hash) and must equal the
    final-state GROUP BY. The base table is scanned only through its
    change feed."""
    import tempfile

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.streaming.views import maintain_count_sum_view
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_mv_")
    t = Table(spark, f"{root}/orders")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100).cast("double").alias("cents"),
    )
    t.overwrite(o)
    t.delete("o_orderkey % 5 = 0 AND o_orderstatus = 'O'", mode="mor")
    view = maintain_count_sum_view(
        spark,
        f"{root}/orders",
        f"{root}/view",
        "o_orderstatus",
        "cents",
        checkpoint=f"{root}/ckpt",
    )
    return view.select(
        "o_orderstatus",
        "n_rows",
        F.round("sum_value", 2).alias("sum_value"),
    ).orderBy("o_orderstatus")



@query(
    "strawboat_hilbert_scan",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_custkey > 1000 AND o_totalprice > 50000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description=(
        "Hilbert-clustered layout scan: curve adjacency gives tighter "
        "page bounding boxes than Z-order's bit interleave; same "
        "2-predicate pruning gate"
    ),
)
def strawboat_hilbert_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column pruning through a HILBERT-clustered layout
    (operators/layout.py hilbert_index_np — Skilling's public-domain
    transform, validated by the bijection + unit-step property test).
    Consecutive curve positions are always grid-adjacent, so pages cut
    from the sorted order cover compact regions — the 'liquid
    clustering' layout, exercised end-to-end through write, page
    stats, pushdown and the exact aggregate oracle."""
    from strawboat_spark.operators.layout import write_hilbert_clustered
    from strawboat_spark.sources.datasource import register

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_hc_')}/orders_h"
    write_hilbert_clustered(
        load_table(spark, sf_dir, "orders"), path, "o_custkey", "o_totalprice", n_files=4
    )
    back = spark.read.format("strawboat").load(path)
    return (
        back.filter((F.col("o_custkey") > 1000) & (F.col("o_totalprice") > 50000))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "strawboat_merge_when",
    oracle="""
    WITH src_m AS (
      SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice) % 100 AS DOUBLE) AS delta
      FROM orders WHERE o_orderkey % 10 = 0
    ), tgt AS (
      SELECT o.o_orderstatus,
             CASE WHEN s.k IS NULL THEN o.o_totalprice
                  WHEN s.delta >= 50 THEN NULL              -- DELETE clause
                  WHEN s.delta < 40 THEN ROUND(o.o_totalprice + s.delta, 2)
                  ELSE o.o_totalprice END AS price          -- no clause: keep
      FROM orders o LEFT JOIN src_m s ON o.o_orderkey = s.k
    ), kept AS (
      SELECT o_orderstatus, price FROM tgt WHERE price IS NOT NULL
    ), ins AS (
      -- cent-quantized half price: ROUND(x/2, 2) diverges between engines on
      -- half-cents (x/2 = y.835 stored y.83499..), so both sides derive the
      -- value as integer cents (repo convention, see strawboat_incremental_view)
      SELECT o_orderstatus, CAST(ROUND(o_totalprice * 50) AS BIGINT) / 100.0 AS price
      FROM orders
      WHERE o_orderkey % 10 = 5
        AND CAST(ROUND(o_totalprice * 50) AS BIGINT) / 100.0 > 10000
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(price), 2) AS total
    FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description=(
        "conditional MERGE gate (full Delta clause surface): WHEN "
        "MATCHED AND delta>=50 DELETE / AND delta<40 UPDATE SET / "
        "neither keeps, WHEN NOT MATCHED AND price>10000 INSERT — one "
        "flip, exact oracle over the composed result"
    ),
)
def strawboat_merge_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_when end-to-end: matched rows split three ways by the
    source's delta (delete / update / keep-unchanged), inserts gated
    by their own condition, everything in one generation flip — the
    post-merge aggregate hash-matches the SQL replay of the clause
    semantics."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_mw_')}/orders"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = Table(spark, path)
    t.overwrite(o)
    src = (
        o.filter("o_orderkey % 10 = 0")
        .withColumn("delta", F.floor("o_totalprice").cast("long") % 100)
        .withColumn("delta", F.col("delta").cast("double"))
        .unionByName(
            o.filter("o_orderkey % 10 = 5").select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_orderstatus",
                # cent-quantized half price (matches the oracle ins CTE):
                # ROUND(x/2, 2) is half-cent-unstable across engines
                (F.round(F.col("o_totalprice") * 50).cast("long") / 100.0).alias(
                    "o_totalprice"
                ),
                F.lit(0.0).alias("delta"),
            )
        )
    )
    t.merge_when(
        src,
        ["o_orderkey"],
        matched_delete="src_delta >= 50",
        matched_update=("src_delta < 40", {"o_totalprice": "ROUND(o_totalprice + src_delta, 2)"}),
        not_matched_insert="o_totalprice > 10000",
    )
    return (
        t.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "strawboat_clone",
    oracle="""
    SELECT 'clone' AS side, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey % 7 = 0 AND NOT (o_totalprice < 100000)
    GROUP BY o_orderstatus
    UNION ALL
    SELECT 'src', o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey % 7 = 0
    GROUP BY o_orderstatus
    ORDER BY side, o_orderstatus
    """,
    description=(
        "zero-copy SHALLOW CLONE (Delta CLONE analog): clone references "
        "the source's files by absolute path in its own manifest, then a "
        "MOR delete on the clone diverges it while the source snapshot "
        "stays untouched — both sides aggregated under one exact oracle"
    ),
)
def strawboat_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py Table.clone: O(manifest) clone creation (no data files
    under the clone root — asserted), independent evolution via a
    deletion-vector delete on the clone, source unchanged.  Extends
    the reference's format layer the way RESTORE/tags do; reference
    scope per src/lib.rs:20-29 has no table layer."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_cl_")
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey % 7 = 0").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = Table(spark, f"{root}/src")
    t.overwrite(o)
    c = t.clone(f"{root}/clone")
    from strawboat_spark.sources.fileio import get_fs

    assert not get_fs(f"{root}/clone").list_files(f"{root}/clone", ".strb"), (
        "shallow clone must copy zero data files"
    )
    c.delete("o_totalprice < 100000", mode="mor")

    def agg(tbl, side):
        return (
            tbl.read()
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
            .select(F.lit(side).alias("side"), "o_orderstatus", "n", "total")
        )

    return agg(c, "clone").unionByName(agg(t, "src")).orderBy("side", "o_orderstatus")


@query(
    "strawboat_optimize_where",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'F' AND o_custkey > 500
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description=(
        "partition-scoped OPTIMIZE WHERE + per-leaf ZORDER (Delta "
        "semantics): only the selected hive partition rewrites, "
        "clustered within the leaf on (o_custkey, o_totalprice); the "
        "pruned + stats-skipped scan aggregates exactly"
    ),
)
def strawboat_optimize_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maintenance.optimize(where=..., zorder_by=...): leaf-local
    clustering preserves the hive layout (closes the r7 flat-table
    refusal), one generation flip for all selected leaves.  The gate
    asserts scope: unselected leaves' manifest entries are untouched."""
    from strawboat_spark.sources.datasource import read_manifest, register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_ow_")
    t = Table(spark, f"{root}/orders")
    src = load_table(spark, sf_dir, "orders").repartition(
        12, F.col("o_orderstatus"), F.pmod(F.col("o_orderkey"), F.lit(4))
    )
    t.overwrite(src, partition_by="o_orderstatus")
    before = {
        e["path"]
        for e in read_manifest(f"{root}/orders")["entries"]
        if not e["path"].startswith("o_orderstatus=F/")
    }
    t.optimize(
        zorder_by=["o_custkey", "o_totalprice"],
        target_files=2,
        where="o_orderstatus = 'F'",
    )
    after = {
        e["path"]
        for e in read_manifest(f"{root}/orders")["entries"]
        if not e["path"].startswith("o_orderstatus=F/")
    }
    assert before == after, "optimize(where=) must not touch unselected leaves"
    return (
        t.read()
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_custkey") > 500))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "strawboat_generated_cols",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE YEAR(o_orderdate) IN (1994, 1995)
    GROUP BY 1 ORDER BY 1
    """,
    description=(
        "generated columns (Delta analog): o_year = YEAR(o_orderdate) "
        "computed at write time and driving the hive layout (the "
        "date-partition pattern) — writers never mention it, the "
        "year filter prunes directories, the aggregate is exact"
    ),
)
def strawboat_generated_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py generated_columns/_apply_generated: the column is
    computed on write (missing in the source df), stored physically,
    partitions the layout, and supplied-value writes are validated
    (tests/test_table_contract.py pins the mutation invariants)."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_gc_")
    t = Table(spark, f"{root}/orders")
    t.add_generated_column("o_year", "CAST(YEAR(o_orderdate) AS BIGINT)")
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    # partition-aligned shuffle (same rationale as strawboat_partitioned_scan)
    src = src.repartition(
        14, F.year("o_orderdate"), F.pmod(F.col("o_orderkey"), F.lit(2))
    )
    t.overwrite(src, partition_by="o_year")
    return (
        t.read()
        .filter(F.col("o_year").isin(1994, 1995))
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_year")
    )



def _strawboat_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py rename_column + datasource column_mapping: alias
    resolution covers schema(), stats/page pruning and assembly; the
    gate splits orders across the rename so BOTH file epochs feed the
    result (contract details in
    tests/test_table_contract.py::test_rename_column_metadata_only_mapping)."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_rn_")
    t = Table(spark, f"{root}/orders")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.overwrite(o.filter("o_orderkey % 2 = 0"))       # epoch 1: stores o_totalprice
    t.rename_column("o_totalprice", "revenue")
    t.append(                                          # epoch 2: stores revenue
        o.filter("o_orderkey % 2 = 1").withColumnRenamed("o_totalprice", "revenue")
    )
    return (
        t.read()
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("revenue"), 2).alias("revenue"),
        )
        .orderBy("status")
    )


def _strawboat_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py drop_column: tombstone mapping owns the dropped
    column's stored names (re-add refused on append, freed by
    overwrite; time travel renders pre-drop schemas) — contract in
    tests/test_table_contract.py::test_drop_column_metadata_only_tombstone."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_dc_")
    t = Table(spark, f"{root}/orders")
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey % 3 = 0").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.overwrite(o.filter("o_orderkey % 2 = 0"))   # epoch 1: has o_totalprice
    t.drop_column("o_totalprice")
    t.append(                                      # epoch 2: written without it
        o.filter("o_orderkey % 2 = 1").drop("o_totalprice")
    )
    assert t.read().columns == ["o_orderkey", "o_orderstatus"]
    return (
        t.read()
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        )
        .orderBy("status")
    )


def _strawboat_add_column_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py add_column + datasource declared_columns: pre-
    declaration files render the default, post-declaration writes
    store real values (contract in
    tests/test_table_contract.py::test_add_column_with_read_time_default)."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_ad_")
    t = Table(spark, f"{root}/orders")
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey % 11 = 0").select(
        "o_orderkey", "o_totalprice"
    )
    t.overwrite(o.filter("o_orderkey % 2 = 0"))     # epoch 1: no tier column
    t.add_column("tier", "string", default="standard")
    t.append(                                        # epoch 2: explicit values
        o.filter("o_orderkey % 2 = 1").withColumn("tier", F.lit("express"))
    )
    return (
        t.read()
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("tier")
    )


def _strawboat_widen_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py alter_column_type + datasource widened_columns: old
    narrow files upcast losslessly at read time, new files store the
    declared wide type (contract in tests/test_table_contract.py::
    test_alter_column_type_metadata_only_widening)."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_wt_")
    t = Table(spark, f"{root}/orders")
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey % 7 = 0")
    t.overwrite(                                     # epoch 1: int32 cust
        o.filter("o_orderkey % 2 = 0").select(
            F.col("o_custkey").cast("int").alias("cust"), "o_totalprice"
        )
    )
    t.alter_column_type("cust", "bigint")            # one manifest flip
    t.append(                                        # epoch 2: needs bigint
        o.filter("o_orderkey % 2 = 1").select(
            (F.col("o_custkey") + F.lit(3_000_000_000)).alias("cust"),
            "o_totalprice",
        )
    )
    return (
        t.read()
        .groupBy((F.col("cust") % 3).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cust").alias("total_cust"),
        )
        .orderBy("bucket")
    )


@query(
    "strawboat_schema_evolution_suite",
    oracle="""
    SELECT * FROM (
      SELECT 'rename' AS gate, o_orderstatus AS grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(o_totalprice), 2) AS metric
      FROM orders GROUP BY 2
      UNION ALL
      SELECT 'drop', o_orderstatus,
             CAST(COUNT(*) AS BIGINT),
             CAST(CAST(SUM(o_orderkey) AS BIGINT) AS DOUBLE)
      FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 2
      UNION ALL
      SELECT 'add_default',
             CASE WHEN o_orderkey % 2 = 0 THEN 'standard' ELSE 'express' END,
             CAST(COUNT(*) AS BIGINT),
             ROUND(SUM(o_totalprice), 2)
      FROM orders WHERE o_orderkey % 11 = 0 GROUP BY 2
      UNION ALL
      SELECT 'widen', CAST(bucket AS VARCHAR), n, CAST(total_cust AS DOUBLE)
      FROM (
        WITH src AS (
            SELECT CAST(o_custkey AS BIGINT) AS cust
            FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 2 = 0
            UNION ALL
            SELECT o_custkey + 3000000000
            FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 2 = 1
        )
        SELECT CAST(cust % 3 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cust) AS BIGINT) AS total_cust
        FROM src GROUP BY 1
      )
    ) ORDER BY gate, grp
    """,
    description=(
        "composite metadata-only schema-evolution gate (r14 fold of "
        "strawboat_{rename_column,drop_column,add_column_default,"
        "widen_type}): RENAME resolves pre-rename files by alias; DROP "
        "tombstones in one manifest flip; ADD COLUMN DEFAULT fills old "
        "epochs at read time; TYPE WIDENING upcasts int32 epochs "
        "losslessly — each member splits its table across the "
        "evolution so BOTH file epochs feed the exact mixed-epoch "
        "aggregate, labeled per verb (sums stay < 2^53 so the DOUBLE "
        "metric column is exact)"
    ),
)
def strawboat_schema_evolution_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gate, all four metadata-only schema-evolution verbs; a red
    row's `gate` column names the broken member. Per-verb contracts
    stay pinned in tests/test_table_contract.py (rename/drop/add/widen
    each have a dedicated metadata-only test)."""
    members = [
        ("rename", _strawboat_rename_column(spark, sf_dir)
         .select(F.col("status").alias("grp"), "n",
                 F.col("revenue").alias("metric"))),
        ("drop", _strawboat_drop_column(spark, sf_dir)
         .select(F.col("status").alias("grp"), "n",
                 F.col("key_sum").cast("double").alias("metric"))),
        ("add_default", _strawboat_add_column_default(spark, sf_dir)
         .select(F.col("tier").alias("grp"), "n",
                 F.col("total").alias("metric"))),
        ("widen", _strawboat_widen_type(spark, sf_dir)
         .select(F.col("bucket").cast("string").alias("grp"), "n",
                 F.col("total_cust").cast("double").alias("metric"))),
    ]
    out = None
    for label, df in members:
        part = df.select(F.lit(label).alias("gate"), "grp", "n", "metric")
        out = part if out is None else out.unionByName(part)
    return out.orderBy("gate", "grp")


@query(
    "strawboat_history",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'overwrite',  CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        (CAST(2 AS BIGINT), 'append',     CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        (CAST(3 AS BIGINT), 'delete-mor', CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        (CAST(4 AS BIGINT), 'add_column', CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        (CAST(5 AS BIGINT), 'restore',    CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        (CAST(6 AS BIGINT), 'compact',    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT))
    ) AS h(generation, operation, n_files, n_added, n_removed)
    ORDER BY generation
    """,
    description=(
        "DESCRIBE HISTORY analog: every commit path stamps its verb in "
        "the generation manifest; file add/remove counts derived by "
        "diffing retained entry lists — the audit trail is exact and "
        "costs zero data-file reads"
    ),
)
def strawboat_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py history()/history_df() + write_manifest(operation=...):
    commit verbs recorded by overwrite/append/MOR delete/DDL/restore/
    compact (contract in tests/test_table_contract.py::
    test_history_records_operations)."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.sources.maintenance import compact
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_hist_")
    t = Table(spark, f"{root}/orders")
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey % 7 = 0").select(
        "o_orderkey", "o_totalprice"
    )
    t.overwrite(o.filter("o_orderkey % 2 = 0").coalesce(1))
    t.append(o.filter("o_orderkey % 2 = 1").coalesce(1))
    t.delete("o_orderkey % 3 = 0", mode="mor")
    t.add_column("tier", "string", default="standard")
    t.restore(generation=2)
    compact(spark, f"{root}/orders")
    return t.history_df().select(
        "generation", "operation", "n_files", "n_added", "n_removed"
    ).orderBy("generation")


@query(
    "strawboat_bucket_pruning",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS cust,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_custkey = (SELECT MIN(o_custkey) FROM orders)
    GROUP BY 1
    """,
    description=(
        "hash-bucketed layout (bucketBy analog): orders bucketed 16 "
        "ways on o_custkey across two epochs; a point lookup hashes "
        "the key at PLANNING time and scans 1/16 of the files — the "
        "100 TB point-lookup shape — and the result is exact"
    ),
)
def strawboat_bucket_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py _apply_bucketing + datasource bucket_spec/bucket_id:
    crc32-bucketed hive layout, planner-side bucket pruning for
    equality/IN filters on the key (contract in
    tests/test_table_contract.py::test_bucketed_layout_prunes_and_stays_consistent)."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_bp_")
    t = Table(spark, f"{root}/orders")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    t.overwrite(
        o.filter("o_custkey % 2 = 0"),
        bucket_by="o_custkey",
        num_buckets=16,
    )
    t.append(o.filter("o_custkey % 2 = 1"))  # re-buckets automatically
    k = o.agg(F.min("o_custkey")).collect()[0][0]  # bounded scalar
    return (
        t.read()
        .filter(F.col("o_custkey") == k)
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "strawboat_wap",
    oracle="""
    SELECT 'after_publish' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    UNION ALL
    SELECT 'audit_union',
           CAST(COUNT(*) AS BIGINT),
           ROUND(SUM(o_totalprice), 2)
    FROM orders
    UNION ALL
    SELECT 'main_during_stage',
           CAST(COUNT(*) AS BIGINT),
           ROUND(SUM(o_totalprice), 2)
    FROM orders WHERE o_orderkey % 2 = 0
    ORDER BY phase
    """,
    description=(
        "write-audit-publish (Iceberg WAP analog): a staged append is "
        "invisible to readers, the audit view is committed+staged, and "
        "publish is per-file moves plus ONE CAS flip — no data "
        "rewritten between stage and publish at any table size"
    ),
)
def strawboat_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py stage_append/read_staged/publish_staged (contract in
    tests/test_table_contract.py::test_write_audit_publish_staging;
    vacuum pinning covered there too)."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_wap_")
    t = Table(spark, f"{root}/orders")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t.overwrite(o.filter("o_orderkey % 2 = 0"))
    sid = t.stage_append(o.filter("o_orderkey % 2 = 1"))

    def snap(df, phase):
        # materialize NOW: the staged files move at publish time, so a
        # lazy audit scan evaluated later would read a vanished dir
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        ).collect()[0]
        return (phase, r["n"], r["total"])

    rows = [snap(t.read(), "main_during_stage"), snap(t.read_staged(sid), "audit_union")]
    t.publish_staged(sid)
    rows.append(snap(t.read(), "after_publish"))
    return spark.createDataFrame(
        rows, "phase string, n long, total double"
    ).orderBy("phase")


@query(
    "strawboat_compact_small",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           CAST(2 AS BIGINT) AS n_files
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    description=(
        "size-targeted compaction (Delta OPTIMIZE semantics): one "
        "at-size file keeps its manifest entry with zero IO while six "
        "streaming-append droppings bin-pack into one — content exact, "
        "2 files after"
    ),
)
def strawboat_compact_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maintenance.py compact(target_bytes=): only the small-file tail
    rewrites (contract in tests/test_table_contract.py::
    test_compact_target_bytes_leaves_big_files_alone)."""
    import glob
    import os as _os

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_cs_")
    p = f"{root}/orders"
    t = Table(spark, p)
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey % 3 = 0").select(
        "o_orderkey", "o_totalprice"
    )
    t.overwrite(o.filter("o_orderkey % 2 = 0").coalesce(1))   # the big file
    odd = o.filter("o_orderkey % 2 = 1")
    for i in range(6):                                         # small tail
        t.append(odd.filter(f"o_orderkey % 12 = {2 * i + 1}").coalesce(1))
    big = max(glob.glob(f"{p}/*.strb"), key=_os.path.getsize)
    t.compact(target_bytes=_os.path.getsize(big))
    from strawboat_spark.sources.datasource import read_manifest

    n_live = len(read_manifest(p)["entries"])  # superseded files stay on
    return (                                   # disk for time travel
        t.read()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .withColumn("n_files", F.lit(n_live).cast("long"))
    )


@query(
    "strawboat_branch",
    oracle="""
    WITH merged AS (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE NOT (o_orderkey % 2 = 0 AND o_orderkey % 7 = 0)
    )
    SELECT CAST(o_orderkey % 4 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM merged GROUP BY 1 ORDER BY bucket
    """,
    description=(
        "writable branches (Iceberg analog): zero-copy fork, the "
        "branch appends odd orders and MOR-deletes some even ones "
        "while main stays untouched, fast-forward adopts the branch in "
        "ONE flip (files moved, vectors intact) — final state exact"
    ),
)
def strawboat_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py branch/branch_table/fast_forward/drop_branch (contract
    in tests/test_table_contract.py::test_branches_fork_evolve_fast_forward)."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_br_")
    t = Table(spark, f"{root}/orders")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t.overwrite(o.filter("o_orderkey % 2 = 0"))
    b = t.branch("etl")
    b.append(o.filter("o_orderkey % 2 = 1"))
    b.delete("o_orderkey % 2 = 0 AND o_orderkey % 7 = 0", mode="mor")
    assert t.read().count() != b.read().count()  # main untouched pre-merge
    t.fast_forward("etl")
    return (
        t.read()
        .groupBy((F.col("o_orderkey") % 4).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("bucket")
    )


@query(
    "strawboat_detail",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS generation,
           CAST(2 AS BIGINT) AS n_files,
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 5 = 0)
                - (SELECT COUNT(*) FROM orders
                   WHERE o_orderkey % 5 = 0 AND o_orderkey % 10 = 0)
                AS BIGINT) AS n_rows,
           'o_custkey' AS bucket_col,
           CAST(8 AS BIGINT) AS bucket_n
    """,
    description=(
        "DESCRIBE DETAIL analog: generation / live file and row counts "
        "/ bucket spec from one driver-side manifest walk — zero data "
        "pages read (row count is DV-aware metadata)"
    ),
)
def strawboat_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py detail(): metadata-only table summary."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_dt_")
    t = Table(spark, f"{root}/orders")
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey % 5 = 0").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t.overwrite(o.filter("o_orderkey % 2 = 0").coalesce(1))      # gen 1
    t.append(o.filter("o_orderkey % 2 = 1").coalesce(1))         # gen 2
    t.delete("o_orderkey % 10 = 0", mode="mor")                  # gen 3, DV only
    d = t.detail().collect()[0]
    import json as _json

    spec = _json.loads(d["bucket_spec"]) if d["bucket_spec"] else {}
    # separate bucketed table proves the spec surfaces
    b = Table(spark, f"{root}/b")
    b.overwrite(o, bucket_by="o_custkey", num_buckets=8)
    bspec = _json.loads(b.detail().collect()[0]["bucket_spec"])
    return spark.createDataFrame(
        [
            (
                d["generation"],
                d["n_files"],
                d["n_rows"],
                bspec["col"],
                bspec["n"],
            )
        ],
        "generation long, n_files long, n_rows long, bucket_col string, bucket_n long",
    )


@query(
    "strawboat_hidden_partition_suite",
    oracle="""
    SELECT * FROM (
      WITH b AS (SELECT MIN(ts) AS lo FROM events)
      SELECT 'days' AS kind,
             CAST(user_id % 5 AS BIGINT) AS cohort,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(FLOOR(value * 100)) AS BIGINT) AS cents
      FROM events, b
      WHERE ts >= b.lo AND ts < b.lo + INTERVAL 3 DAY
      GROUP BY 1, 2
      UNION ALL
      SELECT 'months', cohort, n, cents FROM (
        WITH e6 AS (
            SELECT user_id, value,
                   ts + INTERVAL (event_id % 6) MONTH AS ts
            FROM events
        ), b2 AS (SELECT MIN(ts) AS lo FROM e6)
        SELECT CAST(user_id % 5 AS BIGINT) AS cohort,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(FLOOR(value * 100)) AS BIGINT) AS cents
        FROM e6, b2
        WHERE ts >= b2.lo AND ts < b2.lo + INTERVAL 40 DAY
        GROUP BY 1
      )
    ) ORDER BY kind, cohort
    """,
    description=(
        "composite hidden-time-partitioning gate (r14 fold of "
        "strawboat_days_partition + strawboat_months_partition): "
        "days(ts) = ISO day directories with a 3-day raw-timestamp "
        "range filter pruning whole days at planning (tz-safe one-day "
        "slack, the canonical 100 TB event-table layout); months(ts) = "
        "'YYYY-MM' directories with a 40-day filter pruning whole "
        "months — both results exact, labeled per transform"
    ),
)
def strawboat_hidden_partition_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gate, both Iceberg-style time transforms; a red row's
    `kind` column names the broken member (contracts in
    tests/test_table_contract.py::test_{days,months}_transform_hidden_partitioning)."""
    d = _strawboat_days_partition(spark, sf_dir).select(
        F.lit("days").alias("kind"), "*"
    )
    m = _strawboat_months_partition(spark, sf_dir).select(
        F.lit("months").alias("kind"), "*"
    )
    return d.unionByName(m).orderBy("kind", "cohort")


def _strawboat_days_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py _apply_partition_transform + datasource
    transform_spec/_transform_prunable (contract in
    tests/test_table_contract.py::test_days_transform_hidden_partitioning)."""
    import datetime as dt

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table
    from strawboat_spark.tables import load_table as _lt

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_dp_")
    e = _lt(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    t = Table(spark, f"{root}/events")
    t.overwrite(e.filter("event_id % 2 = 0"), partition_by="days(ts)")
    t.append(e.filter("event_id % 2 = 1"))
    lo = e.agg(F.min("ts")).collect()[0][0]
    hi = lo + dt.timedelta(days=3)
    return (
        t.read()
        .filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy((F.col("user_id") % 5).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100)).cast("long").alias("cents"),
        )
        .orderBy("cohort")
    )


@query(
    "strawboat_partition_evolution",
    oracle="""
    WITH unioned AS (
      SELECT doc_id, lang, source, n_chars FROM documents
    ), kept AS (
      SELECT * FROM unioned WHERE lang <> 'zh'
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS epoch1_rows
    FROM kept GROUP BY lang ORDER BY lang
    """,
    description=(
        "partition-spec EVOLUTION (Iceberg analog): unpartitioned "
        "epoch, metadata-only set_partition_layout('lang') then "
        "('source') — zero files rewritten; appends land each epoch's "
        "layout, a MOR delete and the final scan cross all three "
        "(pages vs directory storage per file), result exact"
    ),
)
def strawboat_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py set_partition_layout + datasource partition_layout +
    the per-leaf rewrite discipline (maintenance._leaf_dir_cols);
    contract in tests/test_partition_evolution.py."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_pe_")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    t = Table(spark, f"{root}/docs")
    t.overwrite(d.filter("doc_id % 3 = 0"))  # epoch 1: lang in pages
    t.set_partition_layout("lang")
    t.append(d.filter("doc_id % 3 = 1"))  # epoch 2: lang= dirs
    t.set_partition_layout("source")
    t.append(d.filter("doc_id % 3 = 2"))  # epoch 3: source= dirs
    t.delete("lang = 'zh'", mode="mor")  # crosses all three epochs
    return (
        t.read()
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
            F.sum(F.when(F.col("doc_id") % 3 == 0, 1).otherwise(0))
            .cast("long")
            .alias("epoch1_rows"),
        )
        .orderBy("lang")
    )


@query(
    "strawboat_epoch_rewrite",
    oracle="""
    WITH kept AS (
      SELECT doc_id, lang, n_chars FROM documents
      WHERE lang <> 'zh' AND lang IN ('en', 'fr')
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(0 AS BIGINT) AS n_nonconforming
    FROM kept GROUP BY lang ORDER BY lang
    """,
    description=(
        "epoch REWRITE (Iceberg rewrite_data_files analog): "
        "unpartitioned epoch + set_partition_layout('lang') + "
        "second epoch + MOR delete, then rewrite_epoch migrates the "
        "old epoch's files under lang= directories (DVs materialize, "
        "one flip) — post-rewrite every entry conforms "
        "(n_nonconforming=0 is asserted from the manifest) and the "
        "lang filter directory-prunes the whole table, result exact. "
        "r14: the migration runs through the SCOPED path "
        "(where='lang IS NULL' selects the unpartitioned epoch's "
        "leaves) and the follow-up bare call must be a zero-IO no-op — "
        "both invariants fold into n_nonconforming"
    ),
)
def strawboat_epoch_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maintenance.rewrite_epoch + table.py rewrite_epoch (contract in
    tests/test_epoch_rewrite.py).  Reference bar: metadata-driven
    skipping (src/read/reader.rs:91-146) restored for migrated data."""
    import os as _os

    from strawboat_spark.sources.datasource import read_manifest, register
    from strawboat_spark.sources.maintenance import _leaf_dir_cols
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_er_")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    t = Table(spark, f"{root}/docs")
    t.overwrite(d.filter("doc_id % 2 = 0"))  # epoch 1: lang in pages
    t.set_partition_layout("lang")
    t.append(d.filter("doc_id % 2 = 1"))  # epoch 2: lang= dirs
    t.delete("lang = 'zh'", mode="mor")  # DV crossing both epochs
    # scoped migration (r14): old-epoch root leaves carry NULL for the
    # declared column, so IS NULL is the directory-epoch selector; the
    # bare sweep after it must find nothing left to rewrite
    t.rewrite_epoch(where="lang IS NULL")
    swept = t.rewrite_epoch()["rewritten"]  # 0 iff the scope covered all
    bad = swept + sum(
        1
        for e in read_manifest(t.path)["entries"]
        if _leaf_dir_cols(_os.path.dirname(e["path"])) != ["lang"]
    )
    return (
        t.read()
        .filter(F.col("lang").isin("en", "fr"))  # directory-prunes now
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .withColumn("n_nonconforming", F.lit(bad).cast("long"))
        .orderBy("lang")
    )


@query(
    "strawboat_merge_evolve",
    oracle="""
    WITH tgt AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    ),
    src AS (
        SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, 'patched' AS tag
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    merged AS (
        SELECT t.o_orderkey, t.o_totalprice, NULL AS tag FROM tgt t
        WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT * FROM src
    )
    SELECT COALESCE(tag, 'orig') AS tag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM merged GROUP BY 1 ORDER BY tag
    """,
    description=(
        "auto-evolving MERGE (Delta autoMerge analog): the source's "
        "new column is DECLARED (metadata-only) before the merge, "
        "pre-merge rows render null, matched rows take source values — "
        "schema evolution costs one flip at any table size"
    ),
)
def strawboat_merge_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py merge(auto_evolve=True) + _auto_evolve_schema (contract
    in tests/test_table_contract.py::test_merge_auto_evolve_declares_and_widens)."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_me_")
    t = Table(spark, f"{root}/orders")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t.overwrite(o.filter("o_orderkey % 2 = 0"))
    src = o.filter("o_orderkey % 10 = 0").select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
        F.lit("patched").alias("tag"),
    )
    t.merge(src, on=["o_orderkey"], mode="mor", auto_evolve=True)
    return (
        t.read()
        .groupBy(F.coalesce(F.col("tag"), F.lit("orig")).alias("tag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("tag")
    )


def _strawboat_months_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.py months() transform (contract in
    tests/test_table_contract.py::test_months_transform_hidden_partitioning).
    Member of the strawboat_hidden_partition_suite composite (r14 fold)."""
    import datetime as dt

    from strawboat_spark.sources.datasource import register
    from strawboat_spark.table import Table
    from strawboat_spark.tables import load_table as _lt

    register(spark)
    root = tempfile.mkdtemp(prefix="strawboat_mp_")
    e = _lt(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    e6 = e.withColumn(
        "ts", F.expr("ts + make_interval(0, CAST(event_id % 6 AS INT))")
    ).drop("event_id")
    t = Table(spark, f"{root}/events")
    t.overwrite(e6, partition_by="months(ts)")
    lo = e6.agg(F.min("ts")).collect()[0][0]
    hi = lo + dt.timedelta(days=40)
    return (
        t.read()
        .filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy((F.col("user_id") % 5).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100)).cast("long").alias("cents"),
        )
        .orderBy("cohort")
    )


@query(
    "strawboat_sql_merge",
    oracle="""
    WITH tgt AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders WHERE o_orderkey % 4 <> 3
    ), src AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
             o_orderkey % 97 AS delta
      FROM orders WHERE o_orderkey % 2 = 0
    ), merged AS (
      SELECT t.k, t.st,
             CASE WHEN s.k IS NULL THEN t.price_c
                  WHEN s.delta >= 60 THEN NULL              -- DELETE clause
                  WHEN s.delta < 40 THEN t.price_c + s.delta
                  ELSE t.price_c END AS price_c             -- no clause: keep
      FROM tgt t LEFT JOIN src s ON t.k = s.k
    ), kept AS (
      SELECT k, st, price_c FROM merged WHERE price_c IS NOT NULL
    ), ins AS (
      SELECT k, st, price_c FROM src
      WHERE k NOT IN (SELECT k FROM tgt) AND price_c > 1000000
    ), after_merge AS (
      SELECT * FROM kept UNION ALL SELECT * FROM ins
    ), after_update AS (                                    -- SQL UPDATE (mor)
      SELECT k, st, CASE WHEN st = 'F' THEN price_c * 2 ELSE price_c END AS price_c
      FROM after_merge
    ), after_delete AS (                                    -- SQL DELETE (mor)
      SELECT * FROM after_update WHERE price_c % 10 <> 7
    )
    SELECT st, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
    FROM after_delete GROUP BY st ORDER BY st
    """,
    description=(
        "SQL DML front-end gate: MERGE INTO (DELETE/UPDATE SET/INSERT * "
        "clauses) + UPDATE ... WITH (mode='mor') + DELETE ... WITH "
        "(mode='mor') driven entirely by SQL text; exact integer-cents "
        "oracle over the composed result"
    ),
)
def strawboat_sql_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-habituated users write MERGE/UPDATE/DELETE as SQL strings
    (strawboat_spark.sql.execute_sql); this gate drives one of each
    through the text front-end and hash-matches the DuckDB replay.
    All arithmetic is integer cents, so the comparison is exact."""
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.sql import execute_sql
    from strawboat_spark.table import Table

    register(spark)
    path = f"{tempfile.mkdtemp(prefix='strawboat_sqlm_')}/orders"
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    Table(spark, path).overwrite(o.filter("k % 4 <> 3"))
    o.filter("k % 2 = 0").withColumn("delta", F.col("k") % 97).createOrReplaceTempView(
        "strawboat_sqlm_src"
    )
    execute_sql(
        spark,
        f"""
        MERGE INTO strawboat.`{path}` AS t
        USING strawboat_sqlm_src AS s
        ON t.k = s.k
        WHEN MATCHED AND s.delta >= 60 THEN DELETE
        WHEN MATCHED AND s.delta < 40 THEN UPDATE SET price_c = t.price_c + s.delta
        WHEN NOT MATCHED AND s.price_c > 1000000 THEN INSERT *
        """,
    )
    execute_sql(
        spark,
        f"UPDATE strawboat.`{path}` SET price_c = price_c * 2 WHERE st = 'F' "
        f"WITH (mode = 'mor')",
    )
    execute_sql(
        spark,
        f"DELETE FROM strawboat.`{path}` WHERE price_c % 10 = 7 WITH (mode = 'mor')",
    )
    return (
        Table(spark, path)
        .read()
        .groupBy("st")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("price_c").cast("long").alias("total_c"),
        )
        .orderBy("st")
    )
