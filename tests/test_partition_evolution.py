"""Partition-spec evolution (Iceberg analog): Table.set_partition_layout
re-declares the hive layout with ONE metadata flip — no file rewritten.
Files written under earlier specs keep their layout; the read side is
per-file (directory constant where the file has one, stored pages
otherwise), so scans, filters, and mutations stay exact over
mixed-epoch tables. Plain-column layouts also gain the inheritance the
transform/bucket specs already had: a bare append derives the declared
directory layout instead of silently landing unpartitioned files."""

from __future__ import annotations

import glob
import os

import pytest

from strawboat_spark.table import Table


def _files(root: str) -> list[str]:
    return sorted(
        os.path.relpath(f, root)
        for f in glob.glob(f"{root}/**/*.strb", recursive=True)
        if "_strawboat" not in f
    )


def _rows(t: Table) -> set[tuple]:
    cols = sorted(t.read().columns)
    return {tuple(r[c] for c in cols) for r in t.read().collect()}


def _mk(spark, path, rows, **opts) -> Table:
    t = Table(spark, path)
    t.overwrite(spark.createDataFrame(rows, "k long, lang string, v long"), **opts)
    return t


R1 = [(1, "en", 10), (2, "fr", 20), (3, "en", 30)]
R2 = [(4, "de", 40), (5, "en", 50)]
R3 = [(6, "fr", 60)]


def test_evolve_unpartitioned_to_partitioned(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)
    assert all("=" not in f for f in _files(root))
    t.set_partition_layout("lang")
    # metadata only: nothing moved, nothing rewritten
    assert all("=" not in f for f in _files(root))
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    langs = {f.split(os.sep)[0] for f in _files(root) if "=" in f}
    assert langs == {"lang=de", "lang=en"}
    want = {(k, la, v) for k, la, v in R1 + R2}
    assert _rows(t) == want
    # filters stay exact over the mixed epochs: old files render lang
    # from pages, new ones from the directory — and the root files are
    # never directory-pruned
    got = {(r.k, r.v) for r in t.read().filter("lang = 'en'").select("k", "v").collect()}
    assert got == {(1, 10), (3, 30), (5, 50)}
    assert t.history()[-2]["operation"] == "set-partition-layout"


def test_bare_append_inherits_declared_layout(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1, partition_by="lang")
    assert {f.split(os.sep)[0] for f in _files(root)} == {"lang=en", "lang=fr"}
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    assert {f.split(os.sep)[0] for f in _files(root)} == {
        "lang=de", "lang=en", "lang=fr"
    }
    assert _rows(t) == {(k, la, v) for k, la, v in R1 + R2}


def test_append_conflicting_layout_refused(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), R1, partition_by="lang")
    src = spark.createDataFrame(R2, "k long, lang string, v long")
    with pytest.raises(ValueError, match="cannot re-partition"):
        t.append(src, partition_by="k")
    t.append(src, partition_by="lang")  # matching explicit spec is fine
    assert t.count_rows() == 5


def test_evolve_across_columns_and_off(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1, partition_by="lang")
    t.set_partition_layout("k")
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    assert {f.split(os.sep)[0] for f in _files(root)} >= {"k=4", "k=5"}
    t.set_partition_layout(None)
    t.append(spark.createDataFrame(R3, "k long, lang string, v long"))
    assert any(os.sep not in f for f in _files(root))  # landed at root
    assert _rows(t) == {(k, la, v) for k, la, v in R1 + R2 + R3}
    # numeric dir values read back typed from the directory epoch too
    assert {r.k for r in t.read().filter("k >= 4").collect()} == {4, 5, 6}


def test_mixed_epoch_mutations_stay_exact(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)
    t.set_partition_layout("lang")
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    model = {k: (la, v) for k, la, v in R1 + R2}
    t.delete("lang = 'fr'", mode="mor")
    model = {k: x for k, x in model.items() if x[0] != "fr"}
    t.update("k % 2 = 1", {"v": "v + 1"}, mode="cow")
    model = {k: (la, v + 1 if k % 2 == 1 else v) for k, (la, v) in model.items()}
    t.merge(
        spark.createDataFrame([(2, "es", 99), (7, "es", 70)], "k long, lang string, v long"),
        on=["k"],
        mode="mor",
    )
    model[2] = ("es", 99)
    model[7] = ("es", 70)
    assert _rows(t) == {(k, la, v) for k, (la, v) in model.items()}
    t.compact(target_files=1)
    assert _rows(t) == {(k, la, v) for k, (la, v) in model.items()}


def test_set_partition_layout_refusals(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), R1)
    with pytest.raises(ValueError, match="no column"):
        t.set_partition_layout("nope")
    with pytest.raises(ValueError, match="plain columns only"):
        t.set_partition_layout("days(k)")
    t2 = Table(spark, str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="no committed data"):
        t2.set_partition_layout("lang")


def test_transform_tables_keep_their_own_authority(spark, tmp_path):
    import datetime

    t = Table(spark, str(tmp_path / "tr"))
    rows = [(1, datetime.datetime(2024, 3, 1, 12)), (2, datetime.datetime(2024, 3, 2, 9))]
    t.overwrite(
        spark.createDataFrame(rows, "k long, ts timestamp"),
        partition_by="days(ts)",
    )
    with pytest.raises(ValueError, match="transform"):
        t.set_partition_layout("k")


def test_time_travel_spans_the_evolution(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)
    g0 = t.history()[-1]["generation"]
    t.set_partition_layout("lang")
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    old = {tuple(r) for r in t.read(at_generation=g0).select("k", "lang", "v").collect()}
    assert old == {(k, la, v) for k, la, v in R1}
    assert t.count_rows(at_generation=g0) == 3
    assert t.count_rows() == 5


def test_change_feed_spans_the_evolution(spark, tmp_path):
    """Table.changes and the streaming CDF resolve each file by ITS OWN
    layout epoch: inserts from a directory-partitioned generation carry
    the column as a constant, old-epoch deletes render it from pages —
    the feed stays row-exact across set_partition_layout."""
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)
    t.set_partition_layout("lang")
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    t.delete("k = 1", mode="mor")  # old-epoch row (lang stored in pages)
    feed = t.changes(1)
    got = {(r.k, r.lang, r.v, r._change_type) for r in feed.collect()}
    want = {(k, la, v, "insert") for k, la, v in R2} | {(1, "en", 10, "delete")}
    assert got == want

    # streaming CDF twin over the same generations
    from strawboat_spark.sources.datasource import register

    register(spark)
    out = (
        spark.readStream.format("strawboat")
        .option("change_feed", "true")
        .option("starting_generation", "1")
        .load(root)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("pe_cdf")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT k, lang, v, _change_type FROM pe_cdf").collect()
    got_s = {(r.k, r.lang, r.v, r._change_type) for r in rows}
    # the stream replays from generation 0: initial snapshot inserts too
    want_s = (
        {(k, la, v, "insert") for k, la, v in R1 + R2}
        | {(1, "en", 10, "delete")}
    )
    assert got_s == want_s


def test_numeric_string_partition_values_keep_their_type(spark, tmp_path):
    """Directory inference alone would type a STRING column holding
    '0'/'1'/'2' as bigint — flipping the logical type against the
    epochs that store it in pages. The declared layout records the
    type authority, which persists after further evolutions (the old
    directories stay on disk)."""
    root = str(tmp_path / "t")
    t = Table(spark, root)
    rows = [(k, str(k % 3), k * 10) for k in range(9)]
    t.overwrite(spark.createDataFrame(rows, "k long, g string, v long"))
    t.set_partition_layout("g")
    t.append(
        spark.createDataFrame(
            [(k, str(k % 3), k * 10) for k in range(9, 15)],
            "k long, g string, v long",
        )
    )
    assert dict(t.read().dtypes)["g"] == "string"
    got = {(r.k, r.g) for r in t.read().filter("g = '2'").collect()}
    assert got == {(k, "2") for k in range(15) if k % 3 == 2}
    # evolve away: g's directories remain, so its type authority must too
    t.set_partition_layout(None)
    t.append(
        spark.createDataFrame([(15, "0", 150)], "k long, g string, v long")
    )
    assert dict(t.read().dtypes)["g"] == "string"
    assert t.read().count() == 16


def test_layout_column_type_whitelist_and_rename_refusal(spark, tmp_path):
    t = Table(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(1, 0.5, "a")], "k long, f double, s string")
    )
    with pytest.raises(ValueError, match="unsupported partition column type"):
        t.set_partition_layout("f")
    t.set_partition_layout("s")
    with pytest.raises(ValueError, match="cannot be renamed"):
        t.rename_column("s", "s2")


def test_partitions_metadata_table_maps_the_epochs(spark, tmp_path):
    """t.partitions(): per-leaf file/row/live/byte counts, driver-side
    only — the epoch map of an evolved table."""
    import json

    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)
    t.set_partition_layout("lang")
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    t.delete("k = 1", mode="mor")
    got = {
        json.dumps(json.loads(r.partition), sort_keys=True): (
            r.n_rows,
            r.n_live,
        )
        for r in t.partitions().collect()
    }
    assert got["{}"] == (3, 2)  # epoch-1 root leaf, one row masked
    assert got[json.dumps({"lang": "de"})] == (1, 1)
    assert got[json.dumps({"lang": "en"})] == (1, 1)
    assert sum(r.n_files for r in t.partitions().collect()) == len(_files(root))
    assert all(r.bytes > 0 for r in t.partitions().collect())


def test_evolution_composes_with_bucketing(spark, tmp_path):
    """A bucketed table can evolve a plain layout on top: appends land
    lang=<v>/__bucket=<n>/ while the pre-evolution epoch keeps its
    __bucket-only leaves; bucket pruning and scans stay exact across
    both epochs."""
    root = str(tmp_path / "t")
    t = Table(spark, root)
    t.overwrite(
        spark.createDataFrame(R1, "k long, lang string, v long"),
        bucket_by="k",
        num_buckets=4,
    )
    t.set_partition_layout("lang")
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    leaves = {os.path.dirname(f) for f in _files(root)}
    assert any(l.startswith("lang=") and "__bucket=" in l for l in leaves)
    assert any(l.startswith("__bucket=") for l in leaves)
    got = {
        (r.k, r.lang, r.v)
        for r in t.read().select("k", "lang", "v").collect()
    }
    assert got == {(k, la, v) for k, la, v in R1 + R2}
    # bucket point-lookup still exact over both epochs
    assert {r.k for r in t.read().filter("k = 4").collect()} == {4}
    assert {r.k for r in t.read().filter("k = 1").collect()} == {1}


def test_optimize_where_scopes_by_directory_epoch(spark, tmp_path):
    """OPTIMIZE ... WHERE selects leaves by their DIRECTORY values
    (Delta semantics): files from an epoch that stored the column in
    pages have no matching directory and are deliberately out of
    scope — the recipe for retiring an old layout is optimize on the
    OLD epoch's own directory columns, or a plain compact."""
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)  # epoch 1: unpartitioned, lang in pages
    t.set_partition_layout("lang")
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    t.append(spark.createDataFrame(R3, "k long, lang string, v long"))
    before = set(_files(root))
    res = t.optimize(where="lang = 'fr'")
    after = set(_files(root))
    # only the lang=fr leaf was rewritten; root (epoch-1) files — which
    # DO contain fr rows — stayed, by the documented directory scoping
    assert all(f in after for f in before if "lang=" not in f)
    assert any(f not in after for f in before if "lang=fr" in f.split(os.sep)[0]) or (
        res.get("before", 0) <= 1  # single-file leaf: nothing to compact
    )
    assert _rows(t) == {(k, la, v) for k, la, v in R1 + R2 + R3}


def test_wap_staging_inherits_the_evolved_layout(spark, tmp_path):
    """stage_append applies the full facade at stage time — including
    the declared layout — so published files land in their leaves, not
    at the root."""
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)
    t.set_partition_layout("lang")
    sid = t.stage_append(
        spark.createDataFrame([(7, "de", 70)], "k long, lang string, v long")
    )
    n_staged = t.read_staged(sid).count()  # materialize BEFORE publish
    assert n_staged == 4  # committed 3 + staged 1
    assert _rows(t) == {(k, la, v) for k, la, v in R1}  # staged invisible
    t.publish_staged(sid)
    assert any(f.startswith("lang=de") for f in _files(root))
    assert _rows(t) == {(k, la, v) for k, la, v in R1} | {(7, "de", 70)}


def test_branch_fast_forward_preserves_evolved_leaves(spark, tmp_path):
    """A branch forked after an evolution inherits the declared layout
    (properties travel with the fork); fast_forward MOVES its files
    back leaf-intact, and the branch's MOR deletes ride along."""
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)
    t.set_partition_layout("lang")
    b = t.branch("etl")
    b.append(spark.createDataFrame([(7, "de", 70)], "k long, lang string, v long"))
    b.delete("k = 1", mode="mor")
    assert _rows(t) == {(k, la, v) for k, la, v in R1}  # branch invisible
    t.fast_forward("etl")
    assert _rows(t) == {(2, "fr", 20), (3, "en", 30), (7, "de", 70)}
    assert any(f.startswith("lang=de") for f in _files(root))


def test_deep_clone_carries_the_declared_layout(spark, tmp_path):
    """Deep clone copies bytes AND properties: the clone keeps the
    declared layout (its appends land in leaves) and the type
    authority (string partition values stay strings). Shallow clones
    of hive layouts keep their existing refusal."""
    t = _mk(spark, str(tmp_path / "t"), R1)
    t.set_partition_layout("lang")
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    with pytest.raises(ValueError, match="deep=True"):
        t.clone(str(tmp_path / "s"))
    c = t.clone(str(tmp_path / "c"), deep=True)
    c.append(spark.createDataFrame([(9, "zh", 90)], "k long, lang string, v long"))
    assert any(f.startswith("lang=zh") for f in _files(str(tmp_path / "c")))
    assert dict(c.read().dtypes)["lang"] == "string"
    assert _rows(c) == {(k, la, v) for k, la, v in R1 + R2} | {(9, "zh", 90)}
    assert _rows(t) == {(k, la, v) for k, la, v in R1 + R2}  # source untouched
