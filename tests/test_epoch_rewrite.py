"""Epoch rewrite (Iceberg `rewrite_data_files` analog for partition-
spec evolution): Table.rewrite_epoch() rewrites the files whose
directory layout differs from the DECLARED spec so their rows land
under the declared hive directories.  set_partition_layout stays
metadata-only; this is the tool that RETIRES old layout epochs, so a
filter on the declared column directory-prunes the whole table again
instead of falling back to page stats on old-epoch files.  MOR deletes
materialize in the rewrite; conforming files keep their entries with
zero IO; the pre-rewrite generation stays time-travel-readable."""

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
R3 = [(6, "fr", 60), (7, "de", 70)]


def _manifest_rels(t: Table) -> set[str]:
    from strawboat_spark.sources.datasource import read_manifest

    return {e["path"] for e in read_manifest(t.path)["entries"]}


def test_rewrite_migrates_old_epochs_into_declared_layout(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)  # epoch 1: unpartitioned root files
    t.set_partition_layout("lang")
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    assert any("=" not in f for f in _files(root))  # mixed epochs
    res = t.rewrite_epoch()
    assert res["rewritten"] > 0 and res["files_added"] > 0
    # every manifest entry now encodes the declared layout
    assert all(f.startswith("lang=") for f in _manifest_rels(t))
    assert _rows(t) == {(k, la, v) for k, la, v in R1 + R2}
    assert t.history()[-1]["operation"] == "rewrite-epoch"


def test_rewrite_recovers_directory_pruning(spark, tmp_path):
    """The point of the verb: pre-rewrite, old-epoch files can only
    page-prune a filter on the declared column (and with interleaved
    values they can't even do that); post-rewrite the planner drops
    them at directory level."""
    from pyspark.sql.datasource import EqualTo

    from strawboat_spark.sources.datasource import StrawboatReaderImpl

    root = str(tmp_path / "t")
    # ONE old-epoch file mixing all langs, so page stats cannot prune it
    t = Table(spark, root)
    t.overwrite(
        spark.createDataFrame(R1 + R3, "k long, lang string, v long").coalesce(1)
    )
    t.set_partition_layout("lang")
    schema = t.read().schema

    def planned_files(filters) -> set[str]:
        r = StrawboatReaderImpl({"path": root}, schema)
        if filters:
            r.pushFilters(filters)
        return {p.file for p in r.partitions()}

    pre = planned_files([EqualTo(("lang",), "en")])
    assert pre == planned_files([])  # old epoch: nothing prunable
    t.rewrite_epoch()
    post = planned_files([EqualTo(("lang",), "en")])
    allf = planned_files([])
    assert 0 < len(post) < len(allf)
    assert all("lang=en" in f for f in post)
    got = {(r.k, r.v) for r in t.read().filter("lang = 'en'").select("k", "v").collect()}
    assert got == {(1, 10), (3, 30)}


def test_rewrite_materializes_mor_deletes(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)
    t.set_partition_layout("lang")
    t.delete("k = 2", mode="mor")  # DV against an old-epoch file
    from strawboat_spark.sources.datasource import read_manifest

    assert any(e.get("deletes") or e.get("deletes_refs") for e in read_manifest(root)["entries"])
    t.rewrite_epoch()
    man = read_manifest(root)
    assert not any(e.get("deletes") or e.get("deletes_refs") for e in man["entries"])
    assert _rows(t) == {(1, "en", 10), (3, "en", 30)}


def test_conforming_files_keep_entries_zero_io(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1, partition_by="lang")
    before = _manifest_rels(t)
    res = t.rewrite_epoch()
    assert res == {"rewritten": 0, "files_added": 0, "conforming": len(before)}
    assert _manifest_rels(t) == before  # byte-identical entry set

    # mixed: add an old-epoch append, then rewrite — conforming files
    # keep their exact entries while the stragglers migrate
    t2 = Table(spark, str(tmp_path / "t2"))
    t2.overwrite(
        spark.createDataFrame(R1, "k long, lang string, v long"),
        partition_by="lang",
    )
    keep = _manifest_rels(t2)
    t2.set_partition_layout("k")  # evolve AWAY from lang
    t2.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    res = t2.rewrite_epoch()
    assert res["rewritten"] == len(keep)  # the lang= files now mismatch
    assert all(f.startswith("k=") for f in _manifest_rels(t2))
    assert _rows(t2) == {(k, la, v) for k, la, v in R1 + R2}


def test_rewrite_refusals(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), R1)
    with pytest.raises(ValueError, match="no declared partition layout"):
        t.rewrite_epoch()
    import datetime as dt

    t2 = Table(spark, str(tmp_path / "t2"))
    rows = [(i, dt.datetime(2024, 1, 1 + i % 3)) for i in range(6)]
    t2.overwrite(
        spark.createDataFrame(rows, "k long, ts timestamp"),
        partition_by="days(ts)",
    )
    with pytest.raises(ValueError, match="hidden-partitioning transform"):
        t2.rewrite_epoch()


def test_pre_rewrite_generation_stays_readable(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)
    t.set_partition_layout("lang")
    gen_before = t.history()[-1]["generation"]
    t.rewrite_epoch()
    old = t.read(at_generation=gen_before)
    assert {(r.k, r.lang, r.v) for r in old.collect()} == set(R1)
    assert _rows(t) == set(R1)


def test_multi_column_spec_and_optimize_composition(spark, tmp_path):
    """Two-column declared spec; rewrite lands nested dirs, and
    optimize(where=...) can then right-size one migrated leaf —
    the documented skew follow-up."""
    root = str(tmp_path / "t")
    rows = [(i, ["en", "fr"][i % 2], i * 10) for i in range(20)]
    t = _mk(spark, root, rows)
    t.set_partition_layout("lang,k")
    t.rewrite_epoch()
    rels = _manifest_rels(t)
    assert all(f.split(os.sep)[0].startswith("lang=") for f in rels)
    assert all(f.split(os.sep)[1].startswith("k=") for f in rels)
    assert _rows(t) == {(k, la, v) for k, la, v in rows}
    res = t.optimize(where="lang = 'en'", target_files=1)
    assert res["leaves"] >= 1
    assert _rows(t) == {(k, la, v) for k, la, v in rows}


def test_rewrite_respects_bucket_layout(spark, tmp_path):
    """Bucketed + evolved table: conforming post-evolution leaves are
    lang=<v>/__bucket=<n> — rewrite_epoch must migrate ONLY the
    pre-evolution __bucket-only leaves, re-derive the bucket id for
    migrated rows (same crc32 expression appends use), and leave the
    declared bucket layout intact so point-lookup pruning survives."""
    from pyspark.sql.datasource import EqualTo

    from strawboat_spark.sources.datasource import StrawboatReaderImpl

    root = str(tmp_path / "t")
    t = Table(spark, root)
    t.overwrite(
        spark.createDataFrame(R1, "k long, lang string, v long"),
        bucket_by="k",
        num_buckets=4,
    )
    t.set_partition_layout("lang")
    t.append(spark.createDataFrame(R2, "k long, lang string, v long"))
    conforming_before = {f for f in _manifest_rels(t) if f.startswith("lang=")}
    old_epoch = {f for f in _manifest_rels(t) if not f.startswith("lang=")}
    assert old_epoch and conforming_before  # genuinely mixed epochs
    res = t.rewrite_epoch()
    # only the pre-evolution leaves migrated; conforming entries intact
    assert res["rewritten"] == len(old_epoch)
    assert conforming_before <= _manifest_rels(t)
    # every surviving file encodes declared layout AND bucket layout
    assert all(
        f.startswith("lang=") and f"{os.sep}__bucket=" in f
        for f in _manifest_rels(t)
    )
    got = {
        (r.k, r.lang, r.v)
        for r in t.read().select("k", "lang", "v").collect()
    }
    assert got == {(k, la, v) for k, la, v in R1 + R2}
    # bucket point-lookup pruning still exact AND still prunes
    schema = t.read().schema

    def planned_files(filters) -> set[str]:
        r = StrawboatReaderImpl({"path": root}, schema)
        if filters:
            r.pushFilters(filters)
        return {p.file for p in r.partitions()}

    for k in (1, 2, 3, 4, 5):
        assert {r.k for r in t.read().filter(f"k = {k}").collect()} == {k}
    assert len(planned_files([EqualTo(("k",), 1)])) < len(planned_files([]))
    # the zero-IO no-op invariant now holds for bucketed tables
    res2 = t.rewrite_epoch()
    assert res2["rewritten"] == 0 and res2["files_added"] == 0


def test_rewrite_where_scopes_migration(spark, tmp_path):
    """where= migrates one old-epoch leaf per call (the 100 TB
    partition-by-partition path): the manifest stays consistent —
    mixed but correct — between scoped calls, and a final bare call
    sweeps the stragglers."""
    root = str(tmp_path / "t")
    t = Table(spark, root)
    t.overwrite(
        spark.createDataFrame(R1 + R3, "k long, lang string, v long"),
        partition_by="lang",
    )
    t.set_partition_layout("k")  # evolve AWAY from lang
    all_rows = {(k, la, v) for k, la, v in R1 + R3}
    old = {f for f in _manifest_rels(t) if f.startswith("lang=")}
    n_en = len([f for f in old if f.startswith("lang=en")])
    res = t.rewrite_epoch(where="lang = 'en'")
    assert res["rewritten"] == n_en
    rels = _manifest_rels(t)
    # mixed mid-migration: fr/de leaves untouched, en rows now under k=
    assert any(f.startswith("lang=fr") for f in rels)
    assert not any(f.startswith("lang=en") for f in rels)
    assert _rows(t) == all_rows
    assert {r.k for r in t.read().filter("lang = 'en'").collect()} == {1, 3}
    res = t.rewrite_epoch(where="lang = 'fr'")
    assert res["rewritten"] > 0
    assert _rows(t) == all_rows
    res = t.rewrite_epoch()  # bare call sweeps the de leaf
    assert res["rewritten"] > 0
    assert all(f.startswith("k=") for f in _manifest_rels(t))
    assert _rows(t) == all_rows
    # predicate must reference directory columns only
    with pytest.raises(ValueError, match="partition columns only"):
        Table(spark, root).optimize(where="v > 3")


def test_rewrite_aborts_on_concurrent_mor_delete(spark, tmp_path):
    """A MOR delete that lands on a pinned old-epoch file between the
    pinned scan and the CAS flip must ABORT the flip (a blind commit
    would republish the pre-delete rows, resurrecting them)."""
    import strawboat_spark.sources.maintenance as mnt
    from strawboat_spark.sources.datasource import ManifestConflictError

    root = str(tmp_path / "t")
    t = _mk(spark, root, R1)
    t.set_partition_layout("lang")
    orig_adopt = mnt._adopt_tmp

    def adopt_then_concurrent_delete(*a, **kw):
        moved = orig_adopt(*a, **kw)
        mnt._adopt_tmp = orig_adopt  # no recursion if delete compacts
        t.delete("k = 2", mode="mor")  # DV lands on a pinned old file
        return moved

    mnt._adopt_tmp = adopt_then_concurrent_delete
    try:
        with pytest.raises(ManifestConflictError, match="deletion vectors"):
            t.rewrite_epoch()
    finally:
        mnt._adopt_tmp = orig_adopt
    # the concurrent delete survived; the table stayed consistent
    assert _rows(t) == {(1, "en", 10), (3, "en", 30)}
    # a re-run after the concurrent writer settles succeeds
    res = t.rewrite_epoch()
    assert res["rewritten"] > 0
    assert all(f.startswith("lang=") for f in _manifest_rels(t))
    assert _rows(t) == {(1, "en", 10), (3, "en", 30)}


def test_compact_aborts_on_concurrent_mor_delete(spark, tmp_path):
    """The rewrite-side race guard generalizes (r14): compact's flip
    must also abort when a MOR delete lands on a file it pinned — the
    same resurrection window rewrite_epoch had, one leaf narrower."""
    import strawboat_spark.sources.maintenance as mnt
    from strawboat_spark.sources.datasource import ManifestConflictError

    root = str(tmp_path / "t")
    t = Table(spark, root)
    df = spark.createDataFrame(R1, "k long, lang string, v long")
    t.overwrite(df.repartition(3))  # several files, one leaf
    orig_adopt = mnt._adopt_tmp

    def adopt_then_concurrent_delete(*a, **kw):
        moved = orig_adopt(*a, **kw)
        mnt._adopt_tmp = orig_adopt
        t.delete("k = 2", mode="mor")
        return moved

    mnt._adopt_tmp = adopt_then_concurrent_delete
    try:
        with pytest.raises(ManifestConflictError, match="deletion vectors"):
            t.compact()
    finally:
        mnt._adopt_tmp = orig_adopt
    assert _rows(t) == {(1, "en", 10), (3, "en", 30)}  # delete survived
    res = t.compact()  # clean re-run succeeds and materializes the DV
    assert res["after"] <= res["before"]
    assert _rows(t) == {(1, "en", 10), (3, "en", 30)}


def test_cow_update_aborts_on_concurrent_mor_delete(spark, tmp_path):
    """COW update rewrites candidate files from a pinned scan; a MOR
    delete landing on a candidate mid-rewrite must abort the flip, not
    be resurrected by it."""
    import strawboat_spark.sources.maintenance as mnt
    from strawboat_spark.sources.datasource import ManifestConflictError

    root = str(tmp_path / "t")
    t = Table(spark, root)
    t.overwrite(spark.createDataFrame(R1, "k long, lang string, v long").coalesce(1))
    orig_adopt = mnt._adopt_tmp

    def adopt_then_concurrent_delete(*a, **kw):
        moved = orig_adopt(*a, **kw)
        mnt._adopt_tmp = orig_adopt
        t.delete("k = 2", mode="mor")
        return moved

    mnt._adopt_tmp = adopt_then_concurrent_delete
    try:
        with pytest.raises(ManifestConflictError, match="deletion vectors"):
            t.update("k = 1", {"v": "v + 1"})
    finally:
        mnt._adopt_tmp = orig_adopt
    # neither lost: the delete survived and the aborted update is absent
    assert _rows(t) == {(1, "en", 10), (3, "en", 30)}
    t.update("k = 1", {"v": "v + 1"})  # clean re-run applies
    assert _rows(t) == {(1, "en", 11), (3, "en", 30)}


def test_pin_dv_sigs_raises_on_missing_candidate(tmp_path):
    """Unit contract (r15, ADVICE r14): a candidate absent from the
    pinned manifest is a CONFLICT, not a silent skip — skipping would
    exempt the file from _dv_guarded_adds entirely and a flip built on
    its superseded rows would duplicate them."""
    from strawboat_spark.sources.datasource import ManifestConflictError
    from strawboat_spark.sources.maintenance import _entry_dv_sig, _pin_dv_sigs

    man = {"entries": [{"path": "a.strb"}, {"path": "b.strb", "n_deletes": 2}]}
    sigs = _pin_dv_sigs("/t", man, ["a.strb", "b.strb"], "update")
    assert sigs == {
        "a.strb": _entry_dv_sig({"path": "a.strb"}),
        "b.strb": _entry_dv_sig({"path": "b.strb", "n_deletes": 2}),
    }
    with pytest.raises(ManifestConflictError, match="vanished"):
        _pin_dv_sigs("/t", man, ["a.strb", "gone.strb"], "update")
    with pytest.raises(ManifestConflictError, match="vanished"):
        _pin_dv_sigs("/t", None, ["a.strb"], "merge_when")


def test_cow_update_conflicts_when_candidate_vanishes_before_pin(spark, tmp_path):
    """Scan→pin window (r15, ADVICE r14): COW update selects candidates
    from a data scan, then pins DV signatures from a manifest re-read.
    A concurrent compact that drops a candidate file in that window
    must surface as a conflict — pre-r15 the pin silently omitted the
    vanished file, _dv_guarded_adds never checked it, and the flip
    committed rows rewritten from the superseded file while the
    compactor's output already held them (row duplication)."""
    import strawboat_spark.sources.maintenance as mnt
    from strawboat_spark.sources.datasource import ManifestConflictError

    root = str(tmp_path / "t")
    t = Table(spark, root)
    t.overwrite(
        spark.createDataFrame(R1, "k long, lang string, v long").repartition(3)
    )
    orig_pin = mnt._pin_dv_sigs

    def compact_then_pin(path, pin_man, cand_rel, verb):
        from strawboat_spark.sources.datasource import read_manifest

        mnt._pin_dv_sigs = orig_pin  # compact's own flows stay clean
        t.compact()  # drops every pre-compact file from the manifest
        # the pin read happens AFTER the concurrent compact
        return orig_pin(path, read_manifest(path), cand_rel, verb)

    mnt._pin_dv_sigs = compact_then_pin
    try:
        with pytest.raises(ManifestConflictError, match="vanished"):
            t.update("k = 1", {"v": "v + 100"})
    finally:
        mnt._pin_dv_sigs = orig_pin
    # nothing duplicated, nothing lost; a clean re-run applies exactly
    assert _rows(t) == set(R1)
    t.update("k = 1", {"v": "v + 100"})
    assert _rows(t) == {(1, "en", 110), (2, "fr", 20), (3, "en", 30)}


def test_merge_conflicts_when_candidate_vanishes_before_pin(spark, tmp_path):
    """Same scan→pin window for merge_upsert: a candidate compacted
    away between the candidate scan and the signature pin aborts the
    merge instead of committing survivor rows twice."""
    import strawboat_spark.sources.maintenance as mnt
    from strawboat_spark.sources.datasource import ManifestConflictError

    root = str(tmp_path / "t")
    t = Table(spark, root)
    t.overwrite(
        spark.createDataFrame(R1, "k long, lang string, v long").repartition(3)
    )
    src = spark.createDataFrame([(1, "en", 111)], "k long, lang string, v long")
    orig_pin = mnt._pin_dv_sigs

    def compact_then_pin(path, pin_man, cand_rel, verb):
        from strawboat_spark.sources.datasource import read_manifest

        mnt._pin_dv_sigs = orig_pin
        t.compact()
        return orig_pin(path, read_manifest(path), cand_rel, verb)

    mnt._pin_dv_sigs = compact_then_pin
    try:
        with pytest.raises(ManifestConflictError, match="vanished"):
            t.merge(src, on=["k"])
    finally:
        mnt._pin_dv_sigs = orig_pin
    assert _rows(t) == set(R1)
    t.merge(src, on=["k"])  # clean re-run upserts exactly once
    assert _rows(t) == {(1, "en", 111), (2, "fr", 20), (3, "en", 30)}


@pytest.mark.parametrize(
    "history",
    [
        # (steps applied in order; each table starts empty)
        ["ow_flat", "evolve_lang", "append", "mor_delete"],
        ["ow_lang", "evolve_k", "append", "evolve_lang", "append"],
        ["ow_bucketed", "evolve_lang", "append", "mor_delete", "append"],
        ["ow_flat", "evolve_lang", "append", "evolve_k", "mor_delete"],
    ],
    ids=["flat+mor", "double-evolve", "bucketed+mor", "evolve-twice+mor"],
)
def test_rewrite_epoch_invariants_across_histories(spark, tmp_path, history):
    """Invariant sweep (r14): for ANY epoch history — flat/partitioned/
    bucketed starts, repeated layout evolutions, MOR deletes, appends —
    rewrite_epoch must (a) preserve the exact logical row set, (b)
    leave every manifest entry conforming to the final declared spec,
    and (c) be idempotent (second call rewrites nothing)."""
    from strawboat_spark.sources.datasource import (
        bucket_spec,
        partition_layout,
        read_manifest,
    )
    from strawboat_spark.sources.maintenance import _leaf_dir_cols

    rows = [(i, ["en", "fr", "de"][i % 3], i * 10) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, lang string, v long")
    t = Table(spark, str(tmp_path / "t"))
    half = 0
    deleted: set[int] = set()
    for step in history:
        if step == "ow_flat":
            t.overwrite(df.filter("k % 2 = 0"))
        elif step == "ow_lang":
            t.overwrite(df.filter("k % 2 = 0"), partition_by="lang")
        elif step == "ow_bucketed":
            t.overwrite(df.filter("k % 2 = 0"), bucket_by="k", num_buckets=4)
        elif step == "evolve_lang":
            t.set_partition_layout("lang")
        elif step == "evolve_k":
            t.set_partition_layout("k")
        elif step == "append":
            t.append(df.filter(f"k % 2 = 1 AND k % 4 = {1 + 2 * half}"))
            half += 1
        elif step == "mor_delete":
            t.delete("k = 6", mode="mor")
            deleted.add(6)
    expect = {
        (k, la, v)
        for k, la, v in rows
        if k not in deleted
        and (k % 2 == 0 or (half >= 1 and k % 4 == 1) or (half >= 2 and k % 4 == 3))
    }

    def logical_rows():
        return {
            (r.k, r.lang, r.v)
            for r in t.read().select("k", "lang", "v").collect()
        }

    assert logical_rows() == expect  # pre-rewrite sanity
    t.rewrite_epoch()
    assert logical_rows() == expect  # (a) rows preserved
    declared = partition_layout(t.path)
    spec = bucket_spec(t.path)
    conforming = list(declared) + ([spec["dir_col"]] if spec else [])
    assert all(  # (b) every entry conforms
        _leaf_dir_cols(os.path.dirname(e["path"])) == conforming
        for e in read_manifest(t.path)["entries"]
    )
    res = t.rewrite_epoch()  # (c) idempotent
    assert res["rewritten"] == 0 and res["files_added"] == 0
    assert logical_rows() == expect
