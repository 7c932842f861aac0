"""Table maintenance for strawboat directories.

compact(): merge many small files (the natural output of a streaming
sink's per-microbatch-per-task files) into few right-sized ones.
Layout-preserving: a hive-partitioned directory is compacted leaf-dir
by leaf-dir, so partition pruning keeps working and each output file
still holds exactly one partition value.

Scale shape: one Spark job per leaf directory, reading through the
datasource (stripes fan out) and writing `target_files` outputs via
coalesce — no driver-side data movement; the swap is a manifest
generation flip: readers list the directory through
`_strawboat_manifest.json`, so a concurrent reader sees exactly one
committed generation (old files until the manifest PUT, new files
after), never the mid-swap duplicate or partial set. Directories that
predate the manifest get one written from the pre-compact listing
FIRST, so even their concurrent readers snapshot the old generation.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil

from strawboat_spark.sources.datasource import FILE_EXT, register


def compact(spark, path: str, target_files: int = 1) -> dict:
    """Rewrite each leaf directory's files into `target_files` files.

    Returns {"before": n_files, "after": n_files}. Skips leaf dirs that
    already have <= target_files files.
    """
    from strawboat_spark.sources.datasource import (
        _manifest_entry,
        publish_manifest,
        read_manifest,
        write_manifest,
    )

    register(spark)
    # Snapshot the old generation first: readers that start during the
    # swap list through the manifest and never see mid-swap state.
    if read_manifest(path) is None:
        publish_manifest(path)
    # The root manifest is the committed generation: compact reads and
    # replaces ONLY its entries. Uncommitted orphans in a leaf (crashed
    # writes) are neither folded into the output nor deleted here —
    # that is vacuum()'s job, with its grace window.
    root_man = read_manifest(path) or {"entries": []}
    committed_by_leaf: dict[str, list[dict]] = {}
    for e in root_man["entries"]:
        leaf = os.path.normpath(os.path.dirname(os.path.join(path, e["path"])))
        committed_by_leaf.setdefault(leaf, []).append(e)
    before = after = 0
    for leaf in sorted(committed_by_leaf):
        leaf_entries = committed_by_leaf[leaf]
        files = sorted(os.path.join(path, e["path"]) for e in leaf_entries)
        before += len(files)
        if len(files) <= target_files:
            after += len(files)
            continue
        tmp = leaf + ".__compact__"
        # A hive leaf has no manifest of its own (it lives at the table
        # root), so a bare load(leaf) would glob — and glob sees
        # orphans. Pin the read surface by writing a leaf manifest
        # holding exactly the committed entries (paths rebased), then
        # drop it once the compaction job has run.
        leaf_man_written = False
        if leaf != os.path.normpath(path) and read_manifest(leaf) is None:
            write_manifest(
                leaf,
                [
                    {**e, "path": os.path.relpath(os.path.join(path, e["path"]), leaf)}
                    for e in leaf_entries
                ],
            )
            leaf_man_written = True
        try:
            (
                spark.read.format("strawboat")
                .load(leaf)
                .coalesce(target_files)
                .write.format("strawboat")
                .mode("overwrite")
                .save(tmp)
            )
        finally:
            if leaf_man_written:
                from strawboat_spark.sources.datasource import delete_manifest

                delete_manifest(leaf)
        # The tmp write committed its own manifest with embedded footer
        # meta — carry it over so the compacted table keeps one-read
        # planning.
        tmp_man = read_manifest(tmp) or {"entries": []}
        tmp_meta = {e["path"]: e for e in tmp_man["entries"]}
        new_files = sorted(_glob.glob(os.path.join(tmp, f"*{FILE_EXT}")))
        moved_entries = []
        for f in new_files:
            dest = os.path.join(leaf, os.path.basename(f))
            shutil.move(f, dest)
            src_e = tmp_meta.get(os.path.basename(f), {})
            moved_entries.append(
                _manifest_entry(path, dest, src_e.get("meta"), src_e.get("schema_b64"))
            )
        # Generation flip: replace this leaf's originals with the new
        # files in ONE atomic manifest PUT, then physically delete.
        # The PUT is a CAS; a concurrent append's commit re-reads and
        # retries the same way, so neither side's files are dropped.
        from strawboat_spark.sources.datasource import ManifestConflictError

        originals_rel = {
            os.path.relpath(f, path) for f in files
        }
        for _attempt in range(50):
            man = read_manifest(path)
            entries = [
                e for e in (man["entries"] if man else []) if e["path"] not in originals_rel
            ]
            entries += moved_entries
            gen = (man.get("generation", 0) + 1) if man else 1
            try:
                write_manifest(path, entries, generation=gen)
                break
            except ManifestConflictError:
                continue
        else:
            raise ManifestConflictError(f"compact({path}): lost the generation race 50 times")
        for f in files:
            os.remove(f)
        shutil.rmtree(tmp, ignore_errors=True)
        after += len(new_files)
    return {"before": before, "after": after}


def vacuum(path: str, grace_seconds: float = 3600.0) -> dict:
    """Delete data files invisible to readers: *.strb under the table
    root that the committed manifest does NOT list (crashed writes,
    aborted compactions, foreign drops never committed), plus leftover
    `.__compact__` scratch directories.

    Safety: requires a manifest (listing IS the read surface then —
    an unlisted file can never be read); without one this is a no-op,
    because globbing readers would see every file. Only files older
    than `grace_seconds` go (an in-flight write's file exists before
    its commit publishes it; the grace window keeps vacuum from racing
    an active writer). Returns {"removed": n, "kept": n}.
    """
    import json
    import time

    from strawboat_spark.sources.datasource import (
        _gen_path,
        _manifest_path,
        _read_manifest_file,
        read_manifest,
    )
    from strawboat_spark.sources.fileio import get_fs

    man = read_manifest(path)
    if man is None:
        return {"removed": 0, "kept": 0}
    removed = kept = 0
    now = time.time()
    fs = get_fs(path)
    head = man.get("generation", 0)
    # 1. Pin the cache pointer at the head (readers then never need the
    #    old generation files for probing), then retire superseded
    #    generation files past the grace window. Doing this FIRST means
    #    step 2's keep-set only has to honor generations that survive.
    with fs.create(_manifest_path(path)) as h:
        h.write(json.dumps(man).encode())
    retained = [man]
    for gen in range(1, head):
        gp = _gen_path(path, gen)
        try:
            if fs.exists(gp):
                if now - os.path.getmtime(gp) > grace_seconds:
                    fs.remove(gp)
                    removed += 1
                else:
                    old = _read_manifest_file(fs, gp)
                    if old is not None:
                        retained.append(old)  # still time-travel-able
        except OSError:
            pass
    # 2. Delete data files no RETAINED generation lists (crashed
    #    writes, compacted-away originals whose generations are gone) —
    #    so `at_generation` snapshot reads keep working for every
    #    generation that still has a manifest file.
    listed = {
        os.path.normpath(os.path.join(path, e["path"]))
        for m in retained
        for e in m["entries"]
    }
    for root, dirs, files in os.walk(path):
        for d in list(dirs):
            if d.endswith(".__compact__"):
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                dirs.remove(d)
                removed += 1
        for f in files:
            if not f.endswith(FILE_EXT):
                continue
            full = os.path.normpath(os.path.join(root, f))
            if full in listed:
                kept += 1
            elif now - os.path.getmtime(full) > grace_seconds:
                os.remove(full)
                removed += 1
            else:
                kept += 1  # too young: may belong to an uncommitted write
    return {"removed": removed, "kept": kept}


def delete_where(spark, path: str, condition: str) -> dict:
    """Copy-on-write DELETE: rows matching `condition` are removed by
    rewriting ONLY the files that contain them, then flipping the
    manifest generation (concurrent readers see the old snapshot until
    the CAS PUT; time travel keeps the pre-delete generation until
    vacuum()). Returns {"files_rewritten", "rows_deleted"}.

    Scale shape: affected files are found in ONE distributed scan via
    the `_strawboat_file` provenance column — the pushed filter prunes
    whole files and pages by stats first, so a selective delete plans
    footer-only for the untouched bulk; the rewrite job unions just
    the affected files. No per-file driver jobs, no full-table
    rewrite."""
    return _mutate_where(spark, path, condition, None)


def update_where(spark, path: str, condition: str, assignments: dict[str, str]) -> dict:
    """Copy-on-write UPDATE ... SET: `assignments` maps column name to
    a SQL expression applied to rows matching `condition`; same
    file-pruned rewrite shape as delete_where. Returns
    {"files_rewritten", "rows_updated"}."""
    return _mutate_where(spark, path, condition, assignments)


def _mutate_where(spark, path: str, condition: str, assignments: dict[str, str] | None) -> dict:
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import (
        ManifestConflictError,
        _manifest_entry,
        publish_manifest,
        read_manifest,
        write_manifest,
    )

    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)
    key = "rows_deleted" if assignments is None else "rows_updated"
    df = (
        spark.read.format("strawboat")
        .option("with_file_path", "true")
        .load(path)
    )
    # Hive layout: partition columns live in directory names, not pages.
    # The candidate scan sees them (the datasource reattaches constants),
    # and the per-leaf rewrite below reattaches them for predicate
    # evaluation then drops them before writing back into the leaf.
    from strawboat_spark.sources.datasource import (
        _cast_partition_value,
        _infer_partition_fields,
        _list_files,
        _partition_values,
    )

    part_types = dict(_infer_partition_fields(path, _list_files(path)))
    if assignments and part_types:
        bad = sorted(set(assignments) & set(part_types))
        if bad:
            raise ValueError(
                f"update_where cannot assign hive partition columns {bad} "
                f"(rows would have to move between partitions); rewrite "
                f"with overwrite instead"
            )
    cond = F.expr(condition)
    # one stats-pruned scan: affected files + matched row count together
    hit = (
        df.filter(cond)
        .groupBy("_strawboat_file")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not hit:
        return {"files_rewritten": 0, key: 0}
    candidates = sorted(r["_strawboat_file"] for r in hit)
    n_rows = sum(r["n"] for r in hit)

    from functools import reduce

    def _with_partition_consts(f: str):
        base = spark.read.format("strawboat").load(f)
        for c, tp in part_types.items():
            raw = _partition_values(f, path).get(c)
            base = base.withColumn(c, F.lit(_cast_partition_value(raw, tp)).cast(tp))
        return base.withColumn("__m", cond)

    matched = F.coalesce(F.col("__m"), F.lit(False))
    drop = ["__m", *part_types]

    def _rewrite(files: list[str]):
        src = reduce(
            lambda a, b: a.unionByName(b), [_with_partition_consts(f) for f in files]
        )
        if assignments is None:
            return src.filter(~matched).drop(*drop)
        return src.select(
            *[
                F.when(matched, F.expr(expr)).otherwise(F.col(c)).alias(c)
                if (expr := assignments.get(c)) is not None
                else F.col(c)
                for c in src.columns
                if c not in drop
            ]
        )

    # Rewrites group by leaf directory so every output file still holds
    # exactly one partition value (flat tables have one group: the root)
    by_leaf: dict[str, list[str]] = {}
    for f in candidates:
        by_leaf.setdefault(os.path.normpath(os.path.dirname(f)), []).append(f)
    moved = []
    for leaf, leaf_files in sorted(by_leaf.items()):
        leaf_out = _rewrite(leaf_files)
        tmp = leaf.rstrip("/") + ".__mutate__"
        leaf_out.write.format("strawboat").mode("overwrite").save(tmp)
        tmp_man = read_manifest(tmp) or {"entries": []}
        tmp_meta = {e["path"]: e for e in tmp_man["entries"]}
        for f in sorted(_glob.glob(os.path.join(tmp, f"*{FILE_EXT}"))):
            dest = os.path.join(leaf, os.path.basename(f))
            shutil.move(f, dest)
            src_e = tmp_meta.get(os.path.basename(f), {})
            moved.append(
                _manifest_entry(path, dest, src_e.get("meta"), src_e.get("schema_b64"))
            )
        shutil.rmtree(tmp, ignore_errors=True)
    cand_rel = {os.path.relpath(f, path) for f in candidates}
    for _attempt in range(50):
        man = read_manifest(path)
        entries = [e for e in (man["entries"] if man else []) if e["path"] not in cand_rel]
        gen = (man.get("generation", 0) + 1) if man else 1
        try:
            write_manifest(path, entries + moved, generation=gen)
            break
        except ManifestConflictError:
            continue
    else:
        raise ManifestConflictError(f"{key}({path}): lost the generation race 50 times")
    for f in candidates:
        os.remove(f)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"files_rewritten": len(candidates), key: n_rows}


def merge_upsert(spark, path: str, source, on: list[str]) -> dict:
    """MERGE (upsert): target rows whose `on` key appears in `source`
    are replaced by the source row; unmatched source rows are
    inserted. One atomic manifest flip covers both, so readers see
    either the pre-merge or the post-merge table.

    Scale shape: candidate files are found with the `_strawboat_file`
    provenance scan PRE-FILTERED by the source keys' min/max bounds —
    a pushed BETWEEN that lets file/page stats prune the untouched
    bulk before the (broadcast) semi join; only candidate files are
    rewritten (left-anti against the source keys), and the source
    itself lands as fresh appended files. Returns
    {"files_rewritten", "rows_updated", "rows_inserted"}."""
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import (
        ManifestConflictError,
        _manifest_entry,
        publish_manifest,
        read_manifest,
        write_manifest,
    )

    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)
    root_man = read_manifest(path) or {"entries": []}
    if any(os.sep in e["path"] or "/" in e["path"] for e in root_man["entries"]):
        raise ValueError("merge_upsert does not support hive-partitioned tables yet")
    source = source.cache()
    n_source = source.count()
    if n_source == 0:
        return {"files_rewritten": 0, "rows_updated": 0, "rows_inserted": 0}
    bounds = source.agg(
        *[F.min(c).alias(f"lo_{c}") for c in on], *[F.max(c).alias(f"hi_{c}") for c in on]
    ).collect()[0]
    keys = source.select(*on).distinct()
    df = spark.read.format("strawboat").option("with_file_path", "true").load(path)
    for c in on:
        # sound pre-filter: every match lies inside the source bounds;
        # this is what the page/file stats can prune on
        df = df.filter(F.col(c).between(F.lit(bounds[f"lo_{c}"]), F.lit(bounds[f"hi_{c}"])))
    hit = (
        df.join(F.broadcast(keys), on=on, how="leftsemi")
        .groupBy("_strawboat_file")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    candidates = sorted(r["_strawboat_file"] for r in hit)
    rows_updated = sum(r["n"] for r in hit)
    tmp = path.rstrip("/") + ".__merge__"
    out_cols = [c for c in spark.read.format("strawboat").load(path).columns]
    if candidates:
        from functools import reduce

        parts = [spark.read.format("strawboat").load(f) for f in candidates]
        survivors = reduce(lambda a, b: a.unionByName(b), parts).join(
            F.broadcast(keys), on=on, how="left_anti"
        )
        merged = survivors.select(*out_cols).unionByName(source.select(*out_cols))
    else:
        merged = source.select(*out_cols)
    merged.write.format("strawboat").mode("overwrite").save(tmp)
    tmp_man = read_manifest(tmp) or {"entries": []}
    tmp_meta = {e["path"]: e for e in tmp_man["entries"]}
    moved = []
    for f in sorted(_glob.glob(os.path.join(tmp, f"*{FILE_EXT}"))):
        dest = os.path.join(path, os.path.basename(f))
        shutil.move(f, dest)
        src_e = tmp_meta.get(os.path.basename(f), {})
        moved.append(_manifest_entry(path, dest, src_e.get("meta"), src_e.get("schema_b64")))
    cand_rel = {os.path.relpath(f, path) for f in candidates}
    for _attempt in range(50):
        man = read_manifest(path)
        entries = [e for e in (man["entries"] if man else []) if e["path"] not in cand_rel]
        gen = (man.get("generation", 0) + 1) if man else 1
        try:
            write_manifest(path, entries + moved, generation=gen)
            break
        except ManifestConflictError:
            continue
    else:
        raise ManifestConflictError(f"merge_upsert({path}): lost the generation race 50 times")
    for f in candidates:
        os.remove(f)
    shutil.rmtree(tmp, ignore_errors=True)
    source.unpersist()
    return {
        "files_rewritten": len(candidates),
        "rows_updated": rows_updated,
        "rows_inserted": n_source - rows_updated,
    }


def optimize(
    spark,
    path: str,
    zorder_by: list[str] | None = None,
    target_files: int = 4,
    page_size: int = 8192,
) -> dict:
    """Rewrite a (non-hive) table compacted and, when `zorder_by` is
    given, Z-ORDERED on those columns (operators/layout.py) — the
    OPTIMIZE ... ZORDER BY maintenance verb. The swap is the same
    atomic manifest generation flip as compact(): concurrent readers
    see the old files until the manifest PUT, the new ones after.

    Returns {"before": n_files, "after": n_files}.
    """
    from strawboat_spark.operators.layout import write_zordered
    from strawboat_spark.sources.datasource import (
        _manifest_entry,
        publish_manifest,
        read_manifest,
        write_manifest,
    )

    if not zorder_by:
        return compact(spark, path, target_files)
    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)  # snapshot the old generation first
    root_man = read_manifest(path) or {"entries": []}
    # Z-ordering rewrites to a flat file set; on a hive-partitioned
    # table that would silently flatten the layout (and break partition
    # pruning). Enforce what the docstring promises.
    if any(os.sep in e["path"] or "/" in e["path"] for e in root_man["entries"]):
        raise ValueError(
            "optimize(zorder_by=...) does not support hive-partitioned "
            "tables (it would flatten the partition layout); use "
            "compact() per-leaf instead"
        )
    # Only the committed generation is rewritten and deleted;
    # uncommitted orphans are left for vacuum() and stay out of the
    # new manifest (the flip below lists only the new files).
    originals = sorted(os.path.join(path, e["path"]) for e in root_man["entries"])
    tmp = path.rstrip("/") + ".__optimize__"
    df = spark.read.format("strawboat").load(path)
    write_zordered(
        df, tmp, *zorder_by, n_files=target_files, page_size=page_size
    )
    tmp_man = read_manifest(tmp) or {"entries": []}
    tmp_meta = {e["path"]: e for e in tmp_man["entries"]}
    new_files = sorted(_glob.glob(os.path.join(tmp, f"*{FILE_EXT}")))
    moved = []
    for f in new_files:
        dest = os.path.join(path, os.path.basename(f))
        shutil.move(f, dest)
        src_e = tmp_meta.get(os.path.basename(f), {})
        moved.append(_manifest_entry(path, dest, src_e.get("meta"), src_e.get("schema_b64")))
    # Generation flip via CAS: keep any files a concurrent commit
    # published since the snapshot (they are neither originals nor ours)
    from strawboat_spark.sources.datasource import ManifestConflictError

    originals_rel = {e["path"] for e in root_man["entries"]}
    for _attempt in range(50):
        man = read_manifest(path)
        entries = [
            e for e in (man["entries"] if man else []) if e["path"] not in originals_rel
        ]
        gen = (man.get("generation", 0) + 1) if man else 1
        try:
            write_manifest(path, entries + moved, generation=gen)
            break
        except ManifestConflictError:
            continue
    else:
        raise ManifestConflictError(f"optimize({path}): lost the generation race 50 times")
    for f in originals:
        os.remove(f)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"before": len(originals), "after": len(new_files)}
