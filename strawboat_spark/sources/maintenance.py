"""Table maintenance for strawboat directories.

compact(): merge many small files (the natural output of a streaming
sink's per-microbatch-per-task files) into few right-sized ones.
Layout-preserving: a hive-partitioned directory is compacted leaf-dir
by leaf-dir, so partition pruning keeps working and each output file
still holds exactly one partition value.

Two invariants every verb here upholds:

1. **All IO goes through the fileio seam** (`get_fs`): compact /
   vacuum / delete / update / merge run unchanged against any
   registered backend (local, memory://, fsspec object stores) — no
   direct os.walk / shutil / glob anywhere in this module.
2. **Mutations never delete data files.** A verb's commit is ONE CAS
   manifest generation flip; the superseded files stay on disk, still
   listed by their own immutable generation manifests, so (a) time
   travel to any pre-mutation generation keeps reading correctly and
   (b) a concurrent reader that planned its scan against the old
   generation finishes without dangling-file errors. `vacuum()` is the
   only deleter: it reclaims files no RETAINED generation lists, after
   a grace window (Delta's VACUUM contract).

Scale shape: each verb runs one Spark job per affected leaf directory,
reading through the datasource with the `files` read option — ONE scan
node per leaf regardless of how many candidate files it touches (a
union-per-file plan would blow up Catalyst analysis at ~10k files) —
and writing outputs distributed; the driver only moves manifests.
"""

from __future__ import annotations

import os

from strawboat_spark.sources.datasource import FILE_EXT, entry_abs, register
from strawboat_spark.sources.fileio import (
    backend_path,
    get_fs,
    move_file,
    split_scheme,
)

_SCRATCH_SUFFIXES = (
    ".__compact__",
    ".__mutate__",
    ".__merge__",
    ".__merge_src__",
    ".__optimize__",
)

# MERGE broadcasts its (distinct) source keys into the target-side
# joins only below this many keys; above it the joins run shuffled and
# AQE picks the strategy — a non-selective backfill source must never
# be forced through a driver-assembled broadcast.
MERGE_BROADCAST_MAX_KEYS = 500_000


def _merge_broadcast_max_keys() -> int:
    return int(os.environ.get("STRAWBOAT_MERGE_BROADCAST_MAX_KEYS", MERGE_BROADCAST_MAX_KEYS))


def _norm(p: str) -> str:
    return os.path.normpath(backend_path(p))


def _rel(p: str, root: str) -> str:
    """Manifest entry key for file `p` of the table at `root`:
    root-relative normally; for a file OUTSIDE the root (a
    shallow-clone external reference) the key is the entry's stored
    absolute form — full URL on scheme'd backends, normalized backend
    path otherwise — so mutation verbs address clone references the
    same way the manifest lists them."""
    np_, nr = _norm(p), _norm(root)
    rp = os.path.relpath(np_, nr)
    if rp.startswith(".."):
        return p if split_scheme(p)[0] else np_
    return rp


def _age_seconds(fs, path: str) -> float:
    age = getattr(fs, "age_seconds", None)
    if age is not None:
        return age(path)
    import time

    return time.time() - fs.mtime_ns(path) / 1e9


def _read_files(spark, path: str, rels: list[str]):
    """One datasource scan pinned to exactly `rels` (root-relative) —
    the single-scan rewrite plan: file count only widens the scan's
    partition list, never the plan tree."""
    import json

    return (
        spark.read.format("strawboat")
        .option("files", json.dumps(sorted(rels)))
        .load(path)
    )


def _adopt_tmp(table_root: str, tmp: str, dest_dir: str | None = None) -> list[dict]:
    """Move the tmp write's committed data files into `dest_dir`
    (default: the table root, preserving hive subdirs), carrying the
    tmp manifest's embedded footer meta into entries rebased onto the
    table root, then drop the whole tmp tree (which also discards any
    crashed-run leftovers the tmp manifest does not vouch for)."""
    from strawboat_spark.sources.datasource import _manifest_entry, read_manifest

    dest_dir = dest_dir or table_root
    fs = get_fs(tmp)
    tmp_man = read_manifest(tmp)
    if tmp_man is not None:
        rels = [e["path"] for e in tmp_man["entries"]]
        meta_by_rel = {e["path"]: e for e in tmp_man["entries"]}
    else:  # tmp written by something that commits no manifest
        rels = [_rel(f, tmp) for f in fs.list_files(tmp, FILE_EXT)]
        meta_by_rel = {}
    moved = []
    for rel in sorted(rels):
        src = os.path.join(tmp, rel)
        dest = os.path.join(dest_dir, rel)
        d = os.path.dirname(dest)
        if d:
            get_fs(dest).makedirs(d)
        # scheme-aware: the tmp write is often a LOCAL scratch dir while
        # the table root lives on an object store
        move_file(src, dest)
        e = meta_by_rel.get(rel, {})
        moved.append(_manifest_entry(table_root, dest, e.get("meta"), e.get("schema_b64")))
    fs.remove_tree(tmp)
    return moved


def _flip_generation(path: str, drop_rel: set[str], add_entries, verb: str) -> None:
    """CAS generation flip: current entries minus `drop_rel` plus
    `add_entries`, retried against concurrent committers (whose files
    are neither dropped nor ours, so both commits land). Superseded
    data files are NOT deleted here — older generation manifests still
    list them; vacuum() reclaims them once those generations age out.

    `add_entries` is either a static list (brand-new files, safe to
    replay verbatim) or a callable `(manifest|None) -> list[dict]`
    re-invoked on the freshly-read manifest EACH attempt. The callable
    form is required whenever the added entries are derived from
    current entries — MOR deletion-vector merges — otherwise a
    conflict retry would republish a vector merged against the
    pre-race manifest and silently drop a concurrent committer's
    deletes for the same file."""
    from strawboat_spark.sources.datasource import (
        ManifestConflictError,
        read_manifest,
        write_manifest,
    )

    for _attempt in range(50):
        man = read_manifest(path)
        adds = add_entries(man) if callable(add_entries) else add_entries
        entries = [e for e in (man["entries"] if man else []) if e["path"] not in drop_rel]
        gen = (man.get("generation", 0) + 1) if man else 1
        try:
            # carry table properties forward from the freshly-read head
            write_manifest(
                path,
                entries + adds,
                generation=gen,
                properties=(man or {}).get("properties") or {},
                operation=verb,
            )
            return
        except ManifestConflictError:
            continue
    raise ManifestConflictError(f"{verb}({path}): lost the generation race 50 times")


def _entry_dv_sig(e: dict) -> tuple:
    """Deletion-vector identity of a manifest entry — everything a MOR
    delete can change. Compared pin-time vs flip-time by the rewriting
    verbs so a delete that landed on a pinned file mid-rewrite aborts
    the flip instead of being silently resurrected."""
    return (
        e.get("deletes"),
        tuple(e.get("deletes_refs") or ()),
        e.get("n_deletes"),
    )


def _dv_guarded_adds(path: str, pinned: dict, moved: list, verb: str):
    """Callable `add_entries` for _flip_generation used by every verb
    that REWRITES existing files (compact/optimize/rewrite_epoch, COW
    delete/update/merge): at flip time, re-read the head manifest and
    verify each entry being dropped still exists with the deletion-
    vector state it had when its data was pinned for the rewrite
    (`pinned`: rel -> _entry_dv_sig). On any mismatch the flip ABORTS
    with ManifestConflictError — a blind static-add commit there would
    republish pre-delete rows (resurrecting a concurrent MOR delete)
    or duplicate rows another rewriter already moved. The same window
    on the MOR side is closed by _dv_entries' snapshot check; this is
    its rewrite-side twin. Aborts are safe to retry: adopted-but-
    unpublished tmp files are invisible to readers (no generation
    lists them)."""
    from strawboat_spark.sources.datasource import ManifestConflictError

    def _adds(fresh):
        cur = {e["path"]: e for e in (fresh["entries"] if fresh else [])}
        for rel, sig in pinned.items():
            e = cur.get(rel)
            if e is None or _entry_dv_sig(e) != sig:
                raise ManifestConflictError(
                    f"{verb}({path}): {rel} was "
                    f"{'dropped' if e is None else 'mutated (deletion vectors changed)'} "
                    f"by a concurrent committer after the pinned scan; "
                    f"aborting the flip (a blind commit would resurrect "
                    f"deleted rows) — re-run {verb}"
                )
        return moved

    return _adds


def _pin_dv_sigs(path: str, pin_man: dict | None, cand_rel, verb: str) -> dict:
    """Pin-time deletion-vector signatures for EVERY candidate file of a
    scan-based rewriting verb (COW delete/update, merge_upsert,
    merge_when).

    These verbs select candidates from a DATA scan and only then pin DV
    signatures from a manifest re-read. A candidate dropped by a
    concurrent compact/optimize/rewrite in that scan→pin window would be
    silently absent from the pinned manifest — a dict built with an
    `if rel in pin_man` filter would skip it, `_dv_guarded_adds` would
    never check it, and the flip would commit rows rewritten from the
    superseded file while the concurrent rewriter's output already
    holds the same rows (row duplication). Absence at pin time is
    therefore a CONFLICT raised here immediately; the flip-time
    `e is None` check in `_dv_guarded_adds` then covers the remaining
    pin→flip window. The manifest-snapshot verbs (compact / optimize /
    rewrite_epoch) pin from the same manifest they select from and
    don't need this."""
    from strawboat_spark.sources.datasource import ManifestConflictError

    cur = {e["path"]: e for e in ((pin_man or {}).get("entries") or [])}
    sigs = {}
    missing = []
    for rel in cand_rel:
        e = cur.get(rel)
        if e is None:
            missing.append(rel)
        else:
            sigs[rel] = _entry_dv_sig(e)
    if missing:
        raise ManifestConflictError(
            f"{verb}({path}): candidate file(s) {sorted(missing)[:5]} "
            f"vanished from the manifest between the candidate scan and "
            f"the signature pin (concurrent compact/optimize/rewrite); "
            f"committing would duplicate their rows — re-run {verb}"
        )
    return sigs


def _part_layout(path: str) -> dict[str, str]:
    """{partition column: spark type} for the table's hive layout."""
    from strawboat_spark.sources.datasource import _infer_partition_fields, _list_files

    return dict(_infer_partition_fields(path, _list_files(path)))


def _leaf_dir_cols(reldir: str) -> list[str]:
    """Column names encoded in THIS leaf directory's own path segments.

    Per-leaf, never table-wide: under partition-spec evolution
    (Table.set_partition_layout) different leaves encode different
    column sets — an old-epoch file stores in its PAGES the very column
    a new leaf encodes in its directory.  A rewrite that dropped the
    table-wide inferred set would silently erase those stored values
    (the column reads back null); dropping only the leaf's own dir
    columns keeps every epoch's storage choice intact."""
    return [seg.split("=", 1)[0] for seg in reldir.split(os.sep) if "=" in seg]


def _leaves_matching_where(spark, verb: str, where: str, leaves, part_fields):
    """Subset of `leaves` whose DIRECTORY values satisfy the SQL
    predicate `where` over partition columns (Delta's OPTIMIZE WHERE
    semantics, shared by optimize and rewrite_epoch). Driver-side over
    leaf directory names only — zero data IO; a leaf that does not
    encode a referenced column carries NULL for it and falls out of
    the selection unless the predicate says otherwise."""
    import urllib.parse

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import _HIVE_NULL

    part_cols = [c for c, _ in part_fields]
    if not part_cols:
        raise ValueError(
            f"{verb}: where= requires a hive-partitioned table "
            f"(the predicate selects partitions to rewrite)"
        )
    rows = []
    for leaf in sorted(leaves):
        vals: dict[str, str | None] = {}
        for seg in leaf.split(os.sep):
            if "=" in seg:
                k, v = seg.split("=", 1)
                vals[k] = None if v == _HIVE_NULL else urllib.parse.unquote(v)
        rows.append([leaf] + [vals.get(c) for c in part_cols])
    pdf = spark.createDataFrame(
        rows,
        schema=", ".join(
            ["__leaf string"] + [f"`{c}` string" for c in part_cols]
        ),
    )
    for c, t in part_fields:
        pdf = pdf.withColumn(c, F.col(c).cast(t))
    try:
        return {r["__leaf"] for r in pdf.filter(F.expr(where)).collect()}
    except Exception as e:
        raise ValueError(
            f"{verb}: where= must reference partition columns only "
            f"({part_cols}); analysis failed: {e}"
        ) from e


def _landing_layout(path: str, inferred: list[str]) -> list[str]:
    """Directory layout for NEWLY LANDED files (merge sources, MOR
    replacement rows): the DECLARED spec when the table has one —
    post-evolution writes must follow the new spec, not the union of
    directory columns history left behind — else the inferred layout."""
    from strawboat_spark.sources.datasource import partition_layout

    return partition_layout(path) or inferred


def compact(
    spark, path: str, target_files: int = 1, target_bytes: int | None = None
) -> dict:
    """Rewrite each leaf directory's files into `target_files` files —
    or, with `target_bytes`, bin-pack SMALL files only (Delta OPTIMIZE
    semantics): files already >= target_bytes are left untouched (same
    path, same entry — zero IO for the bulk of a well-sized table) and
    only the small-file tail is rewritten into ~target_bytes outputs.
    At 100 TB that is the difference between re-churning the whole
    table and rewriting the few GB of streaming-append droppings.

    Returns {"before": n_files, "after": n_files}. Skips leaf dirs
    already at the target. The swap is a CAS manifest generation flip
    per leaf; pre-compact files stay on disk for time travel /
    in-flight readers until vacuum() reclaims them.
    """
    from strawboat_spark.sources.datasource import publish_manifest, read_manifest

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
    dv_sigs = {e["path"]: _entry_dv_sig(e) for e in root_man["entries"]}
    by_leaf: dict[str, list[str]] = {}
    for e in root_man["entries"]:
        by_leaf.setdefault(os.path.dirname(e["path"]), []).append(e["path"])
    before = after = 0
    fs = get_fs(path)
    for reldir in sorted(by_leaf):
        rels = sorted(by_leaf[reldir])
        before += len(rels)
        if target_bytes is not None:
            sizes = {}
            for r in rels:
                try:
                    sizes[r] = fs.stat_sig(os.path.join(path, r))[0]
                except (OSError, KeyError):
                    sizes[r] = target_bytes  # vanished/unknown: don't touch
            small = [r for r in rels if sizes[r] < target_bytes]
            if len(small) <= 1:
                after += len(rels)
                continue
            rewrite, n_out = small, max(
                1, -(-sum(sizes[r] for r in small) // target_bytes)
            )
            after += len(rels) - len(small)  # big files carried untouched
        elif len(rels) <= target_files:
            after += len(rels)
            continue
        else:
            rewrite, n_out = rels, target_files
        leaf = os.path.join(path, reldir) if reldir else path
        tmp = leaf.rstrip("/") + ".__compact__"
        get_fs(tmp).remove_tree(tmp)  # crashed-run leftovers
        df = _read_files(spark, path, rewrite)
        leaf_cols = _leaf_dir_cols(reldir)
        if leaf_cols:
            # partition values live in THIS leaf's directory name, not
            # in stored pages — drop the reattached constants (per-leaf:
            # other epochs may store the same column in pages)
            df = df.drop(*leaf_cols)
        (
            df.coalesce(n_out)
            .write.format("strawboat")
            .mode("overwrite")
            .save(tmp)
        )
        moved = _adopt_tmp(path, tmp, dest_dir=leaf)
        _flip_generation(
            path,
            set(rewrite),
            _dv_guarded_adds(path, {r: dv_sigs[r] for r in rewrite}, moved, "compact"),
            "compact",
        )
        after += len(moved)
    return {"before": before, "after": after}


def vacuum(path: str, grace_seconds: float = 3600.0, dry_run: bool = False) -> dict:
    """The table layer's ONLY deleter of data files. Reclaims, after
    `grace_seconds`:

    - generation manifests older than the head (each one first loses
      time-travel reachability, then its no-longer-listed files);
    - data files no RETAINED generation lists — crashed writes,
      compacted/mutated-away originals whose generations are gone;
    - scratch trees (`*.__compact__/...`) of crashed maintenance runs.

    Safety: requires a manifest (listing IS the read surface then — an
    unlisted file can never be read); without one this is a no-op,
    because globbing readers would see every file. The grace window
    keeps vacuum from racing an active writer (a file exists before
    its commit publishes it) and keeps just-superseded generations
    briefly time-travel-able. Returns {"removed": n, "kept": n}.

    dry_run=True mutates NOTHING (not even the cache-pointer pin) and
    adds "planned": the sorted paths a real run would reclaim now —
    the Delta `VACUUM ... DRY RUN` affordance for auditing retention
    before deleting.
    """
    import json

    from strawboat_spark.sources.datasource import (
        _gen_path,
        _manifest_path,
        _read_manifest_file,
        read_manifest,
    )

    man = read_manifest(path)
    if man is None:
        return {"removed": 0, "kept": 0, "planned": []} if dry_run else {"removed": 0, "kept": 0}
    removed = kept = 0
    planned: list[str] = []
    fs = get_fs(path)
    head = man.get("generation", 0)
    # 1. Pin the cache pointer at the head (readers then never need the
    #    old generation files for probing), then retire superseded
    #    generation files past the grace window. Doing this FIRST means
    #    step 2's keep-set only has to honor generations that survive.
    if not dry_run:
        with fs.create(_manifest_path(path)) as h:
            h.write(json.dumps(man).encode())
    # Tagged generations are PINNED: a tag (table.py Table.tag) names a
    # generation that must stay readable regardless of age, so both its
    # manifest file and (via `retained`) its data files survive vacuum
    # until the tag is dropped (Iceberg tag-retention semantics).
    pinned: set[int] = set()
    tags_file = f"{path}/_strawboat_tags.json"
    try:
        if fs.exists(tags_file):
            with fs.open_read(tags_file) as th:
                pinned = set(json.loads(th.read().decode()).values())
    except (OSError, ValueError):
        pass
    retained = [man]
    for gen in range(1, head):
        gp = _gen_path(path, gen)
        try:
            if fs.exists(gp):
                if gen in pinned:
                    old = _read_manifest_file(fs, gp)
                    if old is not None:
                        retained.append(old)
                elif _age_seconds(fs, gp) > grace_seconds:
                    if dry_run:
                        planned.append(gp)
                    else:
                        fs.remove(gp)
                    removed += 1
                else:
                    old = _read_manifest_file(fs, gp)
                    if old is not None:
                        retained.append(old)  # still time-travel-able
        except (OSError, KeyError):
            pass
    # 2. Delete data files no RETAINED generation lists — so
    #    `at_generation` snapshot reads keep working for every
    #    generation that still has a manifest file.
    listed = {
        _norm(entry_abs(path, e["path"])) for m in retained for e in m["entries"]
    }
    scratch_roots: set[str] = {
        d
        for d in (getattr(fs, "list_dirs", lambda _p: [])(path))
        if d.rstrip("/").endswith(_SCRATCH_SUFFIXES)
    }
    for f in fs.list_files(path, FILE_EXT):
        rel = _rel(f, path)
        segs = rel.split(os.sep)
        if segs[0] == "_branches":
            # writable branches (table.py Table.branch) are explicit
            # managed objects with their own manifests and their own
            # vacuum story — never this table's debris
            kept += 1
            continue
        if segs[0] == "_strawboat_staging" and len(segs) > 2:
            # WAP staging (table.py stage_append): pinned while its
            # marker exists; a marker-less tree is a crashed/abandoned
            # stage — reclaim it whole after the grace window
            if fs.exists(f"{path}/_strawboat_staged_{segs[1]}.json"):
                kept += 1
                continue
            try:
                if _age_seconds(fs, f) > grace_seconds:
                    scratch_roots.add(os.path.join(path, segs[0], segs[1]))
                else:
                    kept += 1
            except (OSError, KeyError):
                kept += 1
            continue
        scratch = next(
            (i for i, s in enumerate(segs[:-1]) if s.endswith(_SCRATCH_SUFFIXES)), None
        )
        if scratch is not None:
            # a crashed verb's tmp tree inside the root: reclaim whole
            scratch_roots.add(os.path.join(path, *segs[: scratch + 1]))
            continue
        if _norm(f) in listed:
            kept += 1
            continue
        try:
            if _age_seconds(fs, f) > grace_seconds:
                if dry_run:
                    planned.append(f)
                else:
                    fs.remove(f)
                removed += 1
            else:
                kept += 1  # too young: may belong to an uncommitted write
        except (OSError, KeyError):
            kept += 1
    # 3. Deletion-vector sidecars (_strawboat_dv/*.dv): live while ANY
    #    retained generation references them; content-addressed orphans
    #    (crashed mutations, speculative task twins) reclaim after the
    #    grace window, same rule as data files.
    from strawboat_spark.sources.datasource import entry_dv_refs

    live_dv = {
        _norm(r) for m in retained for e in m["entries"] for r in entry_dv_refs(path, e)
    }
    for f in fs.list_files(path, ".dv"):
        if _rel(f, path).split(os.sep)[0] == "_branches":
            kept += 1  # branch-owned vectors: the branch's own story
            continue
        if _norm(f) in live_dv:
            kept += 1
            continue
        try:
            if _age_seconds(fs, f) > grace_seconds:
                if dry_run:
                    planned.append(f)
                else:
                    fs.remove(f)
                removed += 1
            else:
                kept += 1
        except (OSError, KeyError):
            kept += 1
    for d in sorted(scratch_roots):
        if dry_run:
            planned.append(d)
        else:
            fs.remove_tree(d)
        removed += 1
    if dry_run:
        return {"removed": removed, "kept": kept, "planned": sorted(planned)}
    return {"removed": removed, "kept": kept}


def delete_where(spark, path: str, condition: str, mode: str = "cow") -> dict:
    """Copy-on-write DELETE: rows matching `condition` are removed by
    rewriting ONLY the files that contain them, then flipping the
    manifest generation. Concurrent readers and time travel keep the
    pre-delete generation readable (its files stay on disk) until
    vacuum() retires it. Returns {"files_rewritten", "rows_deleted"}.

    Scale shape: affected files are found in ONE distributed scan via
    the `_strawboat_file` provenance column — the pushed filter prunes
    whole files and pages by stats first, so a selective delete plans
    footer-only for the untouched bulk; the rewrite is ONE scan per
    affected leaf pinned to the candidate files via the `files` read
    option. No per-file driver jobs, no per-file plan legs, no
    full-table rewrite.

    mode="mor" (merge-on-read): instead of rewriting, record the
    matched rows' PHYSICAL ordinals as per-file deletion vectors in
    the next manifest generation — no data file is touched at all, so
    deleting 10 rows from a 1 GB file costs one scan + one manifest
    PUT. Readers subtract the vectors at decode time; any later COW
    rewrite of a file (update/merge/compact/optimize) materializes and
    clears its vector."""
    if mode == "mor":
        return _delete_mor(spark, path, condition)
    if mode != "cow":
        raise ValueError(f"delete_where mode must be 'cow' or 'mor', got {mode!r}")
    return _mutate_where(spark, path, condition, None)


def _dv_snapshot(man: dict | None) -> dict:
    """Per-file DV state (inline, ref tuple) of a manifest — captured
    at mutation-scan time so the CAS merge can tell an untouched entry
    (additive count is exact) from one a concurrent mutation raced
    (counts may overlap — recompute from the decoded union)."""
    return {
        e["path"]: (e.get("deletes") or None, tuple(e.get("deletes_refs") or ()))
        for e in (man or {"entries": []})["entries"]
    }


def _dv_entries(man: dict | None, per_rel: dict, path: str = "", snap: dict | None = None) -> list[dict]:
    """`man`'s entries for `per_rel`'s files with a new deletion-vector
    SIDECAR ref appended (per_rel: {rel: (sidecar_rel, n_new)}).  The
    sidecars were already written by EXECUTORS — this merge is pure
    metadata: append the ref and bump the additive n_deletes count.

    Additivity holds only SERIALLY (the mutation scan subtracts the
    vectors it saw, so re-deleting an already-masked row is
    impossible); two CONCURRENT mutations that both scanned generation
    N can mark overlapping positions, and blindly adding the second
    count would overstate n_deletes (count_rows / DESCRIBE DETAIL /
    reorg's dv_fraction go wrong — reads stay correct, np.unique).
    So when `snap` (the scan-time DV state, _dv_snapshot) shows a CAS
    retry is merging onto an entry someone else changed, n_deletes is
    recomputed from the DECODED union — rare race path, bounded by
    that one file's row count.  Takes the manifest as an argument —
    callers inside _flip_generation's CAS loop must re-merge against
    each freshly-read manifest, never a pre-race snapshot."""
    from strawboat_spark.sources.datasource import (
        ManifestConflictError,
        dv_positions,
        entry_abs,
        entry_dv_count,
        read_dv_sidecar,
    )

    by_rel = {e["path"]: e for e in (man or {"entries": []})["entries"]}
    out = []
    for rel, (sidecar_rel, n_new) in per_rel.items():
        if rel not in by_rel:
            # a concurrent optimize/compact/COW rewrite removed this
            # marked file between our scan and the flip — the pending
            # row ordinals are stale by construction, so surface a
            # conflict, not an internal KeyError
            raise ManifestConflictError(
                f"DV-marked file {rel!r} no longer in the manifest "
                "(concurrent rewrite of a file with pending deletion "
                "vectors); re-run the mutation against the new generation"
            )
        e = dict(by_rel[rel])
        state = (e.get("deletes") or None, tuple(e.get("deletes_refs") or ()))
        if snap is not None and state != snap.get(rel):
            # raced: a concurrent mutation's vector may overlap ours
            pos = set(dv_positions(path, e))
            pos.update(read_dv_sidecar(entry_abs(path, sidecar_rel)))
            e["n_deletes"] = len(pos)
        else:
            # counts only — entry_dv_count never touches refs' content
            e["n_deletes"] = entry_dv_count("", e) + int(n_new)
        e["deletes_refs"] = list(e.get("deletes_refs") or ()) + [sidecar_rel]
        out.append(e)
    return out


def _logical_columns(path: str) -> list[str]:
    """The table's logical column NAMES straight from the manifest +
    first footer — the same resolution order StrawboatDataSource.schema()
    uses (stored columns under logical names, then declared columns,
    then hive partition columns), without spawning the plan-time Python
    runner a `spark.read...load(path)` probe costs per call."""
    from strawboat_spark.sources.datasource import (
        _cached_footer,
        _infer_partition_fields,
        _list_files,
        _manifest_for,
        _to_logical_schema,
        column_mapping,
        declared_columns,
    )

    man = _manifest_for(path, None)
    files = _list_files(path, None, man=man)
    if not files:
        raise ValueError(f"strawboat: no files under {path}")
    arrow_schema, _ = _cached_footer(files[0])
    names = list(_to_logical_schema(arrow_schema, column_mapping(path, man=man)).names)
    for dname in declared_columns(path, man=man):
        if dname not in names:
            names.append(dname)
    for pname, _tp in _infer_partition_fields(path, files, man=man):
        if pname not in names:
            names.append(pname)
    return names


def _condition_columns(spark, path: str, condition: str) -> list[str] | None:
    """Table columns `condition` may reference, by conservative token
    match (bare identifiers + backtick-quoted names — the only two ways
    a SQL condition can name a column).  Superset-safe: a keeper that
    isn't really referenced only costs its decode; a column can never
    be MISSED because any reference is itself an identifier token or a
    backticked segment.  Returns None ("don't prune") when every column
    matches anyway or the schema probe fails."""
    import re

    try:
        cols = _logical_columns(path)
    except Exception:  # noqa: BLE001 - pruning is best-effort
        return None
    toks = {t.lower() for t in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", condition)}
    toks.update(q.lower() for q in re.findall(r"`([^`]*)`", condition))
    keep = [c for c in cols if c.lower() in toks]
    if len(keep) == len(cols):
        return None
    return keep


def _delete_mor(spark, path: str, condition: str) -> dict:
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import publish_manifest, read_manifest

    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)
    snap = _dv_snapshot(read_manifest(path))
    # ONE stats-pruned scan: matched (file, physical ordinal) pairs,
    # grouped per file on the EXECUTORS, which write one deletion-vector
    # sidecar blob each (content-addressed — task retries idempotent).
    # The driver collects only {file, sidecar ref, count} — one
    # metadata row per marked FILE, never row positions: a 1% DELETE
    # at 100 TB is ~10^9 ordinals, which must not transit the driver.
    rd = (
        spark.read.format("strawboat")
        .option("with_file_path", "true")
        .option("with_row_pos", "true")
    )
    # r17 opt (guide §6: pruning must reach the scan): the marking scan
    # needs only the columns `condition` references plus the two
    # provenance columns — the Python DataSource API can't learn this
    # from the plan, so project via the explicit columns option.  A 2-
    # column predicate over a 16-column table then decodes 2 leaves,
    # not 16 (at a 100 TB delete that is the whole scan cost).
    cond_cols = _condition_columns(spark, path, condition)
    if cond_cols is not None:
        rd = rd.option(
            "columns", ",".join([*cond_cols, "_strawboat_file", "_strawboat_pos"])
        )
    df = rd.load(path)
    hit = _write_dv_sidecars(
        df.filter(F.expr(condition)).select("_strawboat_file", "_strawboat_pos"), path
    )
    if not hit:
        return {"files_marked": 0, "rows_deleted": 0}
    per_rel = {_rel(r["file"], path): (r["sidecar"], int(r["n"])) for r in hit}
    _flip_generation(
        path, set(per_rel),
        lambda man: _dv_entries(man, per_rel, path, snap), "delete-mor"
    )
    return {"files_marked": len(per_rel), "rows_deleted": int(sum(r["n"] for r in hit))}


def _write_dv_sidecars(marked, root: str) -> list:
    """Executor-side deletion-vector construction: group `marked`
    (_strawboat_file, _strawboat_pos) by file, pack each file's
    ordinals into one sidecar blob under root/_strawboat_dv and return
    the metadata rows.  Driver-side result is bounded by the marked
    FILE count (manifest-scale), not the row count.

    The grouping runs JVM-side (groupBy + sort_array(collect_set) —
    partial aggregation, one binary shuffle); Python sees ONE Arrow
    row per file with its already-sorted position array and only packs
    bytes + writes the blob.  The r9 applyInPandas formulation shipped
    every matched ROW (file-path string included) through Arrow into
    Python workers — at a 1% delete on 100 TB that is ~10^9 row
    transfers vs file-count rows here (and it was the measured
    r8→r9 uptick on the bench gate at sf0.1)."""
    import pyspark.sql.functions as F

    def _pack_iter(batches):
        import pandas as pd

        from strawboat_spark.sources.datasource import write_dv_sidecar

        for pdf in batches:
            out = []
            for file, pos in zip(pdf["file"], pdf["positions"]):
                rel = write_dv_sidecar(root, [int(v) for v in pos])
                out.append((file, rel, len(pos)))
            yield pd.DataFrame(out, columns=["file", "sidecar", "n"])

    agged = marked.groupBy(F.col("_strawboat_file").alias("file")).agg(
        F.sort_array(F.collect_set("_strawboat_pos")).alias("positions")
    )
    return agged.mapInPandas(
        _pack_iter, "file string, sidecar string, n long"
    ).collect()


def update_where(
    spark, path: str, condition: str, assignments: dict[str, str], mode: str = "cow"
) -> dict:
    """Copy-on-write UPDATE ... SET: `assignments` maps column name to
    a SQL expression applied to rows matching `condition`; same
    file-pruned rewrite shape as delete_where. Returns
    {"files_rewritten", "rows_updated"}.

    mode="mor": the Delta deletion-vector UPDATE — matched rows' old
    versions are masked by per-file deletion vectors and their updated
    versions land as NEW files, all in one generation flip; the
    untouched bulk of every affected file is never rewritten. Works on
    hive layouts too, and unlike COW it may assign PARTITION columns:
    the old version is masked in its leaf while the new one lands in
    the leaf its new values choose."""
    if mode == "mor":
        return _update_mor(spark, path, condition, assignments)
    if mode != "cow":
        raise ValueError(f"update_where mode must be 'cow' or 'mor', got {mode!r}")
    return _mutate_where(spark, path, condition, assignments)


def _update_mor(spark, path: str, condition: str, assignments: dict[str, str]) -> dict:
    import tempfile

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import publish_manifest, read_manifest

    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)
    snap = _dv_snapshot(read_manifest(path))
    part_cols = list(_part_layout(path))
    df = (
        spark.read.format("strawboat")
        .option("with_file_path", "true")
        .option("with_row_pos", "true")
        .load(path)
    )
    matched = df.filter(F.expr(condition)).persist()
    try:
        # executor-side DV sidecars (see _write_dv_sidecars): driver
        # sees one metadata row per marked file, never row positions
        hit = _write_dv_sidecars(
            matched.select("_strawboat_file", "_strawboat_pos"), path
        )
        if not hit:
            return {"files_marked": 0, "rows_updated": 0}
        data_cols = [c for c in df.columns if not c.startswith("_strawboat_")]
        # Assignment expressions CAST to the column's declared type
        # (SQL UPDATE store-assignment; COW gets this implicitly from
        # its when/otherwise + rewrite path). Without the cast an int
        # literal lands an int32 replacement file in a bigint column
        # and the table-wide read schema silently flips to the newest
        # footer's type — caught as a flaky parquet-sink mismatch in
        # the CDF streaming test (r12).
        updated_rows = matched.select(
            *[
                F.expr(assignments[c]).cast(df.schema[c].dataType).alias(c)
                if c in assignments
                else F.col(c)
                for c in data_cols
            ]
        )
        # land the replacement rows as committed files in a tmp table,
        # then adopt them — invisible until the single CAS flip below
        tmp = tempfile.mkdtemp(prefix="strawboat_morupd_") + "/t"
        w = updated_rows.write.format("strawboat").mode("overwrite")
        land = _landing_layout(path, part_cols)
        if land:
            # hive layouts: replacement rows land in their (possibly
            # NEW) leaves — unlike COW, a MOR update may assign
            # partition columns, because the old version is masked
            # wherever it lives and the new one lands where it belongs
            w = w.option("partition_by", ",".join(land))
        w.save(tmp)
        new_entries = _adopt_tmp(path, tmp)

        per_rel = {_rel(r["file"], path): (r["sidecar"], int(r["n"])) for r in hit}
        _flip_generation(
            path,
            set(per_rel),
            lambda man: _dv_entries(man, per_rel, path, snap) + new_entries,
            "update-mor",
        )
        return {
            "files_marked": len(per_rel),
            "rows_updated": int(sum(r["n"] for r in hit)),
        }
    finally:
        matched.unpersist()


def _mutate_where(spark, path: str, condition: str, assignments: dict[str, str] | None) -> dict:
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import publish_manifest, read_manifest

    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)
    key = "rows_deleted" if assignments is None else "rows_updated"
    # Hive layout: partition columns live in directory names, not pages.
    # Both the candidate scan and the per-leaf rewrite reattach them as
    # constants (the datasource does), so `condition` can reference
    # them; they are dropped again before writing back into the leaf.
    part_types = _part_layout(path)
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
    df = spark.read.format("strawboat").option("with_file_path", "true").load(path)
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
    cand_rel = sorted(_rel(f, path) for f in candidates)
    verb = "delete" if assignments is None else "update"
    dv_sigs = _pin_dv_sigs(path, read_manifest(path), cand_rel, verb)

    matched = F.coalesce(F.col("__m"), F.lit(False))

    def _rewrite(src, drop):
        src = src.withColumn("__m", cond)
        if assignments is None:
            return src.filter(~matched).drop(*drop)
        # cast back to the column's declared type (store-assignment) —
        # the when/otherwise coercion can WIDEN (v/2 -> double) and the
        # rewritten file's footer must keep the table schema, same bug
        # class as the r12 _update_mor / merge_when fixes
        return src.select(
            *[
                F.when(matched, F.expr(expr))
                .otherwise(F.col(c))
                .cast(df.schema[c].dataType)
                .alias(c)
                if (expr := assignments.get(c)) is not None
                else F.col(c)
                for c in src.columns
                if c not in drop
            ]
        )

    # Rewrites group by leaf directory so every output file still holds
    # exactly one partition value (flat tables have one group: the root)
    by_leaf: dict[str, list[str]] = {}
    for rel in cand_rel:
        by_leaf.setdefault(os.path.dirname(rel), []).append(rel)
    moved = []
    for reldir, rels in sorted(by_leaf.items()):
        leaf = os.path.join(path, reldir) if reldir else path
        tmp = leaf.rstrip("/") + ".__mutate__"
        get_fs(tmp).remove_tree(tmp)  # crashed-run leftovers
        out = _rewrite(
            _read_files(spark, path, rels), ["__m", *_leaf_dir_cols(reldir)]
        )
        out.write.format("strawboat").mode("overwrite").save(tmp)
        moved += _adopt_tmp(path, tmp, dest_dir=leaf)
    _flip_generation(
        path, set(cand_rel), _dv_guarded_adds(path, dv_sigs, moved, verb), verb
    )
    return {"files_rewritten": len(candidates), key: n_rows}


def _cast_source_to_target(source, target_schema, cols):
    """Store-assignment for MERGE sources (Delta's implicit casting):
    overlapping columns are cast to the target's declared types, so
    files adopted from a source-typed write can never flip the table's
    read schema (an int32/double source column used to — same bug
    class as the r12 update/merge_when assignment fix). Non-target
    columns (auto_evolve already declared them upstream) pass
    through untouched."""
    import pyspark.sql.functions as F

    types = {f.name: f.dataType for f in target_schema.fields}
    return source.select(
        *[
            F.col(c).cast(types[c]).alias(c) if c in cols and c in types else F.col(c)
            for c in source.columns
        ]
    )


def merge_upsert(spark, path: str, source, on: list[str], mode: str = "cow") -> dict:
    """MERGE (upsert): target rows whose `on` key appears in `source`
    are replaced by the source row; unmatched source rows are
    inserted. One atomic manifest flip covers both, so readers see
    either the pre-merge or the post-merge table; the pre-merge
    generation stays time-travel-able until vacuum().

    Works on flat AND hive-partitioned tables: candidate files are
    rewritten per leaf, and the source lands partitioned by the
    table's layout; partition columns in `on` prune whole leaves
    before the candidate scan even reads a footer.

    Scale shape: candidate files are found with the `_strawboat_file`
    provenance scan PRE-FILTERED by the source keys' min/max bounds —
    a pushed BETWEEN that lets file/page stats prune the untouched
    bulk before the key semi join. The source keys are broadcast only
    when few (<= STRAWBOAT_MERGE_BROADCAST_MAX_KEYS, default 500k);
    a large backfill source runs shuffled joins under AQE instead of
    OOMing the driver. Returns
    {"files_rewritten", "rows_updated", "rows_inserted"} —
    rows_updated counts replaced TARGET rows, rows_inserted counts
    SOURCE rows whose key had no target match (correct under
    duplicate keys on either side).

    mode="mor": matched target rows are masked by deletion vectors
    instead of rewritten (no candidate file touched) and the source
    lands as new files (partitioned by the hive layout when present)
    — one flip, like update_where's MOR mode."""
    if mode == "mor":
        return _merge_mor(spark, path, source, on)
    if mode != "cow":
        raise ValueError(f"merge_upsert mode must be 'cow' or 'mor', got {mode!r}")
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import publish_manifest, read_manifest

    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)
    part_types = _part_layout(path)
    part_cols = list(part_types)
    source = source.cache()
    n_source = source.count()
    if n_source == 0:
        source.unpersist()
        return {"files_rewritten": 0, "rows_updated": 0, "rows_inserted": 0}
    df = spark.read.format("strawboat").option("with_file_path", "true").load(path)
    out_cols = [c for c in df.columns if c != "_strawboat_file"]
    missing = [c for c in out_cols if c not in source.columns]
    if missing:
        raise ValueError(f"merge_upsert: source is missing target columns {missing}")
    source = _cast_source_to_target(source, df.schema, set(out_cols))
    bounds = source.agg(
        *[F.min(c).alias(f"lo_{c}") for c in on], *[F.max(c).alias(f"hi_{c}") for c in on]
    ).collect()[0]
    keys = source.select(*on).distinct().cache()
    # broadcast gate from the ALREADY-COUNTED source size (n_keys <=
    # n_source, so a small source is always safe to broadcast): the
    # separate keys.count() job this replaced cost one full source
    # scan per merge.  A dup-heavy large source now takes the shuffle
    # join where it used to broadcast — the conservative direction.
    jkeys = F.broadcast(keys) if n_source <= _merge_broadcast_max_keys() else keys
    for c in on:
        # sound pre-filter: every match lies inside the source bounds;
        # this is what the page/file stats (and hive partition values)
        # can prune on
        df = df.filter(F.col(c).between(F.lit(bounds[f"lo_{c}"]), F.lit(bounds[f"hi_{c}"])))
    hit = (
        df.join(jkeys, on=on, how="leftsemi")
        .groupBy("_strawboat_file")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    candidates = sorted(r["_strawboat_file"] for r in hit)
    rows_updated = sum(r["n"] for r in hit)
    cand_rel = sorted(_rel(f, path) for f in candidates)
    dv_sigs = _pin_dv_sigs(path, read_manifest(path), cand_rel, "merge_upsert")
    moved = []
    matched_src = 0
    if candidates:
        # dup-key-safe stats: a source row whose key already exists in
        # the target is an update, the rest are inserts (every matched
        # target row lives in a candidate file by construction)
        tgt_keys = _read_files(spark, path, cand_rel).select(*on).distinct()
        matched_src = source.join(tgt_keys, on=on, how="leftsemi").count()
        by_leaf: dict[str, list[str]] = {}
        for rel in cand_rel:
            by_leaf.setdefault(os.path.dirname(rel), []).append(rel)
        for reldir, rels in sorted(by_leaf.items()):
            leaf = os.path.join(path, reldir) if reldir else path
            tmp = leaf.rstrip("/") + ".__merge__"
            get_fs(tmp).remove_tree(tmp)
            leaf_cols = set(_leaf_dir_cols(reldir))
            survivors = (
                _read_files(spark, path, rels)
                .join(jkeys, on=on, how="left_anti")
                .select(*[c for c in out_cols if c not in leaf_cols])
            )
            survivors.write.format("strawboat").mode("overwrite").save(tmp)
            moved += _adopt_tmp(path, tmp, dest_dir=leaf)
    # the source (updates + inserts together) lands as fresh files,
    # partitioned by the table's (declared, post-evolution) layout
    tmp_src = path.rstrip("/") + ".__merge_src__"
    get_fs(tmp_src).remove_tree(tmp_src)
    w = source.select(*out_cols).write.format("strawboat").mode("overwrite")
    land = _landing_layout(path, part_cols)
    if land:
        w = w.option("partition_by", ",".join(land))
    w.save(tmp_src)
    moved += _adopt_tmp(path, tmp_src)
    _flip_generation(
        path,
        set(cand_rel),
        _dv_guarded_adds(path, dv_sigs, moved, "merge_upsert"),
        "merge_upsert",
    )
    keys.unpersist()
    source.unpersist()
    return {
        "files_rewritten": len(candidates),
        "rows_updated": rows_updated,
        "rows_inserted": n_source - matched_src,
    }


def _merge_mor(spark, path: str, source, on: list[str]) -> dict:
    """Deletion-vector MERGE: the target side of every matched key is
    masked per file (physical ordinals from one bounds-pre-filtered
    semi-join scan), the full source lands as new files, and one CAS
    flip publishes both. Same size-gated key broadcast and BETWEEN
    stats pre-filter as the COW path."""
    import tempfile

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import publish_manifest, read_manifest

    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)
    snap = _dv_snapshot(read_manifest(path))
    part_cols = list(_part_layout(path))
    source = source.cache()
    n_source = source.count()
    if n_source == 0:
        source.unpersist()
        return {"files_marked": 0, "rows_updated": 0, "rows_inserted": 0}
    df = (
        spark.read.format("strawboat")
        .option("with_file_path", "true")
        .option("with_row_pos", "true")
        .load(path)
    )
    out_cols = [c for c in df.columns if not c.startswith("_strawboat_")]
    missing = [c for c in out_cols if c not in source.columns]
    if missing:
        raise ValueError(f"merge_upsert: source is missing target columns {missing}")
    source = _cast_source_to_target(source, df.schema, set(out_cols))
    bounds = source.agg(
        *[F.min(c).alias(f"lo_{c}") for c in on], *[F.max(c).alias(f"hi_{c}") for c in on]
    ).collect()[0]
    keys = source.select(*on).distinct().cache()
    # size gate from the already-counted source (see merge_upsert): no
    # extra distinct-count job per merge
    jkeys = F.broadcast(keys) if n_source <= _merge_broadcast_max_keys() else keys
    for c in on:
        df = df.filter(F.col(c).between(F.lit(bounds[f"lo_{c}"]), F.lit(bounds[f"hi_{c}"])))
    matched = df.join(jkeys, on=on, how="leftsemi").persist()
    try:
        # executor-side DV sidecars (see _write_dv_sidecars): driver
        # sees one metadata row per marked file, never row positions
        hit = _write_dv_sidecars(
            matched.select("_strawboat_file", "_strawboat_pos"), path
        )
        rows_updated = int(sum(r["n"] for r in hit))
        matched_src = 0
        if hit:
            tgt_keys = matched.select(*on).distinct()
            matched_src = source.join(tgt_keys, on=on, how="leftsemi").count()

        tmp = tempfile.mkdtemp(prefix="strawboat_mormrg_") + "/t"
        w = source.select(*out_cols).write.format("strawboat").mode("overwrite")
        land = _landing_layout(path, part_cols)
        if land:
            w = w.option("partition_by", ",".join(land))
        w.save(tmp)
        new_entries = _adopt_tmp(path, tmp)

        per_rel = {_rel(r["file"], path): (r["sidecar"], int(r["n"])) for r in hit}
        _flip_generation(
            path,
            set(per_rel),
            lambda man: _dv_entries(man, per_rel, path, snap) + new_entries,
            "merge-mor",
        )
        return {
            "files_marked": len(per_rel),
            "rows_updated": rows_updated,
            "rows_inserted": n_source - matched_src,
        }
    finally:
        matched.unpersist()
        keys.unpersist()
        source.unpersist()


def optimize(
    spark,
    path: str,
    zorder_by: list[str] | None = None,
    target_files: int = 4,
    page_size: int = 8192,
    where: str | None = None,
) -> dict:
    """OPTIMIZE [WHERE <partition predicate>] [ZORDER BY ...] — the
    Delta maintenance verb, per LEAF on hive layouts:

    - `zorder_by`: each (selected) leaf's files rewrite Z-ORDERED on
      those columns (operators/layout.py) — clustering WITHIN a
      partition, preserving the layout and partition pruning (Delta's
      per-partition ZORDER semantics; the r7 flat-table-only refusal
      is closed by clustering leaf-locally).
    - `where`: a SQL predicate over PARTITION COLUMNS ONLY selecting
      which leaves to rewrite — at a 100 TB table you optimize the
      partitions a backfill touched, not the whole table. Predicates
      referencing non-partition columns are rejected at analysis time
      (Delta raises the same way).

    All selected leaves swap in ONE atomic manifest generation flip:
    concurrent readers see the old files until the manifest PUT, the
    new ones after, and the pre-optimize generation stays readable
    until vacuum().  Returns {"before", "after", "leaves"}.
    """
    from strawboat_spark.operators.layout import write_zordered
    from strawboat_spark.sources.datasource import (
        _infer_partition_fields,
        _list_files,
        publish_manifest,
        read_manifest,
    )

    if not zorder_by and where is None:
        return compact(spark, path, target_files)
    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)  # snapshot the old generation first
    root_man = read_manifest(path) or {"entries": []}
    dv_sigs = {e["path"]: _entry_dv_sig(e) for e in root_man["entries"]}
    part_fields = _infer_partition_fields(path, _list_files(path))
    part_cols = [c for c, _ in part_fields]
    if zorder_by:
        bad = [c for c in zorder_by if c in part_cols]
        if bad:
            raise ValueError(
                f"optimize: zorder_by columns {bad} are partition columns "
                f"(every row in a leaf shares their value — nothing to cluster)"
            )

    by_leaf: dict[str, list[str]] = {}
    for e in root_man["entries"]:
        by_leaf.setdefault(os.path.dirname(e["path"]), []).append(e["path"])

    selected = set(by_leaf)
    if where is not None:
        selected = _leaves_matching_where(
            spark, "optimize", where, set(by_leaf), part_fields
        )

    before = 0
    moved: list[dict] = []
    drop: set[str] = set()
    for leaf in sorted(selected):
        rels = by_leaf[leaf]
        if not zorder_by and len(rels) <= target_files:
            continue  # scoped compact: already right-sized
        before += len(rels)
        leaf_dir = os.path.join(path, leaf) if leaf else path
        tmp = leaf_dir.rstrip("/") + ".__optimize__"
        get_fs(tmp).remove_tree(tmp)
        df = _read_files(spark, path, sorted(rels))
        leaf_cols = set(_leaf_dir_cols(leaf))
        stored = [c for c in df.columns if c not in leaf_cols]
        if zorder_by and len(zorder_by) == 1:
            # 1-D Z-order degenerates to a range-clustered sort
            (
                df.select(*stored)
                .repartitionByRange(target_files, zorder_by[0])
                .sortWithinPartitions(zorder_by[0])
                .write.format("strawboat")
                .option("page_size", str(page_size))
                .mode("overwrite")
                .save(tmp)
            )
        elif zorder_by:
            write_zordered(
                df.select(*stored), tmp, *zorder_by,
                n_files=target_files, page_size=page_size,
            )
        else:
            df.select(*stored).coalesce(target_files).write.format(
                "strawboat"
            ).option("page_size", str(page_size)).mode("overwrite").save(tmp)
        moved += _adopt_tmp(path, tmp, dest_dir=leaf_dir)
        drop |= set(rels)
    if drop:
        _flip_generation(
            path,
            drop,
            _dv_guarded_adds(path, {r: dv_sigs[r] for r in drop}, moved, "optimize"),
            "optimize",
        )
    return {"before": before, "after": len(moved), "leaves": len(selected)}


def rewrite_epoch(
    spark,
    path: str,
    target_files: int = 4,
    page_size: int = 8192,
    where: str | None = None,
) -> dict:
    """Iceberg `rewrite_data_files` analog for partition-spec
    evolution: rewrite every data file whose DIRECTORY layout differs
    from the table's DECLARED spec so its rows land under the declared
    hive directories — retiring the old layout epoch(s).

    set_partition_layout() is metadata-only by design: files written
    under earlier specs keep their layout, and a filter on the evolved
    column falls back to page-stats pruning for them.  At 100 TB a
    mixed-epoch table that stays mixed forever slowly loses directory
    pruning on the old epochs' files; this verb migrates them — after
    the flip every surviving file encodes the declared layout and a
    filter on a declared column directory-prunes the whole table
    again.  (Metadata-driven skipping is the reference's core
    read-side idea, src/read/reader.rs:91-146; this restores it for
    migrated data.)

    Mechanics: old-epoch entries are detected from the manifest alone
    (a leaf dir whose `k=` components differ from the declared spec —
    zero IO); they read back in ONE `files`-pinned scan, where each
    file renders its partition columns from its own directory or
    stored pages and DELETION VECTORS APPLY — MOR deletes materialize
    in the rewrite and their sidecar refs retire with the dropped
    entries.  Rows land hive-partitioned by the declared spec in a tmp
    table (`repartition(target_files, *spec)` clusters each leaf value
    into one task → one file per migrated leaf) and adopt in ONE
    atomic CAS generation flip; conforming files keep their entries
    with zero IO, pre-rewrite generations stay time-travel-readable
    until vacuum().  A skewed leaf value is one write task here —
    right-size it afterwards with optimize(where=...), which scopes by
    directory.

    `where=` scopes the migration (same directory-epoch discipline as
    optimize): a SQL predicate over directory columns selects which
    OLD-epoch leaves migrate in THIS call, so a 100 TB layout
    migration proceeds partition-by-partition — one bounded rewrite
    and one CAS flip per scope, the manifest consistent (mixed but
    correct) between calls, and a final bare call sweeps stragglers.
    Old leaves that do not encode a referenced column carry NULL for
    it (the pre-evolution root epoch is selected by `where="lang IS
    NULL"`-style predicates, never by a value match).

    Bucketed tables: a conforming post-evolution leaf carries the
    declared columns PLUS the bucket directory (`lang=v/__bucket=n`);
    the rewrite re-derives the bucket id for migrated rows with the
    same crc32 expression appends use, so bucket point-lookup pruning
    survives the migration.

    Concurrency: the flip re-reads the head manifest and aborts
    (ManifestConflictError) if any pinned old entry gained, lost, or
    changed deletion vectors — or vanished — since the pinned scan; a
    blind flip there would resurrect concurrently-deleted rows.  On
    abort the tmp files already adopted into the table dir are
    unreferenced by any generation (invisible to readers); re-run the
    verb after the concurrent writer settles.
    """
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import (
        bucket_spec,
        partition_layout,
        read_manifest,
        transform_spec,
    )

    register(spark)
    man = read_manifest(path)
    if man is None:
        raise ValueError(f"rewrite_epoch: {path} has no committed data")
    if transform_spec(path) is not None:
        raise ValueError(
            "rewrite_epoch: table has a hidden-partitioning transform; "
            "its days()/months() layout is the only authority — nothing "
            "to migrate"
        )
    declared = partition_layout(path)
    if not declared:
        raise ValueError(
            "rewrite_epoch: no declared partition layout "
            "(set_partition_layout first; compact() bin-packs "
            "unpartitioned tables)"
        )
    bspec = bucket_spec(path)
    # conforming leaves on a bucketed table end in the bucket dir —
    # comparing against the declared columns alone would misclassify
    # EVERY post-evolution file as nonconforming and rewrite the whole
    # table while silently dropping the declared bucket layout
    conforming = list(declared) + ([bspec["dir_col"]] if bspec else [])
    old = [
        e
        for e in man["entries"]
        if _leaf_dir_cols(os.path.dirname(e["path"])) != conforming
    ]
    if where is not None and old:
        from strawboat_spark.sources.datasource import (
            _infer_partition_fields,
            _list_files,
            partition_layout_types,
        )

        part_fields = _infer_partition_fields(path, _list_files(path))
        # the predicate may also reference DECLARED columns no directory
        # encodes yet (a fully-unpartitioned epoch-1 table): old leaves
        # carry NULL for them, so a value match is a consistent no-op
        # rather than an analysis error
        ptypes = partition_layout_types(path)
        part_fields = list(part_fields) + [
            (c, ptypes.get(c, "string"))
            for c in declared
            if c not in {n for n, _ in part_fields}
        ]
        sel = _leaves_matching_where(
            spark,
            "rewrite_epoch",
            where,
            {os.path.dirname(e["path"]) for e in old},
            part_fields,
        )
        old = [e for e in old if os.path.dirname(e["path"]) in sel]
    if not old:
        return {"rewritten": 0, "files_added": 0, "conforming": len(man["entries"])}
    import tempfile

    rels = sorted(e["path"] for e in old)
    pinned_dv = {e["path"]: _entry_dv_sig(e) for e in old}
    df = _read_files(spark, path, rels)
    missing = [c for c in declared if c not in df.columns]
    if missing:
        raise ValueError(
            f"rewrite_epoch: declared partition column(s) {missing} "
            f"absent from the table schema"
        )
    if bspec:
        if bspec["col"] not in df.columns:
            raise ValueError(
                f"rewrite_epoch: bucket key column {bspec['col']!r} "
                f"absent from the table schema"
            )
        # same expression _apply_bucketing writes with (and the planner
        # re-hashes in Python): migrated rows land in the bucket an
        # equality lookup will probe
        df = df.drop(bspec["dir_col"]).withColumn(
            bspec["dir_col"],
            F.pmod(
                F.crc32(F.col(bspec["col"]).cast("string").cast("binary")),
                F.lit(int(bspec["n"])),
            ).cast("long"),
        )
    tmp = tempfile.mkdtemp(prefix="strawboat_epochrw_") + "/t"
    (
        df.repartition(max(1, target_files), *conforming)
        .write.format("strawboat")
        .option("partition_by", ",".join(conforming))
        .option("page_size", str(page_size))
        .mode("overwrite")
        .save(tmp)
    )
    moved = _adopt_tmp(path, tmp)
    _flip_generation(
        path,
        set(rels),
        _dv_guarded_adds(path, pinned_dv, moved, "rewrite_epoch"),
        "rewrite-epoch",
    )
    return {
        "rewritten": len(rels),
        "files_added": len(moved),
        "conforming": len(man["entries"]) - len(old),
    }


def merge_when(
    spark,
    path: str,
    source,
    on: list[str],
    matched_update: tuple[str | None, dict[str, str]] | None = None,
    matched_delete: str | None = None,
    not_matched_insert: str | None = None,
) -> dict:
    """Conditional MERGE — the full Delta clause surface:

      WHEN MATCHED AND <matched_delete>            THEN DELETE
      WHEN MATCHED AND <matched_update[0]>         THEN UPDATE SET ...
      WHEN NOT MATCHED [BY TARGET] AND <not_matched_insert> THEN INSERT

    Clause conditions and UPDATE expressions see the target row's
    columns under their own names and the source row's columns as
    `src_<col>`. Clause order is Delta's: DELETE wins over UPDATE for
    a row matching both; a matched row satisfying neither clause is
    kept unchanged. `not_matched_insert=None` inserts nothing;
    pass "true" for unconditional inserts.

    Delta's determinism guard is enforced: a target row matched by
    MORE THAN ONE source row raises (the merge would otherwise be
    order-dependent).

    Scale shape: same machinery as merge_upsert — source-key bounds
    pre-filter the candidate scan, the key broadcast is size-gated,
    candidate files rewrite as ONE `files`-pinned scan per leaf, and
    everything publishes in ONE generation flip. Assignments to hive
    partition columns are rejected (rows may not move leaves under
    COW; use update(mode='mor') for that)."""
    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import publish_manifest, read_manifest

    if matched_update is None and matched_delete is None and not_matched_insert is None:
        raise ValueError("merge_when: at least one WHEN clause is required")
    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)
    part_cols = list(_part_layout(path))
    if matched_update:
        bad = [c for c in matched_update[1] if c in part_cols]
        if bad:
            raise ValueError(
                f"merge_when: COW cannot assign partition columns {bad} "
                f"(rows may not move leaves); use update(mode='mor')"
            )
    source = source.cache()
    n_source = source.count()
    if n_source == 0:
        source.unpersist()
        return {"files_rewritten": 0, "rows_deleted": 0, "rows_updated": 0, "rows_inserted": 0}
    df = spark.read.format("strawboat").option("with_file_path", "true").load(path)
    out_cols = [c for c in df.columns if c != "_strawboat_file"]
    # store-assignment for the source (Delta MERGE implicit casting):
    # the insert leg adopts source-typed files, and clause expressions
    # see src_<col> — both must carry the target's declared types
    source = _cast_source_to_target(source, df.schema, set(out_cols))
    src = source.select([F.col(c).alias(f"src_{c}") for c in source.columns])
    src_on = [f"src_{c}" for c in on]
    bounds = source.agg(
        *[F.min(c).alias(f"lo_{c}") for c in on], *[F.max(c).alias(f"hi_{c}") for c in on]
    ).collect()[0]
    keys = source.select(*on).distinct().cache()
    # size gate from the already-counted source (see merge_upsert): no
    # extra distinct-count job per merge
    jkeys = F.broadcast(keys) if n_source <= _merge_broadcast_max_keys() else keys
    pre = df
    for c in on:
        pre = pre.filter(F.col(c).between(F.lit(bounds[f"lo_{c}"]), F.lit(bounds[f"hi_{c}"])))
    hit = (
        pre.join(jkeys, on=on, how="leftsemi")
        .groupBy("_strawboat_file")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    cand_rel = sorted(_rel(r["_strawboat_file"], path) for r in hit)
    dv_sigs = _pin_dv_sigs(path, read_manifest(path), cand_rel, "merge_when")

    jsrc = F.broadcast(src) if n_source <= _merge_broadcast_max_keys() else src
    rows_deleted = rows_updated = 0
    moved = []
    if cand_rel:
        # Delta determinism guard: >1 source match for one target row
        dup = (
            # the count alias must not shadow a user key column (a key
            # literally named 'k' made this ambiguous pre-r9)
            source.groupBy(*on).agg(F.count(F.lit(1)).alias("__strawboat_dup_n"))
            .filter(F.col("__strawboat_dup_n") > 1)
            .join(pre.select(*on).distinct(), on=on, how="leftsemi")
            .take(1)
        )
        if dup:
            raise ValueError(
                f"merge_when: multiple source rows match one target row "
                f"(e.g. key {tuple(dup[0][c] for c in on)!r}); the merge "
                f"would be nondeterministic (Delta raises here too)"
            )
        del_cond = F.expr(matched_delete) if matched_delete else F.lit(False)
        upd_cond = (
            F.expr(matched_update[0]) if matched_update and matched_update[0] else F.lit(True)
        ) if matched_update else F.lit(False)
        by_leaf: dict[str, list[str]] = {}
        for rel in cand_rel:
            by_leaf.setdefault(os.path.dirname(rel), []).append(rel)
        for reldir, rels in sorted(by_leaf.items()):
            leaf = os.path.join(path, reldir) if reldir else path
            tmp = leaf.rstrip("/") + ".__merge__"
            get_fs(tmp).remove_tree(tmp)
            joined = _read_files(spark, path, rels).join(
                jsrc, on=[F.col(a) == F.col(b) for a, b in zip(on, src_on)], how="left"
            )
            matched = F.col(src_on[0]).isNotNull()
            counts = joined.agg(
                F.sum((matched & del_cond).cast("long")).alias("d"),
                F.sum((matched & ~del_cond & upd_cond).cast("long")).alias("u"),
            ).collect()[0]
            rows_deleted += int(counts["d"] or 0)
            rows_updated += int(counts["u"] or 0)
            kept = joined.filter(~(matched & del_cond))
            # the when/otherwise coerces to the COMMON type (int+bigint
            # -> bigint, but bigint+double -> double), so the result is
            # cast back to the column's declared type — SQL UPDATE
            # store-assignment; without it a widening expression (v/2)
            # flips the table's read schema to the newest footer's
            # type (same bug class as the r12 _update_mor fix)
            leaf_cols = set(_leaf_dir_cols(reldir))
            outs = [
                F.when(
                    matched & upd_cond, F.expr(matched_update[1][c])
                ).otherwise(F.col(c)).cast(df.schema[c].dataType).alias(c)
                if matched_update and c in matched_update[1]
                else F.col(c)
                for c in out_cols
                if c not in leaf_cols
            ]
            kept.select(*outs).write.format("strawboat").mode("overwrite").save(tmp)
            moved += _adopt_tmp(path, tmp, dest_dir=leaf)

    rows_inserted = 0
    if not_matched_insert is not None:
        tgt_keys = (
            _read_files(spark, path, cand_rel).select(*on).distinct()
            if cand_rel
            else None
        )
        ins = source
        if tgt_keys is not None:
            ins = ins.join(tgt_keys, on=on, how="left_anti")
        # the insert clause sees plain source column names (there is no
        # target row to alias against)
        ins = ins.filter(F.expr(not_matched_insert))
        missing = [c for c in out_cols if c not in source.columns]
        if missing:
            raise ValueError(f"merge_when: source is missing insert columns {missing}")
        rows_inserted = ins.count()
        if rows_inserted:
            tmp_src = path.rstrip("/") + ".__merge_src__"
            get_fs(tmp_src).remove_tree(tmp_src)
            w = ins.select(*out_cols).write.format("strawboat").mode("overwrite")
            land = _landing_layout(path, part_cols)
            if land:
                w = w.option("partition_by", ",".join(land))
            w.save(tmp_src)
            moved += _adopt_tmp(path, tmp_src)

    _flip_generation(
        path,
        set(cand_rel),
        _dv_guarded_adds(path, dv_sigs, moved, "merge_when"),
        "merge_when",
    )
    keys.unpersist()
    source.unpersist()
    return {
        "files_rewritten": len(cand_rel),
        "rows_deleted": rows_deleted,
        "rows_updated": rows_updated,
        "rows_inserted": rows_inserted,
    }


def reorg_purge(spark, path: str, threshold: float = 0.2) -> dict:
    """Delta `REORG TABLE ... APPLY (PURGE)` analog: rewrite ONLY the
    files whose deletion-vector fraction is >= `threshold`,
    materializing their deletes into clean files (no vectors); every
    other file keeps its exact manifest entry with ZERO IO.

    The 100 TB read-amplification lever for MOR tables: each masked row
    still costs decode+filter on every scan, so once a file is
    mostly-deleted it should be rewritten — but only that file.
    Candidate selection is METADATA-only (entry n_deletes vs footer
    num_rows — no data pages read to decide); the rewrite is one
    `files`-pinned DV-subtracting scan per leaf; ONE CAS flip publishes
    all rewrites (old files retained for time travel until vacuum).

    Returns {"files_rewritten", "rows_purged"}."""
    from strawboat_spark.sources.datasource import (
        _cached_footer,
        _list_files,
        entry_abs,
        entry_dv_count,
        publish_manifest,
        read_manifest,
    )

    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)
    man = read_manifest(path) or {"entries": []}
    _list_files(path)  # seeds the footer cache from the manifest
    candidates: list[str] = []
    rows_purged = 0
    for e in man["entries"]:
        n_del = entry_dv_count(path, e)
        if not n_del:
            continue
        n_rows = _cached_footer(entry_abs(path, e["path"]))[1].num_rows
        if n_rows and n_del / n_rows >= threshold:
            candidates.append(e["path"])
            rows_purged += n_del
    if not candidates:
        return {"files_rewritten": 0, "rows_purged": 0}
    # DV state of every candidate AT SCAN TIME: the rewrite below bakes
    # these vectors into clean files, so a concurrent MOR mutation that
    # commits a new ref on a candidate before our flip would be
    # silently resurrected if the static `moved` list were published
    # anyway.  The CAS callable re-checks and ABORTS instead (reorg is
    # idempotent maintenance — re-run picks up the merged state).
    snap = _dv_snapshot(man)
    by_leaf: dict[str, list[str]] = {}
    for rel in candidates:
        by_leaf.setdefault(os.path.dirname(rel), []).append(rel)
    moved: list[dict] = []
    for reldir, rels in sorted(by_leaf.items()):
        leaf = os.path.join(path, reldir) if reldir else path
        tmp = leaf.rstrip("/") + ".__mutate__"
        get_fs(tmp).remove_tree(tmp)
        live = _read_files(spark, path, sorted(rels))
        leaf_cols = set(_leaf_dir_cols(reldir))
        stored_cols = [c for c in live.columns if c not in leaf_cols]
        live.select(*stored_cols).write.format("strawboat").mode("overwrite").save(tmp)
        moved += _adopt_tmp(path, tmp, dest_dir=leaf)

    from strawboat_spark.sources.datasource import ManifestConflictError

    def _checked_moved(cur_man):
        cur = {e["path"]: e for e in (cur_man or {"entries": []})["entries"]}
        for rel in candidates:
            e = cur.get(rel)
            state = (
                None
                if e is None
                else (e.get("deletes") or None, tuple(e.get("deletes_refs") or ()))
            )
            if state != snap.get(rel):
                raise ManifestConflictError(
                    f"reorg_purge: candidate {rel!r} was mutated concurrently "
                    "(its deletion vector changed after the rewrite scan); "
                    "re-run reorg against the new generation"
                )
        return moved

    _flip_generation(path, set(candidates), _checked_moved, "reorg-purge")
    return {"files_rewritten": len(candidates), "rows_purged": int(rows_purged)}


def consolidate_dv_refs(spark, path: str, max_refs: int = 8) -> dict:
    """Deletion-vector REF consolidation: a file mutated by many small
    MOR deletes accumulates one sidecar ref per mutation, and every
    read of that file pays one ranged GET per ref.  For entries past
    `max_refs`, EXECUTORS union the vectors into ONE sidecar each
    (one task per file, bounded by that file's row count — positions
    never transit the driver) and the manifest swap is pure metadata.

    Race-safe without cross-commit coordination: the CAS callable
    re-checks each entry's ref set against the freshly-read manifest
    and SKIPS any entry a concurrent mutation touched (consolidation
    is idempotent maintenance — the next run picks it up).

    Returns {"files_consolidated", "refs_before", "refs_after"}."""
    import pandas as pd

    from strawboat_spark.sources.datasource import (
        entry_dv_refs,
        publish_manifest,
        read_manifest,
    )

    register(spark)
    if read_manifest(path) is None:
        publish_manifest(path)
    man = read_manifest(path) or {"entries": []}
    hit = [
        e
        for e in man["entries"]
        if len(e.get("deletes_refs") or ()) + (1 if e.get("deletes") else 0) > max_refs
    ]
    if not hit:
        return {"files_consolidated": 0, "refs_before": 0, "refs_after": 0}
    refs_before = sum(len(e.get("deletes_refs") or ()) for e in hit)
    work = spark.createDataFrame(
        [
            (e["path"], e.get("deletes") or "", list(e.get("deletes_refs") or ()))
            for e in hit
        ],
        "rel string, inline string, refs array<string>",
    )  # groupBy("rel") below shuffles one file per group; no extra
    # repartition (its partition count would track the hit-file count)

    def _merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from strawboat_spark.sources.datasource import (
            decode_deletes,
            entry_abs,
            read_dv_sidecar,
            write_dv_sidecar,
        )

        out = []
        for _, row in pdf.iterrows():
            pos = set(decode_deletes(row["inline"] or None))
            for r in row["refs"]:
                pos.update(read_dv_sidecar(entry_abs(path, r)))
            merged = sorted(pos)
            out.append((row["rel"], write_dv_sidecar(path, merged), len(merged)))
        return pd.DataFrame(out, columns=["rel", "sidecar", "n"])

    merged_rows = work.groupBy("rel").applyInPandas(
        lambda pdf: _merge(pdf), "rel string, sidecar string, n long"
    ).collect()
    consumed = {
        e["path"]: (e.get("deletes") or None, tuple(e.get("deletes_refs") or ()))
        for e in hit
    }
    by_rel = {r["rel"]: (r["sidecar"], int(r["n"])) for r in merged_rows}

    done = {"n": 0}

    def _swap(cur_man):
        entries = {e["path"]: e for e in (cur_man or {"entries": []})["entries"]}
        out = []
        done["n"] = 0
        for rel, (sidecar, n) in by_rel.items():
            e = entries.get(rel)
            if e is None:
                continue  # rewritten away meanwhile — nothing to swap
            cur = (e.get("deletes") or None, tuple(e.get("deletes_refs") or ()))
            if cur != consumed[rel]:
                continue  # a concurrent mutation added refs: skip this run
            ne = dict(e)
            ne.pop("deletes", None)
            ne["deletes_refs"] = [sidecar]
            ne["n_deletes"] = n
            out.append(ne)
            done["n"] += 1
        return out

    def _drops(cur_man):
        return {e["path"] for e in _swap(cur_man)}

    # one CAS flip: swapped entries replace themselves; untouched-by-us
    # (or raced) entries carry through verbatim
    from strawboat_spark.sources.datasource import (
        ManifestConflictError,
        read_manifest as _rm,
        write_manifest,
    )

    for _attempt in range(50):
        cur = _rm(path)
        swapped = _swap(cur)
        drop = {e["path"] for e in swapped}
        entries = [e for e in (cur["entries"] if cur else []) if e["path"] not in drop]
        gen = (cur.get("generation", 0) + 1) if cur else 1
        try:
            write_manifest(
                path,
                entries + swapped,
                generation=gen,
                properties=(cur or {}).get("properties") or {},
                operation="consolidate-dv",
            )
            break
        except ManifestConflictError:
            continue
    else:
        raise ManifestConflictError(f"consolidate_dv_refs({path}): lost 50 races")
    return {
        "files_consolidated": done["n"],
        "refs_before": refs_before,
        "refs_after": done["n"],
    }
