"""Ergonomic facade over the strawboat table layer.

One object per table path, wrapping the datasource (reads, appends,
time travel) and the maintenance verbs (compact / vacuum / optimize /
delete / update / merge) that operate on the CAS manifest:

    from strawboat_spark.table import Table

    t = Table(spark, "/data/events")
    t.append(df)
    t.delete("ts < '2020-01-01'")
    t.merge(updates, on=["event_id"])
    old = t.read(at_generation=3)
    t.history()        # [{generation, n_files, current}]
    t.vacuum()

Every verb is documented on its underlying function; this module adds
no behavior — it only binds (spark, path) so pipelines stop threading
them through every call.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _layout_type_family(simple: str) -> str:
    """Spark simpleString -> the partition-value family the planner's
    _cast_partition_value understands (directory names are strings;
    this decides what they parse back to)."""
    if simple in ("tinyint", "smallint", "int", "bigint"):
        return "bigint"
    if simple in ("float", "double"):
        return "double"
    return "string"


class Table:
    def __init__(self, spark: SparkSession, path: str):
        from strawboat_spark.sources.datasource import register

        register(spark)
        self.spark = spark
        self.path = path

    # -- reads ------------------------------------------------------------
    def read(
        self,
        at_generation: int | None = None,
        columns: list[str] | None = None,
        with_file_path: bool = False,
        at_timestamp=None,
    ) -> DataFrame:
        """Snapshot read.  `at_generation` = VERSION AS OF;
        `at_timestamp` = TIMESTAMP AS OF (datetime, ISO string, or unix
        seconds — resolved to the newest generation committed at or
        before it via the manifest's own commit stamp)."""
        if at_timestamp is not None:
            if at_generation is not None:
                raise ValueError("read: pass at_generation OR at_timestamp, not both")
            at_generation = self._resolve_timestamp(at_timestamp)
        from strawboat_spark.sources.datasource import ensure_active_session

        ensure_active_session(self.spark)  # thread-safe concurrent readers
        rd = self.spark.read.format("strawboat")
        if at_generation is not None:
            rd = rd.option("at_generation", str(at_generation))
        if columns:
            rd = rd.option("columns", ",".join(columns))
        if with_file_path:
            rd = rd.option("with_file_path", "true")
        return rd.load(self.path)

    def count_rows(self, at_generation: int | None = None) -> int:
        """Metadata-only COUNT(*): sums each committed file's footer
        num_rows — no data pages are read (the parquet metadata-count
        optimization; footers come from the manifest cache when one
        exists, so a warm count touches no file at all). Exactness is
        gated by `strawboat_metadata_count` against SQL COUNT(*)."""
        from strawboat_spark.sources.datasource import (
            _cached_footer,
            _deletes_by_rel,
            _list_files,
        )

        files = _list_files(self.path, at_generation)
        dmap = _deletes_by_rel(self.path, at_generation)
        return sum(
            _cached_footer(f)[1].num_rows - (dmap[f].n if f in dmap else 0)
            for f in files
        )

    def changes(self, from_generation: int, to_generation: int | None = None) -> DataFrame:
        """Change data feed between two snapshots (Delta CDF analog,
        row-level, set computed with EXCEPT ALL multiset semantics):
        returns the table rows plus a `_change_type` column of
        'insert' / 'delete'.

        FILE-PRUNED: the two generation manifests name exactly which
        data files differ, and only those files are scanned (`files`
        read option — one scan node per side). A compact/optimize that
        rewrites rows without changing them cancels out in the
        EXCEPT ALL, yielding an empty feed. Requires both generations
        retained (vacuum() retires the horizon) and an unchanged
        column set between them."""
        import json

        import pyspark.sql.functions as F

        from strawboat_spark.sources.datasource import ensure_active_session

        ensure_active_session(self.spark)  # thread-safe CDF readers

        from strawboat_spark.sources.datasource import read_manifest, read_manifest_at

        man_a = read_manifest_at(self.path, from_generation)
        if to_generation is None:
            man_b = read_manifest(self.path)
        else:
            man_b = read_manifest_at(self.path, to_generation)
        # a file "differs" when its path OR its deletion vector does —
        # a merge-on-read DELETE changes rows without changing file sets
        # (vectors compare DECODED, so legacy-list and dv1 encodings of
        # the same ordinals are equal)
        from strawboat_spark.sources.datasource import (
            decode_deletes,
            dv_positions,
            entry_dv_refs,
        )

        def _dvkey(e):
            # inline decoded (normalizes legacy-list vs dv1 encodings);
            # sidecar refs compared by PATH — content-addressed names
            # mean equal refs = equal vectors, no decode needed
            return (decode_deletes(e.get("deletes")), entry_dv_refs(self.path, e))

        ent_a = {e["path"]: e for e in man_a["entries"]}
        ent_b = {e["path"]: e for e in man_b["entries"]}

        def _differs(ea, eb):
            # fast path: identical inline + ref paths means identical
            # vectors.  When ref SETS differ the vectors may still be
            # equal — consolidate_dv_refs swaps many refs for one merged
            # sidecar without changing a single position — so fall back
            # to comparing the DECODED union (change-sized driver work,
            # only for surviving files whose refs were shuffled).
            if ea is None or eb is None:
                return True
            if _dvkey(ea) == _dvkey(eb):
                return False
            return dv_positions(self.path, ea) != dv_positions(self.path, eb)

        removed = sorted(p for p, e in ent_a.items() if _differs(e, ent_b.get(p)))
        added = sorted(p for p, e in ent_b.items() if _differs(ent_a.get(p), e))

        def _scan(files: list[str], gen: int) -> DataFrame:
            return (
                self.spark.read.format("strawboat")
                .option("at_generation", str(gen))
                .option("files", json.dumps(files))
                .load(self.path)
            )

        empty = self.read().limit(0).withColumn("_change_type", F.lit(""))
        if not removed and not added:
            return empty
        gen_b = man_b.get("generation", from_generation)
        old_rows = _scan(removed, from_generation) if removed else self.read().limit(0)
        new_rows = _scan(added, gen_b) if added else self.read().limit(0)
        # exceptAll resolves POSITIONALLY — under partition-spec
        # evolution the two sides can order columns differently (a file
        # scan appends directory-derived columns after stored ones), so
        # align both to the table's column order
        cols = self.read().columns
        old_rows = old_rows.select(*cols)
        new_rows = new_rows.select(*cols)
        inserts = new_rows.exceptAll(old_rows).withColumn("_change_type", F.lit("insert"))
        deletes = old_rows.exceptAll(new_rows).withColumn("_change_type", F.lit("delete"))
        return inserts.unionByName(deletes)

    def detail(self) -> DataFrame:
        """DESCRIBE DETAIL analog: one metadata-only row — location,
        current generation, file/row counts, total live bytes,
        partition columns, bucket spec, branch/tag/staging inventory,
        and the free-form properties as JSON.  Driver-side manifest
        walk; zero data pages read at any table size."""
        import json as _json

        from strawboat_spark.sources.datasource import (
            bucket_spec,
            read_manifest,
        )
        from strawboat_spark.sources.fileio import get_fs
        from strawboat_spark.sources.maintenance import _part_layout

        man = read_manifest(self.path)
        if man is None:
            raise ValueError(f"detail: {self.path} has no committed data")
        fs = get_fs(self.path)
        total = 0
        for e in man.get("entries", ()):
            sig = e.get("sig")
            if sig:
                total += int(sig[0])
            else:
                try:
                    from strawboat_spark.sources.datasource import entry_abs

                    total += fs.stat_sig(entry_abs(self.path, e["path"]))[0]
                except (OSError, KeyError):
                    pass
        spec = bucket_spec(self.path)
        parts = [c for c in _part_layout(self.path) if not spec or c != spec["dir_col"]]
        from strawboat_spark.sources.datasource import entry_dv_count

        n_deleted = sum(entry_dv_count(self.path, e) for e in man.get("entries", ()))
        row = (
            self.path,
            int(man.get("generation", 0)),
            int(len(man.get("entries", ()))),
            int(self.count_rows()),
            int(n_deleted),
            int(total),
            parts,
            None if spec is None else _json.dumps(spec, sort_keys=True),
            self.branches(),
            sorted(self.tags()),
            self.staged_ids(),
            _json.dumps(self.properties(), sort_keys=True),
        )
        return self.spark.createDataFrame(
            [row],
            "location string, generation long, n_files long, n_rows long, "
            "n_deleted_rows long, size_bytes long, partition_columns array<string>, "
            "bucket_spec string, branches array<string>, tags array<string>, "
            "staged array<string>, properties string",
        )

    def files(self, at_generation: int | None = None) -> DataFrame:
        """Metadata table (Iceberg `.files` analog): one row per
        committed data file — path, footer row count, deletion-vector
        size, live rows, and size signature — built driver-side from
        the generation manifest (footers come from its embedded cache;
        no data pages read). Bounded by the file count."""
        from strawboat_spark.sources.datasource import (
            _cached_footer,
            _deletes_by_rel,
            _list_files,
        )

        files = _list_files(self.path, at_generation)
        dmap = _deletes_by_rel(self.path, at_generation)
        rows = []
        for f in sorted(files):
            meta = _cached_footer(f)[1]
            n_del = dmap[f].n if f in dmap else 0
            rel = os.path.relpath(f, self.path)
            rows.append(
                (
                    # external (shallow-clone) references display by
                    # their stored absolute path, not a ../ relpath
                    f if rel.startswith("..") else rel,
                    int(meta.num_rows),
                    n_del,
                    int(meta.num_rows) - n_del,
                    len(meta.leaves[0].pages) if meta.leaves else 0,
                )
            )
        return self.spark.createDataFrame(
            rows,
            "path string, n_rows long, n_deleted int, n_live long, n_pages int",
        )

    def partitions(self, at_generation: int | None = None) -> DataFrame:
        """Metadata table (Iceberg `.partitions` analog): one row per
        leaf directory — its hive partition values (JSON; files an
        epoch stored unpartitioned group under `{}`), file/row/live
        counts and byte total — driver-side manifest walk, zero data
        pages at any table size. Under partition-spec evolution this is
        the table's epoch map: which layouts exist and how much data
        each still holds (the input to an optimize(where=...) that
        retires an old layout leaf by leaf)."""
        import json as _json

        from strawboat_spark.sources.datasource import (
            _cached_footer,
            _deletes_by_rel,
            _list_files,
            _partition_values,
        )

        files = _list_files(self.path, at_generation)
        dmap = _deletes_by_rel(self.path, at_generation)
        agg: dict[str, list] = {}
        for f in sorted(files):
            key = _json.dumps(_partition_values(f, self.path), sort_keys=True)
            meta = _cached_footer(f)[1]
            n_del = dmap[f].n if f in dmap else 0
            sizes = sum(
                pg.length
                for lf in meta.leaves
                for pg in lf.pages
            )
            row = agg.setdefault(key, [0, 0, 0, 0])
            row[0] += 1
            row[1] += int(meta.num_rows)
            row[2] += int(meta.num_rows) - n_del
            row[3] += sizes
        return self.spark.createDataFrame(
            [(k, *v) for k, v in sorted(agg.items())],
            "partition string, n_files int, n_rows long, n_live long, bytes long",
        )

    def ndv_est(self, at_generation: int | None = None) -> dict[str, int]:
        """Per-column NDV estimates from METADATA alone (the footers'
        per-leaf ndv, summed across files) — no distinct-count job at
        any table size.  Exact for low-cardinality string columns
        (distinct-list union per file), upper-leaning elsewhere
        (cross-file/cross-page duplicates double-count), so it is the
        SAFE direction for sizing join broadcasts: a true-small NDV is
        never overestimated past file_count x its per-file bound.
        Columns in legacy (pre-NDV) files fall back to their non-null
        row count.  Hive partition columns are not included (their
        values live in directory names; enumerate the layout instead)."""
        from strawboat_spark.sources.datasource import (
            _cached_footer,
            _deletes_by_rel,
            _list_files,
        )

        files = _list_files(self.path, at_generation)
        _deletes_by_rel(self.path, at_generation)  # seeds footer cache
        sums: dict[str, int] = {}
        unions: dict[str, set | None] = {}
        for f in sorted(files):
            meta = _cached_footer(f)[1]
            for lf in meta.leaves:
                if "." in lf.name:
                    continue  # nested leaves: out of scope, like profile()
                n = (
                    lf.ndv
                    if lf.ndv is not None
                    else sum(p.num_values - p.null_count for p in lf.pages)
                )
                sums[lf.name] = sums.get(lf.name, 0) + int(n)
                # low-card columns: every file carrying a small distinct
                # set makes the TABLE-wide NDV an exact cross-file union
                d = getattr(lf, "distinct", None)
                if lf.name not in unions:
                    unions[lf.name] = set() if d is not None else None
                u = unions[lf.name]
                if u is not None:
                    if d is None:
                        unions[lf.name] = None
                    else:
                        u.update(d)
        return {
            name: (len(unions[name]) if unions.get(name) is not None else total)
            for name, total in sums.items()
        }

    def profile(self, at_generation: int | None = None) -> DataFrame:
        """Metadata-only column profile: per top-level column (name,
        n_rows, n_nulls, min_str, max_str) aggregated from the
        generation's page stats — no data pages read (footers come
        from the manifest's embedded cache). min/max/null counts are
        FILE-LEVEL stats: on merge-on-read tables they ignore deletion
        vectors (conservative bounds, like Iceberg's column metrics on
        files with delete files), while n_rows subtracts them. Values
        stringified via Python str() — exact for ints/strings/bools;
        floats are bounds, compare numerically. Hive partition columns
        live in directory names, not footers, so they do not appear
        (their values are exact from the layout already); nested
        columns are out of scope. Drives drift checks between
        generations (profile(g1) vs profile(g2)) at manifest cost,
        not scan cost."""
        from strawboat_spark.sources.datasource import (
            _cached_footer,
            _deletes_by_rel,
            _list_files,
        )

        files = _list_files(self.path, at_generation)
        dmap = _deletes_by_rel(self.path, at_generation)
        agg: dict[str, list] = {}  # name -> [n_rows, n_nulls, min, max]
        order: list[str] = []
        for f in sorted(files):
            meta = _cached_footer(f)[1]
            n_del = dmap[f].n if f in dmap else 0
            for lf in meta.leaves:
                if "." in lf.name:
                    continue  # nested leaves: out of profile scope
                name = lf.name
                if name not in agg:
                    agg[name] = [0, 0, None, None]
                    order.append(name)
                a = agg[name]
                a[0] += sum(p.num_values for p in lf.pages) - n_del
                a[1] += sum(p.null_count for p in lf.pages)
                mins = [p.min for p in lf.pages if p.min is not None]
                maxs = [p.max for p in lf.pages if p.max is not None]
                if mins:
                    a[2] = min(mins) if a[2] is None else min(a[2], min(mins))
                if maxs:
                    a[3] = max(maxs) if a[3] is None else max(a[3], max(maxs))
        rows = [
            (
                n,
                int(agg[n][0]),
                int(agg[n][1]),
                None if agg[n][2] is None else str(agg[n][2]),
                None if agg[n][3] is None else str(agg[n][3]),
            )
            for n in order
        ]
        return self.spark.createDataFrame(
            rows, "column string, n_rows long, n_nulls long, min_str string, max_str string"
        )

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY analog: one row per retained generation,
        oldest first — {generation, operation, n_files, n_added,
        n_removed, committed_at_us, current}.  The operation verb is
        stamped by each commit path (overwrite/append/delete/update/
        merge_*/optimize/compact/clone/restore/DDL verbs/adopt);
        n_added/n_removed are derived by diffing the retained entry
        lists, so they need no writer cooperation.  Driver-side
        metadata only: O(retained generations) manifest reads, no scan
        of any data file at any table size."""
        from strawboat_spark.sources.datasource import list_generations

        out = []
        prev_paths: set | None = None
        for g in list_generations(self.path):
            paths = set(g.pop("entry_paths", ()))
            if prev_paths is None and g["generation"] > 1:
                # earlier generations vacuumed: the first retained
                # generation's add/remove counts are unknowable
                g["n_added"] = g["n_removed"] = None
            else:
                base = prev_paths or set()
                g["n_added"] = len(paths - base)
                g["n_removed"] = len(base - paths)
            prev_paths = paths
            out.append(g)
        return out

    def history_df(self) -> DataFrame:
        """Table.history() as a DataFrame (DESCRIBE HISTORY shape)."""
        import datetime as _dt

        rows = [
            (
                int(g["generation"]),
                g.get("operation"),
                int(g["n_files"]),
                None if g.get("n_added") is None else int(g["n_added"]),
                None if g.get("n_removed") is None else int(g["n_removed"]),
                None
                if g.get("committed_at_us") is None
                else _dt.datetime.fromtimestamp(
                    g["committed_at_us"] / 1e6, tz=_dt.timezone.utc
                ).replace(tzinfo=None),
                bool(g["current"]),
            )
            for g in self.history()
        ]
        return self.spark.createDataFrame(
            rows,
            "generation long, operation string, n_files long, n_added long, "
            "n_removed long, committed_at timestamp, current boolean",
        )

    def _ts_us(self, ts) -> int:
        """datetime / ISO string / unix seconds -> µs since epoch.
        NAIVE datetimes and ISO strings resolve in the SPARK SESSION
        timezone (spark.sql.session.timeZone) — Delta's TIMESTAMP AS OF
        semantics — falling back to UTC when unset."""
        import datetime as _dt

        def _tz():
            try:
                from zoneinfo import ZoneInfo

                name = self.spark.conf.get("spark.sql.session.timeZone", "UTC")
                return ZoneInfo(name)
            except Exception:
                return _dt.timezone.utc

        if isinstance(ts, _dt.datetime):
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_tz())
            return int(ts.timestamp() * 1_000_000)
        if isinstance(ts, str):
            d = _dt.datetime.fromisoformat(ts)
            if d.tzinfo is None:
                d = d.replace(tzinfo=_tz())
            return int(d.timestamp() * 1_000_000)
        return int(float(ts) * 1_000_000)

    def _resolve_timestamp(self, ts) -> int:
        from strawboat_spark.sources.datasource import generation_at_timestamp

        return generation_at_timestamp(self.path, self._ts_us(ts))

    # -- tags --------------------------------------------------------------
    _TAGS_FILE = "_strawboat_tags.json"

    def tags(self) -> dict[str, int]:
        """name -> generation. Tagged generations are PINNED from
        vacuum retirement (Iceberg tag-retention semantics): vacuum
        keeps a tagged generation's manifest and files no matter how
        old, so a `v1.0` tag stays readable forever until the tag is
        dropped."""
        import json

        from strawboat_spark.sources.fileio import get_fs

        fs = get_fs(self.path)
        f = f"{self.path}/{self._TAGS_FILE}"
        if not fs.exists(f):
            return {}
        with fs.open_read(f) as fh:
            return json.loads(fh.read().decode())

    def tag(self, name: str, generation: int | None = None) -> int:
        """Tag `generation` (default: the current head) with `name`.
        Returns the tagged generation."""
        from strawboat_spark.sources.datasource import read_manifest, read_manifest_at

        if generation is None:
            man = read_manifest(self.path)
            if man is None:
                raise ValueError(f"tag({name!r}): table has no committed generation")
            generation = man.get("generation", 0)
        else:
            read_manifest_at(self.path, generation)  # must be retained
        tags = self.tags()
        tags[name] = int(generation)
        self._save_tags(tags)
        return int(generation)

    def drop_tag(self, name: str) -> None:
        tags = self.tags()
        tags.pop(name, None)
        self._save_tags(tags)

    def read_tag(self, name: str) -> DataFrame:
        tags = self.tags()
        if name not in tags:
            raise ValueError(f"unknown tag {name!r} (have {sorted(tags)})")
        return self.read(at_generation=tags[name])

    def _save_tags(self, tags: dict[str, int]) -> None:
        import json

        from strawboat_spark.sources.fileio import get_fs

        fs = get_fs(self.path)
        with fs.create(f"{self.path}/{self._TAGS_FILE}") as fh:
            fh.write(json.dumps(tags, sort_keys=True).encode())

    # -- constraints -------------------------------------------------------
    _CONSTRAINTS_FILE = "_strawboat_constraints.json"

    def properties(self) -> dict:
        """Free-form table properties riding the current manifest
        (Delta TBLPROPERTIES analog).  Carried forward by every commit
        path; replaced atomically by a write that passes the
        ``manifest_properties`` option (JSON dict) — the txn-marker
        hook that makes incremental-view folds idempotent
        (streaming/views.py)."""
        from strawboat_spark.sources.datasource import read_manifest

        man = read_manifest(self.path)
        return dict((man or {}).get("properties") or {})

    def constraints(self) -> dict[str, str]:
        """name -> SQL boolean expression, enforced on every facade
        write (append/overwrite/merge source). Stored beside the
        manifests through the fileio seam, so object-store tables carry
        them too. Raw `df.write.format("strawboat")` bypasses the
        facade and therefore the checks — the same escape hatch as
        writing files straight into a Delta directory."""
        import json

        from strawboat_spark.sources.fileio import get_fs

        fs = get_fs(self.path)
        f = f"{self.path}/{self._CONSTRAINTS_FILE}"
        if not fs.exists(f):
            return {}
        with fs.open_read(f) as fh:
            return json.loads(fh.read().decode())

    _GENERATED_FILE = "_strawboat_generated.json"

    def generated_columns(self) -> dict[str, str]:
        """column -> SQL generation expression (Delta generated-column
        analog).  On every facade write a missing generated column is
        COMPUTED from its expression; an explicitly-supplied one must
        SATISFY it (null-safe equality) or the write is rejected —
        Delta's exact contract.  Mutations enforce the invariant on
        post-assignment rows, so an UPDATE that changes a source column
        must assign the generated column consistently too (no silent
        recompute — the rejection message says what to assign).
        Physically the column is stored like any other, so partitioning
        by a generated column (the date_trunc pattern) gives partition
        pruning on writes that never mention it."""
        import json

        from strawboat_spark.sources.fileio import get_fs

        fs = get_fs(self.path)
        f = f"{self.path}/{self._GENERATED_FILE}"
        if not fs.exists(f):
            return {}
        with fs.open_read(f) as fh:
            return json.loads(fh.read().decode())

    def add_generated_column(self, name: str, expression: str) -> None:
        """Declare `name` as generated by `expression`.  If the table
        already has data, the column must exist AND satisfy the
        expression (no backfill — Delta declares generated columns at
        creation; declaring late is allowed only when consistent)."""
        import json

        from strawboat_spark.sources.datasource import read_manifest
        from strawboat_spark.sources.fileio import get_fs

        if read_manifest(self.path) is not None:
            cur = self.read()
            if name not in cur.columns:
                raise ValueError(
                    f"add_generated_column: table has data but no column "
                    f"{name!r}; generated columns are not backfilled"
                )
            self._check_rows(cur, {f"generated:{name}": f"{name} <=> ({expression})"})
        gens = self.generated_columns()
        gens[name] = expression
        fs = get_fs(self.path)
        fs.makedirs(self.path)  # declarable before the first write
        with fs.create(f"{self.path}/{self._GENERATED_FILE}") as fh:
            fh.write(json.dumps(gens, sort_keys=True).encode())

    def _generated_invariants(self) -> dict[str, str]:
        """Generated-column definitions as CHECK-style invariants
        (null-safe equality), merged into mutation validations."""
        return {
            f"generated:{n}": f"{n} <=> ({e})"
            for n, e in self.generated_columns().items()
        }

    def _apply_generated(self, df: DataFrame, validate: bool = True) -> DataFrame:
        """Compute missing generated columns; with validate=True also
        reject supplied values that break the generation expression
        (callers whose rows are only PARTIALLY written — merge_when —
        pass validate=False and validate the written subsets)."""
        import pyspark.sql.functions as F

        gens = self.generated_columns()
        if not gens:
            return df
        supplied = {}
        for name, expr in gens.items():
            if name not in df.columns:
                df = df.withColumn(name, F.expr(expr))
            else:
                supplied[f"generated:{name}"] = f"{name} <=> ({expr})"
        if validate and supplied:
            self._check_rows(df, supplied)
        return df

    def add_constraint(self, name: str, expression: str) -> None:
        """CHECK constraint: `expression` must hold for every row of
        every future facade write. The CURRENT table must satisfy it
        too (Delta's ADD CONSTRAINT semantics)."""
        self._check_rows(self.read(), {name: expression})
        cons = self.constraints()
        cons[name] = expression
        self._save_constraints(cons)

    def drop_constraint(self, name: str) -> None:
        cons = self.constraints()
        cons.pop(name, None)
        self._save_constraints(cons)

    def _save_constraints(self, cons: dict[str, str]) -> None:
        import json

        from strawboat_spark.sources.fileio import get_fs

        fs = get_fs(self.path)
        with fs.create(f"{self.path}/{self._CONSTRAINTS_FILE}") as fh:
            fh.write(json.dumps(cons, sort_keys=True).encode())

    @staticmethod
    def _check_rows(df: DataFrame, cons: dict[str, str]) -> None:
        import pyspark.sql.functions as F

        for name, expr in cons.items():
            # violation = expression NOT satisfied (null counts as a
            # violation, matching Delta CHECK semantics). ONE take(1)
            # evaluation — a count-then-collect pair can disagree with
            # itself on a non-deterministic source. The write that
            # follows is still a separate evaluation; callers with
            # non-deterministic inputs should persist first.
            rows = df.filter(~F.coalesce(F.expr(expr), F.lit(False))).take(1)
            if rows:
                raise ValueError(
                    f"strawboat: CHECK constraint {name!r} ({expr}) "
                    f"violated, e.g. by row {rows[0].asDict()!r}"
                )

    # -- writes -----------------------------------------------------------
    def _prepare_write(self, df: DataFrame, mode: str, options: dict):
        """Shared facade-write prologue: generated columns computed,
        declared-column defaults filled, widened types cast, bucket
        layout applied, CHECK constraints validated — used by direct
        writes AND by WAP staging (audit must see the final form)."""
        df = self._apply_generated(df)
        # declared columns (add_column) omitted by the writer fill
        # their default, so stored rows agree with the read-time fill
        # of pre-declaration files (declarations persist across
        # overwrites like any table property)
        import pyspark.sql.functions as F

        from strawboat_spark.sources.datasource import (
            declared_columns,
            widened_columns,
        )

        for dname, dspec in declared_columns(self.path).items():
            if dname not in df.columns:
                df = df.withColumn(
                    dname, F.lit(dspec.get("default")).cast(dspec["type"])
                )
        # widened columns (alter_column_type): new files store the
        # declared wide type physically, so the table converges to it
        for wname, wddl in widened_columns(self.path).items():
            if wname in df.columns:
                df = df.withColumn(wname, F.col(wname).cast(wddl))
        df, options = self._apply_partition_layout(df, mode, options)
        df, options = self._apply_bucketing(df, mode, options)
        df, options = self._apply_partition_transform(df, mode, options)
        cons = self.constraints()
        if cons:
            self._check_rows(df, cons)
        return df, options

    def _apply_partition_layout(self, df: DataFrame, mode: str, options: dict):
        """Plain-column layout declaration + inheritance (the
        partition-spec-evolution write side): an overwrite's explicit
        partition_by records the layout in the manifest, and a bare
        append derives it back — same contract the days()/months()
        transform and the bucket spec already have, extended to plain
        hive columns so set_partition_layout has something to evolve.
        Runs BEFORE bucketing/transform so the recorded layout never
        contains derived directory columns."""
        import json
        import re as _re

        from strawboat_spark.sources.datasource import (
            partition_layout,
            transform_spec,
        )

        pb = str(options.get("partition_by", "") or "")
        comps = [c.strip() for c in pb.split(",") if c.strip()]
        has_transform = any(
            _re.fullmatch(r"(days|months)\(\w+\)", c) for c in comps
        )
        if mode == "append":
            if transform_spec(self.path) is not None or has_transform:
                return df, options  # the transform's own layout drives
            declared = partition_layout(self.path)
            if declared is None:
                return df, options
            if comps and comps != declared:
                raise ValueError(
                    f"append: table layout is PARTITIONED BY "
                    f"({', '.join(declared)}); an append cannot "
                    f"re-partition — set_partition_layout() evolves the "
                    f"spec for future writes"
                )
            missing = [c for c in declared if c not in df.columns]
            if missing:
                raise ValueError(
                    f"append: partition column(s) {missing} absent from "
                    f"the dataframe"
                )
            options["partition_by"] = ",".join(declared)
            return df, options
        if comps and not has_transform:
            props = json.loads(options.get("manifest_properties", "{}") or "{}")
            props["partition_layout"] = comps
            types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            props["partition_layout_types"] = {
                c: _layout_type_family(types[c]) for c in comps if c in types
            }
            options["manifest_properties"] = json.dumps(props)
        return df, options

    def set_partition_layout(self, spec: str | None) -> None:
        """Partition-spec EVOLUTION (Iceberg analog): one metadata-only
        manifest flip re-declares the hive layout future appends derive
        — 'lang', 'lang,source', or None to stop partitioning.  NO data
        file is touched at any table size: files written under earlier
        specs keep their layout, and the read side is per-file — a
        stripe renders a partition column from its own directory when
        it has one, from its stored pages otherwise, and planning never
        directory-prunes a file whose epoch didn't encode the filtered
        column (those keep their page-stats pruning instead).  Columns
        must exist in the current logical schema; days()/months()
        transforms keep their overwrite-declared path (two layout
        authorities on one table would conflict)."""
        from strawboat_spark.sources.datasource import (
            ManifestConflictError,
            read_manifest,
            transform_spec,
            write_manifest,
        )

        comps = [c.strip() for c in str(spec or "").split(",") if c.strip()]
        if any("(" in c for c in comps):
            raise ValueError(
                "set_partition_layout: plain columns only — evolve a "
                "days()/months() transform with overwrite(partition_by=...)"
            )
        if transform_spec(self.path) is not None:
            raise ValueError(
                "set_partition_layout: table has a hidden-partitioning "
                "transform; overwrite(partition_by=...) re-declares it"
            )
        if read_manifest(self.path) is None:
            raise ValueError(
                f"set_partition_layout: {self.path} has no committed data"
            )
        ltypes: dict[str, str] = {}
        if comps:
            types = dict(self.read().dtypes)
            unknown = [c for c in comps if c not in types]
            if unknown:
                raise ValueError(
                    f"set_partition_layout: no column(s) {unknown} in the "
                    f"table schema"
                )
            # same whitelist as bucket keys: only types whose string
            # form is identical in the Spark write expression and the
            # Python planner (directory names ARE the values; floats
            # have no stable form, timestamps belong to days()/months())
            bad = {
                c: types[c]
                for c in comps
                if types[c] not in ("tinyint", "smallint", "int", "bigint", "string")
            }
            if bad:
                raise ValueError(
                    f"set_partition_layout: unsupported partition column "
                    f"type(s) {bad}; use int/string columns (time columns "
                    f"partition via overwrite(partition_by='days(col)'))"
                )
            ltypes = {c: _layout_type_family(types[c]) for c in comps}
        for _attempt in range(50):
            man = read_manifest(self.path)
            if man is None:
                raise ValueError(
                    f"set_partition_layout: {self.path} has no committed data"
                )
            props = dict(man.get("properties") or {})
            if comps:
                props["partition_layout"] = comps
            else:
                props.pop("partition_layout", None)
            # type authority MERGES and outlives the layout: directories
            # written under an earlier spec stay on disk after an
            # evolution, and their columns must keep their declared
            # types (only an overwrite clears the accumulated map)
            merged = {**(props.get("partition_layout_types") or {}), **ltypes}
            if merged:
                props["partition_layout_types"] = merged
            try:
                write_manifest(
                    self.path,
                    man["entries"],
                    generation=man.get("generation", 0) + 1,
                    properties=props,
                    operation="set-partition-layout",
                )
                return
            except ManifestConflictError:
                continue
        raise ManifestConflictError(
            f"set_partition_layout({self.path}): lost the generation race "
            f"50 times"
        )

    def _apply_partition_transform(self, df: DataFrame, mode: str, options: dict):
        """Hidden time partitioning (Iceberg `days(ts)` transform):
        `partition_by="days(ts)"` computes `__days_ts = to_date(ts)`,
        hive-partitions by the ISO date, and records the spec — so any
        later RANGE filter on the raw `ts` prunes whole day
        directories at planning time, and appends re-derive the
        directory automatically.  Composes with plain partition
        columns (`partition_by="region,days(ts)"`)."""
        import json
        import re as _re

        import pyspark.sql.functions as F

        from strawboat_spark.sources.datasource import transform_spec

        def _expr(kind, col):
            return (
                F.date_format(F.col(col), "yyyy-MM")
                if kind == "months"
                else F.to_date(F.col(col))
            )

        pb = options.get("partition_by", "")
        comps = [c.strip() for c in pb.split(",") if c.strip()]
        hits = [
            (i, m.group(1), m.group(2))
            for i, c in enumerate(comps)
            if (m := _re.fullmatch(r"(days|months)\((\w+)\)", c))
        ]
        if not hits and mode == "append":
            spec = transform_spec(self.path)
            if spec and spec["dir_col"] not in df.columns and spec["col"] in df.columns:
                df = df.withColumn(spec["dir_col"], _expr(spec["kind"], spec["col"]))
                if not comps:
                    # bare append: re-derive the FULL recorded layout —
                    # plain partition columns AND the transform dir (a
                    # composed partition_by="region,days(ts)" table must
                    # not demand the caller re-pass 'region')
                    comps = list(spec.get("layout") or [spec["dir_col"]])
                elif spec["dir_col"] not in comps:
                    comps = [*comps, spec["dir_col"]]
                options["partition_by"] = ",".join(comps)
            return df, options
        if not hits:
            return df, options
        if len(hits) > 1:
            raise ValueError("partition_by: at most one days()/months() transform")
        i, kind, col = hits[0]
        if col not in df.columns:
            raise ValueError(f"partition_by: {kind}({col}) names no column")
        t = {f.name: f.dataType.simpleString() for f in df.schema.fields}[col]
        if t not in ("timestamp", "timestamp_ntz", "date"):
            raise ValueError(
                f"partition_by: {kind}({col}) needs a timestamp/date column, got {t}"
            )
        dir_col = f"__{kind}_{col}"
        df = df.withColumn(dir_col, _expr(kind, col))
        comps[i] = dir_col
        options["partition_by"] = ",".join(comps)
        if mode != "append":
            props = json.loads(options.get("manifest_properties", "{}") or "{}")
            props["partition_transform"] = {
                "col": col,
                "kind": kind,
                "dir_col": dir_col,
                # full directory layout in order (plain columns + the
                # transform dir) so a bare append() re-derives composed
                # layouts without re-passing partition_by
                "layout": comps,
            }
            options["manifest_properties"] = json.dumps(props)
        return df, options

    def _write(self, df: DataFrame, mode: str, **options) -> None:
        from strawboat_spark.sources.datasource import ensure_active_session

        ensure_active_session(self.spark)  # thread-safe concurrent committers
        df, options = self._prepare_write(df, mode, options)
        w = df.write.format("strawboat").mode(mode)
        for k, v in options.items():
            w = w.option(k, v)
        w.save(self.path)

    _BUCKET_DIR_COL = "__bucket"

    def _apply_bucketing(self, df: DataFrame, mode: str, options: dict):
        """Hash-bucketed layout (Spark bucketBy analog, format-level):
        `overwrite(df, bucket_by="k", num_buckets=n)` computes
        `__bucket = pmod(crc32(cast(k AS STRING)), n)` — the Spark
        twin of the planner's zlib.crc32 — hive-partitions by it, and
        records the spec in the manifest, so every later equality/IN
        filter on `k` prunes to 1/n of the files at PLANNING time and
        appends re-bucket automatically.  One repartition on the
        bucket id co-locates each bucket into one task → ~one file per
        bucket per write (bounded file counts at any scale)."""
        import json

        import pyspark.sql.functions as F

        from strawboat_spark.sources.datasource import bucket_spec

        col = options.pop("bucket_by", None)
        n = int(options.pop("num_buckets", 16) or 16)
        declare = mode != "append"
        if mode == "append":
            spec = bucket_spec(self.path)
            if col is not None and spec is not None and (
                spec["col"] != col or spec["n"] != n
            ):
                raise ValueError(
                    f"bucket_by: table is bucketed by ({spec['col']}, "
                    f"{spec['n']}); an append cannot re-bucket — overwrite "
                    f"to change the layout"
                )
            if spec is not None:
                col, n = spec["col"], spec["n"]  # appends inherit the layout
            elif col is not None:
                raise ValueError(
                    "bucket_by: appends cannot introduce bucketing on an "
                    "unbucketed table (existing files would stay outside "
                    "the layout); overwrite instead"
                )
        if col is None:
            return df, options
        if col not in df.columns:
            raise ValueError(f"bucket_by: no column {col!r} in the dataframe")
        t = dict(zip(df.columns, [f.dataType.simpleString() for f in df.schema.fields]))[col]
        # only types whose Spark CAST(x AS STRING) and Python str(x)
        # agree byte-for-byte may be bucket keys — the planner re-hashes
        # pushed filter values in Python (booleans: 'true' vs 'True';
        # timestamps: '.5' vs '.500000'; floats: no stable form at all)
        if t not in ("tinyint", "smallint", "int", "bigint", "string", "date"):
            raise ValueError(
                f"bucket_by: {col!r} is {t}; bucket keys must be "
                f"int/string/date (types whose string form is identical in "
                f"the Spark write expression and the Python planner hash)"
            )
        dir_col = self._BUCKET_DIR_COL
        df = df.withColumn(
            dir_col,
            F.pmod(F.crc32(F.col(col).cast("string").cast("binary")), F.lit(n)).cast("long"),
        ).repartition(n, dir_col)
        pb = options.get("partition_by", "")
        options["partition_by"] = f"{pb},{dir_col}" if pb else dir_col
        if declare:
            # the spec lands atomically with the overwrite commit; an
            # append's spec is already in the carried-forward properties
            props = json.loads(options.get("manifest_properties", "{}") or "{}")
            props["bucket"] = {"col": col, "n": n, "dir_col": dir_col}
            options["manifest_properties"] = json.dumps(props)
        return df, options

    def overwrite(self, df: DataFrame, **options) -> None:
        self._write(df, "overwrite", **options)

    def append(self, df: DataFrame, auto_evolve: bool = False, **options) -> None:
        """auto_evolve=True: columns the table lacks are DECLARED
        first (metadata-only — older files render null at read time,
        no footer-union merge_schema needed on the read side) and
        wider same-family incoming types trigger metadata-only
        widening; then the append proceeds under the evolved logical
        schema.  Same contract as merge(auto_evolve=True)."""
        if auto_evolve:
            self._auto_evolve_schema(df)
        self._write(df, "append", **options)

    # -- write-audit-publish ----------------------------------------------
    _STAGING_DIR = "_strawboat_staging"

    def stage_append(self, df: DataFrame, **options) -> str:
        """WAP stage (Iceberg write-audit-publish): write `df` as a
        PENDING append — full facade semantics (generated columns,
        defaults, widened types, bucket layout, CHECK constraints) —
        without touching the table's committed state.  Returns a
        staging id for read_staged / publish_staged / discard_staged.
        Staged files live under _strawboat_staging/<id>/ inside the
        table root; vacuum pins them while the staging marker exists,
        and reclaims marker-less (crashed/abandoned) staging trees
        after the grace window."""
        import json as _json
        import uuid as _uuid

        from strawboat_spark.sources.datasource import read_manifest
        from strawboat_spark.sources.fileio import get_fs

        man = read_manifest(self.path)
        if man is None:
            raise ValueError("stage_append: stage onto a committed table "
                             "(overwrite first); the audit diff needs a base")
        df, options = self._prepare_write(df, "append", options)
        # Same schema contract as a direct append: the staging write
        # lands in a FRESH directory (datasource sees mode=overwrite,
        # so its append-time check never runs) and publish_staged
        # ADOPTS the files — without this check a mismatched-type
        # staged frame flips the table's read schema at publish (the
        # r12 store-assignment bug class, WAP edition).
        pcols = {
            c.strip()
            for c in str(options.get("partition_by", "")).split(",")
            if c.strip()
        }
        have = [
            (f.name, f.dataType)
            for f in self.read().schema.fields
            if f.name not in pcols
        ]
        incoming = [
            (f.name, f.dataType) for f in df.schema.fields if f.name not in pcols
        ]
        if str(options.get("merge_schema", "")).lower() == "true":
            ht = dict(have)
            for n, dt in incoming:
                if n in ht and ht[n] != dt:
                    raise ValueError(
                        f"stage_append type conflict on {n!r}: {ht[n]} vs {dt}"
                    )
        elif have != incoming:
            raise ValueError(
                "stage_append schema mismatch — table "
                f"{have} vs staged {incoming}"
            )
        sid = _uuid.uuid4().hex[:12]
        tmp = f"{self.path}/{self._STAGING_DIR}/{sid}"
        w = df.write.format("strawboat").mode("overwrite")
        for k, v in options.items():
            if k != "manifest_properties":  # staging commits no table props
                w = w.option(k, v)
        w.save(tmp)
        fs = get_fs(self.path)
        with fs.create(self._staging_marker(sid)) as h:
            h.write(
                _json.dumps(
                    {"base_generation": man.get("generation", 0)}
                ).encode()
            )
        return sid

    def _staging_marker(self, sid: str) -> str:
        return f"{self.path}/_strawboat_staged_{sid}.json"

    def staged_ids(self) -> list[str]:
        import re as _re

        from strawboat_spark.sources.fileio import get_fs

        fs = get_fs(self.path)
        out = []
        for f in fs.list_files(self.path, ".json"):
            m = _re.search(r"_strawboat_staged_([0-9a-f]+)\.json$", f)
            if m:
                out.append(m.group(1))
        return sorted(out)

    def read_staged(self, sid: str) -> DataFrame:
        """The audit view: committed table PLUS the staged append —
        what the table would contain if `sid` were published now."""
        self._require_staged(sid)
        staged = self.spark.read.format("strawboat").load(
            f"{self.path}/{self._STAGING_DIR}/{sid}"
        )
        return self.read().unionByName(staged, allowMissingColumns=True)

    def publish_staged(self, sid: str) -> None:
        """Atomically append the staged files to the table: one move
        per file (no rewrite — the bytes were written at stage time)
        plus one CAS generation flip.  Concurrent commits between
        stage and publish are fine: the flip retries against the fresh
        head and drops nothing."""
        from strawboat_spark.sources.fileio import get_fs
        from strawboat_spark.sources.maintenance import _adopt_tmp, _flip_generation

        self._require_staged(sid)
        tmp = f"{self.path}/{self._STAGING_DIR}/{sid}"
        moved = _adopt_tmp(self.path, tmp)
        _flip_generation(self.path, set(), moved, "publish_staged")
        get_fs(self.path).remove(self._staging_marker(sid))

    def discard_staged(self, sid: str) -> None:
        """Drop a staged append without publishing (audit failed)."""
        from strawboat_spark.sources.fileio import get_fs

        self._require_staged(sid)
        fs = get_fs(self.path)
        fs.remove(self._staging_marker(sid))
        fs.remove_tree(f"{self.path}/{self._STAGING_DIR}/{sid}")

    def _require_staged(self, sid: str) -> None:
        from strawboat_spark.sources.fileio import get_fs

        if not get_fs(self.path).exists(self._staging_marker(sid)):
            raise ValueError(
                f"no staged append {sid!r} (have {self.staged_ids()})"
            )

    # -- mutations --------------------------------------------------------
    def delete(self, condition: str, mode: str = "cow") -> dict:
        """mode='cow' rewrites affected files; mode='mor' records
        deletion vectors in the manifest instead (merge-on-read — no
        data file touched; see maintenance.delete_where)."""
        from strawboat_spark.sources.maintenance import delete_where

        return delete_where(self.spark, self.path, condition, mode=mode)

    def update(
        self, condition: str, assignments: dict[str, str], mode: str = "cow"
    ) -> dict:
        """mode='mor': deletion vectors mask the old versions, updated
        rows land as new files, one generation flip. On hive layouts
        MOR may even assign partition columns (rows move leaves).

        CHECK constraints AND generated-column invariants validate the
        POST-assignment rows (Delta's UPDATE semantics) before any file
        or manifest is touched — an update changing a generated
        column's source must assign the generated column consistently
        (no silent recompute)."""
        import pyspark.sql.functions as F

        from strawboat_spark.sources.maintenance import update_where

        self._refuse_bucket_key_assignment("update", assignments)
        cons = {**self.constraints(), **self._generated_invariants()}
        if cons:
            df = self.read().filter(F.expr(condition))
            updated = df.select(
                *[
                    F.expr(assignments[c]).alias(c) if c in assignments else F.col(c)
                    for c in df.columns
                ]
            )
            self._check_rows(updated, cons)
        return update_where(self.spark, self.path, condition, assignments, mode=mode)

    def merge_when(
        self,
        source: DataFrame,
        on: list[str],
        matched_update: tuple[str | None, dict[str, str]] | None = None,
        matched_delete: str | None = None,
        not_matched_insert: str | None = None,
        auto_evolve: bool = False,
    ) -> dict:
        """Conditional MERGE (the full Delta clause surface): DELETE /
        UPDATE SET on matched rows gated by SQL conditions seeing the
        target columns plainly and the source's as src_<col>; INSERT of
        unmatched source rows gated by a condition over source columns.
        See maintenance.merge_when for semantics (clause precedence,
        multi-match determinism guard, one-flip atomicity)."""
        from strawboat_spark.sources.maintenance import merge_when

        import pyspark.sql.functions as F

        if matched_update is not None:
            self._refuse_bucket_key_assignment("merge_when", matched_update[1])
        if auto_evolve:
            # same contract as merge(auto_evolve=True): declare
            # source-only columns, widen narrower targets — both
            # metadata-only, before any clause evaluates
            self._auto_evolve_schema(source)
        source = self._bucket_source(source)
        # generated columns: compute missing ones on the source (the
        # insert leg writes source rows verbatim), validate only on the
        # subsets actually written via the invariants below
        if self.generated_columns() and not_matched_insert is not None:
            source = self._apply_generated(source, validate=False)
        cons = {**self.constraints(), **self._generated_invariants()}
        if cons:
            # Validate the rows that will actually be WRITTEN (Delta's
            # CHECK semantics), not the whole source: rows destined for
            # delete/keep or filtered out by the insert condition must
            # not spuriously fail, and post-assignment updated rows
            # must be checked (mirroring Table.update).
            tgt = self.read()
            if not_matched_insert is not None:
                ins = source.join(
                    tgt.select(*on).distinct(), on=on, how="left_anti"
                ).filter(F.expr(not_matched_insert))
                self._check_rows(ins, cons)
            if matched_update is not None:
                src = source.select(
                    [F.col(c).alias(f"src_{c}") for c in source.columns]
                )
                src_on = [f"src_{c}" for c in on]
                joined = tgt.join(
                    src,
                    on=[F.col(a) == F.col(b) for a, b in zip(on, src_on)],
                    how="inner",
                )
                del_cond = (
                    F.expr(matched_delete) if matched_delete else F.lit(False)
                )
                upd_cond = (
                    F.expr(matched_update[0]) if matched_update[0] else F.lit(True)
                )
                updated = joined.filter(~del_cond & upd_cond).select(
                    *[
                        F.expr(matched_update[1][c]).alias(c)
                        if c in matched_update[1]
                        else F.col(c)
                        for c in tgt.columns
                    ]
                )
                self._check_rows(updated, cons)
        return merge_when(
            self.spark,
            self.path,
            source,
            on,
            matched_update=matched_update,
            matched_delete=matched_delete,
            not_matched_insert=not_matched_insert,
        )

    def _auto_evolve_schema(self, source: DataFrame) -> None:
        """Schema evolution for merges: declare source-only columns
        (add_column, read-time null for pre-merge files) and widen
        same-family narrower target columns (alter_column_type) —
        both metadata-only flips.  Unsupported types surface as the
        underlying add_column/widening errors, never a silent drop."""
        from strawboat_spark.sources.datasource import _WIDEN_FAMILIES

        tgt = {f.name: f.dataType.simpleString() for f in self.read().schema.fields}
        for f in source.schema.fields:
            st = f.dataType.simpleString()
            if f.name not in tgt:
                self.add_column(f.name, st)
            else:
                cur, new = _WIDEN_FAMILIES.get(tgt[f.name]), _WIDEN_FAMILIES.get(st)
                if cur and new and cur[0] == new[0] and new[1] > cur[1]:
                    self.alter_column_type(f.name, st)

    def _refuse_bucket_key_assignment(self, verb: str, assignments: dict) -> None:
        """Mutating the bucket key would strand rows in the wrong
        bucket directory — pruning would silently miss them.  Delete
        the row and re-insert it (which re-buckets) instead."""
        from strawboat_spark.sources.datasource import bucket_spec

        spec = bucket_spec(self.path)
        if not spec:
            return
        hit = [c for c in (spec["col"], spec["dir_col"]) if c in assignments]
        if hit:
            raise ValueError(
                f"{verb}: cannot assign {hit} — the table is hash-bucketed "
                f"by {spec['col']!r} and a changed key would leave the row "
                f"in a stale bucket directory (pruning would miss it); "
                f"delete + re-insert to move a row between buckets"
            )

    def _bucket_source(self, source: DataFrame) -> DataFrame:
        """Merge legs land source rows as files, so a bucketed table's
        source needs the bucket directory column — computed here with
        the same expression as writes, so inserts prune correctly."""
        import pyspark.sql.functions as F

        from strawboat_spark.sources.datasource import bucket_spec

        spec = bucket_spec(self.path)
        if not spec or spec["dir_col"] in source.columns:
            return source
        if spec["col"] not in source.columns:
            return source  # key-less source: downstream validation rejects
        return source.withColumn(
            spec["dir_col"],
            F.pmod(
                F.crc32(F.col(spec["col"]).cast("string").cast("binary")),
                F.lit(spec["n"]),
            ).cast("long"),
        )

    def merge(
        self,
        source: DataFrame,
        on: list[str],
        mode: str = "cow",
        auto_evolve: bool = False,
    ) -> dict:
        """mode='mor': matched target rows are masked by deletion
        vectors, the source lands as new files (partitioned by the
        hive layout when present), one flip.

        auto_evolve=True (Delta autoMerge analog): source columns the
        target lacks are DECLARED first (metadata-only add_column —
        pre-merge files render null), and a source column at a wider
        same-family type triggers a metadata-only widening; both ride
        the existing zero-rewrite machinery, so evolution costs two
        manifest flips regardless of table size.  Without it, extra
        source columns are an error (silent drops hide typos)."""
        from strawboat_spark.sources.maintenance import merge_upsert

        if auto_evolve:
            self._auto_evolve_schema(source)
        else:
            extra = [
                c for c in source.columns if c not in self.read().columns
            ]
            if extra:
                raise ValueError(
                    f"merge: source has columns the target lacks {extra}; "
                    f"pass auto_evolve=True to declare them (metadata-only) "
                    f"or drop them explicitly"
                )
        # every source row is written (replacement or insert), so
        # generated columns compute+validate over the whole source
        source = self._bucket_source(source)
        source = self._apply_generated(source)
        cons = self.constraints()
        if cons:
            self._check_rows(source, cons)
        return merge_upsert(self.spark, self.path, source, on, mode=mode)

    # -- maintenance ------------------------------------------------------
    def compact(self, target_files: int = 1, target_bytes: int | None = None) -> dict:
        """target_bytes: bin-pack only files SMALLER than the target
        (Delta OPTIMIZE semantics — at-size files keep their entries,
        zero IO); without it, rewrite each leaf to target_files."""
        from strawboat_spark.sources.maintenance import compact

        return compact(self.spark, self.path, target_files, target_bytes=target_bytes)

    def optimize(
        self,
        zorder_by: list[str] | None = None,
        target_files: int = 4,
        where: str | None = None,
    ) -> dict:
        """OPTIMIZE [WHERE partition-predicate] [ZORDER BY cols]: per-
        leaf clustering/compaction scoped to the partitions `where`
        selects (see maintenance.optimize)."""
        from strawboat_spark.sources.maintenance import optimize

        return optimize(
            self.spark,
            self.path,
            zorder_by=zorder_by,
            target_files=target_files,
            where=where,
        )

    def rewrite_epoch(
        self, target_files: int = 4, where: str | None = None
    ) -> dict:
        """Iceberg `rewrite_data_files` analog: rewrite the files whose
        directory layout differs from the DECLARED spec into it,
        retiring old layout epochs so directory pruning covers the
        whole table again (see maintenance.rewrite_epoch — one pinned
        scan, DVs materialize, one atomic flip; conforming files keep
        their entries with zero IO). `where=` scopes the migration to
        the old-epoch leaves matching a directory-column predicate —
        the partition-by-partition path a 100 TB migration takes."""
        from strawboat_spark.sources.maintenance import rewrite_epoch

        return rewrite_epoch(
            self.spark, self.path, target_files=target_files, where=where
        )

    def consolidate_dv_refs(self, max_refs: int = 8) -> dict:
        """Union a many-times-mutated file's deletion-vector sidecars
        into one (see maintenance.consolidate_dv_refs — executor-side,
        race-skipping, idempotent).  Caps per-read ref fan-out."""
        from strawboat_spark.sources.maintenance import consolidate_dv_refs

        return consolidate_dv_refs(self.spark, self.path, max_refs=max_refs)

    def reorg_purge(self, threshold: float = 0.2) -> dict:
        """Delta REORG ... APPLY (PURGE): rewrite only the files whose
        deletion-vector fraction >= threshold, materializing their
        deletes (see maintenance.reorg_purge — candidate selection is
        metadata-only, untouched files keep their entries with zero
        IO)."""
        from strawboat_spark.sources.maintenance import reorg_purge

        return reorg_purge(self.spark, self.path, threshold=threshold)

    def vacuum(self, grace_seconds: float = 3600.0, dry_run: bool = False) -> dict:
        from strawboat_spark.sources.maintenance import vacuum

        return vacuum(self.path, grace_seconds=grace_seconds, dry_run=dry_run)

    def clone(self, dest: str, deep: bool = False) -> "Table":
        """Delta-CLONE analog.

        SHALLOW (default): publish a new table at `dest` whose first
        generation references THIS table's current data files by their
        absolute path (full URL on scheme'd backends) — zero data
        copied, O(manifest) cost at ANY table size.  The clone then
        evolves independently: appends, MOR deletes/updates, compaction
        and optimize land under its own root, and external references
        drop out naturally as rewrites supersede them; the source's
        history is untouched.  CAVEAT (identical to Delta shallow
        clones): `vacuum()` on the SOURCE can reclaim files a shallow
        clone still references — use deep=True for clones that must
        outlive the source's retention.

        DEEP: server-side byte copies of the current data files into
        `dest` (no decode/recompress), fully independent thereafter.

        Constraints are copied (Delta semantics); tags are not (they
        pin SOURCE generation numbers).  Hive-partitioned sources are
        refused for shallow clones — partition values derive from the
        root-relative layout, which external references do not have.
        """
        from strawboat_spark.sources.datasource import (
            entry_abs,
            is_external_entry,
            publish_manifest,
            read_manifest,
            write_manifest,
        )
        from strawboat_spark.sources.fileio import backend_path, get_fs, split_scheme
        from strawboat_spark.sources.maintenance import _part_layout

        if read_manifest(self.path) is None:
            publish_manifest(self.path)
        man = read_manifest(self.path)
        if man is None:
            raise ValueError(f"clone: {self.path} has no committed data")
        dfs = get_fs(dest)
        if read_manifest(dest) is not None or (
            dfs.isdir(dest) and dfs.list_files(dest, ".strb")
        ):
            raise ValueError(f"clone: destination {dest} is not empty")
        if not deep and _part_layout(self.path):
            raise ValueError(
                "clone: shallow clone of a hive-partitioned table is not "
                "supported (partition values derive from the root-relative "
                "layout); use deep=True"
            )
        dfs.makedirs(dest)

        def _abs_ref(p: str) -> str:
            absf = entry_abs(self.path, p)
            return (
                absf
                if split_scheme(absf)[0]
                else os.path.normpath(os.path.abspath(backend_path(absf)))
            )

        def _copy_dv(ref: str) -> str:
            # deletion-vector sidecars are content-addressed, so the
            # source basename IS the dest name; copy once per blob
            src_abs = entry_abs(self.path, ref)
            rel = os.path.join("_strawboat_dv", os.path.basename(backend_path(ref)))
            dst = os.path.join(dest, rel)
            if not get_fs(dst).exists(dst):
                from strawboat_spark.sources.fileio import copy_bytes

                get_fs(dst).makedirs(os.path.dirname(dst))
                copy_bytes(src_abs, dst)
            return rel

        entries = []
        if deep:
            for i, e in enumerate(man["entries"]):
                src_abs = entry_abs(self.path, e["path"])
                # external refs (source itself a shallow clone) land as
                # index-prefixed basenames; normal entries keep layout
                rel = (
                    f"clone-{i:06d}-{os.path.basename(backend_path(e['path']))}"
                    if is_external_entry(e["path"])
                    else e["path"]
                )
                dst = os.path.join(dest, rel)
                d = os.path.dirname(dst)
                if d:
                    get_fs(dst).makedirs(d)
                from strawboat_spark.sources.fileio import copy_bytes

                copy_bytes(src_abs, dst)
                ne = {**e, "path": rel}
                if e.get("deletes_refs"):
                    ne["deletes_refs"] = [_copy_dv(r) for r in e["deletes_refs"]]
                entries.append(ne)
        else:
            for e in man["entries"]:
                ne = {**e, "path": _abs_ref(e["path"])}
                if e.get("deletes_refs"):
                    # refs rebase to absolute like the data path — the
                    # clone reads the SOURCE's vectors until its own
                    # mutations supersede the entry
                    ne["deletes_refs"] = [_abs_ref(r) for r in e["deletes_refs"]]
                entries.append(ne)
        props = dict(man.get("properties") or {})
        props["cloned_from"] = {
            "path": self.path,
            "generation": man.get("generation", 0),
            "deep": deep,
        }
        write_manifest(dest, entries, generation=1, properties=props, operation="clone")
        # constraints + generated-column defs travel with the clone
        # (Delta CLONE semantics)
        sfs = get_fs(self.path)
        for side in (self._CONSTRAINTS_FILE, self._GENERATED_FILE):
            cf = f"{self.path}/{side}"
            if sfs.exists(cf):
                with sfs.open_read(cf) as r:
                    body = r.read()
                with dfs.create(f"{dest}/{side}") as w:
                    w.write(body)
        return Table(self.spark, dest)

    # -- branches ----------------------------------------------------------
    _BRANCHES_DIR = "_branches"

    def branch(self, name: str) -> "Table":
        """Create a writable BRANCH (Iceberg branch analog): a
        zero-copy shallow clone under `_branches/<name>/` inside this
        table's root, plus a tag pinning the fork generation — so the
        source's vacuum can never reclaim files the branch still
        references (the shallow-clone caveat does not apply to
        branches).  The branch is a full table: append, MOR
        delete/update, schema evolution, time travel all work; merge
        it back with fast_forward(name) or throw it away with
        drop_branch(name)."""
        import re as _re

        if not _re.fullmatch(r"[A-Za-z0-9_\-]{1,64}", name):
            raise ValueError(f"branch: name {name!r} must be [A-Za-z0-9_-]{{1,64}}")
        dest = f"{self.path}/{self._BRANCHES_DIR}/{name}"
        from strawboat_spark.sources.fileio import get_fs

        if get_fs(dest).isdir(dest):
            raise ValueError(f"branch: {name!r} already exists")
        t = self.clone(dest)
        self.tag(self._branch_tag(name))  # pin the fork from vacuum
        return t

    def _branch_tag(self, name: str) -> str:
        return f"branch-{name}"

    def branch_table(self, name: str) -> "Table":
        from strawboat_spark.sources.fileio import get_fs

        dest = f"{self.path}/{self._BRANCHES_DIR}/{name}"
        if not get_fs(dest).isdir(dest):
            raise ValueError(f"no branch {name!r} (have {self.branches()})")
        return Table(self.spark, dest)

    def branches(self) -> list[str]:
        import os as _os

        from strawboat_spark.sources.fileio import get_fs

        fs = get_fs(self.path)
        root = f"{self.path}/{self._BRANCHES_DIR}"
        if not fs.isdir(root):
            return []
        lister = getattr(fs, "list_dirs", None)
        if lister is None:  # backends without a dir-listing primitive
            return []
        return sorted(_os.path.basename(d.rstrip("/")) for d in lister(root))

    def fast_forward(self, name: str) -> None:
        """Merge a branch back: allowed only when the MAIN table has
        not advanced past the branch's fork point (Iceberg
        fast-forward semantics) — otherwise a ManifestConflictError
        tells the caller to rebase (recreate the branch).  Publishes
        ONE main generation adopting the branch's current entries:
        branch-local files move into the root (no rewrite), entries
        still referencing main files rebase to root-relative paths
        with their deletion vectors intact, and the branch's evolved
        properties (renames, widenings, defaults) carry over.  The
        move+flip is O(branch-local files), not table size."""
        import os as _os

        from strawboat_spark.sources.datasource import (
            ManifestConflictError,
            entry_abs,
            read_manifest,
            write_manifest,
        )
        from strawboat_spark.sources.fileio import backend_path, get_fs

        br = self.branch_table(name)
        bman = read_manifest(br.path)
        fork = ((bman or {}).get("properties") or {}).get("cloned_from", {}).get(
            "generation"
        )
        man = read_manifest(self.path)
        head = man.get("generation", 0) if man else 0
        if fork is None or bman is None:
            raise ValueError(f"fast_forward: {name!r} has no fork metadata")
        if head != fork:
            raise ManifestConflictError(
                f"fast_forward({name!r}): main advanced {fork} -> {head} since "
                f"the fork; rebase by recreating the branch from the new head"
            )
        mroot = _os.path.normpath(backend_path(self.path))
        broot = _os.path.normpath(backend_path(br.path))

        def _adopt(rel_or_abs: str) -> str:
            """Rebase one branch reference into the main root.  Files
            are COPIED, never moved, so a lost CAS race (or a crash in
            this window) leaves the branch fully intact and merely
            strands young copies in main that vacuum reclaims after the
            grace window — the pre-r9 move-first ordering could dangle
            the branch manifest and let vacuum eat its data."""
            absf = entry_abs(br.path, rel_or_abs)
            norm = _os.path.normpath(backend_path(absf))
            if norm.startswith(broot + _os.sep):
                rel = _os.path.relpath(norm, broot)
                dst = _os.path.join(self.path, rel)
                d = _os.path.dirname(dst)
                if d:
                    get_fs(dst).makedirs(d)
                dfs_ = get_fs(dst)
                if not dfs_.exists(dst):  # content-addressed DVs may repeat
                    from strawboat_spark.sources.fileio import copy_bytes

                    copy_bytes(absf, dst)
                return rel
            if norm.startswith(mroot + _os.sep):
                # still a main file: back to a root-relative reference
                return _os.path.relpath(norm, mroot)
            return rel_or_abs  # external beyond both roots

        entries = []
        for e in bman["entries"]:
            ne = {**e, "path": _adopt(e["path"])}
            if e.get("deletes_refs"):
                # deletion-vector sidecars travel with their entries
                ne["deletes_refs"] = [_adopt(r) for r in e["deletes_refs"]]
            entries.append(ne)
        props = dict(bman.get("properties") or {})
        props.pop("cloned_from", None)
        try:
            write_manifest(
                self.path,
                entries,
                generation=head + 1,
                properties=props,
                operation="fast_forward",
            )
        except ManifestConflictError:
            raise ManifestConflictError(
                f"fast_forward({name!r}): a concurrent commit won generation "
                f"{head + 1}; rebase by recreating the branch"
            )
        # branch-evolved constraints/generated defs become main's
        sfs = get_fs(br.path)
        dfs = get_fs(self.path)
        for side in (self._CONSTRAINTS_FILE, self._GENERATED_FILE):
            cf = f"{br.path}/{side}"
            if sfs.exists(cf):
                with sfs.open_read(cf) as r:
                    body = r.read()
                with dfs.create(f"{self.path}/{side}") as w:
                    w.write(body)
        self.drop_branch(name)

    def drop_branch(self, name: str) -> None:
        from strawboat_spark.sources.fileio import get_fs

        self.branch_table(name)  # existence check
        get_fs(self.path).remove_tree(f"{self.path}/{self._BRANCHES_DIR}/{name}")
        self.drop_tag(self._branch_tag(name))

    def rename_column(self, old: str, new: str) -> None:
        """Metadata-only column RENAME (Delta column-mapping analog):
        NO data file is touched — one new manifest generation records
        `old` as an alias of `new`.  The read path resolves each file
        by the name it actually stores (old files by the alias, files
        written after the rename by the logical name), stats/page
        pruning follows the alias, time travel renders each snapshot
        under ITS generation's names, and renames chain (a->b->c keeps
        every epoch's files readable).

        Refused when `old` is a hive partition column (directory names
        are physical), or when a CHECK constraint or generated-column
        expression references it (rename the expression first — a
        silent rewrite of user SQL is worse than an error)."""
        import re as _re

        from strawboat_spark.sources.datasource import (
            ManifestConflictError,
            read_manifest,
            write_manifest,
        )
        from strawboat_spark.sources.maintenance import _part_layout

        cols = self.read().columns
        if old not in cols:
            raise ValueError(f"rename_column: no column {old!r} (have {cols})")
        if new in cols:
            raise ValueError(f"rename_column: column {new!r} already exists")
        from strawboat_spark.sources.datasource import partition_layout

        parts = set(_part_layout(self.path)) | set(partition_layout(self.path) or ())
        if old in parts or new in parts:
            raise ValueError(
                "rename_column: hive partition columns are physical directory "
                "names (or the declared layout resolves them by name) and "
                "cannot be renamed in place — set_partition_layout first"
            )
        from strawboat_spark.sources.datasource import bucket_spec

        spec = bucket_spec(self.path)
        if spec and old == spec["col"]:
            raise ValueError(
                f"rename_column: {old!r} is the hash-bucket key; the layout "
                f"spec resolves it by name — overwrite to re-bucket first"
            )
        refs = {f"constraint {n!r}": e for n, e in self.constraints().items()}
        refs.update(
            {f"generated column {n!r}": e for n, e in self.generated_columns().items()}
        )
        for what, expr in refs.items():
            if _re.search(rf"\b{_re.escape(old)}\b", expr):
                raise ValueError(
                    f"rename_column: {what} references {old!r} ({expr}); "
                    f"drop/re-declare it against the new name first"
                )
        if old in self.generated_columns():
            raise ValueError(
                f"rename_column: {old!r} is a generated column; re-declare "
                f"the generation under the new name instead"
            )
        for _attempt in range(50):
            man = read_manifest(self.path)
            if man is None:
                raise ValueError(f"rename_column: {self.path} has no committed data")
            props = dict(man.get("properties") or {})
            cm = {k: list(v) for k, v in (props.get("column_mapping") or {}).items()}
            aliases = {a for v in cm.values() for a in v}
            if new in aliases:
                raise ValueError(
                    f"rename_column: {new!r} is a historical name of another "
                    f"column (mapping {cm}); pick a fresh name"
                )
            cm[new] = [old] + cm.pop(old, [])
            props["column_mapping"] = cm
            cd = dict(props.get("column_defaults") or {})
            if old in cd:
                cd[new] = cd.pop(old)  # declared-column default follows the name
                props["column_defaults"] = cd
            ct = dict(props.get("column_types") or {})
            if old in ct:
                ct[new] = ct.pop(old)  # widened type follows the name
                props["column_types"] = ct
            try:
                write_manifest(
                    self.path,
                    man["entries"],
                    generation=man.get("generation", 0) + 1,
                    properties=props,
                    operation="rename_column",
                )
                return
            except ManifestConflictError:
                continue
        raise ManifestConflictError(
            f"rename_column({self.path}): lost the generation race 50 times"
        )

    def add_column(self, name: str, type_ddl: str, default=None) -> None:
        """Metadata-only ADD COLUMN [DEFAULT]: one manifest flip
        declares the column — no data file touched at any table size.
        Files written before the declaration render `default` (a JSON
        scalar; None = plain nullable add) at read time — Delta's
        existingDefault — and facade writes that omit the column fill
        the default at write time, so old and new rows agree.  Type is
        a Spark DDL string ('double', 'bigint', 'string', ...)."""
        import json as _json

        from strawboat_spark.sources.datasource import (
            ManifestConflictError,
            _scalar_type,
            column_mapping,
            read_manifest,
            write_manifest,
        )

        _scalar_type(type_ddl)  # validate the type up front
        if default is not None:
            if not isinstance(default, (int, float, str, bool)):
                raise ValueError(
                    f"add_column: default must be a JSON scalar, got "
                    f"{type(default).__name__}"
                )
            _json.dumps(default)
        cols = self.read().columns
        if name in cols:
            raise ValueError(f"add_column: column {name!r} already exists")
        claimed = {a for v in column_mapping(self.path).values() for a in v}
        if name in claimed:
            raise ValueError(
                f"add_column: {name!r} is a historical name of another column "
                f"(renamed away or dropped); pick a fresh name"
            )
        for _attempt in range(50):
            man = read_manifest(self.path)
            if man is None:
                raise ValueError(f"add_column: {self.path} has no committed data")
            props = dict(man.get("properties") or {})
            cd = dict(props.get("column_defaults") or {})
            cd[name] = {"type": type_ddl, "default": default}
            props["column_defaults"] = cd
            try:
                write_manifest(
                    self.path,
                    man["entries"],
                    generation=man.get("generation", 0) + 1,
                    properties=props,
                    operation="add_column",
                )
                return
            except ManifestConflictError:
                continue
        raise ManifestConflictError(
            f"add_column({self.path}): lost the generation race 50 times"
        )

    def alter_column_type(self, name: str, type_ddl: str) -> None:
        """Metadata-only TYPE WIDENING (Delta type-widening analog):
        one manifest flip re-declares `name` at a wider same-family
        type — no data file touched at any table size.  Files keep
        their stored narrow type; the read path upcasts losslessly
        (int widenings are value-preserving, float -> double is exact),
        so stats/page pruning stays exact, and facade writes cast to
        the declared type so new files store it physically.  Supported:
        tinyint -> smallint -> int -> bigint, float -> double.
        Narrowing and cross-family changes are refused (they would be
        lossy — rewrite the data instead).  Time travel renders each
        generation under its own declared types."""
        from strawboat_spark.sources.datasource import (
            _WIDEN_FAMILIES,
            ManifestConflictError,
            read_manifest,
            write_manifest,
        )
        from strawboat_spark.sources.maintenance import _part_layout

        tgt = _WIDEN_FAMILIES.get(type_ddl.strip().lower())
        if tgt is None:
            raise ValueError(
                f"alter_column_type: {type_ddl!r} is not a widenable scalar "
                f"type (supported: {sorted(_WIDEN_FAMILIES)})"
            )
        fields = {f.name: f.dataType.simpleString() for f in self.read().schema.fields}
        if name not in fields:
            raise ValueError(
                f"alter_column_type: no column {name!r} (have {sorted(fields)})"
            )
        if name in _part_layout(self.path):
            raise ValueError(
                "alter_column_type: hive partition columns are typed by the "
                "directory layout and cannot be widened in place"
            )
        cur = _WIDEN_FAMILIES.get(fields[name])
        if cur is None or cur[0] != tgt[0] or cur[1] >= tgt[1]:
            raise ValueError(
                f"alter_column_type: {fields[name]} -> {type_ddl} is not a "
                f"lossless widening (int family: tinyint<smallint<int<bigint; "
                f"float family: float<double); rewrite the data for anything "
                f"else"
            )
        if name in self.generated_columns():
            raise ValueError(
                f"alter_column_type: {name!r} is a generated column; its type "
                f"follows the generation expression — re-declare that instead"
            )
        for _attempt in range(50):
            man = read_manifest(self.path)
            if man is None:
                raise ValueError(
                    f"alter_column_type: {self.path} has no committed data"
                )
            props = dict(man.get("properties") or {})
            ct = dict(props.get("column_types") or {})
            ct[name] = type_ddl.strip().lower()
            props["column_types"] = ct
            cd = dict(props.get("column_defaults") or {})
            if name in cd:
                # a declared column's default keeps rendering under the
                # widened type (read path casts the JSON scalar)
                cd[name] = {**cd[name], "type": type_ddl.strip().lower()}
                props["column_defaults"] = cd
            try:
                write_manifest(
                    self.path,
                    man["entries"],
                    generation=man.get("generation", 0) + 1,
                    properties=props,
                    operation="alter_column_type",
                )
                return
            except ManifestConflictError:
                continue
        raise ManifestConflictError(
            f"alter_column_type({self.path}): lost the generation race 50 times"
        )

    def drop_column(self, name: str) -> None:
        """Metadata-only DROP COLUMN (requires the column-mapping
        machinery): one manifest flip retargets the column's stored
        names onto a unique tombstone — no data file touched, reads
        stop rendering the column, time travel still shows it in
        pre-drop generations, and a LATER column re-added under the
        same name starts fresh (old files null-fill it; the tombstone
        owns their stored values, so nothing resurrects — Delta's
        column-mapping drop semantics).  The bytes remain until the
        owning files are rewritten or vacuumed.  Same refusals as
        rename_column (partition columns, constraint / generated
        references)."""
        import re as _re

        from strawboat_spark.sources.datasource import (
            ManifestConflictError,
            read_manifest,
            write_manifest,
        )
        from strawboat_spark.sources.maintenance import _part_layout

        cols = self.read().columns
        if name not in cols:
            raise ValueError(f"drop_column: no column {name!r} (have {cols})")
        if len(cols) == 1:
            raise ValueError("drop_column: cannot drop the only column")
        from strawboat_spark.sources.datasource import bucket_spec

        spec = bucket_spec(self.path)
        if spec and name == spec["col"]:
            raise ValueError(
                f"drop_column: {name!r} is the hash-bucket key; overwrite to "
                f"re-bucket (or drop the layout) first"
            )
        if name in _part_layout(self.path):
            raise ValueError(
                "drop_column: hive partition columns are physical directory "
                "names and cannot be dropped in place"
            )
        refs = {f"constraint {n!r}": e for n, e in self.constraints().items()}
        refs.update(
            {f"generated column {n!r}": e for n, e in self.generated_columns().items()}
        )
        for what, expr in refs.items():
            if _re.search(rf"\b{_re.escape(name)}\b", expr):
                raise ValueError(
                    f"drop_column: {what} references {name!r} ({expr}); "
                    f"drop it first"
                )
        gens = self.generated_columns()
        if name in gens:
            raise ValueError(
                f"drop_column: {name!r} is a generated column; drop its "
                f"declaration first"
            )
        from strawboat_spark.sources.datasource import _DROPPED_PREFIX

        for _attempt in range(50):
            man = read_manifest(self.path)
            if man is None:
                raise ValueError(f"drop_column: {self.path} has no committed data")
            gen = man.get("generation", 0)
            props = dict(man.get("properties") or {})
            cm = {k: list(v) for k, v in (props.get("column_mapping") or {}).items()}
            tomb = f"{_DROPPED_PREFIX}{gen + 1}__{name}"
            cm[tomb] = [name] + cm.pop(name, [])
            props["column_mapping"] = cm
            cd = dict(props.get("column_defaults") or {})
            if name in cd:
                del cd[name]  # dropping a declared column retires its default
                props["column_defaults"] = cd
            ct = dict(props.get("column_types") or {})
            if name in ct:
                del ct[name]  # dropping a column retires its widening
                props["column_types"] = ct
            try:
                write_manifest(
                    self.path,
                    man["entries"],
                    generation=gen + 1,
                    properties=props,
                    operation="drop_column",
                )
                return
            except ManifestConflictError:
                continue
        raise ManifestConflictError(
            f"drop_column({self.path}): lost the generation race 50 times"
        )

    def restore(
        self, generation: int | None = None, timestamp=None, tag: str | None = None
    ) -> None:
        """Delta RESTORE (by VERSION, TIMESTAMP, or TAG): commit a NEW
        generation whose entries equal the target generation's — the
        table's current state snaps back (including that generation's
        deletion-vector state) while the full history, time travel,
        and the change feed stay intact; no data file is touched.
        Requires the target generation retained (vacuum() retires the
        horizon; tagged generations are always retained)."""
        if sum(x is not None for x in (generation, timestamp, tag)) > 1:
            raise ValueError("restore: pass exactly one of generation/timestamp/tag")
        if tag is not None:
            tags = self.tags()
            if tag not in tags:
                raise ValueError(f"restore: unknown tag {tag!r} (have {sorted(tags)})")
            generation = tags[tag]
        if timestamp is not None:
            generation = self._resolve_timestamp(timestamp)
        if generation is None:
            raise ValueError("restore: a generation, timestamp, or tag is required")
        from strawboat_spark.sources.datasource import (
            ManifestConflictError,
            read_manifest,
            read_manifest_at,
            write_manifest,
        )

        target = read_manifest_at(self.path, generation)
        for _attempt in range(50):
            man = read_manifest(self.path)
            gen = (man.get("generation", 0) + 1) if man else 1
            try:
                # Restore table METADATA with the version (Delta RESTORE
                # semantics): the target's properties — column mapping,
                # drop tombstones, declared columns, bucket spec, txn
                # markers — snap back as one consistent snapshot.  A
                # post-target rename/drop is undone exactly like a
                # post-target delete; carrying the HEAD's properties
                # (the pre-r9 behavior) left e.g. a dropped column
                # dropped after restoring to a pre-drop generation.
                write_manifest(
                    self.path,
                    target["entries"],
                    generation=gen,
                    properties=target.get("properties") or {},
                    operation="restore",
                )
                return
            except ManifestConflictError:
                continue
        raise ManifestConflictError(
            f"restore({self.path}, {generation}): lost the generation race"
        )
