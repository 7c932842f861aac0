"""SQL front-end for the table layer's mutation verbs.

The engine's reads are plain Spark SQL already (views over `read()`);
this module closes the WRITE-side gap for users arriving from Delta:

    MERGE INTO strawboat.`/path/t` AS t USING src AS s ON t.k = s.k
      WHEN MATCHED AND s.op = 'del' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *
    UPDATE strawboat.`/path/t` SET v = v + 1 WHERE k = 3
    DELETE FROM strawboat.`/path/t` WHERE k = 3
    RESTORE TABLE strawboat.`/path/t` TO VERSION AS OF 2
    RESTORE TABLE strawboat.`/path/t` TO TIMESTAMP AS OF '2026-01-01'
    OPTIMIZE strawboat.`/path/t` WHERE region = 'eu' ZORDER BY (a, b)
    OPTIMIZE strawboat.`/path/t` REWRITE EPOCH
    VACUUM strawboat.`/path/t` RETAIN 168 HOURS [DRY RUN]
    DESCRIBE HISTORY strawboat.`/path/t`
    DESCRIBE DETAIL strawboat.`/path/t`
    DESCRIBE PARTITIONS strawboat.`/path/t`
    ALTER TABLE strawboat.`/path/t` RENAME COLUMN a TO b
    ALTER TABLE strawboat.`/path/t` ADD COLUMN x int [DEFAULT <json>]
    ALTER TABLE strawboat.`/path/t` DROP COLUMN x
    ALTER TABLE strawboat.`/path/t` ALTER COLUMN x TYPE bigint
    ALTER TABLE strawboat.`/path/t` SET PARTITIONED BY (lang) | ()
    INSERT INTO strawboat.`/path/t` [(cols)] SELECT ... | VALUES ...
    INSERT OVERWRITE strawboat.`/path/t` SELECT ...
    CREATE [OR REPLACE] TABLE strawboat.`/path/u`
      [PARTITIONED BY (region, days(ts))] AS SELECT ...
    REORG TABLE strawboat.`/path/t` APPLY (PURGE) [WHERE dv_fraction >= 0.3]

Deliberately a THIN dispatcher: each statement parses into one
`strawboat_spark.table.Table` method call — the scale/atomicity story
(CAS generation flips, executor-side deletion vectors, file-pruned
rewrites) is entirely the table layer's; no Catalyst extension and no
second mutation path to keep consistent.  Statements the subset does
not cover raise ValueError naming the unsupported clause.

Table identifiers: `strawboat.`/abs/path`` (Delta's `delta.`path``
style), a bare backtick-quoted path, or a single-quoted path.
MERGE sources: a registered view/table name or `( SELECT ... )`.
UPDATE/DELETE accept a trailing `WITH (mode = 'mor')` to choose
merge-on-read deletion vectors over copy-on-write.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from strawboat_spark.table import Table

_ID = r"(?:strawboat\.)?(?:`(?P<bt>[^`]+)`|'(?P<sq>[^']+)')"


def _strip(sql: str) -> str:
    """Strip line comments and normalize whitespace, STRING-AWARE: a
    '--' or run of spaces inside a quoted literal is payload, not
    syntax (WHERE s = 'a--b' must survive)."""
    out: list[str] = []
    i, n = 0, len(sql)
    in_str: str | None = None
    while i < n:
        c = sql[i]
        if in_str:
            out.append(c)
            if c == in_str:
                in_str = None
            i += 1
            continue
        if c in "'\"":
            in_str = c
            out.append(c)
            i += 1
            continue
        if c == "-" and sql[i : i + 2] == "--":
            while i < n and sql[i] != "\n":
                i += 1
            continue
        if c.isspace():
            if out and out[-1] != " ":
                out.append(" ")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out).strip().rstrip(";").strip()


def _path(m: re.Match) -> str:
    return m.group("bt") or m.group("sq")


def _mode_suffix(rest: str) -> tuple[str, str]:
    """Split a trailing WITH (mode='cow'|'mor') off `rest`."""
    m = re.search(r"\s+WITH\s*\(\s*mode\s*=\s*'(cow|mor)'\s*\)\s*$", rest, re.I)
    if m:
        return rest[: m.start()], m.group(1).lower()
    return rest, "cow"


def execute_sql_script(spark: SparkSession, script: str) -> list:
    """Execute a ';'-separated script of statements in order (the
    separator is string-aware — a ';' inside a quoted literal is
    payload).  Returns the per-statement results."""
    return [
        execute_sql(spark, stmt)
        for stmt in _split_top(_strip(script), ";")
        if stmt.strip()
    ]


def execute_sql(spark: SparkSession, sql: str):
    """Execute one table-layer DML/maintenance statement.  Returns a
    DataFrame for DESCRIBE verbs, else the table method's stats dict.
    Anything that isn't a recognized mutation verb falls through to
    spark.sql() unchanged (SELECT/CTE/etc. just work)."""
    s = _strip(sql)
    up = s.upper()
    if up.startswith("MERGE INTO "):
        return _merge(spark, s)
    if up.startswith("INSERT INTO ") or up.startswith("INSERT OVERWRITE "):
        return _insert(spark, s)
    if up.startswith("CREATE TABLE ") or up.startswith("CREATE OR REPLACE TABLE "):
        return _create(spark, s)
    if up.startswith("UPDATE "):
        return _update(spark, s)
    if up.startswith("DELETE FROM "):
        return _delete(spark, s)
    if up.startswith("RESTORE TABLE ") or up.startswith("RESTORE "):
        return _restore(spark, s)
    if up.startswith("OPTIMIZE "):
        return _optimize(spark, s)
    if up.startswith("VACUUM "):
        return _vacuum(spark, s)
    if up.startswith("SHOW TBLPROPERTIES "):
        m = _require(rf"SHOW TBLPROPERTIES {_ID}$", s, "SHOW TBLPROPERTIES <table>")
        import json as _json

        t = Table(spark, _path(m))
        rows = [(k, _json.dumps(v)) for k, v in sorted((t.properties() or {}).items())]
        return spark.createDataFrame(rows or [("", "")], "key string, value string").filter(
            "key <> ''"
        )
    if up.startswith("DESCRIBE HISTORY "):
        m = _require(rf"DESCRIBE HISTORY {_ID}$", s, "DESCRIBE HISTORY <table>")
        return Table(spark, _path(m)).history_df()
    if up.startswith("DESCRIBE DETAIL "):
        m = _require(rf"DESCRIBE DETAIL {_ID}$", s, "DESCRIBE DETAIL <table>")
        return Table(spark, _path(m)).detail()
    if up.startswith("DESCRIBE PARTITIONS "):
        m = _require(
            rf"DESCRIBE PARTITIONS {_ID}$", s, "DESCRIBE PARTITIONS <table>"
        )
        return Table(spark, _path(m)).partitions()
    if up.startswith("ALTER TABLE "):
        return _alter(spark, s)
    if up.startswith("REORG TABLE ") or up.startswith("REORG "):
        m = _require(
            rf"REORG (?:TABLE )?{_ID}\s+APPLY\s*\(\s*PURGE\s*\)"
            r"(?:\s+WHERE\s+dv_fraction\s*>=\s*(?P<thr>[\d.]+))?",
            s,
            "REORG TABLE <table> APPLY (PURGE) [WHERE dv_fraction >= x]",
        )
        thr = float(m.group("thr")) if m.group("thr") else 0.2
        return Table(spark, _path(m)).reorg_purge(threshold=thr)
    return spark.sql(sql)


def _require(pattern: str, s: str, usage: str) -> re.Match:
    m = re.fullmatch(pattern, s, re.I)
    if not m:
        raise ValueError(f"strawboat SQL: could not parse statement; expected {usage}")
    return m


def _create(spark: SparkSession, s: str):
    """CTAS: CREATE [OR REPLACE] TABLE <table>
    [PARTITIONED BY (cols...)] AS <SELECT ...>.  Plain CREATE refuses
    an existing table (Delta semantics); OR REPLACE overwrites while
    keeping generation history.  PARTITIONED BY accepts plain columns
    and one days()/months() hidden transform, same as the Python API."""
    m = _require(
        rf"CREATE (?P<repl>OR REPLACE )?TABLE {_ID}"
        r"(?:\s+PARTITIONED BY\s*\((?P<pb>[\w\s,()]+)\))?\s+AS\s+(?P<q>.+)",
        s,
        "CREATE [OR REPLACE] TABLE <table> [PARTITIONED BY (...)] AS SELECT ...",
    )
    from strawboat_spark.sources.datasource import read_manifest

    path = _path(m)
    t = Table(spark, path)
    if m.group("repl") is None and read_manifest(path) is not None:
        raise ValueError(
            f"strawboat SQL: table {path!r} already exists "
            f"(use CREATE OR REPLACE TABLE, or INSERT INTO)"
        )
    df = spark.sql(m.group("q"))
    pb = ",".join(c.strip() for c in (m.group("pb") or "").split(",") if c.strip())
    # rows_inserted from THIS commit's own manifest metrics (see
    # _insert): no double execution of non-deterministic sources, no
    # attribution of a racing committer's rows, no extra scan.
    import uuid as _uuid

    from strawboat_spark.sources.datasource import find_commit

    cu = _uuid.uuid4().hex
    before = read_manifest(path)
    before_gen = before.get("generation", 0) if before else 0
    if pb:
        t.overwrite(df, partition_by=pb, commit_uuid=cu)
    else:
        t.overwrite(df, commit_uuid=cu)
    committed = find_commit(path, cu, before_gen)
    if committed is not None:
        n = committed.get("commit_metrics", {}).get("rows_written", 0)
    else:
        n = t.count_rows()
    return {"rows_inserted": int(n)}


def _insert(spark: SparkSession, s: str):
    """INSERT INTO <table> <SELECT ...|VALUES ...|TABLE name> appends
    through the full facade (constraints, generated columns, defaults,
    bucketing); INSERT OVERWRITE replaces the snapshot.  An optional
    column list reorders/projects the query's output by NAME."""
    m = _require(
        rf"INSERT (?P<mode>INTO|OVERWRITE) (?:TABLE )?{_ID}"
        r"(?:\s*\((?P<cols>[\w\s,]+)\))?\s+(?P<q>.+)",
        s,
        "INSERT INTO|OVERWRITE <table> [(cols)] SELECT ...",
    )
    t = Table(spark, _path(m))
    q = m.group("q")
    if re.match(r"VALUES\s*\(", q, re.I):
        q = f"SELECT * FROM ( {q} )"
    df = spark.sql(q)
    cols = [c.strip() for c in (m.group("cols") or "").split(",") if c.strip()]
    existing = Table(spark, _path(m))
    try:
        tcols = existing.read().columns
    except Exception:
        tcols = []
    if cols:
        if len(cols) != len(df.columns):
            raise ValueError(
                f"strawboat SQL INSERT: {len(cols)} target columns but the "
                f"query produces {len(df.columns)}"
            )
        df = df.toDF(*cols)
        # SQL INSERT semantics are positional-by-list; the table layer
        # appends by NAME in schema order — realign when it exists
        if set(tcols) == set(df.columns):
            df = df.select(*tcols)
    elif tcols and len(tcols) == len(df.columns) and set(tcols) != set(df.columns):
        # bare INSERT (e.g. VALUES' col1/col2 names): SQL semantics are
        # positional — adopt the table's schema order by position
        df = df.toDF(*tcols)
    # rows_inserted comes from THIS commit's own manifest entries: the
    # write stamps a commit_uuid into the generation it publishes, whose
    # commit_metrics.rows_written sums the new files' footer num_rows.
    # Exact under concurrent committers (a before/after table-wide
    # count_rows() delta attributes a racing commit's rows to this
    # INSERT) and metadata-only (no extra scan, no double execution of
    # non-deterministic sources).
    import uuid as _uuid

    from strawboat_spark.sources.datasource import find_commit, read_manifest

    cu = _uuid.uuid4().hex
    before = read_manifest(t.path)
    before_gen = before.get("generation", 0) if before else 0
    if m.group("mode").upper() == "OVERWRITE":
        t.overwrite(df, commit_uuid=cu)
    else:
        t.append(df, commit_uuid=cu)
    committed = find_commit(t.path, cu, before_gen)
    if committed is not None:
        n = committed.get("commit_metrics", {}).get("rows_written", 0)
    elif m.group("mode").upper() == "OVERWRITE":
        n = t.count_rows()  # stamp not found — metadata-only fallback
    else:
        n = t.count_rows() - (t.count_rows(before_gen) if before_gen else 0)
    return {"rows_inserted": int(n)}


def _update(spark: SparkSession, s: str):
    body, mode = _mode_suffix(s)
    m = _require(
        rf"UPDATE {_ID}\s+SET\s+(?P<set>.+?)(?:\s+WHERE\s+(?P<where>.+))?",
        body,
        "UPDATE <table> SET c = expr[, ...] [WHERE cond] [WITH (mode='mor')]",
    )
    assignments = _parse_assignments(m.group("set"))
    t = Table(spark, _path(m))
    return t.update(m.group("where") or "true", assignments, mode=mode)


def _delete(spark: SparkSession, s: str):
    body, mode = _mode_suffix(s)
    m = _require(
        rf"DELETE FROM {_ID}(?:\s+WHERE\s+(?P<where>.+))?",
        body,
        "DELETE FROM <table> [WHERE cond] [WITH (mode='mor')]",
    )
    t = Table(spark, _path(m))
    return t.delete(m.group("where") or "true", mode=mode)


def _restore(spark: SparkSession, s: str):
    m = _require(
        rf"RESTORE (?:TABLE )?{_ID}\s+TO\s+(?:VERSION AS OF (?P<gen>\d+)"
        r"|TIMESTAMP AS OF '(?P<ts>[^']+)'|TAG '(?P<tag>[^']+)')",
        s,
        "RESTORE TABLE <table> TO VERSION AS OF n | TIMESTAMP AS OF 'ts' | TAG 'name'",
    )
    t = Table(spark, _path(m))
    if m.group("gen") is not None:
        t.restore(int(m.group("gen")))
    elif m.group("ts") is not None:
        t.restore(timestamp=m.group("ts"))
    else:
        t.restore(tag=m.group("tag"))
    return {"restored": True}


def _optimize(spark: SparkSession, s: str):
    # OPTIMIZE <t> REWRITE EPOCH — the Iceberg rewrite_data_files
    # analog: migrate files whose directory layout differs from the
    # declared partition spec (see Table.rewrite_epoch)
    me = re.fullmatch(
        rf"OPTIMIZE {_ID}\s+REWRITE\s+EPOCH(?:\s+WHERE\s+(?P<where>.+?))?",
        s,
        re.I | re.S,
    )
    if me:
        return Table(spark, _path(me)).rewrite_epoch(where=me.group("where"))
    m = _require(
        rf"OPTIMIZE {_ID}(?:\s+WHERE\s+(?P<where>.+?))?"
        r"(?:\s+ZORDER BY\s*\(?(?P<z>[\w\s,]+?)\)?)?",
        s,
        "OPTIMIZE <table> [WHERE <partition predicate>] [ZORDER BY (a, b)] | "
        "OPTIMIZE <table> REWRITE EPOCH",
    )
    z = [c.strip() for c in (m.group("z") or "").split(",") if c.strip()]
    return Table(spark, _path(m)).optimize(
        zorder_by=z or None, where=m.group("where")
    )


def _vacuum(spark: SparkSession, s: str):
    m = _require(
        rf"VACUUM {_ID}(?:\s+RETAIN\s+(?P<h>\d+(?:\.\d+)?)\s+HOURS)?"
        r"(?:\s+(?P<dry>DRY RUN))?",
        s,
        "VACUUM <table> [RETAIN n HOURS] [DRY RUN]",
    )
    grace = float(m.group("h")) * 3600.0 if m.group("h") else 3600.0 * 168
    return Table(spark, _path(m)).vacuum(
        grace_seconds=grace, dry_run=m.group("dry") is not None
    )


def _alter(spark: SparkSession, s: str):
    t_m = re.match(rf"ALTER TABLE {_ID}\s+(?P<rest>.+)", s, re.I)
    if not t_m:
        raise ValueError("strawboat SQL: could not parse ALTER TABLE target")
    t = Table(spark, _path(t_m))
    rest = t_m.group("rest")
    if m := re.fullmatch(r"RENAME COLUMN (\w+) TO (\w+)", rest, re.I):
        t.rename_column(m.group(1), m.group(2))
        return {"renamed": [m.group(1), m.group(2)]}
    if m := re.fullmatch(
        r"ADD COLUMNS? \(?\s*(\w+)\s+(\w+)(?:\s+DEFAULT\s+(.+?))?\s*\)?", rest, re.I
    ):
        import json

        default = json.loads(m.group(3)) if m.group(3) is not None else None
        t.add_column(m.group(1), m.group(2).lower(), default=default)
        return {"added": m.group(1)}
    if m := re.fullmatch(r"DROP COLUMNS? \(?\s*(\w+)\s*\)?", rest, re.I):
        t.drop_column(m.group(1))
        return {"dropped": m.group(1)}
    if m := re.fullmatch(r"ALTER COLUMN (\w+) (?:TYPE|SET DATA TYPE) (\w+)", rest, re.I):
        t.alter_column_type(m.group(1), m.group(2).lower())
        return {"widened": m.group(1)}
    if m := re.fullmatch(r"ADD CONSTRAINT (\w+) CHECK\s*\((?P<e>.+)\)", rest, re.I):
        t.add_constraint(m.group(1), m.group("e"))
        return {"constraint_added": m.group(1)}
    if m := re.fullmatch(r"DROP CONSTRAINT (\w+)", rest, re.I):
        t.drop_constraint(m.group(1))
        return {"constraint_dropped": m.group(1)}
    if m := re.fullmatch(
        r"SET PARTITIONED BY \(\s*([\w,\s]*?)\s*\)", rest, re.I
    ):
        # partition-spec evolution (Iceberg's REPLACE PARTITION FIELD
        # analog): () drops the layout — metadata-only either way
        cols = ",".join(c.strip() for c in m.group(1).split(",") if c.strip())
        t.set_partition_layout(cols or None)
        return {"partition_layout": cols or None}
    raise ValueError(
        f"strawboat SQL: unsupported ALTER TABLE clause {rest!r} (supported: "
        "RENAME COLUMN a TO b, ADD COLUMN x type [DEFAULT j], DROP COLUMN x, "
        "ALTER COLUMN x TYPE t, ADD CONSTRAINT n CHECK (e), DROP CONSTRAINT n, "
        "SET PARTITIONED BY (a, b) / ())"
    )


def _parse_assignments(set_clause: str) -> dict[str, str]:
    """`a = expr, b = expr` -> {a: expr} — split on top-level commas
    (commas inside parens/strings stay put)."""
    parts = _split_top(set_clause, ",")
    out: dict[str, str] = {}
    for p in parts:
        m = re.match(r"\s*(\w+)\s*=\s*(.+?)\s*$", p, re.S)
        if not m:
            raise ValueError(f"strawboat SQL: bad SET assignment {p!r}")
        out[m.group(1)] = m.group(2)
    return out


def _split_top(s: str, sep: str) -> list[str]:
    out, depth, cur, in_str = [], 0, [], None
    for ch in s:
        if in_str:
            cur.append(ch)
            if ch == in_str:
                in_str = None
            continue
        if ch in "'\"":
            in_str = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    out.append("".join(cur))
    return [p for p in (x.strip() for x in out) if p]


# ---------------------------------------------------------------- MERGE


_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?:\s+AND\s+(?P<cond>.*?))?\s+THEN\s+"
    r"(?P<act>UPDATE SET .*?|DELETE|INSERT .*?)(?=\s+WHEN\s+(?:NOT\s+)?MATCHED|$)",
    re.I | re.S,
)


def _merge(spark: SparkSession, s: str):
    head = re.match(
        rf"MERGE INTO {_ID}(?:\s+AS\s+(?P<talias>\w+)|\s+(?P<talias2>\w+))?\s+"
        r"USING\s+(?P<src>\(.*?\)|\w+)(?:\s+AS\s+(?P<salias>\w+)|\s+(?P<salias2>\w+))?\s+"
        r"ON\s+(?P<on>.+?)\s+(?P<whens>WHEN\s+.*)",
        s,
        re.I | re.S,
    )
    if not head:
        raise ValueError(
            "strawboat SQL: could not parse MERGE INTO <table> [AS t] USING "
            "<view|(SELECT ...)> [AS s] ON <cond> WHEN ..."
        )
    path = _path(head)
    talias = head.group("talias") or head.group("talias2") or "t"
    salias = head.group("salias") or head.group("salias2") or "s"
    srcq = head.group("src")
    source = (
        spark.sql(srcq[1:-1]) if srcq.startswith("(") else spark.table(srcq)
    )
    on = _parse_on(head.group("on"), talias, salias)

    matched_update = None
    matched_delete = None
    not_matched_insert = None
    for w in _WHEN_RE.finditer(head.group("whens")):
        raw_cond = w.group("cond")
        act = w.group("act").strip()
        if w.group("not"):
            # the insert clause evaluates over SOURCE rows alone: s.x
            # becomes the plain column; a t.x reference is meaningless
            if raw_cond and re.search(rf"\b{re.escape(talias)}\.\w+", raw_cond):
                raise ValueError(
                    "strawboat SQL MERGE: WHEN NOT MATCHED conditions see "
                    "source columns only (no target row exists)"
                )
            cond = (
                re.sub(rf"\b{re.escape(salias)}\.(\w+)", r"\1", raw_cond)
                if raw_cond
                else None
            )
        else:
            cond = (
                _rewrite_refs(raw_cond, talias, salias, source.columns)
                if raw_cond
                else None
            )
        if w.group("not"):
            if not re.fullmatch(r"INSERT\s+\*", act, re.I):
                mi = re.fullmatch(
                    r"INSERT\s*\(([\w\s,]+)\)\s*VALUES\s*\(([\w\s,.]+)\)", act, re.I
                )
                ok = False
                if mi:
                    cols = [c.strip() for c in mi.group(1).split(",")]
                    vals = [v.strip() for v in mi.group(2).split(",")]
                    ok = all(
                        re.fullmatch(rf"(?:{salias}\.)?{re.escape(c)}", v)
                        for c, v in zip(cols, vals)
                    ) and len(cols) == len(vals)
                if not ok:
                    raise ValueError(
                        "strawboat SQL MERGE: the INSERT clause supports INSERT * "
                        "or an identity column list (INSERT (a,b) VALUES (s.a, s.b)) "
                        "— expression inserts: project them in the USING subquery"
                    )
            not_matched_insert = cond or "true"
        elif re.fullmatch(r"DELETE", act, re.I):
            if matched_delete is not None:
                raise ValueError("strawboat SQL MERGE: one WHEN MATCHED DELETE clause")
            matched_delete = cond or "true"
        else:
            if matched_update is not None:
                raise ValueError("strawboat SQL MERGE: one WHEN MATCHED UPDATE clause")
            set_clause = re.sub(r"^UPDATE SET\s+", "", act, flags=re.I)
            raw = _parse_assignments(set_clause)
            assignments = {
                c: _rewrite_refs(e, talias, salias, source.columns)
                for c, e in raw.items()
            }
            matched_update = (cond, assignments)
    return Table(spark, path).merge_when(
        source,
        on=on,
        matched_update=matched_update,
        matched_delete=matched_delete,
        not_matched_insert=not_matched_insert,
    )


def _parse_on(on: str, talias: str, salias: str) -> list[str]:
    """Equality-conjunction ON (t.k = s.k AND ...) -> key column list —
    the table layer's merge joins on key columns; theta-ON is out of
    the subset."""
    keys = []
    for part in re.split(r"\s+AND\s+", on.strip(), flags=re.I):
        m = re.fullmatch(
            rf"\(?\s*(?:(\w+)\.)?(\w+)\s*=\s*(?:(\w+)\.)?(\w+)\s*\)?", part.strip()
        )
        if not m:
            raise ValueError(
                f"strawboat SQL MERGE: ON must be equality conjunctions "
                f"(t.k = s.k AND ...), got {part.strip()!r}"
            )
        a_al, a, b_al, b = m.groups()
        # orient target = source
        if (a_al or talias) == talias and (b_al or salias) == salias:
            tk, sk = a, b
        elif (a_al or salias) == salias and (b_al or talias) == talias:
            tk, sk = b, a
        else:
            raise ValueError(
                f"strawboat SQL MERGE: ON terms must join target and source "
                f"aliases ({talias!r}/{salias!r}), got {part.strip()!r}"
            )
        if tk != sk:
            raise ValueError(
                f"strawboat SQL MERGE: target and source key columns must share "
                f"a name (got {tk!r} = {sk!r}); alias them in the USING subquery"
            )
        keys.append(tk)
    return keys


def _rewrite_refs(expr: str, talias: str, salias: str, src_cols: list[str]) -> str:
    """Rewrite alias-qualified references into the table layer's
    merge_when namespace: t.x -> x, s.x -> src_x.  String literals are
    left untouched."""
    out = []
    for i, seg in enumerate(re.split(r"('(?:[^']|'')*')", expr)):
        if i % 2:  # a quoted literal
            out.append(seg)
            continue
        seg = re.sub(rf"\b{re.escape(salias)}\.(\w+)", r"src_\1", seg)
        seg = re.sub(rf"\b{re.escape(talias)}\.(\w+)", r"\1", seg)
        out.append(seg)
    return "".join(out)
