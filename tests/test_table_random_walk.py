"""Model-based random walk over the table layer: a seeded sequence of
append / COW delete / MOR delete / COW update / MOR update / MOR merge
/ compact (count- and size-targeted) / vacuum / reorg-purge / WAP
stage-publish-or-discard / branch-then-fast-forward, each step checked
against a plain
in-memory model. Per-feature tests pin each verb; this pins their
INTERACTIONS (vectors surviving compaction order, generation history
under mixed verbs, counts after vacuum, staged/branched work invisible
until published/merged, ...)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from strawboat_spark.table import Table


def _model_as_set(model: dict[int, int]) -> set[tuple[int, int]]:
    return set(model.items())


def _table_as_set(t: Table) -> set[tuple[int, int]]:
    return {(r.k, r.v) for r in t.read().collect()}


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_random_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = Table(spark, str(tmp_path / f"walk{seed}"))
    # model: key -> value (keys unique by construction: inserts draw
    # from a fresh range each time, merges upsert by key)
    model: dict[int, int] = {i: i * 10 for i in range(40)}
    t.overwrite(
        spark.createDataFrame(sorted(model.items()), "k long, v long")
    )
    next_key = 1000
    ops: list[str] = []
    for step in range(14):
        op = rng.choice(
            ["append", "cow_delete", "mor_delete", "cow_update", "mor_update",
             "mor_merge", "compact", "compact_bytes", "vacuum", "wap",
             "branch_ff", "reorg_purge"]
        )
        ops.append(op)
        if op == "append":
            rows = [(next_key + i, (next_key + i) * 10) for i in range(5)]
            next_key += 5
            t.append(spark.createDataFrame(rows, "k long, v long"))
            model.update(dict(rows))
        elif op in ("cow_delete", "mor_delete"):
            mod = rng.randrange(2, 7)
            cond = f"k % {mod} = 1"
            t.delete(cond, mode="cow" if op == "cow_delete" else "mor")
            model = {k: v for k, v in model.items() if k % mod != 1}
        elif op in ("cow_update", "mor_update"):
            mod = rng.randrange(2, 7)
            t.update(
                f"k % {mod} = 0", {"v": "v + 1"},
                mode="cow" if op == "cow_update" else "mor",
            )
            model = {k: (v + 1 if k % mod == 0 else v) for k, v in model.items()}
        elif op == "mor_merge":
            keys = rng.sample(sorted(model), min(3, len(model))) if model else []
            src = [(k, model[k] + 7) for k in keys] + [(next_key, next_key * 10)]
            next_key += 1
            t.merge(
                spark.createDataFrame(src, "k long, v long"), on=["k"], mode="mor"
            )
            model.update(dict(src))
        elif op == "compact":
            t.compact(target_files=2)
        elif op == "compact_bytes":
            t.compact(target_bytes=64 * 1024)  # bin-pack the small tail
        elif op == "vacuum":
            t.vacuum(grace_seconds=0.0)
        elif op == "reorg_purge":
            # read-amplification maintenance: purely physical, the
            # model is untouched (r9 verb)
            t.reorg_purge(threshold=0.2)
        elif op == "wap":
            rows = [(next_key + i, (next_key + i) * 10) for i in range(3)]
            next_key += 3
            sid = t.stage_append(spark.createDataFrame(rows, "k long, v long"))
            assert _table_as_set(t) == _model_as_set(model)  # staged invisible
            if rng.random() < 0.5:
                t.publish_staged(sid)
                model.update(dict(rows))
            else:
                t.discard_staged(sid)
        elif op == "branch_ff":
            b = t.branch(f"walk{step}")
            rows = [(next_key + i, (next_key + i) * 10) for i in range(2)]
            next_key += 2
            b.append(spark.createDataFrame(rows, "k long, v long"))
            mod = rng.randrange(2, 7)
            b.delete(f"k % {mod} = 1", mode="mor")
            assert _table_as_set(t) == _model_as_set(model)  # branch invisible
            t.fast_forward(f"walk{step}")
            model.update(dict(rows))
            model = {k: v for k, v in model.items() if k % mod != 1}
        got = _table_as_set(t)
        want = _model_as_set(model)
        assert got == want, (
            f"seed={seed} step={step} op={op} ops={ops}: "
            f"extra={sorted(got - want)[:5]} missing={sorted(want - got)[:5]}"
        )
        assert t.count_rows() == len(model), (seed, step, op, ops)
    # history stayed coherent: head generation readable, count agrees
    head = t.history()[-1]["generation"]
    assert t.read(at_generation=head).count() == len(model)


def _rows_as_set(t: Table) -> set[tuple]:
    """Rows as (sorted-by-column-name) value tuples, schema-agnostic."""
    cols = sorted(t.read().columns)
    return {tuple(r[c] for c in cols) for r in t.read().collect()}


def _model_rows_as_set(model: dict[int, dict]) -> set[tuple]:
    out = set()
    for k, row in model.items():
        full = dict(row)
        full["k"] = k
        out.add(tuple(full[c] for c in sorted(full)))
    return out


@pytest.mark.parametrize("seed", [5, 83])
def test_schema_evolution_random_walk_matches_model(spark, tmp_path, seed):
    """The schema-evolution twin of the mutation walk: metadata-only
    verbs (rename / add-column-with-default / int->bigint widening /
    drop-column tombstone) interleaved with the mutation verbs whose
    machinery they must compose with — MOR deletes masking renamed
    files, updates assigning into widened columns, merges landing
    full-width sources over mixed-epoch files, compaction
    materializing all of it. Each step checks the FULL row image
    against a plain dict model (column names resolved per step, so a
    rename that leaked a stored name anywhere would surface as a
    missing/extra column)."""
    rng = random.Random(seed)
    t = Table(spark, str(tmp_path / f"schemawalk{seed}"))
    vname = "v"
    model: dict[int, dict] = {i: {"v": i * 10} for i in range(30)}
    t.overwrite(
        spark.createDataFrame(
            sorted((k, r["v"]) for k, r in model.items()), "k long, v long"
        )
    )
    extras: list[str] = []   # live added columns, all int-family
    defaults: dict[str, int | None] = {}
    widened: set[str] = set()
    next_key, next_col = 1000, 0
    ops: list[str] = []
    for step in range(16):
        op = rng.choice(
            ["append", "add_column", "widen", "rename_v", "rename_extra",
             "drop_extra", "update_v", "update_extra", "mor_delete",
             "cow_delete", "merge", "compact", "vacuum", "set_layout"]
        )
        ops.append(op)
        if op == "append":
            # appends stay (k, v)-shaped: every declared extra must be
            # filled with ITS default at write time, whatever epoch
            # declared it
            rows = [(next_key + i, (next_key + i) * 10) for i in range(4)]
            next_key += 4
            t.append(spark.createDataFrame(rows, f"k long, {vname} long"))
            for k, v in rows:
                model[k] = {vname: v, **{e: defaults[e] for e in extras}}
        elif op == "add_column":
            name = f"w{next_col}"
            next_col += 1
            d = rng.choice([None, rng.randrange(100)])
            t.add_column(name, "int", default=d)
            extras.append(name)
            defaults[name] = d
            for row in model.values():
                row[name] = d
        elif op == "widen" and extras:
            cand = [e for e in extras if e not in widened]
            if cand:
                e = rng.choice(cand)
                t.alter_column_type(e, "bigint")
                widened.add(e)  # values unchanged — metadata only
        elif op == "rename_v":
            new = vname + "x"
            t.rename_column(vname, new)
            for row in model.values():
                row[new] = row.pop(vname)
            vname = new
        elif op == "rename_extra" and extras:
            e = rng.choice(extras)
            new = e + "r"
            t.rename_column(e, new)
            extras[extras.index(e)] = new
            defaults[new] = defaults.pop(e)
            if e in widened:
                widened.discard(e)
                widened.add(new)
            for row in model.values():
                row[new] = row.pop(e)
        elif op == "drop_extra" and extras:
            e = extras.pop(rng.randrange(len(extras)))
            t.drop_column(e)
            defaults.pop(e)
            widened.discard(e)
            for row in model.values():
                row.pop(e)
        elif op == "update_v":
            mod = rng.randrange(2, 7)
            t.update(
                f"k % {mod} = 0", {vname: f"{vname} + 1"},
                mode=rng.choice(["cow", "mor"]),
            )
            for k, row in model.items():
                if k % mod == 0:
                    row[vname] += 1
        elif op == "update_extra" and extras:
            e = rng.choice(extras)
            mod = rng.randrange(2, 7)
            # assigns a LONG expression into the int/bigint column —
            # the store-assignment cast must keep the declared type
            t.update(f"k % {mod} = 1", {e: "k"}, mode=rng.choice(["cow", "mor"]))
            for k, row in model.items():
                if k % mod == 1:
                    row[e] = k
        elif op in ("mor_delete", "cow_delete"):
            mod = rng.randrange(2, 7)
            t.delete(f"k % {mod} = 2", mode=op.split("_")[0])
            model = {k: r for k, r in model.items() if k % mod != 2}
        elif op == "merge":
            keys = rng.sample(sorted(model), min(3, len(model))) if model else []
            src_rows = []
            for k in keys + [next_key]:
                row = {vname: k * 10 + 3,
                       **{e: rng.randrange(50) for e in extras}}
                src_rows.append((k, *(row[c] for c in [vname] + extras)))
                model[k] = row
            next_key += 1
            schema = ", ".join(
                ["k long", f"{vname} long"] + [f"{e} long" for e in extras]
            )
            src = spark.createDataFrame(src_rows, schema)
            t.merge(src, on=["k"], mode=rng.choice(["cow", "mor"]))
        elif op == "compact":
            t.compact(target_files=2)
        elif op == "vacuum":
            t.vacuum(grace_seconds=0.0)
        elif op == "set_layout":
            # partition-spec evolution in the middle of everything
            # else: a metadata flip that must not change a single row
            # image, while every later mutation works over the mixed
            # epochs it creates (k is the one whitelisted stable
            # column — v/extras rename and drop)
            t.set_partition_layout(rng.choice([None, "k"]))
        got = _rows_as_set(t)
        want = _model_rows_as_set(model)
        assert got == want, (
            f"seed={seed} step={step} op={op} ops={ops}: "
            f"extra={sorted(got - want)[:3]} missing={sorted(want - got)[:3]}"
        )
        assert sorted(t.read().columns) == sorted(["k", vname] + extras)
        assert t.count_rows() == len(model), (seed, step, op, ops)
    head = t.history()[-1]["generation"]
    assert t.read(at_generation=head).count() == len(model)
