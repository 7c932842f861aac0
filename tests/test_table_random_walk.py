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
