"""Model-based random walk over the table layer: a seeded sequence of
append / COW delete / MOR delete / COW update / MOR update / MOR merge
/ compact / optimize / vacuum, each step checked against a plain
in-memory model. Per-feature tests pin each verb; this pins their
INTERACTIONS (vectors surviving compaction order, generation history
under mixed verbs, counts after vacuum, ...)."""

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
             "mor_merge", "compact", "vacuum"]
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
        elif op == "vacuum":
            t.vacuum(grace_seconds=0.0)
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
