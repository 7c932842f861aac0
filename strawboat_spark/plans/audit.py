"""Physical-plan audits.

Usage:
    from strawboat_spark.plans.audit import plan_text, audit
    report = audit(df)
    assert report.n_broadcast_joins >= 1
    assert report.pushed_filters      # filters reached the scan

These run on the optimized physical plan (post-AQE-initial): the same
properties that decide 100 TB behavior — join strategy, scan-level
filter/column pruning, shuffle count — are visible at any SF, which is
what makes local plan tests meaningful for cluster scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def executed_plan_text(df: DataFrame) -> str:
    """Final (post-AQE) executed plan — call after an action; this is
    where WholeStageCodegen spans are visible under AQE."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanReport:
    text: str
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_shuffled_hash_joins: int = 0
    n_nested_loop_joins: int = 0
    n_exchanges: int = 0
    n_codegen_stages: int = 0
    n_hash_aggregates: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    has_take_ordered: bool = False


def audit(df: DataFrame) -> PlanReport:
    txt = plan_text(df)
    simple = plan_text(df, "simple")
    r = PlanReport(text=txt)
    def _nodes(name: str) -> int:
        # formatted mode prints each node in the tree AND a detail
        # section — count unique node ids so one operator counts once.
        ids = set(re.findall(rf"\((\d+)\) {name}", txt))
        return len(ids) if ids else len(re.findall(name, simple))

    r.n_broadcast_joins = _nodes("BroadcastHashJoin")
    r.n_sortmerge_joins = _nodes("SortMergeJoin")
    r.n_shuffled_hash_joins = _nodes("ShuffledHashJoin")
    r.n_nested_loop_joins = _nodes("BroadcastNestedLoopJoin")
    # formatted mode prints each node in the tree AND a detail section;
    # count unique node ids so one Exchange counts once.
    r.n_exchanges = len(set(re.findall(r"\((\d+)\) Exchange", txt)))
    # codegen stage markers (*(N)) only appear in simple mode pre-AQE
    r.n_codegen_stages = len(
        set(re.findall(r"WholeStageCodegen \((\d+)\)", txt))
        | set(re.findall(r"\*\((\d+)\)", simple))
    )
    r.pushed_filters = [
        m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", txt) if m.strip()
    ]
    r.read_schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", txt)
    r.n_hash_aggregates = len(set(re.findall(r"\((\d+)\) HashAggregate", txt)))
    r.has_take_ordered = "TakeOrderedAndProject" in txt
    return r
