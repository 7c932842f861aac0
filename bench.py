"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (r15): the FINAL stdout line is one COMPACT JSON object
{"metric": "headline_queries_total", "value": total_sec, "unit": "sec",
"queries": {name: best_sec}, "sf": ..., "n_runs": ..., "canary": {...,
"runs": [...]}, "canary_py": {..., "runs": [...]}} — ~1 KB, sized so a
bounded stdout-TAIL capture always keeps it whole (pre-r15 one huge
line carried runs+plans too and every driver BENCH_r*.json recorded an
unparseable head-truncated tail).  Full per-run timings and plan
fingerprints are printed as an EARLIER "headline_queries_detail" line
and written to BENCH_DETAIL.json.

Adjudication machinery (r9):
- per-query best-of-N (N = $SPARK_GRAFT_BENCH_RUNS, default 3) with the
  raw per-run timings recorded under "runs" — plan-change vs host-noise
  is decided from the spread, not relitigated;
- an executed-plan fingerprint per query ("plans"): sha256 of the final
  AQE physical plan string with expression ids / codegen ids / temp
  paths normalized away.  Equal fingerprints across rounds = same plan,
  so a timing delta is environment, not a regression;
- a canary guard: q6 (pure scan+agg, plan-stable since r1).  r16: the
  gate is RELATIVE — this run's canary best vs the previous driver
  BENCH_r*.json record's (>1.2x => "loaded_host": true), because the
  absolute floor went stale as q6 got faster (r15: flag said clean on
  a 1.24x-slower canary).  The absolute floor remains as a secondary
  catch when no parseable history exists.
- a PYTHON-WORKER canary (r13): q6 is pure JVM, so it is blind to
  Python-worker-side contention — the axis the r12 drift concentrated
  on (the regressors skewed mapInArrow/pandas-UDF-heavy while q6 was
  flat).  A fixed tiny mapInArrow round-trip is timed once per pass;
  its excess over floor is reported as "canary_py" with its own
  loaded_host_py flag, so driver-vs-self comparisons can separate JVM
  noise from Python-worker noise with data.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

# q6 is the canary: single-table scan + agg, no joins, plan unchanged
# since r1.  Rolling floor over BENCH_r01..r08 driver runs: 0.29 s.
# r16: the floor went stale (q6's best drifted to 0.17-0.24 s, so the
# absolute 0.29*1.4 gate slept through a 1.24x-slower r15 canary) — the
# PRIMARY gate is now RELATIVE: this run's canary best vs the previous
# BENCH_r{N}.json record's canary best (>1.2x => loaded).  The absolute
# floor stays as a secondary catch for a slow FIRST round / missing
# history.  Both the ratio and the prior record ride the compact line.
CANARY = "q6_forecast_revenue"
CANARY_FLOOR = 0.29
CANARY_REL_GATE = 1.2

# Python-worker canary: 8 tasks x one Arrow batch through mapInArrow.
# Pure worker round-trip (serialize -> Python -> deserialize), compute
# negligible.  Floor calibrated on an idle local[32] host (r13):
# 0.354 s min over 8 post-warmup runs at load<0.6.
PY_CANARY_FLOOR = 0.35


_PREV_CANARY_WINDOW = 5


def _prev_canaries() -> dict:
    """Baseline canary bests for the relative loaded-host gate: the MIN
    over the last _PREV_CANARY_WINDOW parseable driver BENCH_r*.json
    records (numeric round order — lexicographic breaks at r100).

    Min-over-window, not latest-record: a loaded round writes an
    elevated canary into its own record, and baselining each round on
    the one before would let consecutive loaded rounds RATCHET the
    baseline up (r_n at 1.36x flags, r_{n+1} at 1.18x of the already-
    elevated r_n reads clean while sitting 1.6x over healthy) — the
    exact stale-baseline blindness this gate replaced.  Returns {} when
    no parseable history exists; the absolute floors then carry the
    gate alone."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))

    def round_no(path: str) -> int:
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        return int(m.group(1)) if m else -1

    recent = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")), key=round_no)
    best: dict = {}
    seen = 0
    for path in reversed(recent):
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        parsed = rec.get("parsed") if isinstance(rec, dict) else None
        if not isinstance(parsed, dict):
            continue
        sec = (parsed.get("canary") or {}).get("sec")
        py_sec = (parsed.get("canary_py") or {}).get("sec")
        if sec is None and py_sec is None:
            continue
        tag = os.path.basename(path)[len("BENCH_") : -len(".json")]
        if sec is not None and (best.get("sec") is None or sec < best["sec"]):
            best["sec"] = sec
            best["round"] = tag
        if py_sec is not None and (
            best.get("py_sec") is None or py_sec < best["py_sec"]
        ):
            best["py_sec"] = py_sec
            # separate tag: the JVM min and the Python-worker min can
            # come from DIFFERENT rounds (ADVICE r16 — attributing the
            # py min to the JVM-min round mislabels the record)
            best["py_round"] = tag
            best.setdefault("round", tag)
        seen += 1
        if seen >= _PREV_CANARY_WINDOW:
            break
    return best


def _py_canary_once(spark) -> float:
    """One timed mapInArrow round-trip through the Python worker pool."""
    import pyspark.sql.functions as F

    def _ident(batches):
        yield from batches

    df = (
        spark.range(0, 200_000, 1, 8)
        .select(F.col("id"), (F.col("id") * 2).alias("y"))
        .mapInArrow(_ident, "id long, y long")
        .agg(F.sum("y").alias("s"))
    )
    t0 = time.perf_counter()
    df.collect()
    return round(time.perf_counter() - t0, 3)

# Headline set: scan-heavy agg, multi-join, window, as-of, dedup,
# similarity, text — the operators whose plans matter at 100 TB.
# The r1 set is kept intact for round-over-round comparability; r2
# adds q18 (big-big sort-merge join) and the BLAS top-k variant.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "window_rank_orders",
    "join_asof_clicks",
    "agg_distinct",
    "stream_session_window",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
    "text_quality_scores",
    "strawboat_roundtrip_agg",
    "q18_large_orders",
    "similarity_topk_vectorized",
    # r7: mutation-path headline — write + MOR delete (deletion vectors,
    # zero files rewritten) + DV-subtracting read, so table-layer
    # regressions show up in BENCH_rN and not only in pytest timings
    "strawboat_mor_delete",
    # r7: LLM-pipeline headliners — sketch-candidates + exact recount,
    # and the corpus-LM scoring joins (the pipeline ops' plan shapes
    # get perf tracking, not only correctness gates)
    "text_heavy_hitter_tokens",
    "text_lm_perplexity",
]

# Plan-string normalization: strip per-session ids so the fingerprint
# only changes when the plan SHAPE changes.
_NORMS = [
    (re.compile(r"#\d+[A-Za-z]*"), "#"),          # expression ids
    (re.compile(r"\[id=#?\d+\]"), ""),            # codegen / subquery ids
    (re.compile(r"plan_id=\d+"), "plan_id="),
    (re.compile(r"(?:file:)?/[^\s,\]\)]*(?:tmp|warehouse)[^\s,\]\)]*", re.I), "<path>"),
    (re.compile(r"0x[0-9a-f]+"), "0x"),
]


def _plan_fingerprint(df) -> str | None:
    """sha256[:12] of the normalized FINAL (post-AQE) physical plan."""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return None
    for rx, sub in _NORMS:
        plan = rx.sub(sub, plan)
    return hashlib.sha256(plan.encode()).hexdigest()[:12]


def _warm_python_paths(spark) -> None:
    import tempfile

    import pyspark.sql.functions as F

    from strawboat_spark.sources.datasource import register

    register(spark)
    tiny = spark.range(256).select(
        F.col("id"), F.col("id").cast("double").alias("x"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    path = tempfile.mkdtemp(prefix="strawboat_warm_") + "/t"
    tiny.write.format("strawboat").mode("overwrite").save(path)
    spark.read.format("strawboat").load(path).count()
    # warm the pandas-UDF worker path too
    tiny.groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf.head(1), schema=tiny.schema
    ).count()


def main() -> None:
    from strawboat_spark.queries import all_queries
    from strawboat_spark.session import get_spark

    spark = get_spark("strawboat-bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    # Warm the JVM + file cache + Python worker pools once (not timed).
    # The datasource/UDF paths each spawn a Python worker pool on first
    # use (~seconds of one-time process startup); at real scale that
    # amortizes to zero, so warm it with a tiny synthetic roundtrip to
    # keep the timed loop measuring steady-state throughput.
    for name in names[:1]:
        registry[name].fn(spark, SF_DIR).collect()
    _warm_python_paths(spark)

    # Best-of-N: a single local[32] JVM has seconds-scale GC/scheduling
    # jitter; the min of N runs is the steady-state number a cluster
    # would see per-executor.  All raw runs are recorded for spread
    # analysis.  A wall-clock budget (default 330 s of TIMED passes)
    # stops after the current pass so the harness can never outgrow a
    # driver timeout as the suite evolves — at least 2 passes always
    # complete on this hardware.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "330"))
    runs: dict[str, list[float]] = {n: [] for n in names}
    plans: dict[str, str | None] = {}
    py_canary_runs: list[float] = []
    t_start = time.perf_counter()
    passes = 0
    _py_canary_once(spark)  # warm (not timed)
    for _ in range(N_RUNS):
        for name in names:
            t0 = time.perf_counter()
            df = registry[name].fn(spark, SF_DIR)
            df.collect()
            runs[name].append(round(time.perf_counter() - t0, 3))
            if name not in plans:
                plans[name] = _plan_fingerprint(df)
        py_canary_runs.append(_py_canary_once(spark))
        passes += 1
        if time.perf_counter() - t_start > budget:
            break
    timings = {n: min(rs) for n, rs in runs.items()}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    prev = _prev_canaries()
    canary_sec = timings.get(CANARY)
    rel = (
        round(canary_sec / prev["sec"], 3)
        if canary_sec is not None and prev.get("sec")
        else None
    )
    # relative gate primary (vs previous driver record), absolute floor
    # secondary (catches a slow round with no usable history)
    loaded = bool(rel is not None and rel > CANARY_REL_GATE) or bool(
        canary_sec is not None and canary_sec > CANARY_FLOOR * 1.4
    )
    py_canary_sec = min(py_canary_runs) if py_canary_runs else None
    rel_py = (
        round(py_canary_sec / prev["py_sec"], 3)
        if py_canary_sec is not None and prev.get("py_sec")
        else None
    )
    loaded_py = bool(rel_py is not None and rel_py > CANARY_REL_GATE) or bool(
        py_canary_sec is not None and py_canary_sec > PY_CANARY_FLOOR * 1.4
    )
    canary = {
        "query": CANARY,
        "sec": canary_sec,
        "floor": CANARY_FLOOR,
        "prev": {"round": prev.get("round"), "sec": prev.get("sec")},
        "rel": rel,
        "rel_gate": CANARY_REL_GATE,
        "loaded_host": loaded,
        # raw per-pass canary runs ride the COMPACT line too — the
        # canary-raws-first adjudication protocol (BASELINE.md r13)
        # needs them even when only the final line survives capture
        "runs": runs.get(CANARY, []),
    }
    canary_py = {
        "query": "mapInArrow_roundtrip_8tasks",
        "sec": py_canary_sec,
        "floor": PY_CANARY_FLOOR,
        "prev": {"round": prev.get("py_round"), "sec": prev.get("py_sec")},
        "rel": rel_py,
        "rel_gate": CANARY_REL_GATE,
        "loaded_host_py": loaded_py,
        "runs": py_canary_runs,
    }
    # Detail line FIRST (all raw runs + plan fingerprints): the driver
    # records only a bounded stdout TAIL, which used to cut the head off
    # one huge JSON line and defeat its parse every round.  The detail
    # may still be truncated from the front — that's fine, it also lands
    # in BENCH_DETAIL.json for local spread/plan analysis.
    detail = {
        "metric": "headline_queries_detail",
        "runs": runs,
        "plans": plans,
        "sf": sf_val,
        "n_runs": passes,
    }
    print(json.dumps(detail))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
            "w",
        ) as fh:
            json.dump(detail, fh)
    except OSError:
        pass  # read-only checkout: the stdout detail line still exists
    # Compact FINAL line (total + per-query best + both canaries with
    # raws): small enough (~1 KB) to always survive a tail capture whole.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "n_runs": passes,
                "canary": canary,
                "canary_py": canary_py,
            }
        )
    )


if __name__ == "__main__":
    main()
