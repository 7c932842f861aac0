"""Dedicated-slot stress for the triangle wedge join (r12 lead #4).

The gate-level sf10 adjudication (BASELINE.md r12) showed the gate's
cost is the co-occurrence edge BUILD — its weight>=30 edge list is
empty at replicated scales, so the wedge join itself never got its own
second decade. This slot gives it one, on SYNTHETIC dense graphs (no
19-minute lineitem edge build): skewed random graphs at E and 4E
edges, edge list cached, so the timing isolates
degree_oriented_edges + wedge join + closure join.

The claim under test: the degree orientation makes the join's work
track the WEDGE COUNT (sum of oriented out-deg^2 — the
Chiba-Nishizeki bound), not raw hub degree, so sec-per-million-wedges
should stay ~flat as edges x4 and wedges x~8.

Usage: python bench_wedge_stress.py [edges_small] (default 2_000_000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import pyspark.sql.functions as F

from strawboat_spark.session import get_spark
from strawboat_spark.operators.graph import degree_oriented_edges, triangle_counts


def make_edges(spark, n_edges: int, n_nodes: int):
    """Deterministic skewed multigraph -> distinct simple edge list.

    Endpoint draw: xxhash64-based, squared-uniform to concentrate mass
    on low ids (hub skew ~ sqrt: node 0 is in ~2/sqrt(n) of edges)."""
    base = spark.range(n_edges)
    u = F.abs(F.xxhash64("id", F.lit(1))) % F.lit(10**9)
    w = F.abs(F.xxhash64("id", F.lit(2))) % F.lit(10**9)
    a = F.floor(F.pow(u / 1e9, 2.0) * n_nodes).cast("long")
    b = F.floor(F.pow(w / 1e9, 2.0) * n_nodes).cast("long")
    e = base.select(
        F.least(a, b).alias("src"), F.greatest(a, b).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    return e.distinct()


def run(n_small: int) -> dict:
    spark = get_spark("wedge-stress")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "wedge_join_stress", "unit": "sec", "scales": {}}
    for label, n_edges, n_nodes in (
        ("E", n_small, n_small // 20),
        ("4E", 4 * n_small, n_small // 10),
    ):
        edges = make_edges(spark, n_edges, n_nodes).cache()
        m = edges.count()  # materialize the cache: edge build excluded
        oe = degree_oriented_edges(edges)
        wedges = (
            oe.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
            .collect()[0]["w"]
        )
        runs = []
        for _ in range(2):
            t0 = time.time()
            tri_nodes = triangle_counts(edges).count()
            runs.append(round(time.time() - t0, 2))
        edges.unpersist()
        out["scales"][label] = {
            "edges": m,
            "wedges": int(wedges),
            "runs": runs,
            "sec_per_mwedge": round(min(runs) / (wedges / 1e6), 4),
            "tri_nodes": tri_nodes,
        }
    s, b = out["scales"]["E"], out["scales"]["4E"]
    out["time_ratio"] = round(min(b["runs"]) / min(s["runs"]), 2)
    out["wedge_ratio"] = round(b["wedges"] / s["wedges"], 2)
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    print(json.dumps(run(n)))
