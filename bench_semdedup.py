"""SemDeDup kmeans-mode scale row (r14, VERDICT r13 'Next round' #4).

The driver gate (corpus_semdedup) runs the deterministic seed-centroid
mode so the oracle is exact SQL; kmeans is the PRODUCTION default and
its scale corner was the one unmeasured row: production-shaped
n_clusters on sf10 embeddings, confirming

  (a) wall time and its split (bounded-sample centroid training vs the
      distributed assign+dedup job),
  (b) the per-batch assignment matmul stays MAP-ONLY in the executed
      plan (ArrowEvalPython with no shuffle between the scan and the
      assignment — the centroid matrix rides the task closure), and
  (c) the within-cell pair join stays an equi-join on the cluster id
      (one shuffle, never a cartesian).

50k-cluster broadcast arithmetic (paper scale, Abbas et al. 2023):
the closure-captured centroid matrix is n_clusters x dim float64 =
50_000 x 64 x 8 B = 25.6 MB at this table's dim (x12 at dim 768 =
307 MB — float32 halves it; at that point ship centroids as a real
broadcast variable, same plan shape).

Run: python bench_semdedup.py [--src /tmp/strawboat_sf10] [--clusters 1024]
Output: one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/strawboat_sf10")
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--threshold", type=float, default=0.95)
    args = ap.parse_args()

    from strawboat_spark.operators import similarity as sim
    from strawboat_spark.session import get_spark
    from strawboat_spark.tables import load_table

    spark = get_spark("bench-semdedup")
    emb = load_table(spark, args.src, "embeddings").select("vec_id", "embedding")
    n = emb.count()

    t0 = time.perf_counter()
    cents = sim._kmeans_centroids(emb, "embedding", args.clusters, seed=42)
    train_s = time.perf_counter() - t0
    dim = len(cents[0]) if cents else 0

    t0 = time.perf_counter()
    out = sim.semdedup(
        emb,
        "vec_id",
        "embedding",
        n_clusters=args.clusters,
        threshold=args.threshold,
        centroids="kmeans",
        seed=42,
    )
    kept = out.filter("kept").count()
    total_s = time.perf_counter() - t0

    # plan checks on the assignment leg: the kmeans path must assign
    # with a map-only Arrow UDF (no shuffle between scan and assign)
    assign1 = sim._probe_cells_udf(cents, 1)
    import pyspark.sql.functions as F

    assigned = emb.select(
        F.col("vec_id"), sim._as_double("embedding").alias("__v")
    ).withColumn("__cluster", assign1("__v")[0])
    assigned.collect()
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    first_exchange = plan.find("Exchange")
    arrow_eval = plan.find("ArrowEvalPython")
    map_only = arrow_eval >= 0 and (first_exchange == -1 or arrow_eval < first_exchange)

    full_plan = out._jdf.queryExecution().optimizedPlan().toString()
    no_cartesian = "Cartesian" not in full_plan and "crossJoin" not in full_plan

    print(
        json.dumps(
            {
                "n_vectors": n,
                "dim": dim,
                "n_clusters": args.clusters,
                "threshold": args.threshold,
                "kmeans_train_s": round(train_s, 2),
                "semdedup_total_s": round(total_s, 2),
                "kept": kept,
                "dropped": n - kept,
                "assign_map_only": bool(map_only),
                "no_cartesian_in_dedup_plan": bool(no_cartesian),
                "centroid_matrix_mib": round(args.clusters * dim * 8 / (1 << 20), 2),
                "paper_scale_50k_mib": round(50_000 * dim * 8 / (1 << 20), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
