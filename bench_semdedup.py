"""SemDeDup kmeans-mode scale rows (r14 + r15).

The driver gate (corpus_semdedup) runs the deterministic seed-centroid
mode so the oracle is exact SQL; kmeans is the PRODUCTION default and
this harness measures its scale corners:

  r14: production-shaped n_clusters on sf10 embeddings (dim 64),
  r15: PAPER dims (Abbas et al. 2023 run dim 768 at ~50k clusters) —
       the wide fixture from `gen_scale_sf.py --wide-dim 768`, with the
       centroid matrix shipped float32 as an explicit SparkContext
       broadcast (--dtype float32, threaded as an explicit parameter
       since r16, + the size-triggered broadcast in
       similarity._probe_cells_udf),
  r16: paper-k TRAINING (--trainer distributed --clusters 50000) via
       kmeans_train_distributed — O(k) init + Spark-pass Lloyd.

Checks confirmed per run:
  (a) wall time and its split (bounded-sample centroid training vs the
      distributed assign+dedup job),
  (b) the per-batch assignment matmul stays MAP-ONLY in the executed
      plan (ArrowEvalPython with no shuffle between the scan and the
      assignment),
  (c) the within-cell pair join stays an equi-join on the cluster id
      (one shuffle, never a cartesian).

Run: python bench_semdedup.py [--src /tmp/strawboat_sf10]
         [--table embeddings|embeddings768] [--clusters 4096]
         [--dtype float64|float32]
Output: one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/strawboat_sf10")
    ap.add_argument("--table", default="embeddings")
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--dtype", default="float64", choices=["float64", "float32"])
    ap.add_argument("--sample", type=int, default=0,
                    help="kmeans training sample size (0 = max(2048, "
                    "4*clusters) so n_clusters is actually trained, not "
                    "collapsed by the k>=sample identity shortcut)")
    ap.add_argument("--skip-dedup", action="store_true",
                    help="measure train+assign only (the dedup pair join "
                    "is dtype-independent and was measured at r14)")
    ap.add_argument("--trainer", default="driver",
                    choices=["driver", "distributed"],
                    help="kmeans trainer: 'driver' = sample-collect "
                    "kmeans++ + driver Lloyd (the r14/r15 path); "
                    "'distributed' = O(k) random init + Spark-pass Lloyd "
                    "(kmeans_train_distributed, r16 — the paper-scale "
                    "k=50k path)")
    ap.add_argument("--iters", type=int, default=4,
                    help="Lloyd iterations for --trainer distributed")
    ap.add_argument("--partial-dtype", default="float64",
                    choices=["float64", "float32"],
                    help="dtype of the distributed trainer's partial-sum "
                    "blobs crossing the per-iteration shuffle (r17, "
                    "VERDICT r16 #4: float32 halves the shuffle bytes; "
                    "accumulation stays float64)")
    args = ap.parse_args()
    # dtype is threaded as an explicit parameter (r16, ADVICE r15) —
    # no process-global env toggle

    import pyspark.sql.functions as F

    from strawboat_spark.operators import similarity as sim
    from strawboat_spark.session import get_spark

    spark = get_spark("bench-semdedup")
    # wide-embedding files are ~600 MB: at the default 128 MB split a
    # local[32] run gets ~5 scan tasks and the map-side assignment
    # measures partition-starvation, not the matmul — split finer so
    # the measurement reflects a cluster's per-task shape
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 << 20))
    emb = spark.read.parquet(f"{args.src}/{args.table}.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()

    sample = args.sample or max(2048, 4 * args.clusters)
    t0 = time.perf_counter()
    if args.trainer == "distributed":
        cents = sim.kmeans_train_distributed(
            emb, "embedding", args.clusters, seed=42, iters=args.iters,
            sample_size=sample, dtype=args.dtype,
            partial_dtype=args.partial_dtype,
        )
    else:
        cents = sim._kmeans_centroids(
            emb, "embedding", args.clusters, seed=42, sample_size=sample
        )
    train_s = time.perf_counter() - t0
    dim = len(cents[0]) if cents else 0
    itemsize = 4 if args.dtype == "float32" else 8
    cmat_bytes = len(cents) * dim * itemsize

    # assignment leg, timed on its own: the kmeans path must assign with
    # a map-only Arrow UDF (no shuffle between scan and assign). The
    # evaluation is FORCED through an aggregate over the UDF's output —
    # a bare count() lets Catalyst prune the unreferenced UDF column and
    # times an empty scan instead of the matmul.
    # warm the scan + Python worker pool with a tiny-centroid assign so
    # the timed leg measures the matmul, not cold-start; then time ONE
    # fresh-lineage run (re-collecting the same DataFrame reuses the
    # completed shuffle map stage and measures ~0 — found r15)
    warm = sim._probe_cells_udf(cents[:8], 1, dtype=args.dtype)
    emb.select(sim._as_double("embedding").alias("__v")).withColumn(
        "__c", warm("__v")[0]
    ).agg(F.sum("__c")).collect()
    assign1 = sim._probe_cells_udf(cents, 1, dtype=args.dtype)
    # OBSERVED from the UDF, not inferred from size arithmetic (ADVICE
    # r15): True only when _ship_centroids actually created the
    # SparkContext broadcast (a missing active session would silently
    # fall back to closure transport — now also warned)
    bcast_used = assign1.explicit_broadcast
    assigned = (
        emb.select(F.col("vec_id"), sim._as_double("embedding").alias("__v"))
        .withColumn("__cluster", assign1("__v")[0])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__cluster").alias("s"),  # depends on the UDF: no pruning
        )
    )
    t0 = time.perf_counter()
    row = assigned.collect()[0]
    assign_s = time.perf_counter() - t0
    n_assigned = row["n"]
    # the plan tree prints parents first, so "no shuffle below the
    # assignment" = no Exchange AFTER ArrowEvalPython's position (the
    # final agg's own exchange sits above it and prints before it).
    # AQE's toString appends an "== Initial Plan ==" section that
    # repeats the whole tree — cut it off or its exchanges false-flag.
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    arrow_eval = plan.find("ArrowEvalPython")
    map_only = arrow_eval >= 0 and plan.find("Exchange", arrow_eval) == -1

    kept = total_s = no_cartesian = call_s = action_s = None
    if not args.skip_dedup:
        t0 = time.perf_counter()
        out = sim.semdedup(
            emb,
            "vec_id",
            "embedding",
            n_clusters=args.clusters,
            threshold=args.threshold,
            centroids="kmeans",
            seed=42,
            kmeans_sample_size=sample,
            centroid_dtype=args.dtype,
            kmeans_trainer=args.trainer,
        )
        # r17 (VERDICT r16 #6): the call/action split. With
        # cache_assignments auto-on (broadcast-sized matrices), the
        # semdedup() CALL runs training + the eager assignment
        # materialization; the ACTION below then pays only the in-cell
        # pair join + output over the cached assignments — so
        # call_s ~ train+assign and action_s ~ the pair term.
        call_s = round(time.perf_counter() - t0, 2)
        t1 = time.perf_counter()
        kept = out.filter("kept").count()
        action_s = round(time.perf_counter() - t1, 2)
        total_s = round(time.perf_counter() - t0, 2)
        full_plan = out._jdf.queryExecution().optimizedPlan().toString()
        no_cartesian = bool(
            "Cartesian" not in full_plan and "crossJoin" not in full_plan
        )

    print(
        json.dumps(
            {
                "table": args.table,
                "n_vectors": n,
                "dim": dim,
                "n_clusters": args.clusters,
                "n_centroids_actual": len(cents),
                "train_sample": sample,
                "threshold": args.threshold,
                "dtype": args.dtype,
                "trainer": args.trainer,
                "lloyd_iters": args.iters if args.trainer == "distributed" else None,
                "kmeans_train_s": round(train_s, 2),
                "assign_s": round(assign_s, 2),
                "n_assigned": n_assigned,
                "semdedup_total_s": total_s,
                "semdedup_call_s": call_s,
                "semdedup_action_s": action_s,
                "partial_dtype": args.partial_dtype if args.trainer == "distributed" else None,
                "kept": kept,
                "dropped": None if kept is None else n - kept,
                "assign_map_only": bool(map_only),
                "no_cartesian_in_dedup_plan": no_cartesian,
                "centroid_matrix_mib": round(cmat_bytes / (1 << 20), 2),
                "explicit_broadcast": bcast_used,
                "paper_scale_50k_mib": round(50_000 * dim * itemsize / (1 << 20), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
