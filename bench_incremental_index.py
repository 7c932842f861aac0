"""sf1 measurement of the incremental dedup/ANN indexes (r9 verdict
item #3): ingest the 50k-doc sf1 corpus in 10 batches through
fingerprint_index_append / jaccard_index_append / minhash_index_append
and record the per-batch cost curve against the full-rescan batch op.

The claim under measurement: per-batch cost is bounded by the batch's
own size + its bucket fan-out (flat-ish curve as the corpus grows),
while the rescan alternative grows with the cumulative corpus.  The
correctness twin (batch-vs-index equivalence) is property-tested in
tests/test_operators.py; the IO bound ("a batch reads only its own
buckets' data files") is pinned by
test_incremental_index_reads_only_batch_bucket_dirs.

Usage: python bench_incremental_index.py [--src /tmp/strawboat_sf1]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/strawboat_sf1")
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--only", default=None, choices=["fingerprint", "jaccard", "minhash"])
    ap.add_argument("--skip-rescan", action="store_true", help=(
        "skip the full-rescan comparison leg (at sf10 the uncapped "
        "ngram rescan is the known super-linear op -- the per-batch "
        "ingest curve is the claim under measurement)"))
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from strawboat_spark.operators.dedup import (
        exact_dedup,
        fingerprint_index_append,
        fingerprint_index_init,
        jaccard_index_append,
        jaccard_index_init,
        minhash_index_append,
        minhash_index_init,
        minhash_lsh_dedup,
        ngram_jaccard_pairs,
    )
    from strawboat_spark.session import get_spark
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.tables import load_table

    spark = get_spark("bench-incremental-index")
    register(spark)
    docs = load_table(spark, args.src, "documents").select("doc_id", "text").persist()
    n_docs = docs.count()
    root = tempfile.mkdtemp(prefix="strawboat_incbench_")
    nb = args.batches

    def batch(k):
        return docs.filter(F.col("doc_id") % nb == k)

    out: dict = {"n_docs": n_docs, "n_batches": nb, "src": args.src}

    def note(msg):
        print(msg, file=sys.stderr, flush=True)

    def want(name):
        return args.only is None or args.only == name

    def maybe_compact(p, k, rec):
        """Halfway through, compact the index table: each append adds a
        file per touched bucket, so batch k's bucket-pruned lookup reads
        ~k files per bucket — the per-batch curve grows linearly until a
        compaction folds each bucket dir back to ~1 file (hive-layout-
        preserving). This is the production cadence knob: ingest cost is
        flat when the index is compacted every N batches."""
        from strawboat_spark.table import Table

        if k == nb // 2:
            t0 = time.perf_counter()
            Table(spark, p).compact()
            rec["compact_at_batch"] = k
            rec["compact_s"] = round(time.perf_counter() - t0, 2)


    # --- fingerprint (exact) index ---------------------------------
    if want("fingerprint"):
        p = f"{root}/fp"
        t0 = time.perf_counter()
        fingerprint_index_init(spark, p, batch(0), "text", "doc_id")
        init_s = time.perf_counter() - t0
        per = []
        rec: dict = {}
        for k in range(1, nb):
            maybe_compact(p, k, rec)
            t0 = time.perf_counter()
            fingerprint_index_append(spark, p, batch(k), "text", "doc_id").count()
            per.append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        exact_dedup(docs, "text", "doc_id").count()
        rescan = time.perf_counter() - t0
        out["fingerprint"] = {
            "init_s": round(init_s, 2),
            "per_batch_s": per,
            "full_rescan_s": round(rescan, 2),
            **rec,
        }

    # --- jaccard (exact near-dup) index ----------------------------
    if want("jaccard"):
        p = f"{root}/jc"
        t0 = time.perf_counter()
        jaccard_index_init(spark, p, batch(0), "text", "doc_id", shingle_n=3)
        init_s = time.perf_counter() - t0
        per = []
        rec: dict = {}
        for k in range(1, nb):
            maybe_compact(p, k, rec)
            t0 = time.perf_counter()
            jaccard_index_append(
                spark, p, batch(k), "text", "doc_id", shingle_n=3,
                threshold=0.5, max_doc_freq=1000,
            ).count()
            per.append(round(time.perf_counter() - t0, 2))
            note(f"jaccard batch {k}: {per[-1]} s")
        # None (json null) when skipped — NaN is not strict JSON and breaks
        # jq / json.loads(allow_nan=False) on the harness output
        rescan = None
        if not args.skip_rescan:
            t0 = time.perf_counter()
            ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.5).count()
            rescan = time.perf_counter() - t0
        out["jaccard"] = {
            "init_s": round(init_s, 2),
            "per_batch_s": per,
            "full_rescan_s": None if rescan is None else round(rescan, 2),
            **rec,
        }

    # --- minhash-LSH (approximate near-dup) index ------------------
    if want("minhash"):
        p = f"{root}/mh"
        t0 = time.perf_counter()
        minhash_index_init(spark, p, batch(0), "text", "doc_id")
        init_s = time.perf_counter() - t0
        per = []
        rec: dict = {}
        for k in range(1, nb):
            maybe_compact(p, k, rec)
            t0 = time.perf_counter()
            minhash_index_append(spark, p, batch(k), "text", "doc_id").count()
            per.append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        minhash_lsh_dedup(docs, "text", "doc_id").count()
        rescan = time.perf_counter() - t0
        out["minhash"] = {
            "init_s": round(init_s, 2),
            "per_batch_s": per,
            "full_rescan_s": round(rescan, 2),
            **rec,
        }

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
