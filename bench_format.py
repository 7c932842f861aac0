"""Format-layer microbench: strawboat vs parquet write/read throughput
and compressed size — the comparison the reference sketches but never
publishes (its criterion benches write bool/utf8/i64 arrays at
2^10..2^20 rows vs a parquet writer; README's performance section is
"TODO"). Single-thread, in-memory buffers, so the numbers isolate the
encode/decode path from IO and Spark overhead.

Usage: python bench_format.py [sf_dir]   (default /root/testdata/sf0.1)
Prints a markdown table; FORMAT_BENCH.md holds a committed snapshot.
"""

from __future__ import annotations

import io
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from strawboat_spark.sources.codecs import Codec
from strawboat_spark.sources.pagefile import StrawboatReader, StrawboatWriter

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def bench_one(name: str, table: pa.Table, reps: int = 3) -> dict:
    raw_bytes = table.nbytes
    res = {"name": name, "rows": table.num_rows, "raw_mb": raw_bytes / 1e6}

    best_w = best_r = 9e9
    size = 0
    for _ in range(reps):
        buf = io.BytesIO()
        t0 = time.perf_counter()
        w = StrawboatWriter(buf, table.schema, page_size=8192, default_codec=Codec.ZSTD)
        w.write_table(table)
        w.finish()
        best_w = min(best_w, time.perf_counter() - t0)
        size = len(buf.getvalue())
        buf.seek(0)
        t0 = time.perf_counter()
        StrawboatReader(buf).read_table()
        best_r = min(best_r, time.perf_counter() - t0)
    res["sb_write_mbs"] = raw_bytes / 1e6 / best_w
    res["sb_read_mbs"] = raw_bytes / 1e6 / best_r
    res["sb_size_mb"] = size / 1e6

    best_w = best_r = 9e9
    for _ in range(reps):
        buf = io.BytesIO()
        t0 = time.perf_counter()
        pq.write_table(table, buf, compression="zstd", row_group_size=1 << 20)
        best_w = min(best_w, time.perf_counter() - t0)
        size = len(buf.getvalue())
        buf.seek(0)
        t0 = time.perf_counter()
        # use_threads=False: the strawboat reader is single-threaded
        # (Spark parallelizes across partitions, not inside one); the
        # threaded default would compare 1 core against 32.
        pq.read_table(buf, use_threads=False)
        best_r = min(best_r, time.perf_counter() - t0)
    res["pq_write_mbs"] = raw_bytes / 1e6 / best_w
    res["pq_read_mbs"] = raw_bytes / 1e6 / best_r
    res["pq_size_mb"] = size / 1e6
    return res


def main() -> None:
    rng = np.random.default_rng(42)
    n = 1 << 20
    datasets = [
        ("i64_random_2^20", pa.table({"x": pa.array(rng.integers(0, 1 << 40, n))})),
        ("i64_sorted_2^20", pa.table({"x": pa.array(np.arange(n, dtype=np.int64))})),
        ("f64_walk_2^20", pa.table({"x": pa.array(np.cumsum(rng.normal(size=n)))})),
        ("bool_2^20", pa.table({"x": pa.array(rng.integers(0, 2, n).astype(bool))})),
        (
            "utf8_lowcard_2^20",
            pa.table({"x": pa.array(np.char.add("val_", rng.integers(0, 50, n).astype(str)))}),
        ),
        ("lineitem_sf", pq.read_table(f"{SF_DIR}/lineitem.parquet")),
        ("documents_sf", pq.read_table(f"{SF_DIR}/documents.parquet")),
        ("embeddings_sf", pq.read_table(f"{SF_DIR}/embeddings.parquet")),
    ]
    print(
        "| dataset | rows | raw MB | sb write MB/s | pq write MB/s | "
        "sb read MB/s | pq read MB/s | sb MB | pq MB |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for name, t in datasets:
        r = bench_one(name, t)
        print(
            f"| {r['name']} | {r['rows']} | {r['raw_mb']:.1f} | "
            f"{r['sb_write_mbs']:.0f} | {r['pq_write_mbs']:.0f} | "
            f"{r['sb_read_mbs']:.0f} | {r['pq_read_mbs']:.0f} | "
            f"{r['sb_size_mb']:.2f} | {r['pq_size_mb']:.2f} |"
        )


if __name__ == "__main__":
    main()
