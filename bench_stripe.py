"""Stripe-shape measurement: ranged-read count vs STRIPE_PAGES /
STRIPE_BYTES on the fileio seam (round-7 verdict item 10).

On an object store every (open + discrete seek/read range) is one
ranged GET, and GET count x per-GET latency is the scan's latency
floor while stripe count is its parallelism ceiling.  This tool runs
the REAL planner + stripe reader in-process against a counting
filesystem wrapper (registered on the fileio seam, the same interface
fsspec backends go through) and prints, per stripe configuration:

  stripes (= tasks = opens), discrete ranged reads, bytes read,
  ranges per stripe.

Results + the recommended default are recorded in FORMAT_BENCH.md.

Usage: python bench_stripe.py   (writes a throwaway table to /tmp)
"""

from __future__ import annotations

import os
import shutil


class _CountingFile:
    def __init__(self, f, stats: dict):
        self._f = f
        self._stats = stats
        self._last_end = None
        stats["opens"] += 1

    def read(self, n=-1):
        pos = self._f.tell()
        if self._last_end is None or pos != self._last_end:
            self._stats["ranges"] += 1  # a seek since the last read = new GET
        b = self._f.read(n)
        self._stats["bytes"] += len(b)
        self._last_end = self._f.tell()
        return b

    def seek(self, off, whence=0):
        return self._f.seek(off, whence)

    def tell(self):
        return self._f.tell()

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
        return False


class CountingFs:
    """fileio adapter counting read traffic; delegates to the local fs.
    Paths are cnt://<abs path>."""

    def __init__(self):
        from strawboat_spark.sources.fileio import LocalFileSystem

        self._fs = LocalFileSystem()
        self.stats = {"opens": 0, "ranges": 0, "bytes": 0}

    @staticmethod
    def _local(path: str) -> str:
        return path[len("cnt://") :] if path.startswith("cnt://") else path

    def open_read(self, path: str):
        return _CountingFile(self._fs.open_read(self._local(path)), self.stats)

    def list_files(self, path: str, suffix: str):
        return [f"cnt://{p}" for p in self._fs.list_files(self._local(path), suffix)]

    def isdir(self, path: str) -> bool:
        return self._fs.isdir(self._local(path))

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._local(path))

    def create(self, path: str):
        return self._fs.create(self._local(path))

    def create_exclusive(self, path: str):
        return self._fs.create_exclusive(self._local(path))

    def makedirs(self, path: str):
        return self._fs.makedirs(self._local(path))

    def remove(self, path: str):
        return self._fs.remove(self._local(path))

    def remove_tree(self, path: str):
        return self._fs.remove_tree(self._local(path))

    def mtime_ns(self, path: str):
        return self._fs.mtime_ns(self._local(path))

    def age_seconds(self, path: str):
        return self._fs.age_seconds(self._local(path))

    def move(self, src: str, dst: str):
        return self._fs.move(self._local(src), self._local(dst))


def measure(local_root: str, columns: str | None = None) -> list[dict]:
    import strawboat_spark.sources.datasource as ds
    from strawboat_spark.sources.fileio import register_filesystem

    fs = CountingFs()
    register_filesystem("cnt", fs)
    root = f"cnt://{local_root}"

    src = ds.StrawboatDataSource(
        {"path": root, **({"columns": columns} if columns else {})}
    )
    schema = src.schema()
    out = []
    for pages, sbytes in [(4, 32 << 20), (16, 32 << 20), (64, 32 << 20),
                          (256, 32 << 20), (16, 4 << 20), (64, 4 << 20)]:
        ds.STRIPE_PAGES, ds.STRIPE_BYTES = pages, sbytes
        ds._FOOTER_CACHE.clear()
        fs.stats.update(opens=0, ranges=0, bytes=0)
        impl = ds.StrawboatReaderImpl(
            {"path": root, **({"columns": columns} if columns else {})}, schema
        )
        parts = impl.partitions()
        rows = 0
        for p in parts:
            for batch in impl.read(p) or ():
                rows += batch.num_rows
        out.append(
            {
                "stripe_pages": pages,
                "stripe_mb": sbytes >> 20,
                "stripes": len(parts),
                "opens": fs.stats["opens"],
                "ranges": fs.stats["ranges"],
                "mb_read": round(fs.stats["bytes"] / 1e6, 2),
                "ranges_per_stripe": round(fs.stats["ranges"] / max(len(parts), 1), 1),
                "rows": rows,
            }
        )
    return out


def main():
    from pyspark.sql import functions as F  # noqa: F401

    from strawboat_spark.session import get_spark
    from strawboat_spark.sources.datasource import register
    from strawboat_spark.tables import load_table

    tmp = "/tmp/strawboat_stripe_bench"
    shutil.rmtree(tmp, ignore_errors=True)
    spark = get_spark("stripe-bench", cpus=8)
    register(spark)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_table(spark, sf, "lineitem").coalesce(2).write.format("strawboat").mode(
        "overwrite"
    ).save(tmp)

    print("full-width scan (all 11 lineitem columns):")
    for r in measure(tmp):
        print(r)
    print("2-column projection (l_extendedprice, l_discount):")
    for r in measure(tmp, columns="l_extendedprice,l_discount"):
        print(r)


if __name__ == "__main__":
    main()
