"""Quantify the ranged-GET read path under per-request LATENCY.

The r12 S3 read work was proven by GET/byte counts only
(tests/test_s3_ranged_read.py); this harness adds the wall-time
dimension: a moto server + the STRAWBOAT_S3_SIM_LATENCY_MS shim
(fileio.S3FileSystem._get_object) measure a column-pruned format scan
at 0/25/100 ms per GET on both read paths:

- ranged (default): one suffix GET (tail cache serves trailer+footer),
  then byte-range GETs with readahead for the projected column's pages;
- whole-object (STRAWBOAT_S3_RANGED_READ=0): one GET downloads
  everything.

Localhost transfer is ~free, so measured wall isolates the
latency*GETs term; the bandwidth term is modeled analytically as
bytes_fetched/BW and reported at 50 and 200 MB/s — total =
wall + bytes/BW.  That decomposition is exact for a single-connection
client: request round-trips and body streaming are additive.

Run: python bench_s3_latency.py   (skips politely if moto is absent)
Output: one markdown table (paste into FORMAT_BENCH.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BUCKET = "strawboat-latbench"
LATENCIES_MS = [0, 25, 100]
BANDWIDTHS_MBPS = [50, 200]


def _put_table(n_rows: int, payload_bytes: int, key: str) -> int:
    import numpy as np
    import pyarrow as pa

    from strawboat_spark.sources.pagefile import write_file

    rng = np.random.default_rng(13)
    # printable-ish random bytes: incompressible, so the object size on
    # the wire tracks the logical payload size
    raw = rng.integers(33, 127, size=n_rows * payload_bytes, dtype=np.uint8)
    blob = raw.tobytes().decode("latin-1")
    wide = [
        blob[i * payload_bytes : (i + 1) * payload_bytes] for i in range(n_rows)
    ]
    table = pa.table(
        {"id": pa.array(range(n_rows), pa.int64()), "payload": pa.array(wide)}
    )
    write_file(f"s3://{BUCKET}/{key}", table, page_size=256)
    import boto3

    c = boto3.client("s3", endpoint_url=os.environ["STRAWBOAT_S3_ENDPOINT"])
    return c.head_object(Bucket=BUCKET, Key=key)["ContentLength"]


def _scan_pruned(path: str, ranged: bool) -> tuple[float, int, int]:
    """(wall_sec, range_gets, bytes_fetched) for a read of ["id"]."""
    from strawboat_spark.sources.fileio import S3FileSystem
    from strawboat_spark.sources.pagefile import StrawboatReader

    os.environ["STRAWBOAT_S3_RANGED_READ"] = "1" if ranged else "0"
    fs = S3FileSystem()
    t0 = time.perf_counter()
    h = fs.open_read(path)
    got = StrawboatReader(h).read_table(["id"])
    wall = time.perf_counter() - t0
    assert got.num_rows > 0
    if ranged:
        gets, fetched = h.range_gets, h.bytes_fetched
    else:
        import boto3

        c = boto3.client("s3", endpoint_url=os.environ["STRAWBOAT_S3_ENDPOINT"])
        key = path.split("/", 3)[3]
        gets, fetched = 1, c.head_object(Bucket=BUCKET, Key=key)["ContentLength"]
    return wall, gets, fetched


def _read_small(path: str, ranged: bool) -> tuple[float, int, int]:
    from strawboat_spark.sources.fileio import S3FileSystem

    os.environ["STRAWBOAT_S3_RANGED_READ"] = "1" if ranged else "0"
    fs = S3FileSystem()
    t0 = time.perf_counter()
    h = fs.open_read(path)
    body = h.read()
    wall = time.perf_counter() - t0
    if ranged:
        gets, fetched = h.range_gets, h.bytes_fetched
    else:
        gets, fetched = 1, len(body)
    return wall, gets, fetched


def _write_object(n_mib: int, part_size: int | None, key: str) -> tuple[float, int, int]:
    """(wall_sec, put_requests, bytes_sent) for writing an n_mib object
    through the format's write handle — single conditional-free PUT when
    the buffer never crosses the part threshold, multipart otherwise.
    `part_size=None` leaves the 64 MiB default; a huge value forces the
    single-PUT path; 5 MiB (the S3 floor) maximizes part count."""
    import numpy as np

    from strawboat_spark.sources.fileio import S3FileSystem

    if part_size is None:
        os.environ.pop("STRAWBOAT_S3_MULTIPART_PART_SIZE", None)
    else:
        os.environ["STRAWBOAT_S3_MULTIPART_PART_SIZE"] = str(part_size)
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 256, size=n_mib << 20, dtype=np.uint8).tobytes()
    fs = S3FileSystem()
    t0 = time.perf_counter()
    h = fs.create(f"s3://{BUCKET}/{key}")
    # stream in 4 MiB slices like the page writer does, so the handle's
    # own part threshold decides when parts ship
    for i in range(0, len(payload), 4 << 20):
        h.write(payload[i : i + (4 << 20)])
    h.close()
    wall = time.perf_counter() - t0
    os.environ.pop("STRAWBOAT_S3_MULTIPART_PART_SIZE", None)
    return wall, h.put_requests, h.bytes_sent


def main() -> None:
    try:
        from moto.server import ThreadedMotoServer
    except ImportError:
        print(json.dumps({"skipped": "moto not installed"}))
        return
    import boto3

    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server._server.server_address
    os.environ["STRAWBOAT_S3_ENDPOINT"] = f"http://{host}:{port}"
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "test")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "test")
    os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")
    boto3.client(
        "s3", endpoint_url=os.environ["STRAWBOAT_S3_ENDPOINT"]
    ).create_bucket(Bucket=BUCKET)

    size = _put_table(3000, 4096, "t.sb")  # payload-dominated, ~10 MiB
    size_lg = _put_table(6000, 16384, "t_large.sb")  # ~94 MiB
    small_key = "manifest.json"
    boto3.client(
        "s3", endpoint_url=os.environ["STRAWBOAT_S3_ENDPOINT"]
    ).put_object(Bucket=BUCKET, Key=small_key, Body=b"x" * (100 << 10))

    rows = []
    for lat in LATENCIES_MS:
        os.environ["STRAWBOAT_S3_SIM_LATENCY_MS"] = str(lat)
        for label, fn, path in (
            ("pruned-10MiB", _scan_pruned, f"s3://{BUCKET}/t.sb"),
            ("pruned-94MiB", _scan_pruned, f"s3://{BUCKET}/t_large.sb"),
            ("small-object", _read_small, f"s3://{BUCKET}/{small_key}"),
        ):
            for ranged in (True, False):
                # best-of-3: moto server jitter
                best = None
                for _ in range(3):
                    wall, gets, fetched = fn(path, ranged)
                    if best is None or wall < best[0]:
                        best = (wall, gets, fetched)
                wall, gets, fetched = best
                row = {
                    "case": label,
                    "path": "ranged" if ranged else "whole",
                    "latency_ms": lat,
                    "wall_s": round(wall, 3),
                    "gets": gets,
                    "mib": round(fetched / (1 << 20), 2),
                }
                for bw in BANDWIDTHS_MBPS:
                    row[f"total_s@{bw}MBps"] = round(
                        wall + fetched / (bw * 1e6), 3
                    )
                rows.append(row)
    # --- write leg (r14): single PUT vs multipart under the same shim.
    # Equal bytes cross the wire either way, so the modeled total at
    # bandwidth BW differs only by the extra round trips multipart pays
    # (create + complete + one per part) — what it buys is bounded
    # writer memory (one part, not the object) and no 5 GB PUT ceiling.
    wrows = []
    for lat in LATENCIES_MS:
        os.environ["STRAWBOAT_S3_SIM_LATENCY_MS"] = str(lat)
        for label, psize in (
            ("put-94MiB", 1 << 40),        # never crosses → single PUT
            ("multipart-64MiB", None),     # default part size → 2 parts
            ("multipart-5MiB", 5 << 20),   # floor part size → ~19 parts
        ):
            best = None
            for _ in range(3):
                wall, reqs, sent = _write_object(94, psize, f"w_{label}_{lat}.bin")
                if best is None or wall < best[0]:
                    best = (wall, reqs, sent)
            wall, reqs, sent = best
            row = {
                "case": label,
                "latency_ms": lat,
                "wall_s": round(wall, 3),
                "puts": reqs,
                "mib": round(sent / (1 << 20), 2),
            }
            for bw in BANDWIDTHS_MBPS:
                row[f"total_s@{bw}MBps"] = round(wall + sent / (bw * 1e6), 3)
            wrows.append(row)
    os.environ.pop("STRAWBOAT_S3_SIM_LATENCY_MS", None)
    os.environ["STRAWBOAT_S3_RANGED_READ"] = "1"
    server.stop()

    hdr = ["case", "path", "latency_ms", "wall_s", "gets", "mib"] + [
        f"total_s@{bw}MBps" for bw in BANDWIDTHS_MBPS
    ]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in hdr) + " |")
    whdr = ["case", "latency_ms", "wall_s", "puts", "mib"] + [
        f"total_s@{bw}MBps" for bw in BANDWIDTHS_MBPS
    ]
    print()
    print("| " + " | ".join(whdr) + " |")
    print("|" + "---|" * len(whdr))
    for r in wrows:
        print("| " + " | ".join(str(r[c]) for c in whdr) + " |")
    print(
        json.dumps(
            {
                "object_mib": round(size / (1 << 20), 2),
                "object_large_mib": round(size_lg / (1 << 20), 2),
                "rows": rows,
                "write_rows": wrows,
            }
        )
    )


if __name__ == "__main__":
    main()
