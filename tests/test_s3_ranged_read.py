"""Ranged-GET S3 reads against a real S3 API implementation (moto).

The r11 verdict's posture note had two halves: whole-object-buffered
writes (fixed r12 with multipart) and whole-object-buffered READS —
open_read downloaded the entire object even when the format reader
wanted one column's pages plus the footer. This suite pins the read
twin (_S3RangedReadHandle): one suffix GET serves the open sequence
(size + trailer + footer), page-run reads become byte ranges with
readahead, small objects stay cheap, and the bytes on the wire for a
pruned scan are a FRACTION of the object (the reference's ranged-IO
posture, /root/reference/src/read/reader.rs:168-225).

Skipped when moto/boto3 are absent.
"""

from __future__ import annotations

import io
import os
import random

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from strawboat_spark.sources.fileio import S3FileSystem  # noqa: E402

BUCKET = "strawboat-ranged"


@pytest.fixture(scope="module")
def s3_env():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server._server.server_address
    endpoint = f"http://{host}:{port}"
    client = boto3.client(
        "s3",
        endpoint_url=endpoint,
        aws_access_key_id="test",
        aws_secret_access_key="test",
        region_name="us-east-1",
    )
    client.create_bucket(Bucket=BUCKET)
    old = {
        k: os.environ.get(k)
        for k in (
            "STRAWBOAT_S3_ENDPOINT",
            "AWS_ACCESS_KEY_ID",
            "AWS_SECRET_ACCESS_KEY",
            "AWS_DEFAULT_REGION",
        )
    }
    os.environ["STRAWBOAT_S3_ENDPOINT"] = endpoint
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "test")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "test")
    os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")
    yield client
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    server.stop()


@pytest.fixture()
def knobs(monkeypatch):
    """Shrink the IO knobs so a few-MB object exercises every branch."""
    monkeypatch.setenv("STRAWBOAT_S3_READ_TAIL", str(4 << 10))
    monkeypatch.setenv("STRAWBOAT_S3_READAHEAD", str(64 << 10))
    monkeypatch.setenv("STRAWBOAT_S3_RANGED_READ_MIN", str(16 << 10))


def _put(client, key: str, body: bytes) -> None:
    client.put_object(Bucket=BUCKET, Key=key, Body=body)


def test_open_caches_tail_and_slices_fetch_ranges(s3_env, knobs):
    rng = random.Random(7)
    body = bytes(rng.getrandbits(8) for _ in range(1 << 20))  # 1 MiB
    _put(s3_env, "big.bin", body)
    fs = S3FileSystem()
    with fs.open_read(f"s3://{BUCKET}/big.bin") as h:
        # the open sequence: one suffix GET learned size + cached tail
        assert h.range_gets == 1
        assert h.seek(0, 2) == len(body)
        h.seek(-4096, 2)
        assert h.read(4096) == body[-4096:]
        assert h.range_gets == 1  # footer region served by the tail cache
        # a middle slice fetches a readahead window, not the object
        h.seek(300_000)
        assert h.read(1000) == body[300_000:301_000]
        assert h.range_gets == 2
        # sequential follow-up reads inside the window are free
        assert h.read(50_000) == body[301_000:351_000]
        assert h.range_gets == 2
        assert h.bytes_fetched < len(body) // 4


def test_reads_spanning_window_and_tail_boundaries(s3_env, knobs):
    rng = random.Random(11)
    body = bytes(rng.getrandbits(8) for _ in range(256 << 10))
    _put(s3_env, "span.bin", body)
    fs = S3FileSystem()
    ref = io.BytesIO(body)
    with fs.open_read(f"s3://{BUCKET}/span.bin") as h:
        for _ in range(200):
            pos = rng.randrange(0, len(body) + 10)
            n = rng.randrange(0, 100_000)
            h.seek(pos)
            ref.seek(pos)
            assert h.read(n) == ref.read(n), (pos, n)
        h.seek(0)
        assert h.read() == body


def test_small_object_is_one_get(s3_env, knobs):
    _put(s3_env, "small.bin", b"x" * 1000)
    fs = S3FileSystem()
    with fs.open_read(f"s3://{BUCKET}/small.bin") as h:
        assert h.read() == b"x" * 1000
        assert h.range_gets == 1  # fully covered by the tail fetch


def test_mid_size_object_buffers_whole_on_second_get(s3_env, knobs):
    body = bytes(range(256)) * 40  # 10 KiB: > tail (4 KiB), <= min (16 KiB)
    _put(s3_env, "mid.bin", body)
    fs = S3FileSystem()
    with fs.open_read(f"s3://{BUCKET}/mid.bin") as h:
        h.seek(0)
        assert h.read(16) == body[:16]
        assert h.read() == body[16:]
        assert h.range_gets == 2  # tail + one whole-object fetch


def test_zero_byte_and_missing_objects(s3_env, knobs):
    _put(s3_env, "empty.bin", b"")
    fs = S3FileSystem()
    with fs.open_read(f"s3://{BUCKET}/empty.bin") as h:
        assert h.read() == b""
        assert h.seek(0, 2) == 0
    with pytest.raises(FileNotFoundError):
        fs.open_read(f"s3://{BUCKET}/does-not-exist.bin")


def test_kill_switch_restores_whole_object_buffering(s3_env, knobs, monkeypatch):
    monkeypatch.setenv("STRAWBOAT_S3_RANGED_READ", "0")
    _put(s3_env, "legacy.bin", b"abc" * 100)
    fs = S3FileSystem()
    with fs.open_read(f"s3://{BUCKET}/legacy.bin") as h:
        assert isinstance(h, io.BytesIO)
        assert h.read() == b"abc" * 100


def test_column_pruned_format_read_fetches_a_fraction(s3_env, knobs):
    """The point of the feature: projecting the narrow column of a
    strawboat file whose bytes are dominated by a wide column must move
    a fraction of the object over the wire."""
    pa = pytest.importorskip("pyarrow")
    from strawboat_spark.sources.pagefile import StrawboatReader, write_file

    rng = random.Random(3)
    wide = ["".join(chr(rng.randrange(33, 127)) for _ in range(2000)) for _ in range(2000)]
    table = pa.table(
        {"id": pa.array(range(2000), pa.int64()), "payload": pa.array(wide)}
    )
    path = f"s3://{BUCKET}/pruned.sb"
    write_file(path, table, page_size=256)
    size = s3_env.head_object(Bucket=BUCKET, Key="pruned.sb")["ContentLength"]
    assert size > 1 << 20  # the wide column dominates

    fs = S3FileSystem()
    with fs.open_read(path) as h:
        got = StrawboatReader(h).read_table(["id"])
        assert got.column("id").to_pylist() == list(range(2000))
        assert h.bytes_fetched < size // 4, (h.bytes_fetched, size)
        assert h.range_gets < 20


def test_copy_bytes_streams_chunked_between_backends(s3_env, knobs, tmp_path, monkeypatch):
    """copy_bytes: local->S3 and S3->local stream in bounded chunks —
    the S3 leg exercises multipart (tiny part size) and ranged reads
    (tiny readahead) end to end, byte-identical."""
    import strawboat_spark.sources.fileio as fio

    monkeypatch.setattr(fio, "_COPY_CHUNK", 64 << 10)
    rng = random.Random(5)
    body = bytes(rng.getrandbits(8) for _ in range(512 << 10))
    src = tmp_path / "src.bin"
    src.write_bytes(body)
    fio.copy_bytes(str(src), f"s3://{BUCKET}/copied.bin")
    assert (
        s3_env.get_object(Bucket=BUCKET, Key="copied.bin")["Body"].read() == body
    )
    back = tmp_path / "back.bin"
    fio.copy_bytes(f"s3://{BUCKET}/copied.bin", str(back))
    assert back.read_bytes() == body
