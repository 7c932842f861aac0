"""Multipart S3 writes against a real S3 API implementation (moto).

The r11 verdict's posture note: _S3WriteHandle buffered the WHOLE
object and published with one PutObject — correct, but a multi-GB
strawboat data file would sit fully in executor memory and hit the
5 GB single-PUT ceiling. The r12 contract: non-exclusive handles
stream parts >= the part threshold via Create/UploadPart/Complete;
abort (explicit, GC, or complete-failure) leaves NO visible object and
NO in-progress upload. Exclusive (CAS manifest) handles stay
single-PUT — If-None-Match rides PutObject.

Skipped when moto/boto3 are absent.
"""

from __future__ import annotations

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from strawboat_spark.sources.fileio import S3FileSystem  # noqa: E402

BUCKET = "strawboat-mpu"
PART = 5 << 20  # the S3 minimum part size — the handle floors here


@pytest.fixture(scope="module")
def s3_env(tmp_path_factory):
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
    import os

    old = {
        k: os.environ.get(k)
        for k in (
            "STRAWBOAT_S3_ENDPOINT",
            "STRAWBOAT_S3_MULTIPART_PART_SIZE",
            "AWS_ACCESS_KEY_ID",
            "AWS_SECRET_ACCESS_KEY",
            "AWS_DEFAULT_REGION",
        )
    }
    os.environ["STRAWBOAT_S3_ENDPOINT"] = endpoint
    os.environ["STRAWBOAT_S3_MULTIPART_PART_SIZE"] = str(PART)
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


def _inflight(client, key_prefix: str) -> list:
    resp = client.list_multipart_uploads(Bucket=BUCKET)
    return [
        u for u in resp.get("Uploads", []) if u["Key"].startswith(key_prefix)
    ]


def test_large_write_streams_parts_and_publishes(s3_env):
    fs = S3FileSystem()
    data = bytes(range(256)) * (12 * (1 << 20) // 256)  # 12 MiB
    h = fs.create(f"s3://{BUCKET}/data/big.strawboat")
    for i in range(0, len(data), 1 << 20):
        h.write(data[i : i + (1 << 20)])
    # two 5 MiB parts already shipped; 2 MiB still buffered
    assert h._upload_id is not None
    assert len(h._parts) == 2
    assert h.getbuffer().nbytes == 2 * (1 << 20)
    h.close()
    got = s3_env.get_object(Bucket=BUCKET, Key="data/big.strawboat")["Body"].read()
    assert got == data
    assert not _inflight(s3_env, "data/big.strawboat")


def test_small_write_stays_single_put(s3_env):
    fs = S3FileSystem()
    with fs.create(f"s3://{BUCKET}/data/small.bin") as h:
        h.write(b"tiny payload")
        assert h._upload_id is None
    assert (
        s3_env.get_object(Bucket=BUCKET, Key="data/small.bin")["Body"].read()
        == b"tiny payload"
    )


def test_abort_after_parts_leaves_nothing_visible(s3_env):
    fs = S3FileSystem()
    h = fs.create(f"s3://{BUCKET}/data/aborted.bin")
    h.write(b"x" * (6 << 20))  # one part flushed
    assert h._upload_id is not None
    h.abort()
    with pytest.raises(Exception):
        s3_env.head_object(Bucket=BUCKET, Key="data/aborted.bin")
    assert not _inflight(s3_env, "data/aborted.bin")


def test_gc_discards_inflight_upload(s3_env):
    fs = S3FileSystem()
    h = fs.create(f"s3://{BUCKET}/data/leaked.bin")
    h.write(b"y" * (6 << 20))
    assert h._upload_id is not None
    del h  # abandoned by a failed task: __del__ must abort, not publish
    import gc

    gc.collect()
    with pytest.raises(Exception):
        s3_env.head_object(Bucket=BUCKET, Key="data/leaked.bin")
    assert not _inflight(s3_env, "data/leaked.bin")


def test_exclusive_stays_single_put_with_cas(s3_env):
    fs = S3FileSystem()
    h = fs.create_exclusive(f"s3://{BUCKET}/meta/manifest.json")
    h.write(b"m" * (6 << 20))  # past the threshold — must NOT go multipart
    assert h._upload_id is None
    h.close()
    loser = fs.create_exclusive(f"s3://{BUCKET}/meta/manifest.json")
    loser.write(b"other")
    with pytest.raises(FileExistsError):
        loser.close()


class _FailingClient:
    """Proxy that fails a chosen operation with a server-style error,
    delegating everything else to the real moto client."""

    def __init__(self, real, fail_op: str):
        self._real = real
        self._fail_op = fail_op

    def __getattr__(self, name):
        if name == self._fail_op:
            def boom(**kw):
                from botocore.exceptions import ClientError

                raise ClientError(
                    {"Error": {"Code": "InternalError", "Message": "injected"}},
                    name,
                )

            return boom
        return getattr(self._real, name)


def test_upload_part_failure_aborts_and_classifies(s3_env):
    """A part-upload failure mid-write must surface as the seam's
    OSError contract AND abort the in-flight upload (a retrying task
    must not leave billing-visible orphan parts behind)."""
    fs = S3FileSystem()
    h = fs.create(f"s3://{BUCKET}/data/partfail.bin")
    h.write(b"a" * (6 << 20))  # first part succeeds
    assert h._upload_id is not None
    real = fs._client()
    fs._c = _FailingClient(real, "upload_part")
    with pytest.raises(OSError):
        h.write(b"b" * (6 << 20))
    fs._c = real
    with pytest.raises(Exception):
        s3_env.head_object(Bucket=BUCKET, Key="data/partfail.bin")
    assert not _inflight(s3_env, "data/partfail.bin")
    # handle is done: a later close() must not resurrect anything
    h.close()
    with pytest.raises(Exception):
        s3_env.head_object(Bucket=BUCKET, Key="data/partfail.bin")


def test_complete_failure_aborts(s3_env):
    """CompleteMultipartUpload failing at close() must abort the
    upload and re-raise under the seam's contract — never a visible
    half-object."""
    fs = S3FileSystem()
    h = fs.create(f"s3://{BUCKET}/data/completefail.bin")
    h.write(b"c" * (6 << 20))
    assert h._upload_id is not None
    real = fs._client()
    fs._c = _FailingClient(real, "complete_multipart_upload")
    with pytest.raises(OSError):
        h.close()
    fs._c = real
    with pytest.raises(Exception):
        s3_env.head_object(Bucket=BUCKET, Key="data/completefail.bin")
    assert not _inflight(s3_env, "data/completefail.bin")


def test_context_exit_on_error_aborts(s3_env):
    fs = S3FileSystem()
    with pytest.raises(RuntimeError):
        with fs.create(f"s3://{BUCKET}/data/ctx.bin") as h:
            h.write(b"z" * (6 << 20))
            raise RuntimeError("task died")
    with pytest.raises(Exception):
        s3_env.head_object(Bucket=BUCKET, Key="data/ctx.bin")
    assert not _inflight(s3_env, "data/ctx.bin")


def test_sim_latency_shim_covers_writes_and_counters(s3_env, monkeypatch):
    """r14: STRAWBOAT_S3_SIM_LATENCY_MS applies to EVERY write-side
    request (create/upload_part/complete or the single PUT), and write
    handles expose put_requests/bytes_sent — the observability twins of
    the read handle's range_gets/bytes_fetched that bench_s3_latency's
    write leg reads."""
    import time

    monkeypatch.setenv("STRAWBOAT_S3_MULTIPART_PART_SIZE", str(PART))
    fs = S3FileSystem()

    # single PUT: one request, all bytes counted
    monkeypatch.setenv("STRAWBOAT_S3_SIM_LATENCY_MS", "40")
    h = fs.create(f"s3://{BUCKET}/lat_single.bin")
    h.write(b"x" * 1024)
    t0 = time.perf_counter()
    h.close()
    assert time.perf_counter() - t0 >= 0.04
    assert h.put_requests == 1 and h.bytes_sent == 1024

    # multipart: create + 2 parts + complete = 4 requests >= 4 sleeps
    h = fs.create(f"s3://{BUCKET}/lat_mpu.bin")
    t0 = time.perf_counter()
    h.write(b"a" * PART)       # flushes part 1 (+ create)
    h.write(b"b" * (1 << 20))  # buffered tail -> part 2 at close
    h.close()
    assert time.perf_counter() - t0 >= 4 * 0.04
    assert h.put_requests == 4
    assert h.bytes_sent == PART + (1 << 20)
    monkeypatch.delenv("STRAWBOAT_S3_SIM_LATENCY_MS")
