"""Filesystem seam for the format layer.

Every byte of strawboat IO goes through this module, so an object
store plugs in without touching the page reader/writer — the
reference's generic `Read + Seek` boundary
(`/root/reference/src/read/reader.rs:168-225`) re-expressed as a
scheme registry:

- no scheme / ``file://`` → local filesystem (tmp-file + rename gives
  atomic visibility);
- ``memory://``           → in-process store with object-store
  semantics (whole-object PUT on close, ranged GET via seek/read) —
  used by tests and as the template for real object-store backends;
- any other scheme        → delegated to ``fsspec`` when importable
  (s3://, gs://, abfs://, ...), else a clear error.

Write handles publish atomically on ``close()`` and support
``abort()``; readers are plain seekable binary files. Paths keep
their scheme end-to-end (list_files returns full URLs) so the
datasource never needs to know which backend it is on.
"""

from __future__ import annotations

import glob as _glob
import io
import os
import re
import threading

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://(.*)$")


def split_scheme(path: str) -> tuple[str, str]:
    m = _SCHEME_RE.match(path)
    if m:
        return m.group(1), m.group(2)
    return "", path


def backend_path(path: str) -> str:
    """Path as the backend sees it, scheme stripped — use for relpath
    math across roots and files that may or may not carry a scheme."""
    scheme, rest = split_scheme(path)
    if scheme == "file" and not rest.startswith("/"):
        rest = "/" + rest
    return rest if scheme else path


class _AtomicLocalFile:
    """Write to a per-writer tmp, rename into place on close — readers
    never see a partial file (same contract an object store gives via
    PUT), and concurrent writers of the SAME path never share scratch
    (last rename wins, like overlapping object-store PUTs)."""

    def __init__(self, final: str):
        self.final = final
        self.tmp = f"{final}.{os.getpid()}.{id(self):x}.tmp"
        self._f = open(self.tmp, "wb")

    def write(self, b) -> int:
        return self._f.write(b)

    def close(self) -> None:
        if not self._f.closed:
            self._f.close()
            os.rename(self.tmp, self.final)

    def abort(self) -> None:
        if not self._f.closed:
            self._f.close()
        try:
            os.unlink(self.tmp)
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *_):
        self.abort() if exc_type else self.close()


class _ExclusiveLocalFile(_AtomicLocalFile):
    """Atomic create-if-absent: publish via `os.link(tmp, final)`, which
    fails with FileExistsError when `final` already exists — a true
    filesystem CAS (rename would silently replace). Readers still never
    see a partial file: the link appears fully written or not at all."""

    def close(self) -> None:
        if not self._f.closed:
            self._f.close()
            try:
                os.link(self.tmp, self.final)
            finally:
                try:
                    os.unlink(self.tmp)
                except OSError:
                    pass


class LocalFileSystem:
    def _p(self, path: str) -> str:
        return backend_path(path)

    def open_read(self, path: str):
        return open(self._p(path), "rb")

    def create(self, path: str) -> _AtomicLocalFile:
        return _AtomicLocalFile(self._p(path))

    def create_exclusive(self, path: str) -> _ExclusiveLocalFile:
        """Raises FileExistsError on close() if `path` already exists."""
        return _ExclusiveLocalFile(self._p(path))

    def list_files(self, path: str, suffix: str) -> list[str]:
        p = self._p(path)
        return sorted(_glob.glob(os.path.join(p, "**", f"*{suffix}"), recursive=True))

    def isdir(self, path: str) -> bool:
        return os.path.isdir(self._p(path))

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def remove(self, path: str) -> None:
        os.remove(self._p(path))

    def makedirs(self, path: str) -> None:
        os.makedirs(self._p(path), exist_ok=True)

    def stat_sig(self, path: str) -> tuple:
        st = os.stat(self._p(path))
        return (st.st_size, st.st_mtime_ns)

    def mtime_ns(self, path: str) -> int:
        return os.stat(self._p(path)).st_mtime_ns

    def age_seconds(self, path: str) -> float:
        import time

        return time.time() - os.stat(self._p(path)).st_mtime

    def move(self, src: str, dst: str) -> None:
        os.replace(self._p(src), self._p(dst))

    def remove_tree(self, path: str) -> None:
        import shutil

        shutil.rmtree(self._p(path), ignore_errors=True)

    def list_dirs(self, path: str) -> list[str]:
        p = self._p(path)
        out = []
        for root, dirs, _ in os.walk(p):
            out.extend(os.path.join(root, d) for d in dirs)
        return sorted(out)


class _MemoryWriteHandle(io.BytesIO):
    def __init__(
        self, store: dict, key: str, lock: threading.Lock, versions: dict, fs, exclusive=False
    ):
        super().__init__()
        self._store, self._key, self._lock = store, key, lock
        self._versions = versions
        self._fs = fs
        self._published = False
        self._exclusive = exclusive

    def close(self) -> None:
        if not self.closed and not self._published:
            with self._lock:
                if self._exclusive and self._key in self._store:
                    raise FileExistsError(self._key)  # conditional PUT lost the race
                import time as _time

                self._store[self._key] = self.getvalue()
                self._versions[self._key] = self._versions.get(self._key, 0) + 1
                self._fs._clock += 1
                self._fs._mtimes[self._key] = self._fs._clock
                self._fs._wall[self._key] = _time.time()
            self._published = True
        super().close()

    def abort(self) -> None:
        self._published = True  # discard without publishing
        super().close()

    def __del__(self):
        # GC of an abandoned handle must discard, not publish (the
        # IOBase default would call close(), i.e. PUT) — same contract
        # as _S3WriteHandle/_AtomicLocalFile.
        self.abort()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *_):
        self.abort() if exc_type else self.close()


class MemoryFileSystem:
    """Flat key→bytes store. No directories: `isdir` means "some key
    lives under this prefix" — exactly an object-store listing."""

    def __init__(self):
        self._store: dict[str, bytes] = {}
        self._versions: dict[str, int] = {}
        self._mtimes: dict[str, int] = {}
        self._wall: dict[str, float] = {}  # wall-clock publish time (vacuum grace)
        self._clock = 0  # monotonic publish tick — the store's "mtime"
        self._lock = threading.Lock()

    def _key(self, path: str) -> str:
        return split_scheme(path)[1].rstrip("/")

    def open_read(self, path: str):
        with self._lock:
            data = self._store[self._key(path)]
        return io.BytesIO(data)

    def create(self, path: str) -> _MemoryWriteHandle:
        return _MemoryWriteHandle(self._store, self._key(path), self._lock, self._versions, self)

    def create_exclusive(self, path: str) -> _MemoryWriteHandle:
        """Conditional PUT (If-None-Match: *): close() raises
        FileExistsError if the key was published meanwhile."""
        return _MemoryWriteHandle(
            self._store, self._key(path), self._lock, self._versions, self, exclusive=True
        )

    def list_files(self, path: str, suffix: str) -> list[str]:
        prefix = self._key(path) + "/"
        with self._lock:
            keys = [k for k in self._store if k.startswith(prefix) and k.endswith(suffix)]
        return sorted(f"memory://{k}" for k in keys)

    def isdir(self, path: str) -> bool:
        prefix = self._key(path) + "/"
        with self._lock:
            return any(k.startswith(prefix) for k in self._store)

    def exists(self, path: str) -> bool:
        key = self._key(path)
        with self._lock:
            return key in self._store or any(k.startswith(key + "/") for k in self._store)

    def remove(self, path: str) -> None:
        with self._lock:
            del self._store[self._key(path)]

    def makedirs(self, path: str) -> None:
        return None  # object stores have no directories

    def stat_sig(self, path: str) -> tuple:
        key = self._key(path)
        with self._lock:
            return (len(self._store[key]), self._versions.get(key, 0))

    def mtime_ns(self, path: str) -> int:
        # Publish-tick clock, not wall time: monotonic and totally
        # ordered, which is all the stream-offset watermark needs.
        with self._lock:
            return self._mtimes.get(self._key(path), 0)

    def age_seconds(self, path: str) -> float:
        # Wall-clock age (vacuum's grace window needs real seconds; the
        # tick clock above is for ordering only).
        import time

        with self._lock:
            return time.time() - self._wall.get(self._key(path), 0.0)

    def move(self, src: str, dst: str) -> None:
        # Object-store "rename": server-side copy + delete (what
        # s3/gcs do under the hood — there is no atomic rename).
        import time

        with self._lock:
            sk, dk = self._key(src), self._key(dst)
            self._store[dk] = self._store.pop(sk)
            self._versions[dk] = self._versions.get(dk, 0) + 1
            self._clock += 1
            self._mtimes[dk] = self._clock
            self._wall[dk] = time.time()
            for m in (self._versions, self._mtimes, self._wall):
                m.pop(sk, None)

    def remove_tree(self, path: str) -> None:
        prefix = self._key(path) + "/"
        with self._lock:
            for k in [k for k in self._store if k.startswith(prefix)]:
                del self._store[k]
                for m in (self._versions, self._mtimes, self._wall):
                    m.pop(k, None)

    def list_dirs(self, path: str) -> list[str]:
        # Object stores have no directories: a "dir" is any key prefix
        # with at least one object under it (empty dirs cannot exist).
        prefix = self._key(path) + "/"
        dirs: set[str] = set()
        with self._lock:
            for k in self._store:
                if not k.startswith(prefix):
                    continue
                parts = k[len(prefix):].split("/")[:-1]
                for i in range(1, len(parts) + 1):
                    dirs.add(prefix + "/".join(parts[:i]))
        return sorted(f"memory://{d}" for d in dirs)

    def clear(self) -> None:
        with self._lock:
            self._store.clear()
            self._versions.clear()
            self._mtimes.clear()
            self._wall.clear()


_TOCTOU_WARNED: set[str] = set()

# Conditional-PUT kwargs per backend protocol, passed to fsspec
# open(path, "wb", **kw): the store rejects the commit server-side if
# the key already exists, making create_exclusive a TRUE CAS (no
# TOCTOU window).  Enforcement is POSITIVELY verified by a one-time
# probe (see _conditional_put_enforced) — merely accepting the kwarg
# proves nothing on **kwargs-swallowing backends — and anything
# unverified falls back to the documented exists()+create path with
# the TOCTOU warning.
_CONDITIONAL_PUT_KWARGS: dict[str, dict] = {
    # S3 PUT with If-None-Match:* (supported by AWS since 2024-11)
    "s3": {"if_none_match": "*"},
    "s3a": {"if_none_match": "*"},
    # GCS generation-match 0 = "only if the object does not exist"
    "gs": {"if_generation_match": 0},
    "gcs": {"if_generation_match": 0},
    # Azure blob If-None-Match:*
    "az": {"if_none_match": "*"},
    "abfs": {"if_none_match": "*"},
}

_PRECONDITION_MARKERS = (
    "412",
    "precondition",
    "if-none-match",
    "ifnonematch",
    "generation",
    "conditionnotmet",
    "already exists",
)


def _is_precondition_failure(exc: BaseException) -> bool:
    s = str(exc).lower().replace(" ", "")
    return any(m.replace(" ", "") in s for m in _PRECONDITION_MARKERS)


# The filesystem seam's error contract is OSError/FileNotFoundError
# (LocalFileSystem raises exactly those); every race-tolerant caller —
# vacuum, delete_manifest, writer abort, _read_manifest_file — guards
# with `except (OSError, KeyError)`. botocore's ClientError is NOT an
# OSError, so S3 must classify by the server's answer and re-raise
# inside the contract, or a concurrently-deleted key crashes
# maintenance on S3 while being tolerated on local/memory.
_S3_MISSING_CODES = frozenset({"404", "NoSuchKey", "NoSuchBucket", "NotFound"})


def _s3_error_code(exc: BaseException) -> str:
    resp = getattr(exc, "response", None)
    if not isinstance(resp, dict):
        return ""
    code = str((resp.get("Error") or {}).get("Code") or "")
    if not code:
        code = str((resp.get("ResponseMetadata") or {}).get("HTTPStatusCode") or "")
    return code


def _s3_reraise(exc: BaseException, path: str) -> None:
    """Re-raise a botocore ClientError as the seam's contract types:
    missing key/bucket -> FileNotFoundError, anything else (auth,
    throttle, network-shaped 5xx) -> OSError."""
    code = _s3_error_code(exc)
    if code in _S3_MISSING_CODES:
        raise FileNotFoundError(path) from exc
    raise OSError(f"{path}: S3 {code or type(exc).__name__}: {exc}") from exc


def _s3_client_error():
    from botocore.exceptions import ClientError

    return ClientError


class _FsspecFileSystem:
    """Adapter over an fsspec filesystem for any other scheme."""

    def __init__(self, scheme: str, fs=None):
        if fs is None:
            import fsspec

            fs = fsspec.filesystem(scheme)
        self._fs = fs
        self._scheme = scheme

    def open_read(self, path: str):
        return self._fs.open(path, "rb")

    def _attach_abort(self, f, path: str):
        if not hasattr(f, "abort"):
            # fsspec close() FLUSHES AND COMMITS the upload, so it must
            # never stand in for abort: a failed write would publish a
            # truncated object that poisons every directory listing.
            # Prefer discard() (drops the multipart upload); otherwise
            # commit-then-delete so no partial file stays visible.
            discard = getattr(f, "discard", None)
            fs = self._fs

            def _abort(_f=f, _discard=discard):
                if _discard is not None:
                    _discard()
                    return
                try:
                    _f.close()
                finally:
                    try:
                        fs.rm(path)
                    except OSError:
                        pass  # nothing was published

            f.abort = _abort
        return f

    def create(self, path: str):
        return self._attach_abort(self._fs.open(path, "wb"), path)

    def _conditional_put_enforced(self, near_path: str) -> bool:
        """Positive verification that this backend actually ENFORCES the
        conditional-PUT kwarg, probed once per adapter: several fsspec
        backends (gcsfs-style ``**kwargs`` in _open) silently swallow
        unknown kwargs, so 'open accepted the kwarg' proves nothing —
        taking the CAS path on such a store silently overwrites a lost
        race AND suppresses the TOCTOU warning, strictly worse than the
        documented fallback.  The probe writes a uuid key next to
        `near_path` twice with the conditional kwarg; enforcement is
        verified only if the second PUT fails with a precondition
        error.  Cost: 2 PUTs + 1 DELETE once per process per scheme."""
        cached = getattr(self, "_cas_enforced", None)
        if cached is not None:
            return cached
        import uuid

        kw = _CONDITIONAL_PUT_KWARGS[self._scheme]
        probe = f"{near_path.rsplit('/', 1)[0]}/.strawboat-cas-probe-{uuid.uuid4().hex}"
        enforced = False
        try:
            with self._fs.open(probe, "wb", **kw) as f:
                f.write(b"p")
            try:
                f2 = self._fs.open(probe, "wb", **kw)
                f2.write(b"q")
                f2.close()
                enforced = False  # overwrite accepted: kwarg was swallowed
            except TypeError:
                enforced = False
            except Exception as e:
                enforced = _is_precondition_failure(e)
        except TypeError:
            enforced = False  # library build doesn't take the kwarg
        except Exception:
            enforced = False  # can't verify -> treat as unenforced
        finally:
            try:
                self._fs.rm(probe)
            except Exception:
                pass
        self._cas_enforced = enforced
        return enforced

    def create_exclusive(self, path: str):
        """Create-if-absent. On backends with a conditional PUT (S3
        If-None-Match:*, GCS ifGenerationMatch=0, Azure) the store
        enforces exclusivity server-side at commit time — a TRUE CAS;
        a lost race surfaces as FileExistsError from close(). Anywhere
        else this degrades to exists()+create — a TOCTOU window, NOT a
        CAS: two racing committers can both pass the exists() check and
        one commit is silently lost. Single-writer tables are safe on
        the fallback; the once-per-scheme warning marks the weakened
        guarantee (register_filesystem can always override)."""
        import warnings

        kw = _CONDITIONAL_PUT_KWARGS.get(self._scheme)
        # gate the CAS path on POSITIVE verification, not on "open
        # accepted the kwarg": backends with **kwargs swallow unknown
        # kwargs and would publish unconditionally at close
        if kw is not None and self._conditional_put_enforced(path):
            try:
                f = self._fs.open(path, "wb", **kw)
            except TypeError:
                f = None  # this library build doesn't take the kwarg
            except Exception as e:
                if _is_precondition_failure(e):
                    raise FileExistsError(path) from e
                raise
            if f is not None:
                self._attach_abort(f, path)
                real_close = f.close

                def _close(_rc=real_close, _path=path):
                    try:
                        _rc()
                    except FileExistsError:
                        raise
                    except Exception as e:
                        # the conditional commit happens at close(); a
                        # precondition failure means a concurrent
                        # committer won and NOTHING was published
                        if _is_precondition_failure(e):
                            raise FileExistsError(_path) from e
                        raise

                f.close = _close
                return f

        if self._scheme not in _TOCTOU_WARNED:
            _TOCTOU_WARNED.add(self._scheme)
            warnings.warn(
                f"strawboat: manifest commits on {self._scheme}:// go through "
                f"fsspec's exists()+create (conditional-PUT enforcement absent "
                f"or unverified by the probe) — concurrent committers can "
                f"silently lose a commit. Register a filesystem with a native "
                f"CAS create_exclusive for multi-writer tables.",
                RuntimeWarning,
                stacklevel=2,
            )
        if self._fs.exists(path):
            raise FileExistsError(path)
        return self.create(path)

    def list_files(self, path: str, suffix: str) -> list[str]:
        _, rest = split_scheme(path)
        return sorted(
            f"{self._scheme}://{p}"
            for p in self._fs.glob(f"{rest}/**/*{suffix}")
        )

    def isdir(self, path: str) -> bool:
        return self._fs.isdir(path)

    def exists(self, path: str) -> bool:
        return self._fs.exists(path)

    def remove(self, path: str) -> None:
        self._fs.rm(path)

    def makedirs(self, path: str) -> None:
        self._fs.makedirs(path, exist_ok=True)

    def mtime_ns(self, path: str) -> int:
        # fsspec's `modified` maps to the store's LastModified; a real
        # object-store listing returns this with the LIST response.
        return int(self._fs.modified(path).timestamp() * 1_000_000_000)

    def age_seconds(self, path: str) -> float:
        import time

        return time.time() - self._fs.modified(path).timestamp()

    def move(self, src: str, dst: str) -> None:
        # fsspec mv = server-side copy + delete on object stores.
        self._fs.mv(split_scheme(src)[1], split_scheme(dst)[1])

    def remove_tree(self, path: str) -> None:
        _, rest = split_scheme(path)
        try:
            self._fs.rm(rest, recursive=True)
        except FileNotFoundError:
            pass

    def list_dirs(self, path: str) -> list[str]:
        _, rest = split_scheme(path)
        try:
            found = self._fs.find(rest, withdirs=True, detail=True)
        except (OSError, TypeError):
            return []
        return sorted(
            f"{self._scheme}://{p}"
            for p, info in found.items()
            if info.get("type") == "directory"
        )


class _S3WriteHandle(io.BytesIO):
    """Commit-at-close write (the object-store model): bytes buffer
    locally; close() publishes atomically; abort() discards without
    publishing.  `exclusive` adds If-None-Match:* — the server-enforced
    CAS the manifest commit protocol rides on (same contract the moto
    integration tests pin for the fsspec adapter).

    MULTIPART (r12): a non-exclusive handle that buffers past the part
    threshold streams the buffer out as UploadPart calls instead of
    holding the whole object — a multi-GB strawboat data file neither
    sits in executor memory nor hits the 5 GB single-PutObject ceiling
    (the reference's ranged-IO posture on the write side,
    /root/reference/src/read/reader.rs:168-225 is the read twin).
    Publication stays atomic: parts are invisible until
    CompleteMultipartUpload, and abort()/GC/close-failure abort the
    upload so no visible object and no orphaned parts remain.
    Exclusive handles (manifests — small by construction) keep the
    single conditional PUT: S3 enforces If-None-Match on PutObject,
    and the CAS is the whole point of that path."""

    # S3 requires every part but the last to be >= 5 MiB; the env knob
    # (STRAWBOAT_S3_MULTIPART_PART_SIZE, bytes) is floored there.
    _MIN_PART = 5 << 20

    def __init__(self, fs: "S3FileSystem", bucket: str, key: str, exclusive: bool):
        super().__init__()
        self._s3fs = fs
        self._bucket = bucket
        self._obj_key = key
        self._exclusive = exclusive
        self._done = False
        self._upload_id: str | None = None
        self._parts: list[dict] = []
        # write-side observability twins of the read handle's
        # range_gets/bytes_fetched: every S3 request this handle makes
        # (create/upload_part/complete or the single PUT) and the bytes
        # it shipped — bench_s3_latency.py's write leg reads them
        self.put_requests = 0
        self.bytes_sent = 0
        try:
            env = int(os.environ.get("STRAWBOAT_S3_MULTIPART_PART_SIZE", "0"))
        except ValueError:
            env = 0
        self._part_size = max(env, self._MIN_PART) if env else (64 << 20)

    def write(self, b) -> int:  # type: ignore[override]
        n = super().write(b)
        if not self._exclusive and self.getbuffer().nbytes >= self._part_size:
            self._flush_part()
        return n

    def _flush_part(self) -> None:
        """Ship the whole buffer as one part (5 MiB..5 GiB — callers
        write sequentially, so the buffer IS the next part) and reset."""
        data = self.getvalue()
        client = self._s3fs._client()
        try:
            if self._upload_id is None:
                self._s3fs._sim_latency()
                self.put_requests += 1
                self._upload_id = client.create_multipart_upload(
                    Bucket=self._bucket, Key=self._obj_key
                )["UploadId"]
            num = len(self._parts) + 1
            self._s3fs._sim_latency()
            self.put_requests += 1
            self.bytes_sent += len(data)
            etag = client.upload_part(
                Bucket=self._bucket,
                Key=self._obj_key,
                PartNumber=num,
                UploadId=self._upload_id,
                Body=data,
            )["ETag"]
        except _s3_client_error() as e:
            self._abort_upload()
            self._done = True
            _s3_reraise(e, f"s3://{self._bucket}/{self._obj_key}")
        self._parts.append({"PartNumber": num, "ETag": etag})
        self.seek(0)
        self.truncate(0)

    def _abort_upload(self) -> None:
        if self._upload_id is None:
            return
        upload_id, self._upload_id = self._upload_id, None
        try:
            self._s3fs._client().abort_multipart_upload(
                Bucket=self._bucket, Key=self._obj_key, UploadId=upload_id
            )
        except Exception:  # noqa: BLE001 - abort is best-effort cleanup
            pass

    def close(self) -> None:
        if self._done or self.closed:
            return
        self._done = True
        body = self.getvalue()
        super().close()
        client = self._s3fs._client()
        if self._upload_id is not None:
            try:
                if body:
                    num = len(self._parts) + 1
                    self._s3fs._sim_latency()
                    self.put_requests += 1
                    self.bytes_sent += len(body)
                    etag = client.upload_part(
                        Bucket=self._bucket,
                        Key=self._obj_key,
                        PartNumber=num,
                        UploadId=self._upload_id,
                        Body=body,
                    )["ETag"]
                    self._parts.append({"PartNumber": num, "ETag": etag})
                self._s3fs._sim_latency()
                self.put_requests += 1
                client.complete_multipart_upload(
                    Bucket=self._bucket,
                    Key=self._obj_key,
                    UploadId=self._upload_id,
                    MultipartUpload={"Parts": self._parts},
                )
            except Exception as e:  # noqa: BLE001 - abort, then classify
                self._abort_upload()
                if isinstance(e, _s3_client_error()):
                    _s3_reraise(e, f"s3://{self._bucket}/{self._obj_key}")
                raise
            return
        kw = {"IfNoneMatch": "*"} if self._exclusive else {}
        try:
            self._s3fs._sim_latency()
            self.put_requests += 1
            self.bytes_sent += len(body)
            client.put_object(
                Bucket=self._bucket, Key=self._obj_key, Body=body, **kw
            )
        except Exception as e:  # noqa: BLE001 - classify by the server's answer
            if self._exclusive and _is_precondition_failure(e):
                raise FileExistsError(
                    f"s3://{self._bucket}/{self._obj_key}: lost the conditional PUT"
                ) from e
            if isinstance(e, _s3_client_error()):
                _s3_reraise(e, f"s3://{self._bucket}/{self._obj_key}")
            raise

    def abort(self) -> None:
        self._done = True
        self._abort_upload()
        super().close()

    def __del__(self):
        # io.IOBase.__del__ would call close() — which PUBLISHES. A
        # handle abandoned by a failed task must discard at GC, never
        # durably PUT its partial buffer (matches _AtomicLocalFile,
        # where GC leaves only an unpublished tmp).
        self.abort()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *_):
        if exc_type is not None:
            self.abort()
        else:
            self.close()


class _S3RangedReadHandle:
    """Seekable read handle that issues ranged GETs on demand — the
    read twin of the multipart write path (the reference's ranged-IO
    posture, /root/reference/src/read/reader.rs:168-225): the format
    reader's column pruning and page skipping translate into byte-range
    requests instead of a whole-object download, so scanning 2 of 20
    columns of a multi-GB strawboat file fetches ~2/20 of its bytes.

    Opening costs ONE suffix-range GET of the object tail: that single
    round-trip learns the total size (Content-Range) AND caches the
    region the format's open sequence reads first (trailer + footer),
    so small objects — manifests, sidecars — are fully served by it.
    An object whose size comes back <= the whole-object threshold is
    fetched completely on the first cache miss (one more GET) — ranged
    IO only pays off past a few MiB.  Misses below the tail fetch
    max(want, readahead) bytes forward from the miss position, which
    coalesces the reader's ascending page-run reads into few requests.

    Env knobs (bytes): STRAWBOAT_S3_READ_TAIL (default 256 KiB),
    STRAWBOAT_S3_READAHEAD (default 4 MiB),
    STRAWBOAT_S3_RANGED_READ_MIN (default 8 MiB; objects at or below
    buffer whole on first miss).  `range_gets` / `bytes_fetched`
    counters expose the IO shape to tests."""

    def __init__(self, fs: "S3FileSystem", bucket: str, key: str):
        self._s3fs = fs
        self._bucket = bucket
        self._obj_key = key
        self._path = f"{fs._scheme}://{bucket}/{key}"
        self._tail_bytes = _env_bytes("STRAWBOAT_S3_READ_TAIL", 256 << 10)
        self._readahead = _env_bytes("STRAWBOAT_S3_READAHEAD", 4 << 20)
        self._whole_min = _env_bytes("STRAWBOAT_S3_RANGED_READ_MIN", 8 << 20)
        self._pos = 0
        self._win = b""
        self._win_start = 0
        self._closed = False
        self.range_gets = 0
        self.bytes_fetched = 0
        self._tail, self._size = self._fetch_tail()
        self._tail_start = self._size - len(self._tail)

    def _get_range(self, header: str) -> tuple[bytes, str]:
        try:
            resp = self._s3fs._get_object(
                Bucket=self._bucket, Key=self._obj_key, Range=header
            )
            body = resp["Body"].read()
        except _s3_client_error() as e:
            if _s3_error_code(e) in ("InvalidRange", "416"):
                # suffix range on a zero-byte object: the object exists
                # but has no bytes to range over
                return b"", "bytes 0--1/0"
            _s3_reraise(e, self._path)
        self.range_gets += 1
        self.bytes_fetched += len(body)
        return body, str(resp.get("ContentRange") or "")

    def _fetch_tail(self) -> tuple[bytes, int]:
        body, crange = self._get_range(f"bytes=-{max(self._tail_bytes, 1)}")
        # Content-Range: "bytes <start>-<end>/<total>"
        try:
            total = int(crange.rpartition("/")[2])
        except ValueError:
            total = len(body)  # server returned the whole object (200)
        return body, total

    def _chunk_at(self, pos: int, want: int) -> bytes:
        if pos >= self._tail_start:
            off = pos - self._tail_start
            return self._tail[off : off + want]
        if self._win_start <= pos < self._win_start + len(self._win):
            off = pos - self._win_start
            return self._win[off : off + want]
        ahead = self._size if self._size <= self._whole_min else self._readahead
        start = 0 if ahead >= self._size else pos
        end = min(start + max(want + (pos - start), ahead), self._size)
        self._win, _ = self._get_range(f"bytes={start}-{end - 1}")
        self._win_start = start
        off = pos - start
        return self._win[off : off + want]

    def read(self, n: int = -1) -> bytes:
        if self._closed:
            raise ValueError("I/O operation on closed file")
        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        out = bytearray()
        while n > 0:
            chunk = self._chunk_at(self._pos, n)
            if not chunk:  # defensive: never spin on a short range
                break
            out += chunk
            self._pos += len(chunk)
            n -= len(chunk)
        return bytes(out)

    def seek(self, offset: int, whence: int = 0) -> int:
        base = (0, self._pos, self._size)[whence]
        self._pos = max(0, base + offset)
        return self._pos

    def tell(self) -> int:
        return self._pos

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def close(self) -> None:
        self._closed = True
        self._win = b""
        self._tail = b""

    @property
    def closed(self) -> bool:
        return self._closed

    def __enter__(self):
        return self

    def __exit__(self, *_):
        self.close()


def _env_bytes(name: str, default: int) -> int:
    try:
        v = int(os.environ.get(name, "0"))
    except ValueError:
        v = 0
    return v if v > 0 else default


class S3FileSystem:
    """boto3-backed S3 implementation of the filesystem seam — the
    object-store twin of MemoryFileSystem (flat keys, no directories,
    PUT-at-close publishes atomically, If-None-Match CAS).  Used when
    fsspec/s3fs are absent; endpoint override via the
    STRAWBOAT_S3_ENDPOINT env var (e.g. a moto server or MinIO),
    credentials/region from the standard AWS env/config chain.

    The client is built lazily PER PROCESS (pid-checked): Spark's
    Python workers are separate processes and boto3 clients are not
    fork-safe, so each worker constructs its own on first use.
    open_read returns a seekable ranged-GET handle
    (_S3RangedReadHandle): one suffix GET serves manifests and footers,
    data-file page runs fetch as byte ranges with readahead, and
    objects under STRAWBOAT_S3_RANGED_READ_MIN buffer whole.
    STRAWBOAT_S3_RANGED_READ=0 restores whole-object buffering."""

    def __init__(self, scheme: str = "s3"):
        self._scheme = scheme
        self._c = None
        self._pid = None
        self._endpoint = None

    def _client(self):
        endpoint = os.environ.get("STRAWBOAT_S3_ENDPOINT") or None
        if (
            self._c is None
            or self._pid != os.getpid()
            or self._endpoint != endpoint
        ):
            import boto3

            self._c = boto3.client("s3", endpoint_url=endpoint)
            self._pid = os.getpid()
            self._endpoint = endpoint
        return self._c

    @staticmethod
    def _sim_latency() -> None:
        """STRAWBOAT_S3_SIM_LATENCY_MS (debug knob): sleep before a
        request to simulate per-request round-trip latency.  Applied to
        every GET and every write-side request (PutObject, UploadPart,
        Create/CompleteMultipartUpload) so bench_s3_latency.py can
        quantify both directions under the same latency model (env vars
        reach Spark's local-mode Python workers, so the shim applies
        executor-side too)."""
        ms = os.environ.get("STRAWBOAT_S3_SIM_LATENCY_MS")
        if ms:
            import time as _time

            _time.sleep(float(ms) / 1000.0)

    def _get_object(self, **kw):
        """All S3 GETs funnel here (latency shim: _sim_latency)."""
        self._sim_latency()
        return self._client().get_object(**kw)

    def _bk(self, path: str) -> tuple[str, str]:
        rest = split_scheme(path)[1].rstrip("/")
        bucket, _, key = rest.partition("/")
        return bucket, key

    def _url(self, bucket: str, key: str) -> str:
        return f"{self._scheme}://{bucket}/{key}"

    def open_read(self, path: str):
        bucket, key = self._bk(path)
        if os.environ.get("STRAWBOAT_S3_RANGED_READ", "1") == "0":
            try:
                body = self._get_object(Bucket=bucket, Key=key)[
                    "Body"
                ].read()
            except _s3_client_error() as e:
                _s3_reraise(e, path)
            return io.BytesIO(body)
        return _S3RangedReadHandle(self, bucket, key)

    def create(self, path: str) -> _S3WriteHandle:
        bucket, key = self._bk(path)
        return _S3WriteHandle(self, bucket, key, exclusive=False)

    def create_exclusive(self, path: str) -> _S3WriteHandle:
        bucket, key = self._bk(path)
        return _S3WriteHandle(self, bucket, key, exclusive=True)

    def _iter_keys(self, bucket: str, prefix: str):
        paginator = self._client().get_paginator("list_objects_v2")
        try:
            for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
                yield from page.get("Contents", ())
        except _s3_client_error() as e:
            # a missing bucket lists as empty (the local/memory analog:
            # glob over a missing dir is []); other codes keep the
            # seam's OSError contract
            if _s3_error_code(e) not in _S3_MISSING_CODES:
                _s3_reraise(e, f"{self._scheme}://{bucket}/{prefix}")

    def list_files(self, path: str, suffix: str) -> list[str]:
        bucket, key = self._bk(path)
        return sorted(
            self._url(bucket, o["Key"])
            for o in self._iter_keys(bucket, key + "/")
            if o["Key"].endswith(suffix)
        )

    def isdir(self, path: str) -> bool:
        bucket, key = self._bk(path)
        return any(True for _ in self._iter_keys(bucket, key + "/"))

    def exists(self, path: str) -> bool:
        bucket, key = self._bk(path)
        try:
            self._client().head_object(Bucket=bucket, Key=key)
            return True
        except _s3_client_error() as e:
            # ONLY a definitive not-found means "no such object" — a
            # 403/throttle/5xx must surface, not read as 'absent' (a
            # transient HeadObject failure would otherwise make a
            # populated table look manifest-less)
            if _s3_error_code(e) in _S3_MISSING_CODES:
                return self.isdir(path)
            _s3_reraise(e, path)

    def remove(self, path: str) -> None:
        bucket, key = self._bk(path)
        # S3 DeleteObject is idempotent/silent on missing keys; the
        # seam's contract (LocalFileSystem.remove) raises — check first
        try:
            self._client().head_object(Bucket=bucket, Key=key)
            self._client().delete_object(Bucket=bucket, Key=key)
        except _s3_client_error() as e:
            _s3_reraise(e, path)

    def makedirs(self, path: str) -> None:
        return None  # object stores have no directories

    def _head(self, path: str):
        bucket, key = self._bk(path)
        try:
            return self._client().head_object(Bucket=bucket, Key=key)
        except _s3_client_error() as e:
            _s3_reraise(e, path)

    def stat_sig(self, path: str) -> tuple:
        h = self._head(path)
        return (int(h["ContentLength"]), h["ETag"].strip('"'))

    def mtime_ns(self, path: str) -> int:
        return int(self._head(path)["LastModified"].timestamp() * 1e9)

    def age_seconds(self, path: str) -> float:
        import time

        return time.time() - self._head(path)["LastModified"].timestamp()

    def move(self, src: str, dst: str) -> None:
        # object-store "rename": server-side copy + delete (no atomic
        # rename exists; same model as MemoryFileSystem.move)
        sb, sk = self._bk(src)
        db, dk = self._bk(dst)
        c = self._client()
        try:
            c.copy_object(Bucket=db, Key=dk, CopySource={"Bucket": sb, "Key": sk})
            c.delete_object(Bucket=sb, Key=sk)
        except _s3_client_error() as e:
            _s3_reraise(e, src)

    def remove_tree(self, path: str) -> None:
        bucket, key = self._bk(path)
        batch = []
        c = self._client()
        for o in self._iter_keys(bucket, key + "/"):
            batch.append({"Key": o["Key"]})
            if len(batch) == 1000:
                c.delete_objects(Bucket=bucket, Delete={"Objects": batch})
                batch = []
        if batch:
            c.delete_objects(Bucket=bucket, Delete={"Objects": batch})

    def list_dirs(self, path: str) -> list[str]:
        bucket, key = self._bk(path)
        prefix = key + "/"
        dirs: set[str] = set()
        for o in self._iter_keys(bucket, prefix):
            parts = o["Key"][len(prefix):].split("/")[:-1]
            for i in range(1, len(parts) + 1):
                dirs.add(prefix + "/".join(parts[:i]))
        return sorted(self._url(bucket, d) for d in dirs)


_LOCAL = LocalFileSystem()
_MEMORY = MemoryFileSystem()
_REGISTRY: dict[str, object] = {"": _LOCAL, "file": _LOCAL, "memory": _MEMORY}


def register_filesystem(scheme: str, fs) -> None:
    _REGISTRY[scheme] = fs


_COPY_CHUNK = 8 << 20


def copy_bytes(src: str, dst: str) -> None:
    """Stream a file between paths/backends in BOUNDED memory: chunked
    reads (ranged GETs on S3) feed the destination handle, whose
    multipart path ships parts as the buffer passes the part threshold
    — a multi-GB deep-clone copy holds ~one chunk + one pending part,
    not the whole object. Publication stays atomic (commit-at-close /
    CompleteMultipartUpload); an error aborts the write unpublished."""
    with get_fs(src).open_read(src) as r, get_fs(dst).create(dst) as w:
        while True:
            chunk = r.read(_COPY_CHUNK)
            if not chunk:
                break
            w.write(chunk)


def move_file(src: str, dst: str) -> None:
    """Scheme-aware move. Same backend: fs.move (atomic rename locally,
    server-side copy+delete on object stores). ACROSS backends — e.g.
    adopting a local tmp write into an s3:// table root — stream the
    bytes through copy_bytes (bounded memory, atomic at close), then
    remove the source."""
    sfs, dfs = get_fs(src), get_fs(dst)
    if sfs is dfs:
        sfs.move(src, dst)
        return
    copy_bytes(src, dst)
    sfs.remove(src)


def get_fs(path: str):
    scheme, _ = split_scheme(path)
    fs = _REGISTRY.get(scheme)
    if fs is not None:
        return fs
    if scheme in ("s3", "s3a"):
        # native boto3 backend first (present without fsspec/s3fs; the
        # standard AWS env/config chain + STRAWBOAT_S3_ENDPOINT apply) —
        # it must resolve identically in every Spark Python worker
        # process, which all run this same fallback on first use
        try:
            import boto3  # noqa: F401

            fs = S3FileSystem(scheme)
            _REGISTRY[scheme] = fs
            return fs
        except ImportError:
            pass
    try:
        fs = _FsspecFileSystem(scheme)
    except ImportError as e:
        raise ValueError(
            f"no filesystem registered for scheme {scheme!r} and neither "
            f"boto3 (s3) nor fsspec is installed (register one via "
            f"register_filesystem)"
        ) from e
    _REGISTRY[scheme] = fs
    return fs
