"""Make `google.protobuf` importable when it isn't installed, using the
vendored minimal runtime (strawboat_spark/vendor/protostub).

pyspark's transformWithStateInPandas talks to the JVM state server via
protobuf messages (pyspark/sql/streaming/proto/StateMessage_pb2.py);
without a protobuf runtime the operator dies on import in every Python
worker. install() adds the stub to sys.path (driver) and PYTHONPATH
(so executors' Python workers inherit it) — but ONLY when the real
package is absent, and only before the JVM is launched can the worker
side take effect, so call it early (session.py does).
"""

from __future__ import annotations

import importlib.util
import os
import sys

_VENDOR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor", "protostub")


def install(spark=None) -> bool:
    """Returns True if the stub was installed, False if the real
    google.protobuf is present (stub never shadows it).

    Pass the active SparkSession to ALSO ship the stub to executors
    via addPyFile — required when the JVM was launched by a harness
    that never saw our PYTHONPATH (the env route only works before
    JVM start). Worker sys.path picks the zip up before UDF
    deserialization, so a mid-session install still reaches the
    transformWithState worker imports."""
    try:
        real = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        real = False  # no `google` namespace at all
    if real:
        return False
    if _VENDOR not in sys.path:
        sys.path.insert(0, _VENDOR)
    # Python workers are separate processes spawned by the JVM: they
    # see PYTHONPATH, not this process's sys.path. Effective only if
    # the SparkSession has not started its JVM yet.
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if _VENDOR not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([_VENDOR] + [p for p in parts if p])
    # a partial import of the namespace package from a failed earlier
    # attempt would mask the stub
    for mod in ("google", "google.protobuf"):
        m = sys.modules.get(mod)
        if m is not None and not getattr(m, "__file__", "").startswith(_VENDOR):
            del sys.modules[mod]
    if spark is not None:
        sc = spark.sparkContext
        # ships with every pickled python function: the JVM's
        # PythonWorkerFactory merges these into the spawned worker's
        # env, which is the only route that reaches the DRIVER-side
        # transformWithState schema worker (spawned from the JVM env,
        # after JVM launch — addPyFile alone can't touch it)
        env_pp = sc.environment.get("PYTHONPATH", "")
        if _VENDOR not in env_pp.split(os.pathsep):
            sc.environment["PYTHONPATH"] = (
                _VENDOR + (os.pathsep + env_pp if env_pp else "")
            )
        sc.addPyFile(_stub_zip())
    return True


_ZIP_PATH: list[str] = []


def _stub_zip() -> str:
    """Zip the vendored google/ package once per process (zip roots at
    the vendor dir so workers unpack `google/protobuf/...` onto their
    sys.path)."""
    if _ZIP_PATH:
        return _ZIP_PATH[0]
    import tempfile
    import zipfile

    path = os.path.join(tempfile.mkdtemp(prefix="strawboat_protostub_"), "protostub.zip")
    with zipfile.ZipFile(path, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(_VENDOR, "google")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, _VENDOR))
    _ZIP_PATH.append(path)
    return path
