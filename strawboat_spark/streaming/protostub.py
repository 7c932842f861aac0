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


def install() -> bool:
    """Returns True if the stub was installed, False if the real
    google.protobuf is present (stub never shadows it)."""
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
    return True
