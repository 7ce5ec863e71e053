"""Test-only protobuf shim (round-11 verdict task 6).

This container ships no installable ``google.protobuf``, but the
google-cloud-sdk bundle at ``/usr/lib/google-cloud-sdk/platform/
google_appengine`` carries a pure-Python protobuf 6.32 runtime.
PySpark's generated ``StateMessage_pb2`` (gencode 6.33) refuses any
OLDER runtime via ``ValidateProtobufRuntimeVersion``, so this shim

1. appends the GAE bundle to ``sys.path`` (appended, not prepended —
   a real protobuf install would win), and
2. wraps the validator to tolerate a newer gencode MINOR within the
   same major (6.33 gencode on 6.32 runtime). Cross-major gaps still
   raise, and if the descriptor actually used a 6.33-only feature the
   descriptor-pool build would fail loudly.

The file is named ``sitecustomize`` so that putting this directory on
PYTHONPATH applies the shim to every Python process that inherits the
environment — in particular Spark's streaming/executor Python workers,
where ``transformWithStateInPandas``'s state protocol actually imports
the generated module. The driver applies the same logic in-process
from ``tests/conftest.py``. Nothing here runs outside the test
environment: the engine itself never imports protobuf.

Trap (cost a debugging session): Spark's streaming Python runners put
``spark-core_*.jar`` itself on the worker PYTHONPATH, and the jar's
bundled ``google/protobuf/*.proto`` RESOURCES make ``import
google.protobuf`` "succeed" as an empty namespace package — so the
real-install probe must import an actual runtime module
(``descriptor``), and the stale namespace modules must be purged from
``sys.modules`` before retrying against the GAE bundle (a regular
package beats namespace portions regardless of sys.path order).
"""

import os
import sys

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _have_real_protobuf() -> bool:
    """A REAL runtime, not the spark-core jar's resource namespace."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def apply() -> bool:
    """Idempotently enable the bundled protobuf; True if available."""
    if not _have_real_protobuf():
        if not os.path.isdir(os.path.join(_GAE, "google", "protobuf")):
            return False
        # Drop any half-imported namespace portions so the retry below
        # re-resolves google.protobuf against the full path.
        for mod in [
            m for m in sys.modules if m == "google" or m.startswith("google.")
        ]:
            del sys.modules[mod]
        if _GAE not in sys.path:
            sys.path.append(_GAE)
        if not _have_real_protobuf():
            return False
    try:
        from google.protobuf import runtime_version as _rv
    except ImportError:
        return False
    orig = _rv.ValidateProtobufRuntimeVersion
    if getattr(orig, "_pb_shim_lenient", False):
        return True

    def _lenient(domain, major, minor, patch, suffix, location):
        try:
            orig(domain, major, minor, patch, suffix, location)
        except _rv.VersionError:
            if major != _rv.MAJOR:
                raise

    _lenient._pb_shim_lenient = True
    _rv.ValidateProtobufRuntimeVersion = _lenient
    return True


apply()
