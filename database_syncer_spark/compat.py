"""Runtime-environment shims.

The engine refuses to degrade an operator just because this container is
missing an optional wheel when a usable PUBLIC copy is already on the
machine. Currently one shim: `google.protobuf`, which the
transformWithState Python worker needs to speak to the JVM.

Discovery contract (no installs, nothing written outside tmp):
- if `google.protobuf` already imports, do nothing;
- else probe a short list of well-known system SDK locations that bundle
  a pure-python protobuf (public, BSD-3-licensed);
- expose ONLY ``google/protobuf`` through a symlink shim directory on
  ``PYTHONPATH`` — never the SDK root itself, so none of the SDK's other
  top-level modules can shadow anything;
- pyspark's generated ``StateMessage_pb2`` may be gencoded by a protobuf
  one minor version newer than the found runtime (6.33 vs 6.32 here);
  same-major wire format is stable, so when the shim is engaged we set
  protobuf's own documented escape hatch
  (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``) and then PROVE the
  pairing works by importing and round-tripping the gencode before
  reporting success.

Must run BEFORE the first SparkSession is built: Python workers inherit
``PYTHONPATH`` from the JVM, and the JVM inherits it from this process at
gateway launch — after that, env changes no longer reach workers.
``session.get_spark`` calls :func:`ensure_protobuf` for exactly that
reason.
"""

from __future__ import annotations

import os
import sys
import tempfile

# System SDKs known to bundle a pure-python google.protobuf. Probed in
# order; first hit wins. (Paths are public-software install locations,
# nothing environment-proprietary.)
_PROTOBUF_HOSTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/lib64/google-cloud-sdk/platform/google_appengine",
    "/opt/google-cloud-sdk/platform/google_appengine",
)

_resolved: bool | None = None
_shim_dir: str | None = None  # set iff the shim (not a real wheel) is engaged


def _gencode_works() -> bool:
    """True iff pyspark's streaming-state gencode imports and round-trips
    against whatever google.protobuf runtime is currently importable."""
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2 as m
        req = m.StateRequest()
        return m.StateRequest.FromString(req.SerializeToString()) == req
    except Exception:  # VersionError, ImportError, TypeError — all = unusable
        return False


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable (driver AND future workers) if
    any usable copy exists on this machine; return whether the
    transformWithState wire path is usable. Idempotent and cached."""
    global _resolved
    if _resolved is not None:
        return _resolved

    try:
        import google.protobuf  # noqa: F401
        _resolved = _gencode_works()
        return _resolved
    except ImportError:
        pass

    src = next(
        (os.path.join(h, "google", "protobuf") for h in _PROTOBUF_HOSTS
         if os.path.isfile(os.path.join(h, "google", "protobuf", "__init__.py"))),
        None,
    )
    if src is None:
        _resolved = False
        return False

    # Per-uid shim dir: /tmp is world-writable, so a fixed shared path
    # would let any local user pre-plant a symlink that we'd then put on
    # every worker's import path (code injection) — and the target is
    # re-validated even for our own dir, so a stale/dangling link from a
    # previous environment is repaired instead of trusted (r4 review).
    uid = os.getuid() if hasattr(os, "getuid") else 0
    shim = os.path.join(tempfile.gettempdir(), f"dss_protobuf_shim_{uid}")
    link = os.path.join(shim, "google", "protobuf")
    try:
        os.makedirs(os.path.dirname(link), exist_ok=True)
        # a uid-suffixed NAME alone is spoofable (anyone can pre-create
        # it in world-writable /tmp and keep control — TOCTOU); require
        # that we actually OWN both levels and close them to others
        # before trusting anything inside (r4 review).
        for d in (shim, os.path.dirname(link)):
            st = os.lstat(d)
            if getattr(st, "st_uid", uid) != uid:
                _resolved = False
                return False
            if st.st_mode & 0o077:
                os.chmod(d, 0o700)
        if os.path.islink(link) and os.path.realpath(link) != \
                os.path.realpath(src):
            os.remove(link)
        if not os.path.islink(link):
            if os.path.exists(link):  # a real dir/file squatting there
                _resolved = False
                return False
            os.symlink(src, link)
    except OSError:
        _resolved = False
        return False

    # Engage for: this interpreter (sys.path), and every Python worker the
    # not-yet-launched JVM will fork (PYTHONPATH + the version-check flag).
    added_flag = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK" not in os.environ
    os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
    prev_pp = os.environ.get("PYTHONPATH", "")
    # Track what WE changed so rollback undoes only our additions: if
    # the shim path was already present (inherited from a parent
    # process's engaged env), an unconditional remove/restore would
    # strip an entry we didn't add or re-insert the shim into the
    # "restored" PYTHONPATH (r4 review).
    added_pp = shim not in prev_pp.split(os.pathsep)
    if added_pp:
        os.environ["PYTHONPATH"] = (
            shim + os.pathsep + prev_pp if prev_pp else shim)
    added_syspath = shim not in sys.path
    if added_syspath:
        sys.path.append(shim)

    _resolved = _gencode_works()
    if _resolved:
        global _shim_dir
        _shim_dir = shim
    else:  # unusable copy — leave nothing half-engaged (of OUR changes)
        if added_syspath:
            sys.path.remove(shim)
        if added_pp:
            if prev_pp:
                os.environ["PYTHONPATH"] = prev_pp
            else:  # don't leave an empty var that didn't exist before
                os.environ.pop("PYTHONPATH", None)
        if added_flag:  # don't strip a flag inherited from a parent env
            os.environ.pop("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", None)
        # evict ONLY modules the probe imported from the now-removed
        # shim path (a cached google.protobuf backed by an unreachable
        # dir would make later imports half-work) — a blanket google.*
        # purge would also evict site-packages modules like google.auth
        # that were never shim-backed, invalidating live references
        # (r4 review). The pyspark proto gencode is always evicted: it
        # bound to the shim runtime during the probe.
        for name, mod in list(sys.modules.items()):
            if name.startswith("pyspark.sql.streaming.proto"):
                sys.modules.pop(name, None)
                continue
            if name != "google" and not name.startswith("google."):
                continue
            f = getattr(mod, "__file__", None) or ""
            paths = list(getattr(mod, "__path__", None) or [])
            if f.startswith(shim) or any(
                    str(p).startswith(shim) for p in paths):
                sys.modules.pop(name, None)
    return _resolved


def ensure_protobuf_workers(spark) -> bool:
    """Like :func:`ensure_protobuf`, but also guarantees the *Python
    workers* of an ALREADY-RUNNING session can import google.protobuf.

    The round driver (and any third-party embedder) builds its own
    SparkSession without `get_spark`, so the JVM may have launched without
    the shim on PYTHONPATH — workers fork from the JVM and would crash at
    protobuf import even though the driver side resolved. PySpark passes
    ``sc.environment`` into every Python-function's worker env, so
    injecting the shim there reaches workers post-launch (verified: the
    typed-state pre-init worker picks it up; worker pools are keyed by
    env, so the injection is set once with stable values).

    Real-wheel hosts skip the injection entirely (workers inherit
    site-packages); the extra worker-pool key only exists where the shim
    is the only copy."""
    if not ensure_protobuf():
        return False
    if _shim_dir is not None and spark is not None:
        env = spark.sparkContext.environment
        pp = env.get("PYTHONPATH", "")
        if _shim_dir not in pp.split(os.pathsep):
            env["PYTHONPATH"] = (
                _shim_dir + os.pathsep + pp if pp else _shim_dir)
        env["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
    return True
