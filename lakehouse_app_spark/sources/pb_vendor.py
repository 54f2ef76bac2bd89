"""On-demand pure-Python ``google.protobuf`` runtime for the Spark-4
arbitrary-state streaming API.

``transformWithStateInPandas`` speaks protobuf between the JVM state
server and its Python workers (pyspark ships the generated
``StateMessage_pb2`` but not the runtime), so on hosts without the
``protobuf`` package the v2 state API fails at query start with
``No module named 'google'``. Rather than gating the whole query on
the environment (the pre-round-7 policy), this module materializes a
runtime from a PUBLIC pure-Python protobuf copy already present on
the host (probe list below, extendable via
``SPARK_GRAFT_PROTOBUF_SRC``), with one documented patch: the
gencode/runtime version validator is downgraded from error to
warning, because pyspark's generated code may be one minor release
ahead of the host copy (observed: gencode 6.33.0 vs runtime 6.32.0)
and the StateMessage schema uses no cross-minor features.

Two injection points are needed and both are handled here:

- the DRIVER process imports ``pyspark.sql.streaming.proto`` when the
  query plan is built → ``sys.path`` insertion;
- the streaming PYTHON WORKERS (including the dedicated
  transformWithState driver-worker the JVM forks) are launched with
  an environment assembled from ``SparkContext.environment`` →
  setting ``PYTHONPATH`` there reaches them even when the JVM is
  already running (a vanilla driver session builds the JVM before
  any of our code runs, so a process-level ``os.environ`` hook would
  be too late).

protobuf is BSD-licensed public code; only ``*.py`` files are copied,
under the warehouse scratch dir (never committed).
"""

from __future__ import annotations

import os
import shutil
import sys

# Known pure-Python protobuf copies shipped by public SDKs. First hit
# wins; SPARK_GRAFT_PROTOBUF_SRC (a dir containing google/protobuf)
# overrides.
_PB_SRC_CANDIDATES = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]

_VERSION_SHIM = '''

# spark-graft vendored-copy shim: downgrade gencode/runtime version
# skew from hard error to warning. pyspark's generated
# StateMessage_pb2 may be one minor release ahead of this runtime;
# the state-server message schema uses no cross-minor gencode
# features, so the strict "runtime >= gencode" rule is relaxed for
# this vendored copy only.
def _ReportVersionError(msg):
  global _warning_count
  if _warning_count < _MAX_WARNING_COUNT:
    warnings.warn(msg)
    _warning_count += 1
'''

_resolved: str | None | bool = False  # False = not probed yet

# Quarantined trees (see _build_vendor_copy's heal path) are only
# needed while a concurrent process might still hold them on
# sys.path / worker PYTHONPATH; anything older than this is garbage.
_QUARANTINE_TTL_SEC = 3600.0


def _vendor_root() -> str:
    from lakehouse_app_spark.sources.layout import layout_base

    return os.path.join(
        os.path.dirname(layout_base()), "vendor", "pbruntime"
    )


def _copy_py_tree(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for e in os.listdir(src):
        s, d = os.path.join(src, e), os.path.join(dst, e)
        if os.path.isdir(s):
            if e != "__pycache__":
                _copy_py_tree(s, d)
        elif e.endswith(".py"):
            shutil.copy(s, d)


def _precompile(tree: str) -> None:
    """Write .pyc caches for every vendored module. The host sets
    PYTHONDONTWRITEBYTECODE=1, so the fresh (non-daemon) Python
    worker the JVM forks per transformWithState query re-tokenizes
    all ~40 protobuf files on EVERY query — ~120 ms of the measured
    tws floor. compileall/py_compile write the cache regardless of
    the env var, and the pyc validity key is the .py mtime+size
    (path-independent), so compiling the staging tree stays valid
    after the atomic rename to the final vendor path."""
    import compileall

    try:
        compileall.compile_dir(tree, quiet=2)
    except Exception:
        pass  # imports still work, just slower


def _sweep_quarantine(dst: str) -> None:
    """Reap quarantine dirs left by crashed/raced heals (review r8:
    they leaked indefinitely). Age-gated: a fresh quarantine may
    still be on a live process's sys.path."""
    import glob
    import time

    for q in glob.glob(f"{dst}.quarantine-*"):
        try:
            if time.time() - os.path.getmtime(q) > _QUARANTINE_TTL_SEC:
                shutil.rmtree(q, ignore_errors=True)
        except OSError:
            pass


def _build_vendor_copy(src_root: str) -> str:
    """Copy ``google/protobuf`` (py files only) from ``src_root`` into
    the warehouse vendor dir, apply the version shim, and mark the
    copy complete. Concurrency-safe the same way layout commits are
    (staging + atomic rename, marker-last): each builder assembles a
    private staging dir and claims the final path with one
    ``os.rename``; a loser discards its staging and polls briefly for
    the winner's marker, so no process ever imports from a
    half-written tree."""
    dst = _vendor_root()
    marker = os.path.join(dst, "_complete")
    _sweep_quarantine(dst)
    if os.path.exists(marker):
        # pre-round-9 trees were built without .pyc caches; heal once
        if not os.path.isdir(
            os.path.join(dst, "google", "protobuf", "__pycache__")
        ):
            _precompile(dst)
        return dst
    staging = f"{dst}.staging-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    _copy_py_tree(
        os.path.join(src_root, "google", "protobuf"),
        os.path.join(staging, "google", "protobuf"),
    )
    # regular (non-namespace) package: zipimport/worker-safe
    open(os.path.join(staging, "google", "__init__.py"), "w").close()
    with open(
        os.path.join(staging, "google", "protobuf", "runtime_version.py"),
        "a",
    ) as fh:
        fh.write(_VERSION_SHIM)
    _precompile(staging)
    with open(os.path.join(staging, "_complete"), "w") as fh:
        fh.write(src_root)
    try:
        os.rename(staging, dst)
    except OSError:
        if not os.path.exists(dst):
            shutil.rmtree(staging, ignore_errors=True)
            raise  # non-race failure
        # dst exists. A winner's rename always carries the marker
        # (staging is complete before the claim), so dst-with-marker
        # = lost race → use the winner's tree. dst-WITHOUT-marker can
        # only be pre-staging-era or crashed garbage → self-heal.
        # The heal NEVER deletes dst (review r7: a concurrent process
        # may have it on sys.path / worker PYTHONPATH, and two
        # rmtree+rename healers can interleave into a mixed tree):
        # instead the bad dir is QUARANTINED with one atomic rename —
        # exactly one healer wins that rename, every tree that ever
        # sits at dst is a complete pre-assembled staging, and a
        # process importing from the quarantined path keeps a
        # consistent (renamed, never mutated) tree.
        if os.path.exists(marker):
            shutil.rmtree(staging, ignore_errors=True)
            return dst
        try:
            os.rename(dst, f"{dst}.quarantine-{os.getpid()}")
        except OSError:
            pass  # another healer quarantined it first
        try:
            os.rename(staging, dst)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)
            if os.path.exists(marker):  # a concurrent healer beat us
                return dst
            raise
    return dst


def protobuf_runtime_dir() -> str | None:
    """Ensure ``google.protobuf`` is importable in THIS process.

    Returns '' if the stock package already imports (nothing to
    inject), the vendored runtime dir if one was materialized (callers
    must also inject it into worker PYTHONPATH via
    :func:`inject_worker_pythonpath`), or None if no runtime source
    exists — the only case left gated."""
    global _resolved
    if _resolved is not False:
        return _resolved
    try:
        from google.protobuf import descriptor  # noqa: F401

        _resolved = ""
        return _resolved
    except ImportError:
        pass
    srcs = [os.environ.get("SPARK_GRAFT_PROTOBUF_SRC", "")]
    srcs += _PB_SRC_CANDIDATES
    for src in srcs:
        if src and os.path.isfile(
            os.path.join(src, "google", "protobuf", "descriptor.py")
        ):
            try:
                dst = _build_vendor_copy(src)
                if dst not in sys.path:
                    sys.path.insert(0, dst)
                from google.protobuf import descriptor  # noqa: F401

                _resolved = dst
                return _resolved
            except Exception:
                continue
    _resolved = None
    return _resolved


def inject_worker_pythonpath(spark, vendor_dir: str) -> None:
    """Make ``vendor_dir`` visible to the Python workers the JVM
    forks (daemon workers AND the transformWithState driver-worker):
    their env is assembled from ``SparkContext.environment`` at
    worker launch, so this works on an already-running session."""
    env = spark.sparkContext.environment
    cur = env.get("PYTHONPATH") or os.environ.get("PYTHONPATH", "")
    if vendor_dir not in cur.split(os.pathsep):
        env["PYTHONPATH"] = (
            vendor_dir + (os.pathsep + cur if cur else "")
        )
