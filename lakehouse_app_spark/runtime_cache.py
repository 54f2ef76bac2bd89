"""Query-scoped cache registry.

Several operators persist an intermediate that feeds multiple
consumers inside ONE query (signature tables, posting lists). A bare
``.persist()`` leaks those blocks into Spark's CacheManager for the
rest of a 174-query session (round-3 advice); a ``localCheckpoint``
fixes the leak but cuts lineage, so downstream column pruning and
filter pushdown stop at the checkpoint — measured 2× slower on the
dedup tier, whose signatures carry wide shingle arrays the consumers
mostly prune away.

``scoped_persist`` keeps the fast path (a real persist, columnar
cache, pruning-aware) and registers the DataFrame so the harness —
bench.py after each timed query, tests between cases — can call
:func:`release_caches` to unpersist everything the previous query
pinned. Callers that never call ``release_caches`` (the driver's
sf0.01 correctness pass) leak at most the old behavior on 10× less
data."""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for the next release_caches()."""
    out = df.persist()
    _SCOPED.append(out)
    return out


def release_caches() -> int:
    """Unpersist every scoped cache registered since the last call;
    returns how many were released."""
    n = len(_SCOPED)
    for df in _SCOPED:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped
    _SCOPED.clear()
    return n
