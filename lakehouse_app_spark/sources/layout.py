"""Build-once derived-table layouts — the ingest-time index story.

SCALE.md's 100 TB claim is that expensive derived columns (IVF
cluster ids, MinHash band keys, SemDeDup block ids) are computed ONCE
at ingest and stored as table LAYOUT — a partition column the query
planner prunes on — so every downstream probe/dedup query is an
equi-join or partition-pruned scan instead of a full recompute. The
reference gets this for free from its server-side vector index
(`app/vector_search.py:24-27`: the index is built before any query
runs); here the index IS the table layout.

This module makes that concrete: :func:`derived_table` materializes a
derived DataFrame to a partitioned parquet table exactly once per
(name, sf_dir) and hands back reads of the stored table. On a real
cluster the build step is the ingest job and the path is a catalog
table; in this repo it is a session-scoped temp directory — only the
source/path line changes.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakehouse_app_spark.sources.sinks import write_table

# (name, sf_dir) -> materialized path. Module-level (not session-
# scoped): paths outlive any one SparkSession, so a rebuilt session
# in the same process still reuses the layout — like a real catalog.
_BUILT: dict[tuple[str, str], str] = {}


def derived_table(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Read the derived table ``name`` for ``sf_dir``, building and
    materializing it first if this process hasn't yet — the
    memoized stand-in for an ingest-time pipeline stage."""
    key = (name, sf_dir)
    if key not in _BUILT:
        path = tempfile.mkdtemp(prefix=f"layout_{name}_")
        write_table(build(), path, partition_by=partition_by)
        _BUILT[key] = path
    return spark.read.parquet(_BUILT[key])


def layout_path(name: str, sf_dir: str) -> str | None:
    """Materialized path for a built layout (None if not built)."""
    return _BUILT.get((name, sf_dir))
