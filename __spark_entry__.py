"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``lakehouse_app_spark/``; this file is the
thin wiring layer.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lakehouse_app_spark as eng

eng.load_all_queries()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Mirrors the reference's core loop (`app/vector_search.py:29-33` +
    `app/app.py:111-124`): top-3 cosine retrieval joined to the
    document corpus, projected to (doc_id, source, snippet, sim).
    """
    eng.ensure_runtime_confs(spark)
    return eng.QUERIES["q_vs_retrieve"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(eng.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key (omitted for
    non-SQL-expressible ops → driver records rows-only checks)."""
    return dict(eng.ORACLES)
