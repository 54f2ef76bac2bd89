"""Query registry: the engine's declared, oracle-checked surface.

Each operator from SURVEY.md §2.2 registers a named query builder
(callable ``(spark, sf_dir) -> DataFrame``) and, when DuckDB can
reproduce it bit-for-bit, the equivalent ANSI SQL oracle string.
``__spark_entry__.py`` exposes these to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query builder; ``oracle=None`` → rows-only check."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        fn.query_name = name
        return fn

    return deco
