"""Determinism helpers for oracle-checked queries (SURVEY.md §5.3).

Double summation order differs between engines, so any SUM over
doubles that must hash-match the DuckDB oracle is computed over an
exact decimal cast (identical result regardless of accumulation
order), then cast back to double. Rounding helpers cover values whose
computation paths differ (UDFs vs SQL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive exact SUM of a double column → double.

    Oracle equivalent: ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, in double.

    Oracle: ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def r6(col: Column, alias: str | None = None) -> Column:
    c = F.round(col, 6)
    return c.alias(alias) if alias else c


def r4(col: Column, alias: str | None = None) -> Column:
    c = F.round(col, 4)
    return c.alias(alias) if alias else c
