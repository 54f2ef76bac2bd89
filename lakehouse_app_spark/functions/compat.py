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


def fpsum(col: Column | str, alias: str, scale: int = 10000) -> Column:
    """Order-insensitive SUM of a fixed-point-valued double via scaled
    BIGINT accumulation — ~2× cheaper than the DECIMAL(25,6) path
    (plain long adds instead of 128-bit decimal adds) and exactly as
    deterministic, PROVIDED the operand is fixed-point with at most
    log10(scale) decimal places (e.g. money columns and their
    products). Both engines compute the identical double, round it to
    the same integer, and sum longs exactly.

    Overflow bound: |sum(x)| < 2^63 / scale ≈ 9.2e14 at scale 1e4 —
    per GROUP, not per table; fall back to ``dsum`` for global sums
    beyond that. Oracle equivalent:
    ``CAST(SUM(CAST(round(x * scale) AS BIGINT)) AS DOUBLE) / scale.0``
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(F.round(c * scale, 0).cast("long")).cast("double") / float(scale)
    ).alias(alias)
