"""Batch sinks. Parquet-first (delta-spark is not installed in this
environment); the format switch is where Delta/Iceberg would plug in
at deployment time (SURVEY.md §7.6).

Scale notes: writers take explicit partition columns (date-style
partitioning prunes at read time) and an optional bucket spec —
bucketing co-locates join keys so repeated large joins skip the
shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates `bucket_col` so equi-joins
    and aggregations on it become shuffle-free (100 TB path for
    lineitem/orders on orderkey — SURVEY.md §7.6)."""
    (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)
