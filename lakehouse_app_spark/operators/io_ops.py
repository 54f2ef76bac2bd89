"""Sink round-trip as a declared (rows-only) query.

SURVEY.md §2.2 'Scans/sources/sinks': parquet sink with read-back
verification. Writes the pricing-summary result partitioned by its
group key, reads it back, and returns the read-back rows — exercising
the full write path (partitioned layout, schema round-trip) that the
100 TB pipeline uses for every materialization.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from lakehouse_app_spark.registry import QUERIES, query
from lakehouse_app_spark.sources.sinks import read_table, write_table


@query("q_sink_roundtrip")  # rows-only: filesystem side effect
def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="sink_roundtrip_")
    result = QUERIES["q_agg_pricing"](spark, sf_dir)
    write_table(result, out, partition_by=["l_returnflag"])
    back = read_table(spark, out)
    # partition columns come back last and as read types; reorder to
    # the original column order for a stable schema
    return back.select(*result.columns)
