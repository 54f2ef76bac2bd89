"""Python UDF / UDAF surface: Arrow-batched grouped-map transforms.

The engine's rule (SURVEY.md §4.2): UDFs are the slow path — built-in
expressions first, Arrow-vectorized pandas UDFs when Python is
unavoidable, never row-at-a-time Python UDFs. ``q_udf_cosine`` (in
operators/vectors.py) covers the scalar pandas UDF; here is the
grouped-map (``applyInPandas``) shape: per-group normalization, the
canonical "per-key model transform" of a training-data pipeline.

Scale note: applyInPandas shuffles on the group key and streams each
group through Arrow in batches — groups must fit in executor memory,
so key cardinality/skew is the thing to watch at 100 TB (salt or
pre-aggregate when a group can exceed a few hundred MB).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["c_acctbal"]
    sd = v.std(ddof=1)
    # NULL (not NaN/inf) for degenerate groups — a single-customer or
    # constant-balance segment gives sd NaN/0, where pandas would
    # emit NaN/inf but the SQL oracle's division yields NULL
    # (review r6); None round-trips Arrow as SQL NULL
    if not sd or sd != sd:
        z = pd.Series([None] * len(v), dtype="float64")
    else:
        z = ((v - v.mean()) / sd).round(4)
    return pd.DataFrame(
        {
            "c_custkey": pdf["c_custkey"],
            "segment": pdf["c_mktsegment"],
            "z": z,
        }
    )


@query(
    "q_udaf_normalize",
    oracle="""
    SELECT c_custkey,
           c_mktsegment AS segment,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS z
    FROM customer
    """,
)
def q_udaf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment z-score via grouped-map pandas UDF (Arrow batches).

    Rounded to 4 dp: pandas' pairwise summation and DuckDB's window
    aggregate accumulate doubles in different orders.
    """
    t = load_tables(spark, sf_dir)
    return t.customer.groupBy("c_mktsegment").applyInPandas(
        _zscore, schema="c_custkey long, segment string, z double"
    )
