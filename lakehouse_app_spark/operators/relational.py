"""Scans, projection, filtering, derived columns, JSON extraction.

Generalizes the reference's frame manipulation: projection/reorder/
drop (`lakehouse_app_helpers.py:32-35`), conditional derived column
(`:36` — the ``logz`` URL), and nested/JSON field extraction (`:32-33`
on structs; `events.props` here is a JSON string, the streaming-world
shape). Everything is a declarative select so Catalyst pushes filters
and prunes columns into the Parquet scan — at 100 TB these run as
scan-local map tasks with zero shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import TABLE_NAMES, load_tables


@query(
    "q_scan_count",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS tbl, count(*) AS n FROM {t}" for t in TABLE_NAMES
    ),
)
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan every source table; count(*) compiles to a metadata-only
    parquet row-group read (no column materialization)."""
    t = load_tables(spark, sf_dir)
    counts = [
        getattr(t, name).agg(
            F.lit(name).alias("tbl"), F.count(F.lit(1)).alias("n")
        )
        for name in TABLE_NAMES
    ]
    return reduce(DataFrame.unionAll, counts)


@query(
    "q_project",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name,
           c_mktsegment AS segment, c_acctbal AS acctbal
    FROM customer
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + reorder + implicit drop (ref R2, R20, R21).
    Catalyst's ColumnPruning turns this into a 4-column parquet read."""
    t = load_tables(spark, sf_dir)
    return t.customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND (l_discount > 0.05 OR l_tax < 0.02)
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates + BETWEEN + IN + date range —
    all pushed to the parquet scan (PushedFilters in the plan)."""
    t = load_tables(spark, sf_dir)
    return t.lineitem.where(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_discount") > 0.05) | (F.col("l_tax") < 0.02))
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")


@query(
    "q_derived_col",
    oracle="""
    SELECT doc_id,
           CASE WHEN source = '' THEN '' ELSE source || '/logz' END AS logz,
           coalesce(nullif(lang, 'en'), 'english') AS lang_label,
           CASE WHEN n_chars < 200 THEN 'short'
                WHEN n_chars < 400 THEN 'medium'
                ELSE 'long' END AS size_band
    FROM documents
    """,
)
def q_derived_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional derived columns (ref R22: ``logz = '' if url==''
    else url+'/logz'`` at `lakehouse_app_helpers.py:36`) + null funcs."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.when(F.col("source") == "", "")
        .otherwise(F.concat(F.col("source"), F.lit("/logz")))
        .alias("logz"),
        F.coalesce(F.nullif(F.col("lang"), F.lit("en")), F.lit("english")).alias(
            "lang_label"
        ),
        F.when(F.col("n_chars") < 200, "short")
        .when(F.col("n_chars") < 400, "medium")
        .otherwise("long")
        .alias("size_band"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           value
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string field extraction (ref R19 generalized: the nested
    ``status.state`` pull at `lakehouse_app_helpers.py:32-33`)."""
    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        t.events.select("event_id", k.alias("k"), "value")
        .where(F.col("k") > 50)
    )
