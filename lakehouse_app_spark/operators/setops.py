"""Set operations: UNION (ALL/DISTINCT), INTERSECT, EXCEPT.

North-star relational surface (the reference has none). Spark plans
UNION as a zero-shuffle concatenation; the DISTINCT variants add one
hash aggregate / hash join on the full row — at scale these shuffle
on the row hash, so keep projections narrow before deduping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables


@query(
    "q_set_union",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t.customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = t.orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@query(
    "q_set_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t.customer.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    b = t.orders.where(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@query(
    "q_set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t.customer.select(F.col("c_custkey").alias("custkey"))
    b = t.orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)
