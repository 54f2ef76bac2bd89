"""TPC-H classic query shapes (Q3, Q18) on the testdata star schema.

These pin the composed plans a warehouse lives on: selective dim
filter → fact joins → aggregate → top-k (Q3), and an IN-subquery over
a grouped HAVING (Q18, which Catalyst turns into an aggregate +
semi-join). Revenue/quantity sums use the exact-decimal contract so
ORDER BY / HAVING boundaries are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_app_spark.functions.compat import DEC, dsum
from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables


@query(
    "q_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
             AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping-priority shape: the selective customer filter
    reaches the scan, joins shuffle once each on their keys, and the
    final top-10 is TakeOrderedAndProject — never a full sort."""
    t = load_tables(spark, sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_q18",
    oracle="""
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 140
    )
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume-customer shape: grouped HAVING feeding an
    IN-subquery — expressed as an aggregate + left-semi join (what
    Catalyst rewrites the IN into anyway). Exact-decimal HAVING
    boundary, so membership is identical across engines."""
    t = load_tables(spark, sf_dir)
    big_orders = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .where(F.col("qty") > 140)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t.orders.join(
            big_orders, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi"
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "total_qty"))
    )
