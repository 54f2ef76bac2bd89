"""TPC-H classic query shapes (Q3, Q5, Q10, Q18) on the testdata
star schema.

These pin the composed plans a warehouse lives on: selective dim
filter → fact joins → aggregate → top-k (Q3), a 6-way snowflake join
with a cycle-closing equality (Q5), a returned-item customer ranking
(Q10), and an IN-subquery over a grouped HAVING (Q18, which Catalyst
turns into an aggregate + semi-join). Revenue/quantity sums use the
exact-decimal contract so ORDER BY / HAVING boundaries are
bit-identical across engines.
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


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier-volume shape: a 6-way snowflake join whose
    last edge (c_nationkey = s_nationkey) closes a cycle — the plan
    that exercises join reordering hardest. region/nation/supplier
    are broadcast (dims ≪ facts), so the only shuffles are the two
    fact joins; the cycle edge becomes a post-join filter Catalyst
    pushes into the supplier join. 5-row result regardless of SF."""
    t = load_tables(spark, sf_dir)
    y96 = F.lit("1996-01-01").cast("timestamp_ntz")
    y97 = F.lit("1997-01-01").cast("timestamp_ntz")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .where((F.col("o_orderdate") >= y96) & (F.col("o_orderdate") < y97))
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "q_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
             AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item-reporting shape: quarter-scoped fact joins,
    returnflag filter pushed to the lineitem scan, grouped revenue
    per customer, top-20 via TakeOrderedAndProject. The nation dim
    broadcasts; the l_returnflag predicate lands in PushedFilters so
    the scan skips ~4/5 of lineitem row groups at scale."""
    t = load_tables(spark, sf_dir)
    q_start = F.lit("1996-07-01").cast("timestamp_ntz")
    q_end = F.lit("1996-10-01").cast("timestamp_ntz")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .where((F.col("o_orderdate") >= q_start) & (F.col("o_orderdate") < q_end))
        .join(
            t.lineitem.where(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )
