"""Extended relational surface: pivot, correlated scalar subqueries,
Python UDTF, grouped-agg pandas UDF.

Rounds out the engine contract beyond SURVEY.md §2.2's core rows:
reshaping (pivot), Catalyst's subquery decorrelation
(RewriteCorrelatedScalarSubquery, SURVEY.md §4.2), and the remaining
UDF-surface shapes (UDTF as a FROM-clause row generator; grouped-agg
pandas UDF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_app_spark.functions.compat import DEC
from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(25,6)) END) AS DOUBLE)
             AS qty_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(25,6)) END) AS DOUBLE)
             AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide reshape) with pinned pivot values — pinning
    avoids the extra distinct-values job AND keeps the output schema
    static, which is what a 100 TB pipeline needs anyway."""
    t = load_tables(spark, sf_dir)
    wide = (
        t.lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
    )
    return wide.select(
        "l_returnflag",
        F.col("F").alias("qty_f"),
        F.col("O").alias("qty_o"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long; the reference's dict→rows transpose, R27
    `lakehouse_app_helpers.py:102-107`, generalized): zero-shuffle
    row expansion via the melt/unpivot operator."""
    t = load_tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (SELECT avg(o2.o_totalprice)
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders above their customer's
    average). Catalyst decorrelates this into an aggregate + join —
    no per-row re-execution (the plan shows one Aggregate, one Join).
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (SELECT avg(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "q_udtf_tokens",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER)
             AS pos
    FROM documents
    WHERE doc_id < 50
    """,
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4 ``@udtf``): text → (token, pos)
    rows via a LATERAL table function. Deliberately bounded to 50 docs:
    Python UDTFs evaluate row-at-a-time, so production tokenization
    stays on the explode path (``q_tokenize_wordcount``) — this query
    exists to pin the UDTF API surface.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int")
    class SplitTokens:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield tok, i

    load_tables(spark, sf_dir)
    spark.udtf.register("split_tokens", SplitTokens)
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM documents d, LATERAL split_tokens(d.text) t
        WHERE d.doc_id < 50
        """
    )


@query(
    "q_udaf_grouped_agg",
    oracle="""
    SELECT c_mktsegment AS segment,
           round(avg(c_acctbal), 4) AS avg_bal,
           round(max(c_acctbal) - min(c_acctbal), 4) AS bal_range
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: whole group → one scalar, Arrow
    transfer, usable directly in ``agg``. Rounded to 4 dp (pandas
    pairwise summation vs DuckDB sequential)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def avg_bal(v: pd.Series) -> float:
        return float(v.mean())

    @pandas_udf("double")
    def bal_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    t = load_tables(spark, sf_dir)
    return (
        t.customer.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.round(avg_bal("c_acctbal"), 4).alias("avg_bal"),
            F.round(bal_range("c_acctbal"), 4).alias("bal_range"),
        )
    )
