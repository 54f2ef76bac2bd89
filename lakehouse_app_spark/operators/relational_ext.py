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
from pyspark.sql import DataFrame, SparkSession, Window
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
            if text is None:  # total function: NULL text -> no rows,
                return  # like the oracle's string_split(NULL, ' ')
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


@query(
    "q_union_by_name",
    oracle="""
    SELECT o_orderkey, status, CAST(price AS DOUBLE) AS price, src
    FROM (
      SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS price,
             'with_price' AS src
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL BY NAME
      SELECT o_orderkey, 'archived' AS src, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 10 = 5
    )
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two extracts with different column
    sets and orders combine BY NAME, the missing column null-filled
    (`unionByName(allowMissingColumns=True)` ↔ DuckDB's UNION ALL BY
    NAME) — how a lakehouse appends old-schema and new-schema batches
    of the same logical table without positional-union corruption."""
    t = load_tables(spark, sf_dir)
    new_schema = t.orders.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.lit("with_price").alias("src"),
    )
    old_schema = t.orders.where(F.col("o_orderkey") % 10 == 5).select(
        "o_orderkey",
        F.lit("archived").alias("src"),
        F.col("o_orderstatus").alias("status"),
    )
    return new_schema.unionByName(old_schema, allowMissingColumns=True).select(
        "o_orderkey", "status", "price", "src"
    )


@query(
    "q_null_semantics",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_custkey IS NULL THEN 'null' ELSE 'set' END AS custkey_state,
           (nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL) AS p_nulled,
           coalesce(nullif(o_orderstatus, 'P'), 'replaced') AS status_or_default,
           CASE WHEN (CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderkey END
                      IN (1, 3, 5)) IS NULL THEN 'null'
                WHEN (CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderkey END
                      IN (1, 3, 5)) THEN 'true' ELSE 'false'
           END AS in_with_null_lhs,
           CAST(count(nullif(o_orderstatus, 'P'))
                OVER (PARTITION BY o_orderstatus) AS BIGINT) AS nonnull_in_status
    FROM orders
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic battery: NULLIF/COALESCE, null-safe
    equality (<=> ↔ IS NOT DISTINCT FROM), IN with a NULL operand
    (yields NULL, not false — the classic NOT-IN trap), and
    count(col)'s null-skipping vs count(*). Engines disagreeing on
    ANY of these silently corrupts filters downstream, so the whole
    battery is pinned under the exact oracle."""
    t = load_tables(spark, sf_dir)
    nulled = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    maybe_null_key = F.when(
        F.col("o_orderkey") % 2 == 0, F.lit(None).cast("bigint")
    ).otherwise(F.col("o_orderkey"))
    return t.orders.select(
        "o_orderkey",
        F.when(F.col("o_custkey").isNull(), "null").otherwise("set").alias(
            "custkey_state"
        ),
        nulled.eqNullSafe(F.lit(None).cast("string")).alias("p_nulled"),
        F.coalesce(nulled, F.lit("replaced")).alias("status_or_default"),
        F.when(maybe_null_key.isin(1, 3, 5).isNull(), "null")
        .when(maybe_null_key.isin(1, 3, 5), "true")
        .otherwise("false")
        .alias("in_with_null_lhs"),
        F.count(nulled)
        .over(Window.partitionBy("o_orderstatus"))
        .alias("nonnull_in_status"),
    )
