"""Plan-shape regression tests: the 100 TB story, asserted.

Each test pins a physical-plan property that matters at scale; a
refactor that silently loses pushdown/broadcast/top-k rewriting fails
here long before it costs a cluster-hour.
"""

from pyspark.sql import functions as F

from lakehouse_app_spark import QUERIES
from lakehouse_app_spark.plans.checks import (
    assert_in_plan,
    formatted_plan,
    pushed_filters,
    read_schema_width,
)
from lakehouse_app_spark.sources.tables import load_tables


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = QUERIES["q_filter_pred"](spark, sf_dir)
    pf = pushed_filters(df)
    assert "l_quantity" in pf and "l_returnflag" in pf, pf


def test_column_pruning_projection(spark, sf_dir):
    df = QUERIES["q_project"](spark, sf_dir)
    (schema_line,) = read_schema_width(df)
    # only the 4 projected columns leave the parquet scan
    assert "c_custkey" in schema_line and "c_nationkey" not in schema_line
    assert schema_line.split("struct<")[1].count(":") == 4, schema_line


def test_topk_is_take_ordered(spark, sf_dir):
    assert_in_plan(QUERIES["q_orderby_limit"](spark, sf_dir), "TakeOrderedAndProject")


def test_multiway_join_broadcasts_dims(spark, sf_dir):
    plan = formatted_plan(QUERIES["q_join_multiway"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_range_join_is_broadcast_nested_loop(spark, sf_dir):
    assert_in_plan(QUERIES["q_join_range"](spark, sf_dir), "BroadcastNestedLoopJoin")


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    assert_in_plan(QUERIES["q_topk_per_group"](spark, sf_dir), "WindowGroupLimit")


def test_cosine_topk_stays_jvm_side(spark, sf_dir):
    """No Python evaluation nodes in the expression-based cosine path."""
    plan = formatted_plan(QUERIES["q_topk_cosine"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_agg_has_partial_aggregation(spark, sf_dir):
    """Q1-style agg must do map-side partial aggregation (two
    HashAggregate nodes around the exchange)."""
    plan = formatted_plan(QUERIES["q_agg_pricing"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan


def test_scan_count_is_metadata_only(spark, sf_dir):
    (schema_line,) = read_schema_width(
        load_tables(spark, sf_dir).lineitem.agg(F.count(F.lit(1)))
    )
    assert "struct<>" in schema_line, schema_line


def test_whole_stage_codegen_covers_filter(spark, sf_dir):
    # formatted explain marks codegen spans as "[codegen id : N]"
    assert_in_plan(QUERIES["q_filter_pred"](spark, sf_dir), "codegen id")
