"""Catalog/metadata surface tests (console list()/details() analogs)."""

from lakehouse_app_spark.sources.catalog import (
    describe_table,
    list_tables,
    render_html,
)
from lakehouse_app_spark.sources.tables import TABLE_NAMES, load_tables


def test_list_tables_shows_registered_views(spark, sf_dir):
    load_tables(spark, sf_dir)
    names = {r["name"] for r in list_tables(spark).collect()}
    assert set(TABLE_NAMES) <= names


def test_describe_table_columns(spark, sf_dir):
    load_tables(spark, sf_dir)
    cols = {r["column"]: r["dtype"] for r in describe_table(spark, "lineitem").collect()}
    assert cols["l_orderkey"] == "bigint"
    assert cols["l_shipdate"].startswith("timestamp")


def test_render_html_is_presentation_only(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    html = render_html(t.region)
    assert html.startswith("<style>") and "<table" in html
