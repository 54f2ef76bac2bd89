"""lakehouse_app_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the reference app (`jtisbell4/lakehouse-app`): top-k
vector similarity retrieval, document post-processing (projection,
dedup, truncation, concatenation), session-keyed state over ordered
streams, and REST-JSON-to-table ingestion — widened to a full
relational + text + vector + streaming operator surface designed for
100 TB scale (see SURVEY.md §2.2).

Everything is built on the public Apache Spark DataFrame / SQL /
Structured Streaming APIs; logical plans are declared and Catalyst +
Tungsten pick the physical strategy.
"""

from lakehouse_app_spark.session import get_spark, ensure_runtime_confs
from lakehouse_app_spark.sources.tables import load_tables, TABLE_NAMES
from lakehouse_app_spark.registry import QUERIES, ORACLES, query
from lakehouse_app_spark.runtime_cache import release_caches

__all__ = [
    "get_spark",
    "ensure_runtime_confs",
    "load_tables",
    "TABLE_NAMES",
    "QUERIES",
    "ORACLES",
    "query",
]


def load_all_queries() -> None:
    """Import every query-defining module so the registry is populated."""
    import lakehouse_app_spark.operators.relational  # noqa: F401
    import lakehouse_app_spark.operators.joins  # noqa: F401
    import lakehouse_app_spark.operators.aggregates  # noqa: F401
    import lakehouse_app_spark.operators.windows  # noqa: F401
    import lakehouse_app_spark.operators.setops  # noqa: F401
    import lakehouse_app_spark.operators.vectors  # noqa: F401
    import lakehouse_app_spark.operators.text  # noqa: F401
    import lakehouse_app_spark.operators.dedup  # noqa: F401
    import lakehouse_app_spark.operators.udfs  # noqa: F401
    import lakehouse_app_spark.operators.ann  # noqa: F401
    import lakehouse_app_spark.operators.multimodal  # noqa: F401
    import lakehouse_app_spark.operators.io_ops  # noqa: F401
    import lakehouse_app_spark.operators.relational_ext  # noqa: F401
    import lakehouse_app_spark.operators.tpch  # noqa: F401
    import lakehouse_app_spark.operators.analytics  # noqa: F401
    import lakehouse_app_spark.operators.lake_ops  # noqa: F401
    import lakehouse_app_spark.operators.pipeline_e2e  # noqa: F401
    import lakehouse_app_spark.operators.warehouse_ext  # noqa: F401
    import lakehouse_app_spark.operators.events_analytics  # noqa: F401
    import lakehouse_app_spark.operators.timeseries  # noqa: F401
    import lakehouse_app_spark.operators.text_pipeline  # noqa: F401
    import lakehouse_app_spark.operators.profiling  # noqa: F401
    import lakehouse_app_spark.operators.sql_features  # noqa: F401
    import lakehouse_app_spark.operators.quality  # noqa: F401
    import lakehouse_app_spark.operators.corpus_prep  # noqa: F401
    import lakehouse_app_spark.operators.dedup_ext  # noqa: F401
    import lakehouse_app_spark.operators.sketches  # noqa: F401
    import lakehouse_app_spark.operators.span_dedup  # noqa: F401
    import lakehouse_app_spark.operators.bpe  # noqa: F401
    import lakehouse_app_spark.functions.batteries  # noqa: F401
    import lakehouse_app_spark.streaming.stream_queries  # noqa: F401
