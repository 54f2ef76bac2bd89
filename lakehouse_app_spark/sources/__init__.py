from lakehouse_app_spark.sources.tables import load_tables, TABLE_NAMES

__all__ = ["load_tables", "TABLE_NAMES"]
