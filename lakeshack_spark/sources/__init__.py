from lakeshack_spark.sources.catalog import TABLE_NAMES, load_table, register_views

__all__ = ["TABLE_NAMES", "load_table", "register_views"]
