from uwheel_datafusion_spark.sources.registry import TABLES, load_table, register_tables

__all__ = ["TABLES", "load_table", "register_tables"]
