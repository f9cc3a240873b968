from delta_rs_spark.sources.tpch import TABLES, load_all, load_table, register_views

__all__ = ["TABLES", "load_all", "load_table", "register_views"]
