from gcd_etl_spark.sources.catalog import TABLES, load_tables, read_table, register_views
from gcd_etl_spark.sources.sinks import write_snapshot

__all__ = ["TABLES", "read_table", "load_tables", "register_views", "write_snapshot"]
