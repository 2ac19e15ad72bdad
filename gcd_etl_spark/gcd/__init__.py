from gcd_etl_spark.gcd.pipeline import build_snapshot, write_gcd_snapshot
from gcd_etl_spark.gcd.schema import GCD_SNAPSHOT_SCHEMA, GcdSchemaFlags

__all__ = ["build_snapshot", "write_gcd_snapshot", "GCD_SNAPSHOT_SCHEMA", "GcdSchemaFlags"]
