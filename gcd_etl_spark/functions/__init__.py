from gcd_etl_spark.functions import scalar, text, vector

__all__ = ["scalar", "text", "vector"]
