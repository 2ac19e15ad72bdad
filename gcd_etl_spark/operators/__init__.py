from gcd_etl_spark.operators import dedup, multimodal, similarity, windows

__all__ = ["dedup", "multimodal", "similarity", "windows"]
