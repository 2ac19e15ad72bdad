"""Multimodal-column query plans (binary payload plumbing).

The image/audio codec layer is stubbed (not in this environment —
see operators/multimodal.py); what these plans pin down is the real
Spark-side surface: binary columns, hashing, Arrow-batched
mapInPandas decode, and 1:N frame fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcd_etl_spark.operators import multimodal as M
from gcd_etl_spark.plans.registry import query
from gcd_etl_spark.sources.catalog import read_table


@query(
    "mm_binary_meta",
    oracle="""
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text)               AS sha_hex
FROM documents
""",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload column + byte length + sha256 — the
    JVM-side (non-UDF) part of the media pipeline."""
    docs = read_table(spark, sf_dir, "documents")
    payloads = M.attach_binary_payload(docs)
    return payloads.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha_hex"),
    )


@query("mm_decode_meta", oracle=None)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode stage (deterministic stub codec): binary
    -> (n_bytes, sha256, width, height, format) via mapInPandas."""
    docs = read_table(spark, sf_dir, "documents")
    return M.decode_media_meta(M.attach_binary_payload(docs))


@query("mm_frame_sample", oracle=None)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:N frame-sampling fan-out via mapInPandas (stub demuxer)."""
    docs = read_table(spark, sf_dir, "documents")
    return M.frame_sample_plan(M.attach_binary_payload(docs), every_n=2)
