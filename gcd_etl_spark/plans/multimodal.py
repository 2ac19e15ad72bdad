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


# The stub codec is DETERMINISTIC (sha256-derived), so even the
# Python mapInPandas stages get full value-hash oracles: DuckDB
# restates the fake decoder's arithmetic exactly. What the oracle then
# proves is the Spark-side contract — Arrow batch iteration, schema,
# 1:N fan-out — not the codec itself (which is the part a real
# deployment swaps).
@query(
    "mm_decode_meta",
    oracle="""
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       sha256(text) AS sha256,
       CAST(64 + CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) % 1920 AS INT)
         AS width,
       CAST(64 + (CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) // 256) % 1080
            AS INT) AS height,
       (['jpeg', 'png', 'webp'])[CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) % 3 + 1]
         AS format
FROM documents
""",
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode stage (deterministic stub codec): binary
    -> (n_bytes, sha256, width, height, format) via mapInPandas."""
    docs = read_table(spark, sf_dir, "documents")
    return M.decode_media_meta(M.attach_binary_payload(docs))


@query(
    "mm_frame_sample",
    oracle="""
WITH f AS (
  SELECT doc_id AS media_id,
         -- fixture text is pure ASCII (asserted upstream), so VARCHAR
         -- substring slices the same bytes Python's bytes[a:b] does
         unnest(list_transform(
             generate_series(0, octet_length(encode(text)) // 200),
             i -> struct_pack(
                 idx := i,
                 sha := sha256(substring(text, i * 200 + 1, 200))))) AS fr
  FROM documents
)
SELECT media_id, CAST(fr.idx AS INT) AS frame_idx, fr.sha AS frame_sha FROM f
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:N frame-sampling fan-out via mapInPandas (stub demuxer)."""
    docs = read_table(spark, sf_dir, "documents")
    return M.frame_sample_plan(M.attach_binary_payload(docs), every_n=2)


# ---------------------------------------------------------- tiling
#: Patch size for vision-model tiling (pixels).
TILE = 512

_TILES_ORACLE = f"""
WITH meta AS (
  SELECT doc_id AS media_id,
         CAST(64 + CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) % 1920
              AS INT) AS width,
         CAST(64 + (CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) // 256)
              % 1080 AS INT) AS height
  FROM documents
),
rows_y AS (
  SELECT media_id, width, height,
         unnest(generate_series(0, (height + {TILE} - 1) // {TILE} - 1)) AS ty
  FROM meta
),
grid AS (
  SELECT media_id, width, height, ty,
         unnest(generate_series(0, (width + {TILE} - 1) // {TILE} - 1)) AS tx
  FROM rows_y
)
SELECT media_id, CAST(ty AS INT) AS tile_row, CAST(tx AS INT) AS tile_col,
       CAST(tx * {TILE} AS INT) AS x0,
       CAST(ty * {TILE} AS INT) AS y0,
       CAST(LEAST({TILE}, width - tx * {TILE}) AS INT) AS tile_w,
       CAST(LEAST({TILE}, height - ty * {TILE}) AS INT) AS tile_h
FROM grid
"""


@query("mm_image_tiles", oracle=_TILES_ORACLE)
def mm_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch-tiling fan-out for vision-model preprocessing: decode
    metadata (Arrow-batched stub codec, mapInPandas) -> one row per
    TILE x TILE patch with clipped edge-tile geometry.

    The decode stage is the only Python; the 1:N tile fan-out itself
    is JVM-side codegen (two nested ``sequence`` explodes on the
    ceil-divided grid) — the right split at 100 TB, where the
    explode multiplies rows ~12x and should not pay Arrow transfer
    twice. Real-codec swap point stays inside decode_media_meta
    (operators/multimodal.py); the tile geometry contract — offsets,
    clipped widths ``least(TILE, width - x0)``, full coverage with no
    overlap (property-tested in tests/test_r5_ops.py) — is decoder-
    independent and fully value-hash-oracled.
    """
    docs = read_table(spark, sf_dir, "documents")
    meta = M.decode_media_meta(M.attach_binary_payload(docs)).select(
        "media_id", "width", "height"
    )
    n_y = F.expr(f"(height + {TILE} - 1) div {TILE}")
    n_x = F.expr(f"(width + {TILE} - 1) div {TILE}")
    g = (
        meta.withColumn("ty", F.explode(F.sequence(F.lit(0), (n_y - 1).cast("int"))))
        .withColumn("tx", F.explode(F.sequence(F.lit(0), (n_x - 1).cast("int"))))
    )
    return g.select(
        "media_id",
        F.col("ty").cast("int").alias("tile_row"),
        F.col("tx").cast("int").alias("tile_col"),
        (F.col("tx") * TILE).cast("int").alias("x0"),
        (F.col("ty") * TILE).cast("int").alias("y0"),
        F.least(F.lit(TILE), F.col("width") - F.col("tx") * TILE)
        .cast("int")
        .alias("tile_w"),
        F.least(F.lit(TILE), F.col("height") - F.col("ty") * TILE)
        .cast("int")
        .alias("tile_h"),
    )
