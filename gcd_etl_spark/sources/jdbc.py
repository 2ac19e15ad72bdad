"""Partitioned JDBC staging reader.

The reference streamed its whole 6-table denormalized query through a
single forward-only MySQL cursor (reference Main.java:245-247,380-385)
— fine at 10^7 rows, a non-starter at 100 TB. The engine's pattern:

1. read each *base* table over JDBC with ``partitionColumn`` splits so
   N executors pull N disjoint PK ranges concurrently;
2. write it straight to parquet staging (snappy, partitioned);
3. run all analytics off the parquet staging, never the database.

Runtime coverage (round 12): no MySQL server exists in the test
environment, but the Spark distribution ships embedded Apache Derby —
a real JDBC database inside the same JVM — so
``tests/test_jdbc_integration.py`` drives this reader END TO END:
partitioned range read (8 live cursors, boundary rows conserved),
filter/projection pushdown into the database scan, and the parquet
staging write. The unit tests over the option dict remain for the
MySQL-specific spelling.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcSource:
    """Connection config (reference example.yml:1-10 equivalent)."""

    url: str
    user: str = ""
    password: str = ""
    driver: str = "com.mysql.cj.jdbc.Driver"
    fetchsize: int = 10_000
    properties: dict[str, str] = field(default_factory=dict)


def jdbc_reader_options(
    source: JdbcSource,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
) -> dict[str, str]:
    """Assemble the option map for a (possibly range-partitioned) read.

    ``partition_column`` should be the integer PK (``id``); bounds can
    come from a cheap ``SELECT min(id), max(id)`` issued first. With
    partitioning set, Spark opens ``num_partitions`` concurrent
    cursors over disjoint ranges instead of the reference's one.
    """
    opts: dict[str, str] = {
        "url": source.url,
        "dbtable": table,
        "driver": source.driver,
        "fetchsize": str(source.fetchsize),
    }
    if source.user:
        opts["user"] = source.user
    if source.password:
        opts["password"] = source.password
    opts.update(source.properties)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read requires lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc_table(spark: SparkSession, source: JdbcSource, table: str, **kwargs) -> DataFrame:
    return spark.read.format("jdbc").options(**jdbc_reader_options(source, table, **kwargs)).load()


def stage_to_parquet(df: DataFrame, out_path: str, partition_cols: list[str] | None = None) -> None:
    """Land a JDBC table as parquet staging (the scale-path source)."""
    writer = df.write.mode("overwrite").option("compression", "snappy")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out_path)
