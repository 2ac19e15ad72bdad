"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``gcd_etl_spark.plans.QUERIES`` — every operator from
SURVEY.md §2 (plus the north-star extension operators) registers a
named plan there with an optional DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gcd_etl_spark.plans import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The full GCD snapshot build — the Spark restatement of the
    reference's core pipeline (reference Main.java:134-216,385-503):
    6-table join tree + credit subpipeline + all scalar transforms,
    over GCD-shaped tables derived from the fixtures.
    """
    return QUERIES["gcd_snapshot"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible operators -> driver does rows-only check)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
