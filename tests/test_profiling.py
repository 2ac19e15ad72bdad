"""Differential + shape tests for plans/profiling.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcd_etl_spark.plans import QUERIES
from tests.conftest import assert_matches_oracle


def test_profile_columns_matches_oracle(spark, sf_smoke):
    q = QUERIES["profile_columns"]
    assert_matches_oracle(q.build(spark, sf_smoke), q.oracle, sf_smoke, name=q.name)


def test_profile_columns_single_scan(spark, sf_smoke):
    """The profiler must stay one scan + one aggregate regardless of
    how many columns it profiles."""
    plan = QUERIES["profile_columns"].build(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") + plan.count("Scan parquet") <= 2  # scan appears once (naming varies)


def test_scd2_history_matches_oracle(spark, sf_smoke):
    q = QUERIES["scd2_history"]
    assert_matches_oracle(q.build(spark, sf_smoke), q.oracle, sf_smoke, name=q.name)


def test_scd2_intervals_partition_time(spark, sf_smoke):
    """Per user: intervals are half-open, chained (valid_to == next
    valid_from), versions dense from 1, exactly one current row."""
    df = QUERIES["scd2_history"].build(spark, sf_smoke)
    bad_chain = (
        df.where(F.col("valid_to_us").isNotNull())
        .alias("a")
        .join(
            df.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.version") + 1 == F.col("b.version")),
            "left",
        )
        .where(
            F.col("b.version").isNull()
            | (F.col("a.valid_to_us") != F.col("b.valid_from_us"))
        )
        .count()
    )
    assert bad_chain == 0
    per_user = df.groupBy("user_id").agg(
        F.sum("is_current").alias("n_current"),
        F.count(F.lit(1)).alias("n"),
        F.max("version").alias("vmax"),
    )
    assert per_user.where((F.col("n_current") != 1) | (F.col("vmax") != F.col("n"))).count() == 0
