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


def test_profile_frame_approx_distinct_within_bounds(spark, sf_smoke):
    """The 100 TB profiler form (HLL++ NDVs, no Expand) agrees with
    exact NDVs within the sketch's error bound and leaves every other
    metric identical."""
    from gcd_etl_spark.plans.profiling import _PROFILE_COLS, profile_frame
    from gcd_etl_spark.sources.catalog import read_table

    docs = read_table(spark, sf_smoke, "documents")
    exact = {r["col_name"]: r for r in profile_frame(docs, _PROFILE_COLS).collect()}
    approx = {r["col_name"]: r for r in profile_frame(docs, _PROFILE_COLS, exact_distinct=False).collect()}
    for c in _PROFILE_COLS:
        e, a = exact[c], approx[c]
        assert (e["n_rows"], e["n_null"], e["min_val"], e["max_val"]) == (
            a["n_rows"], a["n_null"], a["min_val"], a["max_val"],
        )
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(2, 0.1 * e["n_distinct"])
    plan = profile_frame(docs, _PROFILE_COLS, exact_distinct=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


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
