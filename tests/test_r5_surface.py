"""Semantic tests for the round-5 surface operators: CSV/JSON source
round-trips, cogrouped applyInPandas, and the user feature matrix."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, assert_matches_oracle


def test_csv_and_json_roundtrips_match_oracle(spark):
    from gcd_etl_spark.plans import QUERIES

    for name in ("source_csv_roundtrip", "source_json_roundtrip"):
        q = QUERIES[name]
        assert_matches_oracle(q.build(spark, SF_SMOKE), q.oracle, SF_SMOKE, name=name)


def test_cogroup_covers_both_key_universes(spark):
    """Full-outer semantics: every user AND every customer key
    appears exactly once, including keys present on only one side."""
    from gcd_etl_spark.plans.udfsurface import cogroup_pandas_join
    from gcd_etl_spark.sources.catalog import read_table

    rows = {r["key"]: r for r in cogroup_pandas_join(spark, SF_SMOKE).collect()}
    users = {
        r[0] for r in read_table(spark, SF_SMOKE, "events").select("user_id").distinct().collect()
    }
    custs = {
        r[0] for r in read_table(spark, SF_SMOKE, "orders").select("o_custkey").distinct().collect()
    }
    assert set(rows) == users | custs
    only_orders = next(iter(custs - users), None)
    if only_orders is not None:
        r = rows[only_orders]
        assert r["n_events"] == 0 and r["value_milli"] == 0 and r["n_orders"] > 0


def test_feature_matrix_counts_partition_events(spark):
    from gcd_etl_spark.plans.relational import (
        FEATURE_EVENT_TYPES,
        pivot_user_features,
    )
    from gcd_etl_spark.sources.catalog import read_table

    rows = pivot_user_features(spark, SF_SMOKE).collect()
    total = read_table(spark, SF_SMOKE, "events").count()
    assert sum(sum(r[f"n_{t}"] for t in FEATURE_EVENT_TYPES) for r in rows) == total
    for r in rows:
        assert r["days_active"] >= 1
        assert r["value_milli"] > 0
