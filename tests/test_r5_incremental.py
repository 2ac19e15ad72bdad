"""Semantic test for gcd_snapshot_incremental: the partitioned
rebuild reproduces the full build exactly, and the partitions are
disjoint and complete."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_incremental_equals_full_build(spark):
    from gcd_etl_spark.plans.gcd import (
        INCR_CHANGED,
        INCR_MOD,
        build_flagship,
        gcd_snapshot_incremental,
    )

    incr = gcd_snapshot_incremental(spark, SF_SMOKE)
    full = build_flagship(spark, SF_SMOKE)
    assert incr.count() == full.count()
    # the two partitions are disjoint on the issue key and complete
    ids_incr = {r["issue_id"] for r in incr.select("issue_id").distinct().collect()}
    ids_full = {r["issue_id"] for r in full.select("issue_id").distinct().collect()}
    assert ids_incr == ids_full
    changed = {i for i in ids_full if i % INCR_MOD < INCR_CHANGED}
    assert changed and changed != ids_full  # both partitions non-empty
    # row-level equality on a scalar projection (arrays already
    # covered by the shared driver oracle)
    cols = ["issue_id", "story_id", "series_name", "publisher_name"]
    a = {tuple(r) for r in incr.select(*cols).collect()}
    b = {tuple(r) for r in full.select(*cols).collect()}
    assert a == b
