"""Semantic tests for dq_sequence_gaps and events_cohort_ltv."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_gaps_match_python_model(spark):
    from gcd_etl_spark.plans.quality import dq_sequence_gaps
    from gcd_etl_spark.sources.catalog import read_table

    got: dict[int, list] = {}
    for r in dq_sequence_gaps(spark, SF_SMOKE).collect():
        got.setdefault(r["user_id"], []).append(
            (r["gap_start_day"], r["gap_end_day"], r["n_missing_days"])
        )
    days: dict[int, set] = {}
    for r in (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id", F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .collect()
    ):
        days.setdefault(r["user_id"], set()).add(r["day"])
    for uid, ds in days.items():
        sd = sorted(ds)
        want = [
            (a + 1, b - 1, b - a - 1)
            for a, b in zip(sd, sd[1:])
            if b - a > 1
        ]
        assert sorted(got.get(uid, [])) == sorted(want), uid


def test_ltv_curve_is_monotone_and_totals_match(spark):
    from gcd_etl_spark.plans.analytics import events_cohort_ltv
    from gcd_etl_spark.sources.catalog import read_table

    rows = events_cohort_ltv(spark, SF_SMOKE).collect()
    assert rows
    per_cohort: dict[int, list] = {}
    for r in rows:
        per_cohort.setdefault(r["cohort_week"], []).append(r)
    total_rev = 0
    for cohort, rs in per_cohort.items():
        rs.sort(key=lambda r: r["age_weeks"])
        cums = [r["cum_rev_milli"] for r in rs]
        assert cums == sorted(cums)  # LTV curves never decrease
        total_rev += cums[-1]
    want = (
        read_table(spark, SF_SMOKE, "events")
        .where("event_type = 'purchase'")
        .select(F.sum(F.floor(F.col("value") * 1000 + 0.5).cast("long")))
        .first()[0]
    )
    assert total_rev == want  # every purchase lands in exactly one cohort
