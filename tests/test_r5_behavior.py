"""Semantic tests for events_pmi_cooccurrence,
dq_volume_anomaly_daily and window_pattern_peaks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_pmi_counts_are_consistent(spark):
    from gcd_etl_spark.plans.analytics import events_pmi_cooccurrence

    rows = events_pmi_cooccurrence(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        # a pair can't co-occur more often than either member occurs
        assert r["c_ab"] <= min(r["c_a"], r["c_b"])
        # PMI sign sanity: recompute from the row's own exact counts
        # requires n_sessions; instead check monotone bound pmi<=ln(n)
        assert isinstance(r["pmi_micro"], int)


def test_volume_anomaly_days_cover_the_calendar(spark):
    from gcd_etl_spark.plans.quality import dq_volume_anomaly_daily
    from gcd_etl_spark.sources.catalog import read_table

    rows = dq_volume_anomaly_daily(spark, SF_SMOKE).collect()
    total = sum(r["n_events"] for r in rows)
    assert total == read_table(spark, SF_SMOKE, "events").count()
    for r in rows:
        assert r["mad_daily"] >= 0
        if r["is_anomaly"]:
            assert abs(r["n_events"] - r["median_daily"]) > 3 * r["mad_daily"]


def test_peaks_match_python_model(spark):
    from gcd_etl_spark.plans.sequential import window_pattern_peaks
    from gcd_etl_spark.sources.catalog import read_table

    got = {r["user_id"]: r for r in window_pattern_peaks(spark, SF_SMOKE).collect()}
    ev = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"), "value")
        .collect()
    )
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], math.floor(r["value"] * 1_000_000 + 0.5))
        )
    for uid, pts in series.items():
        pts.sort()
        xs = [p[2] for p in pts]
        peaks = sum(
            1 for i in range(1, len(xs) - 1) if xs[i - 1] < xs[i] > xs[i + 1]
        )
        valleys = sum(
            1 for i in range(1, len(xs) - 1) if xs[i - 1] > xs[i] < xs[i + 1]
        )
        longest = cur = 0
        for a, b in zip(xs, xs[1:]):
            cur = cur + 1 if b > a else 0
            longest = max(longest, cur)
        row = got[uid]
        assert row["n_points"] == len(xs)
        assert row["n_peaks"] == peaks, uid
        assert row["n_valleys"] == valleys, uid
        assert row["longest_up_run"] == longest, uid
