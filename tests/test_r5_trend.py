"""Semantic tests for events_entropy_per_user, trend_mom_revenue and
dim_calendar_generate."""

from __future__ import annotations

import math

from tests.conftest import SF_SMOKE


def test_entropy_bounds(spark):
    """0 <= H <= ln(n_types) (+1 micro slack per term from the
    per-term half-up quantization)."""
    from gcd_etl_spark.plans.analytics import events_entropy_per_user

    rows = events_entropy_per_user(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["entropy_micro"] >= 0
        bound = math.log(r["n_types"]) * 1_000_000 + r["n_types"]
        assert r["entropy_micro"] <= bound
        if r["n_types"] == 1:
            assert r["entropy_micro"] == 0


def test_mom_chain_is_consistent(spark):
    from gcd_etl_spark.plans.analytics import trend_mom_revenue

    rows = sorted(trend_mom_revenue(spark, SF_SMOKE).collect(), key=lambda r: r["ym"])
    assert rows[0]["prev_cents"] is None and rows[0]["mom_ppm"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur["prev_cents"] == prev["cents"]
        want = math.floor((cur["cents"] - prev["cents"]) / prev["cents"] * 1e6 + 0.5)
        assert cur["mom_ppm"] == want


def test_calendar_is_contiguous_and_dow_correct(spark):
    import datetime

    from gcd_etl_spark.plans.lakehouse import dim_calendar_generate

    rows = sorted(dim_calendar_generate(spark, SF_SMOKE).collect(), key=lambda r: r["day"])
    days = [r["day"] for r in rows]
    assert days == list(range(days[0], days[-1] + 1))
    for r in rows[:50]:
        d = datetime.date(1970, 1, 1) + datetime.timedelta(days=r["day"])
        assert r["ymd"] == d.year * 10000 + d.month * 100 + d.day
        assert r["dow"] == d.weekday()  # 0 = Monday, same convention
        assert r["is_weekend"] == (d.weekday() >= 5)
        assert r["quarter"] == (d.month + 2) // 3
