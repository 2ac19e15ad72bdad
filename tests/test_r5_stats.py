"""Semantic tests for the round-5 statistics operators
(stat_chi2_independence, ts_changepoint_cusum, ts_anomaly_mad)
beyond the registry-wide differential gate in test_parity.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_chi2_cells_cover_all_orders(spark):
    """Contingency counts partition the fact table; terms >= 0."""
    from gcd_etl_spark.plans.stats import stat_chi2_independence
    from gcd_etl_spark.sources.catalog import read_table

    cells = stat_chi2_independence(spark, SF_SMOKE).collect()
    n_orders = read_table(spark, SF_SMOKE, "orders").count()
    assert sum(r["n_obs"] for r in cells) == n_orders
    for r in cells:
        assert r["chi2_term_micro"] >= 0
        # every cell's totals are consistent: n_obs <= min(R, C)
        assert r["n_obs"] <= min(r["r_total"], r["c_total"])


def test_cusum_prefix_identity_matches_recurrence(spark):
    """The window-based prefix restatement must equal the literal
    sequential recurrence S_k = max(0, S_{k-1} + d_k) — recomputed
    driver-side for every user at sf0.001."""
    from gcd_etl_spark.plans.stats import CUSUM_H_MICRO, ts_changepoint_cusum
    from gcd_etl_spark.sources.catalog import read_table

    got = {r["user_id"]: r for r in ts_changepoint_cusum(spark, SF_SMOKE).collect()}
    rows = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"), "value")
        .collect()
    )
    series: dict[int, list[tuple[int, int, int]]] = {}
    for r in rows:
        x = math.floor(r["value"] * 1_000_000 + 0.5)
        series.setdefault(r["user_id"], []).append((r["us"], r["event_id"], x))
    for uid, pts in series.items():
        pts.sort()
        xs = [p[2] for p in pts]
        s_total, n = sum(xs), len(xs)
        ref = (s_total - ((s_total % n) + n) % n) // n
        s = 0
        mx = 0
        first = None
        alarms = 0
        for k, x in enumerate(xs, start=1):
            s = max(0, s + (x - ref))
            mx = max(mx, s)
            if s > CUSUM_H_MICRO:
                alarms += 1
                if first is None:
                    first = k
        row = got[uid]
        assert row["ref_micro"] == ref, uid
        assert row["max_cusum_micro"] == mx, uid
        assert row["first_alarm_seq"] == first, uid
        assert row["n_alarms"] == alarms, uid


def test_mad_flags_are_robust_to_a_single_spike(spark):
    """Sanity on the operator's defining property: medians/MADs are
    exact data values and every user row accounts for all events."""
    from gcd_etl_spark.plans.stats import ts_anomaly_mad
    from gcd_etl_spark.sources.catalog import read_table

    out = {r["user_id"]: r for r in ts_anomaly_mad(spark, SF_SMOKE).collect()}
    rows = (
        read_table(spark, SF_SMOKE, "events").select("user_id", "value").collect()
    )
    per_user: dict[int, list[int]] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            math.floor(r["value"] * 1_000_000 + 0.5)
        )
    for uid, xs in per_user.items():
        row = out[uid]
        assert row["n_events"] == len(xs)
        assert row["median_micro"] in xs  # selected FROM the data
        devs = sorted(abs(x - row["median_micro"]) for x in xs)
        assert row["mad_micro"] == devs[(len(devs) + 1) // 2 - 1]
        assert 0 <= row["n_outliers"] < len(xs)
