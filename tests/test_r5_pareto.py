"""Semantic tests for ts_autocorr_lag1 and stat_pareto_coverage."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_autocorr_is_bounded_and_matches_model_for_one_user(spark):
    from gcd_etl_spark.plans.stats import ts_autocorr_lag1
    from gcd_etl_spark.sources.catalog import read_table

    got = {r["user_id"]: r for r in ts_autocorr_lag1(spark, SF_SMOKE).collect()}
    for r in got.values():
        assert -1_000_001 <= r["autocorr_micro"] <= 1_000_001
    rows = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"), "value")
        .collect()
    )
    series: dict[int, list] = {}
    for r in rows:
        series.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], math.floor(r["value"] * 1000 + 0.5))
        )
    uid, pts = sorted(series.items())[0]
    pts.sort()
    xs = [p[2] for p in pts]
    pairs = list(zip(xs, xs[1:]))
    n = float(len(pairs))
    sx = float(sum(a for a, _ in pairs))
    sy = float(sum(b for _, b in pairs))
    sxx = float(sum(a * a for a, _ in pairs))
    syy = float(sum(b * b for _, b in pairs))
    sxy = float(sum(a * b for a, b in pairs))
    want = math.floor(
        (n * sxy - sx * sy)
        / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        * 1_000_000
        + 0.5
    )
    assert got[uid]["n_pairs"] == len(pairs)
    assert got[uid]["autocorr_micro"] == want


def test_pareto_rank_is_the_minimal_covering_prefix(spark):
    from gcd_etl_spark.plans.stats import PARETO_PCT, stat_pareto_coverage
    from gcd_etl_spark.sources.catalog import read_table

    got = {r["seg"]: r for r in stat_pareto_coverage(spark, SF_SMOKE).collect()}
    o = read_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice").collect()
    c = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in read_table(spark, SF_SMOKE, "customer").collect()
    }
    per: dict[str, dict[int, int]] = {}
    for r in o:
        seg = c[r["o_custkey"]]
        per.setdefault(seg, {}).setdefault(r["o_custkey"], 0)
        per[seg][r["o_custkey"]] += round(r["o_totalprice"] * 100)
    col = f"top_customers_for_{PARETO_PCT}pct"
    for seg, cust in per.items():
        xs = sorted(cust.items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(v for _, v in cust.items())
        cum = 0
        k = None
        for i, (_, v) in enumerate(xs, start=1):
            cum += v
            if cum * 100 >= PARETO_PCT * total:
                k = i
                break
        row = got[seg]
        assert row[col] == k, seg
        # minimality: the prefix one shorter does NOT cover
        if k > 1:
            assert sum(v for _, v in xs[: k - 1]) * 100 < PARETO_PCT * total
