"""Semantic tests for agg_weighted_median, text_hashing_vectorizer,
events_rfm_segments and asof_join_nearest."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_weighted_median_matches_python_model(spark):
    from gcd_etl_spark.plans.quality import agg_weighted_median
    from gcd_etl_spark.sources.catalog import read_table

    got = {r["l_returnflag"]: r for r in agg_weighted_median(spark, SF_SMOKE).collect()}
    rows = (
        read_table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r["l_returnflag"], []).append(
            (round(r["l_extendedprice"] * 100), r["l_orderkey"], r["l_linenumber"], int(r["l_quantity"]))
        )
    for flag, pts in groups.items():
        pts.sort()
        tot = sum(p[3] for p in pts)
        cum = 0
        for cents, _, _, w in pts:
            cum += w
            if 2 * cum >= tot:
                assert got[flag]["wmedian_cents"] == cents, flag
                break
        assert got[flag]["total_weight"] == tot


def test_hashing_vectorizer_buckets_cover_all_tokens(spark):
    from gcd_etl_spark.plans.corpus import HASHVEC_BUCKETS, text_hashing_vectorizer

    rows = text_hashing_vectorizer(spark, SF_SMOKE).collect()
    assert all(0 <= r["bucket"] < HASHVEC_BUCKETS for r in rows)
    assert all(r["n_terms"] >= 1 for r in rows)
    # token mass conservation vs an independent count
    import re

    from gcd_etl_spark.sources.catalog import read_table

    docs = read_table(spark, SF_SMOKE, "documents").select("text").collect()
    n_tokens = sum(
        len([t for t in re.split(r"[^a-z0-9]+", d["text"].lower()) if t]) for d in docs
    )
    assert sum(r["total_count"] for r in rows) == n_tokens


def test_rfm_tiles_are_balanced_quintiles(spark):
    from gcd_etl_spark.plans.analytics import events_rfm_segments

    rows = events_rfm_segments(spark, SF_SMOKE).collect()
    n = len(rows)
    for col in ("r_tile", "f_tile", "m_tile"):
        counts: dict[int, int] = {}
        for r in rows:
            assert 1 <= r[col] <= 5
            counts[r[col]] = counts.get(r[col], 0) + 1
        # SQL NTILE: bucket sizes differ by at most one
        assert max(counts.values()) - min(counts.values()) <= 1, (col, counts)
    for r in rows:
        assert r["rfm"] == r["r_tile"] * 100 + r["f_tile"] * 10 + r["m_tile"]
    assert n == len({r["custkey"] for r in rows})


def test_nearest_join_picks_the_closer_side(spark):
    from gcd_etl_spark.plans.windows import asof_join_nearest

    rows = asof_join_nearest(spark, SF_SMOKE).collect()
    n_orders_with_events = 0
    for r in rows:
        if r["prev_us"] is not None:
            assert r["prev_us"] <= r["t_us"]
        if r["next_us"] is not None:
            assert r["next_us"] > r["t_us"]
        if r["nearest_us"] is None:
            assert r["prev_us"] is None and r["next_us"] is None
            continue
        n_orders_with_events += 1
        if r["prev_us"] is not None and r["next_us"] is not None:
            d_prev = r["t_us"] - r["prev_us"]
            d_next = r["next_us"] - r["t_us"]
            want = r["prev_us"] if d_prev <= d_next else r["next_us"]
            assert r["nearest_us"] == want
    assert n_orders_with_events > 0
