"""Semantic tests for sketch_distinct_kmv, window_time_weighted_avg
and dedup_semantic_srp beyond the differential gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_kmv_estimate_within_sketch_error(spark):
    """KMV relative error concentrates around 1/sqrt(k); assert a
    generous 4/sqrt(k) envelope, and exactness below k."""
    from gcd_etl_spark.plans.stats import KMV_DIST_K, sketch_distinct_kmv

    rows = sketch_distinct_kmv(spark, SF_SMOKE).collect()
    assert rows
    bound = 4.0 / math.sqrt(KMV_DIST_K)
    for r in rows:
        if r["kth_hash"] is None:  # group smaller than k -> exact
            assert r["est_distinct"] == r["n_exact"]
        else:
            rel = abs(r["est_distinct"] - r["n_exact"]) / r["n_exact"]
            assert rel <= bound, (r["event_type"], r["est_distinct"], r["n_exact"])


def test_twa_matches_sequential_model_per_user(spark):
    from gcd_etl_spark.plans.stats import window_time_weighted_avg
    from gcd_etl_spark.sources.catalog import read_table

    got = {r["user_id"]: r for r in window_time_weighted_avg(spark, SF_SMOKE).collect()}
    ev = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"), "value")
        .collect()
    )
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], math.floor(r["value"] * 1000 + 0.5))
        )
    for uid, pts in series.items():
        pts.sort()
        num = den = 0
        for (us, _, x), (nxt, _, _) in zip(pts, pts[1:]):
            dur = (nxt - us) // 1000
            num += x * dur
            den += dur
        if len(pts) < 2:
            assert uid not in got
            continue
        row = got[uid]
        assert row["n_intervals"] == len(pts) - 1
        assert row["total_ms"] == den
        assert row["twa_milli"] == num // den


def test_srp_pairs_are_truly_similar_and_subset_of_truth(spark):
    """Every emitted pair clears the cosine bar when recomputed in
    float; no emitted pair is missing from the exact pair set."""
    from gcd_etl_spark.plans.dedup import SRP_COS2, dedup_semantic_srp
    from gcd_etl_spark.sources.catalog import read_table

    out = dedup_semantic_srp(spark, SF_SMOKE).collect()
    assert out, "tuned threshold should emit pairs on this fixture"
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in read_table(spark, SF_SMOKE, "embeddings").collect()
    }
    thr = math.sqrt(SRP_COS2)
    for p in out:
        a, b = vecs[p["id_a"]], vecs[p["id_b"]]
        dot = sum(x * y for x, y in zip(a, b))
        cos = dot / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))
        # quantization moves cosine by <1e-5; allow that slack only
        assert cos >= thr - 1e-4, (p["id_a"], p["id_b"], cos)
        assert abs(cos * 1_000_000 - p["cos_ppm"]) <= 50, p
