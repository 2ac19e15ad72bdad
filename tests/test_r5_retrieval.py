"""Semantic tests for corpus_mix_sampling, events_sessionize_ids and
rank_fusion_rrf beyond the differential gate in test_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_mix_sampling_hits_quota_exactly_and_is_stable(spark):
    from gcd_etl_spark.plans.corpus import (
        MIX_PPM_EVEN,
        MIX_PPM_ODD,
        corpus_mix_sampling,
    )
    from gcd_etl_spark.sources.catalog import read_table

    out = corpus_mix_sampling(spark, SF_SMOKE).collect()
    n_per_source = {
        r["source"]: r["n"]
        for r in read_table(spark, SF_SMOKE, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept: dict[str, int] = {}
    for r in out:
        kept[r["source"]] = kept.get(r["source"], 0) + 1
        assert r["rk"] <= r["quota"]
    for src, n in n_per_source.items():
        ppm = MIX_PPM_EVEN if int(src[3:]) % 2 == 0 else MIX_PPM_ODD
        assert kept.get(src, 0) == n * ppm // 1_000_000, src
    # determinism: a second build selects the identical doc set
    again = {r["doc_id"] for r in corpus_mix_sampling(spark, SF_SMOKE).collect()}
    assert again == {r["doc_id"] for r in out}


def test_sessionize_ids_respects_gap_rule(spark):
    from gcd_etl_spark.plans.sequential import SESSION_GAP_US, events_sessionize_ids
    from gcd_etl_spark.sources.catalog import read_table

    out = events_sessionize_ids(spark, SF_SMOKE).collect()
    times = {
        r["event_id"]: r["us"]
        for r in read_table(spark, SF_SMOKE, "events")
        .select("event_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    n_rows = 0
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (times[r["event_id"]], r["event_id"]))
        n_rows += len(rows)
        prev = None
        for r in rows:
            us = times[r["event_id"]]
            if prev is not None:
                gap_break = us - prev[0] > SESSION_GAP_US
                if gap_break:
                    assert r["session_seq"] == prev[1] + 1 and r["pos_in_session"] == 1
                else:
                    assert r["session_seq"] == prev[1]
                    assert r["pos_in_session"] == prev[2] + 1
            else:
                assert r["session_seq"] == 1 and r["pos_in_session"] == 1
            # session_start is the us of the session's first event
            if r["pos_in_session"] == 1:
                assert r["session_start_us"] == us
            prev = (us, r["session_seq"], r["pos_in_session"])
    assert n_rows == len(times)


def test_rrf_fuses_both_legs(spark):
    from gcd_etl_spark.plans.analytics import RRF_K, rank_fusion_rrf

    rows = rank_fusion_rrf(spark, SF_SMOKE).collect()
    assert rows, "fusion produced no candidates"
    for r in rows:
        expect = 0
        if r["bm25_rank"] is not None:
            expect += 1_000_000 // (RRF_K + r["bm25_rank"])
        if r["dot_rank"] is not None:
            expect += 1_000_000 // (RRF_K + r["dot_rank"])
        assert r["rrf_ppm"] == expect
        assert r["bm25_rank"] is not None or r["dot_rank"] is not None
    # fused_rank is a permutation of 1..n, ordered by (rrf DESC, doc)
    ranks = sorted(r["fused_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    both = [r for r in rows if r["bm25_rank"] is not None and r["dot_rank"] is not None]
    top = min(rows, key=lambda r: r["fused_rank"])
    assert top["rrf_ppm"] == max(r["rrf_ppm"] for r in rows)
