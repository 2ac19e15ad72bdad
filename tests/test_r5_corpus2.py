"""Semantic tests for sketch_minhash_mergeable,
corpus_boilerplate_ngrams and ab_test_assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_minhash_merge_property_holds_for_every_doc(spark):
    """The monoid theorem must hold with zero exceptions — any false
    flag means partial aggregation of minhash would be WRONG."""
    from gcd_etl_spark.plans.dedup import sketch_minhash_mergeable

    rows = sketch_minhash_mergeable(spark, SF_SMOKE).collect()
    assert rows
    assert all(r["merged_matches"] for r in rows)
    for r in rows:
        assert 0 <= r["n_even"] <= r["n_shingles"]


def test_boilerplate_fraction_is_consistent(spark):
    import re

    from gcd_etl_spark.plans.corpus import (
        BOILER_DF_PCT,
        corpus_boilerplate_ngrams,
    )
    from gcd_etl_spark.sources.catalog import read_table

    got = {r["doc_id"]: r for r in corpus_boilerplate_ngrams(spark, SF_SMOKE).collect()}
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    tris: dict[int, list[str]] = {}
    for d in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", d["text"].lower()) if t]
        if len(toks) >= 3:
            tris[d["doc_id"]] = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    df: dict[str, set] = {}
    for did, ts in tris.items():
        for t in set(ts):
            df.setdefault(t, set()).add(did)
    n_docs = len(docs)
    boiler = {t for t, s in df.items() if len(s) * 100 >= BOILER_DF_PCT * n_docs}
    for did, ts in tris.items():
        row = got[did]
        b = sum(1 for t in ts if t in boiler)
        assert row["n_slots"] == len(ts)
        assert row["boiler_slots"] == b, did
        assert row["boiler_ppm"] == b * 1_000_000 // len(ts)


def test_ab_arms_partition_users_and_are_stable(spark):
    from gcd_etl_spark.plans.analytics import ab_test_assignment
    from gcd_etl_spark.sources.catalog import read_table

    rows = ab_test_assignment(spark, SF_SMOKE).collect()
    assert {r["arm"] for r in rows} <= {0, 1}
    total_events = sum(r["n_events"] for r in rows)
    assert total_events == read_table(spark, SF_SMOKE, "events").count()
    # stability: same arms on a rebuild
    again = ab_test_assignment(spark, SF_SMOKE).collect()
    key = lambda r: (r["arm"], r["event_type"])
    assert sorted(map(key, rows)) == sorted(map(key, again))
