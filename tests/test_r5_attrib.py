"""Semantic tests for attribution_linear_touch and
dedup_exact_embeddings."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_linear_shares_sum_to_purchase_value_exactly(spark):
    """Largest-remainder splitting: per conversion, shares sum to the
    purchase's exact milli value — no unit created or lost."""
    from gcd_etl_spark.plans.analytics import attribution_linear_touch
    from gcd_etl_spark.sources.catalog import read_table

    out = attribution_linear_touch(spark, SF_SMOKE).collect()
    assert out
    values = {
        r["event_id"]: math.floor(r["value"] * 1000 + 0.5)
        for r in read_table(spark, SF_SMOKE, "events")
        .where("event_type = 'purchase'")
        .collect()
    }
    per_conv: dict[int, list] = {}
    for r in out:
        per_conv.setdefault(r["conv_id"], []).append(r)
    for conv, rows in per_conv.items():
        v = values[conv]
        assert sum(r["share_milli"] for r in rows) == v, conv
        n = rows[0]["n_touches"]
        assert len(rows) == n
        # shares differ by at most one unit; extras go to earliest rn
        lo, hi = v // n, v // n + (1 if v % n else 0)
        for r in rows:
            assert r["share_milli"] in (lo, hi)
            if r["rn"] <= v % n:
                assert r["share_milli"] == v // n + 1


def test_exact_embedding_dedup_counts(spark):
    from gcd_etl_spark.plans.dedup import dedup_exact_embeddings
    from gcd_etl_spark.sources.catalog import read_table

    rows = dedup_exact_embeddings(spark, SF_SMOKE).collect()
    n_vecs = read_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r["n_dups"] for r in rows) == n_vecs
    for r in rows:
        assert r["n_dups"] >= 1
