"""Round-10 second-wave registrants: the training-loader /
corpus-analysis gap-fillers (deterministic epoch shuffle, bigram-LM
scoring, temperature mixing, Zipf fit, bitext margin mining).

Each carries a full value-hash oracle in the registry; these tests
re-run the driver comparator at smoke scale plus the invariants the
per-row comparison implies but is worth stating directly.
"""

from __future__ import annotations

import pytest

from gcd_etl_spark.plans import QUERIES
from tests.conftest import assert_matches_oracle

_NEW = [
    "corpus_shuffle_shards",
    "quality_bigram_nll",
    "sample_temperature_mix",
    "stat_zipf_fit",
    "sim_bitext_margin",
    "sim_bitext_margin_shortlist",
]


@pytest.mark.parametrize("name", _NEW)
def test_round10b_queries_match_oracle(spark, sf_smoke, name):
    q = QUERIES[name]
    assert_matches_oracle(q.build(spark, sf_smoke), q.oracle, sf_smoke, name=name)


def test_shuffle_shards_is_a_permutation(spark, sf_smoke):
    """The epoch shuffle must be a permutation, not a sample: every
    document appears exactly once, and within each shard positions
    are exactly 1..n_shard (contiguous — a loader can stream a shard
    file sequentially and trust pos as the global tiebreak-free
    order)."""
    rows = QUERIES["corpus_shuffle_shards"].build(spark, sf_smoke).collect()
    n_docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_shuffle_shards_not_id_ordered(spark, sf_smoke):
    """The hash order must actually shuffle: within at least one
    shard, position order must disagree with doc_id order (a broken
    hash that preserves id order would still pass the permutation
    test)."""
    rows = QUERIES["corpus_shuffle_shards"].build(spark, sf_smoke).collect()
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["doc_id"]))
    scrambled = 0
    for poss in by_shard.values():
        ids_in_pos_order = [d for _, d in sorted(poss)]
        if ids_in_pos_order != sorted(ids_in_pos_order):
            scrambled += 1
    assert scrambled > 0


def test_bigram_nll_counts_align_with_token_stream(spark, sf_smoke):
    """n_bigrams per doc = n_tokens - 1 (every adjacent pair scored,
    nothing dropped by the cost join — Laplace smoothing means every
    observed bigram has a cost row)."""
    import pyspark.sql.functions as F

    nll = QUERIES["quality_bigram_nll"].build(spark, sf_smoke)
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
    counts = docs.select("doc_id", F.size(toks).alias("n_tokens"))
    joined = nll.join(counts, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["n_bigrams"] == r["n_tokens"] - 1, r


def test_temperature_mix_upweights_low_resource(spark, sf_smoke):
    """The whole point of alpha=0.5: the keep FRACTION (quota/n_s)
    must be non-increasing as source size grows — small sources are
    sampled proportionally harder than big ones. Also every source
    keeps at most its quota and the quota is positive for every
    non-empty source (no source starves)."""
    rows = QUERIES["sample_temperature_mix"].build(spark, sf_smoke).collect()
    per_src = {}
    for r in rows:
        n_kept, n_s, quota = per_src.get(r["source"], (0, r["n_source"], r["quota"]))
        per_src[r["source"]] = (n_kept + 1, r["n_source"], r["quota"])
    assert per_src
    fracs = []
    for src, (n_kept, n_s, quota) in per_src.items():
        assert n_kept <= quota, src
        assert quota >= 1, src
        fracs.append((n_s, quota / n_s))
    fracs.sort()
    for (n1, f1), (n2, f2) in zip(fracs, fracs[1:]):
        if n1 < n2:  # strictly bigger source -> no bigger keep share
            assert f2 <= f1 + 1e-9, (n1, f1, n2, f2)


def test_zipf_slope_negative(spark, sf_smoke):
    """Any natural-ish corpus has a falling rank-frequency curve; a
    non-negative slope would mean the fit ran on garbage (e.g. rank
    and count decoupled by a bad window order)."""
    row = QUERIES["stat_zipf_fit"].build(spark, sf_smoke).collect()
    assert len(row) == 1
    assert row[0]["n_vocab"] > 1
    assert row[0]["slope_ppm"] < 0


def test_bitext_anchor_guarded(spark, sf_smoke, monkeypatch):
    """sim_bitext_margin is the exact-scoring anchor: beyond the pair
    ceiling it must refuse at build time and name the IVF shortlist
    path (the sim_embedding_neardup / dedup_clusters guard
    discipline)."""
    from gcd_etl_spark.plans import similarity as sim_plans

    monkeypatch.setattr(sim_plans, "BITEXT_ANCHOR_MAX_PAIRS", 10)
    with pytest.raises(ValueError, match="sim_bitext_margin_shortlist"):
        QUERIES["sim_bitext_margin"].build(spark, sf_smoke)


def test_bitext_margin_beats_plain_cosine_on_hubs(spark, sf_smoke):
    """Structural property of ratio-margin mining: the accepted
    pair's margin ranking need not equal the cosine ranking — when
    the two disagree for some source, the miner preferred the LESS
    hub-like target. Assert the mined mapping is one-to-at-most-one
    per source and every accepted margin clears the threshold."""
    from gcd_etl_spark.plans.similarity import BITEXT_MARGIN_MIN_PPM

    rows = QUERIES["sim_bitext_margin"].build(spark, sf_smoke).collect()
    assert rows, "fixture mined no pairs — threshold is vacuous here"
    srcs = [r["src_id"] for r in rows]
    assert len(srcs) == len(set(srcs))
    for r in rows:
        assert r["margin_ppm"] >= BITEXT_MARGIN_MIN_PPM
