"""Semantic tests for similarity search: ANN recall vs the exact
brute-force baseline on the fixture embeddings (500 x 64-dim)."""

from __future__ import annotations

import pytest

from gcd_etl_spark.operators import similarity as S
from gcd_etl_spark.sources.catalog import read_table
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    return read_table(spark, sf_smoke, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 5)


@pytest.fixture(scope="module")
def exact_topk(emb, queries):
    out = S.brute_force_topk(emb, queries, k=10)
    return {(r["query_id"], r["neighbor_id"]) for r in out.collect()}


def test_brute_force_shape(emb, queries, exact_topk):
    assert len(exact_topk) == 50  # 5 queries x 10 neighbors
    assert all(q != n for q, n in exact_topk)


def test_lsh_recall(emb, queries, exact_topk):
    planes = S.make_planes(dim=64, n_planes=32)
    ann = S.lsh_topk(emb, queries, planes, n_tables=8, k=10)
    got = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    recall = len(got & exact_topk) / len(exact_topk)
    # deterministic data + planes -> fixed recall; require a sane floor
    assert recall >= 0.3, f"LSH recall too low: {recall}"


def test_ivf_recall(emb, queries, exact_topk):
    ann = S.ivf_topk(emb, queries, n_cells=16, nprobe=4, k=10)
    got = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    recall = len(got & exact_topk) / len(exact_topk)
    assert recall >= 0.3, f"IVF recall too low: {recall}"


def test_ann_cosines_are_exact(emb, queries, exact_topk):
    """ANN never invents scores: any (q, n) it returns carries the
    same cosine brute force computes for that pair."""
    planes = S.make_planes(dim=64, n_planes=32)
    ann = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in S.lsh_topk(emb, queries, planes, n_tables=8, k=10).collect()
    }
    exact_all = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in S.brute_force_topk(emb, queries, k=500).collect()
    }
    for pair, cos in ann.items():
        assert abs(exact_all[pair] - cos) < 1e-9


def test_blas_neardup_matches_anchor(spark, sf_smoke, emb):
    """The BLAS block path finds exactly the anchor's pairs (modulo
    pairs sitting within FP noise of the threshold)."""
    from gcd_etl_spark.plans.similarity import NEARDUP_THRESHOLD, sim_embedding_neardup

    anchor = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in sim_embedding_neardup(spark, sf_smoke).collect()
    }
    blas = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in S.neardup_pairs_blas(emb, threshold=NEARDUP_THRESHOLD).collect()
    }
    for pair in set(anchor) ^ set(blas):
        cos = anchor.get(pair, blas.get(pair))
        assert abs(cos - NEARDUP_THRESHOLD) < 1e-6, f"non-boundary disagreement: {pair} {cos}"
    for pair in set(anchor) & set(blas):
        assert abs(anchor[pair] - blas[pair]) < 1e-6
