"""Semantic tests for the dedup operator family on planted
duplicates (the fixture corpus at sf0.001 has no near-dups)."""

from __future__ import annotations

import pytest

from gcd_etl_spark.operators import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the old oak tree "
    "near the quiet river bank under a pale morning sky"
)


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, "  " + BASE.upper() + "  "),  # exact dup after normalization
        (4, BASE.replace("lazy", "sleepy")),  # near dup (1 token)
        (5, BASE.replace("morning", "evening").replace("quick", "swift")),  # near dup (2 tokens)
        (6, "completely different text about spark shuffles and parquet row groups and file footers"),
        (7, "another unrelated document mentioning catalyst optimizer rules and adaptive query execution"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_exact_dedup_groups(planted):
    out = {r["keep_id"]: r["n_dups"] for r in D.exact_dedup(planted).collect()}
    assert out[1] == 3  # docs 1, 2, 3 collapse
    assert out[4] == 1 and out[5] == 1 and out[6] == 1 and out[7] == 1


def test_minhash_lsh_finds_near_dups(planted):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_dedup_pairs(planted, threshold=0.5).collect()
    }
    # exact dups always pair; near-dups 4 and 5 pair with the base cluster
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 4) in pairs and pairs[(1, 4)] >= 0.5
    assert (1, 5) in pairs and pairs[(1, 5)] >= 0.5
    # unrelated docs never pair with the cluster
    assert not any(6 in p or 7 in p for p in pairs)


def test_lsh_candidates_superset_of_verified(planted):
    cands = {
        (r["id_a"], r["id_b"]) for r in D.minhash_lsh_candidates(planted).collect()
    }
    verified = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_dedup_pairs(planted, threshold=0.5).collect()
    }
    assert verified <= cands


def test_simhash_near_dups(planted):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_dedup_pairs(planted, max_hamming=10).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0  # identical fingerprints
    # doc 3 is uppercased: simhash works on raw tokens, so it is NOT
    # a simhash near-dup (exact_dedup catches it via normalization)
    assert (1, 4) in pairs and pairs[(1, 4)] <= 10
    assert (6, 7) not in pairs


def test_jaccard_matches_manual(planted):
    cands = D.minhash_lsh_candidates(planted)
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.jaccard_pairs(planted, cands, threshold=0.0).collect()
    }
    if (1, 2) in out:
        assert out[(1, 2)] == 1.0


def test_portable_minhash_same_pair_quality(planted):
    """The portable (md5-based) hash family must find the same planted
    near-dups the xxhash64 family does — only the hash constants
    differ, not the pipeline."""
    fast = {(r["id_a"], r["id_b"]) for r in D.minhash_dedup_pairs(planted).collect()}
    port = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_dedup_pairs(planted, portable=True).collect()
    }
    # both must recover the exact-duplicate pair; verified pairs are
    # Jaccard-checked so any difference is only LSH recall noise
    assert (1, 2) in fast and (1, 2) in port
