"""Round-14 pins (optimization round 2): the hardening items from the
round-13 verdict/advice must hold.

* verdict item 6 — the expression-construction memo is BOUNDED: a
  driver cycling run-dates/datasets must not grow it without eviction,
  and a gateway change sweeps the dead entries.
* verdict item 7 — staged-index name resolution refuses RULE drift: a
  width-rule change over unchanged data re-stages instead of silently
  resolving to the stale staged width.
* advice r13 — an undersized caller-supplied training sample falls
  back to a fresh collect instead of silently training on fewer rows;
  a legitimately-short sample from a small corpus does NOT re-collect.
* advice r13 — the connected-components decimal-sum convergence probe
  fails loudly when the sum goes NULL on a non-empty frame.
"""

from __future__ import annotations

import numpy as np
import pytest

from gcd_etl_spark.functions import exprcache
from gcd_etl_spark.operators.similarity import (
    PQ_TRAIN_SAMPLE,
    TrainSample,
    _sample_covers,
    pq_train_codebooks,
    train_coarse_centroids,
    train_sample,
)


def _emb_frame(spark, n=40, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    rows = [(int(i), [float(x) for x in rng.randn(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# ---------------------------------------------------- exprcache bound
def test_exprcache_is_lru_bounded(spark):
    exprcache._CACHE.clear()
    calls = []
    for i in range(exprcache._MAX_ENTRIES + 100):
        exprcache.cached(("round14-bound-test", i), lambda i=i: calls.append(i))
    assert len(exprcache._CACHE) <= exprcache._MAX_ENTRIES
    # LRU: the newest keys survive, the oldest were evicted
    gw_keys = {k[1:] for k in exprcache._CACHE}
    assert ("round14-bound-test", exprcache._MAX_ENTRIES + 99) in gw_keys
    assert ("round14-bound-test", 0) not in gw_keys
    exprcache._CACHE.clear()


def test_exprcache_hit_returns_memo_and_refreshes(spark):
    exprcache._CACHE.clear()
    a = exprcache.cached(("round14-hit", 1), lambda: object())
    b = exprcache.cached(("round14-hit", 1), lambda: object())
    assert a is b
    exprcache._CACHE.clear()


def test_exprcache_sweeps_dead_gateway_entries(spark):
    exprcache._CACHE.clear()
    # forge an entry under a dead gateway id, then force a "gateway
    # changed" sweep by faking the last-seen gateway
    exprcache._CACHE[("dead-gateway", "round14-sweep", 1)] = "stale"
    exprcache._last_gateway[0] = "dead-gateway"
    exprcache.cached(("round14-sweep", 2), lambda: "fresh")
    assert ("dead-gateway", "round14-sweep", 1) not in exprcache._CACHE
    exprcache._CACHE.clear()


# ------------------------------------- staged-index rule-drift guard
def test_resolve_staged_cells_refuses_rule_drift(spark, tmp_path):
    from gcd_etl_spark.operators import similarity as S
    from gcd_etl_spark.plans import similarity as P

    name_prefix = "r14_rule_drift_idx_deadbeef_"
    n_rows = 500
    n_cells = S.suggest_ivf_cells(n_rows)
    name = f"{name_prefix}c{n_cells}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.range(3).write.mode("overwrite").saveAsTable(name)
    try:
        # unstamped table: resolution must NOT trust the bare name
        assert (
            P._resolve_staged_cells(spark, name_prefix, S.suggest_ivf_cells)
            is None
        )
        P._stamp_staged_rows(spark, name, n_rows)
        assert P._staged_rows_prop(spark, name) == n_rows
        # stamped + unchanged rule: resolves without any data job
        assert (
            P._resolve_staged_cells(spark, name_prefix, S.suggest_ivf_cells)
            == n_cells
        )
        # stamped + DRIFTED rule (floor bump): the stale width must be
        # refused, sending the caller down the count-and-restage path
        bumped = lambda n: S.suggest_ivf_cells(n, floor=4 * n_cells)  # noqa: E731
        assert bumped(n_rows) != n_cells
        assert P._resolve_staged_cells(spark, name_prefix, bumped) is None
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_ensure_ivfpq_index_restages_on_rule_drift(spark, monkeypatch):
    """End-to-end: after staging under the current rule, a bumped
    width rule must re-stage under the new name (not reuse stale)."""
    from gcd_etl_spark.operators import similarity as S
    from gcd_etl_spark.plans import similarity as P
    from gcd_etl_spark.sources.catalog import read_table_spread

    sf_dir = "/root/testdata/sf0.001"
    emb = read_table_spread(spark, sf_dir, "embeddings")
    _codes, cents, _books = P.ensure_ivfpq_index(spark, sf_dir, emb)
    base_cells = len(cents)

    bumped = 2 * base_cells
    monkeypatch.setattr(S, "suggest_ivf_cells", lambda n, floor=16: bumped)
    try:
        _codes2, cents2, _ = P.ensure_ivfpq_index(spark, sf_dir, emb)
        assert len(cents2) == bumped  # re-trained at the new width
        rows = [
            r["tableName"]
            for r in spark.sql(
                "SHOW TABLES LIKE 'ivfpq_*_sf0_001*'"
            ).collect()
        ]
        assert any(n.endswith(f"_c{bumped}") for n in rows)
    finally:
        # drop the drift-staged tables: the shared warehouse's serving
        # pins expect one width per fixture fingerprint
        for r in spark.sql("SHOW TABLES LIKE 'ivfpq_*_sf0_001*'").collect():
            if r["tableName"].endswith(f"_c{bumped}"):
                spark.sql(f"DROP TABLE IF EXISTS {r['tableName']}")


# ------------------------------------------- training-sample guard
def test_undersized_hand_sample_falls_back_to_fresh_collect(spark):
    emb = _emb_frame(spark, n=40)
    # a hand-built 2-row plain list is NOT a valid sample for 4 cells:
    # the guard must ignore it and train on the real lowest-id head
    short = train_sample(emb, 2)
    assert isinstance(short, TrainSample) and short.n_requested == 2
    c_guarded = train_coarse_centroids(
        emb, n_cells=4, dim=8, sample_rows=list(short)
    )
    c_plain = train_coarse_centroids(emb, n_cells=4, dim=8)
    assert np.array_equal(c_guarded, c_plain)
    # same for the PQ codebooks (PQ_TRAIN_SAMPLE head)
    cent = c_plain
    b_guarded = pq_train_codebooks(emb, cent, m=2, sample_rows=list(short))
    b_plain = pq_train_codebooks(emb, cent, m=2)
    assert np.array_equal(b_guarded, b_plain)


def test_legit_short_sample_from_small_corpus_is_trusted(spark):
    emb = _emb_frame(spark, n=10)  # corpus smaller than PQ_TRAIN_SAMPLE
    sample = train_sample(emb, max(PQ_TRAIN_SAMPLE, 4))
    assert len(sample) == 10 and sample.n_requested >= PQ_TRAIN_SAMPLE
    assert _sample_covers(sample, PQ_TRAIN_SAMPLE)  # no re-collect
    c = train_coarse_centroids(emb, n_cells=4, dim=8, sample_rows=sample)
    assert np.array_equal(c, train_coarse_centroids(emb, n_cells=4, dim=8))


def test_sample_covers_semantics():
    tagged = TrainSample([1, 2, 3])
    tagged.n_requested = 100
    assert _sample_covers(tagged, 50)  # collected with a big request
    assert _sample_covers([1, 2, 3], 3)  # long enough on its own
    assert not _sample_covers([1, 2, 3], 4)  # untagged short list


# --------------------------------- CC overflow loud-failure contract
def test_cc_null_sum_on_nonempty_raises(spark, monkeypatch):
    from pyspark.sql import functions as F

    from gcd_etl_spark.operators import dedup as D

    nodes = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    # simulate a decimal-overflow NULL sum by poisoning the round's
    # label union to all-NULL labels (Spark 4: patch the CONCRETE
    # DataFrame class — the pyspark.sql.DataFrame base is abstract)
    cls = type(nodes)
    real_union = cls.unionByName

    def poison(self, other, *a, **k):
        out = real_union(self, other, *a, **k)
        if "_nid" not in out.columns:
            return out
        return out.select("_nid", F.lit(None).cast("long").alias("label"))

    monkeypatch.setattr(cls, "unionByName", poison)
    with pytest.raises(RuntimeError, match="overflow"):
        D.connected_components(pairs, nodes)


# --------------------- gate semi-join prune (round-14 verdict item 1)
def test_gate_prune_value_identical_and_plan_pruned(spark, sf_smoke, tmp_path):
    """The thresholded candidate-id semi-join prune on the gate
    verify's corpus side (guide §3.2): with prune FORCED ON the
    production batch worker must emit byte-identical verdicts to the
    unpruned worker, and the pruned verify plan must show the corpus
    shingle projection ABOVE a LeftSemi join on the candidate ids
    (the O(corpus) per-batch feature compute becomes O(candidates))."""
    import pyspark.sql.functions as F

    from gcd_etl_spark.plans.dedup import DELTA_MOD, ensure_corpus_band_index
    from gcd_etl_spark.plans.streaming_plans import delta_dedup_batch_fn
    from gcd_etl_spark.sources.catalog import read_table_spread

    docs = read_table_spread(spark, sf_smoke, "documents")
    is_delta = F.col("doc_id") % DELTA_MOD == 0
    idx = ensure_corpus_band_index(spark, sf_smoke, docs.where(~is_delta))
    batch = docs.where(is_delta)

    out_plain = str(tmp_path / "plain")
    out_pruned = str(tmp_path / "pruned")
    delta_dedup_batch_fn(docs, idx, out_plain)(batch, 0)
    delta_dedup_batch_fn(docs, idx, out_pruned, prune=True)(batch, 0)

    rows = lambda p: sorted(  # noqa: E731
        map(tuple, spark.read.parquet(f"{p}/batch_id=0").collect())
    )
    assert rows(out_plain) == rows(out_pruned)
    assert rows(out_plain), "vacuous: the smoke fixture found no dups"

    # plan evidence: the pruned corpus side carries a LeftSemi join
    from gcd_etl_spark.operators import dedup as D

    cand = spark.createDataFrame([(2, 1)], "id_a long, id_b long")
    pruned_sets = D.shingle_sets(
        docs.join(
            F.broadcast(cand.select(F.col("id_b").alias("doc_id")).distinct()),
            "doc_id",
            "left_semi",
        )
    )
    verified = D.jaccard_pairs(
        docs, cand, threshold=0.5, sets_a=D.shingle_sets(batch), sets_b=pruned_sets
    )
    plan = verified._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan


def test_semantic_gate_prune_value_identical(spark, sf_smoke, tmp_path):
    """Same prune pin for the CAPPED semantic gate worker: forced-on
    prune emits byte-identical verdicts."""
    import pyspark.sql.functions as F

    from gcd_etl_spark.plans.dedup import DELTA_MOD, ensure_srp_bucket_index
    from gcd_etl_spark.plans.streaming_plans import semantic_gate_batch_fn_capped
    from gcd_etl_spark.sources.catalog import read_table_spread

    emb = read_table_spread(spark, sf_smoke, "embeddings")
    is_delta = F.col("vec_id") % DELTA_MOD == 0
    idx = ensure_srp_bucket_index(spark, sf_smoke, emb.where(~is_delta), capped=True)
    batch = emb.where(is_delta)

    out_plain = str(tmp_path / "plain")
    out_pruned = str(tmp_path / "pruned")
    semantic_gate_batch_fn_capped(spark, sf_smoke, idx, out_plain)(batch, 0)
    semantic_gate_batch_fn_capped(spark, sf_smoke, idx, out_pruned, prune=True)(
        batch, 0
    )
    rows = lambda p: sorted(  # noqa: E731
        map(tuple, spark.read.parquet(f"{p}/batch_id=0").collect())
    )
    assert rows(out_plain) == rows(out_pruned)


def test_gate_prune_threshold_off_at_fixture_scale():
    """The prune must NOT fire at fixture scale (it is a measured loss
    there — the threshold exists exactly so the bench's gate plans
    stay the measured optimum)."""
    from gcd_etl_spark.plans.streaming_plans import _gate_prune_corpus

    assert not _gate_prune_corpus("/root/testdata/sf0.1", "documents")
    assert not _gate_prune_corpus("/root/testdata/sf0.1", "embeddings")
