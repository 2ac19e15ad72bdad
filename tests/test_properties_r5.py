"""Property tests for round-5 operator cores against sequential
Python models (the funnel-fold precedent, tests/test_analytics.py):
pack bucketing, CMS estimation, and chunk tiling are each checked on
randomized synthetic frames, independent of the fixtures and of
DuckDB."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F


def _portable60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_pack_bucketing_matches_sequential_model(spark):
    """floor(prior_cumsum / budget) equals a sequential per-shard
    walk that opens a new pack when the budget is already full."""
    from pyspark.sql import Window

    rng = random.Random(7)
    budget = 50
    rows = [(i, i % 4, rng.randint(0, 30)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n_tokens long")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        (r["doc_id"], r["pack"])
        for r in df.select(
            "doc_id",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget
            ).cast("long").alias("pack"),
        ).collect()
    }
    expected = set()
    by_shard: dict[int, list] = {}
    for doc_id, shard, n in rows:
        by_shard.setdefault(shard, []).append((doc_id, n))
    for shard, docs in by_shard.items():
        cum = 0
        for doc_id, n in sorted(docs):
            expected.add((doc_id, cum // budget))
            cum += n
    assert got == expected


def test_cms_estimate_matches_python_model(spark):
    """The Spark CMS (3 md5-seeded rows x 64 buckets) returns exactly
    the Python-model estimate min_j(counts[j][h_j(key)]) for every
    key, and the estimate dominates the exact count."""
    from gcd_etl_spark.operators.dedup import portable_hash64
    from gcd_etl_spark.plans.quality import CMS_SEEDS, CMS_WIDTH

    rng = random.Random(11)
    keys = [rng.randint(0, 40) for _ in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")

    hashed = df.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_id"),
                        F.pmod(
                            portable_hash64(
                                F.concat(F.lit(f"{seed}:"), F.col("user_id").cast("string"))
                            ),
                            F.lit(CMS_WIDTH),
                        ).alias("bucket"),
                    )
                    for j, seed in enumerate(CMS_SEEDS)
                ]
            )
        ).alias("h"),
    ).select("user_id", "h.row_id", "h.bucket")
    cms = hashed.groupBy("row_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    est = (
        hashed.distinct()
        .join(F.broadcast(cms), ["row_id", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est"))
    )
    got = {r["user_id"]: r["est"] for r in est.collect()}

    # sequential model
    counts = [[0] * CMS_WIDTH for _ in CMS_SEEDS]
    for k in keys:
        for j, seed in enumerate(CMS_SEEDS):
            counts[j][_portable60(f"{seed}:{k}") % CMS_WIDTH] += 1
    exact: dict[int, int] = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
    for k, n in exact.items():
        model = min(
            counts[j][_portable60(f"{seed}:{k}") % CMS_WIDTH]
            for j, seed in enumerate(CMS_SEEDS)
        )
        assert got[k] == model
        assert got[k] >= n


def test_chunk_tiling_matches_sequential_model(spark):
    """sequence+slice chunking equals the sequential tiler for
    random token counts, including the under-one-chunk and
    empty-document edges."""
    from gcd_etl_spark.plans.corpus import CHUNK_SIZE, CHUNK_STRIDE

    rng = random.Random(13)
    docs = [(i, " ".join(f"t{j}" for j in range(rng.choice([0, 1, 5, 95, 96, 97, 127, 128, 129, 200, 400])))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
    d = df.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    starts = F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(CHUNK_STRIDE))
    s = d.select("doc_id", "toks", "n", F.explode(starts).alias("start")).where(
        F.col("start") < F.col("n")
    )
    got = {
        (r["doc_id"], r["start"], r["k"])
        for r in s.select(
            "doc_id", "start", F.size(F.slice("toks", F.col("start") + 1, CHUNK_SIZE)).alias("k")
        ).collect()
    }
    expected = set()
    for doc_id, text in docs:
        n = len(text.split()) if text else 0
        start = 0
        while start < n:
            expected.add((doc_id, start, min(CHUNK_SIZE, n - start)))
            start += CHUNK_STRIDE
    assert got == expected
