"""Bloom semi-join reduction (operators/bloom.py): no false
negatives ever, false positives within the configured bound, and the
pruned join equals the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcd_etl_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_reduce,
)


def test_no_false_negatives(spark):
    keys = spark.range(0, 5000).select((F.col("id") * 7 + 3).alias("k"))
    words = bloom_build(keys, "k", n_bits=1 << 16)
    missing = keys.where(~bloom_might_contain(words, "k")).count()
    assert missing == 0


def test_false_positive_rate_bounded(spark):
    members = spark.range(0, 2000).select(F.col("id").alias("k"))
    words = bloom_build(members, "k", n_bits=1 << 16)  # ~32 bits/key
    probes = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = probes.where(bloom_might_contain(words, "k")).count()
    assert fp / 20_000 < 0.02  # well under theory bound for 32 bits/key, k=3


def test_pruned_join_equals_plain_join(spark):
    fact = spark.range(0, 20_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 100).select((F.col("id") * 13).alias("k"))
    plain = fact.join(dim, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    pruned = bloom_semi_reduce(fact, dim, "k", "k", n_bits=1 << 12)
    got = pruned.join(dim, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    assert (got["n"], got["s"]) == (plain["n"], plain["s"])
