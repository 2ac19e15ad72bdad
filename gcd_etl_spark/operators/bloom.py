"""Bloom-filter semi-join reduction — prune a fact scan by a dim's
key set without shuffling the fact or broadcasting the dim rows.

The scale problem this solves: ``fact ⋈ dim`` where the dim side is
too large to broadcast-join but its KEY SET still fits a few hundred
KB of bloom bits. A ``left_semi`` pre-join would shuffle the whole
fact; broadcasting dim rows is off the table; a bloom filter built
distributedly (one ``groupBy(word).bit_or`` over k positions per key)
and shipped as a single array literal lets the fact side drop
non-joining rows INSIDE its scan stage — before the join shuffle —
at the cost of a configurable false-positive rate that the join
itself then removes. This is the hand-rolled equivalent of Spark's
AQE runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter.*),
exposed as an explicit operator so plans can apply it below any
shuffle regardless of the optimizer's size thresholds.

Spark's own InjectRuntimeFilter does the same rewrite when its
thresholds trigger (creation side < 10 MB, application scan > 10 GB);
this operator is the explicit form for when the planner can't see the
opportunity (e.g. the filter key is an expression, or creation
happens in another job entirely).

All hashing/membership is pure Column expressions (xxhash64 +
bit ops) — codegen'd, no UDF, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, n_bits: int, k: int) -> list[Column]:
    """k bit positions for a key: xxhash64(key, i) pmod n_bits."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits)).cast("long") for i in range(k)
    ]


def bloom_build(df: DataFrame, key: str | Column, n_bits: int, k: int = 3) -> list[int]:
    """Build the filter distributedly; return the bit words (list of
    longs, ``n_bits/64`` entries — e.g. 1M bits = 128 KB).

    Plan: explode k positions per key -> groupBy(word) bit_or of the
    position masks -> collect only the non-zero words. The shuffle key
    is the word index (near-uniform, tiny domain); nothing about the
    input's own partitioning matters. The returned words are plain
    Python ints, shippable to any later job as one array literal.
    """
    if n_bits % 64 != 0:
        raise ValueError("n_bits must be a multiple of 64")
    c = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions(c, n_bits, k))).alias("_pos")
    words = (
        df.select(pos)
        .select(
            (F.col("_pos") / 64).cast("long").alias("_w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("_pos") % 64).cast("int")
            ).alias("_mask"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_mask").alias("_bits"))
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in words:
        out[r["_w"]] = r["_bits"]
    return out


def bloom_might_contain(
    words: list[int], key: str | Column, k: int = 3
) -> Column:
    """Membership Column: true iff every one of the key's k bits is
    set. False positives at the configured rate; NO false negatives.
    ``words`` ships as a single array<long> literal (one Literal node,
    not n_bits/64 expressions), so the test is fully codegen'd and
    sits below any join/shuffle it guards.
    """
    n_bits = len(words) * 64
    c = F.col(key) if isinstance(key, str) else key
    arr = F.lit(words)
    checks = []
    for p in _positions(c, n_bits, k):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        mask = F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int"))
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for chk in checks[1:]:
        out = out & chk
    return out


def bloom_semi_reduce(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Prune ``fact`` to rows whose key probably appears in ``dim``.

    A pure pre-filter: downstream joins see identical results (false
    positives survive the filter but not the join). Sizing: ~10 bits
    per distinct dim key gives ~1% false positives at k=3.
    """
    words = bloom_build(dim, dim_key, n_bits, k)
    return fact.where(bloom_might_contain(words, fact_key, k))
