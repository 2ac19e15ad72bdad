"""Explicit skew mitigation: key salting.

AQE's skew-join splitting (on by default in session.py) handles most
runtime skew; these utilities are for the cases you plan for up
front — a join key with known heavy hitters (the classic power-law
fact key) where you want the shuffle keys uniform by construction,
or an aggregation whose per-key state is itself large.

Salting is a *rewrite*, not a new operator: results must equal the
unsalted plan exactly — which is why the query registry runs the
salted join against the plain-SQL oracle (plans/relational.py
``skew_salted_join``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_from: str | Column,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side's shuffle key salted.

    ``skewed`` rows get a deterministic salt from ``salt_from`` (any
    column that varies within a key group — e.g. the fact PK), so one
    hot key spreads over ``buckets`` shuffle partitions; ``other`` is
    replicated once per salt value (size x buckets — keep it the
    smaller side). Join keys become (key, salt); the output drops the
    salt and equals the unsalted join exactly.
    """
    salt_col = salt_from if isinstance(salt_from, Column) else F.col(salt_from)
    left = skewed.withColumn("_salt", F.pmod(F.xxhash64(salt_col), F.lit(buckets)).cast("int"))
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return left.join(right, [key, "_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame, key: str, value: str, buckets: int = 16
) -> DataFrame:
    """Per-key exact distinct count via two-phase salted aggregation.

    ``count_distinct`` keeps all distinct values of a key in one
    task's hash set; for a hot key that state is the skew. Phase 1
    dedups (key, salt-of-value) partitions — each task holds only its
    salt slice of the hot key's values; phase 2 sums slice counts.
    Output: (key, n_distinct), equal to the direct computation.
    """
    phase1 = (
        df.select(F.col(key), F.col(value))
        .withColumn("_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(buckets)))
        .groupBy(key, "_salt")
        .agg(F.count_distinct(F.col(value)).alias("_n"))
    )
    return phase1.groupBy(key).agg(F.sum("_n").cast("long").alias("n_distinct"))
