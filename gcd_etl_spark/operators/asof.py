"""As-of (temporal) join — a composition operator Spark lacks.

``asof_join`` attaches to each left row the most recent right row at
or before its timestamp, per key — the point-in-time lookup behind
"state of X when Y happened" questions (what price was in force, what
was the last heartbeat, which snapshot applied; the batch analog of a
stream-stream interval join).

The Spark-first plan is NOT a range join (``l.ts >= r.ts`` blows up
to |keys| x |pairs| before dedup): union both sides, sort each key's
timeline once, and carry the latest right payload forward with
``last(ignorenulls)`` over an unbounded-preceding window. One shuffle
on the key, one sort — the same physical cost as a sort-merge join,
row count |L| + |R| throughout, no candidate explosion. At 100 TB the
shuffle key is the join key; skewed keys respond to the usual salting
because the window is per-key independent.

Right-side timestamps must be unique per key (dedup/aggregate first
— enforced here because "which of several equal-time rows wins" is
exactly the ambiguity DuckDB's ASOF JOIN refuses to define either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row plus the payload of the
    latest ``right`` row with ``right.ts <= left.ts`` for the same key.

    Right payload columns (everything except ``key``/``ts``) come back
    null when no prior right row exists — or, with ``tolerance_sec``,
    when the match is older than the tolerance. The matched right
    timestamp is exposed as ``asof_ts``.
    """
    payload = [c for c in right.columns if c not in (key, ts)]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")

    l_tagged = left.select(
        "*",
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[ts].dataType).alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(ts).alias("_r_ts"),
        *payload,
    )
    # left-only columns are null on right rows
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    # right rows sort before left rows at equal ts, so ties match (>=)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct that is non-null exactly on right rows, not one
    # last(ignorenulls) per payload column: per-column carry would skip
    # a legitimate NULL in the matched (latest) right row and surface a
    # stale value from an older right row, while asof_ts points at the
    # newer one — DuckDB ASOF JOIN returns the matched row's NULLs.
    right_row = F.when(
        F.col("_side") == 0, F.struct(F.col("_r_ts").alias("_ts"), *payload)
    )
    carried = unioned.select("*", F.last(right_row, ignorenulls=True).over(w).alias("_m"))
    out = carried.where(F.col("_side") == 1)
    if tolerance_sec is not None:
        from pyspark.sql import types as T

        is_timestamp = isinstance(left.schema[ts].dataType, T.TimestampType)

        # exact integer FLOOR of micros→seconds (pmod subtraction):
        # identical to DuckDB's `epoch_us(..) // 1000000` even for
        # pre-1970 timestamps, where a timestamp→long cast truncates
        # toward zero instead. Integer-typed ts columns are already
        # in the caller's time unit and pass through untouched.
        def _sec(c):
            if not is_timestamp:
                return c.cast("long")
            us = F.unix_micros(c)
            # numerator is an exact multiple of 1e6 well inside
            # double's 2^53 integer range, so the quotient is exact
            return ((us - F.pmod(us, F.lit(1000000))) / F.lit(1000000)).cast("long")

        in_tol = (_sec(F.col(ts)) - _sec(F.col("_m._ts"))) <= tolerance_sec
        out = out.withColumn("_m", F.when(in_tol, F.col("_m")))
    return out.select(
        *left.columns,
        F.col("_m._ts").alias("asof_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in payload],
    )
