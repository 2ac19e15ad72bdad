"""Range (interval) join — binned equi-join, not a nested loop.

Spark executes a bare inequality join (``r.ts BETWEEN l.start AND
l.end``) as BroadcastNestedLoopJoin — O(|L| x |R|) compares and a
broadcast of one whole side, which does not survive scale. The
standard fix is binning: quantize time into fixed-width bins, explode
each interval onto every bin it covers, put each point in its single
bin, equi-join on (key, bin), then apply the exact predicate. The
join becomes a plain shuffled hash/sort-merge join whose key is
(key, bin); cost is |pairs that share a bin|, not |L| x |R|.

A (interval, point) pair can meet in exactly one bin — the point's —
so no post-join dedup is needed. Bin width trades shuffle fan-out
(intervals explode into span/width bins) against candidate precision
(wider bins -> more false candidates filtered by the exact
predicate); pick it near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    start: str,
    end: str,
    ts: str,
    bin_width_sec: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``key``) whose
    ``[start, end]`` contains the point's ``ts`` (inclusive bounds).

    Output: all interval columns + all point columns (names must not
    collide apart from ``key``). Timestamps may be timestamp or
    numeric-seconds columns; binning casts to long seconds.
    """
    overlap = (set(intervals.columns) & set(points.columns)) - {key}
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    if how not in ("inner", "left"):
        # An outer binned join is structurally wrong: the exploded
        # interval would null-extend once PER BIN, and a post-join
        # .where() on the exact predicate silently drops null-extended
        # rows (degrading outer to inner). 'left' (interval-preserving)
        # is built as inner + anti add-back below instead.
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    w = F.lit(bin_width_sec).cast("long")
    i_binned = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("long") / w),
                F.floor(F.col(end).cast("long") / w),
            )
        ),
    )
    p_binned = points.withColumn("_bin", F.floor(F.col(ts).cast("long") / w))
    matched = (
        i_binned.join(p_binned, on=[key, "_bin"], how="inner")
        .where(F.col(ts).between(F.col(start), F.col(end)))
        .drop("_bin")
    )
    if how == "inner":
        return matched
    # left: add back intervals with no containing point, null-extended
    # once (not once per bin — the anti join must run at interval
    # granularity, since a multi-bin interval matched in one bin would
    # otherwise resurface null-extended from its other bins).
    matched_intervals = matched.select(*intervals.columns).distinct()
    unmatched = intervals.join(
        matched_intervals,
        on=[
            intervals[c].eqNullSafe(matched_intervals[c]) for c in intervals.columns
        ],
        how="left_anti",
    )
    point_cols = [c for c in points.columns if c != key]
    for c in point_cols:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(points.schema[c].dataType))
    return matched.unionByName(unmatched.select(*matched.columns))
