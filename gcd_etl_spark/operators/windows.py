"""Event-time window operators over timestamped streams (batch form).

The reference is strictly batch with no temporal operators
(SURVEY.md §2.9); these are the engine's event-analytics surface,
expressed so the same logic runs identically over a bounded DataFrame
or a Structured Stream (see ``gcd_etl_spark.streaming``):

* tumbling — ``F.window(ts, size)``
* sliding  — ``F.window(ts, size, slide)``
* session  — ``F.session_window(ts, gap)`` (and an explicit
  gaps-and-islands formulation used by the DuckDB oracle)

Window starts are emitted as epoch seconds (long) so results are
timezone-unambiguous and hashable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcd_etl_spark.functions.numeric import exact_sum


def tumbling_agg(events: DataFrame, size: str = "1 hour") -> DataFrame:
    """Count/sum per (window, event_type) tumbling window."""
    return (
        events.groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), exact_sum("value").alias("total_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_agg(events: DataFrame, size: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding windows: each event lands in size/slide windows."""
    return (
        events.groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), exact_sum("value").alias("total_value"))
        .select(F.col("w.start").cast("long").alias("window_start"), "n_events", "total_value")
    )


def session_agg(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows with inactivity gap.

    ``session_window`` works on bounded data too — Spark merges
    overlapping per-event intervals into sessions at agg time.
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), exact_sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            F.col("w.end").cast("long").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
