"""Custom stateful streaming operator via ``applyInPandasWithState``.

The window jobs in ``jobs.py`` cover what Spark's built-in streaming
aggregations express. This module is the extension point for operators
the builtins can't: arbitrary per-key state updated batch-by-batch by
Arrow-fed Python (the Spark-first replacement for a hand-rolled
stateful consumer loop like the reference's credit accumulator,
reference GcdStoryCredit.java:85-97 — there a sorted-stream fold in
driver RAM, here a partitioned state store keyed by group).

The demo operator keeps running per-user totals (event count, max
value, last event time) chosen to be ORDER- and FP-exact: count and
max are associative and insensitive to micro-batch boundaries, so the
converged streaming state must hash-match the batch GROUP BY — which
is exactly what the registered ``stream_stateful_totals`` plan
verifies against DuckDB.

Scale notes: state lives in the executor-side state store (RocksDB in
production, one entry per key), micro-batches shuffle on the group
key only, and Arrow batches the per-key rows into pandas. For
unbounded key spaces add a timeout (``GroupStateTimeout`` processing-
or event-time) and emit-on-expiry; NoTimeout is correct here because
the parity contract needs every key's final state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from gcd_etl_spark.streaming.jobs import streaming_events

#: Emitted per touched key per micro-batch: the post-update state.
OUTPUT_SCHEMA = "user_id long, n_events long, max_value double, last_event_sec long"
#: Persisted per key between micro-batches.
STATE_SCHEMA = "n long, mx double, last long"


def _update_user_totals(key, pdf_iter, state: GroupState):
    """Fold this micro-batch's rows for one user into running state."""
    (user_id,) = key
    n, mx, last = state.get if state.exists else (0, None, None)
    for pdf in pdf_iter:
        n += len(pdf)
        values = pdf["value"].dropna()
        if len(values):
            batch_max = float(values.max())
            mx = batch_max if mx is None else max(mx, batch_max)
        ts = pdf["ts"].dropna()
        if len(ts):
            batch_last = int(ts.max().timestamp())
            last = batch_last if last is None else max(last, batch_last)
    state.update((n, mx, last))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "max_value": mx, "last_event_sec": last}]
    )


def run_streaming_stateful_totals(
    spark: SparkSession, staged_dir: str, name: str = "stream_stateful"
) -> DataFrame:
    """Drive a bounded stream through the stateful operator; return
    each key's FINAL state.

    The memory sink (update mode) holds one row per (key, touching
    micro-batch); ``n_events`` is strictly increasing per key, so the
    final state is the max-``n_events`` row.
    """
    events = streaming_events(spark, staged_dir)
    updated = events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        spark.sql(f"SELECT * FROM {name}")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
