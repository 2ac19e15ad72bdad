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
or event-time) and emit-on-expiry; NoTimeout is correct for the
totals operator because its parity contract needs every key's final
state, and ``run_streaming_sessions_timeout`` below exercises the
EventTimeTimeout emit-on-expiry path.

Spark 4's successor API (``transformWithStateInPandas`` /
``StatefulProcessor`` — named value/list/map state, timers, TTL) was
prototyped round 7 and is BLOCKED in this environment: its driver
worker requires ``google.protobuf``, which is not importable in the
container (``ImportError: cannot import name 'descriptor'``) and
installs are off-limits. The operators here use the stable
``applyInPandasWithState`` API, which covers the same state-store
semantics; porting to the v2 API when protobuf is available is
mechanical (state get/update/timeout map 1:1).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from gcd_etl_spark.streaming.jobs import streaming_events

#: State-store provider for the stateful runners (round-7 verdict
#: item 6). "hdfs" (default) is the on-heap HDFSBackedStateStoreProvider;
#: "rocksdb" flips to the bundled RocksDBStateStoreProvider — the
#: 100 TB answer: state lives off-heap in a log-structured KV store
#: with changelog checkpointing, so executor heap no longer bounds
#: keyspace and GC pauses stop scaling with state size. Flip with
#: GCD_STATE_STORE=rocksdb (read per run, so one process can measure
#: both). Measured at sf0.01 (BASELINE.md round 9): identical results
#: and indistinguishable wall (sessions 12.9 vs 12.4 s, totals 1.65
#: vs 1.70 s warm min-of-2) — at fixture state sizes neither provider
#: dominates; RocksDB pays off when state outgrows heap.
_PROVIDER_CLASSES = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def state_store_provider() -> str:
    """Active provider key, validated against the known set."""
    name = os.environ.get("GCD_STATE_STORE", "hdfs").lower()
    if name not in _PROVIDER_CLASSES:
        raise ValueError(
            f"GCD_STATE_STORE={name!r}: expected one of "
            f"{sorted(_PROVIDER_CLASSES)}"
        )
    return name


@contextmanager
def _state_store_conf(spark: SparkSession):
    """Pin the configured provider class for the duration of one
    streaming run, restoring the prior session value after (the
    provider is bound per-query at stream start)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:  # noqa: BLE001 — unset key raises in Spark 4
        prev = None
    spark.conf.set(key, _PROVIDER_CLASSES[state_store_provider()])
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

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
    with _state_store_conf(spark):
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


# ---------------------- gap sessions with event-time expiry (round 7)
#: Inactivity gap that closes a session, in microseconds (24 h: the
#: fixture's per-user median spacing is ~7 h, so each user yields a
#: handful of multi-event sessions).
SESSION_GAP_US = 86_400 * 1_000_000

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, n_events long"
)
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"


def _update_sessions(key, pdf_iter, state: GroupState):
    """Gap-sessionize one user's micro-batch; EMIT closed sessions.

    Sessions close two ways, both emitted exactly once:
    * in-update: a row arriving more than SESSION_GAP_US after the
      open session's last event closes it and starts a new one;
    * on EXPIRY: when the event-time watermark passes
      last_event + gap with no newer data for the key, the engine
      invokes this function with ``state.hasTimedOut`` and the open
      session is flushed (the emit-on-expiry path that NoTimeout
      operators cannot express).
    Batches are staged time-ordered (one file per trigger), so the
    per-key event stream is nondecreasing across batches and the
    session split is deterministic.
    """
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            [{
                "user_id": user_id,
                "session_start_us": start,
                "session_end_us": last,
                "n_events": n,
            }]
        )
        return
    start, last, n = state.get if state.exists else (None, None, 0)
    out = []
    # Arrow hands one group as SEVERAL pandas chunks with no ordering
    # guarantee BETWEEN them — sorting each chunk alone would let a
    # later chunk deliver earlier timestamps and split sessions
    # wrongly (ADVICE round 7). Concatenate the whole group's batch
    # first, then one global sort: bounded by one key's events in one
    # micro-batch (the state itself stays O(1)).
    chunks = [pdf["ts"].astype("int64") // 1000 for pdf in pdf_iter]
    ts_sorted = pd.concat(chunks).sort_values() if chunks else []
    for us in ts_sorted:
        # pandas datetime64[ns] -> epoch MICROseconds
        us = int(us)
        if start is None:
            start, last, n = us, us, 1
        elif us - last > SESSION_GAP_US:
            out.append((user_id, start, last, n))
            start, last, n = us, us, 1
        else:
            last = max(last, us)
            n += 1
    state.update((start, last, n))
    # expire when the event-time watermark passes last + gap
    state.setTimeoutTimestamp((last + SESSION_GAP_US) // 1000)
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start_us", "session_end_us", "n_events"],
        )


def run_streaming_sessions_timeout(
    spark: SparkSession, staged_dir: str, name: str = "stream_sess_timeout"
) -> DataFrame:
    """Drive the staged stream through the expiring sessionizer and
    return every emitted (closed) session, sentinel keys excluded.

    The state store inherits its partition count from
    spark.sql.shuffle.partitions at query start, and EVERY
    micro-batch pays one state-store task per partition; at fixture
    key cardinality 8 partitions cut that fixed cost 4x versus the
    session default (measured 32 -> 21 s at sf0.01) without touching
    semantics. Production sizes this to keys/cores, not fixtures."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    events = streaming_events(spark, staged_dir)
    sessions = (
        events.withWatermark("ts", "1 second")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_sessions,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        with _state_store_conf(spark):
            q = (
                sessions.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {name}").where(F.col("user_id") >= 0)
