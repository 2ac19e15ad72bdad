"""Structured Streaming variants of the window operators.

The batch operators in ``operators/windows.py`` are expressed so the
identical aggregation logic runs over an unbounded stream: same
``F.window``/``F.session_window`` calls, plus a watermark for state
eviction. These jobs exist to prove that property — the micro-batch
smoke drives a bounded parquet directory through ``readStream`` to a
memory sink and must equal the batch answer.

Scale notes: watermark bounds state store growth (late rows beyond
the watermark are dropped); sessions use the same merging state store
the batch path uses at agg time. At production scale the source is
Kafka/files and the sink is a partitioned parquet/foreachBatch writer
— both are config, not new logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of the staged events stream (ts already micro-truncated —
#: produced by sources.catalog.read_table("events") written back out).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def streaming_events(spark: SparkSession, staged_dir: str) -> DataFrame:
    """File-source stream over a staged events directory."""
    return (
        spark.readStream.format("parquet")
        .schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(staged_dir)
    )


def _run_to_memory(agg: DataFrame, spark: SparkSession, name: str) -> DataFrame:
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def run_streaming_tumbling(
    spark: SparkSession,
    staged_dir: str,
    size: str = "1 hour",
    watermark: str = "1 hour",
    name: str = "stream_tumbling",
) -> DataFrame:
    """Tumbling count/sum over a stream; returns the memory-sink view."""
    events = streaming_events(spark, staged_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("long").alias("window_start"), "event_type", "n_events")
    )
    return _run_to_memory(agg, spark, name)


def run_streaming_sliding(
    spark: SparkSession,
    staged_dir: str,
    size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
    name: str = "stream_sliding",
) -> DataFrame:
    """Sliding (hopping) windows over a stream: each event enters
    size/slide overlapping windows; state store holds one aggregate
    per open window."""
    events = streaming_events(spark, staged_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("long").alias("window_start"), "n_events")
    )
    return _run_to_memory(agg, spark, name)


def run_streaming_sessions(
    spark: SparkSession,
    staged_dir: str,
    gap: str = "10 minutes",
    watermark: str = "1 hour",
    name: str = "stream_sessions",
) -> DataFrame:
    """Session windows over a stream (stateful merging aggregation)."""
    events = streaming_events(spark, staged_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start_sec"),
            "n_events",
        )
    )
    return _run_to_memory(agg, spark, name)


def run_streaming_dedup(
    spark: SparkSession,
    staged_dir: str,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "1 hour",
    name: str = "stream_dedup",
) -> DataFrame:
    """Streaming deduplication: first arrival per key wins, duplicates
    dropped by the state store (``dropDuplicates``), append-mode sink.

    The streaming face of the exact-dedup operator: over an unbounded
    stream the state store holds one entry per key; with event-time
    keys a ``dropDuplicatesWithinWatermark`` bounds that state at
    scale (here keys are a small closed set, so plain dropDuplicates
    keeps exactly-one semantics without eviction). The converged
    output must equal batch ``SELECT DISTINCT`` — which is the oracle.
    """
    events = streaming_events(spark, staged_dir)
    deduped = events.withWatermark("ts", watermark).dropDuplicates(list(keys)).select(*keys)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def run_streaming_to_parquet(
    spark: SparkSession,
    staged_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Stream -> partitioned parquet sink (the S5 sink contract under
    Structured Streaming): date-partitioned append with exactly-once
    file commits via the checkpoint log. ``availableNow`` drains the
    bounded source then stops — the batch-parity harness shape; a
    live deployment just drops that trigger. Returns a batch reader
    over what was committed."""
    events = streaming_events(spark, staged_dir)
    q = (
        events.withColumn("event_date", F.to_date("ts"))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .partitionBy("event_date")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def run_streaming_late_drop(
    spark: SparkSession,
    staged_dir: str,
    size: str = "1 hour",
    watermark: str = "1 hour",
    name: str = "stream_late_drop",
) -> DataFrame:
    """Watermark late-data semantics, demonstrated deterministically:
    the staged dir holds TWO files written in order — first the
    RECENT half of the events timeline, then the OLDER half — and
    the file source replays them oldest-mtime-first, one per
    micro-batch. Batch 1 drives the watermark to max(recent) - delay;
    every batch-2 row then arrives beyond the watermark and is
    dropped from state. APPEND output mode means the sink holds
    exactly the windows the engine finalized (window end at or below
    the final watermark) — so the result IS the late-drop semantics,
    value-hashable against a batch restatement of the same rule."""
    events = streaming_events(spark, staged_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def run_streaming_interval_join(
    spark: SparkSession,
    staged_dir: str,
    max_lag: str = "10 minutes",
    watermark: str = "100000 hours",
    name: str = "stream_join",
) -> DataFrame:
    """Stream-stream interval join: clicks joined to the same user's
    purchases landing within ``max_lag`` after the click, both sides
    event-time streams over the same staged directory.

    This is the Structured Streaming capability the batch as-of /
    range joins (operators/asof.py, operators/rangejoin.py) map onto
    when both inputs are unbounded: each side buffers rows in the
    join state store; the time-range predicate plus the two
    watermarks bound how long a row can wait for a future match, so
    state is evicted once no counterpart can still arrive. The
    bounded-parity harness uses an effectively-infinite watermark
    (nothing may be evicted before the source drains — the
    stream_sessions convention); a live deployment sets its real
    lateness bound and gets bounded state for free, same plan."""
    clicks = (
        streaming_events(spark, staged_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        streaming_events(spark, staged_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval {max_lag}"
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def run_streaming_apply_cdc(
    spark: SparkSession,
    staged_dir: str,
    state_root: str,
    name: str = "stream_apply_cdc",
) -> DataFrame:
    """Streaming UPSERT maintenance via ``foreachBatch``: each
    micro-batch merges into a persistent per-key state table —
    last-writer-wins on the (ts, event_id) total order plus a
    running update count — the MERGE-INTO pattern under Structured
    Streaming (the streaming face of the batch snapshot_apply_cdc
    operator).

    The merge is a commutative-monoid fold (count adds, the "last"
    struct is an associative max), so the converged state is
    independent of batch boundaries and replay order — which is what
    makes the value-hash parity against the batch restatement exact.
    State versions are written to fresh directories (v0, v1, ...);
    a production deployment replaces the rewrite with a Delta/
    Iceberg MERGE so each batch touches only changed files — same
    fold, transactional sink."""
    import shutil

    shutil.rmtree(state_root, ignore_errors=True)
    versions: list[str] = []

    last_struct = F.struct(
        F.col("last_us"), F.col("last_eid"), F.col("last_value"), F.col("last_event_type")
    )

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        b = batch.select(
            "user_id",
            F.lit(1).cast("bigint").alias("n_updates"),
            F.struct(
                F.unix_micros("ts").alias("last_us"),
                F.col("event_id").alias("last_eid"),
                F.col("value").alias("last_value"),
                F.col("event_type").alias("last_event_type"),
            ).alias("last"),
        )
        if versions:
            prev = batch.sparkSession.read.parquet(versions[-1])
            b = b.unionByName(prev)
        merged = b.groupBy("user_id").agg(
            F.sum("n_updates").alias("n_updates"),
            F.max("last").alias("last"),
        )
        out = f"{state_root}/v{len(versions)}"
        merged.write.mode("overwrite").parquet(out)
        versions.append(out)

    events = streaming_events(spark, staged_dir)
    q = events.writeStream.foreachBatch(merge_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    final = spark.read.parquet(versions[-1])
    return final.select(
        "user_id",
        "n_updates",
        F.col("last.last_us").alias("last_us"),
        F.col("last.last_value").alias("last_value"),
        F.col("last.last_event_type").alias("last_event_type"),
    )


def run_streaming_static_enrich(
    spark: SparkSession,
    staged_dir: str,
    dim: DataFrame,
    name: str = "stream_static_enrich",
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a
    bounded dimension (broadcast — the static side is planned once
    and reused every micro-batch), then aggregate per dimension
    attribute. The canonical "enrich the event stream with reference
    data" topology; state is only the final aggregate, the join
    itself is stateless.

    ``dim`` must have columns (user_id, dim_key). Returns the
    memory-sink view (dim_key, event_type, n_events, sum_cents)."""
    events = streaming_events(spark, staged_dir)
    enriched = events.join(F.broadcast(dim), "user_id")
    agg = enriched.groupBy("dim_key", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
    )
    return _run_to_memory(agg, spark, name)
