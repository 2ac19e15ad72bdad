"""Structured Streaming parity as hash-checked queries.

The streaming jobs (streaming/jobs.py) run the SAME algebra as the
batch operators; these plans prove it under the driver's oracle:
stage a table to a parquet directory, drive it through ``readStream``
(one file per micro-batch) into a memory sink or foreachBatch
partition writes, and hash-compare converged state against the batch
restatement. Families (rounds 3-12): windowed aggregations (tumbling
/ sliding / sessions / stateful totals), streaming dedup, and the
INGEST GATES — each persisted-artifact lifecycle's foreachBatch twin
probing the same staged index as its nightly delta query (MinHash
bands, SRP buckets fixed-width anchor + occupancy-CAPPED production
form, frozen bigram-LM costs, frozen DSIR model). A streaming
pipeline whose converged answer equals the batch answer is the
Spark-first statement of batch/stream unification.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from gcd_etl_spark.plans.registry import query
from gcd_etl_spark.sources.catalog import read_table
from gcd_etl_spark.streaming.jobs import run_streaming_tumbling
from gcd_etl_spark.streaming.stateful import run_streaming_stateful_totals


def _empty_seed(spark: SparkSession, schema: str) -> DataFrame:
    """Zero-row frame with ``schema``, built purely JVM-side
    (``spark.range(0)`` + typed null literals). The gates seed their
    verdict sinks with one empty partition dir per run; the previous
    ``spark.createDataFrame([], schema)`` parallelizes even an empty
    local list into defaultParallelism PICKLED PYTHON partitions, so
    the seed write paid ~32 Python-worker task round-trips (measured
    0.4-1.5 s per gate run at local[32]; the JVM form is ~0.1 s —
    guide §4: eliminate the Python boundary). Read-back schema is
    identical (parquet footer from the same DDL types)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    st = T.StructType.fromDDL(schema)
    return spark.range(0).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
    )


def _stage_events(spark: SparkSession, sf_dir: str, prefix: str) -> tuple[str, str]:
    """Write the events table to a parquet dir usable as a file-source
    stream; returns (staged_dir, per-sf tag for sink names)."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    staged = f"/tmp/gcd_etl_stream_{prefix}_{tag}"
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    events.write.mode("overwrite").parquet(staged)
    return staged, tag


@query(
    "stream_tumbling",
    oracle="""
SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling counts computed BY THE STREAMING ENGINE
    (file-source micro-batches, watermarked state store, memory sink),
    hash-matched against the batch oracle."""
    staged, tag = _stage_events(spark, sf_dir, "stage")
    return run_streaming_tumbling(spark, staged, name=f"stream_tumbling_{tag}")


@query(
    "stream_stateful_totals",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       MAX(value) AS max_value,
       MAX(epoch_us(ts) // 1000000) AS last_event_sec
FROM events
GROUP BY user_id
""",
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user totals computed by a CUSTOM stateful operator
    (``applyInPandasWithState``: Arrow-fed python fold over a per-key
    state store, streaming/stateful.py), converged over file-source
    micro-batches and hash-matched against the batch GROUP BY. The
    tracked stats (count, max, last-seen) are associative and
    FP-exact, so stream/batch equality is exact, not approximate."""
    staged, tag = _stage_events(spark, sf_dir, "stateful")
    return run_streaming_stateful_totals(spark, staged, name=f"stream_stateful_{tag}")


@query(
    "stream_sessions",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                   >= 600000000
              OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), g AS (
  SELECT user_id, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM e
)
SELECT user_id,
       MIN(us) // 1000000 AS session_start_sec,
       COUNT(*) AS n_events
FROM g GROUP BY user_id, sess
""",
)
def stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows computed BY THE STREAMING ENGINE (merging
    session state store over file-source micro-batches), hash-matched
    against the batch gaps-and-islands SQL. The staged files are not
    time-ordered, so the watermark spans the whole event range —
    correct for the bounded-parity contract; a live deployment sets it
    to its real lateness bound."""
    from gcd_etl_spark.streaming.jobs import run_streaming_sessions

    staged, tag = _stage_events(spark, sf_dir, "sessions")
    return run_streaming_sessions(
        spark, staged, watermark="100000 hours", name=f"stream_sessions_{tag}"
    )


@query(
    "stream_dedup",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup computed BY THE STREAMING ENGINE: dropDuplicates
    over the event stream's state store (first arrival per
    (user_id, event_type) wins, later duplicates dropped per
    micro-batch), append sink. The converged set must equal the batch
    SELECT DISTINCT — dedup is the one operator whose stream/batch
    parity is set-equality, independent of arrival order."""
    from gcd_etl_spark.streaming.jobs import run_streaming_dedup

    staged, tag = _stage_events(spark, sf_dir, "dedup")
    return run_streaming_dedup(spark, staged, name=f"stream_dedup_{tag}")


@query(
    "stream_sliding",
    oracle="""
WITH e AS (SELECT epoch_us(ts) // 1000000 AS sec FROM events),
     x AS (
  SELECT (sec // 1800) * 1800 - k * 1800 AS window_start
  FROM e CROSS JOIN (SELECT UNNEST([0, 1]) AS k)
  WHERE sec >= (sec // 1800) * 1800 - k * 1800
    AND sec < (sec // 1800) * 1800 - k * 1800 + 3600
)
SELECT window_start, COUNT(*) AS n_events
FROM x GROUP BY 1
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes computed BY THE
    STREAMING ENGINE (one open aggregate per overlapping window in the
    state store), hash-matched against the batch window-expansion SQL
    — the same oracle the batch win_sliding plan uses."""
    from gcd_etl_spark.streaming.jobs import run_streaming_sliding

    staged, tag = _stage_events(spark, sf_dir, "sliding")
    return run_streaming_sliding(
        spark, staged, watermark="100000 hours", name=f"stream_sliding_{tag}"
    )


#: Timeline split for the late-data demonstration (events span
#: 2024-01; recent half first => high watermark, older half late).
LATE_SPLIT_US = 1_705_363_200_000_000  # 2024-01-16T00:00:00Z

_LATE_DROP_ORACLE = f"""
WITH recent AS (
  SELECT ts, event_type FROM events
  WHERE epoch_us(ts) >= {LATE_SPLIT_US}
),
m AS (SELECT MAX(epoch_us(ts)) AS mx FROM recent),
w AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start,
         event_type, COUNT(*) AS n_events
  FROM recent GROUP BY 1, 2
)
SELECT window_start, event_type, n_events
FROM w CROSS JOIN m
WHERE (window_start + 3600) * 1000000 <= mx - 3600000000
"""


@query("stream_late_drop", oracle=_LATE_DROP_ORACLE)
def stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA semantics under the differential gate: the
    older half of the timeline is replayed AFTER the recent half, so
    every one of its rows is beyond the watermark when it arrives and
    must be dropped; append mode emits exactly the finalized windows.
    The oracle restates the whole rule in batch SQL: hourly windows
    over the recent half only, kept when window_end <= max(recent) -
    1h (the final watermark). Deterministic because file-source
    micro-batches replay in file order (one file per trigger,
    oldest first) — the batch boundary, and therefore the watermark
    trajectory, is pinned by construction."""
    import glob
    import time as _time

    from pyspark.sql import functions as F

    from gcd_etl_spark.streaming.jobs import run_streaming_late_drop

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    staged = f"/tmp/gcd_etl_stream_late_{tag}"
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    cut = F.unix_micros("ts") >= LATE_SPLIT_US
    # THREE single-file batches, replayed oldest-mtime-first: two
    # recent-half files, then the older half. The recent batches
    # drive the watermark to max(recent) - delay; the old rows must
    # arrive in batch THREE because the engine's late-record filter
    # uses a one-batch-LAGGED watermark (measured: old rows arriving
    # in batch 2 pass the filter against the still-initial watermark,
    # aggregate, and are immediately evicted-and-EMITTED by the
    # post-batch eviction — the exact trap this staging avoids).
    # Explicit far-apart mtimes pin the replay order; a same-second
    # write can otherwise collapse files into one micro-batch.
    batches = [
        events.where(cut & (F.col("user_id") % 7 != 0)),
        events.where(cut & (F.col("user_id") % 7 == 0)),
        events.where(~cut),
    ]
    seen: list[str] = []
    groups: list[list[str]] = []
    for i, b in enumerate(batches):
        mode = "overwrite" if i == 0 else "append"
        b.coalesce(1).write.mode(mode).parquet(staged)
        now_files = sorted(glob.glob(f"{staged}/part-*.parquet"))
        groups.append([p for p in now_files if p not in seen])
        seen = now_files
    now = _time.time()
    for i, grp in enumerate(groups):
        for p in grp:
            os.utime(p, (now - 300 + i * 120, now - 300 + i * 120))
    return run_streaming_late_drop(spark, staged, name=f"stream_late_drop_{tag}")


@query(
    "stream_stream_join",
    oracle="""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND epoch_us(p.ts) <= epoch_us(c.ts) + 600000000
""",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join computed BY THE STREAMING ENGINE:
    the click stream joined to the purchase stream (same user,
    purchase within 10 minutes after the click), both sides
    watermarked event-time streams replayed from file-source
    micro-batches, append sink. The converged pair set must equal
    the batch interval join — which is the oracle. Exact integer
    lag_us rides along so the match TIMING, not just the pair ids,
    is value-hashed."""
    staged, tag = _stage_events(spark, sf_dir, "ssjoin")
    from gcd_etl_spark.streaming.jobs import run_streaming_interval_join

    return run_streaming_interval_join(spark, staged, name=f"stream_ssjoin_{tag}")


@query(
    "stream_sink_parquet",
    oracle="""
SELECT event_id, user_id, event_type, value,
       CAST(epoch_us(ts) AS BIGINT) AS us,
       strftime(ts, '%Y-%m-%d') AS event_date
FROM events
""",
)
def stream_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The S5 partitioned-parquet sink contract under Structured
    Streaming (reference Main.java:96-105 re-expressed as a
    streaming write): the event stream lands in a date-partitioned
    parquet table through the checkpointed file sink (exactly-once
    commit log, availableNow drain), and what was COMMITTED is read
    back and value-hashed against the batch table — proving the
    sink wrote exactly the input, once, with the partition column
    derived correctly. Output dirs are wiped with their checkpoint
    per build (a stale checkpoint with fresh dirs would no-op the
    stream)."""
    import shutil

    from pyspark.sql import functions as F

    from gcd_etl_spark.streaming.jobs import run_streaming_to_parquet

    staged, tag = _stage_events(spark, sf_dir, "sink")
    out = f"/tmp/gcd_etl_stream_sink_out_{tag}"
    ckpt = f"/tmp/gcd_etl_stream_sink_ckpt_{tag}"
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    committed = run_streaming_to_parquet(spark, staged, out, ckpt)
    return committed.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("us"),
        F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
    )


@query(
    "stream_apply_cdc",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, value, event_type FROM events
),
r AS (
  SELECT user_id, us, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY us DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_updates
  FROM e
)
SELECT user_id, n_updates, us AS last_us, value AS last_value,
       event_type AS last_event_type
FROM r WHERE rn = 1
""",
)
def stream_apply_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert maintenance BY THE STREAMING ENGINE: micro-batches
    fold into a versioned per-user state table through foreachBatch
    (count adds, last-writer-wins struct max on the (ts, event_id)
    total order), and the converged state must equal the batch
    last-per-key restatement — batch-boundary- and order-independent
    because the merge is a commutative monoid."""
    staged, tag = _stage_events(spark, sf_dir, "cdc")
    from gcd_etl_spark.streaming.jobs import run_streaming_apply_cdc

    return run_streaming_apply_cdc(
        spark, staged, f"/tmp/gcd_etl_stream_cdc_state_{tag}", name=f"stream_cdc_{tag}"
    )


# --------------------- stateful sessions with event-time expiry
def _time_ordered_banded(events: DataFrame):
    """Replay staging split: a band column ``_rb`` (1 = at-or-below
    the median timestamp, 2 = above) from ONE scalar aggregate —
    every band-2 event is strictly newer than every band-1 event, so
    no event can be late-dropped, and sessions spanning the boundary
    prove cross-batch state carry. Returns (banded_frame, max_ts_us).

    Round-13 verdict item 3: the previous global-sort 2-tile split
    OVER (ORDER BY ts, event_id) ran the whole events table through a data-sized
    Exchange SinglePartition — the exact funnel the plan audit
    forbids in batch plans; a scalar-agg median funnels only reduced
    partials (audited by tests/test_plan_audit.py's streaming-staging
    rule). The cap keeps batch 2 non-empty when more than half the
    events share the max timestamp; a degenerate all-one-timestamp
    corpus degrades to an empty first batch (no band-1 rows), whose
    0-row micro-batch cannot change the converged state."""
    from pyspark.sql import functions as F

    hi, med = events.agg(
        F.max(F.unix_micros("ts")),
        F.percentile_approx(F.unix_micros("ts"), 0.5, 10000),
    ).collect()[0]
    med = min(med, hi - 1)
    banded = events.withColumn(
        "_rb", F.when(F.unix_micros("ts") <= F.lit(med), F.lit(1)).otherwise(F.lit(2))
    )
    return banded, hi


def _time_ordered_halves(events: DataFrame):
    """([first, second], max_ts_us) view of ``_time_ordered_banded``
    (kept for the plan-audit and split-property pins; the staging
    path writes the banded frame in one pass)."""
    from pyspark.sql import functions as F

    banded, hi = _time_ordered_banded(events)
    return [banded.where(F.col("_rb") == i).drop("_rb") for i in (1, 2)], hi


_SESS_TIMEOUT_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
),
s AS (
  SELECT user_id, us,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                   > 86400000000 THEN 1 ELSE 0 END AS brk
  FROM e
),
g AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id,
       MIN(us) AS session_start_us,
       MAX(us) AS session_end_us,
       COUNT(*) AS n_events
FROM g GROUP BY user_id, sid
"""


@query("stream_sessions_timeout", oracle=_SESS_TIMEOUT_ORACLE)
def stream_sessions_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionization with EVENT-TIME EXPIRY — the
    one stateful-API feature the NoTimeout operators can't exercise:
    per-user gap sessions accumulate in the state store, close either
    when a later event exceeds the 24 h gap (in-update) or when the
    watermark passes last_event + gap with no newer data
    (``GroupStateTimeout.EventTimeTimeout`` → ``state.hasTimedOut``
    flush — emit-on-expiry). Events replay as two time-ordered
    single-file micro-batches (enough to prove cross-batch state
    carry; batch count is a fixed per-batch state-store cost), then
    TWO far-future sentinel batches
    (user_id −1/−2, filtered from the output): the first advances the
    watermark past every real session's expiry, and the second exists
    because timeouts fire against a one-batch-LAGGED watermark (the
    same trap stream_late_drop documents) — with it, every real
    session is expired-and-emitted by stream end, so the oracle is
    the complete batch gap-sessionization of the events table. At
    100 TB this is how per-entity session state stays bounded: the
    store holds only OPEN sessions, expiry is driven by event time,
    and emission is exactly-once per session."""
    import glob
    import time as _time

    from pyspark.sql import functions as F

    from gcd_etl_spark.streaming.stateful import (
        SESSION_GAP_US,
        run_streaming_sessions_timeout,
    )

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    staged = f"/tmp/gcd_etl_stream_sesstw_{tag}"
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    banded, hi = _time_ordered_banded(events)
    # JVM-native 1-row frame (round 13): a local-data createDataFrame
    # parallelizes the row into defaultParallelism PICKLED PYTHON
    # partitions, and the staging coalesce(1) then evaluates all of
    # them SEQUENTIALLY through one task's Python-worker round-trips —
    # measured ~4 s PER SENTINEL WRITE at local[32] (~8 s of this
    # row's 15 s wall) vs ~0.3 s for the identical rows built from
    # spark.range(1) + literals, which never leave the JVM (guide §4:
    # eliminate the Python boundary — here it was hiding in staging).
    sent = lambda uid, us, rb: spark.range(1).select(
        F.lit(int(uid)).cast("long").alias("event_id"),
        F.timestamp_micros(F.lit(int(us))).alias("ts"),
        F.lit(int(uid)).cast("long").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit(int(rb)).alias("_rb"),
    )
    # Single-pass staging (round 13 opt): ONE job writes all four
    # replay files via partitionBy("_rb") — previously four
    # SEQUENTIAL jobs, the two half writes each collapsing a full
    # events scan + filter into one coalesce(1) task (guide §1.2:
    # the same rows were read twice and written through two
    # single-threaded funnels). repartition on _rb yields exactly one
    # file per band; the files are then flattened into the staged dir
    # so the file-source replay (one file per trigger, mtime order)
    # is unchanged. An empty band (degenerate corpus) writes no file:
    # its 0-row micro-batch carried no state anyway.
    n_batches = 4
    all_banded = (
        banded.select("event_id", "ts", "user_id", "event_type", "value", "_rb")
        .unionAll(sent(-1, hi + 3 * SESSION_GAP_US, 3))
        .unionAll(sent(-2, hi + 6 * SESSION_GAP_US, 4))
    )
    all_banded.repartition(n_batches, "_rb").write.partitionBy("_rb").mode(
        "overwrite"
    ).parquet(staged)
    import shutil as _shutil

    now = _time.time()
    for i in range(1, n_batches + 1):
        # Suffix j guards the (off-by-default) case of >1 file per
        # band, e.g. a global maxRecordsPerFile; same-mtime files
        # within a band replay in either order, which the banded
        # split makes irrelevant (no cross-band reorder possible).
        for j, p in enumerate(sorted(glob.glob(f"{staged}/_rb={i}/part-*.parquet"))):
            dst = f"{staged}/replay-{i}-{j}{os.path.splitext(p)[1]}"
            os.rename(p, dst)
            os.utime(dst, (now - 600 + i * 60, now - 600 + i * 60))
        _shutil.rmtree(f"{staged}/_rb={i}", ignore_errors=True)
    return run_streaming_sessions_timeout(
        spark, staged, name=f"stream_sess_timeout_{tag}"
    )


# --------------------- streaming dedup against the persisted corpus
#: Corpus-bytes threshold past which the ingest gates SEMI-JOIN PRUNE
#: the verify's corpus side to the batch's candidate ids BEFORE the
#: per-batch feature projection (shingles / SRP quantization) — guide
#: §3.2, round-14 verdict item 1. Below it the prune is a measured
#: LOSS: the candidate checkpoint + extra broadcast build are fixed
#: per-micro-batch job costs that exceed the fixture-scale feature
#: compute they save (r13 measured +0.4–0.9 s/gate; r14 re-measured
#: 6.59 -> 7.41 s fresh-JVM min-of-2 with the prune forced on at
#: sf0.1's 584 KB corpus). Above it the prune is the 100 TB-correct
#: shape: per-batch corpus-side work becomes O(candidates) compute
#: over one pruned scan instead of O(corpus) feature compute — the
#: threshold is an ABSOLUTE corpus size because the saved compute
#: grows with the corpus while the prune's overhead is fixed per
#: batch. 64 MiB ~= the point where the corpus-side projection
#: (~0.5 s/GB/core measured) clearly dominates the ~0.1-0.2 s fixed
#: cost.
GATE_PRUNE_MIN_CORPUS_BYTES = 64 * 1024 * 1024


def _gate_prune_corpus(sf_dir: str, table: str) -> bool:
    """True when the gate verifies should candidate-prune the corpus
    side (source bytes past GATE_PRUNE_MIN_CORPUS_BYTES)."""
    from gcd_etl_spark.sources.sinks import source_table_bytes

    return source_table_bytes(sf_dir, table) >= GATE_PRUNE_MIN_CORPUS_BYTES


def delta_dedup_batch_fn(
    docs: DataFrame, idx: DataFrame, out_root: str, prune: bool = False
):
    """The foreachBatch worker for the streaming ingest gate, shared
    by the registered stream plan and the kill-and-restart test
    (tests/test_round10.py) so the replay semantics under test are
    the production code path, not a re-implementation: band the batch
    (only the batch), broadcast its bands against the persisted
    bucketed corpus index, exact-Jaccard verify, then OVERWRITE the
    batch's own batch_id-keyed partition dir — idempotent under
    at-least-once redelivery (a replayed batch lands on the same path
    instead of appending duplicate verdict rows).

    Round 13: the verify's delta side shingles only the BATCH instead
    of the whole docs table (every id_a is a batch id). The corpus
    side keeps the default corpus-wide shingle projection: it is
    computed inside the broadcast build, i.e. parallel across cores
    and ~0.3 s warm at sf0.1 — a once-per-run checkpointed corpus
    frame was measured SLOWER (6.0 -> 7.0 s fresh-JVM min-of-2:
    checkpoint setup + RDD-scan reads beat by the columnar
    scan-project broadcast; OPTIMIZATION_r13.md).

    Round 14 (verdict item 1): ``prune`` — on large corpora
    (GATE_PRUNE_MIN_CORPUS_BYTES) the batch's candidate pairs are
    materialized ONCE (tiny localCheckpoint; also dedupes the
    candidate subtree between its two consumers) and the corpus side
    is LEFT-SEMI pruned to the candidate ids BEFORE the shingle
    projection, so per-batch corpus-side work is O(candidates), not
    O(corpus) feature compute. Value-identical: the verify equi-join
    on id_b already discards every non-candidate corpus row; the semi
    join removes them earlier (guide §3.2). Off at fixture scale —
    see the threshold note above."""
    from pyspark.sql import functions as F

    from gcd_etl_spark.operators import dedup as D

    def dedup_batch(batch: DataFrame, batch_id: int) -> None:
        bands = D.minhash_band_table(batch, portable=True).select(
            F.col("_id").alias("delta_id"), "band_idx", "band_hash"
        )
        cand = (
            F.broadcast(bands)
            .join(idx, ["band_idx", "band_hash"])
            .select(
                F.col("delta_id").alias("id_a"), F.col("corpus_id").alias("id_b")
            )
            .distinct()
        )
        sets_b = None
        if prune:
            cand = cand.localCheckpoint(eager=True)
            sets_b = D.shingle_sets(
                docs.join(
                    F.broadcast(
                        cand.select(F.col("id_b").alias("doc_id")).distinct()
                    ),
                    "doc_id",
                    "left_semi",
                )
            )
        verified = D.jaccard_pairs(
            docs,
            cand,
            threshold=0.5,
            sets_a=D.shingle_sets(batch),
            sets_b=sets_b,
        )
        verified.select(
            F.col("id_a").alias("delta_id"),
            F.col("id_b").alias("corpus_id"),
            F.round("jaccard", 6).alias("jaccard"),
        ).write.mode("overwrite").parquet(f"{out_root}/batch_id={batch_id}")

    return dedup_batch


def _stream_delta_dedup_oracle() -> str:
    from gcd_etl_spark.plans.dedup import _delta_vs_corpus_oracle

    return _delta_vs_corpus_oracle()


@query("stream_dedup_against_corpus", oracle=_stream_delta_dedup_oracle())
def stream_dedup_against_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING form of dedup_delta_vs_corpus: new documents
    arrive as file-source micro-batches and each batch is near-dedup
    checked against the PERSISTED corpus LSH band index inside
    ``foreachBatch`` — band the batch (only the batch), broadcast its
    band rows against the bucketed index table, exact-Jaccard verify
    the candidates, land the verdicts in a batch_id-keyed partition
    dir (idempotent under replay: a retried batch OVERWRITES its own
    path instead of appending duplicate rows — the standard
    foreachBatch exactly-once-effect pattern on plain parquet). This
    is the ingest-gate a 100 TB corpus actually runs: per-arrival
    cost is O(batch) + one index probe, the corpus is never
    re-shingled, and state lives in the STORAGE LAYER (the band index
    + per-batch verdict partitions), not the stream's state store —
    so the gate restarts for free and batch boundaries cannot change
    the answer (per-doc
    verdicts are independent, so the union over any batching equals
    the one-shot batch result; the oracle IS the batch query's
    oracle, value-hash exact).

    Delta-internal duplicates are out of scope exactly as in the
    nightly form (the self-join path handles those); the index is
    shared via ensure_corpus_band_index so stream and nightly can
    never index differently."""
    import shutil

    from pyspark.sql import functions as F

    from gcd_etl_spark.operators import dedup as D
    from gcd_etl_spark.plans.dedup import DELTA_MOD, ensure_corpus_band_index
    from gcd_etl_spark.sources.catalog import read_table_spread

    docs = read_table_spread(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % DELTA_MOD == 0
    idx = ensure_corpus_band_index(spark, sf_dir, docs.where(~is_delta))

    import uuid

    # uuid-suffixed scratch (round-10 ADVICE): two concurrent runs
    # over the same sf dir (pytest-xdist, sweep + bench in parallel)
    # must not rmtree each other's staging mid-stream. Each build
    # gets private dirs; rmtree only ever touches this run's own.
    tag = "{}_{}".format(
        os.path.basename(sf_dir.rstrip("/")).replace(".", "_"), uuid.uuid4().hex[:8]
    )
    staged = f"/tmp/gcd_etl_stream_deltadedup_{tag}"
    out_root = f"/tmp/gcd_etl_stream_deltadedup_out_{tag}"
    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(out_root, ignore_errors=True)
    delta = docs.where(is_delta)
    # ~4 files -> ~4 micro-batches (maxFilesPerTrigger=1); per-doc
    # independence makes the batch split immaterial to the answer
    delta.repartition(4).write.parquet(staged)
    # seed the sink with an empty frame so a zero-delta stream still
    # yields a readable (empty) result (a batch_id=-1 partition dir,
    # keeping the layout uniform for partition discovery)
    empty = _empty_seed(spark, "delta_id long, corpus_id long, jaccard double")
    empty.write.parquet(f"{out_root}/batch_id=-1")

    dedup_batch = delta_dedup_batch_fn(
        docs, idx, out_root, prune=_gate_prune_corpus(sf_dir, "documents")
    )

    stream = (
        spark.readStream.format("parquet")
        .schema(delta.schema)
        .option("maxFilesPerTrigger", "1")
        .load(staged)
    )
    q = stream.writeStream.foreachBatch(dedup_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(out_root).select("delta_id", "corpus_id", "jaccard")


# ----------------- streaming SEMANTIC dedup gate (SemDeDup at ingest)
def _srp_pruned_corpus_quant(spark, sf_dir: str, cand: DataFrame):
    """(candidate-checkpointed cand, corpus quant frame pruned to the
    candidate ids) — the semantic gates' form of the round-14 semi-join
    prune: materialize the batch's tiny candidate set once, LEFT-SEMI
    filter the embeddings scan to candidate corpus ids BEFORE the SRP
    quantization (the per-batch Arrow matmul stops being O(corpus)).
    Value-identical: the verify equi-join on corpus_id already drops
    every non-candidate row."""
    from pyspark.sql import functions as F

    from gcd_etl_spark.plans.dedup import _srp_quant_frame
    from gcd_etl_spark.sources.catalog import read_table_spread

    cand = cand.localCheckpoint(eager=True)
    q_b = _srp_quant_frame(
        read_table_spread(spark, sf_dir, "embeddings").join(
            F.broadcast(
                cand.select(F.col("corpus_id").alias("vec_id")).distinct()
            ),
            "vec_id",
            "left_semi",
        )
    )
    return cand, q_b


def semantic_gate_batch_fn(
    spark, sf_dir: str, idx: DataFrame, out_root: str, prune: bool = False
):
    """foreachBatch worker for the semantic ingest gate, shared with
    tests: SRP-bucket the batch's embeddings (one Arrow matmul over
    O(batch) rows), broadcast its (t, bk) rows against the persisted
    corpus bucket index, exact-integer-dot verify, OVERWRITE the
    batch's own batch_id-keyed partition dir (idempotent under
    at-least-once redelivery — the dedup gate's sink pattern).

    Round 13: the verify's delta side quantizes only the BATCH
    instead of the whole embeddings table (every delta_id is a batch
    id); the corpus side keeps the default corpus-wide quant frame —
    it is computed inside the broadcast/join build in parallel, and a
    once-per-run checkpointed corpus frame measured slightly SLOWER
    (see delta_dedup_batch_fn's note).

    Round 14: ``prune`` — above GATE_PRUNE_MIN_CORPUS_BYTES the
    corpus-side quant frame is semi-join pruned to the batch's
    candidate ids (see delta_dedup_batch_fn / _srp_pruned_corpus_quant)."""
    from pyspark.sql import functions as F

    from gcd_etl_spark.plans.dedup import (
        SRP_BITS,
        SRP_TABLES,
        _srp_bucket_frame,
        _srp_quant_frame,
        _srp_verify_delta,
    )

    def gate_batch(batch: DataFrame, batch_id: int) -> None:
        delta_tb = _srp_bucket_frame(batch, SRP_BITS, SRP_TABLES).select(
            F.col("vec_id").alias("delta_id"), F.posexplode("bks").alias("t", "bk")
        )
        cand = (
            idx.join(F.broadcast(delta_tb), ["t", "bk"])
            .select("delta_id", "corpus_id")
            .dropDuplicates(["delta_id", "corpus_id"])
        )
        q_b = None
        if prune:
            cand, q_b = _srp_pruned_corpus_quant(spark, sf_dir, cand)
        _srp_verify_delta(
            spark, sf_dir, cand, q_a=_srp_quant_frame(batch), q_b=q_b
        ).write.mode("overwrite").parquet(f"{out_root}/batch_id={batch_id}")

    return gate_batch


def _semantic_gate_oracle() -> str:
    from gcd_etl_spark.plans.dedup import _srp_delta_oracle

    return _srp_delta_oracle()


@query("stream_semantic_dedup_gate", oracle=_semantic_gate_oracle())
def stream_semantic_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING form of dedup_semantic_delta_vs_corpus — SemDeDup
    as an ingest gate: newly-embedded documents arrive as file-source
    micro-batches and each batch is checked for semantic near-dups
    (cosine >= 0.40, portable SRP family) against the PERSISTED corpus
    bucket index inside foreachBatch. Per-arrival cost is O(batch) +
    one index probe; the corpus is never re-projected through the
    hyperplanes; state lives in the storage layer (bucket index +
    per-batch verdict partitions), so the gate restarts for free and
    batch boundaries cannot change the answer (per-vector verdicts
    are independent; the union over any batching equals the one-shot
    nightly result — the oracle IS the nightly query's oracle,
    value-hash exact including the rounded cos_ppm).

    ANCHOR CONFIGURATION (round 12): fixed-width UNCAPPED index —
    kept as the value-oracled anchor, NOT the production gate (exp
    1.35 at 32x). Production + lifecycle bench:
    stream_semantic_dedup_gate_capped."""
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from gcd_etl_spark.plans.dedup import DELTA_MOD, ensure_srp_bucket_index
    from gcd_etl_spark.sources.catalog import read_table_spread

    emb = read_table_spread(spark, sf_dir, "embeddings")
    is_delta = F.col("vec_id") % DELTA_MOD == 0
    idx = ensure_srp_bucket_index(spark, sf_dir, emb.where(~is_delta))

    tag = "{}_{}".format(
        os.path.basename(sf_dir.rstrip("/")).replace(".", "_"), uuid.uuid4().hex[:8]
    )
    staged = f"/tmp/gcd_etl_stream_semgate_{tag}"
    out_root = f"/tmp/gcd_etl_stream_semgate_out_{tag}"
    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(out_root, ignore_errors=True)
    delta = emb.where(is_delta)
    delta.repartition(4).write.parquet(staged)
    _empty_seed(
        spark, "delta_id long, corpus_id long, dot long, cos_ppm long"
    ).write.parquet(f"{out_root}/batch_id=-1")

    gate = semantic_gate_batch_fn(
        spark, sf_dir, idx, out_root,
        prune=_gate_prune_corpus(sf_dir, "embeddings"),
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(delta.schema)
        .option("maxFilesPerTrigger", "1")
        .load(staged)
    )
    q = stream.writeStream.foreachBatch(gate).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(out_root).select(
        "delta_id", "corpus_id", "dot", "cos_ppm"
    )


def semantic_gate_batch_fn_capped(
    spark, sf_dir: str, idx: DataFrame, out_root: str, prune: bool = False
):
    """foreachBatch worker for the CAPPED semantic ingest gate: same
    sink pattern as semantic_gate_batch_fn, but candidates come from
    the probe-both-keys step shared with the nightly capped delta
    query (dedup._srp_capped_probe_cands), so the gate and the
    nightly boundary can never probe the capped index differently.

    Round 13: the verify's delta side quantizes only the batch
    (see semantic_gate_batch_fn's note). Round 14: ``prune`` — see
    semantic_gate_batch_fn."""
    from gcd_etl_spark.plans.dedup import (
        _srp_capped_probe_cands,
        _srp_quant_frame,
        _srp_verify_delta,
    )

    def gate_batch(batch: DataFrame, batch_id: int) -> None:
        cand = _srp_capped_probe_cands(idx, batch)
        q_b = None
        if prune:
            cand, q_b = _srp_pruned_corpus_quant(spark, sf_dir, cand)
        _srp_verify_delta(
            spark, sf_dir, cand, q_a=_srp_quant_frame(batch), q_b=q_b
        ).write.mode("overwrite").parquet(f"{out_root}/batch_id={batch_id}")

    return gate_batch


def _semantic_gate_capped_oracle() -> str:
    from gcd_etl_spark.plans.dedup import _srp_capped_delta_oracle

    return _srp_capped_delta_oracle()


@query("stream_semantic_dedup_gate_capped", oracle=_semantic_gate_capped_oracle())
def stream_semantic_dedup_gate_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING form of dedup_semantic_delta_vs_corpus_capped —
    the PRODUCTION SemDeDup ingest gate: micro-batches of newly-
    embedded documents are checked against the occupancy-CAPPED
    persisted corpus bucket index (the round-11 32x audit's fix for
    the fixed-width gate's exp-1.35 candidate blowup; measured
    185 s -> 49 s at 32x). Per-arrival cost is O(batch) + one
    bucketed index probe per candidate key; heavy buckets contribute
    only the sub-bucket sharing all wide bits, so a sign-space
    cluster in the corpus cannot flood a batch's candidate set.
    Per-vector verdicts are independent -> union over any batching
    equals the one-shot nightly result; the oracle IS the capped
    nightly query's oracle, value-hash exact. The fixed-width gate
    (stream_semantic_dedup_gate) stays registered as the explicitly-
    labeled anchor; this is the lifecycle-benched default."""
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from gcd_etl_spark.plans.dedup import DELTA_MOD, ensure_srp_bucket_index
    from gcd_etl_spark.sources.catalog import read_table_spread

    emb = read_table_spread(spark, sf_dir, "embeddings")
    is_delta = F.col("vec_id") % DELTA_MOD == 0
    idx = ensure_srp_bucket_index(
        spark, sf_dir, emb.where(~is_delta), capped=True
    )

    tag = "{}_{}".format(
        os.path.basename(sf_dir.rstrip("/")).replace(".", "_"), uuid.uuid4().hex[:8]
    )
    staged = f"/tmp/gcd_etl_stream_semgate_cap_{tag}"
    out_root = f"/tmp/gcd_etl_stream_semgate_cap_out_{tag}"
    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(out_root, ignore_errors=True)
    delta = emb.where(is_delta)
    delta.repartition(4).write.parquet(staged)
    _empty_seed(
        spark, "delta_id long, corpus_id long, dot long, cos_ppm long"
    ).write.parquet(f"{out_root}/batch_id=-1")

    gate = semantic_gate_batch_fn_capped(
        spark, sf_dir, idx, out_root,
        prune=_gate_prune_corpus(sf_dir, "embeddings"),
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(delta.schema)
        .option("maxFilesPerTrigger", "1")
        .load(staged)
    )
    q = stream.writeStream.foreachBatch(gate).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(out_root).select(
        "delta_id", "corpus_id", "dot", "cos_ppm"
    )


# ------------------- streaming QUALITY gate (frozen LM at ingest)
def quality_gate_batch_fn(idx_costs: DataFrame, idx_ctx: DataFrame, out_root: str):
    """foreachBatch worker for the quality ingest gate, shared with
    tests: score the batch's documents against the FROZEN bigram-LM
    artifact (corpus.score_docs_frozen_bigram_lm — the exact code the
    nightly delta query runs) and OVERWRITE the batch's own
    batch_id-keyed partition dir (idempotent under at-least-once
    redelivery — the gate family's sink pattern)."""
    from gcd_etl_spark.plans.corpus import score_docs_frozen_bigram_lm

    def gate_batch(batch: DataFrame, batch_id: int) -> None:
        score_docs_frozen_bigram_lm(batch, idx_costs, idx_ctx).write.mode(
            "overwrite"
        ).parquet(f"{out_root}/batch_id={batch_id}")

    return gate_batch


def _quality_gate_oracle() -> str:
    from gcd_etl_spark.plans.corpus import _bigram_delta_oracle

    return _bigram_delta_oracle()


@query("stream_quality_gate", oracle=_quality_gate_oracle())
def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING form of quality_bigram_nll_delta — the frozen-LM
    perplexity filter as an ingest gate, completing the gate symmetry
    across the three lifecycle families (MinHash bands, SRP buckets,
    and now the LM cost tables each have a nightly delta query AND a
    foreachBatch ingest gate probing the SAME persisted artifact).
    New documents arrive as file-source micro-batches; each batch is
    tokenized and scored against the staged cost tables inside
    foreachBatch — the corpus is never re-counted, per-arrival cost
    is O(batch) + broadcast probes. Per-document scores are
    independent, so the union over ANY batching equals the one-shot
    nightly result — the oracle IS the nightly query's oracle,
    value-hash exact including the integer NLL ladder. State lives in
    storage (LM tables + batch_id-keyed verdict partitions): restart
    is free and replayed batches overwrite their own partition."""
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from gcd_etl_spark.plans.corpus import ensure_bigram_lm_index
    from gcd_etl_spark.plans.dedup import DELTA_MOD
    from gcd_etl_spark.sources.catalog import read_table_spread

    docs = read_table_spread(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % DELTA_MOD == 0
    costs, ctx_all = ensure_bigram_lm_index(spark, sf_dir, docs.where(~is_delta))

    tag = "{}_{}".format(
        os.path.basename(sf_dir.rstrip("/")).replace(".", "_"), uuid.uuid4().hex[:8]
    )
    staged = f"/tmp/gcd_etl_stream_qgate_{tag}"
    out_root = f"/tmp/gcd_etl_stream_qgate_out_{tag}"
    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(out_root, ignore_errors=True)
    delta = docs.where(is_delta)
    delta.repartition(4).write.parquet(staged)
    _empty_seed(
        spark,
        "doc_id long, n_bigrams long, n_unseen long, "
        "nll_total_micro long, nll_mean_micro long",
    ).write.parquet(f"{out_root}/batch_id=-1")

    gate = quality_gate_batch_fn(costs, ctx_all, out_root)
    stream = (
        spark.readStream.format("parquet")
        .schema(delta.schema)
        .option("maxFilesPerTrigger", "1")
        .load(staged)
    )
    q = stream.writeStream.foreachBatch(gate).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(out_root).select(
        "doc_id", "n_bigrams", "n_unseen", "nll_total_micro", "nll_mean_micro"
    )


# ------------------- streaming DSIR gate (frozen model at ingest)
def dsir_gate_batch_fn(model: DataFrame, out_root: str):
    """foreachBatch worker for the DSIR ingest gate, shared with
    tests: weigh the batch's documents against the FROZEN persisted
    target/raw model (corpus.score_docs_frozen_dsir — the exact code
    the nightly delta query runs) and OVERWRITE the batch's own
    batch_id-keyed partition dir (idempotent under at-least-once
    redelivery — the gate family's sink pattern)."""
    from gcd_etl_spark.plans.corpus import score_docs_frozen_dsir

    def gate_batch(batch: DataFrame, batch_id: int) -> None:
        score_docs_frozen_dsir(batch, model).write.mode("overwrite").parquet(
            f"{out_root}/batch_id={batch_id}"
        )

    return gate_batch


def _dsir_gate_oracle() -> str:
    from gcd_etl_spark.plans.corpus import _dsir_delta_oracle

    return _dsir_delta_oracle()


@query("stream_dsir_gate", oracle=_dsir_gate_oracle())
def stream_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING form of corpus_dsir_delta — DSIR importance
    weighting as an ingest gate, extending the gate symmetry to the
    family's fourth lifecycle (MinHash bands, SRP buckets, LM cost
    tables, and now the DSIR bucket-LLR model each have a nightly
    delta query AND a foreachBatch ingest gate probing the SAME
    persisted artifact). New documents arrive as file-source
    micro-batches; each batch is hashed and weighed against the
    frozen <= 513-row model inside foreachBatch — the corpus is never
    re-featurized, per-arrival cost is O(batch) + one broadcast
    probe. Per-document weights are independent, so the union over
    ANY batching equals the one-shot nightly result — the oracle IS
    the nightly query's oracle, value-hash exact including the
    default-row fallback and the integer micro-LLRs. State lives in
    storage (model table + batch_id-keyed verdict partitions):
    restart is free and replayed batches overwrite their own
    partition."""
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from gcd_etl_spark.plans.corpus import DSIR_STANDING_TAG, ensure_dsir_model
    from gcd_etl_spark.plans.dedup import DELTA_MOD
    from gcd_etl_spark.sources.catalog import read_table_spread

    docs = read_table_spread(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % DELTA_MOD == 0
    model = ensure_dsir_model(
        spark, sf_dir, docs.where(~is_delta), filter_tag=DSIR_STANDING_TAG
    )

    tag = "{}_{}".format(
        os.path.basename(sf_dir.rstrip("/")).replace(".", "_"), uuid.uuid4().hex[:8]
    )
    staged = f"/tmp/gcd_etl_stream_dsirgate_{tag}"
    out_root = f"/tmp/gcd_etl_stream_dsirgate_out_{tag}"
    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(out_root, ignore_errors=True)
    delta = docs.where(is_delta)
    delta.repartition(4).write.parquet(staged)
    _empty_seed(
        spark,
        "doc_id long, n_feats long, n_unseen long, "
        "llr_total_micro long, llr_mean_micro long, selected boolean",
    ).write.parquet(f"{out_root}/batch_id=-1")

    gate = dsir_gate_batch_fn(model, out_root)
    stream = (
        spark.readStream.format("parquet")
        .schema(delta.schema)
        .option("maxFilesPerTrigger", "1")
        .load(staged)
    )
    q = stream.writeStream.foreachBatch(gate).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(out_root).select(
        "doc_id",
        "n_feats",
        "n_unseen",
        "llr_total_micro",
        "llr_mean_micro",
        "selected",
    )
