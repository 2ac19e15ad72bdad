"""Event-time window query plans over the ``events`` table.

Tumbling / sliding / session windows in batch form (SURVEY.md §2.9 —
the reference has none; this is engine surface). Oracles restate the
window algebra in portable SQL: epoch bucketing for fixed windows,
gaps-and-islands for sessions. Window bounds are epoch seconds.

``events.ts`` is TIMESTAMP(NANOS) in parquet; the engine reads it as
microsecond-truncated timestamp (see sources/catalog.py), and oracles
compute on ``epoch_us(ts)`` integer arithmetic to match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcd_etl_spark.operators import windows as W
from gcd_etl_spark.plans.registry import query
from gcd_etl_spark.sources.catalog import read_table

#: DuckDB: exact value sum as decimal -> double (matches exact_sum).
_V = "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"


@query(
    "win_tumbling",
    oracle=f"""
SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {_V} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type."""
    return W.tumbling_agg(read_table(spark, sf_dir, "events"), "1 hour")


@query(
    "win_sliding",
    oracle=f"""
WITH e AS (SELECT epoch_us(ts) // 1000000 AS sec, value FROM events),
     x AS (
  SELECT (sec // 1800) * 1800 - k * 1800 AS window_start, value
  FROM e CROSS JOIN (SELECT UNNEST([0, 1]) AS k)
  WHERE sec >= (sec // 1800) * 1800 - k * 1800
    AND sec < (sec // 1800) * 1800 - k * 1800 + 3600
)
SELECT window_start, COUNT(*) AS n_events, {_V} AS total_value
FROM x GROUP BY 1
""",
)
def win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in
    exactly 2 windows)."""
    return W.sliding_agg(read_table(spark, sf_dir, "events"), "1 hour", "30 minutes")


@query(
    "win_session",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                   >= 600000000
              OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), g AS (
  SELECT user_id, us, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM e
)
SELECT user_id,
       MIN(us) // 1000000 AS session_start_sec,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM g GROUP BY user_id, sess
""",
)
def win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (10-minute inactivity gap).

    The oracle is the classic gaps-and-islands formulation; Spark uses
    the native ``session_window``. Session start is floor'd to seconds
    for comparison (event timestamps are microsecond-precise).
    """
    events = read_table(spark, sf_dir, "events")
    out = W.session_agg(events, "10 minutes")
    return out.select(
        "user_id",
        F.col("session_start").alias("session_start_sec"),
        "n_events",
        "total_value",
    )


@query(
    "window_rolling_range",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
)
SELECT event_id, user_id, us,
       COUNT(*) OVER w AS n_24h,
       CAST(SUM(v) OVER w AS DOUBLE) AS value_24h
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
""",
)
def window_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-24h activity (count + exact decimal value
    sum) via a RANGE-framed window in integer microseconds — the
    time-anchored rolling aggregate that tumbling windows can't
    express (every event gets ITS OWN trailing frame, not a shared
    bucket). RANGE frames include all timestamp ties on both
    engines, and the frame bound is integer arithmetic, so the
    result is exact. One shuffle on the entity key; at 100 TB the
    frame scan per partition is monotone two-pointer work over the
    per-user sorted run, the same cost class as a session window."""
    e = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-86_400_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "us",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.sum("v").over(w).cast("double").alias("value_24h"),
    )


@query(
    "rollup_time_hierarchy",
    oracle="""
WITH h AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS bucket_start,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS v
  FROM events GROUP BY 1
), d AS (
  SELECT (bucket_start // 86400) * 86400 AS bucket_start,
         CAST(SUM(n_events) AS BIGINT) AS n_events,
         CAST(SUM(v) AS DECIMAL(28,2)) AS v
  FROM h GROUP BY 1
), m AS (
  SELECT (bucket_start // 2592000) * 2592000 AS bucket_start,
         CAST(SUM(n_events) AS BIGINT) AS n_events,
         CAST(SUM(v) AS DECIMAL(28,2)) AS v
  FROM d GROUP BY 1
)
SELECT 'hour' AS grain, bucket_start, n_events, CAST(v AS DOUBLE) AS total_value FROM h
UNION ALL
SELECT 'day', bucket_start, n_events, CAST(v AS DOUBLE) FROM d
UNION ALL
SELECT 'month', bucket_start, n_events, CAST(v AS DOUBLE) FROM m
""",
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy: hourly
    buckets aggregated from raw events ONCE, daily derived from
    hourly, monthly (30-day epoch buckets) from daily — each level
    re-aggregates |previous level| rows, not the raw stream, which
    is the entire point of a rollup hierarchy at 100 TB (the hourly
    level is the only scan-scale aggregation; a production deployment
    materializes it incrementally and the coarser grains are
    near-free). The hourly level is localCheckpoint'ed so the
    three-level union reads ONE materialization instead of
    re-running the scan per grain (the kmeans-assignment precedent).
    Decimal sums keep every level exact; re-aggregated totals are
    associative by construction."""
    e = read_table(spark, sf_dir, "events").select(
        F.expr(
            "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) div 3600000000"
        ).alias("hour_idx"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    hourly = (
        e.groupBy((F.col("hour_idx") * 3600).alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("decimal(28,2)").alias("v"),
        )
        .localCheckpoint(eager=False)
    )

    def _coarsen(df: DataFrame, seconds: int) -> DataFrame:
        b = (F.floor(F.col("bucket_start") / seconds) * seconds).cast("bigint")
        return df.groupBy(b.alias("bucket_start")).agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("v").cast("decimal(28,2)").alias("v"),
        )

    daily = _coarsen(hourly, 86_400).localCheckpoint(eager=False)
    monthly = _coarsen(daily, 2_592_000)

    def _grain(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("grain"),
            "bucket_start",
            "n_events",
            F.col("v").cast("double").alias("total_value"),
        )

    return (
        _grain(hourly, "hour")
        .unionByName(_grain(daily, "day"))
        .unionByName(_grain(monthly, "month"))
    )


#: Incremental-maintenance split: events at/after this instant are the
#: "new arrivals" delta; before it, the already-materialized base.
#: (Same 2024-01-16 midpoint as the streaming late-data split.)
ROLLUP_DELTA_SPLIT_US = 1_705_363_200_000_000


@query(
    "rollup_incremental_merge",
    oracle="""
SELECT (epoch_us(ts) // 3600000000) * 3600 AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
""",
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the hourly rollup is built
    as TWO partial-state aggregations — a "base" over the first half
    of the timeline (standing in for the already-materialized
    aggregate table) and a "delta" over the new arrivals — merged by
    re-aggregating the partial states (counts and decimal sums add;
    mins/maxes fold). The oracle is the from-scratch rollup: merging
    partials must be indistinguishable from recomputing, which is
    the algebraic property (commutative-monoid states) that makes
    incremental materialized-view maintenance correct at all.

    Scale story: at 100 TB the base is |buckets| pre-aggregated rows
    read back from the rollup table — the daily refresh scans ONLY
    the delta partition and re-aggregates states, never raw history
    (the hypertable-refresh counterpart of rollup_time_hierarchy's
    grain cascade). Decimal sums keep the merge exact — float
    partials would make merged-vs-recomputed differ by summation
    order, breaking the maintenance invariant this query proves."""
    e = read_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.col("value").alias("raw_v"),
    )

    def hourly_states(df: DataFrame) -> DataFrame:
        bucket = ((F.col("us") - F.pmod(F.col("us"), 3_600_000_000)) / 1_000_000).cast("bigint")
        return df.groupBy(
            bucket.alias("bucket_start"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").alias("sum_v"),
            F.min("raw_v").alias("min_value"),
            F.max("raw_v").alias("max_value"),
        )

    base = hourly_states(e.where(F.col("us") < ROLLUP_DELTA_SPLIT_US))
    delta = hourly_states(e.where(F.col("us") >= ROLLUP_DELTA_SPLIT_US))
    merged = (
        base.unionByName(delta)
        .groupBy("bucket_start", "event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    return merged.select(
        "bucket_start",
        "event_type",
        "n_events",
        F.col("sum_v").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    )


#: Interval-overlap session families: browse vs transact event types.
#: The gap is 6 h, not win_session's 10 min: the synthetic stream
#: averages ~11 h between a user's events, so 10-min sessions are
#: all singletons and the overlap set is vacuously empty — a 6 h
#: gap yields real multi-event intervals (and a non-trivial overlap
#: join) at every fixture scale.
OVERLAP_GAP_US = 21_600_000_000

_OVERLAP_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
),
browse AS (
  SELECT user_id, us, event_id FROM e WHERE event_type IN ('view', 'click')
),
b2 AS (
  SELECT user_id, us,
         CASE WHEN LAG(us) OVER w IS NULL
                OR us - LAG(us) OVER w >= {OVERLAP_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM browse
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
b3 AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM b2
),
bs AS (
  SELECT user_id, MIN(us) AS b_start, MAX(us) AS b_end
  FROM b3 GROUP BY user_id, sess
),
buy AS (
  SELECT user_id, us, event_id FROM e WHERE event_type IN ('purchase', 'signup')
),
t2 AS (
  SELECT user_id, us,
         CASE WHEN LAG(us) OVER w IS NULL
                OR us - LAG(us) OVER w >= {OVERLAP_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM buy
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
t3 AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM t2
),
ts AS (
  SELECT user_id, MIN(us) AS t_start, MAX(us) AS t_end
  FROM t3 GROUP BY user_id, sess
)
SELECT b.user_id,
       b.b_start AS browse_start_us, b.b_end AS browse_end_us,
       t.t_start AS buy_start_us, t.t_end AS buy_end_us,
       LEAST(b.b_end, t.t_end) - GREATEST(b.b_start, t.t_start) AS overlap_us
FROM bs b JOIN ts t
  ON b.user_id = t.user_id
 AND b.b_start <= t.t_end AND t.t_start <= b.b_end
"""


@query("join_interval_overlap", oracle=_OVERLAP_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join between two session families: each
    user's browse sessions (view/click, 10-min gap islands) joined
    to their transact sessions (purchase/signup) wherever the
    closed intervals intersect — "was a purchase session concurrent
    with a browse session", with the exact overlap duration.

    Plan shape: each side is ONE window pass (gaps-and-islands break
    flags + running sum — the win_session algebra) and a grouped
    min/max; the overlap join is an equi-join ON THE USER KEY with
    the interval inequality as a residual filter, so work per user
    is |sessions|² of that user, never a global interval cross.
    (Keyless interval overlap at 100 TB buckets intervals onto a
    time grid and equi-joins on the bucket — the range_join_events
    discipline; here the natural user key already bounds it.)"""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("us")
    )

    def sessions(types: tuple[str, str], start_col: str, end_col: str) -> DataFrame:
        side = ev.where(F.col("event_type").isin(*types))
        w = Window.partitionBy("user_id").orderBy(F.col("us").asc(), F.col("event_id").asc())
        brk = (
            F.when(
                F.lag("us").over(w).isNull()
                | (F.col("us") - F.lag("us").over(w) >= OVERLAP_GAP_US),
                1,
            )
            .otherwise(0)
        )
        run = Window.partitionBy("user_id").orderBy(F.col("us").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        marked = side.select("user_id", "us", brk.alias("brk"))
        sess = marked.select(
            "user_id", "us", F.sum("brk").over(run).alias("sess")
        )
        return sess.groupBy("user_id", "sess").agg(
            F.min("us").alias(start_col), F.max("us").alias(end_col)
        ).drop("sess")

    bs = sessions(("view", "click"), "browse_start_us", "browse_end_us")
    ts_ = sessions(("purchase", "signup"), "buy_start_us", "buy_end_us")
    j = bs.join(ts_, "user_id").where(
        (F.col("browse_start_us") <= F.col("buy_end_us"))
        & (F.col("buy_start_us") <= F.col("browse_end_us"))
    )
    return j.select(
        "user_id",
        "browse_start_us",
        "browse_end_us",
        "buy_start_us",
        "buy_end_us",
        (
            F.least("browse_end_us", "buy_end_us")
            - F.greatest("browse_start_us", "buy_start_us")
        ).alias("overlap_us"),
    )


# ------------------------------------------------ nearest-event join
_NEAREST_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_custkey AS user_id,
         epoch_us(o_orderdate) AS t_us
  FROM orders
),
e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
prev AS (
  SELECT o.o_orderkey, MAX(e.us) AS prev_us
  FROM o JOIN e ON e.user_id = o.user_id AND e.us <= o.t_us
  GROUP BY o.o_orderkey
),
nxt AS (
  SELECT o.o_orderkey, MIN(e.us) AS next_us
  FROM o JOIN e ON e.user_id = o.user_id AND e.us > o.t_us
  GROUP BY o.o_orderkey
)
SELECT o.o_orderkey, o.user_id, o.t_us, prev.prev_us, nxt.next_us,
       CASE
         WHEN prev.prev_us IS NULL AND nxt.next_us IS NULL THEN NULL
         WHEN nxt.next_us IS NULL THEN prev.prev_us
         WHEN prev.prev_us IS NULL THEN nxt.next_us
         WHEN o.t_us - prev.prev_us <= nxt.next_us - o.t_us THEN prev.prev_us
         ELSE nxt.next_us
       END AS nearest_us
FROM o
LEFT JOIN prev ON prev.o_orderkey = o.o_orderkey
LEFT JOIN nxt ON nxt.o_orderkey = o.o_orderkey
"""


@query("asof_join_nearest", oracle=_NEAREST_ORACLE)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-event temporal join: each order finds its user's
    closest event in time on EITHER side (backward like a plain
    as-of, or forward), tie to the earlier event — the semantic a
    point-in-time feature join wants when 'most recent' is wrong for
    sparse entities (asof_join_events covers the backward-only case).

    Spark side is the MERGE shape, not the oracle's per-side
    aggregate joins: both tables union into one (user_id)-keyed
    stream sorted by (us, kind) — events sort before orders at equal
    timestamps so the backward pass sees same-instant events (<=)
    and the forward pass excludes them (strict >) BY THE SORT ORDER
    alone — then one running MAX gives every order its previous
    event and one reversed running MIN its next. Two window passes
    over a single shuffle, linear at any scale, against the oracle's
    O(orders x user-events) restatement DuckDB can afford at sf0.01.
    All integer microseconds, including the tie rule
    ``t - prev <= next - t``.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        F.expr("unix_micros(cast(o_orderdate as timestamp))").alias("us"),
        F.lit(1).alias("kind"),
    )
    e = read_table(spark, sf_dir, "events").select(
        F.lit(None).cast("long").alias("o_orderkey"),
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.lit(0).alias("kind"),
    )
    u = e.unionByName(o.select("o_orderkey", "user_id", "us", "kind"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ev_us = F.when(F.col("kind") == 0, F.col("us"))
    m = u.select(
        "o_orderkey",
        "user_id",
        "us",
        "kind",
        F.max(ev_us).over(wb).alias("prev_us"),
        F.min(ev_us).over(wf).alias("next_us"),
    ).where(F.col("kind") == 1)
    nearest = (
        F.when(F.col("prev_us").isNull() & F.col("next_us").isNull(), F.lit(None))
        .when(F.col("next_us").isNull(), F.col("prev_us"))
        .when(F.col("prev_us").isNull(), F.col("next_us"))
        .when(
            F.col("us") - F.col("prev_us") <= F.col("next_us") - F.col("us"),
            F.col("prev_us"),
        )
        .otherwise(F.col("next_us"))
    )
    return m.select(
        "o_orderkey",
        "user_id",
        F.col("us").alias("t_us"),
        "prev_us",
        "next_us",
        nearest.cast("long").alias("nearest_us"),
    )
