"""Sequential / recursive operators — engine extensions (batch 7).

Three shapes that are awkward in plain SQL but first-class here, each
still carrying a FULL integer value-hash oracle:

* ``ts_ewma_exact`` — exponentially weighted moving average per user
  in EXACT scaled integers: alpha = 1/2 over a 16-event horizon means
  every weight is a power of two, so the recurrence unrolls into a
  fixed 16-lag weighted sum with zero floating point. The standard
  "smoothed metric" feature without the cross-engine float trap.
* ``intervals_merge_coverage`` — gaps-and-islands: merge overlapping
  per-user activity intervals (event + 5 min) and report island count
  + exact covered time. The canonical sessionization-by-overlap,
  solved with one cumulative-max window, no self-join.
* ``graph_bfs_layers`` — multi-source bounded-depth BFS (min hop
  distance from a seed set) over the customer-supplier transaction
  graph: the Pregel iteration as DataFrames (operators/graph.py
  ``bfs_layers``), oracled by unrolled per-layer CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcd_etl_spark.plans.registry import query
from gcd_etl_spark.sources.catalog import read_table

# ------------------------------------------------------- exact EWMA
#: Horizon (number of most-recent events) and the output quantum.
EWMA_K = 16

_EWMA_NUM = " + ".join(
    f"COALESCE(lag_{k}, 0) * {1 << (EWMA_K - 1 - k)}" for k in range(EWMA_K)
)
_EWMA_DEN = " + ".join(
    f"CASE WHEN lag_{k} IS NOT NULL THEN {1 << (EWMA_K - 1 - k)} ELSE 0 END"
    for k in range(EWMA_K)
)
_EWMA_LAGS = ",\n         ".join(
    f"LAG(cents, {k}) OVER (PARTITION BY user_id ORDER BY us) AS lag_{k}"
    for k in range(EWMA_K)
)

_EWMA_ORACLE = f"""
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), lagged AS (
  SELECT user_id, us,
         {_EWMA_LAGS}
  FROM e
), scored AS (
  SELECT user_id, us,
         CAST({_EWMA_NUM} AS BIGINT) AS num,
         CAST({_EWMA_DEN} AS BIGINT) AS den,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us DESC) AS rn
  FROM lagged
)
SELECT user_id, num * 1000000 // den AS ewma_microcents
FROM scored WHERE rn = 1
"""


@query("ts_ewma_exact", oracle=_EWMA_ORACLE)
def ts_ewma_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest per-user EWMA of event value, EXACT: with alpha = 1/2
    truncated at a 16-event horizon, the weight of the k-th most
    recent event is 2^(15-k) — the whole recurrence is a fixed 16-lag
    integer weighted sum (num) over a power-of-two mass (den, which
    also handles users with < 16 events by renormalizing over the
    weights actually present). value -> integer cents first
    (round(value*100), identical on both engines because the product
    is the same IEEE double); result in floor-divided micro-cents.
    No floating point after the cents cast -> full value hash, which
    a double EWMA could never guarantee cross-engine.

    Plan: ONE window over (user_id, time) serves all 16 lags and the
    latest-row filter — a single hash shuffle on user_id, no
    self-join. At 100 TB this is the plan you want: state per row is
    16 integers, and Catalyst collapses the lags into one window
    physical node (verified via explain in tests)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("us")
    lagged = ev.select(
        "user_id",
        "us",
        *[F.lag("cents", k).over(w).alias(f"lag_{k}") for k in range(EWMA_K)],
    )
    num = None
    den = None
    for k in range(EWMA_K):
        wt = 1 << (EWMA_K - 1 - k)
        n_t = F.coalesce(F.col(f"lag_{k}"), F.lit(0)) * wt
        d_t = F.when(F.col(f"lag_{k}").isNotNull(), wt).otherwise(0)
        num = n_t if num is None else num + n_t
        den = d_t if den is None else den + d_t
    scored = lagged.select(
        "user_id",
        "us",
        num.cast("bigint").alias("num"),
        den.cast("bigint").alias("den"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy(F.desc("us")))
        .alias("rn"),
    )
    return scored.where(F.col("rn") == 1).select(
        "user_id", F.expr("num * 1000000 div den").alias("ewma_microcents")
    )


# -------------------------------------------- interval merge coverage
#: Interval length attached to each event (microseconds): 5 minutes.
IVL_US = 300_000_000

_IVL_ORACLE = f"""
WITH iv AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS s,
         CAST(epoch_us(ts) AS BIGINT) + {IVL_US} AS e
  FROM events
), flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                  PARTITION BY user_id ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1)
              THEN 1 ELSE 0 END AS is_new
  FROM iv
), islands AS (
  SELECT user_id, s, e,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY s
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
), merged AS (
  SELECT user_id, island, MIN(s) AS s, MAX(e) AS e
  FROM islands GROUP BY user_id, island
)
SELECT user_id, COUNT(*) AS n_islands,
       CAST(SUM(e - s) AS BIGINT) AS covered_us
FROM merged GROUP BY user_id
"""


@query("intervals_merge_coverage", oracle=_IVL_ORACLE)
def intervals_merge_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: treat each event as a 5-minute activity
    interval, merge overlapping/touching-by-overlap intervals per
    user with ONE cumulative-max window (an interval starts a new
    island iff its start exceeds the max end seen so far), and report
    islands + exact covered microseconds. The no-self-join formulation
    is the scale-correct one: a single hash shuffle on user_id, O(1)
    window state, versus the naive interval self-join's quadratic
    blow-up on active users. Timestamps are exact integer micros
    end-to-end (repo convention: session TZ pinned UTC)."""
    iv = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + IVL_US).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "is_new",
        (F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1))).cast(
            "int"
        ),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("is_new").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("e") - F.col("s")).alias("covered_us"),
    )


# --------------------------------------------------------- BFS layers
#: Seed rule: customer nodes (custkey*2) whose custkey % SEED_MOD = 0.
BFS_SEED_MOD = 200
BFS_HOPS = 3

_BFS_EDGES = """
pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node_id FROM edges)
"""

_BFS_ORACLE = f"""
WITH {_BFS_EDGES},
d0 AS (
  SELECT node_id FROM nodes
  WHERE node_id % 2 = 0 AND (node_id // 2) % {BFS_SEED_MOD} = 0
),
f1 AS (
  SELECT DISTINCT e.dst AS node_id FROM edges e
  JOIN d0 ON e.src = d0.node_id
  WHERE e.dst NOT IN (SELECT node_id FROM d0)
),
f2 AS (
  SELECT DISTINCT e.dst AS node_id FROM edges e
  JOIN f1 ON e.src = f1.node_id
  WHERE e.dst NOT IN (SELECT node_id FROM d0)
    AND e.dst NOT IN (SELECT node_id FROM f1)
),
f3 AS (
  SELECT DISTINCT e.dst AS node_id FROM edges e
  JOIN f2 ON e.src = f2.node_id
  WHERE e.dst NOT IN (SELECT node_id FROM d0)
    AND e.dst NOT IN (SELECT node_id FROM f1)
    AND e.dst NOT IN (SELECT node_id FROM f2)
)
SELECT 0 AS dist, COUNT(*) AS n_nodes FROM d0
UNION ALL SELECT 1, COUNT(*) FROM f1
UNION ALL SELECT 2, COUNT(*) FROM f2
UNION ALL SELECT 3, COUNT(*) FROM f3
"""


@query("graph_bfs_layers", oracle=_BFS_ORACLE)
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the customer-supplier transaction graph
    (same bipartite node encoding as graph_pagerank): minimum hop
    distance from the seed customers (custkey % 200 = 0), depth <= 3,
    reported as per-layer node counts. The DataFrame Pregel loop
    (operators/graph.py bfs_layers: frontier join + anti-join per
    hop, localCheckpoint lineage truncation) against fully unrolled
    per-layer SQL CTEs — a complete value-hash oracle for an
    iterative graph traversal. Per hop the only shuffle keys are
    node ids; a fixed hop budget keeps the job graph static."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    nodes = (
        edges.select(F.col("src").alias("node_id")).distinct()
    )
    seeds = nodes.where(
        (F.col("node_id") % 2 == 0)
        & ((F.col("node_id") / 2).cast("bigint") % BFS_SEED_MOD == 0)
    )
    from gcd_etl_spark.operators.graph import bfs_layers

    visited = bfs_layers(edges, seeds, hops=BFS_HOPS)
    counts = visited.groupBy("dist").agg(F.count(F.lit(1)).alias("cnt"))
    # Static 0..hops spine: a layer the frontier never reached still
    # reports 0 (the oracle's per-layer COUNT(*) does), and the row
    # count is schema-stable across scale factors.
    spine = spark.range(BFS_HOPS + 1).select(F.col("id").cast("int").alias("dist"))
    return spine.join(counts, "dist", "left").select(
        "dist", F.coalesce(F.col("cnt"), F.lit(0)).alias("n_nodes")
    )


# --------------------------------------------------- sessionize ids
#: Session gap (microseconds): a >30-min silence starts a new session.
SESSION_GAP_US = 30 * 60 * 1_000_000

_SESSIONIZE_ORACLE = f"""
WITH q AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
b AS (
  SELECT user_id, event_id, us,
         CASE WHEN us - LAG(us) OVER w > {SESSION_GAP_US}
                   OR LAG(us) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM q WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT user_id, event_id, us, is_start,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
  FROM b
)
SELECT user_id, event_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                               ORDER BY us, event_id) AS BIGINT) AS pos_in_session,
       MIN(us) OVER (PARTITION BY user_id, session_seq) AS session_start_us
FROM s
"""


@query("events_sessionize_ids", oracle=_SESSIONIZE_ORACLE)
def events_sessionize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT session assignment (gaps-and-islands): each event
    gets its user's running session number, its position inside that
    session, and the session's start time — the enrichment form of
    sessionization that win_session/intervals_merge_coverage only
    expose as aggregates, and the precursor every behavioral join
    (funnel-within-session, path-within-session) builds on.

    One (user_id) shuffle carries all three window passes — the
    boundary LAG, the running-sum island numbering, and the
    per-session position/start — because every window is keyed by
    user_id (+ the derived session_seq), so Catalyst plans a single
    exchange + sort. All integers (event-time microseconds; strict
    ``>`` gap rule with (us, event_id) total order)."""
    q = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    b = q.withColumn(
        "is_start",
        F.when(
            (F.col("us") - F.lag("us").over(w) > SESSION_GAP_US)
            | F.lag("us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    s = b.withColumn(
        "session_seq",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    ws = Window.partitionBy("user_id", "session_seq")
    return s.select(
        "user_id",
        "event_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        F.row_number()
        .over(ws.orderBy("us", "event_id"))
        .cast("long")
        .alias("pos_in_session"),
        F.min("us").over(ws).alias("session_start_us"),
    )


# ------------------------------------------------ peak/valley runs
_PEAKS_ORACLE = """
WITH q AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS x
  FROM events
),
s AS (
  SELECT user_id, x,
         ROW_NUMBER() OVER w AS k,
         LAG(x) OVER w AS prev,
         LEAD(x) OVER w AS nxt,
         CASE WHEN x > LAG(x) OVER w THEN 1 ELSE 0 END AS up
  FROM q WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
runs AS (
  SELECT user_id, k - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY k)
           AS island
  FROM s WHERE up = 1
),
longest AS (
  SELECT user_id, MAX(run_len) AS longest_up_run
  FROM (SELECT user_id, island, COUNT(*) AS run_len
        FROM runs GROUP BY user_id, island)
  GROUP BY user_id
)
SELECT s.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                      AND prev < x AND x > nxt THEN 1 ELSE 0 END) AS BIGINT)
         AS n_peaks,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                      AND prev > x AND x < nxt THEN 1 ELSE 0 END) AS BIGINT)
         AS n_valleys,
       CAST(COALESCE(MIN(longest.longest_up_run), 0) AS BIGINT)
         AS longest_up_run
FROM s LEFT JOIN longest ON longest.user_id = s.user_id
GROUP BY s.user_id
"""


@query("window_pattern_peaks", oracle=_PEAKS_ORACLE)
def window_pattern_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric shape detection per user series — strict local peaks,
    strict valleys, and the longest strictly-rising run (the
    MATCH_RECOGNIZE ``A B+ C`` family on VALUES, complementing
    events_streak_runs' categorical runs): the building blocks of
    technical-indicator and spike-mining pipelines.

    One (user) shuffle carries LAG/LEAD/ROW_NUMBER; the rising-run
    length is gaps-and-islands on the up-step flag (``k - rn``
    grouping — no iteration, no fold); everything compares quantized
    BIGINTs, strict inequalities so ties (flat steps) break runs
    identically on both engines."""
    q = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("long").alias("x"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    s = q.select(
        "user_id",
        "x",
        F.row_number().over(w).alias("k"),
        F.lag("x").over(w).alias("prev"),
        F.lead("x").over(w).alias("nxt"),
        F.when(F.col("x") > F.lag("x").over(w), 1).otherwise(0).alias("up"),
    )
    runs = s.where("up = 1").select(
        "user_id",
        (
            F.col("k")
            - F.row_number().over(Window.partitionBy("user_id").orderBy("k"))
        ).alias("island"),
    )
    longest = (
        runs.groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("user_id")
        .agg(F.max("run_len").alias("longest_up_run"))
    )
    peak = (
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("prev") < F.col("x"))
        & (F.col("x") > F.col("nxt"))
    )
    valley = (
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("prev") > F.col("x"))
        & (F.col("x") < F.col("nxt"))
    )
    return (
        s.join(longest, "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum(peak.cast("long")).cast("long").alias("n_peaks"),
            F.sum(valley.cast("long")).cast("long").alias("n_valleys"),
            F.coalesce(F.min("longest_up_run"), F.lit(0))
            .cast("long")
            .alias("longest_up_run"),
        )
    )


# ------------------------------------- seasonal decomposition (STL-ish)
#: Season length (weekday cycle over the orders timeline) and the
#: centered moving-average window (one full season).
SEASON_LEN = 7

_SEASONAL_ORACLE = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
ma AS (
  SELECT day, cents,
         CAST(SUM(cents) OVER w AS BIGINT) AS wsum,
         CAST(COUNT(*) OVER w AS BIGINT) AS wcnt
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
tr AS (
  SELECT day, cents,
         CAST(floor(CAST(wsum AS DOUBLE) * 1000 / {SEASON_LEN} + 0.5) AS BIGINT)
           AS trend_milli
  FROM ma WHERE wcnt = {SEASON_LEN}
),
de AS (
  SELECT day, cents, trend_milli,
         cents * 1000 - trend_milli AS detrended_milli,
         day % {SEASON_LEN} AS dow
  FROM tr
),
seas AS (
  SELECT dow,
         CAST(floor(CAST(SUM(detrended_milli) AS DOUBLE) / COUNT(*) + 0.5)
              AS BIGINT) AS seasonal_milli
  FROM de GROUP BY dow
)
SELECT d.day, d.cents, d.trend_milli, s.seasonal_milli,
       CAST(d.detrended_milli - s.seasonal_milli AS BIGINT) AS resid_milli
FROM de d JOIN seas s USING (dow)
"""


@query("ts_seasonal_decompose", oracle=_SEASONAL_ORACLE)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    STL ancestor): daily order revenue splits into trend (centered
    7-observation moving average, full windows only), a weekday
    seasonal component (per-weekday mean of the detrended series),
    and the residual — the anomaly-detection prep step that separates
    'it is Sunday' from 'something broke'. Integer cents in, every
    component an exact integer milli-unit out; the two divisions run
    as the repo's fixed scalar IEEE sequence on exact integer
    moments, so the decomposition is deterministic cross-engine (and
    trivially invertible: cents*1000 = trend + seasonal + resid).

    Scale shape: one date-keyed aggregate over the fact table (the
    only data-sized shuffle), then windows/joins over the DAYS-sized
    daily series — years of days is thousands of rows; the window
    ordering cost lives on the tiny side, as in stat_zipf_fit."""
    from pyspark.sql import Window as W

    from gcd_etl_spark.sources.catalog import read_table

    orders = read_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .cast("bigint")
            .alias("day"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    w = W.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("wsum"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("wcnt"),
    )
    tr = ma.where(F.col("wcnt") == SEASON_LEN).select(
        "day",
        "cents",
        F.floor(F.col("wsum").cast("double") * 1000 / SEASON_LEN + 0.5)
        .cast("bigint")
        .alias("trend_milli"),
    )
    de = tr.select(
        "day",
        "cents",
        "trend_milli",
        (F.col("cents") * 1000 - F.col("trend_milli")).alias("detrended_milli"),
        (F.col("day") % SEASON_LEN).alias("dow"),
    )
    seas = de.groupBy("dow").agg(
        F.floor(
            F.sum("detrended_milli").cast("double") / F.count(F.lit(1)) + 0.5
        )
        .cast("bigint")
        .alias("seasonal_milli")
    )
    return de.join(F.broadcast(seas), "dow").select(
        "day",
        "cents",
        "trend_milli",
        "seasonal_milli",
        (F.col("detrended_milli") - F.col("seasonal_milli"))
        .cast("bigint")
        .alias("resid_milli"),
    )
