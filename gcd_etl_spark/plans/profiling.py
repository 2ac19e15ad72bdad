"""Dataset profiling + slowly-changing-dimension history.

Two capabilities a 100 TB training-data pipeline needs around the
core ETL (neither exists in the reference — its only "profiling" is
the progress counters at Main.java:355-357):

* ``profile_columns`` — one-pass column statistics (row/null/distinct
  counts, min/max) for curation dashboards and schema-drift alerts.
  ALL columns' aggregates run in a SINGLE aggregation pass (one scan,
  map-side partials, one single-row reduce), then the wide row is
  unpivoted driver-side-free with ``stack``. The 100 TB shape: cost
  is one scan regardless of column count; no per-column jobs.
* ``scd2_history`` — type-2 dimension reconstruction over the events
  CDC feed: each (user, ts) state change becomes a validity interval
  ``[valid_from, valid_to)`` with a version number and a current
  flag. One window shuffle on the entity key; interval arithmetic in
  epoch micros so the DuckDB oracle compares integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcd_etl_spark.plans.registry import query
from gcd_etl_spark.sources.catalog import read_table

#: documents columns profiled (closed set -> stable output schema).
_PROFILE_COLS = ("doc_id", "lang", "source", "n_chars", "text")


def _profile_oracle() -> str:
    parts = [
        f"""
SELECT '{c}' AS col_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_val,
       CAST(MAX({c}) AS VARCHAR) AS max_val
FROM documents"""
        for c in _PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts)


def profile_frame(df: DataFrame, cols: tuple[str, ...], exact_distinct: bool = True) -> DataFrame:
    """Column profiler core: (rows, nulls, distincts, min, max) for
    every named column from ONE aggregation over ONE scan; the wide
    single-row aggregate is unpivoted to (col_name, metrics) rows
    with ``stack``, so profiling N columns costs the same scan as
    profiling one. Values surface as strings for a uniform schema.

    ``exact_distinct`` picks the distinct strategy. Exact
    multi-column COUNT(DISTINCT) compiles to Spark's Expand plan —
    the input is replicated (1 + n_cols)x before the shuffle, which
    is the right trade only while the table is scan-bound. At 100 TB
    pass ``exact_distinct=False``: HLL++ sketches
    (``approx_count_distinct``, 2% rsd) keep fixed-size map-side
    state, no Expand, one ordinary reduce — the same posture as
    ``agg_approx_distinct`` (plans/relational.py).
    """
    ndv = F.countDistinct if exact_distinct else (lambda c: F.approx_count_distinct(c, 0.02))
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            ndv(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_rows, n_null, n_distinct, min_val, max_val)"
    )


@query("profile_columns", oracle=_profile_oracle())
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over documents, exact-distinct form (the
    DuckDB oracle needs exact NDVs; see profile_frame for the
    sketch-based 100 TB form)."""
    return profile_frame(read_table(spark, sf_dir, "documents"), _PROFILE_COLS)


@query(
    "scd2_history",
    oracle="""
SELECT user_id,
       ROW_NUMBER() OVER w AS version,
       epoch_us(ts) AS valid_from_us,
       LEAD(epoch_us(ts)) OVER w AS valid_to_us,
       CASE WHEN LEAD(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_current,
       event_type,
       value
FROM events
WHERE user_id % 7 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
""",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 reconstruction: a CDC feed of (entity, ts, state)
    rows becomes versioned validity intervals — ``valid_to`` is the
    NEXT change's timestamp (half-open), NULL marks the current row.
    ONE shuffle (the window partition on the entity key); ordering is
    (ts, event_id) so timestamp ties stay deterministic on both
    engines. The user_id filter keeps the driver's collect bounded;
    the plan is row-count-free."""
    ev = read_table(spark, sf_dir, "events").where(F.col("user_id") % 7 == 0)
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    valid_to = F.lead(us).over(w)
    return ev.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        us.alias("valid_from_us"),
        valid_to.alias("valid_to_us"),
        valid_to.isNull().cast("int").alias("is_current"),
        "event_type",
        "value",
    )


@query(
    "scd2_point_in_time",
    oracle="""
WITH s AS (
  SELECT user_id, ts, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS dup_rn
  FROM events WHERE event_type = 'signup'
),
c AS (
  SELECT user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts)) AS version
  FROM s WHERE dup_rn = 1
),
p AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_us,
       c.version, c.value AS attr_value, epoch_us(c.ts) AS valid_from_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) lookup against a versioned dimension — the
    read side of scd2_history: each purchase retrieves the signup
    version in force AT its event time (latest change at-or-before;
    purchases before any version get NULLs — the half-open SCD2
    interval semantics without ever materializing intervals). Built
    on operators/asof.py — union + carry-forward, ONE shuffle on the
    entity key, no range-join explosion — and held to DuckDB's
    NATIVE ASOF LEFT JOIN. Equal-timestamp changes dedup to the
    highest event_id first (both engines), because as-of matching is
    undefined under duplicate right timestamps."""
    from gcd_etl_spark.operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    dup = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    s = (
        ev.where(F.col("event_type") == "signup")
        .withColumn("dup_rn", F.row_number().over(dup))
        .where(F.col("dup_rn") == 1)
    )
    ver = Window.partitionBy("user_id").orderBy(F.unix_micros("ts").asc())
    changes = s.select(
        "user_id",
        "ts",
        F.col("value").alias("attr_value"),
        F.row_number().over(ver).alias("version"),
    )
    probes = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    m = asof_join(probes, changes, key="user_id", ts="ts")
    return m.select(
        "user_id",
        "purchase_id",
        F.unix_micros("ts").alias("purchase_us"),
        "version",
        "attr_value",
        F.unix_micros("asof_ts").alias("valid_from_us"),
    )


# ------------------------------ in-flight observed metrics (round 7)
_OBSERVE_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_value,
       CAST(SUM(CASE WHEN value > 250 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high_value,
       MAX(value) AS max_value,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
FROM events
"""


@query("dq_observed_metrics", oracle=_OBSERVE_ORACLE)
def dq_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality counters collected IN-FLIGHT via the
    ``Observation`` API — the production pattern for pipeline
    metrics: the observed aggregates (row count, null count, value
    and timestamp bounds) are computed as a side effect of the SAME
    job that does the business pass (here a per-type count
    materialized through the noop sink), not by a second scan of the
    data. At 100 TB that is the difference between free metrics and
    doubling the nightly read volume; the profile_columns query is
    the complementary dedicated-pass form. The observed values are
    returned as the result row and held to a direct SQL restatement,
    so the mechanism itself (metrics attach to the pass, survive the
    action, arrive exact) is what the oracle checks."""
    from pyspark.sql import Observation

    events = read_table(spark, sf_dir, "events")
    obs = Observation("dq_metrics")
    observed = events.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_value"),
        # the fixture's value column is never null, so a second,
        # data-dependent counter keeps the mechanism non-vacuous
        F.sum(F.when(F.col("value") > 250, 1).otherwise(0))
        .cast("long")
        .alias("n_high_value"),
        F.max("value").alias("max_value"),
        F.min(F.unix_micros("ts")).alias("min_ts_us"),
        F.max(F.unix_micros("ts")).alias("max_ts_us"),
    )
    # the business pass the metrics ride on (full execution, no
    # second scan for the metrics themselves)
    observed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    ).write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_null_value"],
                m["n_high_value"],
                m["max_value"],
                m["min_ts_us"],
                m["max_ts_us"],
            )
        ],
        "n_rows long, n_null_value long, n_high_value long, "
        "max_value double, min_ts_us long, max_ts_us long",
    )
