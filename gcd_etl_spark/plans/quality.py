"""Data-quality + distribution operators — engine extensions.

Four capabilities a 100 TB training-data pipeline runs continuously
over its fact tables (none exist in the reference, whose only
validation is silent NumberFormatException tolerance,
Main.java:556-573):

* ``dq_expectations`` — a declarative expectation suite (uniqueness,
  referential integrity, null-rate, range) evaluated as ONE report
  DataFrame; the Great-Expectations/Deequ shape re-expressed as
  plain aggregates + anti-joins.
* ``agg_histogram`` — fixed-width histogram of a numeric column as a
  single groupBy over a codegen'd bucket expression.
* ``agg_percentiles_exact`` — exact per-group discrete percentiles
  (PERCENTILE_DISC) via one window rank pass, no interpolation —
  selected values come FROM the data, so the oracle compares exactly
  with zero float-rounding risk.
* ``sketch_heavy_hitters`` — count-min sketch over a key column with
  the engine-portable md5 hash family (operators/dedup.py
  portable_hash64), estimates joined back against exact counts so the
  CMS overcount is *visible in the result* (est >= exact always;
  the driver hash-checks the whole sketch, not just a bound flag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcd_etl_spark.plans.registry import query
from gcd_etl_spark.sources.catalog import read_table

# ---------------------------------------------------- dq expectations
_DQ_ORACLE = """
SELECT 'orders_pk_unique' AS check_name,
       COUNT(*) AS n_checked,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'lineitem_fk_orders',
       COUNT(*),
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'orders_totalprice_positive',
       COUNT(*),
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_discount_range',
       COUNT(*),
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
            AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_shipdate_nonnull',
       COUNT(*),
       CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'customer_name_nonnull',
       COUNT(*),
       CAST(COUNT(*) - COUNT(c_name) AS BIGINT)
FROM customer
"""


@query("dq_expectations", oracle=_DQ_ORACLE)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report: six expectations (primary-key
    uniqueness, FK referential integrity, range, null-rate) each one
    row of (check_name, n_checked, n_violations).

    Plan shape per check family: same-table expectations fold into
    single aggregate passes (one scan each, map-side partials); the
    FK check is ONE left join counted on the probe side — at 100 TB
    the join shuffles on the key like any fact-fact join and is the
    honest cost of exact referential verification (the cheap screen
    first is ``join_bloom_pruned``'s bloom pass, plans/relational).
    """
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cust = read_table(spark, sf_dir, "customer")
    big = F.count(F.lit(1))

    def chk(name, checked, violations):
        return F.struct(
            F.lit(name).alias("check_name"),
            checked.alias("n_checked"),
            violations.cast("bigint").alias("n_violations"),
        )

    # orders: two expectations, ONE scan/aggregate
    o_checks = orders.agg(
        chk("orders_pk_unique", big, big - F.countDistinct("o_orderkey")).alias("a"),
        chk(
            "orders_totalprice_positive",
            big,
            F.sum((F.col("o_totalprice") <= 0).cast("long")),
        ).alias("b"),
    )
    # lineitem: two expectations, ONE scan/aggregate
    l_checks = li.agg(
        chk(
            "lineitem_discount_range",
            big,
            F.sum(((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")),
        ).alias("a"),
        chk(
            "lineitem_shipdate_nonnull",
            big,
            big - F.count("l_shipdate"),
        ).alias("b"),
    )
    fk = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left")
        .agg(
            chk(
                "lineitem_fk_orders",
                big,
                F.sum(F.col("o_orderkey").isNull().cast("long")),
            ).alias("a")
        )
    )
    c_checks = cust.agg(
        chk("customer_name_nonnull", big, big - F.count("c_name")).alias("a")
    )

    def rows(df, n):
        cols = ["a", "b"][:n]
        stacked = df.select(
            F.explode(F.array(*[F.col(c) for c in cols])).alias("r")
        )
        return stacked.select("r.check_name", "r.n_checked", "r.n_violations")

    out = rows(o_checks, 2)
    for df, n in ((fk, 1), (l_checks, 2), (c_checks, 1)):
        out = out.unionByName(rows(df, n))
    return out


# -------------------------------------------------------- histogram
#: Fixed histogram spec for l_extendedprice (closed, so both engines
#: evaluate the identical literal arithmetic).
HIST_LO = 0
HIST_WIDTH = 5000
HIST_BUCKETS = 24

_HIST_ORACLE = f"""
WITH b AS (
  SELECT LEAST(GREATEST(CAST(floor((l_extendedprice - {HIST_LO}) / {HIST_WIDTH})
                             AS BIGINT), 0), {HIST_BUCKETS - 1}) AS bucket
  FROM lineitem
)
SELECT bucket,
       CAST({HIST_LO} + bucket * {HIST_WIDTH} AS BIGINT) AS bucket_lo,
       COUNT(*) AS n_rows
FROM b GROUP BY bucket
"""


@query("agg_histogram", oracle=_HIST_ORACLE)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of l_extendedprice: bucket id is a pure
    codegen expression (floor((x-lo)/w), clamped to the edge
    buckets), so the whole histogram is one map-side-combinable
    groupBy over at most HIST_BUCKETS keys — the same cost as a
    count(*) at any scale. Both engines evaluate the identical IEEE
    subtract/divide/floor sequence, so bucket assignment is
    deterministic cross-engine (no ROUND-mode divergence)."""
    li = read_table(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.greatest(
            F.floor((F.col("l_extendedprice") - HIST_LO) / HIST_WIDTH).cast("bigint"),
            F.lit(0).cast("bigint"),
        ),
        F.lit(HIST_BUCKETS - 1).cast("bigint"),
    )
    return (
        li.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bucket",
            (F.lit(HIST_LO) + F.col("bucket") * HIST_WIDTH)
            .cast("bigint")
            .alias("bucket_lo"),
            "n_rows",
        )
    )


# ------------------------------------------------- exact percentiles
#: Discrete-percentile levels (PERCENTILE_DISC semantics: the first
#: data value whose cumulative rank reaches p — ceil(p*n) in 1-based
#: sorted order; values come FROM the data, never interpolated).
PCT_LEVELS = (0.5, 0.9, 0.99)


def _pct_oracle() -> str:
    sel = ",\n       ".join(
        f"quantile_disc(l_quantity, {p}) AS p{int(p * 100)}" for p in PCT_LEVELS
    )
    return f"""
SELECT l_returnflag, COUNT(*) AS n_rows,
       {sel}
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_percentiles_exact", oracle=_pct_oracle())
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group discrete percentiles (p50/p90/p99 of
    l_quantity by return flag) via ONE window-rank pass: rank rows
    within each group, pick the ceil(p*n)-th smallest for each level
    in the same grouped aggregate. PERCENTILE_DISC returns an actual
    data value — no interpolation, hence no float arithmetic to
    diverge — and duplicates of the selected value are rank-safe
    (row_number ties only ever occur between equal values, which
    select the same result). One shuffle on the group key; the rank
    window repartitions by the same key so AQE coalesces the
    exchange. At 100 TB groups are per-key sorted spills, the same
    cost class as any grouped sort; for sketch-accuracy-is-enough
    consumers ``approx_percentile`` stays the cheap path."""
    li = read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_quantity").asc()
    )
    ranked = li.select(
        "l_returnflag",
        "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    aggs = [F.max("n").alias("n_rows")]
    for p in PCT_LEVELS:
        idx = F.ceil(F.lit(p) * F.col("n")).cast("long")
        aggs.append(
            F.max(F.when(F.col("rn") == idx, F.col("l_quantity"))).alias(
                f"p{int(p * 100)}"
            )
        )
    return ranked.groupBy("l_returnflag").agg(*aggs)


# ---------------------------------------------- count-min heavy hitters
#: CMS geometry: 3 independent md5-seeded rows x 64 buckets; top-k by
#: exact count surfaces alongside the sketch estimate.
CMS_SEEDS = ("cms0", "cms1", "cms2")
CMS_WIDTH = 64
CMS_TOP_K = 10

#: Engine-portable 60-bit hash of seed:key (operators/dedup.py
#: portable_hash64 — md5 is bit-identical everywhere).
_DUCK_H = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _cms_oracle() -> str:
    parts = []
    for j, seed in enumerate(CMS_SEEDS):
        h = _DUCK_H.format(expr="'" + seed + ":' || CAST(user_id AS VARCHAR)")
        parts.append(
            f"SELECT user_id, {j} AS row_id, {h} % {CMS_WIDTH} AS bucket FROM e"
        )
    row_exprs = "\nUNION ALL\n".join(parts)
    return f"""
WITH e AS (SELECT user_id FROM events),
hashed AS ({row_exprs}),
cms AS (
  SELECT row_id, bucket, COUNT(*) AS c
  FROM hashed GROUP BY row_id, bucket
),
exact AS (
  SELECT user_id, COUNT(*) AS exact_count FROM e GROUP BY user_id
),
keys AS (
  SELECT DISTINCT user_id, row_id, bucket FROM hashed
),
est AS (
  SELECT k.user_id, MIN(c.c) AS est_count
  FROM keys k JOIN cms c ON k.row_id = c.row_id AND k.bucket = c.bucket
  GROUP BY k.user_id
),
ranked AS (
  SELECT x.user_id, x.exact_count, est.est_count,
         est.est_count - x.exact_count AS overcount,
         ROW_NUMBER() OVER (ORDER BY x.exact_count DESC, x.user_id) AS rank
  FROM exact x JOIN est USING (user_id)
)
SELECT user_id, exact_count, est_count, overcount, rank
FROM ranked WHERE rank <= {CMS_TOP_K}
"""


@query("sketch_heavy_hitters", oracle=_cms_oracle())
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over events.user_id: the sketch
    is d=3 md5-seeded rows x w=64 counters built by ONE explode +
    groupBy (fixed 192-cell state — map-side partials make this a
    constant-size aggregate at any scale); per-key estimates read the
    sketch through a BROADCAST join (the sketch is 192 rows by
    construction), and the result surfaces estimate vs exact side by
    side for the driver to value-hash — the CMS guarantee
    (est >= exact, overcount >= 0) is in the data, not a flag. The
    exact-count join exists to *audit* the sketch at fixture scale;
    the 100 TB deployment keeps only the sketch side (fixed memory)
    and skips the exact pass."""
    from gcd_etl_spark.operators.dedup import portable_hash64

    ev = read_table(spark, sf_dir, "events").select("user_id")
    hashed = ev.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_id"),
                        (
                            F.pmod(
                                portable_hash64(
                                    F.concat(
                                        F.lit(f"{seed}:"),
                                        F.col("user_id").cast("string"),
                                    )
                                ),
                                F.lit(CMS_WIDTH),
                            )
                        ).alias("bucket"),
                    )
                    for j, seed in enumerate(CMS_SEEDS)
                ]
            )
        ).alias("h"),
    ).select("user_id", "h.row_id", "h.bucket")
    cms = hashed.groupBy("row_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    keys = hashed.distinct()
    est = (
        keys.join(F.broadcast(cms), ["row_id", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_count"))
    )
    ranked = (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "exact_count",
            "est_count",
            (F.col("est_count") - F.col("exact_count")).alias("overcount"),
        )
        .orderBy(F.col("exact_count").desc(), F.col("user_id").asc())
        .limit(CMS_TOP_K)
    )
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.col("exact_count").desc(), F.col("user_id").asc())
    )
    return ranked.select(
        "user_id", "exact_count", "est_count", "overcount", rank.alias("rank")
    )


# -------------------------------------------- repetition (Gopher-style)
#: ASCII token pattern shared with BM25/NB (java.regex == RE2 safe).
_TOKEN_SPLIT = "[^a-z0-9]+"
#: A doc fails the repetition filter when more than this many parts
#: per million of its trigram slots are repeats of an earlier trigram.
REP_DUP_PPM_MAX = 150_000

_REP_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_TOKEN_SPLIT}'),
                     x -> x <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, len(toks) AS n_tokens,
         unnest(list_transform(
             range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS tri
  FROM d
  WHERE len(toks) >= 3
),
c AS (SELECT doc_id, n_tokens, tri, COUNT(*) AS cnt
      FROM g GROUP BY doc_id, n_tokens, tri),
m AS (
  SELECT doc_id, n_tokens,
         SUM(cnt) AS n_trigrams,
         SUM(cnt) - COUNT(*) AS n_dup_slots,
         MAX(cnt) AS top_trigram_cnt
  FROM c GROUP BY doc_id, n_tokens
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_trigrams AS BIGINT) AS n_trigrams,
       CAST(n_dup_slots AS BIGINT) AS n_dup_slots,
       CAST(top_trigram_cnt AS BIGINT) AS top_trigram_cnt,
       CAST(n_dup_slots * 1000000 // n_trigrams AS BIGINT) AS dup_ppm,
       n_dup_slots * 1000000 // n_trigrams <= {REP_DUP_PPM_MAX} AS keep
FROM m
"""


@query("quality_repetition_ngrams", oracle=_REP_ORACLE)
def quality_repetition_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: per document, the fraction of
    word-trigram slots occupied by a repeat of an earlier trigram
    (plus the hottest trigram's count), with a keep/drop verdict —
    the boilerplate/template-spam signal every crawl-scale curation
    pipeline applies after exact/near dedup (which only sees
    WHOLE-document duplication; this operator sees INTERNAL
    duplication).

    All-integer: duplicate-slot counts are exact (sum - distinct per
    doc), and the ppm ratio is a positive-integer truncating
    division, spelled ``div`` in Spark and ``//`` in DuckDB — those
    differ on negatives (truncate vs floor) but both inputs here are
    >= 0 by construction, where the two agree exactly. Shape: one
    trigram explode into a (doc_id, trigram) count with map-side
    partials, then a per-doc re-aggregate on the SAME doc_id key —
    the n-gram discipline of text_ngram_counts at document grain.
    """
    from gcd_etl_spark.sources.catalog import read_table_spread

    d = read_table_spread(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda x: x != "").alias(
            "toks"
        ),
    )
    g = (
        d.where(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("toks", i),
                        F.element_at("toks", i + 1),
                        F.element_at("toks", i + 2),
                    ),
                )
            ).alias("tri"),
        )
    )
    c = g.groupBy("doc_id", "n_tokens", "tri").agg(F.count(F.lit(1)).alias("cnt"))
    m = c.groupBy("doc_id", "n_tokens").agg(
        F.sum("cnt").alias("n_trigrams"),
        (F.sum("cnt") - F.count(F.lit(1))).alias("n_dup_slots"),
        F.max("cnt").alias("top_trigram_cnt"),
    )
    dup_ppm = F.expr("n_dup_slots * 1000000 div n_trigrams")
    return m.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_trigrams").cast("long").alias("n_trigrams"),
        F.col("n_dup_slots").cast("long").alias("n_dup_slots"),
        F.col("top_trigram_cnt").cast("long").alias("top_trigram_cnt"),
        dup_ppm.cast("long").alias("dup_ppm"),
        (dup_ppm <= REP_DUP_PPM_MAX).alias("keep"),
    )


# ---------------------------------------------- exact weighted median
_WMEDIAN_ORACLE = """
WITH b AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w,
         l_orderkey, l_linenumber
  FROM lineitem
),
r AS (
  SELECT l_returnflag, cents, w,
         SUM(w) OVER (PARTITION BY l_returnflag
                      ORDER BY cents, l_orderkey, l_linenumber
                      ROWS UNBOUNDED PRECEDING) AS cum_w,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot_w
  FROM b
)
SELECT l_returnflag,
       CAST(MIN(tot_w) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cum_w >= tot_w THEN cents END) AS BIGINT)
         AS wmedian_cents
FROM r
GROUP BY l_returnflag
"""


@query("agg_weighted_median", oracle=_WMEDIAN_ORACLE)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median per group (price cents weighted by
    quantity) — the order statistic a revenue-weighted SLA/pricing
    report actually needs, which neither percentile_disc (unweighted)
    nor avg expresses. Lower-weighted-median convention: the first
    value, in (cents, orderkey, linenumber) total order, whose
    running weight reaches half the group's total.

    Same discipline as agg_percentiles_exact — the selected value
    comes FROM the data, the running and total weights share one
    (group) shuffle and sort, and every comparison is BIGINT
    (``2*cum >= tot`` instead of any division). Map-side nothing:
    weighted medians fundamentally need the sorted prefix, which is
    exactly one exchange + in-partition sort at any scale.
    """
    b = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    wg = Window.partitionBy("l_returnflag")
    r = b.select(
        "l_returnflag",
        "cents",
        F.sum("w")
        .over(
            wg.orderBy("cents", "l_orderkey", "l_linenumber").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum_w"),
        F.sum("w").over(wg).alias("tot_w"),
    )
    return r.groupBy("l_returnflag").agg(
        F.min("tot_w").cast("long").alias("total_weight"),
        F.min(F.when(2 * F.col("cum_w") >= F.col("tot_w"), F.col("cents")))
        .cast("long")
        .alias("wmedian_cents"),
    )


# ------------------------------------------ daily volume anomalies
#: Volume outlier rule: |day_count - median| > VOL_MAD_K * MAD.
VOL_MAD_K = 3

_VOLUME_ORACLE = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS n_events
  FROM events GROUP BY event_type, day
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n_events, day) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
med AS (SELECT event_type, n_events AS med FROM r WHERE rk = (n + 1) // 2),
dev AS (
  SELECT d.event_type, d.day, d.n_events, med.med,
         abs(d.n_events - med.med) AS dv
  FROM d JOIN med USING (event_type)
),
r2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dv, day) AS rk2,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (SELECT event_type, dv AS mad FROM r2 WHERE rk2 = (n + 1) // 2)
SELECT dev.event_type, CAST(dev.day AS BIGINT) AS day,
       CAST(dev.n_events AS BIGINT) AS n_events,
       CAST(dev.med AS BIGINT) AS median_daily,
       CAST(mad.mad AS BIGINT) AS mad_daily,
       dev.dv > {VOL_MAD_K} * mad.mad AS is_anomaly
FROM dev JOIN mad USING (event_type)
"""


@query("dq_volume_anomaly_daily", oracle=_VOLUME_ORACLE)
def dq_volume_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-observability volume monitor: daily row counts per event
    type, flagged against the stream's own robust baseline (median +
    MAD of its daily counts — the ts_anomaly_mad machinery applied
    to PIPELINE HEALTH instead of values: a collector outage or a
    double-delivery shows up as a flagged day regardless of the
    value distribution).

    All integers end-to-end: counts, epoch-day floor division,
    rank-selected median/MAD, integer cross-multiplied threshold.
    The first aggregate collapses the fact table to (type, day)
    grain, so every window after it runs on ~366 rows per type —
    the monitor costs one count(*) scan at any corpus size."""
    d = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.expr("unix_micros(ts) div 86400000000").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    wt = Window.partitionBy("event_type")
    r = d.withColumn(
        "rk", F.row_number().over(wt.orderBy("n_events", "day"))
    ).withColumn("n", F.count(F.lit(1)).over(wt))
    med = r.where(F.col("rk") == F.expr("(n + 1) div 2")).select(
        "event_type", F.col("n_events").alias("med")
    )
    dev = d.join(med, "event_type").withColumn(
        "dv", F.abs(F.col("n_events") - F.col("med"))
    )
    r2 = dev.withColumn(
        "rk2", F.row_number().over(wt.orderBy("dv", "day"))
    ).withColumn("n", F.count(F.lit(1)).over(wt))
    mad = r2.where(F.col("rk2") == F.expr("(n + 1) div 2")).select(
        "event_type", F.col("dv").alias("mad")
    )
    return dev.join(mad, "event_type").select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("med").cast("long").alias("median_daily"),
        F.col("mad").cast("long").alias("mad_daily"),
        (F.col("dv") > VOL_MAD_K * F.col("mad")).alias("is_anomaly"),
    )


# ------------------------------------------------ join-key skew report
_SKEW_ORACLE = """
WITH k AS (
  SELECT l_suppkey AS key, COUNT(*) AS rows_per_key
  FROM lineitem GROUP BY l_suppkey
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rows_per_key, key) AS rk,
         COUNT(*) OVER () AS n_keys,
         SUM(rows_per_key) OVER () AS n_rows
  FROM k
)
SELECT CAST(MIN(n_keys) AS BIGINT) AS n_keys,
       CAST(MIN(n_rows) AS BIGINT) AS n_rows,
       CAST(MAX(rows_per_key) AS BIGINT) AS max_rows,
       CAST(MIN(CASE WHEN rk * 100 >= n_keys * 99 THEN rows_per_key END)
            AS BIGINT) AS p99_rows,
       CAST(MAX(rows_per_key) * MIN(n_keys) * 1000000
            // MIN(n_rows) AS BIGINT) AS skew_ratio_ppm
FROM r
"""


@query("dq_key_skew_report", oracle=_SKEW_ORACLE)
def dq_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile for a prospective join/agg key
    (l_suppkey): key count, total rows, hottest key, exact p99
    rows-per-key (rank-selected, the agg_percentiles_exact
    convention), and the max/mean ratio in ppm — the number that
    says whether this key needs salting (operators/skew.py) or AQE
    skew-join before a 100 TB shuffle is planned on it. 1e6 ppm =
    perfectly uniform; the salting rule of thumb trips around 10x.

    One grouped count collapses the fact table to key grain; every
    window after it runs on |keys| rows. All integers (the ratio is
    a positive truncating division)."""
    k = read_table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_suppkey").alias("key")
    ).agg(F.count(F.lit(1)).alias("rows_per_key"))
    w = Window.partitionBy()
    r = k.select(
        "rows_per_key",
        F.row_number().over(Window.orderBy("rows_per_key", "key")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("n_keys"),
        F.sum("rows_per_key").over(w).alias("n_rows"),
    )
    return r.agg(
        F.min("n_keys").cast("long").alias("n_keys"),
        F.min("n_rows").cast("long").alias("n_rows"),
        F.max("rows_per_key").cast("long").alias("max_rows"),
        F.min(
            F.when(F.col("rk") * 100 >= F.col("n_keys") * 99, F.col("rows_per_key"))
        )
        .cast("long")
        .alias("p99_rows"),
        F.expr("max(rows_per_key) * min(n_keys) * 1000000 div min(n_rows)")
        .cast("long")
        .alias("skew_ratio_ppm"),
    )


# ------------------------------------------------ sequence gap scan
_SEQ_GAPS_ORACLE = """
WITH k AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
l AS (
  SELECT user_id, day,
         LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
  FROM k
)
SELECT user_id,
       CAST(day + 1 AS BIGINT) AS gap_start_day,
       CAST(next_day - 1 AS BIGINT) AS gap_end_day,
       CAST(next_day - day - 1 AS BIGINT) AS n_missing_days
FROM l
WHERE next_day - day > 1
"""


@query("dq_sequence_gaps", oracle=_SEQ_GAPS_ORACLE)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection, per entity: each row is a maximal
    interval of days on which an otherwise-active user produced NO
    events — the completeness/silence scan that surfaces dropped
    loads, collector outages scoped to a shard, or genuinely dormant
    entities (the per-key view dq_volume_anomaly_daily's global daily
    counts can't see: a user going dark for a week moves no global
    aggregate).

    The same one-distinct + one-LEAD plan detects surrogate-key holes
    when pointed at an id column; here the window is PARTITIONED by
    the entity, so the scan is embarrassingly parallel at any scale
    (the global-key variant runs per id-bucket first and reconciles
    bucket boundaries). All integer epoch days."""
    k = (
        read_table(spark, sf_dir, "events")
        .select("user_id", F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .distinct()
    )
    l = k.select(
        "user_id",
        "day",
        F.lead("day").over(Window.partitionBy("user_id").orderBy("day")).alias(
            "next_day"
        ),
    )
    return l.where(F.col("next_day") - F.col("day") > 1).select(
        "user_id",
        (F.col("day") + 1).cast("long").alias("gap_start_day"),
        (F.col("next_day") - 1).cast("long").alias("gap_end_day"),
        (F.col("next_day") - F.col("day") - 1).cast("long").alias("n_missing_days"),
    )


# --------------------------------------------------- k-anonymity audit
#: Minimum group size a quasi-identifier combination must reach, and
#: the account-balance bucket width (cents) of the third QI.
K_ANON = 10
ACCTBAL_BUCKET_CENTS = 200_000

_KANON_ORACLE = f"""
SELECT c_nationkey,
       c_mktsegment,
       CAST(CAST(round(c_acctbal * 100) AS BIGINT) // {ACCTBAL_BUCKET_CENTS}
            AS BIGINT) AS bal_bucket,
       COUNT(*) AS n,
       CAST(COUNT(*) < {K_ANON} AS INT) AS at_risk
FROM customer
GROUP BY 1, 2, 3
"""


@query("dq_k_anonymity", oracle=_KANON_ORACLE)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit — the privacy-governance companion to
    text_pii_scrub: every combination of quasi-identifiers (nation,
    market segment, coarse balance bucket) is checked against a
    minimum group size; groups below k are re-identification risks
    that a release pipeline must generalize or suppress. Flagging
    (not filtering) is deliberate: the report is the actionable
    artifact, and the at_risk flag keeps the full distribution in
    one result. Bucket arithmetic is exact integer cents; the
    truncating integer division agrees across engines because
    Spark's ``div`` and DuckDB's ``//`` both truncate toward zero.

    Scale shape: ONE hash aggregate keyed on the QI tuple (map-side
    partials absorb the heavy groups); output is bounded by the QI
    cardinality product, not the table size."""
    from gcd_etl_spark.sources.catalog import read_table

    cust = read_table(spark, sf_dir, "customer")
    bucket = F.expr(
        f"CAST(round(c_acctbal * 100) AS BIGINT) div {ACCTBAL_BUCKET_CENTS}"
    ).cast("bigint")
    return (
        cust.groupBy(
            "c_nationkey", "c_mktsegment", bucket.alias("bal_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_bucket",
            "n",
            (F.col("n") < K_ANON).cast("int").alias("at_risk"),
        )
    )
