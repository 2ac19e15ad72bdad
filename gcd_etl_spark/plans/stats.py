"""Statistical profiling + sketch operators — engine extensions.

Round-6 additions for the continuous-monitoring side of a 100 TB
training-data pipeline (the reference has no statistics surface at
all — its only numeric work is per-field casts, Main.java:253-258):

* ``stat_corr_exact`` — per-group Pearson correlation + OLS slope
  from EXACT integer second moments; the only float arithmetic is a
  fixed sequence of scalar IEEE ops on already-exact inputs, so the
  micro-quantized result is deterministic cross-engine.
* ``dq_drift_psi`` — population-stability-index drift report between
  two time slices of a fact table (the canonical "did my feature
  distribution move" monitor), Laplace-smoothed, micro-quantized.
* ``sketch_quantile_bound`` — ``approx_percentile`` (the GK sketch,
  Spark's mergeable quantile summary) held to its rank-error
  guarantee IN-PLAN against exact order statistics — the
  recall-floor pattern (plans/similarity.py) applied to quantile
  sketches, since sketch internals are not portable across engines.
* ``audience_overlap_minhash`` — bottom-k (KMV) set-intersection
  sketch over event-type audiences with the portable md5 hash
  family: estimated vs exact Jaccard side by side, ALL integers, so
  even the sketch estimate carries a full value-hash oracle
  (the portable-hash dedup_minhash_lsh stance applied to audience overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcd_etl_spark.plans.registry import query
from gcd_etl_spark.sources.catalog import read_table

# --------------------------------------------------- exact correlation
_CORR_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS BIGINT)
                  * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n AS n_rows,
       CAST(floor((n * sxy - sx * sy)
                  / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                  * 1000000 + 0.5) AS BIGINT) AS corr_micro,
       CAST(floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 10000 + 0.5)
            AS BIGINT) AS slope_cents_per_unit_e4
FROM m
"""


@query("stat_corr_exact", oracle=_CORR_ORACLE)
def stat_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag Pearson correlation (and OLS slope) between
    l_quantity and l_extendedprice, deterministic cross-engine:

    * the five second moments are EXACT BIGINT sums (quantity is
      integer-valued; price becomes integer cents via round(x*100),
      the same on both engines because fixture prices are 2-dp
      doubles) — order-free, overflow-free at any shuffle order;
    * everything after the aggregate is a FIXED sequence of scalar
      IEEE double ops (int->double conversion is a single correctly
      rounded operation on both engines; no libm beyond sqrt, which
      IEEE 754 requires correctly rounded), quantized to integer
      micro-units.

    One map-side-combinable groupBy is the whole plan — the 100 TB
    cost equals a count(*). The float-summation-order trap this
    sidesteps is why a naive corr() over doubles can NEVER be
    value-hash-matched across engines.

    Overflow budget: the largest moment (cents²) stays under the
    BIGINT ceiling through ~1e6 rows/group at these price magnitudes
    (sf0.1 ≈ 3e18 < 2^63). Beyond that, center the cents by a
    constant first (corr/slope are shift-invariant, moments shrink
    quadratically) or lift the sums to decimal(38,0) — same plan,
    wider accumulator."""
    li = read_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = n * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = n * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.floor(num / F.sqrt(d1 * d2) * 1_000_000 + 0.5)
        .cast("bigint")
        .alias("corr_micro"),
        F.floor(num / d1 * 10_000 + 0.5)
        .cast("bigint")
        .alias("slope_cents_per_unit_e4"),
    )


# -------------------------------------------------------- drift (PSI)
#: Bucket spec over o_totalprice; time split at 1995-01-01 gives two
#: populated slices of the orders date range.
PSI_LO = 0
PSI_WIDTH = 50_000
PSI_BUCKETS = 12
PSI_SPLIT = "1998-01-01"

_PSI_ORACLE = f"""
WITH b AS (
  SELECT LEAST(GREATEST(CAST(floor((o_totalprice - {PSI_LO}) / {PSI_WIDTH})
                             AS BIGINT), 0), {PSI_BUCKETS - 1}) AS bucket,
         CASE WHEN o_orderdate < TIMESTAMP '{PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref
  FROM orders
),
c AS (
  SELECT t.bucket,
         COALESCE(SUM(CASE WHEN is_ref = 1 THEN 1 ELSE 0 END), 0) AS c_ref,
         COALESCE(SUM(CASE WHEN is_ref = 0 THEN 1 ELSE 0 END), 0) AS c_cur
  FROM (SELECT UNNEST(range({PSI_BUCKETS})) AS bucket) t
  LEFT JOIN b ON b.bucket = t.bucket
  GROUP BY t.bucket
),
n AS (SELECT SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur FROM c)
SELECT bucket, CAST(c_ref AS BIGINT) AS c_ref, CAST(c_cur AS BIGINT) AS c_cur,
       CAST(floor((CAST(c_ref + 1 AS DOUBLE) / (n_ref + {PSI_BUCKETS})
                   - CAST(c_cur + 1 AS DOUBLE) / (n_cur + {PSI_BUCKETS}))
                  * ln((CAST(c_ref + 1 AS DOUBLE) / (n_ref + {PSI_BUCKETS}))
                       / (CAST(c_cur + 1 AS DOUBLE) / (n_cur + {PSI_BUCKETS})))
                  * 1000000 + 0.5) AS BIGINT) AS psi_term_micro
FROM c CROSS JOIN n
"""


@query("dq_drift_psi", oracle=_PSI_ORACLE)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report: population stability index of
    o_totalprice between pre/post-{PSI_SPLIT} order slices, per
    histogram bucket. Counts are exact integers from ONE grouped
    scan (both slices counted in the same aggregate — no second
    pass); Laplace smoothing (+1 per bucket) keeps empty buckets
    finite and deterministic; the per-bucket PSI term is quantized
    to integer micro-units after a fixed scalar IEEE sequence (the
    BM25 stance — residual risk is a 1-ulp ln() divergence landing
    exactly on a .5 micro boundary, accepted and documented there).
    Every bucket row also carries its raw counts, so the exact part
    of the report dominates the hash even if ln() ever wobbles."""
    orders = read_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.greatest(
            F.floor((F.col("o_totalprice") - PSI_LO) / PSI_WIDTH).cast("bigint"),
            F.lit(0).cast("bigint"),
        ),
        F.lit(PSI_BUCKETS - 1).cast("bigint"),
    )
    is_ref = (F.col("o_orderdate") < F.lit(PSI_SPLIT).cast("timestamp")).cast("long")
    c = (
        orders.select(bucket.alias("bucket"), is_ref.alias("is_ref"))
        .groupBy("bucket")
        .agg(
            F.sum("is_ref").alias("c_ref"),
            F.sum(F.lit(1) - F.col("is_ref")).alias("c_cur"),
        )
    )
    # dense bucket spine: empty buckets must still report (and smooth)
    spine = spark.range(PSI_BUCKETS).select(F.col("id").alias("bucket"))
    c = (
        spine.join(c, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_ref", F.lit(0)).cast("bigint").alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).cast("bigint").alias("c_cur"),
        )
    )
    n = c.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    j = c.crossJoin(F.broadcast(n))
    p = (F.col("c_ref") + 1).cast("double") / (F.col("n_ref") + PSI_BUCKETS)
    q = (F.col("c_cur") + 1).cast("double") / (F.col("n_cur") + PSI_BUCKETS)
    term = F.floor((p - q) * F.log(p / q) * 1_000_000 + 0.5).cast("bigint")
    return j.select("bucket", "c_ref", "c_cur", term.alias("psi_term_micro"))


# ------------------------------------------- quantile-sketch bound gate
#: approx_percentile accuracy parameter: rank error <= n / accuracy.
QSKETCH_ACCURACY = 1000
QSKETCH_LEVELS = (0.5, 0.9, 0.99)

_QSKETCH_ORACLE = "\nUNION ALL\n".join(
    f"SELECT l_linestatus, {int(p * 100)} AS level_pct, 1 AS within_rank_bound "
    f"FROM (SELECT DISTINCT l_linestatus FROM lineitem)"
    for p in QSKETCH_LEVELS
)


@query("sketch_quantile_bound", oracle=_QSKETCH_ORACLE)
def sketch_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` (Greenwald-Khanna sketch — Spark's
    mergeable, map-side-combinable quantile summary; the 100 TB
    quantile path, vs agg_percentiles_exact's window rank) verified
    against its own guarantee: the sketch value's EXACT rank must lie
    within n/accuracy of the target rank. Sketch internals aren't
    cross-engine portable, so — like the ANN recall floors — the
    driver hashes the literal bound flags while the bound itself is
    computed in-plan from exact order statistics: rank_below(v) <=
    hi_bound and rank_at_or_below(v) >= lo_bound, one grouped
    aggregate for the sketch + one for the exact ranks."""
    li = read_table(spark, sf_dir, "lineitem").select("l_linestatus", "l_extendedprice")
    sk = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.expr(
                f"approx_percentile(l_extendedprice, {p}, {QSKETCH_ACCURACY})"
            ).alias(f"v{int(p * 100)}")
            for p in QSKETCH_LEVELS
        ],
    )
    j = li.join(F.broadcast(sk), "l_linestatus")
    checks = []
    for p in QSKETCH_LEVELS:
        v = F.col(f"v{int(p * 100)}")
        below = F.sum((F.col("l_extendedprice") < v).cast("long"))
        at_or_below = F.sum((F.col("l_extendedprice") <= v).cast("long"))
        checks.append((p, below, at_or_below))
    ranks = j.groupBy("l_linestatus").agg(
        F.max("n").alias("n"),
        *[c[1].alias(f"below{int(c[0] * 100)}") for c in checks],
        *[c[2].alias(f"atb{int(c[0] * 100)}") for c in checks],
    )
    rows = []
    for p in QSKETCH_LEVELS:
        tgt = F.col("n") * F.lit(p)
        err = F.col("n") / QSKETCH_ACCURACY + 1
        ok = (
            (F.col(f"below{int(p * 100)}") <= tgt + err)
            & (F.col(f"atb{int(p * 100)}") >= tgt - err)
        ).cast("int")
        rows.append(
            ranks.select(
                "l_linestatus",
                F.lit(int(p * 100)).alias("level_pct"),
                ok.alias("within_rank_bound"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ------------------------------------------ KMV audience overlap sketch
#: Bottom-k signature size.
KMV_K = 64

#: Engine-portable 60-bit hash (operators/dedup.py portable_hash64).
_DUCK_H = "CAST(('0x' || substr(md5('aud:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"

_KMV_ORACLE = f"""
WITH a AS (
  SELECT DISTINCT event_type, user_id, {_DUCK_H} AS h FROM events
),
sig AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM a
  ) WHERE rn <= {KMV_K}
),
types AS (SELECT DISTINCT event_type FROM a),
pairs AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b
  FROM types x JOIN types y ON x.event_type < y.event_type
),
merged AS (
  SELECT p.type_a, p.type_b, s.h,
         MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sig s ON s.event_type IN (p.type_a, p.type_b)
  GROUP BY 1, 2, 3
),
bk AS (
  SELECT type_a, type_b, in_a, in_b,
         ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
  FROM merged
),
est AS (
  SELECT type_a, type_b,
         SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS matches,
         COUNT(*) AS k_eff
  FROM bk WHERE rn <= {KMV_K} GROUP BY 1, 2
),
au AS (SELECT event_type, COUNT(DISTINCT user_id) AS n FROM a GROUP BY 1),
inter AS (
  SELECT p.type_a, p.type_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN (SELECT DISTINCT event_type, user_id FROM a) x ON x.event_type = p.type_a
  JOIN (SELECT DISTINCT event_type, user_id FROM a) y
    ON y.event_type = p.type_b AND y.user_id = x.user_id
  GROUP BY 1, 2
)
SELECT e.type_a, e.type_b,
       (i.n_inter * 1000000) // (xa.n + xb.n - i.n_inter) AS exact_jaccard_micro,
       CAST((e.matches * 1000000) // e.k_eff AS BIGINT) AS est_jaccard_micro
FROM est e
JOIN inter i ON i.type_a = e.type_a AND i.type_b = e.type_b
JOIN au xa ON xa.event_type = e.type_a
JOIN au xb ON xb.event_type = e.type_b
"""


@query("audience_overlap_minhash", oracle=_KMV_ORACLE)
def audience_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation: Jaccard similarity between the
    user sets of every event-type pair, BOTH ways in one result —
    exact (distinct-intersection counts) and a bottom-k (KMV) minhash
    estimate on the portable md5 hash family, all in integer
    micro-units so the whole sketch is value-hash-oracled.

    Scale shape: the signature is a per-key bottom-k — ONE groupBy
    whose state is K longs per key (mergeable partial aggregates;
    same primitive as sample_consistent_hash) — after which pair
    estimation touches only |types|² × K rows, independent of the
    event count. The exact intersection exists to audit the sketch
    at fixture scale; at 100 TB only the signature path runs. A
    shared hash (seeded on user only) is what makes bottom-k(A ∪ B)
    computable from the two signatures alone."""
    from gcd_etl_spark.operators.dedup import portable_hash64

    a = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .withColumn(
            "h",
            portable_hash64(F.concat(F.lit("aud:"), F.col("user_id").cast("string"))),
        )
    )
    rn = F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    sig = a.withColumn("rn", rn).where(F.col("rn") <= KMV_K).select("event_type", "h")
    types = a.select("event_type").distinct()
    pairs = (
        types.alias("x")
        .join(
            types.alias("y"),
            F.col("x.event_type") < F.col("y.event_type"),
        )
        .select(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
    )
    merged = (
        F.broadcast(pairs)
        .join(
            sig,
            (sig.event_type == F.col("type_a")) | (sig.event_type == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max((F.col("event_type") == F.col("type_a")).cast("int")).alias("in_a"),
            F.max((F.col("event_type") == F.col("type_b")).cast("int")).alias("in_b"),
        )
    )
    bk = merged.withColumn(
        "rn", F.row_number().over(Window.partitionBy("type_a", "type_b").orderBy("h"))
    ).where(F.col("rn") <= KMV_K)
    est = bk.groupBy("type_a", "type_b").agg(
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")).alias("matches"),
        F.count(F.lit(1)).alias("k_eff"),
    )
    au = a.groupBy("event_type").agg(F.countDistinct("user_id").alias("n"))
    du = a.select("event_type", "user_id")
    inter = (
        F.broadcast(pairs)
        .join(du.alias("ix"), F.col("ix.event_type") == F.col("type_a"))
        .join(
            du.alias("iy"),
            (F.col("iy.event_type") == F.col("type_b"))
            & (F.col("iy.user_id") == F.col("ix.user_id")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        est.join(inter, ["type_a", "type_b"])
        .join(
            F.broadcast(au.select(F.col("event_type").alias("type_a"), F.col("n").alias("xa_n"))),
            "type_a",
        )
        .join(
            F.broadcast(au.select(F.col("event_type").alias("type_b"), F.col("n").alias("xb_n"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            # integer div == DuckDB's // here (operands non-negative)
            F.expr("(n_inter * 1000000) div (xa_n + xb_n - n_inter)")
            .cast("bigint")
            .alias("exact_jaccard_micro"),
            F.expr("(matches * 1000000) div k_eff").cast("bigint").alias("est_jaccard_micro"),
        )
    )


# ------------------------------------------------ exact OLS regression
def _ols_det_sql(pre: str = "") -> dict[str, str]:
    """The 3x3 Cramer determinant expressions over the named moment
    columns — ONE canonical parenthesization, emitted identically
    into the Spark plan and the DuckDB oracle so the double-precision
    evaluation trees match operation for operation."""
    p = pre
    return {
        "det": (
            f"{p}n * ({p}s11 * {p}s22 - {p}s12 * {p}s12) "
            f"- {p}s1 * ({p}s1 * {p}s22 - {p}s12 * {p}s2) "
            f"+ {p}s2 * ({p}s1 * {p}s12 - {p}s11 * {p}s2)"
        ),
        "det0": (
            f"{p}sy * ({p}s11 * {p}s22 - {p}s12 * {p}s12) "
            f"- {p}s1 * ({p}s1y * {p}s22 - {p}s12 * {p}s2y) "
            f"+ {p}s2 * ({p}s1y * {p}s12 - {p}s11 * {p}s2y)"
        ),
        "det1": (
            f"{p}n * ({p}s1y * {p}s22 - {p}s12 * {p}s2y) "
            f"- {p}sy * ({p}s1 * {p}s22 - {p}s12 * {p}s2) "
            f"+ {p}s2 * ({p}s1 * {p}s2y - {p}s1y * {p}s2)"
        ),
        "det2": (
            f"{p}n * ({p}s11 * {p}s2y - {p}s1y * {p}s12) "
            f"- {p}s1 * ({p}s1 * {p}s2y - {p}s1y * {p}s2) "
            f"+ {p}sy * ({p}s1 * {p}s12 - {p}s11 * {p}s2)"
        ),
    }


_OLS_MOMENTS = """
  COUNT(*) AS n_rows,
  CAST(COUNT(*) AS DOUBLE) AS n,
  CAST(SUM(x1) AS DOUBLE) AS s1,
  CAST(SUM(x2) AS DOUBLE) AS s2,
  CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
  CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
  CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
  CAST(SUM(y) AS DOUBLE) AS sy,
  CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
  CAST(SUM(x2 * y) AS DOUBLE) AS s2y
"""

_D = _ols_det_sql()

_OLS_ORACLE = f"""
WITH b AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x1,
         CAST(round(l_discount * 100) AS BIGINT) AS x2,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT l_returnflag, {_OLS_MOMENTS}
  FROM b GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows,
       CAST(floor(({_D["det0"]}) / ({_D["det"]}) * 1000 + 0.5) AS BIGINT)
         AS b0_millicents,
       CAST(floor(({_D["det1"]}) / ({_D["det"]}) * 1000 + 0.5) AS BIGINT)
         AS b1_millicents,
       CAST(floor(({_D["det2"]}) / ({_D["det"]}) * 1000 + 0.5) AS BIGINT)
         AS b2_millicents
FROM m
"""


@query("ml_ols_exact", oracle=_OLS_ORACLE)
def ml_ols_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS — ML model TRAINING under the value-hash gate:
    price-cents regressed on (quantity, discount-points) per return
    flag by solving the 3x3 normal equations with Cramer's rule.
    The nine moments are EXACT integer sums (one map-side-combinable
    groupBy — the whole training pass); the determinants are a
    single canonical double-precision expression tree emitted
    IDENTICALLY into both engines (``_ols_det_sql``), so the fitted
    coefficients match to the quantized milli-cent with no libm
    anywhere — unlike iterative solvers, nothing here depends on
    step count or summation order. The overflow budget matches
    stat_corr_exact (cents² sums; same mitigation note)."""
    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    m = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
    )
    d = _ols_det_sql()
    return m.select(
        "l_returnflag",
        "n_rows",
        F.expr(
            f"CAST(floor(({d['det0']}) / ({d['det']}) * 1000 + 0.5) AS BIGINT)"
        ).alias("b0_millicents"),
        F.expr(
            f"CAST(floor(({d['det1']}) / ({d['det']}) * 1000 + 0.5) AS BIGINT)"
        ).alias("b1_millicents"),
        F.expr(
            f"CAST(floor(({d['det2']}) / ({d['det']}) * 1000 + 0.5) AS BIGINT)"
        ).alias("b2_millicents"),
    )


# ------------------------------------------------- chi² independence
_CHI2_ORACLE = """
WITH cells AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY seg, prio
),
tot AS (
  SELECT seg, prio, n_obs,
         SUM(n_obs) OVER (PARTITION BY seg) AS r_total,
         SUM(n_obs) OVER (PARTITION BY prio) AS c_total,
         SUM(n_obs) OVER () AS n
  FROM cells
)
SELECT seg, prio, n_obs,
       CAST(r_total AS BIGINT) AS r_total,
       CAST(c_total AS BIGINT) AS c_total,
       CAST(floor(CAST(n_obs * n - r_total * c_total AS DOUBLE)
                  * CAST(n_obs * n - r_total * c_total AS DOUBLE)
                  / (CAST(r_total AS DOUBLE) * CAST(c_total AS DOUBLE)
                     * CAST(n AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS chi2_term_micro
FROM tot
"""


@query("stat_chi2_independence", oracle=_CHI2_ORACLE)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between customer market segment
    and order priority — the categorical-feature drift/leakage check
    of a feature pipeline. One join + ONE grouped count builds the
    contingency table; row/column/grand totals are window sums over
    the (|seg| x |prio|) cell table, which is tiny by construction,
    so the windows never see the fact table. The per-cell statistic
    ``(O*N - R*C)^2 / (R*C*N)`` (the standard (O-E)^2/E with E=RC/N,
    cleared of the inner division) is computed on EXACT BIGINT
    counts with one fixed IEEE double sequence and micro-quantized —
    no ln, no sqrt, so the only float ops are two multiplies, one
    divide and the quantize, identical cross-engine. The BIGINT
    products are safe to ~3e9 fact rows (O*N < 2^63).
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("prio")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    tot = cells.select(
        "seg",
        "prio",
        "n_obs",
        F.sum("n_obs").over(Window.partitionBy("seg")).alias("r_total"),
        F.sum("n_obs").over(Window.partitionBy("prio")).alias("c_total"),
        F.sum("n_obs").over(Window.partitionBy()).alias("n"),
    )
    diff = (F.col("n_obs") * F.col("n") - F.col("r_total") * F.col("c_total")).cast(
        "double"
    )
    return tot.select(
        "seg",
        "prio",
        "n_obs",
        F.col("r_total").cast("long").alias("r_total"),
        F.col("c_total").cast("long").alias("c_total"),
        F.floor(
            diff
            * diff
            / (
                F.col("r_total").cast("double")
                * F.col("c_total").cast("double")
                * F.col("n").cast("double")
            )
            * 1_000_000
            + 0.5
        )
        .cast("long")
        .alias("chi2_term_micro"),
    )


# ------------------------------------------------- CUSUM changepoint
#: Alarm threshold for the one-sided CUSUM, in value micro-units.
CUSUM_H_MICRO = 500_000_000


_CUSUM_ORACLE = f"""
WITH q AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS x
  FROM events
),
ref AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         CAST((SUM(x) - ((SUM(x) % COUNT(*)) + COUNT(*)) % COUNT(*))
              / COUNT(*) AS BIGINT) AS ref_micro
  FROM q GROUP BY user_id
),
p0 AS (
  SELECT q.user_id, q.event_id, q.us,
         ROW_NUMBER() OVER w AS seq,
         SUM(q.x - ref.ref_micro) OVER w AS pfx
  FROM q JOIN ref USING (user_id)
  WINDOW w AS (PARTITION BY q.user_id ORDER BY q.us, q.event_id
               ROWS UNBOUNDED PRECEDING)
),
p AS (
  SELECT user_id, event_id, seq, pfx,
         MIN(pfx) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS min_pfx
  FROM p0
),
s AS (
  SELECT user_id, seq,
         pfx - LEAST(CAST(0 AS BIGINT), min_pfx) AS cusum
  FROM p
)
SELECT s.user_id,
       CAST(ref.n_events AS BIGINT) AS n_events,
       ref.ref_micro,
       CAST(MAX(s.cusum) AS BIGINT) AS max_cusum_micro,
       MIN(CASE WHEN s.cusum > {CUSUM_H_MICRO} THEN s.seq END)
         AS first_alarm_seq,
       CAST(SUM(CASE WHEN s.cusum > {CUSUM_H_MICRO} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarms
FROM s JOIN ref USING (user_id)
GROUP BY s.user_id, ref.n_events, ref.ref_micro
"""


@query("ts_changepoint_cusum", oracle=_CUSUM_ORACLE)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detector per user over the event
    value series — WITHOUT the sequential recurrence: ``S_k = max(0,
    S_(k-1) + d_k)`` is restated through the prefix identity
    ``S_k = P_k - min(0, min_(j<=k) P_j)`` (P = running sum of
    deviations), so an inherently iterative control chart becomes
    two stacked window passes over ONE (user_id) shuffle — the
    at-scale answer to per-entity sequential state, same stance as
    the funnel fold (plans/analytics.py).

    Exactness: values quantize once to BIGINT micros; the per-user
    reference is a SIGN-SAFE integer floor division
    ``(s - ((s % n + n) % n)) / n`` — Spark ``div`` truncates toward
    zero while DuckDB ``//`` floors, and ``%`` takes the dividend's
    sign in both, so this expression is the one floor-division
    spelling that matches bit-for-bit on BOTH engines for either
    sign (the round-4 advice item on resample_ffill/asof, now made
    structural). Everything downstream is BIGINT compares.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("long").alias("x"),
    )
    s, n = F.sum("x"), F.count(F.lit(1))
    ref = ev.groupBy("user_id").agg(
        n.alias("n_events"),
        ((s - ((s % n + n) % n)) / n).cast("long").alias("ref_micro"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = (
        ev.join(ref, "user_id")
        .withColumn("seq", F.row_number().over(w))
        .withColumn("pfx", F.sum(F.col("x") - F.col("ref_micro")).over(w))
        .withColumn("min_pfx", F.min("pfx").over(w))
    )
    cusum = F.col("pfx") - F.least(F.lit(0).cast("long"), F.col("min_pfx"))
    alarmed = p.select(
        "user_id", "n_events", "ref_micro", "seq", cusum.alias("cusum")
    )
    return alarmed.groupBy("user_id", "n_events", "ref_micro").agg(
        F.max("cusum").alias("max_cusum_micro"),
        F.min(F.when(F.col("cusum") > CUSUM_H_MICRO, F.col("seq"))).alias(
            "first_alarm_seq"
        ),
        F.sum((F.col("cusum") > CUSUM_H_MICRO).cast("long")).alias("n_alarms"),
    )


# --------------------------------------------------- MAD robust outliers
#: Outlier rule: |x - median| > MAD_K * MAD (integer cross-multiply).
MAD_K = 3


_MAD_ORACLE = f"""
WITH q AS (
  SELECT user_id, event_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS x
  FROM events
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY x, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM q
),
med AS (SELECT user_id, x AS median_micro FROM r WHERE rk = (n + 1) // 2),
d AS (
  SELECT q.user_id, q.event_id, q.x,
         abs(q.x - med.median_micro) AS dev, med.median_micro
  FROM q JOIN med USING (user_id)
),
r2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dev, event_id) AS rk2,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM d
),
mad AS (SELECT user_id, dev AS mad_micro FROM r2 WHERE rk2 = (n + 1) // 2)
SELECT d.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       d.median_micro, mad.mad_micro,
       CAST(SUM(CASE WHEN d.dev > {MAD_K} * mad.mad_micro THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM d JOIN mad USING (user_id)
GROUP BY d.user_id, d.median_micro, mad.mad_micro
"""


@query("ts_anomaly_mad", oracle=_MAD_ORACLE)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier report per user — the ROBUST
    counterpart to anomaly_zscore_events (a single wild value drags a
    z-score's mean AND stddev; it barely moves the median).

    Exact order statistics: the median and the MAD are VALUES FROM
    THE DATA selected by rank windows (the agg_percentiles_exact
    stance — no interpolation, no floats anywhere), with the
    lower-median ``rk = (n+1) div 2`` convention and (value,
    event_id) tie-break; the outlier rule ``dev > k*MAD`` is an
    integer cross-multiply, so the whole operator is BIGINT-exact.
    Shape: both rank passes shuffle on the SAME user_id key (AQE
    reuses the partitioning), and the deviation join is co-keyed —
    nothing global, no fact-table window without a partition.
    """
    q = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("long").alias("x"),
    )
    wu = Window.partitionBy("user_id")
    r = q.withColumn("rk", F.row_number().over(wu.orderBy("x", "event_id"))).withColumn(
        "n", F.count(F.lit(1)).over(wu)
    )
    med = r.where(F.col("rk") == F.expr("(n + 1) div 2")).select(
        "user_id", F.col("x").alias("median_micro")
    )
    d = q.join(med, "user_id").select(
        "user_id",
        "event_id",
        "x",
        "median_micro",
        F.abs(F.col("x") - F.col("median_micro")).alias("dev"),
    )
    r2 = d.withColumn(
        "rk2", F.row_number().over(wu.orderBy("dev", "event_id"))
    ).withColumn("n", F.count(F.lit(1)).over(wu))
    mad = r2.where(F.col("rk2") == F.expr("(n + 1) div 2")).select(
        "user_id", F.col("dev").alias("mad_micro")
    )
    return (
        d.join(mad, "user_id")
        .groupBy("user_id", "median_micro", "mad_micro")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col("dev") > MAD_K * F.col("mad_micro")).cast("long")).alias(
                "n_outliers"
            ),
        )
        .select(
            "user_id", "n_events", "median_micro", "mad_micro", "n_outliers"
        )
    )


# --------------------------------------------- KMV distinct sketch
#: Bottom-k size for the KMV cardinality estimator and the hash-space
#: modulus of portable_hash64 (15 hex digits = 2^60).
KMV_DIST_K = 64
_KMV_M = float(1 << 60)

_KMV_DISTINCT_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events
),
r AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n_hashes
  FROM h
),
kth AS (
  SELECT event_type, h AS kth_hash, n_hashes FROM r WHERE rk = {KMV_DIST_K}
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events
  GROUP BY event_type
)
SELECT exact.event_type,
       CAST(exact.n_exact AS BIGINT) AS n_exact,
       kth.kth_hash,
       CASE WHEN kth.kth_hash IS NULL THEN CAST(exact.n_exact AS BIGINT)
            ELSE CAST(floor(CAST({KMV_DIST_K - 1} AS DOUBLE) * {_KMV_M!r}
                            / kth.kth_hash) AS BIGINT) END AS est_distinct
FROM exact LEFT JOIN kth USING (event_type)
"""


@query("sketch_distinct_kmv", oracle=_KMV_DISTINCT_ORACLE)
def sketch_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group distinct-count sketch (KMV / bottom-k): the k-th
    smallest portable-md5 hash of the group's members estimates the
    group's cardinality as ``(k-1) * M / h_k`` — the mergeable,
    engine-portable alternative to HLL internals (which no two
    engines serialize alike), shown beside the EXACT distinct count
    so the estimation error itself is inside the hashed result (the
    sketch_heavy_hitters stance applied to cardinality).

    Groups smaller than k fall back to their exact count (the sketch
    is exact below k by construction — every member hash is kept).
    Determinism: hash space is integers in [0, 2^60); the estimator
    is one fixed IEEE sequence (exactly-representable k-1 and M,
    one divide, floor). At 100 TB the bottom-k per group is a
    mergeable partial aggregate — only (group, 64 hashes) ever
    shuffles, the audience_overlap_minhash discipline.
    """
    from gcd_etl_spark.operators.dedup import portable_hash64

    ev = read_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        portable_hash64(
            F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
        ).alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type")
    r = h.select(
        "event_type",
        "h",
        F.row_number().over(w.orderBy("h")).alias("rk"),
    )
    kth = r.where(F.col("rk") == KMV_DIST_K).select(
        "event_type", F.col("h").alias("kth_hash")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    est = F.when(F.col("kth_hash").isNull(), F.col("n_exact")).otherwise(
        F.floor(
            F.lit(float(KMV_DIST_K - 1)) * F.lit(_KMV_M) / F.col("kth_hash")
        ).cast("long")
    )
    return exact.join(kth, "event_type", "left").select(
        "event_type", "n_exact", "kth_hash", est.alias("est_distinct")
    )


# ------------------------------------------- time-weighted average
_TWA_ORACLE = """
WITH q AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x_milli
  FROM events
),
d AS (
  SELECT user_id, x_milli,
         (LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us)
           // 1000 AS dur_ms
  FROM q
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dur_ms) AS BIGINT) AS total_ms,
       CAST(SUM(x_milli * dur_ms) // SUM(dur_ms) AS BIGINT) AS twa_milli
FROM d WHERE dur_ms IS NOT NULL
GROUP BY user_id
"""


@query("window_time_weighted_avg", oracle=_TWA_ORACLE)
def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per user (TWAP /
    hypertable ``time_weight`` shape): each observation holds until
    the next one, so the mean weighs values by their holding
    DURATION, not their count — the correct aggregate for
    irregularly sampled series, where a plain AVG over-counts busy
    periods. LOCF semantics; the last observation (no successor)
    carries no weight.

    All-integer: values quantize to millis, durations to exact
    event-time milliseconds via one LEAD over the (user_id) shuffle,
    and the final ratio is a truncating division of non-negative
    BIGINTs (``div``/``//`` agree there). The milli/milli scaling
    bounds the dot product by value_max * total-time-span per user
    (~1e16 per year-long user) — no overflow at any fixture scale.
    """
    q = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 1000 + 0.5).cast("long").alias("x_milli"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    d = q.select(
        "user_id",
        "x_milli",
        F.expr("(lead(us) over (partition by user_id order by us, event_id) - us) div 1000").alias(
            "dur_ms"
        ),
    ).where(F.col("dur_ms").isNotNull())
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dur_ms").cast("long").alias("total_ms"),
        F.expr("sum(x_milli * dur_ms) div sum(dur_ms)").cast("long").alias("twa_milli"),
    )


# --------------------------------------------------- Gini / Lorenz
_GINI_ORACLE = """
WITH cust AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey AS custkey,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY seg, custkey
),
r AS (
  SELECT seg, cents,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, custkey) AS i,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM cust
),
m AS (
  SELECT seg,
         CAST(MIN(n) AS BIGINT) AS n_customers,
         SUM(cents) AS total_cents,
         SUM((2 * i - n - 1) * cents) AS num
  FROM r GROUP BY seg
)
SELECT seg, n_customers,
       CAST(total_cents AS BIGINT) AS total_cents,
       CAST(floor(CAST(num AS DOUBLE)
                  / (CAST(n_customers AS DOUBLE) * CAST(total_cents AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS gini_ppm
FROM m
"""


@query("stat_gini_lorenz", oracle=_GINI_ORACLE)
def stat_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of customer revenue per market
    segment — the inequality/skew monitor that tells a pipeline
    whether a segment's revenue (or a partition key's row count —
    same operator, different column) is drifting toward a hot head.

    Uses the rank formulation ``G = sum((2i-n-1)·x_i) / (n·sum(x))``
    over ascending (cents, custkey) order — one rank window over the
    per-segment shuffle and one grouped sum; the numerator and both
    denominator factors are EXACT BIGINTs (the rank identity needs
    no pair-wise |x_i - x_j| cross join, which is the naive O(n²)
    formulation), and only the final ratio is one fixed IEEE
    divide+floor into ppm. Both factors stay under 2^53 through
    ~1e7 customers/segment at these magnitudes, so the double
    conversion is exact where it matters."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("custkey"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    wseg = Window.partitionBy("seg")
    r = cust.select(
        "seg",
        "cents",
        F.row_number().over(wseg.orderBy("cents", "custkey")).alias("i"),
        F.count(F.lit(1)).over(wseg).alias("n"),
    )
    m = r.groupBy("seg").agg(
        F.min("n").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("cents")).alias("num"),
    )
    return m.select(
        "seg",
        "n_customers",
        "total_cents",
        F.floor(
            F.col("num").cast("double")
            / (F.col("n_customers").cast("double") * F.col("total_cents").cast("double"))
            * 1_000_000
            + 0.5
        )
        .cast("long")
        .alias("gini_ppm"),
    )


# ------------------------------------------- lag-1 autocorrelation
_AUTOCORR_ORACLE = """
WITH q AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x
  FROM events
),
l AS (
  SELECT user_id, x,
         LEAD(x) OVER (PARTITION BY user_id ORDER BY us, event_id) AS y
  FROM q
),
m AS (
  SELECT user_id,
         COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy
  FROM l WHERE y IS NOT NULL GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
       CAST(floor((n * sxy - sx * sy)
                  / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                  * 1000000 + 0.5) AS BIGINT) AS autocorr_micro
FROM m
"""


@query("ts_autocorr_lag1", oracle=_AUTOCORR_ORACLE)
def ts_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value series — the
    is-this-series-random diagnostic (near 0: independent draws;
    positive: momentum/state; negative: oscillation) that decides
    whether EWMA/CUSUM monitors are even applicable to a metric.

    The stat_corr_exact discipline applied to (x_t, x_(t+1)) pairs
    from one partitioned LEAD: all five moments are exact BIGINT
    sums over milli-quantized values, then one fixed IEEE sequence
    and a micro quantize. Two stages on the same user key — the LEAD
    sort and the moment aggregate — and nothing global."""
    q = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 1000 + 0.5).cast("long").alias("x"),
    )
    l = q.select(
        "user_id",
        "x",
        F.lead("x")
        .over(Window.partitionBy("user_id").orderBy("us", "event_id"))
        .alias("y"),
    ).where(F.col("y").isNotNull())
    m = l.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "user_id",
        F.col("n").cast("long").alias("n_pairs"),
        F.floor(num / den * 1_000_000 + 0.5).cast("long").alias("autocorr_micro"),
    )


# ------------------------------------------------ Pareto coverage
#: Coverage threshold (percent of segment revenue).
PARETO_PCT = 80

_PARETO_ORACLE = f"""
WITH cust AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey AS custkey,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY seg, custkey
),
r AS (
  SELECT seg, cents,
         ROW_NUMBER() OVER (PARTITION BY seg
                            ORDER BY cents DESC, custkey) AS rk,
         SUM(cents) OVER (PARTITION BY seg
                          ORDER BY cents DESC, custkey
                          ROWS UNBOUNDED PRECEDING) AS cum_cents,
         COUNT(*) OVER (PARTITION BY seg) AS n_customers,
         SUM(cents) OVER (PARTITION BY seg) AS total_cents
  FROM cust
)
SELECT seg,
       CAST(MIN(n_customers) AS BIGINT) AS n_customers,
       CAST(MIN(total_cents) AS BIGINT) AS total_cents,
       CAST(MIN(CASE WHEN cum_cents * 100 >= {PARETO_PCT} * total_cents
                     THEN rk END) AS BIGINT) AS top_customers_for_{PARETO_PCT}pct
FROM r GROUP BY seg
"""


@query("stat_pareto_coverage", oracle=_PARETO_ORACLE)
def stat_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: the smallest number of top customers
    whose revenue reaches {PARETO_PCT}% of each segment's total —
    the operational phrasing of what stat_gini_lorenz scores
    abstractly, and (run on partition keys instead of customers) the
    how-hot-is-the-head readout behind every skew decision.

    One descending rank + running-sum window per segment over the
    customer aggregate; the threshold is the integer cross-multiply
    ``cum*100 >= {PARETO_PCT}*total`` — no percentage ever
    materializes, so the selected rank is BIGINT-exact."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("custkey"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    wseg = Window.partitionBy("seg")
    word = wseg.orderBy(F.desc("cents"), F.asc("custkey"))
    r = cust.select(
        "seg",
        "cents",
        F.row_number().over(word).alias("rk"),
        F.sum("cents")
        .over(word.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_cents"),
        F.count(F.lit(1)).over(wseg).alias("n_customers"),
        F.sum("cents").over(wseg).alias("total_cents"),
    )
    return r.groupBy("seg").agg(
        F.min("n_customers").cast("long").alias("n_customers"),
        F.min("total_cents").cast("long").alias("total_cents"),
        F.min(
            F.when(
                F.col("cum_cents") * 100 >= PARETO_PCT * F.col("total_cents"),
                F.col("rk"),
            )
        )
        .cast("long")
        .alias(f"top_customers_for_{PARETO_PCT}pct"),
    )


# ------------------------------------------- exact two-sample KS
#: Time split for the two o_totalprice samples (the PSI slices).
KS_SPLIT = "1998-01-01"

_KS_ORACLE = f"""
WITH s AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN o_orderdate < TIMESTAMP '{KS_SPLIT}' THEN 1 ELSE 0 END AS is_ref
  FROM orders
),
n AS (
  SELECT SUM(is_ref) AS n1, SUM(1 - is_ref) AS n2 FROM s
),
r AS (
  SELECT cents,
         SUM(is_ref) OVER (ORDER BY cents
                           ROWS UNBOUNDED PRECEDING) AS cum1,
         SUM(1 - is_ref) OVER (ORDER BY cents
                               ROWS UNBOUNDED PRECEDING) AS cum2
  FROM s
),
m AS (
  SELECT cents, MAX(cum1) AS cum1, MAX(cum2) AS cum2
  FROM r GROUP BY cents
)
SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
       CAST(MAX(abs(m.cum1 * n.n2 - m.cum2 * n.n1)) AS BIGINT) AS d_num,
       CAST(MAX(abs(m.cum1 * n.n2 - m.cum2 * n.n1)) * 1000000
            // (n.n1 * n.n2) AS BIGINT) AS d_ppm
FROM m CROSS JOIN n
GROUP BY n.n1, n.n2
"""


@query("stat_ks_two_sample", oracle=_KS_ORACLE)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between the
    pre/post-{KS_SPLIT} price distributions — the binning-free
    counterpart to dq_drift_psi (PSI answers "how much did the
    histogram move", KS answers "what is the largest CDF gap,
    anywhere"): D = max |F1(x) - F2(x)| evaluated WITHOUT division
    as ``max |cum1*n2 - cum2*n1|`` over the merged order — integer
    cross-multiplication end to end, so unlike every float KS
    implementation this one is bit-exact cross-engine (one ppm
    quantize at the end for readability; d_num is the exact
    statistic numerator).

    The evaluation point set is collapsed to distinct values (CDF
    steps only move there, and the per-value MAX takes the
    after-all-ties reading on both engines); the running sums ride
    one global sort over the value column — at 100 TB the same
    identity runs per pre-bucketed value range and reconciles
    boundary offsets, the dq_sequence_gaps two-level note."""
    s = read_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderdate") < F.lit(KS_SPLIT).cast("timestamp"))
        .cast("long")
        .alias("is_ref"),
    )
    n = s.agg(
        F.sum("is_ref").alias("n1"), F.sum(F.lit(1) - F.col("is_ref")).alias("n2")
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = s.select(
        "cents",
        F.sum("is_ref").over(w).alias("cum1"),
        F.sum(F.lit(1) - F.col("is_ref")).over(w).alias("cum2"),
    )
    m = r.groupBy("cents").agg(F.max("cum1").alias("cum1"), F.max("cum2").alias("cum2"))
    d = m.crossJoin(F.broadcast(n)).select(
        "n1",
        "n2",
        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")).alias("gap"),
    )
    return d.groupBy("n1", "n2").agg(
        F.max("gap").cast("long").alias("d_num"),
        F.expr("max(gap) * 1000000 div (n1 * n2)").cast("long").alias("d_ppm"),
    ).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        "d_num",
        "d_ppm",
    )


# ------------------------------------------------------- Zipf fit
_ZIPF_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

_ZIPF_ORACLE = f"""
WITH tok AS (
  SELECT unnest({_ZIPF_TOKS}) AS w FROM documents
),
v AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk FROM v),
q AS (
  SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
  FROM r
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM((x * y) // 1048576) AS BIGINT) AS sxy_hi,
         CAST(SUM((x * y) % 1048576) AS BIGINT) AS sxy_lo,
         CAST(SUM((x * x) // 1048576) AS BIGINT) AS sxx_hi,
         CAST(SUM((x * x) % 1048576) AS BIGINT) AS sxx_lo
  FROM q
),
d AS (
  SELECT n, sx, sy,
         CAST(sxy_hi AS DOUBLE) * 1048576 + CAST(sxy_lo AS DOUBLE) AS sxy_d,
         CAST(sxx_hi AS DOUBLE) * 1048576 + CAST(sxx_lo AS DOUBLE) AS sxx_d
  FROM s
)
SELECT n AS n_vocab,
       CAST(floor((CAST(n AS DOUBLE) * sxy_d - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * sxx_d - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * 1000000 + 0.5)
            AS BIGINT) AS slope_ppm,
       CAST(floor(CAST(sy AS DOUBLE) / n
                  - (CAST(n AS DOUBLE) * sxy_d - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * sxx_d - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(sx AS DOUBLE) / n) + 0.5)
            AS BIGINT) AS intercept_micro
FROM d
"""


@query("stat_zipf_fit", oracle=_ZIPF_ORACLE)
def stat_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS of ln(frequency)
    on ln(rank) — the one-number sanity check of a text corpus (a
    natural corpus fits slope ~ -1; a slope collapsing toward 0
    flags template/boilerplate floods, a cliff past -1.5 flags
    vocabulary starvation). Ranks are a total order (count DESC,
    token), each token's (ln rank, ln count) pair is quantized to
    integer micro-units row-locally, and all OLS moments are exact
    integer sums — the stat_corr_exact stance: the only float work
    is a fixed scalar IEEE expression on already-exact moments, so
    the ppm outputs are deterministic cross-engine.

    Scale shape: one count shuffle on the token, one vocab-sized
    rank window (Zipf-small; at web scale the vocab is millions of
    rows while the corpus is trillions — the window runs on the
    small side), one 1-row moment aggregate. The second moments are
    carried as EXACT hi/lo int64 pairs (per-row product split at
    2^20; each row's x*y <= ~7.6e14, so both halves' sums stay
    inside int64 up to ~1e9 vocabulary — web scale) because a single
    SUM(x*y) passes 2^63 near 1e6 vocabulary, where Spark (non-ANSI)
    wraps silently while DuckDB promotes to HUGEINT and the BIGINT
    cast raises (round-11 advice fix); the halves recombine inside
    the same fixed scalar IEEE expression both engines evaluate
    identically, so determinism is preserved."""
    from gcd_etl_spark.sources.catalog import read_table_spread

    docs = read_table_spread(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
    v = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rk = F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("w").asc()))
    q = v.select(
        F.floor(F.log(rk.cast("double")) * 1_000_000 + 0.5).cast("bigint").alias("x"),
        F.floor(F.log(F.col("c").cast("double")) * 1_000_000 + 0.5)
        .cast("bigint")
        .alias("y"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("(x * y) div 1048576")).cast("bigint").alias("sxy_hi"),
        F.sum(F.expr("(x * y) % 1048576")).cast("bigint").alias("sxy_lo"),
        F.sum(F.expr("(x * x) div 1048576")).cast("bigint").alias("sxx_hi"),
        F.sum(F.expr("(x * x) % 1048576")).cast("bigint").alias("sxx_lo"),
    )
    # Recombine the exact split moments in DOUBLE with the same
    # operation tree the oracle uses — x, y >= 0 so div/% agree with
    # DuckDB's floor semantics.
    sxy_d = F.col("sxy_hi").cast("double") * 1048576 + F.col("sxy_lo").cast("double")
    sxx_d = F.col("sxx_hi").cast("double") * 1048576 + F.col("sxx_lo").cast("double")
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    num = nd * sxy_d - sxd * syd
    den = nd * sxx_d - sxd * sxd
    slope = num / den
    return s.select(
        F.col("n").alias("n_vocab"),
        F.floor(slope * 1_000_000 + 0.5).cast("bigint").alias("slope_ppm"),
        F.floor(
            F.col("sy").cast("double") / F.col("n")
            - slope * (F.col("sx").cast("double") / F.col("n"))
            + 0.5
        )
        .cast("bigint")
        .alias("intercept_micro"),
    )


# ---------------------------------------------------- Heaps' law fit
#: Number of corpus prefixes the vocabulary-growth curve is sampled
#: at (deciles of the doc_id range).
HEAPS_POINTS = 10

_HEAPS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_ZIPF_TOKS}) AS w FROM documents
),
mx AS (SELECT MAX(doc_id) + 1 AS n_ids FROM documents),
cuts AS (
  SELECT i, CAST(n_ids * i // {HEAPS_POINTS} AS BIGINT) AS cutoff
  FROM generate_series(1, {HEAPS_POINTS}) AS g(i) CROSS JOIN mx
),
fd AS (SELECT w, MIN(doc_id) AS first_doc FROM tok GROUP BY w),
dtok AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
pts AS (
  SELECT c.i,
         (SELECT CAST(SUM(n_tok) AS BIGINT) FROM dtok WHERE doc_id < c.cutoff) AS n_tokens,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM fd WHERE first_doc < c.cutoff) AS vocab
  FROM cuts c
),
q AS (
  SELECT CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(vocab AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
  FROM pts WHERE n_tokens > 0 AND vocab > 0
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM q
)
SELECT n AS n_points,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5)
            AS BIGINT) AS beta_ppm,
       CAST(floor(CAST(sy AS DOUBLE) / n
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * (CAST(sx AS DOUBLE) / n) + 0.5)
            AS BIGINT) AS lnk_micro
FROM s
"""


@query("stat_heaps_fit", oracle=_HEAPS_ORACLE)
def stat_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(n) ~ K * n^beta,
    estimated by OLS of ln(vocab) on ln(tokens) over ten corpus
    prefixes (deciles of the doc-id range) — the companion diagnostic
    to stat_zipf_fit (natural text: beta ~ 0.5; beta -> 0 means the
    corpus stopped contributing new vocabulary — saturation/dup
    flood; beta -> 1 means tokenizer or encoding garbage minting
    unbounded new 'words'). Same exactness stance as the Zipf fit:
    prefix token totals and first-occurrence vocab counts are exact
    integers, each sample point quantizes ln() row-locally to micro
    units, OLS moments are exact integer sums. (On THIS fixture the
    diagnostic fires as designed: the synthetic ~31-word vocabulary
    saturates inside the first decile, so beta_ppm = 0 exactly — the
    'corpus stopped contributing vocabulary' verdict.)

    Scale shape: NO per-prefix rescan — one token-count shuffle per
    doc, one min(doc_id) shuffle per distinct token, then both
    doc-sized/vocab-sized summaries range-join the 10-row broadcast
    cutoff frame. Cost is one pass over the token stream regardless
    of how many curve points are sampled.

    Int64 exactness bound: unlike stat_zipf_fit (whose moment count
    is the vocabulary and needed the hi/lo split), the sums here run
    over n = HEAPS_POINTS = 10 rows, so even at ln(1e12) tokens the
    moments top out near 10 * (2.8e7)^2 ~ 7.6e15 and the cross terms
    n*sxy / sx*sy near 8e16 — two orders of magnitude inside int64.
    Raising HEAPS_POINTS past ~1000 would need the same split."""
    from gcd_etl_spark.sources.catalog import read_table_spread

    docs = read_table_spread(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
    tok = docs.select("doc_id", F.explode(toks).alias("w"))
    mx = docs.agg((F.max("doc_id") + 1).alias("n_ids"))
    cuts = mx.select(
        F.explode(F.sequence(F.lit(1), F.lit(HEAPS_POINTS))).alias("i"), "n_ids"
    ).select("i", F.expr(f"n_ids * i div {HEAPS_POINTS}").alias("cutoff"))
    fd = tok.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    dtok = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    ntokens = (
        dtok.crossJoin(F.broadcast(cuts))
        .where(F.col("doc_id") < F.col("cutoff"))
        .groupBy("i")
        .agg(F.sum("n_tok").cast("bigint").alias("n_tokens"))
    )
    vocab = (
        fd.crossJoin(F.broadcast(cuts))
        .where(F.col("first_doc") < F.col("cutoff"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    )
    pts = ntokens.join(vocab, "i").where(
        (F.col("n_tokens") > 0) & (F.col("vocab") > 0)
    )
    q = pts.select(
        F.floor(F.log(F.col("n_tokens").cast("double")) * 1_000_000 + 0.5)
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("vocab").cast("double")) * 1_000_000 + 0.5)
        .cast("bigint")
        .alias("y"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return s.select(
        F.col("n").alias("n_points"),
        F.floor(slope * 1_000_000 + 0.5).cast("bigint").alias("beta_ppm"),
        F.floor(
            F.col("sy").cast("double") / F.col("n")
            - slope * (F.col("sx").cast("double") / F.col("n"))
            + 0.5
        )
        .cast("bigint")
        .alias("lnk_micro"),
    )
