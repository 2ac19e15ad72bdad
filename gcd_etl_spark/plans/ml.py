"""Supervised-learning operators under the cross-engine value hash.

The reference ends at the denormalized snapshot (reference
Main.java:134-216); a training-data pipeline also needs the model-side
primitives that CONSUME such tables. Three classifier families, all
trained and evaluated entirely as DataFrame plans, all with full
DuckDB confusion-matrix oracles (``ml_nearest_centroid`` below adds
the Rocchio/centroid family to the two here):

* ``ml_naive_bayes_confusion`` — multinomial Naive Bayes language
  classifier over ``documents``: exact token counts, Laplace
  smoothing, per-(word, lang) log-probabilities quantized to integer
  micro-units (the BM25/PSI ln() stance — one fixed IEEE sequence on
  exact integer ratios, then floor(x*1e6+0.5)), scores summed as
  BIGINT (order-free), argmax with a deterministic (score DESC, lang)
  tie-break.
* ``ml_knn_confusion`` — k-nearest-neighbor label voting over
  ``embeddings`` with ZERO floating point anywhere: vectors are
  quantized once to integer micro-units and L2^2 distances are exact
  BIGINT sums, so ranking, voting and the confusion matrix are
  bit-exact by construction (no ln, no rounding boundary at all).

Train/test splits are deterministic residue classes on the primary
key (``% 5`` / ``% 10``) — reproducible on any engine without a
portable RNG, the data_split_deterministic stance (plans/text.py).

Scale posture (100 TB): NB is three shuffles — token explode to
(word, lang) counts with map-side partials, the vocab-grid join on
``word``, and the per-(doc, lang) score aggregation; nothing is ever
collected. kNN broadcasts the (small) evaluation split and streams
the training corpus through codegen'd integer arithmetic — the exact
baseline shape of sim_bruteforce_topk; the ANN paths
(plans/similarity.py) are the scale variants of the same probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcd_etl_spark.plans.registry import query
from gcd_etl_spark.sources.catalog import read_table_spread

#: ASCII-only token pattern — identical in java.util.regex and RE2
#: (the BM25 discipline, plans/analytics.py).
_TOKEN_SPLIT = "[^a-z0-9]+"

#: documents with doc_id % NB_FOLD == 0 are the evaluation split.
NB_FOLD = 5

_NB_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '{_TOKEN_SPLIT}'),
                     x -> x <> '') AS toks,
         doc_id % {NB_FOLD} = 0 AS is_test
  FROM documents
),
tok AS (SELECT doc_id, lang, is_test, unnest(toks) AS word FROM d),
c AS (SELECT word, lang, COUNT(*) AS c FROM tok WHERE NOT is_test
      GROUP BY word, lang),
tl AS (SELECT lang, COUNT(*) AS t_l FROM tok WHERE NOT is_test GROUP BY lang),
v AS (SELECT COUNT(DISTINCT word) AS v FROM tok WHERE NOT is_test),
nl AS (SELECT lang, COUNT(*) AS n_l FROM d WHERE NOT is_test GROUP BY lang),
n AS (SELECT SUM(n_l) AS n FROM nl),
langs AS (
  SELECT nl.lang, tl.t_l,
         CAST(floor(ln(CAST(n_l AS DOUBLE) / n) * 1000000 + 0.5) AS BIGINT)
           AS prior_micro,
         CAST(floor(ln(CAST(1 AS DOUBLE) / (t_l + v)) * 1000000 + 0.5) AS BIGINT)
           AS default_micro
  FROM nl JOIN tl USING (lang) CROSS JOIN v CROSS JOIN n
),
vocab AS (SELECT DISTINCT word FROM tok WHERE NOT is_test),
grid AS (
  SELECT vocab.word, langs.lang,
         CAST(floor(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / (langs.t_l + v.v))
                    * 1000000 + 0.5) AS BIGINT) AS qln_micro
  FROM vocab CROSS JOIN langs CROSS JOIN v
  LEFT JOIN c ON c.word = vocab.word AND c.lang = langs.lang
),
t_tok AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok WHERE is_test
          GROUP BY doc_id, word),
t_doc AS (SELECT doc_id, lang AS lang_true, len(toks) AS total_tf
          FROM d WHERE is_test),
sv AS (
  SELECT t.doc_id, g.lang, SUM(t.tf * g.qln_micro) AS s_vocab,
         SUM(t.tf) AS vocab_tf
  FROM t_tok t JOIN grid g USING (word)
  GROUP BY t.doc_id, g.lang
),
scored AS (
  SELECT t_doc.doc_id, t_doc.lang_true, langs.lang,
         langs.prior_micro + COALESCE(sv.s_vocab, 0)
           + (t_doc.total_tf - COALESCE(sv.vocab_tf, 0)) * langs.default_micro
           AS score_micro
  FROM t_doc CROSS JOIN langs
  LEFT JOIN sv ON sv.doc_id = t_doc.doc_id AND sv.lang = langs.lang
),
pred AS (
  SELECT doc_id, lang_true, lang AS lang_pred,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score_micro DESC, lang) AS rk
  FROM scored
)
SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred WHERE rk = 1
GROUP BY lang_true, lang_pred
"""


@query("ml_naive_bayes_confusion", oracle=_NB_ORACLE)
def ml_naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language ID trained on the ``doc_id %
    5 != 0`` split and evaluated on the rest; returns the (lang_true,
    lang_pred, n_docs) confusion matrix.

    Cross-engine determinism: every log-probability is quantized
    per (word, lang) to integer micro-units — ``floor(ln((c+1) /
    (t_l+V)) * 1e6 + 0.5)`` over exact-integer ratios, the same
    fixed IEEE sequence on both engines — and a document's score is
    then a BIGINT dot product (tf · qln), order-free. Out-of-vocab
    tokens contribute the per-language smoothed default, applied as
    ``(total_tf - vocab_tf) * default`` rather than materializing
    missing grid rows. Argmax ties break on (score DESC, lang ASC).
    """
    docs = read_table_spread(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.filter(F.split(F.lower("text"), _TOKEN_SPLIT), lambda x: x != "").alias("toks"),
        (F.col("doc_id") % NB_FOLD == 0).alias("is_test"),
    )
    tok = docs.select("doc_id", "lang", "is_test", F.explode("toks").alias("word"))
    train_tok = tok.where(~F.col("is_test"))

    # one (word, lang) count shuffle with map-side partials; T_l, V,
    # priors are tiny single-pass aggregates over the same explode
    c = train_tok.groupBy("word", "lang").agg(F.count(F.lit(1)).alias("c"))
    tl = train_tok.groupBy("lang").agg(F.count(F.lit(1)).alias("t_l"))
    v = train_tok.agg(F.countDistinct("word").alias("v"))
    nl = docs.where(~F.col("is_test")).groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    n = nl.agg(F.sum("n_l").alias("n"))

    def q_micro(x):
        return F.floor(F.log(x) * 1_000_000 + 0.5).cast("long")

    langs = (
        nl.join(tl, "lang")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "t_l",
            q_micro(F.col("n_l").cast("double") / F.col("n")).alias("prior_micro"),
            q_micro(F.lit(1).cast("double") / (F.col("t_l") + F.col("v"))).alias(
                "default_micro"
            ),
        )
    )
    vocab = train_tok.select("word").distinct()
    grid = (
        vocab.crossJoin(F.broadcast(langs.select("lang", "t_l")))
        .crossJoin(F.broadcast(v))
        .join(c, ["word", "lang"], "left")
        .select(
            "word",
            "lang",
            q_micro(
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("t_l") + F.col("v"))
            ).alias("qln_micro"),
        )
    )
    t_tok = (
        tok.where("is_test").groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    )
    t_doc = docs.where("is_test").select(
        "doc_id", F.col("lang").alias("lang_true"), F.size("toks").alias("total_tf")
    )
    sv = (
        t_tok.join(grid, "word")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("tf") * F.col("qln_micro")).alias("s_vocab"), F.sum("tf").alias("vocab_tf"))
    )
    scored = (
        t_doc.crossJoin(F.broadcast(langs.select("lang", "prior_micro", "default_micro")))
        .join(sv, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "lang_true",
            "lang",
            (
                F.col("prior_micro")
                + F.coalesce(F.col("s_vocab"), F.lit(0))
                + (F.col("total_tf") - F.coalesce(F.col("vocab_tf"), F.lit(0)))
                * F.col("default_micro")
            ).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("lang"))
    pred = scored.withColumn("rk", F.row_number().over(w)).where("rk = 1")
    return (
        pred.groupBy("lang_true", F.col("lang").alias("lang_pred"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# ----------------------------------------------------------------- kNN
#: embeddings with vec_id % KNN_FOLD == 0 are the evaluation split.
KNN_FOLD = 10
KNN_K = 5
#: Fixture embedding dimensionality (FIXTURES.md).
EMB_DIM = 64


def _knn_oracle() -> str:
    dist = " + ".join(f"(q.qv[{i}] - t.qv[{i}]) * (q.qv[{i}] - t.qv[{i}])" for i in range(1, EMB_DIM + 1))
    return f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
),
q AS (SELECT * FROM e WHERE vec_id % {KNN_FOLD} = 0),
t AS (SELECT * FROM e WHERE vec_id % {KNN_FOLD} <> 0),
pairs AS (
  SELECT q.vec_id AS test_id, q.label AS label_true, t.label AS label_nn,
         CAST({dist} AS BIGINT) AS dist2, t.vec_id AS train_id
  FROM q CROSS JOIN t
),
topk AS (
  SELECT test_id, label_true, label_nn,
         ROW_NUMBER() OVER (PARTITION BY test_id
                            ORDER BY dist2, train_id) AS rk
  FROM pairs
),
votes AS (
  SELECT test_id, label_true, label_nn AS label, COUNT(*) AS n_votes
  FROM topk WHERE rk <= {KNN_K}
  GROUP BY test_id, label_true, label_nn
),
pred AS (
  SELECT test_id, label_true, label AS label_pred,
         ROW_NUMBER() OVER (PARTITION BY test_id
                            ORDER BY n_votes DESC, label) AS vr
  FROM votes
)
SELECT label_true, label_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred WHERE vr = 1
GROUP BY label_true, label_pred
"""


@query("ml_knn_confusion", oracle=_knn_oracle())
def ml_knn_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=5 nearest-neighbor label voting over embeddings (evaluation
    split ``vec_id % 10 == 0`` vs the rest), returning the (label_true,
    label_pred, n_docs) confusion matrix.

    ZERO floating point: vectors are quantized ONCE to integer
    micro-units (``floor(x*1e6 + 0.5)`` per component — the
    emb_quantize_int8 floor discipline, plans/windows.py) and L2^2
    distances are exact BIGINT fold sums, so neighbor ranking
    (dist2 ASC, train_id), voting (votes DESC, label) and the final
    counts are bit-exact across engines with no rounding boundary.

    Scale: the evaluation split is the broadcast side; the training
    corpus streams through one codegen'd zip_with/aggregate
    expression per pair — the sim_bruteforce_topk exact-baseline
    shape, with plans/similarity.py's LSH/IVF as the sub-quadratic
    variants when the evaluation split itself is large.
    """
    emb = read_table_spread(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1_000_000 + 0.5).cast("long")
        ).alias("qv"),
    )
    q = emb.where(F.col("vec_id") % KNN_FOLD == 0).select(
        F.col("vec_id").alias("test_id"),
        F.col("label").alias("label_true"),
        F.col("qv").alias("qv_q"),
    )
    t = emb.where(F.col("vec_id") % KNN_FOLD != 0).select(
        F.col("vec_id").alias("train_id"), F.col("label").alias("label_nn"), "qv"
    )
    from gcd_etl_spark.functions.vector import dist2_fixed_long

    # unrolled codegen'd integer distance (the interpreted
    # aggregate/zip_with fold runs per-element per-pair; this is the
    # hot expression of the |test| x |train| broadcast join)
    dist2 = dist2_fixed_long("qv_q", "qv", 64)
    pairs = t.crossJoin(F.broadcast(q)).select(
        "test_id", "label_true", "label_nn", "train_id", dist2.alias("dist2")
    )
    wk = Window.partitionBy("test_id").orderBy(F.asc("dist2"), F.asc("train_id"))
    topk = pairs.withColumn("rk", F.row_number().over(wk)).where(F.col("rk") <= KNN_K)
    votes = topk.groupBy("test_id", "label_true", F.col("label_nn").alias("label")).agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("test_id").orderBy(F.desc("n_votes"), F.asc("label"))
    pred = votes.withColumn("vr", F.row_number().over(wv)).where("vr = 1")
    return (
        pred.groupBy("label_true", F.col("label").alias("label_pred"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# ------------------------------------------------- nearest centroid
def _centroid_oracle() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
),
dims AS (SELECT unnest(range(1, {EMB_DIM + 1})) AS dim),
tr AS (
  SELECT e.label, d.dim, SUM(e.qv[d.dim]) AS s, COUNT(*) AS n
  FROM e CROSS JOIN dims d
  WHERE e.vec_id % {KNN_FOLD} <> 0
  GROUP BY e.label, d.dim
),
c AS (
  SELECT label, dim,
         (s - ((s % n) + n) % n) / n AS c_micro
  FROM tr
),
t AS (
  SELECT e.vec_id AS test_id, e.label AS label_true, d.dim, e.qv[d.dim] AS v
  FROM e CROSS JOIN dims d
  WHERE e.vec_id % {KNN_FOLD} = 0
),
dist AS (
  SELECT t.test_id, t.label_true, c.label,
         SUM((t.v - c.c_micro) * (t.v - c.c_micro)) AS d2
  FROM t JOIN c ON c.dim = t.dim
  GROUP BY t.test_id, t.label_true, c.label
),
pred AS (
  SELECT test_id, label_true, label AS label_pred,
         ROW_NUMBER() OVER (PARTITION BY test_id ORDER BY d2, label) AS rk
  FROM dist
)
SELECT label_true, label_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred WHERE rk = 1
GROUP BY label_true, label_pred
"""


@query("ml_nearest_centroid", oracle=_centroid_oracle())
def ml_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification over embeddings —
    the third classifier family beside NB and kNN, and the one whose
    TRAINED MODEL is a legitimate tiny artifact (|labels| x dim
    integer centroids) rather than the whole corpus.

    Training is one (label, dim) grouped sum over the exploded
    training split; centroids are SIGN-SAFE integer floor means
    (``(s - ((s%n)+n)%n)/n`` — the ts_changepoint_cusum spelling,
    required here because embedding components are negative), so the
    model is BIGINT-exact and the per-dimension truncation (<1
    micro) is identical on both engines. Classification re-explodes
    the evaluation split and joins centroids on the dimension key —
    the relational form of a matrix-vector distance that needs no
    UDF; distances, argmin and the confusion matrix are all
    integer-exact (the ml_knn_confusion guarantee at 1/n of its
    cost: |test| x |labels| x dim instead of |test| x |train| x
    dim).
    """
    emb = read_table_spread(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1_000_000 + 0.5).cast("long")
        ).alias("qv"),
    )
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode("qv").alias("dim0", "v"),
    ).select("vec_id", "label", (F.col("dim0") + 1).alias("dim"), "v")
    tr = (
        ex.where(F.col("vec_id") % KNN_FOLD != 0)
        .groupBy("label", "dim")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    s, n = F.col("s"), F.col("n")
    c = tr.select(
        "label", "dim", ((s - ((s % n + n) % n)) / n).cast("long").alias("c_micro")
    )
    t = ex.where(F.col("vec_id") % KNN_FOLD == 0).select(
        F.col("vec_id").alias("test_id"),
        F.col("label").alias("label_true"),
        "dim",
        "v",
    )
    dist = (
        t.join(F.broadcast(c.withColumnRenamed("label", "label_c")), "dim")
        .groupBy("test_id", "label_true", F.col("label_c").alias("label"))
        .agg(
            F.sum(
                (F.col("v") - F.col("c_micro")) * (F.col("v") - F.col("c_micro"))
            ).alias("d2")
        )
    )
    w = Window.partitionBy("test_id").orderBy(F.asc("d2"), F.asc("label"))
    pred = dist.withColumn("rk", F.row_number().over(w)).where("rk = 1")
    return pred.groupBy("label_true", F.col("label").alias("label_pred")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


# ------------------------------------------------ label outliers
#: Per label, report the TOP_OUT farthest members from their own
#: class centroid (candidate mislabels / boundary cases).
TOP_OUT = 5


def _label_outliers_oracle() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
),
dims AS (SELECT unnest(range(1, {EMB_DIM + 1})) AS dim),
tr AS (
  SELECT e.label, d.dim, SUM(e.qv[d.dim]) AS s, COUNT(*) AS n
  FROM e CROSS JOIN dims d
  GROUP BY e.label, d.dim
),
c AS (
  SELECT label, dim, (s - ((s % n) + n) % n) / n AS c_micro
  FROM tr
),
t AS (
  SELECT e.vec_id, e.label, d.dim, e.qv[d.dim] AS v
  FROM e CROSS JOIN dims d
),
dist AS (
  SELECT t.vec_id, t.label,
         SUM((t.v - c.c_micro) * (t.v - c.c_micro)) AS d2
  FROM t JOIN c ON c.dim = t.dim AND c.label = t.label
  GROUP BY t.vec_id, t.label
),
ranked AS (
  SELECT label, vec_id, d2,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id) AS rk
  FROM dist
)
SELECT label, vec_id, CAST(d2 AS BIGINT) AS d2, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {TOP_OUT}
"""


@query("ml_label_outliers", oracle=_label_outliers_oracle())
def ml_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-mislabel mining: each label's {TOP_OUT} members
    FARTHEST from their own class centroid — the confident-learning
    shape every labeled-data pipeline runs before training (a point
    far from its class center is a labeling error, a boundary case,
    or a duplicate under the wrong key; all three deserve review).

    Same integer machinery as ml_nearest_centroid — sign-safe floor
    means over the full labeled set, exact BIGINT distances through
    the dimension-key join — plus one per-label rank window over the
    |vectors| distance table; deterministic (d2 DESC, vec_id)
    tie-break makes the review queue itself value-hash-exact."""
    emb = read_table_spread(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1_000_000 + 0.5).cast("long")
        ).alias("qv"),
    )
    ex = emb.select(
        "vec_id", "label", F.posexplode("qv").alias("dim0", "v")
    ).select("vec_id", "label", (F.col("dim0") + 1).alias("dim"), "v")
    tr = ex.groupBy("label", "dim").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    s, n = F.col("s"), F.col("n")
    c = tr.select(
        "label", "dim", ((s - ((s % n + n) % n)) / n).cast("long").alias("c_micro")
    )
    dist = (
        ex.join(F.broadcast(c), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                (F.col("v") - F.col("c_micro")) * (F.col("v") - F.col("c_micro"))
            ).alias("d2")
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("d2"), F.asc("vec_id"))
    return (
        dist.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_OUT)
        .select("label", "vec_id", F.col("d2").cast("long").alias("d2"), F.col("rk").cast("long").alias("rk"))
    )
