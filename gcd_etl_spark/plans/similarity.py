"""Similarity-search query plans over the ``embeddings`` table.

Brute-force cosine top-k (exact baseline, DuckDB-oracled) plus the
two ANN scale paths (SRP-LSH and IVF). Query set = first 5 vectors by
id — deterministic and self-contained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcd_etl_spark.operators import similarity as S
from gcd_etl_spark.plans.registry import query
from gcd_etl_spark.sources.catalog import read_table, read_table_spread

N_QUERIES = 5
TOP_K = 10
#: Fixture embedding dimensionality (FIXTURES.md: array<float> x 64).
EMB_DIM = 64


def _query_set(emb: DataFrame) -> DataFrame:
    return emb.where(F.col("vec_id") < N_QUERIES)


@query(
    "sim_bruteforce_topk",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {N_QUERIES}),
     scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 6) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
""",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors against the corpus.

    Ranking happens on the cosine ROUNDED to 6 decimals (with
    neighbor-id tie-break) so rank order is stable across engines and
    shuffle schedules.
    """
    emb = read_table_spread(spark, sf_dir, "embeddings")
    out = S.brute_force_topk(emb, _query_set(emb), k=TOP_K, dim=EMB_DIM)
    return out


@query("sim_ann_lsh", oracle=None)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH bucketed ANN top-k: 8 tables x 4 sign bits (32
    deterministic hyperplanes). Recall vs brute force is asserted in
    tests/test_similarity.py."""
    emb = read_table_spread(spark, sf_dir, "embeddings")
    planes = S.make_planes(dim=EMB_DIM, n_planes=32)
    return S.lsh_topk(emb, _query_set(emb), planes, n_tables=8, k=TOP_K, dim=EMB_DIM)


@query("sim_ann_ivf", oracle=None)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized ANN top-k (16 cells, nprobe=4)."""
    emb = read_table_spread(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, _query_set(emb), n_cells=16, nprobe=4, k=TOP_K, dim=EMB_DIM)


#: Fixture embeddings are random (max pairwise cosine ~0.5, no planted
#: near-dups), so a production-style 0.98 threshold matches zero pairs
#: and the oracle would pass vacuously. 0.42 sits inside the observed
#: distribution: tens of boundary pairs at each sf actually exercise
#: the predicate. Both sides compare the ROUNDED cosine so the
#: threshold test never depends on last-ulp engine differences.
NEARDUP_THRESHOLD = 0.42


@query(
    "sim_embedding_neardup",
    oracle=f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6)
      >= {NEARDUP_THRESHOLD}
""",
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.98), the
    embedding-space analog of text near-dup. All-pairs form — the
    correctness anchor; the ANN operators are its scale path."""
    from gcd_etl_spark.functions.vector import dot_fixed, norm_fixed

    emb = read_table_spread(spark, sf_dir, "embeddings")
    # Norms once per side (n rows), unrolled dot per pair (n^2) —
    # flat codegen'd arithmetic, same summation order as the fold.
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        norm_fixed("embedding", EMB_DIM).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        norm_fixed("embedding", EMB_DIM).alias("nb"),
    )
    denom = F.col("na") * F.col("nb")
    cos = F.when(denom > 0, dot_fixed("va", "vb", EMB_DIM) / denom)
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .where(F.round(cos, 6) >= NEARDUP_THRESHOLD)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
    )


@query("sim_embedding_neardup_blas", oracle=None)
def sim_embedding_neardup_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-vectorized all-pairs near-dup (mapInPandas + one BLAS
    matmul per task against the broadcast normalized corpus): the
    mid-scale path between the expression-tree anchor and the LSH/IVF
    operators. Pair-set equality with the anchor is asserted in
    tests/test_similarity.py."""
    emb = read_table_spread(spark, sf_dir, "embeddings")
    return S.neardup_pairs_blas(emb, threshold=NEARDUP_THRESHOLD)
