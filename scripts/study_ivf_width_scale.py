"""IVF width-rule recall-vs-scale audit (round-13 verdict item 1).

Runs the REAL production path (train_coarse_centroids -> pq_encode ->
pq_adc_topk, plus the bitext sampled candidate-recall@1 gate math) at
1x/4x/8x/32x the sf0.1 embeddings under BOTH the width rule
(suggest_ivf_cells / suggest_ivf_nprobe) and the retired fixed 16/4
control, and reports measured recall@10 against the in-plan
brute-force anchor — the table BASELINE.md's round-13 entry records.

Amplified dirs are staged by scripts/stage_embeddings_amp.py (per-dim
md5 shifts keep copies spread — see study_amplified_audit.py).

Usage: python scripts/study_ivf_width_scale.py [sf_dir] [amps...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gcd_etl_spark.operators import similarity as S
from gcd_etl_spark.plans.similarity import EMB_DIM, TOP_K, _query_set
from gcd_etl_spark.session import get_spark
from gcd_etl_spark.sources.catalog import read_table_spread
from scripts.stage_embeddings_amp import stage_embeddings_only


def _recall(ann, exact) -> float:
    ex = exact.select("query_id", "neighbor_id")
    an = ann.select("query_id", "neighbor_id").withColumn("hit", F.lit(1))
    row = (
        ex.join(an, on=["query_id", "neighbor_id"], how="left")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    return row["hits"] / row["n"]


def ivfpq_recall(spark, sf_dir: str, n_cells: int, nprobe: int) -> float:
    emb = read_table_spread(spark, sf_dir, "embeddings")
    centroids = S.train_coarse_centroids(emb, n_cells=n_cells, dim=EMB_DIM)
    codebooks = S.pq_train_codebooks(emb, centroids)
    index = S.pq_encode(emb, centroids, codebooks)
    ann = S.pq_adc_topk(
        index, _query_set(emb), centroids, codebooks, nprobe=nprobe, k=TOP_K
    )
    exact = S.brute_force_topk(emb, _query_set(emb), k=TOP_K, dim=EMB_DIM)
    return _recall(ann, exact)


def bitext_recall1(spark, sf_dir: str, n_cells: int, nprobe: int) -> float:
    """Sampled candidate-recall@1 exactly as sim_bitext_margin_mined
    gates it, at an explicit (n_cells, nprobe)."""
    from gcd_etl_spark.plans.similarity import (
        BITEXT_GATE_SAMPLE,
        _bitext_cos_ppm,
        _bitext_sides,
    )

    emb = read_table_spread(spark, sf_dir, "embeddings")
    a, b = _bitext_sides(emb)
    tgt_corpus = emb.where(F.col("label") % 2 == 1)
    centroids = S.train_coarse_centroids(tgt_corpus, n_cells=n_cells, dim=EMB_DIM)
    tgt = b.select(
        "tgt_id",
        "qb",
        "nb",
        F.element_at(S.ivf_cells_udf(centroids, 1)(F.col("tgt_vec")), 1).alias("cell"),
    )
    samp_src = a.orderBy("src_id").limit(BITEXT_GATE_SAMPLE)
    src = samp_src.select(
        "src_id",
        F.explode(S.ivf_cells_udf(centroids, nprobe)(F.col("src_vec"))).alias("cell"),
    )
    cand = tgt.join(F.broadcast(src), "cell").select("src_id", "tgt_id")
    samp = samp_src.drop("src_vec")
    cosv = _bitext_cos_ppm(b.drop("tgt_vec").crossJoin(F.broadcast(samp)))
    top1 = (
        cosv.groupBy("src_id")
        .agg(
            F.max(
                F.struct(F.col("cos_ppm"), (-F.col("tgt_id")).alias("neg_tgt"))
            ).alias("m")
        )
        .select("src_id", (-F.col("m.neg_tgt")).alias("tgt_top1"))
    )
    hit = top1.join(
        cand.withColumnRenamed("tgt_id", "tgt_top1").withColumn("hit", F.lit(1)),
        ["src_id", "tgt_top1"],
        "left",
    ).fillna({"hit": 0})
    row = hit.agg(F.sum("hit").alias("h"), F.count(F.lit(1)).alias("n")).collect()[0]
    return row["h"] / row["n"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amps = [int(a) for a in sys.argv[2:]] or [1, 4, 8, 32]
    spark = get_spark("ivf-width-scale")
    print("| amp | n | family | fixed 16/4 | width rule (c/p) |")
    print("|---|---|---|---|---|")
    for k in amps:
        d = sf_dir if k == 1 else stage_embeddings_only(spark, sf_dir, k, "/tmp")
        emb = read_table_spread(spark, d, "embeddings")
        n = emb.count()
        nc = S.suggest_ivf_cells(n)
        npb = S.suggest_ivf_nprobe(nc)
        r_fixed = ivfpq_recall(spark, d, 16, 4)
        r_rule = ivfpq_recall(spark, d, nc, npb)
        print(
            f"| {k}x | {n} | ivfpq recall@10 | {r_fixed:.2f} "
            f"| {r_rule:.2f} ({nc}/{npb}) |",
            flush=True,
        )
        from gcd_etl_spark.plans.similarity import bitext_cells, bitext_nprobe

        n_tgt = emb.where(F.col("label") % 2 == 1).count()
        bc = bitext_cells(n_tgt)
        bp = bitext_nprobe(bc)
        b_fixed = bitext_recall1(spark, d, 16, 8)
        b_rule = bitext_recall1(spark, d, bc, bp)
        print(
            f"| {k}x | {n_tgt} tgt | bitext cand-recall@1 | {b_fixed:.2f} "
            f"| {b_rule:.2f} ({bc}/{bp}) |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
