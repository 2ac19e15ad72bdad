"""Two-phase steady-state audit for the frozen-LM delta lifecycle
(round-11 verdict item 4).

The round-10 amplified audit measured `quality_bigram_nll_delta` at
exp 1.10 and `stream_quality_gate` at 1.14 — but it amplified the
WHOLE documents table, so each amplification step retrained the LM on
a k-times corpus: the linear term it measured is the TRAIN phase the
lifecycle amortizes, not the nightly probe. This audit separates the
phases the way production does:

- the CORPUS side (doc_id % DELTA_MOD != 0) is amplified k-fold with
  doc_id shifts that are multiples of DELTA_MOD (so every copy stays
  corpus — the residue is preserved) and a per-copy suffix token
  (the main audit's convention);
- the DELTA side (doc_id % DELTA_MOD == 0) is staged UNCHANGED at
  every k;
- per k, run 1 pays the one-time train (fingerprint-keyed staging),
  run 2 is the steady-state probe against the warm artifact.

The steady-state claim under test: run-2 wall is ~FLAT in k — the
nightly probe cost is O(delta) + a broadcast of the (Zipf-small) cost
tables, independent of how the corpus grew. Output: a markdown table
(train-run wall, probe-run wall, probe exponent) for BASELINE.md.

Usage: python scripts/study_delta_steady_state.py [sf_dir] [amps...]
       (defaults: /root/testdata/sf0.1 1 4 8)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gcd_etl_spark.plans import QUERIES
from gcd_etl_spark.session import get_spark

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

AUDITED = [
    "quality_bigram_nll_delta",
    "stream_quality_gate",
    # round-11 third session: the DSIR family's delta + gate — same
    # staging convention (fixed delta, k-amplified corpus), same
    # steady-state claim (probe = O(delta) + a <= 513-row broadcast)
    "corpus_dsir_delta",
    "stream_dsir_gate",
]

#: per-query persisted-artifact table prefixes to drop before phase 1
#: so the train/probe split stays honest on re-runs.
ARTIFACT_PREFIXES = {
    "quality_bigram_nll_delta": ("bigram_lm_costs", "bigram_lm_ctx"),
    "stream_quality_gate": ("bigram_lm_costs", "bigram_lm_ctx"),
    "corpus_dsir_delta": ("dsir_model",),
    "stream_dsir_gate": ("dsir_model",),
}


def stage_corpus_amplified(spark, sf_dir: str, k: int, scratch_root: str) -> str:
    """Scratch sf dir: documents = fixed delta + k-amplified corpus;
    every other table symlinks to base. Idempotent per (sf, k), with
    the row-count guard the main audit learned to need."""
    from gcd_etl_spark.plans.dedup import DELTA_MOD

    sftag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    d = os.path.join(scratch_root, f"delta_steady_{sftag}_k{k}")
    os.makedirs(d, exist_ok=True)
    src = os.path.join(sf_dir, "documents.parquet")
    dst = os.path.join(d, "documents.parquet")
    base = spark.read.parquet(src)
    is_delta = F.col("doc_id") % DELTA_MOD == 0
    n_delta = base.where(is_delta).count()
    n_corpus = base.where(~is_delta).count()
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        # shift = power of 10 above the id span, times DELTA_MOD: the
        # copy keeps its % DELTA_MOD residue, so corpus stays corpus
        mx = base.agg(F.max("doc_id")).collect()[0][0] or 1
        shift = 10 ** (len(str(int(mx))) + 1) * DELTA_MOD
        parts = [base]
        corpus = base.where(~is_delta)
        for i in range(1, k):
            parts.append(
                corpus.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
                .withColumn("text", F.concat(F.col("text"), F.lit(f" amp{i}")))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)
    n_staged = spark.read.parquet(dst).count()
    want = n_delta + k * n_corpus
    if n_staged != want:
        raise AssertionError(f"staged {dst} has {n_staged} rows, want {want}")
    for t in ALL_TABLES:
        if t == "documents":
            continue
        lnk = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(lnk):
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), lnk)
    return d


def run_query(spark, name: str, d: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name].build(spark, d).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amps = [int(a) for a in sys.argv[2:]] or [1, 4, 8]
    scratch = os.environ.get("GCD_AUDIT_SCRATCH", "/tmp/gcd_delta_steady")
    os.makedirs(scratch, exist_ok=True)
    only = os.environ.get("GCD_AUDIT_ONLY")
    if only:  # re-measure a subset without re-running the rest
        keep = set(only.split(","))
        AUDITED[:] = [n for n in AUDITED if n in keep]
    spark = get_spark(app_name="delta_steady_state_audit")

    dirs = {k: stage_corpus_amplified(spark, sf_dir, k, scratch) for k in amps}
    rows = []
    for name in AUDITED:
        walls = {}
        for k in amps:
            d = dirs[k]
            # phase 1: train (first touch of this fingerprint stages
            # the LM) — remove any pre-staged artifact so the split is
            # honest even on re-runs
            from gcd_etl_spark.sources.catalog import table_fingerprint
            from urllib.parse import urlparse

            tag = os.path.basename(d.rstrip("/")).replace(".", "_")
            import re as _re

            tag = _re.sub(r"[^A-Za-z0-9_]", "_", tag)
            fp = table_fingerprint(d, "documents")
            warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
            for prefix in ARTIFACT_PREFIXES[name]:
                tbl = f"{prefix}_{tag}_{fp}"
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                shutil.rmtree(
                    os.path.join(warehouse, tbl.lower()), ignore_errors=True
                )
            w_train = run_query(spark, name, d)
            # phase 2: steady state — the artifact is warm; this is
            # the nightly cost the lifecycle claims is O(delta)
            w_probe = min(run_query(spark, name, d) for _ in range(2))
            walls[k] = (w_train, w_probe)
            print(
                f"{name} k={k}: train+probe {w_train:.2f}s, "
                f"probe {w_probe:.2f}s",
                file=sys.stderr,
            )
        k0, k1 = amps[0], amps[-1]
        exp_probe = (
            math.log(walls[k1][1] / walls[k0][1]) / math.log(k1 / k0)
            if k1 > k0
            else float("nan")
        )
        rows.append((name, walls, exp_probe))

    print(f"\n## Delta steady-state audit ({sf_dir}, corpus x k, delta fixed)\n")
    hdr = "| query | " + " | ".join(
        f"train k{k} | probe k{k}" for k in amps
    ) + " | probe exp |"
    print(hdr)
    print("|" + "---|" * (2 * len(amps) + 2))
    for name, walls, exp_probe in rows:
        cells = " | ".join(
            f"{walls[k][0]:.2f} | {walls[k][1]:.2f}" for k in amps
        )
        print(f"| {name} | {cells} | {exp_probe:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
