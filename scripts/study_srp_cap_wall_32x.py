"""End-to-end WALL-CLOCK study of the SRP delta-vs-corpus lifecycle
at 32x, across the four (width x cap) index configs (round 11).

scripts/study_srp_cap_32x.py measured candidate-pair COUNTS in a
NumPy replication (fixed 6-bit: 76.6M pairs; +cap: 19.8M; scaled
12-bit: 16.4M; both: 15.2M). This script measures what those counts
buy in actual Spark seconds: the nightly delta probe
(dedup_semantic_delta_vs_corpus's shape, or srp_capped_delta_pairs
for capped indexes) against the 32x amplified sf0.1 embeddings
(160,000 vectors), per config, in a FRESH JVM per run.

Per config it reports:
* cold wall — first run, includes staging the persisted bucket index
  (the amortized once-per-restaging cost);
* warm wall — second run in a second fresh JVM, probe-only steady
  state (the persisted index is found in the spark-warehouse);
* accepted pairs + plan shape of the warm run.

Usage: python scripts/study_srp_cap_wall_32x.py [sf_dir] [k] [filter]
  With ``--child <config> <phase>`` it runs one measurement in-process
  (the parent spawns it via subprocess for JVM isolation).
Writes a markdown table to stdout; paste into BASELINE.md.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    # label -> (bits, n_tables, capped)
    "fixed": (None, None, False),  # None -> the anchor SRP_BITS/SRP_TABLES
    "fixed+cap": (None, None, True),
    "scaled": ("rule", None, False),  # "rule" -> _srp_scaled_bits(n)
    "scaled+cap": ("rule", None, True),
}


def _resolve(spark, sf_dir: str, label: str):
    from gcd_etl_spark.plans.dedup import SRP_BITS, SRP_TABLES, _srp_scaled_bits

    bits_spec, tables_spec, capped = CONFIGS[label]
    n = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    bits = SRP_BITS if bits_spec is None else _srp_scaled_bits(n)
    n_tables = SRP_TABLES if tables_spec is None else tables_spec
    return bits, n_tables, capped


def run_one(sf_dir: str, label: str) -> None:
    """One measurement in THIS process: build the delta probe for the
    config, execute it, print wall + pairs + plan shape."""
    from pyspark.sql import functions as F

    from gcd_etl_spark.plans.dedup import (
        DELTA_MOD,
        _srp_bucket_frame,
        _srp_verify_delta,
        ensure_srp_bucket_index,
        srp_capped_delta_pairs,
    )
    from gcd_etl_spark.session import get_spark
    from gcd_etl_spark.sources.catalog import read_table_spread
    from scripts.study_amplified_audit import plan_features

    spark = get_spark(f"srp-wall-{label}")
    bits, n_tables, capped = _resolve(spark, sf_dir, label)
    emb = read_table_spread(spark, sf_dir, "embeddings")
    is_delta = F.col("vec_id") % DELTA_MOD == 0
    t0 = time.time()
    if capped:
        out = srp_capped_delta_pairs(
            spark, sf_dir, emb, is_delta, bits=bits, n_tables=n_tables
        )
    else:
        idx = ensure_srp_bucket_index(
            spark, sf_dir, emb.where(~is_delta), bits=bits, n_tables=n_tables
        )
        delta_tb = _srp_bucket_frame(emb.where(is_delta), bits, n_tables).select(
            F.col("vec_id").alias("delta_id"),
            F.posexplode("bks").alias("t", "bk"),
        )
        cand = (
            idx.join(F.broadcast(delta_tb), ["t", "bk"])
            .select("delta_id", "corpus_id")
            .dropDuplicates(["delta_id", "corpus_id"])
        )
        out = _srp_verify_delta(spark, sf_dir, cand)
    pairs = out.count()
    wall = time.time() - t0
    feats = plan_features(out)
    print(
        f"RESULT {label} bits={bits} tables={n_tables} capped={capped} "
        f"wall={wall:.1f} pairs={pairs} plan={feats}",
        flush=True,
    )


def main() -> int:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        run_one(sys.argv[i + 1], sys.argv[i + 2])
        return 0

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    flt = sys.argv[3] if len(sys.argv) > 3 else ""

    # Stage the shared amplified dir once (idempotent).
    from gcd_etl_spark.session import get_spark
    from scripts.study_amplified_audit import stage_dir

    spark = get_spark("srp-wall-stage")
    amp = stage_dir(spark, sf_dir, k, "/tmp")
    spark.stop()
    print(f"staged: {amp}", flush=True)

    print("| config | bits | cold s | warm s | pairs |")
    print("|---|---|---|---|---|")
    for label in CONFIGS:
        if flt and flt not in label:
            continue
        rows = {}
        for phase in ("cold", "warm"):
            t0 = time.time()
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", amp, label],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            wall = time.time() - t0
            line = [
                ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")
            ]
            if not line:
                print(f"{label} {phase} FAILED:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
                return 1
            rows[phase] = (wall, line[0])
            print(f"  # {phase}: {line[0]} (proc wall {wall:.0f}s)", flush=True)
        cold = rows["cold"][1].split("wall=")[1].split(" ")[0]
        warm = rows["warm"][1].split("wall=")[1].split(" ")[0]
        pairs = rows["warm"][1].split("pairs=")[1].split(" ")[0]
        bits = rows["warm"][1].split("bits=")[1].split(" ")[0]
        print(f"| {label} | {bits} | {cold} | {warm} | {pairs} |", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
