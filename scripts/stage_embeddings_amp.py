"""Stage an amplified sf-dir with ONLY the embeddings table amplified
(everything else symlinked) — the cheap staging for SRP/ANN wall
studies at large k, where study_amplified_audit's stage_dir would
also amplify lineitem/documents/events (minutes of staging and GBs
of scratch the embedding study never reads).

Usage: python scripts/stage_embeddings_amp.py [sf_dir] [k] [out_root]
Prints the staged dir path (idempotent per (sf, k); row-count
verified on reuse exactly like stage_dir).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcd_etl_spark.session import get_spark
from scripts.study_amplified_audit import ALL_TABLES, amplify_table


def stage_embeddings_only(spark, sf_dir: str, k: int, out_root: str) -> str:
    sftag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    d = os.path.join(out_root, f"amp_emb_{sftag}_k{k}")
    os.makedirs(d, exist_ok=True)
    for t in ALL_TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(d, f"{t}.parquet")
        if t == "embeddings":
            if not os.path.exists(os.path.join(dst, "_SUCCESS")):
                amplify_table(spark, src, t, k, dst)
            n_base = spark.read.parquet(src).count()
            n_amp = spark.read.parquet(dst).count()
            if n_amp != k * n_base:
                raise AssertionError(
                    f"staged {dst} has {n_amp} rows, want {k}x{n_base}"
                )
        elif not os.path.exists(dst):
            os.symlink(src, dst)
    return d


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    out_root = sys.argv[3] if len(sys.argv) > 3 else "/tmp"
    spark = get_spark("stage-emb-amp")
    print(stage_embeddings_only(spark, sf_dir, k, out_root), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
