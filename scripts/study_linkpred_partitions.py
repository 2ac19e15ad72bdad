"""Follow-up to study_amplified_audit.py: WHY does
graph_link_prediction_capped scale at exp 1.85 (6.3 -> 292.7 s at 8x)
when its workload is linear by construction (k disjoint copies of the
same graph, relative cap unchanged by copying)?

Hypothesis: fixed shuffle partitions. The session pins
spark.sql.shuffle.partitions = local core count (32); the wedge
groupBy's per-partition hash-aggregate state grows k-fold with the
data while execution memory stays fixed (8 GB driver heap shared by
32 local threads), so the aggregate degrades into sort-spill and the
wall goes super-linear. The engine-level fix is NOT hand-tuning a
bigger constant — it's raising AQE's
``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` so the
shuffle STARTS wide (small per-task state at any scale) and AQE
coalesces back down when the inputs are small. That is the
scale-adaptive setting a 100 TB deployment runs with anyway.

Usage: python scripts/study_linkpred_partitions.py <staged_k4_dir>
Each configuration runs in a FRESH process (one JVM per config) via
re-exec, because shuffle.partitions/initialPartitionNum are
session-wide.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    ("baseline-32", {}),
    ("shuffle-256", {"spark.sql.shuffle.partitions": "256"}),
    (
        "aqe-init-512",
        {"spark.sql.adaptive.coalescePartitions.initialPartitionNum": "512"},
    ),
]


def run_child(d: str, conf_name: str) -> None:
    from gcd_etl_spark.plans import QUERIES
    from gcd_etl_spark.session import get_spark

    extra = dict(CONFIGS[[c[0] for c in CONFIGS].index(conf_name)][1])
    spark = get_spark("linkpred_parts", extra_conf=extra)
    q = QUERIES["graph_link_prediction_capped"]
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        q.build(spark, d).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"RESULT {conf_name} {best:.1f}", flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        run_child(sys.argv[3], sys.argv[2])
        return
    d = sys.argv[1]
    for name, _ in CONFIGS:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name, d],
            check=True,
        )


if __name__ == "__main__":
    main()
