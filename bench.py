"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line::

    {"metric": "headline_total_wall", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is materialized with the ``noop`` sink (full execution,
no driver-side collect — the same shape a cluster job has). A warmup
run of the flagship amortizes JVM/codegen startup out of the numbers;
each query reports the MIN of two executions (steady-state wall time
— a single sample conflates the query with whatever else the machine
was doing that second; min-of-2 is the standard way to measure the
engine, not the noise).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gcd_etl_spark.plans import QUERIES  # noqa: E402
from gcd_etl_spark.session import get_spark  # noqa: E402

#: Headline set: the flagship denorm + the scale-stressing operators
#: (shuffle-heavy joins/aggs, window fns, LSH dedup, ANN similarity,
#: text analysis, event-time windows).
HEADLINE = [
    "gcd_snapshot",
    "snapshot_denorm",
    "q1_pricing_summary",
    "join_left_fanout",
    "agg_rollup",
    "window_topk_per_group",
    "sort_limit_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_bruteforce_topk",
    "text_token_stats",
    "win_session",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(app_name="gcd_etl_spark_bench")

    # Warmup: JVM + codegen + parquet footer caches. Both flagship
    # plans run once so measured numbers are steady-state throughput,
    # not one-time plan compilation. Warmup failures are non-fatal —
    # the per-query loop reports its own.
    for warm in ("snapshot_denorm", "gcd_snapshot"):
        try:
            _materialize(QUERIES[warm].build(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"warmup {warm} failed: {exc}", file=sys.stderr)

    # Per-query fault isolation: one broken plan must not take the
    # other timings (or the JSON line) down with it — a bench harness
    # degrades, it doesn't crash. Failures time as null.
    timings: dict[str, float | None] = {}
    for name in HEADLINE:
        q = QUERIES[name]
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                _materialize(q.build(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            print(f"bench query {name} failed: {exc}", file=sys.stderr)
            timings[name] = None

    total = round(sum(t for t in timings.values() if t is not None), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
