"""Isolated re-profile of bench headline movers (round-9 verdict
item 2): the r9 DRIVER bench read 20.28 s total vs 15.56 s in r8,
with join_left_fanout +60%, sim_bruteforce_topk +63%,
q1_pricing_summary +47% — while the same round's controlled closing
run read 15.97 s and no plan changed. This script adjudicates
load-vs-regression by MEASUREMENT, per the repo's variance protocol
(BASELINE.md rounds 3/9):

* one FRESH JVM per (query, repetition) — subprocess isolation, no
  shared-session cache/compile contamination;
* inside each JVM: one warmup execution, then min-of-2 timed runs
  (the bench's own steady-state rule);
* R independent repetitions per query so ambient load shows up as
  spread, a real regression as a shifted floor.

Usage: python scripts/profile_bench_movers.py [queries...]
Prints one line per repetition and a min/median summary to paste
into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

DEFAULT_QUERIES = ["join_left_fanout", "sim_bruteforce_topk", "q1_pricing_summary"]
REPS = 3

_CHILD = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from gcd_etl_spark.session import get_spark
from bench import _bench_builders, _materialize
spark = get_spark("gcd_etl_profile")
build = _bench_builders()[{name!r}]
sf_dir = {sf_dir!r}
_materialize(build(spark, sf_dir))  # warmup: codegen + parquet footers
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    _materialize(build(spark, sf_dir))
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"query": {name!r}, "warm_min2": round(best, 3)}}))
spark.stop()
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = sys.argv[1:] or DEFAULT_QUERIES
    results: dict[str, list[float]] = {q: [] for q in queries}
    for rep in range(REPS):
        for name in queries:
            code = _CHILD.format(repo=repo, name=name, sf_dir=sf_dir)
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            v = json.loads(line)["warm_min2"]
            results[name].append(v)
            print(f"rep {rep + 1} {name}: {v}s", flush=True)
    print("\n| query | runs (warm min-of-2, fresh JVM each) | min | median |")
    print("|---|---|---|---|")
    for name, vals in results.items():
        runs = ", ".join(f"{v:.2f}" for v in vals)
        print(
            f"| {name} | {runs} | {min(vals):.2f} | "
            f"{statistics.median(vals):.2f} |"
        )


if __name__ == "__main__":
    main()
