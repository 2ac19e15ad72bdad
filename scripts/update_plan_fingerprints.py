"""Regenerate tests/plan_fingerprints.json — the committed normalized
plan-shape baseline that tests/test_plan_fingerprints.py gates against
(round-11 verdict item 3).

Run this DELIBERATELY, in the same commit as any plan-affecting
change, and review the diff: it IS the structural-plan-change
acknowledgment. Fingerprints are recorded at sf0.001 (the pytest
smoke scale) so the gate runs in seconds.

Usage: python scripts/update_plan_fingerprints.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcd_etl_spark.plans import QUERIES  # noqa: E402
from gcd_etl_spark.plans.fingerprint import plan_fingerprint  # noqa: E402
from gcd_etl_spark.session import get_spark  # noqa: E402


def fingerprinted_queries() -> dict:
    """The gated set, name -> builder: the bench headline tier +
    every scale-critical plan PLANS.md dumps + the non-stream
    lifecycle tier — and, under ``<name>::bench_twin`` keys, every
    bench twin builder that differs from the registered query (the
    plans the bench ACTUALLY times: dedup_minhash_lsh_xxhash,
    bitext_mined_pairs; round-12 review finding — a structural
    regression in a benched production twin must not escape the gate
    just because its registered sibling carries the oracle).
    Streaming queries execute eagerly on build (their returned plan
    is a sink scan) and are excluded, same as
    tests/test_plan_audit.py."""
    import bench
    from scripts.dump_plans import DUMP

    builders: dict = {}
    for n in list(bench.HEADLINE) + list(bench.LIFECYCLE) + list(DUMP):
        if n.startswith("stream_") or n in builders or n not in QUERIES:
            continue
        builders[n] = QUERIES[n].build
    for n, twin in bench._bench_builders().items():
        if n in QUERIES and twin is not QUERIES[n].build and not n.startswith("stream_"):
            builders[f"{n}::bench_twin"] = twin
    return builders


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-fingerprints")
    out: dict[str, list[str]] = {}
    for name, build in fingerprinted_queries().items():
        out[name] = plan_fingerprint(build(spark, sf_dir))
        print(f"{name}: {len(out[name])} nodes")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "plan_fingerprints.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path} ({len(out)} fingerprints)")
    spark.stop()


if __name__ == "__main__":
    main()
