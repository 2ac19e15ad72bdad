"""Per-run Spark JOB COUNT + wall for named queries (round-14 tooling).

Walls on this box are episodic (host-level steal; see
OPTIMIZATION_r13.md), so the deterministic structural metric — how
many Spark jobs one build+materialize of a query runs — is the primary
before/after evidence for driver-loop/staging optimizations. Usage:

    python scripts/profile_job_counts.py sf_dir query [query ...]

Prints one line per query: name, jobs, wall seconds (build+execute,
fresh in-process state; first query in the list pays session warmup —
pass a throwaway first or compare like with like).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcd_etl_spark.plans import QUERIES  # noqa: E402
from gcd_etl_spark.session import get_spark  # noqa: E402


def n_jobs(spark) -> int:
    return spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("gcd_etl_profile_jobs")
    from bench import _bench_builders, _materialize

    builders = _bench_builders()
    for n in QUERIES:
        builders.setdefault(n, QUERIES[n].build)
    for name in names:
        j0, t0 = n_jobs(spark), time.perf_counter()
        _materialize(builders[name](spark, sf_dir))
        wall = time.perf_counter() - t0
        print(f"{name}\tjobs={n_jobs(spark) - j0}\twall={wall:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
