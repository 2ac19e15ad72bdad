"""Manual harness: run the driver's 50-query correctness window at
sf0.01 (the driver's actual scale factor) and report per-query status.

Not collected by pytest (no test_ prefix) — invoke directly:

    python tests/verify_window_sf001.py [N]

This exists because tests/test_parity.py runs the same differential
check at sf0.001 for speed; the driver gate runs sf0.01, and a few
failure modes (float hash drift, bucket-count edge cases) only appear
at the larger scale.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcd_etl_spark.plans import QUERIES  # noqa: E402
from gcd_etl_spark.session import get_spark  # noqa: E402
from tests.conftest import SF_CORRECT, assert_matches_oracle  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = get_spark(app_name="verify_window", shuffle_partitions=16)
    names = list(QUERIES)[:n]
    failures = []
    for name in names:
        q = QUERIES[name]
        t0 = time.time()
        try:
            df = q.build(spark, SF_CORRECT)
            if q.oracle is None:
                rows = df.limit(10).collect()
                # every rows-only query is expected to produce output
                # at sf0.01 — an empty result is a silent failure
                assert df.columns and len(rows) > 0
                status = "rows-only"
            else:
                assert_matches_oracle(df, q.oracle, SF_CORRECT, name=name)
                status = "green"
        except Exception as exc:  # noqa: BLE001 — report-all harness
            status = f"FAIL: {exc}"
            failures.append((name, traceback.format_exc()))
        print(f"{name:36s} {time.time() - t0:6.1f}s  {status[:120]}", flush=True)
    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for name, tb in failures:
            print(f"--- {name} ---\n{tb}")
        return 1
    print(f"\nall {len(names)} window queries green at sf0.01")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
