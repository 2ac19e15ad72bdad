"""Bucketed-vs-plain flagship at amplified scale (round 7).

The registered pair (gcd_snapshot vs gcd_snapshot_bucketed) measures
the exchange savings at sf0.1 (~11% single-node). This study asks the
100 TB question: does the gap grow with data volume? Facts replicated
in-plan 1x/2x/4x (same id-shift algebra as study_incremental_sweep),
staged bucketed once per amp (cost reported separately — it is the
ingest-side price), then both builds measured warm min-of-2.

Usage: python scripts/study_bucketed_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from urllib.parse import urlparse

from pyspark.sql import functions as F

from gcd_etl_spark.gcd.fixtures_adapter import gcd_tables_from_fixtures
from gcd_etl_spark.gcd.pipeline import build_snapshot, collect_dict_maps
from gcd_etl_spark.session import get_spark
from gcd_etl_spark.sources.sinks import write_bucketed_table
from scripts.study_incremental_sweep import amplify

RUN_DATE = "2024-01-15"
AMPS = (1, 2, 4)


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bucketed_sweep")
    base = gcd_tables_from_fixtures(spark, sf_dir)
    issue_span = base["gcd_issue"].agg(F.max("id")).collect()[0][0]
    dicts = collect_dict_maps(base)
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path

    print("| amp | issues | plain | bucketed | stage-write |")
    for k in AMPS:
        t = amplify(base, k, issue_span)
        # BOTH sides must read from parquet: an early revision
        # localCheckpointed the amplified frames, which let the
        # "plain" build scan RAM-backed RDD blocks while the bucketed
        # build paid disk parquet reads — a biased comparison that
        # made bucketing look like a loss at 4x.
        scratch = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            "spark-warehouse", f"bkt_sweep_plain_{k}",
        )
        for name in ("gcd_issue", "gcd_story", "gcd_story_credit"):
            p = f"{scratch}_{name}"
            t[name].write.mode("overwrite").parquet(p)
            t[name] = spark.read.parquet(p)
        n = t["gcd_issue"].count()

        plain = min(
            _noop(build_snapshot(spark, t, RUN_DATE, dicts=dicts)) for _ in range(2)
        )

        spec = {
            "gcd_issue": (f"bkt_sweep_issue_{k}", "id"),
            "gcd_story": (f"bkt_sweep_story_{k}", "id"),
            "gcd_story_credit": (f"bkt_sweep_credit_{k}", "story_id"),
        }
        t0 = time.perf_counter()
        tb = dict(t)
        for tbl, (nm, key) in spec.items():
            spark.sql(f"DROP TABLE IF EXISTS {nm}")
            shutil.rmtree(os.path.join(warehouse, nm), ignore_errors=True)
            write_bucketed_table(t[tbl], nm, [key], n_buckets=16, sort_cols=[key])
            tb[tbl] = spark.table(nm)
        stage = time.perf_counter() - t0

        bucketed = min(
            _noop(build_snapshot(spark, tb, RUN_DATE, dicts=dicts)) for _ in range(2)
        )
        print(
            f"| {k}x | {n} | {plain:.2f} | {bucketed:.2f} | {stage:.2f} |",
            flush=True,
        )
        for nm, _ in spec.values():
            spark.sql(f"DROP TABLE IF EXISTS {nm}")
            shutil.rmtree(os.path.join(warehouse, nm), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
