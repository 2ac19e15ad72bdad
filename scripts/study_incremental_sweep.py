"""Flagship-edition scale sweep (round-6 verdict item 8).

Replicates the round-4 amplification methodology for the GCD
flagship: the issue/story/credit fact side is replicated in-plan
1x/2x/4x/8x with id-shifted copies (dimensions untouched,
localCheckpoint'ed so amplification cost is excluded), then at each
point we measure

* ``full``      — a complete snapshot rebuild over the amplified facts;
* ``carried``   — scanning the prior snapshot's carried parquet
                  partitions alone (the IO floor of an incremental run);
* ``incr_prop`` — incremental with the registered _fs predicate
                  (``id % 10 < 3``): the changed set grows WITH the
                  corpus (30% at every point);
* ``incr_const``— incremental where only the ORIGINAL copy's 30% is
                  deemed changed: the changed set is constant in
                  absolute size while the corpus grows — the nightly
                  regime (corpus grows, nightly churn doesn't).

The claim under test: incremental cost tracks the CHANGED FRACTION
(incr_const stays near-flat + the cheap carried scan), while the full
rebuild grows with corpus size. Results recorded in BASELINE.md.

Usage: python scripts/study_incremental_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gcd_etl_spark.gcd.fixtures_adapter import gcd_tables_from_fixtures
from gcd_etl_spark.gcd.pipeline import build_snapshot, collect_dict_maps
from gcd_etl_spark.session import get_spark

RUN_DATE = "2024-01-15"
AMPS = (1, 2, 4, 8)


def amplify(tables: dict, k: int, issue_span: int):
    """k id-shifted copies of the fact side (issue/story/credit).
    The shift is a multiple of 10 so ``id % 10`` residues — and with
    them the _fs changed predicate — are preserved in every copy."""
    if k == 1:
        return dict(tables)
    off0 = ((issue_span // 10) + 1) * 10
    issues, stories, credits = [], [], []
    for i in range(k):
        off = i * off0
        issues.append(tables["gcd_issue"].withColumn("id", F.col("id") + F.lit(off)))
        stories.append(
            tables["gcd_story"]
            .withColumn("id", F.col("id") + F.lit(off * 8))
            .withColumn("issue_id", F.col("issue_id") + F.lit(off))
        )
        credits.append(
            tables["gcd_story_credit"]
            .withColumn("id", F.col("id") + F.lit(off * 8))
            .withColumn("story_id", F.col("story_id") + F.lit(off * 8))
        )
    out = dict(tables)
    from functools import reduce

    out["gcd_issue"] = reduce(lambda a, b: a.unionByName(b), issues)
    out["gcd_story"] = reduce(lambda a, b: a.unionByName(b), stories)
    out["gcd_story_credit"] = reduce(lambda a, b: a.unionByName(b), credits)
    return out


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("incr_sweep")
    base = gcd_tables_from_fixtures(spark, sf_dir)
    issue_span = base["gcd_issue"].agg(F.max("id")).collect()[0][0]
    dicts = collect_dict_maps(base)
    scratch = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "spark-warehouse", "incr_sweep_prior")

    print("| amp | rows | full | carried | incr_prop | incr_const | delta_const |")
    for k in AMPS:
        t = amplify(base, k, issue_span)
        # amplification cost out of the measurement
        for name in ("gcd_issue", "gcd_story", "gcd_story_credit"):
            t[name] = t[name].localCheckpoint(eager=True)
        n_rows = t["gcd_issue"].count()

        build = lambda tt: build_snapshot(spark, tt, RUN_DATE, dicts=dicts)
        # warm + min-of-2 full build
        full = min(_noop(build(t)) for _ in range(2))

        # prior snapshot for the carry (write cost excluded), bucketed
        # on id%10 like the registered _fs query
        prior = f"{scratch}_{k}"
        (build(t).withColumn("issue_bucket", F.col("issue_id") % 10)
         .write.mode("overwrite").partitionBy("issue_bucket").parquet(prior))

        carried_df = spark.read.parquet(prior).where(F.col("issue_bucket") >= 3).drop("issue_bucket")
        carried = min(_noop(carried_df) for _ in range(2))

        from gcd_etl_spark.plans.gcd import _restrict_to_issues

        # proportional changed set: id % 10 < 3 in EVERY copy (30%)
        tp = _restrict_to_issues(t, t["gcd_issue"].where(F.col("id") % 10 < 3))
        incr_prop = min(
            _noop(build(tp).unionByName(carried_df)) for _ in range(2)
        )

        # constant-absolute changed set: only the original copy's 30%
        tc = _restrict_to_issues(
            t,
            t["gcd_issue"].where(
                (F.col("id") % 10 < 3) & (F.col("id") <= issue_span)
            ),
        )
        carried_const = spark.read.parquet(prior).where(
            ~((F.col("issue_id") % 10 < 3) & (F.col("issue_id") <= issue_span))
        ).drop("issue_bucket")
        # delta alone = the true nightly cost when the carry is a
        # metadata-only partition retain (no rewrite, no re-scan)
        delta_const = min(_noop(build(tc)) for _ in range(2))
        incr_const = min(
            _noop(build(tc).unionByName(carried_const)) for _ in range(2)
        )
        print(
            f"| {k}x | {n_rows} | {full:.2f} | {carried:.2f} "
            f"| {incr_prop:.2f} | {incr_const:.2f} | {delta_const:.2f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
