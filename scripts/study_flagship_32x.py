"""32x flagship scaling run (round-11 verdict item 7).

The standing amplified audit (study_amplified_audit.py) tops out at
8x and never amplified `gcd_snapshot` at all — the flagship reads SIX
fixture tables through the GCD adapter, and amplifying them
independently would tear the foreign keys apart. This script stages a
CONSISTENT multi-table amplification: per copy i, every key column
shifts by i * span(key domain), with the span computed over the key
DOMAIN (max across all tables sharing the key — lineitem.l_orderkey
and orders.o_orderkey must move together), as a multiple of a power
of 10 so the %-residue scalar semantics inside the plan keep behaving
like base data. region/nation stay shared (dimension keys unshifted,
so every copy joins the same broadcast dims — exactly how a 32x
corpus would share them).

Two audited subjects, per the verdict: the flagship snapshot and one
dedup lifecycle (dedup_delta_vs_corpus — documents amplified with the
main audit's doc_id shift + suffix-token convention; its
fingerprint-keyed band index stages on first run and the second run
is the steady-state probe).

Usage (one fresh JVM per invocation, per the variance protocol):
  python scripts/study_flagship_32x.py <sf_dir> stage <k>
  python scripts/study_flagship_32x.py <sf_dir> run <query> <k> [runs]
`run` prints one line: query, k, wall seconds (min over runs), and
plan-shape features.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gcd_etl_spark.plans import QUERIES
from gcd_etl_spark.session import get_spark

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: key domains: every (table, column) sharing a domain shifts by ONE
#: span so foreign keys stay consistent across the copies.
KEY_DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
}

AMPLIFIED = ["orders", "lineitem", "customer", "supplier", "part"]


def _span10(v: int) -> int:
    return 10 ** (len(str(max(int(v), 1))) + 1)


def stage(spark, sf_dir: str, k: int, scratch_root: str) -> str:
    sftag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    d = os.path.join(scratch_root, f"flagship_{sftag}_k{k}")
    os.makedirs(d, exist_ok=True)
    # one span per key DOMAIN (max over every table carrying the key)
    spans: dict[str, int] = {}
    for dom, cols in KEY_DOMAINS.items():
        mx = 1
        for t, c in cols:
            v = (
                spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
                .agg(F.max(c))
                .collect()[0][0]
            )
            mx = max(mx, int(v or 1))
        spans[dom] = _span10(mx)
    shift_cols = {
        t: [(c, spans[dom]) for dom, cols in KEY_DOMAINS.items() for tt, c in cols if tt == t]
        for t in AMPLIFIED
    }
    for t in ALL_TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(d, f"{t}.parquet")
        if t in AMPLIFIED:
            if not os.path.exists(os.path.join(dst, "_SUCCESS")):
                base = spark.read.parquet(src)
                parts = []
                for i in range(k):
                    p = base
                    for c, span in shift_cols[t]:
                        p = p.withColumn(c, F.col(c) + F.lit(i * span))
                    parts.append(p)
                out = parts[0]
                for p in parts[1:]:
                    out = out.unionByName(p)
                out.write.mode("overwrite").parquet(dst)
            n_base = spark.read.parquet(src).count()
            n_amp = spark.read.parquet(dst).count()
            if n_amp != k * n_base:
                raise AssertionError(f"{dst}: {n_amp} rows, want {k}x{n_base}")
        elif not os.path.exists(dst):
            os.symlink(src, dst)
    return d


def stage_documents(spark, sf_dir: str, k: int, scratch_root: str) -> str:
    """The dedup-lifecycle staging: documents amplified with the main
    audit's convention (doc_id shift + per-copy suffix token), rest
    symlinked."""
    sftag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    d = os.path.join(scratch_root, f"dedup32_{sftag}_k{k}")
    os.makedirs(d, exist_ok=True)
    src = os.path.join(sf_dir, "documents.parquet")
    dst = os.path.join(d, "documents.parquet")
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        base = spark.read.parquet(src)
        mx = int(base.agg(F.max("doc_id")).collect()[0][0] or 1)
        span = _span10(mx)
        parts = [base]
        for i in range(1, k):
            parts.append(
                base.withColumn("doc_id", F.col("doc_id") + F.lit(i * span))
                .withColumn("text", F.concat(F.col("text"), F.lit(f" amp{i}")))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)
    n_base = spark.read.parquet(src).count()
    n_amp = spark.read.parquet(dst).count()
    if n_amp != k * n_base:
        raise AssertionError(f"{dst}: {n_amp} rows, want {k}x{n_base}")
    for t in ALL_TABLES:
        if t == "documents":
            continue
        lnk = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(lnk):
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), lnk)
    return d


def plan_features(df) -> dict[str, int]:
    import re

    s = df._jdf.queryExecution().executedPlan().toString()
    out = {
        "exchanges": s.count("Exchange"),
        "bhj": s.count("BroadcastHashJoin"),
        "smj": s.count("SortMergeJoin"),
        "skew": s.count("isSkew=true"),
    }
    out["wsc"] = len(set(re.findall(r"\*\((\d+)\)", s)))
    return out


def main() -> None:
    sf_dir, mode = sys.argv[1], sys.argv[2]
    scratch = os.environ.get("GCD_AUDIT_SCRATCH", "/tmp/gcd_flagship_32x")
    os.makedirs(scratch, exist_ok=True)
    spark = get_spark(app_name=f"flagship32x_{mode}")
    if mode == "stage":
        k = int(sys.argv[3])
        print("staged", stage(spark, sf_dir, k, scratch))
        print("staged", stage_documents(spark, sf_dir, k, scratch))
    elif mode == "run":
        name, k = sys.argv[3], int(sys.argv[4])
        runs = int(sys.argv[5]) if len(sys.argv) > 5 else 2
        stager = stage_documents if name.startswith(("dedup", "stream")) else stage
        d = stager(spark, sf_dir, k, scratch)
        best, feats = float("inf"), {}
        for _ in range(runs):
            t0 = time.perf_counter()
            df = QUERIES[name].build(spark, d)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            try:
                feats = plan_features(df)
            except Exception:  # noqa: BLE001
                feats = {}
        print(f"{name} k={k} wall={best:.2f}s feats={feats}")
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
