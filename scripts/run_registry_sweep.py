"""Registry-wide exact correctness sweep — the driver's comparator,
run over EVERY registered query (not just the driver's ~50-entry
window).

This is the staleness-refresh tool BASELINE.md's round-7 entry calls
for: rerun it whenever an operator shared by many plans changes (a
hash family, a scalar function, the session config), so a refactor
cannot silently break a query the driver won't re-sample for several
rounds. It replicates the external driver exactly: import
``__spark_entry__``, smoke ``entry(spark)``, then for each
``queries()`` entry run the Spark plan AND the DuckDB oracle over the
same parquet and compare rows column-sorted with exact float ``repr``
(no rounding slack — last-ulp float drift is a real mismatch; fix the
math, not the comparator).

Usage: python scripts/run_registry_sweep.py [sf_dir] [name_prefix...]
  sf_dir defaults to /root/testdata/sf0.01 (the driver's gate scale).
  Optional name prefixes restrict the sweep (e.g. ``dedup_ gcd_``).

Running it at sf0.1 (10x the gate) is a worthwhile periodic exercise
— the round-10 sf0.1 sweep caught a sort-key totality bug invisible
at sf0.01 (window_running_sum; see BASELINE.md). Caveat at sf0.1:
the CHECKER for dedup_clusters (~15 min, all-pairs Jaccard) is
super-linear on the DuckDB side — budget for it or sweep it
separately; the Spark plans themselves are fine. (entity_clusters*
stopped being a caveat in round 11: the pointer-doubling oracle runs
in ~5 s at sf0.1 where the old recursive closure blew 35 minutes.)
Prints one line per query (MATCH / MISMATCH / rows-only / ERROR) and a
final ``DONE bad=N`` summary; exit code 1 if any bad.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from gcd_etl_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])
    spark = get_spark("registry-sweep")
    smoke = entrymod.entry(spark)
    assert smoke.count() >= 0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    bad = 0
    t_start = time.perf_counter()
    for name, fn in sorted(entrymod.queries().items()):
        if prefixes and not name.startswith(prefixes):
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            print(name, "ERROR", repr(ex)[:200], flush=True)
            bad += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(name, "rows-only", len(s_rows), flush=True)
            continue
        res = con.execute(sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
        oi = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
        si = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
        ok = (
            sorted(sdf.columns) == sorted(o_cols)
            and sorted(tuple(_norm(r[i]) for i in si) for r in s_rows)
            == sorted(tuple(_norm(r[i]) for i in oi) for r in o_rows)
        )
        if not ok:
            bad += 1
        print(name, "MATCH" if ok else "MISMATCH", flush=True)
    print(f"DONE bad={bad} wall={time.perf_counter() - t_start:.0f}s", flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
