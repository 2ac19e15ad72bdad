"""Memo for CONSTRUCTED Column expression trees / plan fragments.

Round 13 (optimization): building a wide projection Column-by-Column
costs one py4j round trip (~0.3 ms) per function call — the flagship's
89-column select plus its helpers was ~11,000 round trips, ~3.6 s of
pure driver-side socket latency PER BUILD, paid again on every bench
rep (min-of-2 rebuilds the DataFrame) and every micro-batch that
reconstructs the same expressions. The resulting Columns are pure
unresolved expression trees, reusable across DataFrames (names bind at
analysis), so rebuilding them is thrown-away work (guide §1.2).

This caches EXPRESSIONS (and, where explicitly keyed, pure plan
fragments over immutable inputs) — never data, never query results;
every execution still computes from the parquet inputs. Keys lead with
the active py4j gateway identity so a restarted JVM can never be
served another gateway's stale JavaObject handles. Callers whose
expression embeds anything data-derived (e.g. a collected decode map)
MUST fold that data into the key, so the cache can only ever replay
the exact expression the data implies — the data collection itself is
never skipped.
"""

from __future__ import annotations

_CACHE: dict = {}


def cached(key: tuple, builder):
    """Return ``builder()`` memoized per (active py4j gateway, key)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    full = (id(sc._gateway) if sc is not None else None,) + key
    if full not in _CACHE:
        _CACHE[full] = builder()
    return _CACHE[full]
