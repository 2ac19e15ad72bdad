"""Cross-engine-deterministic numeric helpers.

Floating-point aggregation is order-dependent and ``ROUND`` on a
double differs between engines at decimal midpoints, so any
differential harness (our DuckDB oracle gate) — and any reproducible
pipeline — needs money math done on exact decimals:

* source money columns carry <= ``scale`` true decimal digits;
  casting the stored double to ``DECIMAL(p, scale)`` recovers the
  exact value;
* decimal arithmetic/aggregation is exact and associative (shuffle
  order can't change the result — which also makes 100 TB runs
  bit-reproducible across cluster sizes);
* the final ``cast(double)`` from an exact decimal is deterministic
  IEEE nearest, so both engines emit identical bits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_PRECISION = 18


def as_money(col: Column | str, scale: int = 2, precision: int = DEFAULT_PRECISION) -> Column:
    """Exact decimal view of a money-like double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def exact_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sum of a money column, emitted as double."""
    return F.sum(as_money(col, scale)).cast("double")


def exact_avg(col: Column | str, scale: int = 2) -> Column:
    """avg = exact decimal sum cast to double, / count — one IEEE
    division, identical in any engine."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(as_money(c, scale)).cast("double") / F.count(c)
