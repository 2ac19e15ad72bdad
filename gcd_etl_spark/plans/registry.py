"""Query registry: name -> (spark builder, optional DuckDB oracle).

Conventions (driver compare is column-name-keyed + value-hashed):

* every computed column is aliased identically in the Spark plan and
  the oracle SQL;
* floating-point aggregates are ``round()``-ed the same on both sides
  (double summation order differs between engines; rounding makes the
  hash deterministic);
* list-valued results are sorted + joined to strings (the driver's
  hash is row-order-insensitive, not element-order-insensitive).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    build: SparkBuilder
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


def query(name: str, oracle: str | None = None):
    """Register a named query plan. Use as a decorator on the builder."""

    def _register(fn: SparkBuilder) -> SparkBuilder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, build=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return _register
