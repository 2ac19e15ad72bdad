"""Differential parity: every registered query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate locally (sf0.001 for
speed; the driver runs sf0.01). Queries without an oracle get a
rows-only smoke (runs + stable schema).
"""

from __future__ import annotations

import pytest

from gcd_etl_spark.plans import QUERIES
from tests.conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    df = q.build(spark, SF_SMOKE)
    if q.oracle is None:
        rows = df.limit(10).collect()
        assert df.columns, f"{name}: no output columns"
        assert rows is not None
    else:
        assert_matches_oracle(df, q.oracle, SF_SMOKE, name=name)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.columns
    assert df.count() >= 0
    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs), "oracle keys must be a subset of query keys"
    assert len(qs) > 0
