"""Parity of the fixture-derived GCD flagship (plans/gcd.py).

Two layers: (1) each derived input table matches between the Spark
and DuckDB dialects of the derivation (catches dialect drift at the
table that caused it, not 80 columns downstream); (2) the registered
``gcd_snapshot`` query hash-matches its full oracle — the same check
the driver runs at sf0.01.
"""

from __future__ import annotations

import pytest

from gcd_etl_spark.gcd.fixtures_adapter import (
    DUCK,
    derivation_sql,
    gcd_tables_from_fixtures,
)
from gcd_etl_spark.plans import QUERIES
from tests.conftest import SF_SMOKE, assert_df_matches_con, oracle_con


@pytest.fixture(scope="module")
def duck_fixture_con():
    con = oracle_con(SF_SMOKE)
    yield con
    con.close()


def test_each_derived_table_matches(spark, duck_fixture_con):
    src = {t: t for t in ("region", "nation", "customer", "supplier", "orders", "lineitem")}
    duck_sqls = derivation_sql(DUCK, src)
    spark_tables = gcd_tables_from_fixtures(spark, SF_SMOKE)
    for name, df in spark_tables.items():
        assert_df_matches_con(df, duck_fixture_con, duck_sqls[name], name)


def test_gcd_snapshot_query_matches_oracle(spark, duck_fixture_con):
    q = QUERIES["gcd_snapshot"]
    assert q.oracle is not None
    assert_df_matches_con(
        q.build(spark, SF_SMOKE), duck_fixture_con, q.oracle, "gcd_snapshot"
    )
