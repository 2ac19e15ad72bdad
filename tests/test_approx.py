"""Sketch aggregates stay within their error contracts vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcd_etl_spark.plans import QUERIES
from gcd_etl_spark.sources.catalog import read_table


def test_approx_distinct_bounds_flags(spark, sf_smoke):
    """The registered query's in-plan bound flags all hold (this is
    what the driver's DuckDB oracle asserts cross-engine)."""
    rows = QUERIES["agg_approx_distinct"].build(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["approx_parts_ok"] == 1, r
        assert r["p50_ok"] == 1, r
        assert r["p95_ok"] == 1, r
        assert r["exact_parts"] > 0 and r["n_rows"] > 0


def test_approx_distinct_within_bound(spark, sf_smoke):
    """Raw sketch values (HLL++, GK percentiles) vs exact answers —
    the tighter statistical contract behind the query's flags."""
    li = read_table(spark, sf_smoke, "lineitem")
    pcts = F.percentile_approx("l_quantity", [0.5, 0.95], 10000)
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.count_distinct("l_partkey").alias("parts"),
            pcts.getItem(0).alias("qty_p50"),
            pcts.getItem(1).alias("qty_p95"),
            F.expr("percentile(l_quantity, array(0.5, 0.95))").alias("qs"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # HLL++ rsd=0.02 -> allow 3 sigma
        assert abs(r["approx_parts"] - r["parts"]) <= max(2, 0.06 * r["parts"])
        for got, want in zip((r["qty_p50"], r["qty_p95"]), r["qs"]):
            assert abs(got - want) <= max(1.0, 0.05 * want)
