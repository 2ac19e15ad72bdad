"""Sketch aggregates stay within their error contracts vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcd_etl_spark.plans import QUERIES
from gcd_etl_spark.sources.catalog import read_table


def test_approx_distinct_within_bound(spark, sf_smoke):
    approx = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_approx_distinct"].build(spark, sf_smoke).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in read_table(spark, sf_smoke, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("parts"),
            F.expr("percentile(l_quantity, array(0.5, 0.95))").alias("qs"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert a["n_rows"] == e["n_rows"]
        # HLL++ rsd=0.02 -> allow 3 sigma
        assert abs(a["approx_parts"] - e["parts"]) <= max(2, 0.06 * e["parts"])
        for got, want in zip((a["qty_p50"], a["qty_p95"]), e["qs"]):
            assert abs(got - want) <= max(1.0, 0.05 * want)
