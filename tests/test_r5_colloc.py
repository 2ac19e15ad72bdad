"""Semantic tests for text_pmi_collocations and dq_key_skew_report."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_collocations_match_python_model(spark):
    from gcd_etl_spark.plans.corpus import (
        COLLOC_MIN_COUNT,
        COLLOC_TOP_K,
        text_pmi_collocations,
    )
    from gcd_etl_spark.sources.catalog import read_table

    docs = read_table(spark, SF_SMOKE, "documents").select("text").collect()
    uni: dict[str, int] = {}
    bi: dict[str, int] = {}
    for d in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", d["text"].lower()) if t]
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[f"{a} {b}"] = bi.get(f"{a} {b}", 0) + 1
    n = sum(uni.values())
    scored = []
    for bg, c_ab in bi.items():
        if c_ab < COLLOC_MIN_COUNT:
            continue
        a, b = bg.split(" ")
        pmi = math.floor(math.log(c_ab * n / (uni[a] * uni[b])) * 1e6 + 0.5)
        scored.append((-pmi, bg, c_ab))
    scored.sort()
    want = [(bg, -negpmi, c) for negpmi, bg, c in scored[:COLLOC_TOP_K]]
    got = sorted(
        text_pmi_collocations(spark, SF_SMOKE).collect(), key=lambda r: r["rank"]
    )
    assert [(r["bigram"], r["pmi_micro"], r["c_ab"]) for r in got] == want


def test_skew_report_is_internally_consistent(spark):
    from gcd_etl_spark.plans.quality import dq_key_skew_report
    from gcd_etl_spark.sources.catalog import read_table

    row = dq_key_skew_report(spark, SF_SMOKE).collect()[0]
    li = read_table(spark, SF_SMOKE, "lineitem")
    counts = [
        r["n"] for r in li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert row["n_keys"] == len(counts)
    assert row["n_rows"] == sum(counts)
    assert row["max_rows"] == max(counts)
    assert row["p99_rows"] <= row["max_rows"]
    assert row["skew_ratio_ppm"] == row["max_rows"] * len(counts) * 1_000_000 // sum(counts)
    assert row["skew_ratio_ppm"] >= 1_000_000  # max >= mean always
