"""Bucketed-table co-location: the physical plan must carry ZERO
shuffle exchanges when both join sides are bucketed on the join key —
the storage-layout property the 100 TB design leans on."""

from __future__ import annotations

import contextlib
import io

from gcd_etl_spark.plans import QUERIES


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_smoke):
    df = QUERIES["bucketed_colocated_join"].build(spark, sf_smoke)
    plan = _formatted_plan(df)
    assert "Exchange" not in plan, plan
    # Both scans must read the bucketed tables, not raw parquet paths.
    assert "bkt_lineitem" in plan and "bkt_orders" in plan
    # and the result is still the plain join's answer (row spot check)
    n = df.count()
    assert n > 0


def test_range_join_is_not_nested_loop(spark, sf_smoke):
    """The binned rewrite must plan as an equi-join on (key, bin) —
    never the O(L x R) BroadcastNestedLoopJoin a bare inequality
    predicate produces."""
    df = QUERIES["range_join_events"].build(spark, sf_smoke)
    plan = _formatted_plan(df)
    assert "BroadcastNestedLoop" not in plan, plan
    assert "Join" in plan


def test_asof_join_single_shuffle(spark, sf_smoke):
    """The as-of composition shuffles on the key once (the window
    sort); no range-join candidate explosion, no nested loop."""
    df = QUERIES["asof_join_events"].build(spark, sf_smoke)
    plan = _formatted_plan(df)
    assert "BroadcastNestedLoop" not in plan, plan
