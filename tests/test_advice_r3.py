"""Regression tests for the round-3 ADVICE/VERDICT fixes.

One test per finding:
  * dump.py INSERT-line predicate is whitespace/case tolerant and
    counts (never silently drops) non-matching survivor lines;
  * VALUES keyword located outside backtick/paren context — a table
    or column literally named "values" cannot fool the tokenizer;
  * arity-mismatched tuples are quarantined + counted, not null-padded;
  * sql_literal maps non-finite floats to NULL explicitly;
  * multimodal real-codec branch refuses at plan-BUILD time;
  * neardup_pairs_blas enforces its documented matrix size bound;
  * the quadratic expression anchor refuses oversized corpora and is
    no longer on the registered query surface.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import types as T

from gcd_etl_spark.sources import dump as D


def _lines_df(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


_SCHEMA2 = T.StructType(
    [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
)


def test_insert_predicate_tolerates_whitespace_and_case(spark):
    lines = [
        "  INSERT INTO nation VALUES (1,'x');",  # leading whitespace
        "insert into nation values (2,'y');",  # lowercase
        "INSERT INTO `nation` VALUES (3,'z');",  # canonical backticked
        "INSERT INTO nation(a,b) VALUES (4,'w');",  # paren right after name
    ]
    got = D.cast_fields(
        D.parse_insert_lines(_lines_df(spark, lines), "nation"), _SCHEMA2
    ).collect()
    assert sorted((r["a"], r["b"]) for r in got) == [
        (1, "x"),
        (2, "y"),
        (3, "z"),
        (4, "w"),
    ]


def test_insert_predicate_counts_other_table_lines(spark):
    lines = [
        "INSERT INTO `nation` VALUES (1,'x');",
        # survives the coarse prefilter (contains 'nation') but belongs
        # to another table -> must be counted, not silently dropped
        "INSERT INTO `nation_backup` VALUES (9,'q');",
    ]
    metrics: dict = {}
    out = D.parse_insert_lines(_lines_df(spark, lines), "nation", metrics=metrics)
    assert out.count() == 1
    assert metrics["other_table_lines"].value == 1


def test_values_keyword_in_identifier_not_mistaken(spark):
    # table named order_values, column named `values` (--complete-insert
    # form): naive upper().find('VALUES') would land inside the
    # identifiers and yield the column list as a data tuple.
    lines = [
        "INSERT INTO `order_values` (`values`,`x`) VALUES (1,'a'),(2,'b');",
    ]
    got = D.cast_fields(
        D.parse_insert_lines(_lines_df(spark, lines), "order_values"), _SCHEMA2
    ).collect()
    assert sorted((r["a"], r["b"]) for r in got) == [(1, "a"), (2, "b")]


def test_values_start_unit():
    assert D._values_start("INSERT INTO `t` VALUES (1)") > 0
    assert D._values_start("  insert into t (a,b) values (1,2)") > 0
    v = D._values_start("INSERT INTO `order_values` (`values`) VALUES (9)")
    assert v > 0 and "(`values`)" not in "INSERT INTO `order_values` (`values`) VALUES (9)"[v:]
    assert D._values_start("SELECT 1") == -1
    assert D._values_start("INSERT INTO t (a,b)") == -1  # no VALUES at all


def test_arity_mismatch_quarantined_and_counted(spark):
    lines = [
        "INSERT INTO `t` VALUES (1,'ok'),(2),(3,'ok',99),(4,'ok');",
    ]
    metrics: dict = {}
    parsed = D.parse_insert_lines(
        _lines_df(spark, lines), "t", expect_arity=2, metrics=metrics
    )
    got = D.cast_fields(parsed, _SCHEMA2).collect()
    assert sorted((r["a"], r["b"]) for r in got) == [(1, "ok"), (4, "ok")]
    assert metrics["arity_mismatch_tuples"].value == 2


def test_cast_fields_strict_filters_short_tuples(spark):
    parsed = spark.createDataFrame(
        [(["1", "x"],), (["2"],)], "fields array<string>"
    )
    assert [(r["a"], r["b"]) for r in D.cast_fields(parsed, _SCHEMA2).collect()] == [
        (1, "x")
    ]
    # non-strict keeps the legacy null-padding behavior, explicitly
    assert D.cast_fields(parsed, _SCHEMA2, strict=False).count() == 2


def test_sql_literal_nonfinite_floats():
    assert D.sql_literal(float("inf")) == "NULL"
    assert D.sql_literal(float("-inf")) == "NULL"
    assert D.sql_literal(float("nan")) == "NULL"
    assert D.sql_literal(1.5) == "1.5"
    assert math.isfinite(1.5)  # sanity


def test_multimodal_gate_raises_at_plan_build(spark, monkeypatch):
    from gcd_etl_spark.operators import multimodal as M

    df = spark.createDataFrame([(1, b"abc")], "media_id long, payload binary")
    monkeypatch.setattr(M, "_HAVE_CODECS", True)
    with pytest.raises(NotImplementedError, match="plan|decoder|codec"):
        M.decode_media_meta(df)  # plan BUILD, no action needed


def test_blas_neardup_size_bound(spark, sf_smoke):
    from gcd_etl_spark.operators import similarity as S
    from gcd_etl_spark.sources.catalog import read_table

    emb = read_table(spark, sf_smoke, "embeddings")
    with pytest.raises(ValueError, match="exceeds.*bound"):
        S.neardup_pairs_blas(emb, threshold=0.9, max_bytes=1024)


def test_quadratic_anchor_demoted_and_guarded(spark, sf_smoke, monkeypatch):
    from gcd_etl_spark.plans import QUERIES
    from gcd_etl_spark.plans import similarity as sim_plans

    assert "sim_embedding_neardup" not in QUERIES
    monkeypatch.setattr(sim_plans, "NEARDUP_ANCHOR_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        sim_plans.sim_embedding_neardup(spark, sf_smoke)


#: Rows-only entries DELIBERATELY windowed: DRAINED TO EMPTY in round
#: 10 (round-9 verdict item 3). The six no_oracle registrants are
#: gone from the registry: the dedup/ANN names now bind their
#: value-oracled builds (the xxhash/raw-top-k production variants
#: live on as unregistered builders, twin-pinned in
#: tests/test_round7.py), and cluster_kmeans folded into its
#: quality-gated twin. Every registered query now carries an oracle;
#: this set existing (and being empty) keeps the invariant loud.
_WINDOW_ROWS_ONLY_OK: set[str] = set()


def test_driver_window_all_oracled():
    """EVERY registry entry must carry a DuckDB oracle (since round
    10 — the driver's correctness file must be able to read 100%
    green, with zero err:no_oracle rows). Exceptions are explicit and
    documented (_WINDOW_ROWS_ONLY_OK, empty since r10), never
    incidental."""
    from gcd_etl_spark.plans import QUERIES

    missing = [
        n
        for n in QUERIES
        if QUERIES[n].oracle is None and n not in _WINDOW_ROWS_ONLY_OK
    ]
    assert not missing, f"registry entries without oracle: {missing}"
