r"""Mysqldump staging parser: tokenizer units + distributed round-trip.

The parser is the engine's replacement for the reference's
dump -> MySQL -> JDBC path (reference Main.java:128-132,245-247), so
it must survive everything MySQL string escaping can emit: embedded
quotes, doubled quotes, backslash escapes, newlines-as-\n, NULLs,
negative/float bare tokens, parens and commas inside strings.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import types as T

from gcd_etl_spark.sources.dump import (
    cast_fields,
    format_insert_statements,
    insert_table_name,
    iter_insert_tuples,
    parse_insert_lines,
    sql_literal,
    stage_tsv_table,
)


def test_table_name_forms():
    assert insert_table_name("INSERT INTO `gcd_issue` VALUES (1);") == "gcd_issue"
    assert insert_table_name("INSERT INTO nation (a,b) VALUES (1,2);") == "nation"
    assert insert_table_name("-- comment line") is None
    assert insert_table_name("CREATE TABLE `x` (id int);") is None


def test_tuple_tokenizer_escapes():
    line = (
        "INSERT INTO `t` VALUES "
        r"(1,'it''s \'ok\'','a\nb',NULL,-2.5,'c,(d);e','\\'),"
        r"(2,'',NULL,'x\ty',3,'(',')');"
    )
    tups = list(iter_insert_tuples(line))
    assert tups == [
        ["1", "it's 'ok'", "a\nb", None, "-2.5", "c,(d);e", "\\"],
        ["2", "", None, "x\ty", "3", "(", ")"],
    ]


def test_writer_parser_inverse():
    rows = [
        (1, "plain", None, 2.75),
        (2, "q'uo\"te", "a;b\nc", -0.125),
        (3, "tab\there, (paren)", "\\back\\", 1e300),
    ]
    [line] = format_insert_statements("t", rows)
    got = [
        [f if f is None else f for f in tup] for tup in iter_insert_tuples(line)
    ]
    for orig, parsed in zip(rows, got):
        assert parsed[0] == repr(orig[0])
        assert parsed[1] == orig[1]
        assert parsed[2] == orig[2]
        assert float(parsed[3]) == orig[3]


def test_sql_literal_nulls_and_bools():
    assert sql_literal(None) == "NULL"
    assert sql_literal(True) == "1"
    assert sql_literal("a'b") == r"'a\'b'"


def test_distributed_parse_and_cast(spark):
    rows = [(i, f"name_{i}" if i % 3 else None, float(i) / 8, "1997-0%d-01 12:30:00" % (i % 9 + 1)) for i in range(500)]
    lines = format_insert_statements("docs", rows, rows_per_statement=64)
    lines += format_insert_statements("other", [(99, "x", 0.0, None)], 10)
    text = spark.createDataFrame([(ln,) for ln in lines], "value string").repartition(3)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    out = cast_fields(parse_insert_lines(text, "docs"), schema)
    pdf = out.toPandas().sort_values("id").reset_index(drop=True)
    assert len(pdf) == 500  # the `other` table's row is filtered out
    assert pdf["id"].tolist() == list(range(500))
    assert pdf.loc[0, "name"] is None or pd.isna(pdf.loc[0, "name"])
    assert pdf.loc[1, "name"] == "name_1"
    assert pdf["score"].tolist() == [i / 8 for i in range(500)]
    assert str(pdf.loc[2, "ts"]) == "1997-03-01 12:30:00"


def test_malformed_field_nulls_not_aborts(spark):
    lines = ["INSERT INTO `t` VALUES (1,'notanint'),(2,'77');"]
    text = spark.createDataFrame([(ln,) for ln in lines], "value string")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.IntegerType())]
    )
    got = cast_fields(parse_insert_lines(text, "t"), schema).collect()
    by_id = {r.id: r.v for r in got}
    assert by_id == {1: None, 2: 77}


def test_tsv_staging(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("1\ta\n2\t\\N\n3\tc\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    got = stage_tsv_table(spark, str(p), schema).collect()
    assert {(r.id, r.s) for r in got} == {(1, "a"), (2, None), (3, "c")}
