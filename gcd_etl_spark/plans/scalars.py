"""Scalar-function coverage (SURVEY.md §2.8 F1-F9, P4/P5).

Each query exercises one scalar-library function on fixture columns
with an exact DuckDB oracle restating the semantics independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcd_etl_spark.functions import scalar
from gcd_etl_spark.plans.registry import query
from gcd_etl_spark.sources.catalog import read_table

#: Literal dictionary for F9/J9 decode (matches the fixture region
#: table; key 99 exercises the map-miss -> null path).
REGION_DICT = {0: "AFRICA", 1: "AMERICA", 2: "ASIA", 3: "EUROPE", 4: "MIDDLE EAST"}


@query(
    "scalar_dates",
    oracle="""
SELECT o_orderkey,
       CAST(strftime(o_orderdate, '%Y%m%d') AS INT)      AS order_date_int,
       CAST(strftime(o_orderdate, '%Y%m%d') AS INT)      AS epoch_date_int,
       CASE WHEN regexp_matches(CAST(o_orderdate AS DATE)::VARCHAR, '^\\d{4}-\\d{2}-\\d{2}')
            THEN CAST(replace(substr(CAST(o_orderdate AS DATE)::VARCHAR, 1, 10), '-', '') AS INT)
            ELSE -1 END                                  AS parsed_date_int
FROM orders
""",
)
def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 (string date -> yyyymmdd int), F4 (epoch -> yyyymmdd int),
    and the typed-date variant, all agreeing on the same rows.

    F4 goes through real epoch seconds (``unix_timestamp``) exactly as
    the reference consumed ``UNIX_TIMESTAMP(created)``
    (reference Main.java:152-153,637-650), pinned to UTC.
    """
    orders = read_table(spark, sf_dir, "orders")
    epoch = F.unix_timestamp("o_orderdate")
    return orders.select(
        "o_orderkey",
        scalar.date_int_from_date("o_orderdate").alias("order_date_int"),
        scalar.epoch_to_date_int(epoch).alias("epoch_date_int"),
        scalar.date_str_to_int(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("parsed_date_int"),
    )


@query(
    "scalar_try_cast",
    oracle="""
SELECT o_orderkey,
       TRY_CAST(str_split(o_orderpriority, '-')[1] AS INT) AS priority_code,
       TRY_CAST(o_orderstatus AS INT)                      AS bogus_int,
       (o_orderstatus = 'O')                               AS is_open
FROM orders
""",
)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 try-cast (parse-or-null, reference Main.java:253-258) on a
    parsable prefix and an unparsable column; F8 int->bool analog."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        scalar.try_int(F.split(F.col("o_orderpriority"), "-").getItem(0)).alias("priority_code"),
        scalar.try_int("o_orderstatus").alias("bogus_int"),
        (F.col("o_orderstatus") == "O").alias("is_open"),
    )


@query(
    "scalar_multi_split",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_returnflag || '|' || l_linestatus AS parts,
       2::INT AS n_parts
FROM lineitem
""",
)
def scalar_multi_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 multi-value split (reference Main.java:535-547): build a
    semicolon list with stray spacing and a trailing separator, split
    it, and verify Java-compatible trailing-empty trimming.

    The oracle states the *expected output* directly — the engine path
    must reduce ``"A ; B;"`` to exactly ``[A, B]``.
    """
    li = read_table(spark, sf_dir, "lineitem")
    messy = F.concat(F.col("l_returnflag"), F.lit(" ; "), F.col("l_linestatus"), F.lit(";"))
    arr = scalar.multi_split(messy)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join(arr, "|").alias("parts"),
        F.size(arr).alias("n_parts"),
    )


@query(
    "scalar_dict_decode",
    oracle="""
SELECT n_nationkey,
       CASE n_regionkey WHEN 0 THEN 'AFRICA' WHEN 1 THEN 'AMERICA' WHEN 2 THEN 'ASIA'
                        WHEN 3 THEN 'EUROPE' WHEN 4 THEN 'MIDDLE EAST' END AS region_name,
       CASE n_nationkey + 100 WHEN 0 THEN 'AFRICA' END AS miss_decodes_null
FROM nation
""",
)
def scalar_dict_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/J9 dictionary decode as a literal map expression (reference
    Main.java:549-558); map-miss decodes to null (emit-only-on-hit)."""
    nation = read_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        scalar.dict_decode("n_regionkey", REGION_DICT).alias("region_name"),
        scalar.dict_decode(F.col("n_nationkey") + 100, REGION_DICT).alias("miss_decodes_null"),
    )


@query(
    "scalar_json",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k_int,
       json_extract_string(props, '$.k') AS k_str
FROM events
""",
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events ``props`` column —
    engine-surface extension (the reference has no JSON functions;
    SURVEY.md §2.8 'engine exposes Spark builtins')."""
    events = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return events.select(
        "event_id",
        k.cast("int").alias("k_int"),
        k.alias("k_str"),
    )


@query(
    "scalar_defaults",
    oracle="""
SELECT c_custkey,
       COALESCE(TRY_CAST(c_mktsegment AS INT), -1) AS seg_int_sentinel,
       COALESCE(c_name, '')                        AS name_defaulted,
       COALESCE(CAST(c_acctbal < 0 AS INT), -1)    AS neg_flag_int
FROM customer
""",
)
def scalar_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P5 sentinel + default fills (reference Main.java:560-617):
    -1 int sentinel for unparsable, '' string default, int-coded bool."""
    customer = read_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        scalar.int_with_default(scalar.try_int("c_mktsegment")).alias("seg_int_sentinel"),
        scalar.string_with_default("c_name").alias("name_defaulted"),
        scalar.int_with_default((F.col("c_acctbal") < 0).cast("int")).alias("neg_flag_int"),
    )
