"""ANSI-SQL query surface (SURVEY.md §3.4).

The reference's read side is "SQL over the partitioned snapshot
table" (Athena external table, reference gcdissuesnapshot.sql:1-95).
These plans exercise the engine's equivalent — ``spark.sql`` over
registered views — with classic TPC-H-shaped analytics, so the SQL
entry point is a tested first-class citizen, not just the DataFrame
API. DuckDB runs near-identical text as the oracle; the point is that
BOTH engines accept the same ANSI subset.

Scale notes: these are pure declarative statements — Catalyst picks
broadcast vs shuffle joins and AQE re-plans at runtime; the SQL
surface adds zero physical-plan risk over the DataFrame surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gcd_etl_spark.plans.registry import query
from gcd_etl_spark.sources.catalog import read_table

# Decimal-exact money math on BOTH engines (functions/numeric.py
# discipline): SUM over doubles is order-dependent, and Spark's task
# order differs from DuckDB's scan order — ROUND(SUM(double),2) drifts
# at half-cent boundaries as data grows. DECIMAL sums are exact, so
# ROUND then CAST to double hashes identically.
_REV = (
    "ROUND(CAST(SUM(CAST({p} AS DECIMAL(18,2))"
    " * (1 - CAST({d} AS DECIMAL(18,2)))) AS DOUBLE), 2)"
)

_Q3 = f"""
SELECT l.l_orderkey AS orderkey,
       {_REV.format(p='l.l_extendedprice', d='l.l_discount')} AS revenue,
       CAST(date_format(o.o_orderdate, 'yyyyMMdd') AS INT) AS orderdate_int,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderkey
LIMIT 20
"""

_Q3_ORACLE = f"""
SELECT l.l_orderkey AS orderkey,
       {_REV.format(p='l.l_extendedprice', d='l.l_discount')} AS revenue,
       CAST(strftime(o.o_orderdate, '%Y%m%d') AS INT) AS orderdate_int,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderkey
LIMIT 20
"""

_Q5 = f"""
SELECT n.n_name AS nation,
       {_REV.format(p='l.l_extendedprice', d='l.l_discount')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""

# Sums are decimal-exact, then CAST to double BEFORE dividing: both
# engines see bit-identical IEEE operands, so quotient and ROUND(.,4)
# agree (decimal/decimal division rounds at engine-specific scales).
_Q14 = """
SELECT ROUND(100.00 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                               THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                               ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
         AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
"""


def _views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...]) -> None:
    for t in tables:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query("sql_q3_shipping_priority", oracle=_Q3_ORACLE)
def sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through the spark.sql entry point: 3-way join,
    grouped revenue, deterministic top-20."""
    _views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q3)


@query("sql_q5_local_supplier", oracle=_Q5)
def sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join incl. a compound join predicate
    (supplier and customer in the same nation), region filter."""
    _views(spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region"))
    return spark.sql(_Q5)


@query("sql_q14_promo_revenue", oracle=_Q14)
def sql_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio over
    lineitem ⋈ part (LIKE predicate inside a CASE)."""
    _views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q14)


_Q6 = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

_Q10 = """
SELECT c.c_custkey AS custkey,
       c.c_name AS name,
       n.n_name AS nation,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, custkey
LIMIT 20
"""


@query("sql_q6_forecast_revenue", oracle=_Q6)
def sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: scan-only predicate aggregate — the filter
    (date range + discount band + quantity cap) must reach the parquet
    scan as pushed filters; decimal-exact revenue."""
    _views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q6)


@query("sql_q10_returned_items", oracle=_Q10)
def sql_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-way join with a selective fact-side filter
    (returned lines in a quarter), grouped revenue, deterministic
    top-20."""
    _views(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return spark.sql(_Q10)
