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


# --------------------------------------------------------------------
# Wider TPC-H-shaped subset (adapted to the fixture columns: no
# partsupp / commitdate / shipmode / phone — each query keeps the
# original's *plan shape*, which is what we're testing: semi/anti
# joins from EXISTS / NOT EXISTS, correlated scalar subqueries,
# CTE reuse, disjunctive pushdown, distinct aggregation).
# Spark and DuckDB run IDENTICAL text for all of these.

_Q4 = """
SELECT o.o_orderpriority AS orderpriority,
       COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
ORDER BY orderpriority
"""

_Q7 = f"""
SELECT supp_nation, cust_nation, l_year,
       ROUND(CAST(SUM(volume) AS DOUBLE), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

_Q9 = """
SELECT nation, o_year,
       ROUND(CAST(SUM(amount) AS DOUBLE), 2) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

_Q12 = """
SELECT l.l_linestatus AS linestatus,
       -- BIGINT cast: DuckDB's SUM(INTEGER) is HUGEINT, Spark's is
       -- BIGINT; the driver value-hash sees the representations, so
       -- pin both engines to BIGINT (same convention as _Q22).
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
ORDER BY linestatus
"""

_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey AS suppkey,
       s.s_name AS name,
       ROUND(CAST(r.total_revenue AS DOUBLE), 2) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY suppkey
"""

_Q16 = """
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#23'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 7, 9, 10, 15, 23, 45)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, brand, type, size
"""

_Q17 = """
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (SELECT 0.2 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                               / COUNT(*)
                      FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
"""

_Q19 = """
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""

_Q21 = """
SELECT s.s_name AS name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, name
"""

_Q22 = """
SELECT cntrycode, COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
FROM (
  SELECT SUBSTRING(c.c_name, 16, 3) AS cntrycode, c.c_acctbal
  FROM customer c
  WHERE c.c_acctbal > (SELECT 0.5 * CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                / COUNT(*)
                       FROM customer c2 WHERE c2.c_acctbal > 0)
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate < TIMESTAMP '1997-01-01')
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("sql_q4_priority_exists", oracle=_Q4)
def sql_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join, then
    grouped count. The semi join shuffles only (orderkey) pairs."""
    _views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_Q4)


@query("sql_q7_nation_volume", oracle=_Q7)
def sql_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-way join with the nation dim joined twice
    under a symmetric disjunctive pair predicate; per-year rollup."""
    _views(spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation"))
    return spark.sql(_Q7)


@query("sql_q9_product_profit", oracle=_Q9)
def sql_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 5-way join with a LIKE filter on the part dim
    (pushed to the dim scan, prunes before the fact join)."""
    _views(spark, sf_dir, ("part", "lineitem", "supplier", "orders", "nation"))
    return spark.sql(_Q9)


@query("sql_q12_priority_case", oracle=_Q12)
def sql_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE) counts over a fact-dim
    join with a pushed date-range filter."""
    _views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_Q12)


@query("sql_q13_cust_distribution", oracle=_Q13)
def sql_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left join with an ON-clause filter (kept
    null-extending), two stacked aggregations — the histogram of
    per-customer order counts."""
    _views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q13)


@query("sql_q15_top_supplier", oracle=_Q15)
def sql_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: CTE computed once, reused as both join input
    and scalar MAX subquery; decimal-exact revenue equality."""
    _views(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(_Q15)


@query("sql_q16_supplier_cnt", oracle=_Q16)
def sql_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN decorrelated to a null-aware anti
    join, COUNT(DISTINCT) over the surviving fact rows."""
    _views(spark, sf_dir, ("lineitem", "part", "supplier"))
    return spark.sql(_Q16)


@query("sql_q17_small_qty", oracle=_Q17)
def sql_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-aggregate subquery
    (per-part mean quantity) decorrelated by Catalyst into an
    aggregate + join; double math on decimal-exact operands so both
    engines compare bit-identical IEEE values."""
    _views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q17)


@query("sql_q19_disjunctive", oracle=_Q19)
def sql_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three-way disjunction of conjunctive
    brand/size/quantity bands — tests OR-predicate pushdown and
    common-subexpression extraction across the branches."""
    _views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q19)


@query("sql_q21_waiting_supplier", oracle=_Q21)
def sql_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS on the same fact table
    (left-semi and left-anti against lineitem re-reads) under a
    4-way join; the classic multi-consumer self-join plan."""
    _views(spark, sf_dir, ("supplier", "lineitem", "orders", "nation"))
    return spark.sql(_Q21)


@query("sql_q22_idle_customers", oracle=_Q22)
def sql_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar average subquery threshold + NOT
    EXISTS anti join + substring-derived group key."""
    _views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q22)


# --------------------------------------------------------------------
# Completion of the 22-query TPC-H plan-shape suite. The fixture has
# no partsupp table, so Q2/Q11/Q20 (which price supplier stock) are
# re-based on the lineitem-derived supplier⇄part relation — per-pair
# unit cost / shipped value — preserving the original plan shapes:
# Q2's correlated MIN over a re-joined dimension path, Q11's
# grouped HAVING vs a scalar-subquery fraction of the global total,
# Q20's nested IN chains with a correlated scalar threshold. Q8
# needs no adaptation. Unit cost is double division — identical
# IEEE bits in both engines, so MIN and the equality correlate
# exactly (functions/numeric.py discipline: exact where order can
# vary, raw IEEE only for per-row identical expressions).

_Q2 = """
SELECT DISTINCT
       CAST(s.s_acctbal AS DOUBLE) AS acctbal,
       s.s_name AS supplier_name,
       n.n_name AS nation,
       p.p_partkey AS partkey,
       p.p_type AS part_type
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE p.p_size <= 10
  AND p.p_type = 'LARGE'
  AND r.r_name = 'EUROPE'
  AND l.l_extendedprice / l.l_quantity = (
      SELECT MIN(l2.l_extendedprice / l2.l_quantity)
      FROM lineitem l2
      JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE l2.l_partkey = p.p_partkey
        AND r2.r_name = 'EUROPE')
ORDER BY acctbal DESC, supplier_name, partkey
LIMIT 100
"""

_Q8 = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_11' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA'
    AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate <  TIMESTAMP '1997-01-01'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

_Q11 = """
SELECT l.l_partkey AS partkey,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS stock_value
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_8', 'NATION_9', 'NATION_11', 'NATION_13', 'NATION_21')
GROUP BY l.l_partkey
HAVING SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) > (
    SELECT SUM(CAST(l2.l_extendedprice AS DECIMAL(18,2))) * 0.001
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    WHERE n2.n_name IN ('NATION_8', 'NATION_9', 'NATION_11', 'NATION_13', 'NATION_21'))
ORDER BY stock_value DESC, partkey
"""

_Q20 = """
SELECT s.s_name AS supplier_name,
       CAST(s.s_acctbal AS DOUBLE) AS acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_6', 'NATION_11', 'NATION_16', 'NATION_21')
  AND s.s_suppkey IN (
    SELECT sp.l_suppkey
    FROM (SELECT l_suppkey, l_partkey,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_1996
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey) sp
    WHERE sp.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND sp.qty_1996 > (
          SELECT 0.5 * SUM(CAST(l2.l_quantity AS DECIMAL(12,2)))
          FROM lineitem l2
          WHERE l2.l_partkey = sp.l_partkey
            AND l2.l_suppkey = sp.l_suppkey))
ORDER BY supplier_name
"""


@query("sql_q2_min_cost_supplier", oracle=_Q2)
def sql_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN subquery that re-walks
    the supplier→nation→region dimension path (decorrelated by
    Catalyst into an aggregate + join on partkey), deterministic
    top-100. Unit cost re-based on lineitem (fixture has no
    partsupp); per-row IEEE division is bit-identical cross-engine."""
    _views(spark, sf_dir, ("part", "lineitem", "supplier", "nation", "region"))
    return spark.sql(_Q2)


@query("sql_q8_market_share", oracle=_Q8)
def sql_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join (nation dim twice: customer region
    gate + supplier nation tag), per-year conditional-share ratio.
    Decimal-exact volume sums, one IEEE division at the end."""
    _views(
        spark, sf_dir,
        ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
    )
    return spark.sql(_Q8)


@query("sql_q11_important_stock", oracle=_Q11)
def sql_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped HAVING filtered against a scalar
    subquery computing a fraction of the global total — the same
    nation-filtered relation aggregated at two granularities.
    Decimal comparison keeps the threshold exact in both engines."""
    _views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(_Q11)


@query("sql_q20_part_promotion", oracle=_Q20)
def sql_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN chains (supplier ← shipped-pairs ←
    part-name filter) with a correlated scalar threshold — shipped
    volume in the window vs half the pair's all-time volume. Spark
    decorrelates the scalar into an aggregate join on the pair key."""
    _views(spark, sf_dir, ("supplier", "nation", "lineitem", "part"))
    return spark.sql(_Q20)
