"""LIVE JDBC integration (round-11 verdict item 6): the one SURVEY §2
row whose runtime behavior had never executed. The Spark distribution
ships embedded Apache Derby (used for the Hive metastore), which is a
real JDBC database running inside the same JVM — so the partitioned
reader can be driven end-to-end without network or a server install:
create a Derby table through java.sql via py4j, read it back through
``read_jdbc_table`` with partitionColumn splits, stage it to parquet.

This covers exactly what the unit tests over the option dict could
not: option SPELLING as consumed by Spark's JDBC source (a typo'd
``partitionColumn`` would silently read unpartitioned), bounds-to-
predicate splitting, fetchsize acceptance, and the staging write."""

from __future__ import annotations

import pytest

from gcd_etl_spark.sources.jdbc import (
    JdbcSource,
    jdbc_reader_options,
    read_jdbc_table,
    stage_to_parquet,
)

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_db(spark, tmp_path_factory):
    """A real embedded-Derby database with a 1000-row table, created
    through the JVM's own java.sql (same classpath Spark's JDBC
    source will load the driver from)."""
    path = str(tmp_path_factory.mktemp("derby") / "gcd_jdbc_it")
    url = f"jdbc:derby:{path};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE issue (id INT PRIMARY KEY, title VARCHAR(64), "
        "series_id INT)"
    )
    ps = conn.prepareStatement("INSERT INTO issue VALUES (?, ?, ?)")
    for i in range(1000):
        ps.setInt(1, i)
        ps.setString(2, f"issue-{i}")
        ps.setInt(3, i % 37)
        ps.addBatch()
    ps.executeBatch()
    ps.close()
    st.close()
    conn.close()
    return f"jdbc:derby:{path}"


def test_partitioned_jdbc_read_live(spark, derby_db):
    src = JdbcSource(url=derby_db, driver=DERBY_DRIVER, fetchsize=100)
    df = read_jdbc_table(
        spark,
        src,
        "issue",
        partition_column="id",
        lower_bound=0,
        upper_bound=999,
        num_partitions=8,
    )
    # real partitioned scan: 8 concurrent range cursors, not one
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert len(rows) == 1000
    got = {r["ID"]: (r["TITLE"], r["SERIES_ID"]) for r in rows}
    assert got[0] == ("issue-0", 0)
    assert got[999] == ("issue-999", 999 % 37)
    # no range split may drop or duplicate boundary rows
    assert sorted(got) == list(range(1000))


def test_unpartitioned_jdbc_read_live(spark, derby_db):
    src = JdbcSource(url=derby_db, driver=DERBY_DRIVER)
    df = read_jdbc_table(spark, src, "issue")
    assert df.count() == 1000


def test_jdbc_pushdown_reaches_database(spark, derby_db):
    """Filter + projection pushdown must reach the JDBC scan (at
    100 TB the database does the pruning, not the executor)."""
    import contextlib
    import io

    src = JdbcSource(url=derby_db, driver=DERBY_DRIVER)
    df = (
        read_jdbc_table(spark, src, "issue")
        .where("id < 10")
        .select("id", "title")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "LessThan" in plan
    assert df.count() == 10


def test_jdbc_stage_to_parquet_roundtrip(spark, derby_db, tmp_path):
    src = JdbcSource(url=derby_db, driver=DERBY_DRIVER)
    df = read_jdbc_table(
        spark,
        src,
        "issue",
        partition_column="id",
        lower_bound=0,
        upper_bound=999,
        num_partitions=4,
    )
    out = str(tmp_path / "staged")
    stage_to_parquet(df, out)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert {f.name.lower() for f in back.schema.fields} == {
        "id",
        "title",
        "series_id",
    }


def test_reader_options_match_spark_consumption(derby_db):
    """The option dict the unit tests pin is exactly what the live
    reads above consumed — keeps the two test layers honest."""
    src = JdbcSource(url=derby_db, driver=DERBY_DRIVER, fetchsize=100)
    opts = jdbc_reader_options(
        src,
        "issue",
        partition_column="id",
        lower_bound=0,
        upper_bound=999,
        num_partitions=8,
    )
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "999")
    assert opts["numPartitions"] == "8"
    assert opts["fetchsize"] == "100"


# ----------------- MySQL-dialect SQL generation (round-13 item 8)
# Derby covers the LIVE path; these pin the MySQL-specific SPELLING
# Spark would emit against the reference's actual database
# (example.yml: jdbc:mysql://HOST/DATABASE) — identifier quoting,
# LIMIT pushdown clause, probe queries — via the JdbcDialects
# registry, no server needed.
MYSQL_URL = "jdbc:mysql://host/gcd"


def _dialect(spark, url):
    return spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(url)


def test_mysql_url_resolves_mysql_dialect(spark):
    d = _dialect(spark, MYSQL_URL)
    assert "MySQL" in d.toString()
    # ...and the Derby URL used by the live tests resolves Derby, so
    # the two layers exercise DIFFERENT dialects on purpose
    assert "Derby" in _dialect(spark, "jdbc:derby:memory:x").toString()


def test_mysql_identifier_quoting_is_backticks(spark):
    d = _dialect(spark, MYSQL_URL)
    assert d.quoteIdentifier("issue") == "`issue`"
    # a reserved word / dotted name must be quoted, not split
    assert d.quoteIdentifier("key") == "`key`"


def test_mysql_limit_pushdown_clause(spark):
    d = _dialect(spark, MYSQL_URL)
    assert d.getLimitClause(10) == "LIMIT 10"
    assert d.getLimitClause(0) == ""


def test_mysql_probe_queries(spark):
    d = _dialect(spark, MYSQL_URL)
    assert d.getTableExistsQuery("issue") == "SELECT 1 FROM issue WHERE 1=0"
    assert d.getSchemaQuery("issue") == "SELECT * FROM issue WHERE 1=0"


def test_mysql_reader_options_carry_dialect_properties():
    """The GCD dump's zero dates ('0000-00-00') need
    zeroDateTimeBehavior=convertToNull on a real MySQL read; the
    option assembly must pass connection properties through verbatim
    alongside the partitioned-range spelling."""
    src = JdbcSource(
        url=MYSQL_URL,
        user="gcd",
        password="pw",
        properties={"zeroDateTimeBehavior": "convertToNull", "useSSL": "false"},
    )
    opts = jdbc_reader_options(
        src, "issue", partition_column="id", lower_bound=0,
        upper_bound=2_000_000, num_partitions=32,
    )
    assert opts["url"] == MYSQL_URL
    assert opts["driver"] == "com.mysql.cj.jdbc.Driver"
    assert opts["zeroDateTimeBehavior"] == "convertToNull"
    assert opts["useSSL"] == "false"
    assert opts["dbtable"] == "issue"
    assert (opts["partitionColumn"], opts["numPartitions"]) == ("id", "32")


def test_mysql_dbtable_subquery_spelling():
    """MySQL requires a derived table to carry an alias; the reader
    passes dbtable through verbatim, so the pushed-down subquery form
    the staging plan would use is the aliased spelling."""
    src = JdbcSource(url=MYSQL_URL)
    sub = "(SELECT id, name FROM issue WHERE deleted = 0) AS issue_live"
    opts = jdbc_reader_options(src, sub)
    assert opts["dbtable"] == sub
