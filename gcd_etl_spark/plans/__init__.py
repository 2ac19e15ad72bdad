"""Named query plans — the engine's demonstrable operator surface.

Every operator from SURVEY.md §2 (and each north-star extension) is
registered here as a named ``Query``: a PySpark builder plus, when
SQL-expressible, a DuckDB oracle that must hash-match it. The driver
contract (``__spark_entry__.py``) is a thin view over this registry.
"""

from gcd_etl_spark.plans.registry import QUERIES, Query, query

# Importing the plan modules populates the registry.
from gcd_etl_spark.plans import flagship  # noqa: E402,F401
from gcd_etl_spark.plans import relational  # noqa: E402,F401
from gcd_etl_spark.plans import scalars  # noqa: E402,F401
from gcd_etl_spark.plans import text  # noqa: E402,F401
from gcd_etl_spark.plans import dedup  # noqa: E402,F401
from gcd_etl_spark.plans import similarity  # noqa: E402,F401
from gcd_etl_spark.plans import windows  # noqa: E402,F401
from gcd_etl_spark.plans import multimodal  # noqa: E402,F401
from gcd_etl_spark.plans import gcd  # noqa: E402,F401
from gcd_etl_spark.plans import sqlapi  # noqa: E402,F401
from gcd_etl_spark.plans import terms  # noqa: E402,F401
from gcd_etl_spark.plans import streaming_plans  # noqa: E402,F401
from gcd_etl_spark.plans import staging  # noqa: E402,F401

__all__ = ["QUERIES", "Query", "query"]
