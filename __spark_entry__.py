"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the oracle-checked operator inventory registered in
``surrealdb_spark.suite`` (one entry per implemented operator from
SURVEY.md §2 plus the LLM-pipeline superset).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from surrealdb_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q1 pricing summary) on /root/testdata/sf0.001."""
    return suite.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
