"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship north-rule query (language-ID +
quality-filter + scrub over web pages built from sf0.001 documents).
``queries()`` / ``oracle_sql()`` enumerate the operator inventory from
SURVEY.md §2 with DuckDB-checkable oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lgid_spark.entry_queries import ORACLE_SQL, QUERIES  # noqa: E402
from lgid_spark.entry_queries import flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
