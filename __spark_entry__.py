"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``decision_tree_analytics_spark`` — the engine package.
``queries()`` / ``oracle_sql()`` are assembled from the operator
modules (each module owns its QUERIES/ORACLES pair); ``entry`` runs
the flagship aggregation (TPC-H Q1 core) at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from decision_tree_analytics_spark import operators  # noqa: E402
from decision_tree_analytics_spark.session import prepare_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    prepare_session(spark)
    from decision_tree_analytics_spark.operators.relational import q11_hash_agg

    return q11_hash_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return operators.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (queries
    without an entry are genuinely non-SQL-expressible → rows-only)."""
    return operators.all_oracles()
