"""SQL entry point — the engine's tables exposed to ``spark.sql``.

The reference has no SQL surface at all (SURVEY §2.3: parser/
optimizer/planner are all "Catalyst, entirely") — this module is that
row of the absence table made real: register the star schema as temp
views and hand the string to Catalyst.  DataFrame queries and SQL
queries compile to the same plans, so the operator inventory is
reachable from either surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from decision_tree_analytics_spark.sources.tables import register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an ANSI SQL query against the star schema at ``sf_dir``."""
    register_views(spark, sf_dir)
    return spark.sql(query)
