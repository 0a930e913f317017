"""Canonical readers for the testdata star schema.

Tables (one parquet file per table, see /root/repo/TESTDATA.md):
``region nation customer supplier part orders lineitem events
documents embeddings``.

Scale notes
-----------
* Readers are plain ``spark.read.parquet`` — predicate pushdown and
  column pruning reach the scan for free (verify with
  ``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``).
  At 100 TB the same tables would be directories of many files,
  partitioned (e.g. orders by month); nothing here assumes a single
  file.
* ``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it as int64
  nanoseconds (``nanosAsLong``).  All engine time arithmetic on events
  uses integer epoch-microseconds (``ts div 1000``) which is exactly
  DuckDB's ``epoch_us(ts)`` after its own ns→µs truncation — a
  timezone-free, engine-portable contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from decision_tree_analytics_spark.session import prepare_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table of the star schema as a DataFrame."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    prepare_session(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL entry point)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
