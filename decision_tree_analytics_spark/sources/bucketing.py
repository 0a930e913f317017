"""Bucketed tables — co-located joins and aggregations.

At 100 TB the single biggest shuffle saving is not running the
shuffle at all: write both join sides bucketed (hash-partitioned into
files) on the join key, and every subsequent join/aggregation on that
key reads pre-partitioned data — sort-merge join with zero Exchange,
repeatable across every query that touches the key.

This is the persisted-layout counterpart of ``repartition``: pay the
partitioning once at write time, reuse it forever.  The bucket count
is the knob: it bounds per-task input size (choose so each bucket of
the biggest table fits an executor core's memory) and caps join
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) managed parquet table.
    Sorting within buckets lets sort-merge joins skip their sort."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with
    no Exchange on either side (verify: plans.inspect.count_shuffles)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
