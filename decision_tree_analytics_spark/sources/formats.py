"""File-format sources and sinks beyond the canonical parquet tables.

The reference's only I/O is a hand-rolled CSV reader in its test
harness and a model directory (SURVEY O1/O9/O10); a real engine needs
first-class readers/writers.  These are thin, opinionated wrappers
over ``spark.read``/``df.write`` that encode the scale defaults:

* explicit schemas for text formats (schema inference is a full extra
  pass over 100 TB — never default to it in production paths);
* parquet sinks partition by a column when told to (partition pruning
  on read) and bound file count via ``repartition`` before write so a
  1000-executor job doesn't emit a million 100 KB files;
* every writer returns the path for chaining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from decision_tree_analytics_spark.session import prepare_session


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = False,
    sep: str = ",",
) -> DataFrame:
    """CSV scan with a declared schema (reference O1 was a hand-rolled
    CSV reader; here the scan is Catalyst-planned, prunable and
    parallel)."""
    prepare_session(spark)
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines scan with a declared schema."""
    prepare_session(spark)
    return spark.read.schema(schema).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_files: int | None = None,
    mode: str = "overwrite",
) -> str:
    """Parquet sink.  ``partition_by`` enables partition pruning for
    downstream readers; ``target_files`` bounds output file count
    (small-file storms are the classic large-cluster sink failure)."""
    out = df
    if target_files:
        out = df.repartition(target_files, *partition_by) if partition_by else df.repartition(target_files)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> str:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
    return path


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    df.write.mode(mode).json(path)
    return path


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (columnar like parquet: predicate pushdown, column
    pruning and vectorized read all apply)."""
    prepare_session(spark)
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    df.write.mode(mode).orc(path)
    return path


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> str:
    """Pruning-friendly lake layout: directory partitioning on
    ``partition_cols`` (partition pruning skips whole directories) +
    ``sortWithinPartitions`` on ``sort_cols`` so each written file's
    row groups carry tight, non-overlapping min/max statistics — the
    poor man's Z-order.  A scan filtered on a sort column then skips
    row groups via parquet stats instead of decoding them.

    ``repartition(files_per_partition, *partition_cols)`` bounds the
    file count (a 1000-executor writer would otherwise emit one file
    per task per partition value); the sort is per-task, never a
    global exchange.  The sort key is (partition_cols, sort_cols) —
    the dynamic-partition writer requires task rows ordered by the
    partition columns and would otherwise re-sort on them alone
    (with an unstable sorter), silently destroying the clustering."""
    prepare_session(df.sparkSession)
    (
        df.repartition(files_per_partition, *[df[c] for c in partition_cols])
        .sortWithinPartitions(*partition_cols, *sort_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return path


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: merge the footers of every file under
    ``path`` so files written before a column existed surface it as
    NULL — the additive-evolution contract a long-lived 100 TB table
    needs (writers upgrade gradually; readers must not break).

    ``mergeSchema`` costs one footer read per file (driver-side
    metadata, not data), which is why it is an explicit entry point
    here rather than the default read path."""
    prepare_session(spark)
    return spark.read.option("mergeSchema", "true").parquet(path)
