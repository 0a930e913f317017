"""Table maintenance: small-file compaction.

Streaming sinks and highly-parallel writers leave lakes full of tiny
files (the foreachBatch dedup store writes one file set per
micro-batch); every downstream scan then pays per-file open/footer
costs and the scheduler drowns in single-row splits.  Compaction
rewrites a parquet directory into approximately ``target_file_bytes``
files:

* file count is derived from the actual on-disk size, never guessed;
* ``coalesce`` (not ``repartition``) merges partitions without a
  shuffle — compaction is IO-bound and must not pay a network pass;
* output goes to a new directory then the caller swaps pointers
  (write-audit-publish); compaction never rewrites in place over the
  data it is reading.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from decision_tree_analytics_spark.session import prepare_session

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def dir_data_size(path: str) -> int:
    """Total bytes of data files under a table directory."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> DataFrame:
    """Rewrite ``path`` into ``out_path`` with ~target-sized files;
    returns the compacted DataFrame for verification."""
    prepare_session(spark)
    n_files = max(1, round(dir_data_size(path) / target_file_bytes))
    df = spark.read.parquet(path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
