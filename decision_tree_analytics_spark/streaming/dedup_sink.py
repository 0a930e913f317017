"""Streaming incremental dedup: foreachBatch merge of each micro-batch
against a persisted fingerprint store.

The streaming twin of ``operators.dedup.incremental_dedup``: documents
land continuously, and only first-seen texts may pass downstream.  Per
micro-batch:

1. fingerprint the batch (the shared ``fingerprint_col`` definition —
   16-byte keys, the document bodies never shuffle);
2. keep-first within the batch, anti-join against everything the store
   has seen **from other batches** — the current batch_id's own
   partition is excluded from the read, so a replayed batch (restart
   after a crash between the partition write and the checkpoint
   commit) re-derives its survivors instead of anti-joining against
   its own previous output and erasing it;
3. commit the survivors into the store under the micro-batch's own
   ``batch_id=N`` partition with overwrite — a replay rewrites its own
   partition (idempotent landing on top of at-least-once delivery, the
   standard foreachBatch upsert contract).

The store doubles as the dedup output: one row per first-seen
fingerprint with its keeper id and in-batch copy count.  At scale the
store is the same parquet/Delta table the batch path uses, bucketed by
fingerprint so the anti-join co-locates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from decision_tree_analytics_spark.operators.dedup import (
    fingerprint_col,
    incremental_dedup,
)


def fingerprint_batch(
    batch: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(fingerprint, doc_id) projection using the batch dedup family's
    shared fingerprint definition."""
    return batch.select(
        fingerprint_col(text_col).alias("fingerprint"),
        F.col(id_col).alias("doc_id"),
    )


def read_store(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Current fingerprint store, or None before the first commit.
    Existence is probed by attempting the read (works on any Hadoop
    filesystem, not just the driver's local disk)."""
    try:
        return spark.read.parquet(store_path)
    except AnalysisException:
        return None


def merge_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch merge-and-commit; module-level so replay
    idempotency is directly testable."""
    fp = fingerprint_batch(batch_df, id_col, text_col)
    store = read_store(batch_df.sparkSession, store_path)
    if store is None:
        known = fp.select("fingerprint").limit(0)
    else:
        # Exclude this batch's own partition: on replay it may already
        # exist, and anti-joining against it would drop every row and
        # overwrite the partition with an empty set.  The partition
        # filter also prunes those files from the scan, so reading the
        # store while rewriting the subdirectory never races.
        known = store.filter(F.col("batch_id") != batch_id).select("fingerprint")
    survivors = incremental_dedup(fp, known)
    survivors.write.mode("overwrite").parquet(f"{store_path}/batch_id={batch_id}")


def start_dedup_sink(
    stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Attach the incremental-dedup foreachBatch sink to a document
    stream and start it with an availableNow (bounded replay) trigger."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(batch_df, batch_id, store_path, id_col, text_col)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
