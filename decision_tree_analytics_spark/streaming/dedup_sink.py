"""Streaming incremental dedup: foreachBatch merge of each micro-batch
against a persisted fingerprint store.

The streaming twin of ``operators.dedup.incremental_dedup``: documents
land continuously, and only first-seen texts may pass downstream.  Per
micro-batch:

1. fingerprint the batch (md5 of normalized text — 16-byte keys, the
   document bodies never shuffle);
2. keep-first within the batch, anti-join against everything the store
   has seen;
3. commit the survivors into the store under the micro-batch's own
   ``batch_id=N`` partition with overwrite — a replayed batch rewrites
   its own partition, so the sink is idempotent (exactly-once landing
   on top of at-least-once delivery, the standard foreachBatch upsert
   contract).

The store doubles as the dedup output: one row per first-seen
fingerprint with its keeper id and in-batch copy count.  At scale the
store is the same parquet/Delta table the batch path uses, bucketed by
fingerprint so the anti-join co-locates.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from decision_tree_analytics_spark.operators.dedup import incremental_dedup


def fingerprint_batch(
    batch: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(fingerprint, doc_id) projection with the batch dedup family's
    normalization (md5 of lower(trim(text)))."""
    return batch.select(
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("fingerprint"),
        F.col(id_col).alias("doc_id"),
    )


def read_store(spark, store_path: str) -> DataFrame | None:
    """Current fingerprint store, or None before the first commit."""
    if not os.path.isdir(store_path):
        return None
    return spark.read.parquet(store_path)


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
        fp = fingerprint_batch(batch_df, id_col, text_col)
        store = read_store(batch_df.sparkSession, store_path)
        if store is None:
            store = fp.select("fingerprint").limit(0)
        survivors = incremental_dedup(fp, store)
        survivors.write.mode("overwrite").parquet(
            os.path.join(store_path, f"batch_id={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
