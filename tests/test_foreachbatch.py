"""Streaming sink pattern: foreachBatch → idempotent parquet upsert.

The production-grade way to land streaming aggregates in a lake
format: each micro-batch overwrites its own partition (idempotent on
replay).  availableNow replay must leave exactly the batch answer on
disk."""

from __future__ import annotations

import pyspark.sql.functions as F

from decision_tree_analytics_spark.sources.tables import load_table
from decision_tree_analytics_spark.streaming.events_stream import (
    events_stream,
    windowed_event_counts,
)


def test_foreachbatch_parquet_sink(spark, sf_dir, tmp_path):
    out_dir = str(tmp_path / "win_counts_parquet")

    def upsert(batch_df, batch_id: int):
        (
            batch_df.withColumn(
                "window_start_us", F.unix_micros("window_start")
            )
            .drop("window_start")
            .write.mode("overwrite")
            .parquet(out_dir)
        )

    q = (
        windowed_event_counts(events_stream(spark, sf_dir))
        .writeStream.outputMode("complete")
        .foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    landed = spark.read.parquet(out_dir)
    got = {
        (r.window_start_us, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in landed.collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(
            (F.expr("ts div 1000") - F.expr("ts div 1000") % 3_600_000_000).alias("ws"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    want = {(r.ws, r.event_type): (r.n, round(r.s, 6)) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_foreachbatch_snapshot_append_and_incremental_read(spark, sf_dir, tmp_path):
    # Streaming ingestion into the WAP table format: each micro-batch
    # commits one SnapshotTable append, so downstream consumers read
    # committed snapshots only (never half-written files) and can
    # consume incrementally via manifest diffs.
    from decision_tree_analytics_spark.sources.snapshots import SnapshotTable

    table_path = str(tmp_path / "events_snap")

    def commit_batch(batch_df, batch_id: int):
        SnapshotTable(batch_df.sparkSession, table_path).append(
            batch_df.select("event_id", "event_type", "value")
        )

    q = (
        events_stream(spark, sf_dir)
        .writeStream.outputMode("append")
        .foreachBatch(commit_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    t = SnapshotTable(spark, table_path)
    sids = t.snapshot_ids()
    assert sids  # at least one committed batch
    total = load_table(spark, sf_dir, "events").count()
    assert t.read().count() == total
    # incremental consumption across the commit history covers every
    # row exactly once: first snapshot + the per-commit deltas.
    n = t.read(sids[0]).count()
    for prev, cur in zip(sids, sids[1:]):
        n += t.read_incremental(prev, cur).count()
    assert n == total
