"""Structured Streaming tests — availableNow replay of the static
events table must agree with the batch answers."""

from __future__ import annotations

import pyspark.sql.functions as F

from decision_tree_analytics_spark.sources.tables import load_table
from decision_tree_analytics_spark.streaming.events_stream import (
    events_stream,
    run_to_memory,
    streaming_dedup,
    windowed_event_counts,
)


def test_windowed_counts_match_batch(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    run_to_memory(
        windowed_event_counts(stream), "win_counts", output_mode="complete"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in spark.table("win_counts").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.withColumn(
            "event_time", F.timestamp_micros(F.expr("ts div 1000"))
        )
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("window.start").alias("ws"), "event_type", "n", "s")
    )
    want = {
        (r.ws, r.event_type): (r.n, round(r.s, 6)) for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_streaming_dedup_bounded_state(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    run_to_memory(streaming_dedup(stream), "dedup_events")
    n_stream = spark.table("dedup_events").count()
    n_batch = load_table(spark, sf_dir, "events").dropDuplicates(["event_id"]).count()
    assert n_stream == n_batch


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    from decision_tree_analytics_spark.streaming.events_stream import (
        enriched_segment_counts,
        events_stream,
    )

    customers = load_table(spark, sf_dir, "customer")
    run_to_memory(
        enriched_segment_counts(events_stream(spark, sf_dir), customers),
        "seg_counts",
        output_mode="complete",
    )
    got = {
        (r.c_mktsegment, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in spark.table("seg_counts").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.join(
            customers.select(
                F.col("c_custkey").alias("user_id"), "c_mktsegment"
            ),
            "user_id",
        )
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    want = {
        (r.c_mktsegment, r.event_type): (r.n, round(r.s, 6))
        for r in batch.collect()
    }
    assert got == want and len(got) > 0
