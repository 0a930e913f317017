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


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    from decision_tree_analytics_spark.streaming.events_stream import (
        recent_pairs_stream,
        run_to_memory,
    )

    run_to_memory(
        recent_pairs_stream(spark, sf_dir, max_user=20), "recent_pairs"
    )
    got = {
        (r.event_id, r.prev_event_id)
        for r in spark.table("recent_pairs").collect()
    }

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts div 1000").alias("us")
    ).filter(F.col("user_id") < 20)
    a, b = ev.alias("a"), ev.alias("b")
    batch = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.us") < F.col("a.us"))
        & (F.col("b.us") >= F.col("a.us") - 300_000_000),
    ).select(F.col("a.event_id").alias("e"), F.col("b.event_id").alias("p"))
    want = {(r.e, r.p) for r in batch.collect()}
    assert got == want and len(got) > 0
