"""Streaming sessionization + custom stateful operator tests
(availableNow replay vs batch ground truth)."""

from __future__ import annotations

import pyspark.sql.functions as F

from decision_tree_analytics_spark.sources.tables import load_table
from decision_tree_analytics_spark.streaming.events_stream import (
    events_stream,
    run_to_memory,
)
from decision_tree_analytics_spark.streaming.sessionize import (
    session_aggregate,
    user_running_counts,
)


def test_session_windows_match_batch(spark, sf_dir):
    run_to_memory(
        session_aggregate(events_stream(spark, sf_dir)),
        "sessions",
        output_mode="complete",
    )
    got = {
        (r.user_id, r.session_start): (r.n_events, round(r.session_value, 6))
        for r in spark.table("sessions").collect()
    }

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    batch = (
        ev.groupBy(F.session_window("event_time", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(
            F.col("session_window.start").alias("ws"), "user_id", "n", "s"
        )
    )
    want = {(r.user_id, r.ws): (r.n, round(r.s, 6)) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_custom_stateful_running_counts(spark, sf_dir):
    run_to_memory(
        user_running_counts(events_stream(spark, sf_dir)),
        "running_counts",
        output_mode="update",
    )
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 6))
        for r in spark.table("running_counts").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("s"))
    )
    want = {r.user_id: (r.n, round(r.s, 6)) for r in batch.collect()}
    assert got == want and len(got) > 0
