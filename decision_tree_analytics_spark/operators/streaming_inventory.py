"""Streaming operators under the correctness gate.

``stream_windowed_counts`` runs the watermarked tumbling-window
aggregation as a real Structured Streaming query (availableNow
replay of the events table), drains it to a memory sink, and returns
the result DataFrame — so the streaming engine's answer faces the
same DuckDB oracle as every batch operator.  Window boundaries are
emitted as integer epoch-µs (hour-floor), keeping the cross-engine
timestamp contract.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from decision_tree_analytics_spark.streaming.events_stream import (
    events_stream,
    run_to_memory,
    windowed_event_counts,
)

HOUR_US = 3_600_000_000


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_win_{uuid.uuid4().hex[:8]}"
    run_to_memory(
        windowed_event_counts(events_stream(spark, sf_dir)),
        name,
        output_mode="complete",
    )
    return spark.table(name).select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value",
    )


QUERIES = {"stream_windowed_counts": stream_windowed_counts}

ORACLES = {
    "stream_windowed_counts": (
        f"SELECT (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS window_start_us,"
        " event_type, COUNT(*) AS n_events, SUM(value) AS sum_value"
        " FROM events GROUP BY 1, 2"
    ),
}
