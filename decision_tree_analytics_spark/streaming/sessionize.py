"""Sessionization and custom stateful operators over the event stream.

Two tiers, per the engine's design rule (built-ins before custom
state):

* ``session_aggregate`` — Spark's native ``session_window`` (gap-based
  session merge inside the streaming state store, watermark-pruned).
  This is the 100 TB path: state is managed per key by the engine,
  spills to the state store backend, and merges partial sessions
  without any Python.
* ``user_running_counts`` — the ``applyInPandasWithState`` template
  for semantics session_window can't express (per-key custom
  accumulators, decay logic, model state…).  Arrow-batched, one state
  row per user_id; the example keeps a running event count + value
  sum.  This is deliberately the same shape a custom online-feature
  operator takes, so swapping the update function is the whole job.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def session_aggregate(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based sessions per user: native session_window aggregation."""
    return (
        stream.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


_RUNNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)
_RUNNING_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ]
)


def _update_running(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})


def user_running_counts(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, value-sum)
    emitted each micro-batch."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=_RUNNING_OUTPUT,
            stateStructType=_RUNNING_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
