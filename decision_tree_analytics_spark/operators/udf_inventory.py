"""Arrow-batched Python UDF surface — the two shapes that matter.

Python is the engine's slow path by policy (everything else is JVM
expressions), but two batch shapes are genuinely needed in LLM-data
pipelines and are exercised here with oracle-checked queries:

* ``udf_grouped_zscore`` — ``applyInPandas`` (grouped map): whole
  group as one pandas frame, per-group statistics computed in
  vectorized numpy.  Shape of per-group normalization / feature
  scaling.  One shuffle on the group key; each group must fit in one
  executor's memory — groups here are event types (bounded), and the
  scale rule is: group on bounded-cardinality keys, never on raw ids.
* ``udf_frame_sample`` — ``mapInPandas`` fan-out: each input row emits
  k output rows (frame/byte-offset sampling of a binary payload), the
  shape of media frame extraction.  Stateless, pipelined, no shuffle.

Both compute arithmetic DuckDB can replicate exactly (sample stddev,
integer offsets), so the Python path itself sits under the
correctness gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from decision_tree_analytics_spark.operators.multimodal import with_binary_payload
from decision_tree_analytics_spark.sources.tables import load_table

_ZSCORE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("zscore", DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"]
    mu = v.mean()
    sd = v.std(ddof=1)  # sample stddev == Spark stddev / DuckDB stddev_samp
    z = (v - mu) / sd
    # Single-row group (sd NaN) or constant group (sd 0) must surface
    # as SQL NULL, matching NULLIF(stddev_samp(...), 0) — pandas NaN
    # would cross Arrow as a float NaN, not a null.
    z = z.astype("Float64").mask(~np.isfinite(z))
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "zscore": z,
        }
    )


def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(_zscore_group, _ZSCORE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("byte_offset", LongType()),
        StructField("frame_len", LongType()),
    ]
)

FRAME_STRIDE = 64
MAX_FRAMES = 4


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            k = min(MAX_FRAMES, max(1, n // FRAME_STRIDE))
            for f in range(k):
                off = f * FRAME_STRIDE
                rows.append((int(doc_id), f, off, min(FRAME_STRIDE, n - off)))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "byte_offset", "frame_len"])


def udf_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(_sample_frames, _FRAME_SCHEMA)


QUERIES = {
    "udf_grouped_zscore": udf_grouped_zscore,
    "udf_frame_sample": udf_frame_sample,
}

ORACLES = {
    "udf_grouped_zscore": (
        "SELECT event_id, event_type,"
        " (value - avg(value) OVER (PARTITION BY event_type))"
        "   / NULLIF(stddev_samp(value) OVER (PARTITION BY event_type), 0) AS zscore"
        " FROM events"
    ),
    "udf_frame_sample": (
        "WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),"
        " fr AS (SELECT doc_id, n, unnest(range(least("
        f"   {MAX_FRAMES}, greatest(n // {FRAME_STRIDE}, 1)))) AS f FROM d)"
        " SELECT doc_id, CAST(f AS BIGINT) AS frame_no,"
        f" CAST(f * {FRAME_STRIDE} AS BIGINT) AS byte_offset,"
        f" CAST(least({FRAME_STRIDE}, n - f * {FRAME_STRIDE}) AS BIGINT) AS frame_len"
        " FROM fr"
    ),
}
