"""events.ts unit normalization: the reader must deliver int64
epoch-ns regardless of whether the parquet file stores the column as
TIMESTAMP(MICROS) or TIMESTAMP(NANOS).  The driver's testdata has
shipped BOTH units across rounds, so this is the contract that keeps
every `ts div 1000` time key stable when the data regenerates."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from decision_tree_analytics_spark.sources.tables import (
    events_ts_scale,
    load_table,
)

EPOCH_US = 1_700_000_000_123_456  # 2023-11-14T22:13:20.123456Z


def _write_events(dirpath, unit: str):
    dirpath.mkdir()
    val = EPOCH_US if unit == "us" else EPOCH_US * 1000
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([val], pa.timestamp(unit)),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(table, str(dirpath / "events.parquet"))


def test_reader_normalizes_us_and_ns_to_epoch_ns(spark, tmp_path):
    for unit, scale in [("us", 1_000), ("ns", 1)]:
        d = tmp_path / f"sf_{unit}"
        _write_events(d, unit)
        assert events_ts_scale(str(d)) == scale
        row = load_table(spark, str(d), "events").first()
        assert row.ts == EPOCH_US * 1_000  # always ns
        assert row.event_id == 1 and row.user_id == 7
