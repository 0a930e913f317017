"""Source-format queries — CSV and JSON ingestion under the driver's
oracle gate.

The reference's pipeline source is file-based CSV (SURVEY §2.1 O1 —
reference `src/main/java/co/cask/hydrator/plugin/SparkMLTrainer.java`
consumes the host platform's file source); these queries prove the
same data arrives bit-identical through this engine's CSV and JSON
readers (`sources/formats.py`), not just through parquet.  Each query
round-trips a derived slice (written once per testdata generation,
keyed by the source parquet's identity) and aggregates the read-back
rows; the DuckDB oracle computes the same aggregate straight from the
parquet table, so any reader/writer drift (type inference, double
rendering, null handling) breaks the hash.

Round-trip safety: only BIGINT/DOUBLE/VARCHAR columns are exchanged —
Java's shortest-round-trip double rendering re-parses exactly in
Spark's CSV/JSON readers, and timestamps are excluded per CLAUDE.md
rule 2.  Scale: the write is a one-time fixture; the read is a plain
distributed file scan with an explicit schema (no inference pass over
100 TB), and each aggregate is one mergeable-partial shuffle.
"""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from decision_tree_analytics_spark.sources.formats import read_csv, read_json, read_orc
from decision_tree_analytics_spark.sources.tables import load_table

_IO_ROOT_ENV = "SPARK_GRAFT_IO_CACHE_DIR"
_IO_ROOT_DEFAULT = "/root/repo/spark-warehouse/io_cache"


def _fixture_dir(sf_dir: str, table: str, fmt: str) -> str:
    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    root = os.environ.get(_IO_ROOT_ENV, _IO_ROOT_DEFAULT)
    return os.path.join(root, f"{table}_{fmt}_{tag}")


_ORDERS_CSV_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_orderpriority", StringType()),
        StructField("o_totalprice", DoubleType()),
    ]
)

_EVENTS_JSON_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def src_csv_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders through the CSV reader: write the 3-column slice once,
    read it back with an explicit schema (header on, no inference),
    aggregate per priority."""
    path = _fixture_dir(sf_dir, "orders", "csv")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        ).write.mode("overwrite").option("header", "true").csv(path)
    df = read_csv(spark, path, _ORDERS_CSV_SCHEMA, header=True)
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (F.floor(F.sum("o_totalprice") * 1e4 + 0.5) / 1e4).alias("sum_price"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )


def src_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events through the JSON-lines reader: same write-once /
    schema-pinned read-back shape as src_csv_orders."""
    path = _fixture_dir(sf_dir, "events", "json")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        ).write.mode("overwrite").json(path)
    df = read_json(spark, path, _EVENTS_JSON_SCHEMA)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("value").cast("long").alias("n_valued"),
        (F.floor(F.sum("value") * 1e6 + 0.5) / 1e6).alias("sum_value"),
    )


def src_orc_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem through the ORC reader — the third interchange format
    under the oracle gate (parquet is the native path, Avro is absent
    from this container; see CLAUDE.md).  ORC carries real types in
    the file footer, so the read needs no pinned schema — drift would
    surface as a hash mismatch on the aggregate."""
    path = _fixture_dir(sf_dir, "lineitem", "orc")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
        ).write.mode("overwrite").orc(path)
    df = read_orc(spark, path)
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        (F.floor(F.sum("l_extendedprice") * 1e4 + 0.5) / 1e4).alias("sum_price"),
        F.min("l_orderkey").cast("long").alias("min_key"),
    )


QUERIES = {
    "src_csv_orders": src_csv_orders,
    "src_json_events": src_json_events,
    "src_orc_lineitem": src_orc_lineitem,
}

ORACLES = {
    "src_orc_lineitem": (
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,"
        " CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,"
        " floor(sum(l_extendedprice) * 1e4 + 0.5) / 1e4 AS sum_price,"
        " CAST(min(l_orderkey) AS BIGINT) AS min_key"
        " FROM lineitem GROUP BY l_returnflag"
    ),
    "src_csv_orders": (
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,"
        " floor(sum(o_totalprice) * 1e4 + 0.5) / 1e4 AS sum_price,"
        " CAST(min(o_orderkey) AS BIGINT) AS min_key,"
        " CAST(max(o_orderkey) AS BIGINT) AS max_key"
        " FROM orders GROUP BY o_orderpriority"
    ),
    "src_json_events": (
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,"
        " CAST(count(value) AS BIGINT) AS n_valued,"
        " floor(sum(value) * 1e6 + 0.5) / 1e6 AS sum_value"
        " FROM events GROUP BY event_type"
    ),
}
