"""Streaming incremental-dedup sink: two landing files drained as
separate micro-batches must leave exactly one store row per distinct
text, replays must be idempotent, and a second availableNow run must
see the first run's commits."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from decision_tree_analytics_spark.streaming.dedup_sink import (
    fingerprint_batch,
    read_store,
    start_dedup_sink,
)

SCHEMA = "doc_id long, text string"

FILE1 = [(0, "alpha beta"), (1, "gamma delta"), (2, "ALPHA BETA ")]
FILE2 = [(10, "gamma delta"), (11, "epsilon zeta"), (12, "epsilon zeta")]
FILE3 = [(20, "epsilon zeta"), (21, "eta theta")]


def _write_file(spark, landing, rows, name):
    df = spark.createDataFrame(rows, SCHEMA)
    tmp = os.path.join(landing, f"_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.rename(os.path.join(tmp, part), os.path.join(landing, f"{name}.parquet"))


def _stream(spark, landing):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(landing)
    )


def test_streaming_incremental_dedup(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    _write_file(spark, landing, FILE1, "b1")
    time.sleep(1.1)  # distinct mtimes => deterministic micro-batch order
    _write_file(spark, landing, FILE2, "b2")

    q = start_dedup_sink(_stream(spark, landing), store, ckpt)
    q.awaitTermination()

    landed = read_store(spark, store)
    rows = {r.fingerprint: r for r in landed.collect()}
    # 3 distinct texts across both files; every fingerprint exactly once.
    assert landed.count() == 3
    fp = {
        r.fingerprint
        for r in fingerprint_batch(
            spark.createDataFrame(FILE1 + FILE2, SCHEMA)
        ).collect()
    }
    assert set(rows) == fp
    # In-file duplicate folded with keep-first ("alpha beta" twice in b1).
    alpha = fingerprint_batch(
        spark.createDataFrame([(0, "alpha beta")], SCHEMA)
    ).collect()[0].fingerprint
    assert rows[alpha].keep_doc_id == 0 and rows[alpha].n_copies == 2
    # Cross-file duplicate dropped: "gamma delta" kept from the first batch.
    gamma = fingerprint_batch(
        spark.createDataFrame([(1, "gamma delta")], SCHEMA)
    ).collect()[0].fingerprint
    assert rows[gamma].keep_doc_id == 1

    # A later availableNow run (new file) must see earlier commits.
    _write_file(spark, landing, FILE3, "b3")
    q2 = start_dedup_sink(_stream(spark, landing), store, ckpt)
    q2.awaitTermination()
    landed = read_store(spark, store)
    assert landed.count() == 4  # only "eta theta" is new
    eta = fingerprint_batch(
        spark.createDataFrame([(21, "eta theta")], SCHEMA)
    ).collect()[0].fingerprint
    got = {r.fingerprint for r in landed.collect()}
    assert eta in got
    # Idempotency: batch partitions are keyed by batch_id, so the store
    # never holds two rows for one fingerprint.
    assert (
        landed.groupBy("fingerprint").count().filter(F.col("count") > 1).count() == 0
    )


def test_merge_batch_replay_is_idempotent(spark, tmp_path):
    """A crash between the partition write and the checkpoint commit
    replays the batch: the merge must re-derive identical survivors,
    NOT anti-join against its own previous output (which would erase
    the partition)."""
    from decision_tree_analytics_spark.streaming.dedup_sink import merge_batch

    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(FILE1, SCHEMA)
    merge_batch(b1, 0, store)
    first = sorted(read_store(spark, store).drop("batch_id").collect())
    assert len(first) == 2  # alpha beta (folded), gamma delta

    merge_batch(b1, 0, store)  # replay of the SAME batch id
    assert sorted(read_store(spark, store).drop("batch_id").collect()) == first

    # A genuinely new batch still dedups against batch 0's commits.
    b2 = spark.createDataFrame(FILE2, SCHEMA)
    merge_batch(b2, 1, store)
    assert read_store(spark, store).count() == 3  # + epsilon zeta only
