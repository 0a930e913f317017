"""Checkpoint-recovery: a stateful streaming aggregation stopped and
RESTARTED as a brand-new query instance over the same
checkpointLocation must (a) restore its aggregation state (windows
spanning both drains report combined counts, not restart-local ones)
and (b) restore its source offsets (files consumed before the restart
are not re-read).  This is the production crash-restart path the
per-batch idempotency test (test_streaming_dedup_sink) does not
cover — there the SINK replays; here the ENGINE state itself must
survive process-level query death.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from decision_tree_analytics_spark.sources.tables import load_table


def _drain(spark, landing: str, ckpt: str, store: str) -> None:
    """One availableNow drain of the landing dir into the store.

    Each call builds a FRESH streaming query (new plan, new query id
    via the same checkpoint) — between calls the only continuity is
    the checkpointLocation, exactly like a restarted job."""
    stream = (
        spark.readStream.schema(spark.read.parquet(landing).schema)
        .parquet(landing)
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = stream.groupBy(
        F.window("event_time", "1 hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))

    def upsert(bdf, batch_id: int) -> None:
        (
            bdf.select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n_events",
                F.lit(batch_id).alias("batch_id"),
            )
            .write.mode("append")
            .parquet(f"{store}/b{batch_id}")
        )

    q = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_windowed_counts_survive_checkpoint_restart(spark, sf_dir, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")

    ev = load_table(spark, sf_dir, "events")  # ts normalized to epoch-ns
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    a = ev.filter(F.expr("event_id % 2 = 0")).select(cols)
    b = ev.filter(F.expr("event_id % 2 = 1")).select(cols)
    # Every (window, type) group has rows in BOTH halves (ids
    # interleave over time), so restart-local state would be visibly
    # wrong for every group.
    a.write.mode("overwrite").parquet(landing)
    _drain(spark, landing, ckpt, store)  # query instance #1, file A

    # ADVICE r10: record how far instance #1 actually got instead of
    # assuming it was exactly one micro-batch — a maxFilesPerTrigger /
    # session-conf change could split the first drain, and a hardcoded
    # `batch_id >= 1` would then misattribute drain-1 output to
    # drain 2 and fail spuriously.
    drain1_max_batch = (
        spark.read.option("basePath", store)
        .parquet(f"{store}/b*")
        .agg(F.max("batch_id"))
        .collect()[0][0]
    )

    b.write.mode("append").parquet(landing)
    _drain(spark, landing, ckpt, store)  # NEW instance, same checkpoint

    # Latest update per key wins (update mode re-emits a key whenever
    # its count changes; later batch_id = later state).
    from pyspark.sql import Window

    upd = spark.read.option("basePath", store).parquet(f"{store}/b*")
    w = Window.partitionBy("window_start", "event_type").orderBy(
        F.col("batch_id").desc()
    )
    final = (
        upd.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("window_start", "event_type", "n_events")
    )
    got = {
        (r.window_start, r.event_type): r.n_events for r in final.collect()
    }

    batch = (
        ev.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )
    want = {(r.ws, r.event_type): r.n for r in batch.collect()}
    # (a) STATE RESTORED: combined counts equal the one-shot batch
    # answer — a fresh-state restart would report only file-B rows
    # for every group's final update.
    assert got == want and len(got) > 0

    # (b) OFFSETS RESTORED: drain #2 must not have re-read file A —
    # every key it re-emitted gained at least one file-B row.
    second = upd.filter(F.col("batch_id") > drain1_max_batch).select(
        "window_start", "event_type"
    )
    b_keys = (
        b.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .select(
            F.window("event_time", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .distinct()
    )
    assert second.join(b_keys, ["window_start", "event_type"], "left_anti").count() == 0


def _latest_watermark_ms(ckpt: str) -> int:
    """batchWatermarkMs from the highest-numbered offsets file — the
    value a restarted instance restores before admitting any row."""
    import json
    import os

    odir = os.path.join(ckpt, "offsets")
    latest = max((f for f in os.listdir(odir) if f.isdigit()), key=int)
    with open(os.path.join(odir, latest)) as fh:
        lines = fh.read().splitlines()
    # Scan for the metadata object rather than assuming it sits on
    # line 2 (ADVICE r11): the OffsetSeqLog layout is versioned, and a
    # positional parse would break the TEST on a format shift.
    for line in lines:
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and "batchWatermarkMs" in obj:
            return obj["batchWatermarkMs"]
    raise AssertionError(f"no batchWatermarkMs object in {odir}/{latest}")


def _drain_append_wm(spark, landing: str, ckpt: str, store: str) -> None:
    """Append-mode drain with a 1 h watermark: a window only emits
    once the watermark passes it, and rows behind the watermark are
    dropped by the stateful operator — the semantics under test."""
    stream = (
        spark.readStream.schema(spark.read.parquet(landing).schema)
        .parquet(landing)
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("event_time", "1 hour")
    )
    agg = stream.groupBy(
        F.window("event_time", "1 hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))

    def sink(bdf, batch_id: int) -> None:
        (
            bdf.select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n_events",
                F.lit(batch_id).alias("batch_id"),
            )
            .write.mode("append")
            .parquet(f"{store}/b{batch_id}")
        )

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_watermark_survives_checkpoint_restart(spark, sf_dir, tmp_path):
    """The third recovery trap: the WATERMARK itself is checkpoint
    state.  Instance #1 drains the NEWEST half of the corpus, driving
    the watermark ~2 weeks forward; days-older rows then land and
    instance #2 restarts from the same checkpoint.  A correct restart
    restores the high watermark and DROPS the late rows (zero new
    emissions); a fresh-state restart would admit them and re-emit
    long-closed windows.  The counterfactual drain (same data, fresh
    checkpoint) proves those old windows DO emit when no restored
    watermark blocks them — so the zero is the watermark's doing, not
    an artifact.  Mechanism asserted too: batchWatermarkMs in the
    offsets log is already past the late rows after drain #1 and
    never regresses in drain #2."""
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")

    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    p40, p60 = ev.select(
        F.expr("percentile(ts, 0.4)"), F.expr("percentile(ts, 0.6)")
    ).collect()[0]
    new_half = ev.filter(F.col("ts") >= p60).select(cols)  # drives wm high
    late = ev.filter(F.col("ts") <= p40).select(cols)  # days behind it

    new_half.write.mode("overwrite").parquet(landing)
    _drain_append_wm(spark, landing, ckpt, store)  # instance #1

    emitted1 = spark.read.option("basePath", store).parquet(f"{store}/b*")
    n1 = emitted1.count()
    assert n1 > 0  # availableNow's no-data batch closed the old windows

    wm1 = _latest_watermark_ms(ckpt)
    late_max_ms = late.agg(F.max(F.expr("ts div 1000000"))).collect()[0][0]
    assert wm1 > late_max_ms + 3_600_000  # every late row is > 1 window late

    late.write.mode("append").parquet(landing)
    _drain_append_wm(spark, landing, ckpt, store)  # NEW instance, same ckpt

    n2 = spark.read.option("basePath", store).parquet(f"{store}/b*").count()
    assert n2 == n1  # restored watermark dropped every late row
    assert _latest_watermark_ms(ckpt) >= wm1  # and never regressed

    # Counterfactual: the SAME landing (new + late files) drained on a
    # FRESH checkpoint emits the late rows' windows — they are only
    # invisible above because the restart restored the watermark.
    ckpt2 = str(tmp_path / "ckpt2")
    store2 = str(tmp_path / "store2")
    _drain_append_wm(spark, landing, ckpt2, store2)
    old_emitted = (
        spark.read.option("basePath", store2)
        .parquet(f"{store2}/b*")
        .filter(
            # p40 is epoch-NANOS (load_table's ts unit); window_start
            # is a timestamp — compare at µs.
            F.col("window_start") <= F.timestamp_micros(F.lit(int(p40) // 1000))
        )
        .count()
    )
    assert old_emitted > 0


def test_state_survives_shuffle_partition_conf_change(spark, sf_dir, tmp_path):
    """The state-store layout trap (VERDICT r10 item 2b): a stateful
    checkpoint PINS the state-store partition count at first-run
    ``spark.sql.shuffle.partitions``.  A restarted instance whose
    session carries a DIFFERENT conf must keep the ORIGINAL layout
    (Spark reads numShufflePartitions back from the checkpoint's
    offset metadata) — if it repartitioned state to the new conf,
    every window's count would land in the wrong store and the
    combined answer would be garbage.  Asserts both the behavior
    (combined counts == one-shot batch answer) and the mechanism (the
    state dir keeps its drain-#1 partition count after drain #2)."""
    import os

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")

    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    a = ev.filter(F.expr("event_id % 2 = 0")).select(cols)
    b = ev.filter(F.expr("event_id % 2 = 1")).select(cols)

    old_conf = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        a.write.mode("overwrite").parquet(landing)
        _drain(spark, landing, ckpt, store)  # instance #1 at 8

        state0 = os.path.join(ckpt, "state", "0")
        parts_after_1 = {d for d in os.listdir(state0) if d.isdigit()}
        assert len(parts_after_1) == 8

        # Restart with a DIFFERENT conf — 13 is prime, so any
        # accidental re-use of the new value is unmistakable.
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b.write.mode("append").parquet(landing)
        _drain(spark, landing, ckpt, store)  # instance #2 at "13"

        parts_after_2 = {d for d in os.listdir(state0) if d.isdigit()}
        assert parts_after_2 == parts_after_1  # layout pinned at 8
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_conf)

    from pyspark.sql import Window

    upd = spark.read.option("basePath", store).parquet(f"{store}/b*")
    w = Window.partitionBy("window_start", "event_type").orderBy(
        F.col("batch_id").desc()
    )
    final = (
        upd.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("window_start", "event_type", "n_events")
    )
    got = {
        (r.window_start, r.event_type): r.n_events for r in final.collect()
    }
    batch = (
        ev.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )
    want = {(r.ws, r.event_type): r.n for r in batch.collect()}
    assert got == want and len(got) > 0


_KILL_STREAM_COMMON = r"""
import glob, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["PYSPARK_PYTHON"] = sys.executable
os.environ["PYSPARK_DRIVER_PYTHON"] = sys.executable
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
from decision_tree_analytics_spark.session import prepare_session
prepare_session(spark)

landing, ckpt, store = {landing!r}, {ckpt!r}, {store!r}
stream = (
    spark.readStream.schema(spark.read.parquet(landing).schema)
    .option("maxFilesPerTrigger", 1)
    .parquet(landing)
    .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
)
agg = stream.groupBy(
    F.window("event_time", "1 hour"), "event_type"
).agg(F.count(F.lit(1)).alias("n_events"))

UPSERT_SLEEP = {sleep}
def upsert(bdf, batch_id):
    if UPSERT_SLEEP:
        time.sleep(UPSERT_SLEEP)
    (bdf.select(F.col("window.start").alias("window_start"), "event_type",
                "n_events", F.lit(batch_id).alias("batch_id"))
        # OVERWRITE per batch dir: a replayed batch (its commit never
        # landed before the kill) rewrites its own partial output -
        # the idempotent-sink convention.
        .write.mode("overwrite").parquet(f"{{store}}/b{{batch_id}}"))

q = (agg.writeStream.foreachBatch(upsert).outputMode("update")
     .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
q.awaitTermination()
"""

# ONE stream/agg/sink definition for both driver processes (the
# cluster_loss_util single-definition lesson): driver 1 only stretches
# each batch so the parent's kill lands inside the drain, driver 2
# only appends the fold-and-verify tail.
_KILL_DRIVER_1 = _KILL_STREAM_COMMON + r"""
print("DRAIN-1-FINISHED", flush=True)  # parent should have killed us first
"""

_KILL_DRIVER_2 = _KILL_STREAM_COMMON + r"""
batch_dirs = sorted(glob.glob(os.path.join(store, "b*")))
print("BATCH-DIRS", len(batch_dirs), flush=True)

# Fold the update-mode upserts: latest batch wins per key.
upserts = spark.read.parquet(*batch_dirs)
from pyspark.sql import Window
w = Window.partitionBy("window_start", "event_type").orderBy(
    F.col("batch_id").desc()
)
final = (upserts.withColumn("rn", F.row_number().over(w))
         .filter("rn = 1").select("window_start", "event_type", "n_events"))

# Exact truth: the same aggregation as ONE batch query.
truth = (
    spark.read.parquet(landing)
    .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    .groupBy(F.window("event_time", "1 hour"), "event_type")
    .agg(F.count(F.lit(1)).alias("n_events"))
    .select(F.col("window.start").alias("window_start"), "event_type",
            "n_events")
)
got = {{(r.window_start, r.event_type): r.n_events for r in final.collect()}}
want = {{(r.window_start, r.event_type): r.n_events for r in truth.collect()}}
assert got == want and len(want) > 0, (
    f"folded state diverged: {{len(got)}} vs {{len(want)}} keys"
)
print("FINAL-STATE-EXACT", len(want), flush=True)
spark.stop()
print("ALL-OK")
"""


def test_stream_survives_driver_process_sigkill_mid_drain(sf_dir, tmp_path):
    """The crash variant of the two-instance recovery tests above:
    the DRIVER PROCESS ITSELF is SIGKILLed mid-drain (no graceful
    query stop, no JVM shutdown hooks — the whole process dies), and
    a brand-new process over the same checkpointLocation must resume
    from the write-ahead offsets, replay at most the uncommitted
    batch into its idempotent sink dir, and fold to EXACTLY the batch
    answer.  Graceful restarts exercise state restore; this exercises
    the offset-log/commit-log atomicity that makes a mid-write crash
    recoverable at all."""
    import glob
    import os
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")

    # Write the landing files from the TEST session (driver 1 is then
    # pure consumer).  8 files x maxFilesPerTrigger=1 => ~8 batches.
    from decision_tree_analytics_spark.session import get_spark
    from decision_tree_analytics_spark.sources.tables import load_table as lt

    s = get_spark()
    ev = lt(s, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ev.select(cols).repartition(8).write.mode("overwrite").parquet(landing)

    code1 = _KILL_DRIVER_1.format(
        repo=repo, landing=landing, ckpt=ckpt, store=store, sleep=0.5
    )
    # File-backed stdio: a SIGKILLed child can't drain pipes, and
    # Spark's stderr volume would fill a pipe buffer and stall the
    # drain before the kill ever lands.
    out1_path = str(tmp_path / "drain1.out")
    with open(out1_path, "w") as out1_fh:
        proc = subprocess.Popen(
            [sys.executable, "-c", code1],
            stdout=out1_fh,
            stderr=subprocess.STDOUT,
        )
    # Kill once >= 2 batch dirs exist (mid-drain by construction: 8
    # batches x >= 0.5 s each).
    deadline = time.time() + 300
    while len(glob.glob(os.path.join(store, "b*"))) < 2:
        assert time.time() < deadline, "drain-1 never produced batches"
        assert proc.poll() is None, (
            f"drain-1 exited early: {open(out1_path).read()[-2000:]}"
        )
        time.sleep(0.1)
    batches_at_kill = len(glob.glob(os.path.join(store, "b*")))
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait(timeout=60)
    assert "DRAIN-1-FINISHED" not in open(out1_path).read(), (
        "kill landed after the drain"
    )

    code2 = _KILL_DRIVER_2.format(
        repo=repo, landing=landing, ckpt=ckpt, store=store, sleep=0
    )
    proc2 = subprocess.run(
        [sys.executable, "-c", code2],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc2.returncode == 0 and "ALL-OK" in proc2.stdout, (
        f"stdout tail: {proc2.stdout[-3000:]}\nstderr tail: {proc2.stderr[-3000:]}"
    )
    assert "FINAL-STATE-EXACT" in proc2.stdout
    # Non-vacuous: the restart actually processed NEW batches beyond
    # the kill point (state + offsets restored, drain completed).
    batches_total = len(glob.glob(os.path.join(store, "b*")))
    assert batches_total > batches_at_kill, (
        f"no new batches after restart ({batches_at_kill} -> {batches_total})"
    )
