"""Streaming checkpoint-recovery on REAL multi-JVM executors: the
state-store files a stateful aggregation wrote during query instance
#1 must be reloaded by instance #2's tasks — which on a
local-cluster can land on a DIFFERENT executor JVM than the one that
wrote them.  local[n] cannot distinguish this from an in-process
reload; two separate executor processes can.

Runs in a subprocess (one process = one SparkContext; the pytest
session fixture owns the in-process gateway)."""

from __future__ import annotations

import os
import subprocess
import sys

_DRIVER = r"""
import os, sys, tempfile
sys.path.insert(0, {repo!r})
os.environ["PYSPARK_PYTHON"] = sys.executable
os.environ["PYSPARK_DRIVER_PYTHON"] = sys.executable
os.environ["PYTHONPATH"] = {repo!r} + os.pathsep + os.environ.get("PYTHONPATH", "")
import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window
from decision_tree_analytics_spark.sources.tables import load_table

spark = (
    SparkSession.builder.master("local-cluster[2,4,2048]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.executorEnv.PYTHONPATH", {repo!r})
    .getOrCreate()
)
root = tempfile.mkdtemp(prefix="cluster-recovery-")
landing, ckpt, store = [os.path.join(root, d) for d in ("landing", "ckpt", "store")]

ev = load_table(spark, {sf!r}, "events")
cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
a = ev.filter(F.expr("event_id % 2 = 0")).select(cols)
b = ev.filter(F.expr("event_id % 2 = 1")).select(cols)

def drain():
    stream = (
        spark.readStream.schema(spark.read.parquet(landing).schema)
        .parquet(landing)
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = stream.groupBy(F.window("event_time", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    def upsert(bdf, batch_id):
        (bdf.select(F.col("window.start").alias("window_start"), "event_type",
                    "n_events", F.lit(batch_id).alias("batch_id"))
            .write.mode("append").parquet(f"{{store}}/b{{batch_id}}"))
    q = (agg.writeStream.foreachBatch(upsert).outputMode("update")
         .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
    q.awaitTermination()

a.write.mode("overwrite").parquet(landing)
drain()                                   # instance #1: file A
b.write.mode("append").parquet(landing)
drain()                                   # instance #2, same checkpoint

upd = spark.read.option("basePath", store).parquet(f"{{store}}/b*")
w = Window.partitionBy("window_start", "event_type").orderBy(F.col("batch_id").desc())
final = (upd.withColumn("rk", F.row_number().over(w)).filter("rk = 1")
         .select("window_start", "event_type", "n_events"))
got = {{(r.window_start, r.event_type): r.n_events for r in final.collect()}}
batch = (ev.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
         .groupBy(F.window("event_time", "1 hour"), "event_type")
         .agg(F.count(F.lit(1)).alias("n"))
         .select(F.col("window.start").alias("ws"), "event_type", "n"))
want = {{(r.ws, r.event_type): r.n for r in batch.collect()}}
assert got == want and len(got) > 0, (len(got), len(want))
spark.stop()
print("RECOVERY-OK", len(got))
"""


def test_state_store_recovery_across_executor_jvms(sf_dir):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _DRIVER.format(repo=repo, sf=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0 and "RECOVERY-OK" in proc.stdout, (
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
