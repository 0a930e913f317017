"""The one still-pending candidate (operators/pending_r12.py's
``PENDING_QUERIES`` — rel_hodges_lehmann) — full oracle verification,
2-JVM cluster evidence, and a pure-Python replay, kept warm so the
operator registers the moment a driver window ever frees a slot
(post-r14 every window is a zero-slack 50-name re-verification tail).

The six operators the module DID register (five in r12,
mm_video_frame_plan in r14) moved to the standard suites:
tests/test_oracle_queries.py (oracle equality), tests/test_plans.py
(plan locks), tests/test_round12_ops.py + tests/test_round14_ops.py
(invariants/replays)."""

from __future__ import annotations

import os

from decision_tree_analytics_spark.operators.pending_r12 import (
    PENDING_ORACLES,
    PENDING_QUERIES,
)
from tests.oracle_harness import compare


def test_pending_queries_match_oracles(spark, sf_dir, oracle_con):
    assert set(PENDING_QUERIES) == set(PENDING_ORACLES)
    for name, fn in sorted(PENDING_QUERIES.items()):
        compare(fn(spark, sf_dir), oracle_con, PENDING_ORACLES[name], name)


_CLUSTER_DRIVER = r"""
import os, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo_tests!r})
os.environ["PYSPARK_PYTHON"] = sys.executable
os.environ["PYSPARK_DRIVER_PYTHON"] = sys.executable
os.environ["PYTHONPATH"] = {repo!r} + os.pathsep + os.environ.get("PYTHONPATH", "")
from pyspark.sql import SparkSession
from tests.oracle_harness import compare, duckdb_connection
from decision_tree_analytics_spark.operators.pending_r12 import (
    PENDING_ORACLES,
    PENDING_QUERIES,
)

spark = (
    SparkSession.builder.master("local-cluster[2,4,2048]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.executorEnv.PYTHONPATH", {repo!r})
    .getOrCreate()
)
con = duckdb_connection({sf!r})
for name in sorted(PENDING_QUERIES):
    compare(PENDING_QUERIES[name](spark, {sf!r}), con, PENDING_ORACLES[name], name)
    print("CLUSTER-MATCH", name, flush=True)
spark.stop()
print("ALL-OK")
"""


def test_pending_queries_match_on_real_cluster(sf_dir):
    """The held candidate oracle-checked on a REAL 2-JVM
    local-cluster — keeping the multi-JVM evidence its eventual
    registration will claim (the HL pseudomedian's grid join + rank
    window on a real exchange)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CLUSTER_DRIVER.format(repo=repo, repo_tests=repo, sf=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0 and "ALL-OK" in proc.stdout, (
        f"stdout tail: {proc.stdout[-3000:]}\nstderr tail: {proc.stderr[-3000:]}"
    )
    for name in PENDING_QUERIES:
        assert f"CLUSTER-MATCH {name}" in proc.stdout


def test_hodges_lehmann_matches_replay(spark, sf_dir):
    import pyspark.sql.functions as F

    from decision_tree_analytics_spark.sources.tables import load_table

    got = (
        PENDING_QUERIES["rel_hodges_lehmann"](spark, sf_dir)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),"
                " 16, 10) AS BIGINT) % 2"
            ).alias("arm"),
            F.expr("(ts div 1000) div 86400000000").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).alias("cents"),
        )
        .groupBy("event_type", "arm", "day")
        .agg(F.sum("cents").alias("x"))
        .toPandas()
    )
    for et, g in daily.groupby("event_type"):
        ts = g[g.arm == 1]
        cs = g[g.arm == 0]
        diffs = sorted(
            int(xt) - int(xc) for xt in ts.x for xc in cs.x
        )
        n = len(diffs)
        if n == 0:
            assert et not in got.index
            continue
        lo, hi = diffs[(n + 1) // 2 - 1], diffs[n // 2]
        import math

        want = math.floor(((lo + hi) / 2) * 100 + 0.5) / 100
        assert got.loc[et, "n_pairs"] == n
        assert got.loc[et, "hl_shift_cents"] == want
