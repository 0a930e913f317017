"""Round-14 UDTF candidate (operators/pending_r14.py) — oracle
verification, plan lock, pure-Python replay, and real-cluster
evidence, run NOW so r14's registration is pure bookkeeping (the
pending_r12 pattern)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from decision_tree_analytics_spark.operators.pending_r14 import (
    PENDING_ORACLES,
    PENDING_QUERIES,
    UDTF_DOC_MOD,
    UDTF_DOC_REM,
)
from tests.oracle_harness import compare


def test_pending_r14_match_oracles(spark, sf_dir, oracle_con):
    assert set(PENDING_QUERIES) == set(PENDING_ORACLES)
    for name, fn in sorted(PENDING_QUERIES.items()):
        compare(fn(spark, sf_dir), oracle_con, PENDING_ORACLES[name], name)


def test_token_spans_uses_arrow_udtf_lane(spark, sf_dir):
    """The lane claim itself: the plan must run the UDTF through
    ArrowEvalPythonUDTF (Arrow batch transfer), never
    BatchEvalPythonUDTF (per-row pickling), with the doc slice pushed
    to the parquet scan and no shuffle before the Python stage."""
    from decision_tree_analytics_spark.plans.inspect import simple_plan

    plan = simple_plan(PENDING_QUERIES["udf_token_spans"](spark, sf_dir))
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPythonUDTF" not in plan
    assert plan.count("Scan parquet") == 1
    # The slice reaches the scan (filter pushdown, not post-filter).
    assert "PushedFilters" in plan and "IsNotNull(text)" in plan
    # Narrow stage: the only exchange is the size-aware repartition
    # (round-robin), no hash shuffle anywhere.
    assert plan.count("Exchange hashpartitioning") == 0


def test_token_spans_matches_python_replay(spark, sf_dir):
    """Walk every sliced doc's text in pure Python and compare the
    full span table — offsets, lengths, per-doc tiling."""
    from decision_tree_analytics_spark.sources.tables import load_table

    got = (
        PENDING_QUERIES["udf_token_spans"](spark, sf_dir)
        .toPandas()
        .sort_values(["doc_id", "seg_idx"])
        .reset_index(drop=True)
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") % UDTF_DOC_MOD == UDTF_DOC_REM)
            & F.col("text").isNotNull()
        )
        .select("doc_id", "text")
        .toPandas()
    )
    assert len(docs) > 0
    want = []
    for _, r in docs.iterrows():
        off = 0
        for i, part in enumerate(r.text.split(' ')):
            want.append((r.doc_id, i, off, len(part)))
            off += len(part) + 1
        # Segments + separators tile the text exactly.
        assert off - 1 == len(r.text)
    want.sort()
    # Non-vacuous one-to-many: the fixture must actually fan out
    # (many spans per doc), or the UDTF degenerates into a UDF.
    assert len(want) > 5 * len(docs)
    assert len(got) == len(want)
    assert (
        list(map(tuple, got.itertuples(index=False, name=None))) == want
    )


_CLUSTER_DRIVER = r"""
import os, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo_tests!r})
os.environ["PYSPARK_PYTHON"] = sys.executable
os.environ["PYSPARK_DRIVER_PYTHON"] = sys.executable
os.environ["PYTHONPATH"] = {repo!r} + os.pathsep + os.environ.get("PYTHONPATH", "")
from pyspark.sql import SparkSession
from tests.oracle_harness import compare, duckdb_connection
from decision_tree_analytics_spark.operators.pending_r14 import (
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


def test_pending_r14_match_on_real_cluster(sf_dir):
    """The UDTF class must cloudpickle to REMOTE executor Arrow
    workers (the src_python_datasource nested-class lesson) and each
    executor's eval stream must cover exactly its partitions."""
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
