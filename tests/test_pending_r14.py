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


def test_udtf_table_argument_partition_by_works(spark, sf_dir):
    """Container-capability probe for the OTHER half of the UDTF
    surface: TABLE(...) PARTITION BY ... ORDER BY arguments with a
    stateful eval/terminate protocol (the plan shows the partitioning
    exchange + sort feeding ArrowEvalPythonUDTF).  The engine's
    contract ops keep using applyInPandas for per-group Python — the
    pandas-batch lane is strictly faster for aggregation — so this is
    documentation that the surface WORKS here (like the avro/protobuf
    probes document what doesn't), verified by exact per-group
    integers against the JVM groupBy."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import udtf

    from decision_tree_analytics_spark.sources.tables import load_table

    @udtf(returnType="source: string, n: bigint, chars: bigint", useArrow=True)
    class _PerSource:
        def __init__(self):
            self.n = 0
            self.chars = 0
            self.src = None

        def eval(self, row):
            self.src = row["source"]
            self.n += 1
            self.chars += int(row["n_chars"])

        def terminate(self):
            if self.src is not None:
                yield (self.src, self.n, self.chars)

    spark.udtf.register("dta_per_source_probe", _PerSource)
    load_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    ).createOrReplaceTempView("dta_udtf_docs")
    out = spark.sql(
        "SELECT * FROM dta_per_source_probe("
        "TABLE(dta_udtf_docs) PARTITION BY source)"
    )
    from decision_tree_analytics_spark.plans.inspect import simple_plan

    plan = simple_plan(out)
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPythonUDTF" not in plan
    assert "Exchange hashpartitioning" in plan  # the PARTITION BY
    got = {r.source: (r.n, r.chars) for r in out.collect()}
    want = {
        r.source: (r.n, r.chars)
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .collect()
    }
    assert got == want and len(got) > 1


def test_token_span_formula_property():
    """Hypothesis lock on the span walk both the UDTF and the oracle
    implement: for ANY token list (incl. empty tokens — consecutive /
    leading / trailing separators), the emitted (idx, start, len)
    spans must tile the joined text exactly and reconstruct every
    token by slicing — an independent spec, not a re-run of the same
    loop."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.text(
        alphabet=st.characters(blacklist_characters=" "), max_size=8
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(token, min_size=1, max_size=20))
    def check(tokens):
        text = " ".join(tokens)
        # The walk under test (UDTF eval / oracle window-sum form).
        spans, off = [], 0
        for i, part in enumerate(text.split(" ")):
            spans.append((i, off, len(part)))
            off += len(part) + 1
        assert len(spans) == len(tokens)
        # Independent spec: slice-reconstruction + exact tiling.
        for (i, start, ln), tok in zip(spans, tokens):
            assert text[start : start + ln] == tok
            if start + ln < len(text):
                assert text[start + ln] == " "  # separator follows
        assert spans[-1][1] + spans[-1][2] == len(text)

    check()
