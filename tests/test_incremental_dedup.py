"""Golden two-batch lifecycle for incremental (delta-style) dedup:
batch 1 seeds a persisted fingerprint store; batch 2 merges against
it; the commit step appends the survivors; batch 3 sees them.

Mirrors the reference's golden e2e shape
(DecisionTreeRegressionTest.java:221-234 — fixed input, exact
expected rows) applied to the dedup surface."""

from __future__ import annotations

import pyspark.sql.functions as F

from decision_tree_analytics_spark.operators.dedup import incremental_dedup

BATCH1 = [
    (0, "the quick brown fox"),
    (1, "lorem ipsum dolor"),
    (2, "THE QUICK BROWN FOX  "),  # dup of 0 after normalization
]
BATCH2 = [
    (10, "lorem ipsum dolor"),  # already in the store -> dropped
    (11, "a brand new document"),  # first seen -> kept
    (12, "a brand new document"),  # intra-batch dup -> keep-first
    (13, "another new one"),  # first seen -> kept
]
BATCH3 = [
    (20, "a brand new document"),  # seen in batch 2 -> dropped
    (21, "third wave text"),  # first seen -> kept
]


def _with_fp(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select(
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"), "doc_id"
    )


def test_two_batch_incremental_cycle(spark, tmp_path):
    store_path = str(tmp_path / "fingerprint_store")

    # Batch 1 bootstraps the store (dedup within the batch, then commit).
    b1 = _with_fp(spark, BATCH1)
    empty_store = b1.select("fingerprint").limit(0)
    first = incremental_dedup(b1, empty_store)
    assert {
        (r.keep_doc_id, r.n_copies) for r in first.collect()
    } == {(0, 2), (1, 1)}
    first.select("fingerprint").write.mode("overwrite").parquet(store_path)

    # Batch 2 merges against the persisted store.
    store = spark.read.parquet(store_path)
    b2 = _with_fp(spark, BATCH2)
    second = incremental_dedup(b2, store)
    rows = {(r.keep_doc_id, r.n_copies) for r in second.collect()}
    assert rows == {(11, 2), (13, 1)}  # 10 dropped (store hit), 12 folded into 11

    # Commit step: append the survivors' fingerprints.
    second.select("fingerprint").write.mode("append").parquet(store_path)

    # Batch 3 sees batch 2's commits.
    store = spark.read.parquet(store_path)
    third = incremental_dedup(_with_fp(spark, BATCH3), store)
    assert {(r.keep_doc_id, r.n_copies) for r in third.collect()} == {(21, 1)}


def test_incremental_plan_is_hash_only(spark, sf_dir):
    """The merge must shuffle 16-byte fingerprints, never text, and
    keep-first must partial-aggregate map-side."""
    from decision_tree_analytics_spark.operators.dedup import dedup_incremental
    from decision_tree_analytics_spark.plans.inspect import simple_plan

    plan = simple_plan(dedup_incremental(spark, sf_dir))
    assert "partial_min" in plan
    assert "LeftAnti" in plan


def test_connected_components_chain_transitivity(spark):
    """A~B and B~C must land A, B, C in one component even though A≁C
    directly; isolated nodes keep their own id."""
    from decision_tree_analytics_spark.operators.dedup import (
        connected_components,
    )

    docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.component_id
        for r in connected_components(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_connected_components_long_chain_converges(spark):
    """A 40-node path graph (diameter ≫ a naive per-round hop budget)
    must still converge — pointer jumping makes rounds O(log n)."""
    from decision_tree_analytics_spark.operators.dedup import (
        connected_components,
    )

    n = 40
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.component_id
        for r in connected_components(docs, pairs).collect()
    }
    assert got == {i: 0 for i in range(n)}
