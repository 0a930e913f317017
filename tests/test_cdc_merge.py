"""MERGE semantics on a hand-built fixture: all four outcomes."""

from __future__ import annotations

from decision_tree_analytics_spark.operators.cdc import merge_changes


def test_merge_all_four_outcomes(spark):
    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "TWO", "U"),   # update
            (3, None, "D"),    # delete existing
            (4, "FOUR", "U"),  # insert
            (5, None, "D"),    # delete of a missing key: no-op
        ],
        "k long, v string, op string",
    )
    got = {
        r.k: (r.v, r.source) for r in merge_changes(base, changes, "k").collect()
    }
    assert got == {
        1: ("one", "base"),
        2: ("TWO", "applied"),
        4: ("FOUR", "applied"),
    }


def test_merge_plan_is_single_join_no_cartesian(spark, sf_dir):
    from decision_tree_analytics_spark.operators.cdc import cdc_merge_upsert
    from decision_tree_analytics_spark.plans.inspect import simple_plan

    plan = simple_plan(cdc_merge_upsert(spark, sf_dir))
    assert plan.count("Join") == 1  # the merge IS one full-outer join
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
