"""Grouped top-k strategy comparison.

The contract query (rel_grouped_topk) ships the salted two-phase
strategy; these tests pin (a) exact equivalence with the single-window
textbook strategy, and (b) the plan shapes that justify the choice:
the salted phase-1 exchange partitions on (event_type, salt) so
parallelism is |groups|×SALTS, and only local top-k survivors reach
the per-group window.
"""

from __future__ import annotations

from decision_tree_analytics_spark.operators.relational import (
    grouped_topk_window,
    rel_grouped_topk,
)
from decision_tree_analytics_spark.plans.inspect import count_shuffles, simple_plan


def test_salted_equals_single_window(spark, sf_dir):
    salted = rel_grouped_topk(spark, sf_dir)
    plain = grouped_topk_window(spark, sf_dir)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_strategy_two_exchanges_window_one(spark, sf_dir):
    salted = simple_plan(rel_grouped_topk(spark, sf_dir))
    plain = simple_plan(grouped_topk_window(spark, sf_dir))
    # Two-phase pays one extra (much wider) exchange...
    assert count_shuffles(salted) == 2
    assert count_shuffles(plain) == 1
    # ...and phase 1 must partition on the salted key, not event_type
    # alone, or the whole point (parallelism beyond |groups|) is lost.
    assert "hashpartitioning(event_type" in salted and "salt" in salted
