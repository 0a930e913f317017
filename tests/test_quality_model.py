"""Structural invariants of the learned quality-filter trainer (the
oracle proves cross-engine parity; CLAUDE.md: never assert model
QUALITY on this weak-signal fixture)."""

from __future__ import annotations

from decision_tree_analytics_spark.operators.text import ns_quality_model
from decision_tree_analytics_spark.sources.tables import load_table


def test_quality_model_split_counts_and_bounds(spark, sf_dir):
    row = ns_quality_model(spark, sf_dir).collect()[0]
    total = load_table(spark, sf_dir, "documents").count()
    assert row.n_train + row.n_test == total
    assert row.n_train > row.n_test > 0  # ~80/20 md5 split
    assert 0 <= row.kept_count <= row.n_test
    assert 0 <= row.match_count <= row.n_test
    assert row.train_logloss > 0.0  # finite, non-degenerate sigmoid
    assert any(getattr(row, f"w{j}") != 0.0 for j in range(5))  # it trained
