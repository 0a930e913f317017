"""Invariant tests for the late-round-6 operators (their cross-engine
correctness is covered by tests/test_oracle_queries.py; these pin the
SEMANTIC properties the oracles can't express)."""

from __future__ import annotations


def test_shap_attributions_are_additive(spark, sf_dir):
    """Linear SHAP is exactly additive: base + sum(phi) == pred up to
    the independent 1e-6 roundings of the four outputs."""
    from decision_tree_analytics_spark.operators.ml_inventory import (
        ml_shap_linear,
    )

    rows = ml_shap_linear(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs((r.base + r.phi_x1 + r.phi_x2) - r.pred) < 4e-6


def test_assoc_rules_support_and_confidence_bounds(spark, sf_dir):
    """Pair support never exceeds either item support; confidence is
    pair/supp_a in (0, 1]; lift is symmetric in construction, so the
    stored (a < b) orientation must reproduce from the supports."""
    from decision_tree_analytics_spark.operators.analytics import (
        rel_assoc_rules,
    )

    rows = rel_assoc_rules(spark, sf_dir).collect()
    assert rows
    import math

    for r in rows:
        assert r.brand_a < r.brand_b
        assert 1 <= r.pair_supp <= min(r.supp_a, r.supp_b)
        assert 0.0 < r.conf_ab <= 1.0
        want_conf = math.floor(r.pair_supp / r.supp_a * 1e6 + 0.5) / 1e6
        assert r.conf_ab == want_conf
    # top-k ordering: supports descend with the declared tie-break
    key = [(-r.pair_supp, r.brand_a, r.brand_b) for r in rows]
    assert key == sorted(key)


def test_gaps_islands_streaks_partition_active_days(spark, sf_dir):
    """Streaks partition the active days (sum of lengths = active-day
    count) and equal a pure-Python rerun on the same distinct days."""
    import pyspark.sql.functions as F

    from decision_tree_analytics_spark.operators.relational import (
        rel_gaps_islands,
    )
    from decision_tree_analytics_spark.sources.tables import load_table

    got = {
        r.user_id: (
            r.n_active_days,
            r.n_streaks,
            r.longest_streak,
            r.longest_start_day,
        )
        for r in rel_gaps_islands(spark, sf_dir).collect()
    }
    assert got

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr("ts div 1000 div 86400000000").alias("day"))
        .distinct()
        .collect()
    )
    days = {}
    for r in ev:
        days.setdefault(r.user_id, set()).add(r.day)
    want = {}
    for u, ds in days.items():
        ds = sorted(ds)
        streaks = [[ds[0], 1]]
        for prev, cur in zip(ds, ds[1:]):
            if cur == prev + 1:
                streaks[-1][1] += 1
            else:
                streaks.append([cur, 1])
        longest = min((-ln, st) for st, ln in streaks)
        want[u] = (len(ds), len(streaks), -longest[0], longest[1])
    assert got == want
