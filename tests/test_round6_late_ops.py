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


def _daily_cents(spark, sf_dir):
    import math

    import pyspark.sql.functions as F

    from decision_tree_analytics_spark.sources.tables import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
            "value",
        )
        .collect()
    )
    daily = {}
    for r in rows:
        k = (r.event_type, r.day)
        daily[k] = daily.get(k, 0) + math.floor(r.value * 100 + 0.5)
    return daily


def test_ewma_trend_matches_python_closed_form(spark, sf_dir):
    import math

    from decision_tree_analytics_spark.operators.stats_ext import (
        EWMA_LOOKBACK,
        rel_ewma_trend,
    )

    got = {
        (r.event_type, r.day): (r.cents, r.ewma_hist, r.dev_ppm)
        for r in rel_ewma_trend(spark, sf_dir).collect()
    }
    assert got
    daily = _daily_cents(spark, sf_dir)
    for (et, day), cents in daily.items():
        num = den = 0
        for d in range(1, EWMA_LOOKBACK + 1):
            if (et, day - d) in daily:
                w = 3**d * 4 ** (EWMA_LOOKBACK - d)
                num += w * daily[(et, day - d)]
                den += w
        if den == 0:
            assert got[(et, day)] == (cents, None, None)
        else:
            ewma = num / den
            assert got[(et, day)] == (
                cents,
                math.floor(ewma * 1e6 + 0.5) / 1e6,
                math.floor((cents - ewma) / ewma * 1e6 + 0.5),
            )


def test_rolling_ols_matches_python_closed_form(spark, sf_dir):
    import math

    from decision_tree_analytics_spark.operators.stats_ext import (
        OLS_FRAME,
        rel_rolling_ols,
    )

    got = {
        (r.event_type, r.day): (r.cents, r.slope7, r.intercept7)
        for r in rel_rolling_ols(spark, sf_dir).collect()
    }
    assert got
    daily = _daily_cents(spark, sf_dir)
    series = {}
    for (et, day), cents in sorted(daily.items()):
        series.setdefault(et, []).append((day, cents))
    want = {}
    for et, pts in series.items():
        for i in range(OLS_FRAME - 1, len(pts)):
            frame = pts[i - OLS_FRAME + 1 : i + 1]
            n = len(frame)
            sx = sum(d for d, _ in frame)
            sy = sum(c for _, c in frame)
            sxy = sum(d * c for d, c in frame)
            sxx = sum(d * d for d, _ in frame)
            slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            inter = (sy - slope * sx) / n
            want[(et, pts[i][0])] = (
                pts[i][1],
                math.floor(slope * 1e6 + 0.5) / 1e6,
                math.floor(inter * 1e6 + 0.5) / 1e6,
            )
    assert got == want
