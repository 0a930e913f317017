"""rel_viterbi_states cross-check: replay the exact DP in pure Python
from the same per-user day counts and assert bit-identical costs and
decoded paths (the Kruskal-style algorithmic proof)."""

from __future__ import annotations

import pyspark.sql.functions as F

from decision_tree_analytics_spark.operators.stats_ext import (
    US_PER_DAY,
    VIT_DAYS,
    VIT_SWITCH,
    rel_viterbi_states,
)
from decision_tree_analytics_spark.sources.tables import load_table


def test_viterbi_equals_python_replay(spark, sf_dir):
    got = {r.user_id: r for r in rel_viterbi_states(spark, sf_dir).collect()}
    assert got

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"(ts div 1000) div {US_PER_DAY}").alias("day")
    )
    rows = ev.collect()
    d0 = min(r.day for r in rows)
    counts = {}
    for r in rows:
        di = r.day - d0
        if di < VIT_DAYS:
            c = counts.setdefault(r.user_id, [0] * VIT_DAYS)
            c[di] += 1
    mu = sum(sum(c) for c in counts.values()) / (len(counts) * VIT_DAYS)
    import math

    lo = math.floor(mu / 2 + 0.5)
    hi = math.floor(mu * 3 / 2 + 0.5)

    assert set(got) == set(counts)
    for uid, c in counts.items():
        v0, v1 = abs(c[0] - lo), abs(c[0] - hi)
        p0, p1 = 0, 1
        for t in range(1, VIT_DAYS):
            nv0 = min(v0, v1 + VIT_SWITCH) + abs(c[t] - lo)
            np0 = p0 * 2 if v0 <= v1 + VIT_SWITCH else p1 * 2
            nv1 = min(v0 + VIT_SWITCH, v1) + abs(c[t] - hi)
            np1 = p0 * 2 + 1 if v0 + VIT_SWITCH <= v1 else p1 * 2 + 1
            v0, v1, p0, p1 = nv0, nv1, np0, np1
        cost = min(v0, v1)
        path = p0 if v0 <= v1 else p1
        r = got[uid]
        assert r.vit_cost == cost, uid
        assert r.path_mask == path, uid
        assert r.n_high_days == bin(path).count("1"), uid
