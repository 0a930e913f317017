"""Structural invariants of ns_curriculum_order's hierarchically
decomposed prefix sum (the oracle proves cross-engine parity; this
proves the decomposition IS a prefix sum)."""

from __future__ import annotations

from decision_tree_analytics_spark.operators.text import (
    CURR_EPOCH_TOKENS,
    ns_curriculum_order,
)


def test_curriculum_prefix_sum_and_epoch_invariants(spark, sf_dir):
    rows = ns_curriculum_order(spark, sf_dir).collect()
    assert rows
    # cum_before values reconstruct one global chain: sorted by
    # cum_before, each doc starts exactly where the previous ended.
    chain = sorted(rows, key=lambda r: r.cum_before)
    assert chain[0].cum_before == 0
    for prev, cur in zip(chain, chain[1:]):
        assert cur.cum_before == prev.cum_before + prev.n_tokens
    # tiers are contiguous in the chain (curriculum order), and the
    # epoch index is the budget quotient of the global position.
    tiers = [r.tier for r in chain]
    assert tiers == sorted(tiers)
    for r in rows:
        assert r.epoch == r.cum_before // CURR_EPOCH_TOKENS
    assert len({r.epoch for r in rows}) >= 2  # budget actually cuts
