"""Property-based tests (hypothesis) for the round-10 integer math —
pure-Python replicas of the EXACT expression trees both engines run
(`ns_epoch_plan`'s budget arithmetic, `snap_overlap_depth`'s
sweep-line), checked for their invariants over arbitrary inputs.
The Spark-vs-oracle value equality lives in the oracle suite; these
lock the FORMULAS against future refactors."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from decision_tree_analytics_spark.operators.text import (
    EPOCH_BUDGET_MULT,
    MAX_EPOCH_MILLI,
)


def _epoch_rows(tokens: list[int]) -> list[dict]:
    """Replica of ns_epoch_plan's integer pipeline for one inventory."""
    sw = [math.floor(math.sqrt(float(n)) * 1e6 + 0.5) for n in tokens]
    total_sw = sum(sw)
    budget = EPOCH_BUDGET_MULT * sum(tokens)
    rows = []
    for n, s in zip(tokens, sw):
        w = s * 1_000_000 // total_sw if total_sw else None
        target = w * (budget // 1000) // 1000
        epochs = min(target * 1000 // n, MAX_EPOCH_MILLI) if n else None
        eff = epochs * n // 1000
        rows.append(
            {
                "n_tokens": n,
                "weight_ppm": w,
                "target_tokens": target,
                "epochs_milli": epochs,
                "effective_tokens": eff,
                "shortfall_tokens": target - eff,
            }
        )
    return rows


inventories = st.lists(
    st.integers(min_value=1, max_value=10**12), min_size=1, max_size=50
)

# ADVICE r10: the binding overflow bound is the share numerator
# sw * 1e6 with sw ~= sqrt(n_tokens) * 1e6, i.e. any SINGLE source is
# capped at ~8.5e13 tokens (sqrt(8.5e13)*1e12 ~= 9.2e18 ~= 2^63); the
# budget-side bound weight_ppm * (budget div 1000) caps the TOTAL at
# ~9.2e15 budget tokens.  This lane drives per-source magnitudes right
# up to the documented 8.5e13 while max_size=7 keeps the budget
# (4 * 7 * 8.5e13 = 2.4e15) safely inside its own bound, so every
# intermediate must stay representable — locked below.
near_bound_inventories = st.lists(
    st.integers(min_value=1, max_value=85 * 10**12), min_size=1, max_size=7
)


@given(inventories)
@settings(max_examples=200, deadline=None)
def test_epoch_plan_invariants(tokens):
    rows = _epoch_rows(tokens)
    budget = EPOCH_BUDGET_MULT * sum(tokens)
    # Floor-quantized shares: never oversubscribe, undershoot bounded.
    wsum = sum(r["weight_ppm"] for r in rows)
    assert wsum <= 1_000_000
    assert wsum > 1_000_000 - len(rows) - 1
    for r in rows:
        assert 0 <= r["epochs_milli"] <= MAX_EPOCH_MILLI
        assert r["shortfall_tokens"] >= 0
        assert r["effective_tokens"] >= 0
    # Post-cap spend never exceeds the budget.
    assert sum(r["effective_tokens"] for r in rows) <= budget
    # No BIGINT overflow anywhere in the tree at the max magnitudes
    # the strategy generates (1e12 tokens/source x 50 sources).
    for r in rows:
        for v in r.values():
            assert abs(v) < 2**63


@given(near_bound_inventories)
@settings(max_examples=200, deadline=None)
def test_epoch_plan_no_overflow_at_documented_bounds(tokens):
    """Locks the docstring's overflow claims: with every source at or
    below ~8.5e13 tokens and the budget below ~9.2e15, EVERY
    intermediate of the shared expression tree — including the two
    products that are evaluated before their trailing div — fits in a
    signed 64-bit integer, so neither engine can raise ANSI overflow
    inside the documented envelope."""
    sw = [math.floor(math.sqrt(float(n)) * 1e6 + 0.5) for n in tokens]
    total_sw = sum(sw)
    budget = EPOCH_BUDGET_MULT * sum(tokens)
    assert budget < 9_200_000_000_000_000  # strategy keeps us in-envelope
    for n, s in zip(tokens, sw):
        assert s * 1_000_000 < 2**63  # the binding per-source product
        w = s * 1_000_000 // total_sw
        assert w * (budget // 1000) < 2**63  # the budget-side product
    rows = _epoch_rows(tokens)
    for r in rows:
        for v in r.values():
            assert abs(v) < 2**63
        # target * 1000 (the epochs numerator) must fit too.
        assert r["target_tokens"] * 1000 < 2**63


@given(inventories)
@settings(max_examples=200, deadline=None)
def test_epoch_plan_upsampling_is_monotone_with_margin(tokens):
    """alpha=0.5 smoothing: a source with <= 1/4 the tokens of another
    gets >= its epochs — PROVIDED its smoothed share is representable
    at ppm granularity (weight_ppm >= 100) and its own schedule is not
    floor-dominated (epochs_milli >= 10).  Sub-ppm sources legitimately
    floor to zero (hypothesis found tokens=[1, 1e12]: the tiny source's
    share is ~1e-6 ppm), which is quantization, not inversion — the 2x
    sqrt gap then swamps every remaining floor in the tree."""
    rows = _epoch_rows(tokens)
    by_n = sorted(rows, key=lambda r: r["n_tokens"])
    for small in by_n:
        if small["weight_ppm"] < 100 or small["epochs_milli"] < 10:
            continue
        for big in by_n:
            if small["n_tokens"] * 4 <= big["n_tokens"]:
                assert small["epochs_milli"] >= big["epochs_milli"]


intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=0, max_value=10_000),
    ).map(lambda p: (min(p), max(p))),
    min_size=1,
    max_size=60,
)


def _sweep_depths(ivs: list[tuple[int, int]]) -> dict[int, int]:
    """Replica of snap_overlap_depth's boundary rollup + running sum."""
    deltas: dict[int, int] = {}
    for lo, hi in ivs:
        deltas[lo] = deltas.get(lo, 0) + 1
        deltas[hi + 1] = deltas.get(hi + 1, 0) - 1
    depth, out = 0, {}
    for day in sorted(deltas):
        depth += deltas[day]
        out[day] = depth
    return out


@given(intervals)
@settings(max_examples=200, deadline=None)
def test_sweep_line_equals_brute_force_overlap(ivs):
    depths = _sweep_depths(ivs)
    days = sorted(depths)
    for day, depth in depths.items():
        brute = sum(1 for lo, hi in ivs if lo <= day <= hi)
        assert depth == brute
    # Conservation: depth never negative, returns to zero after the
    # last boundary.
    assert all(d >= 0 for d in depths.values())
    assert depths[days[-1]] == 0
