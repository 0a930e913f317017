"""ml_isotonic_calibration invariants: the minimax formulation must
equal the classic sequential PAV on the same grid, be monotone, and
conserve total mass."""

from __future__ import annotations

from decision_tree_analytics_spark.operators.stats_ext import (
    ml_isotonic_calibration,
)


def _pav(ns, ps):
    """Textbook pool-adjacent-violators over (count, positives)."""
    blocks = [[n, p] for n, p in zip(ns, ps)]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) >= 2 and out[-2][1] * out[-1][0] >= out[-1][1] * out[-2][0]:
            n2, p2 = out.pop()
            out[-1][0] += n2
            out[-1][1] += p2
    # expand back to per-input-block fits
    expanded = []
    i = 0
    for n, p in out:
        c = 0
        while c < n:
            c += ns[i]
            expanded.append(p / n)
            i += 1
    return expanded


def test_isotonic_equals_sequential_pav(spark, sf_dir):
    rows = sorted(ml_isotonic_calibration(spark, sf_dir).collect(),
                  key=lambda r: r.k)
    assert rows
    iso = [r.iso_rate for r in rows]
    # monotone non-decreasing (1-micro rounding slack)
    for a, b in zip(iso, iso[1:]):
        assert b >= a - 1e-6
    # mass conservation: sum n*iso == total positives
    total_pos = sum(r.n * r.pos_rate for r in rows)
    total_iso = sum(r.n * r.iso_rate for r in rows)
    assert abs(total_pos - total_iso) <= 1e-3 * sum(r.n for r in rows)
    # equals the classic sequential PAV fit
    ns = [r.n for r in rows]
    ps = [round(r.pos_rate * r.n) for r in rows]
    ref = _pav(ns, ps)
    assert len(ref) == len(rows)
    for got, want in zip(iso, ref):
        assert abs(got - want) <= 2e-6
