"""Skew-mitigation utilities.

AQE's skew-join splitting covers joins; for *aggregations* over
heavily-skewed keys (the classic: one user/domain owns 10% of a
100 TB event stream) the fix is two-phase salted aggregation.  This
module provides the generic combinator — algebraic aggregates only
(sum/count/min/max), which re-combine exactly.

Not part of the oracle inventory (it computes the same answer as a
plain groupBy, just with a different shuffle shape); equivalence is
locked by tests/test_skew.py.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: phase 1 groups on (keys + random salt)
    so a hot key spreads over ``n_salts`` reducers; phase 2 re-combines
    the partials on the true keys.

    ``aggs``: output_col -> (input_col, fn) with fn ∈ {sum,count,min,max}.
    The phase-2 re-combiner for count is sum; min/max/sum are idempotent
    under re-application.
    """
    recombine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (_, fn) in aggs.items():
        if fn not in recombine:
            raise ValueError(f"{fn} is not algebraic; salted_agg supports {sorted(recombine)}")

    salted = df.withColumn("__salt__", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt__").agg(
        *[getattr(F, fn)(col).alias(out) for out, (col, fn) in aggs.items()]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[
            getattr(F, recombine[fn])(out).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )
    return phase2


def salt_column(n_salts: int) -> Column:
    """Deterministic-per-run salt column for pre-salting join keys."""
    return (F.rand(seed=42) * n_salts).cast("int")
