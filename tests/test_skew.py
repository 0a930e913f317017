"""Salted aggregation must equal plain groupBy exactly (algebraic
aggregates re-combine losslessly)."""

from __future__ import annotations

import pyspark.sql.functions as F

from decision_tree_analytics_spark.operators.skew import salted_agg
from decision_tree_analytics_spark.sources.tables import load_table


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = (
        ev.groupBy("event_type")
        .agg(
            F.sum("value").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        {
            "s": ("value", "sum"),
            "c": ("value", "count"),
            "mn": ("value", "min"),
            "mx": ("value", "max"),
        },
        n_salts=8,
    ).collect()
    norm = lambda rows: sorted(
        (r.event_type, round(r.s, 6), r.c, r.mn, r.mx) for r in rows
    )
    assert norm(salted) == norm(plain)


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    import pytest

    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        salted_agg(ev, ["event_type"], {"a": ("value", "avg")})
