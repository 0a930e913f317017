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


def test_hot_salted_join_equals_plain(spark, sf_dir):
    """hot_salted_join must equal the plain key join exactly, while
    replicating ONLY the hot keys' dim rows — the bounded-broadcast,
    bounded-replication form of skew mitigation."""
    from decision_tree_analytics_spark.operators.skew import hot_salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_events"))
    hot = dim.filter(F.col("user_events") >= 67).select("user_id")
    n_hot = hot.count()
    assert n_hot > 0  # non-vacuous: the fixture has heavy users
    fact = ev.select("event_id", "user_id", "event_type")
    joined = hot_salted_join(
        fact, dim, "user_id", hot, F.col("event_id"), n_salts=8
    )
    plain = fact.join(dim, "user_id")
    cols = sorted(plain.columns)
    assert joined.select(*cols).exceptAll(plain.select(*cols)).count() == 0
    assert plain.select(*cols).exceptAll(joined.select(*cols)).count() == 0
    assert joined.count() == plain.count()


def test_hot_salted_join_replicates_only_hot_keys(spark, sf_dir):
    """The salted dim side carries dim + (n_salts-1) x |hot| rows —
    never O(|dim| x n_salts) — and hot facts really spread over
    multiple salts."""
    from decision_tree_analytics_spark.operators.skew import hot_salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_events"))
    hot = dim.filter(F.col("user_events") >= 67).select("user_id")
    n_dim, n_hot, n_salts = dim.count(), hot.count(), 8
    # Reproduce the dim-side expansion exactly as the combinator does.
    hot_b = F.broadcast(hot.withColumn("__hot__", F.lit(True)))
    d = dim.join(hot_b, "user_id", "left").withColumn(
        "__salt__",
        F.explode(
            F.sequence(
                F.lit(0),
                F.when(F.col("__hot__"), F.lit(n_salts - 1)).otherwise(
                    F.lit(0)
                ),
            )
        ),
    )
    assert d.count() == n_dim + (n_salts - 1) * n_hot
    # Hot facts spread: a hot user's joined rows occupy >1 salt.
    fact = ev.select("event_id", "user_id", "event_type")
    joined = hot_salted_join(
        fact, dim, "user_id", hot, F.col("event_id"), n_salts=n_salts
    )
    one_hot = hot.limit(1).collect()[0][0]
    spread = (
        fact.filter(F.col("user_id") == one_hot)
        .select(F.pmod("event_id", F.lit(n_salts)).alias("s"))
        .distinct()
        .count()
    )
    assert spread > 1
    assert (
        joined.filter(F.col("user_id") == one_hot).count()
        == fact.filter(F.col("user_id") == one_hot).count()
    )


def test_hot_salted_join_property_fuzz(spark):
    """Property lock over tiny synthetic frames: for ANY fact/dim key
    multiset, ANY hot set (empty, duplicated, containing keys absent
    from the dim or the fact), and ANY n_salts >= 1, hot_salted_join
    equals the plain inner join exactly."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from decision_tree_analytics_spark.operators.skew import hot_salted_join

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        fact_keys=st.lists(st.integers(0, 5), max_size=20),
        dim_keys=st.sets(st.integers(0, 5)),
        hot=st.lists(st.integers(0, 7), max_size=6),
        n_salts=st.integers(1, 5),
    )
    def check(fact_keys, dim_keys, hot, n_salts):
        fact = spark.createDataFrame(
            [(i, k) for i, k in enumerate(fact_keys)], "event_id long, k long"
        )
        dim = spark.createDataFrame(
            [(k, k * 10) for k in dim_keys], "k long, v long"
        )
        hot_df = spark.createDataFrame([(k,) for k in hot], "k long")
        got = hot_salted_join(
            fact, dim, "k", hot_df, F.col("event_id"), n_salts
        )
        cols = sorted(got.columns)
        want = fact.join(dim, "k").select(*cols)
        assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
            map(tuple, want.collect())
        )

    check()


def test_hot_salted_join_plan_hot_tag_stays_broadcast(spark, sf_dir):
    """With auto-broadcast disabled on both planner paths (the 100 TB
    regime: the dim no longer broadcasts), the hotness tagging must
    STILL be broadcast joins (the explicit hint on the bounded hot set
    overrides the thresholds) and the main join must shuffle on the
    salted key — never a broadcast of the full dim, never an extra
    exchange for the tagging."""
    from decision_tree_analytics_spark.operators.skew import hot_salted_join
    from decision_tree_analytics_spark.plans.inspect import simple_plan

    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        ev = load_table(spark, sf_dir, "events")
        dim = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("user_events")
        )
        hot = dim.filter(F.col("user_events") >= 67).select("user_id")
        fact = ev.select("event_id", "user_id", "event_type")
        plan = simple_plan(
            hot_salted_join(
                fact, dim, "user_id", hot, F.col("event_id"), 8
            )
        )
    finally:
        for k, v in saved.items():
            # unset, don't skip: leaving '-1' behind on a conf whose
            # saved value was None would disable AQE broadcast
            # conversion for every later test in the shared session.
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
    # Exactly the two hot-tag joins are broadcast; the salted main
    # join is a shuffle join (SortMergeJoin) on (user_id, __salt__).
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" in plan, plan
    assert plan.count("BroadcastExchange") == 2, plan


def test_hot_salted_join_null_fact_salt_keeps_rows(spark):
    """A NULL fact_salt source on a HOT key must land on salt 0, not
    become a NULL join key that silently drops the row (review
    finding): the function is documented to equal the plain join
    exactly, and equi-joins never match NULL."""
    from decision_tree_analytics_spark.operators.skew import hot_salted_join

    fact = spark.createDataFrame(
        [(1, 10), (None, 10), (2, 20), (None, 20)],
        "event_id long, k long",
    )
    dim = spark.createDataFrame([(10, 100), (20, 200)], "k long, v long")
    hot = spark.createDataFrame([(10,)], "k long")
    got = hot_salted_join(fact, dim, "k", hot, F.col("event_id"), 8)
    cols = sorted(got.columns)
    plain = fact.join(dim, "k").select(*cols)
    rows = lambda df: sorted(
        (tuple(r) for r in df.select(*cols).collect()), key=repr
    )
    assert rows(got) == rows(plain)
    assert got.count() == 4  # the two null-salt rows survive
