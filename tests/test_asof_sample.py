"""As-of join and stratified sampling — semantics and plan shape.

The DuckDB oracles pin cross-engine values; these tests pin the
properties the oracles can't see: the as-of join must not BE a join
(union + one window), and the sampler must be deterministic and
map-only.
"""

from __future__ import annotations

from decision_tree_analytics_spark.operators.relational import (
    SAMPLE_KEEP,
    SAMPLE_MOD,
    rel_asof_join,
    rel_stratified_sample,
    stratified_sample_rows,
)
from decision_tree_analytics_spark.plans.inspect import (
    count_shuffles,
    simple_plan,
)


def test_asof_is_one_shuffle_and_no_join(spark, sf_dir):
    plan = simple_plan(rel_asof_join(spark, sf_dir))
    assert "Join" not in plan  # union + window, not an equi-join
    assert count_shuffles(plan) == 1  # the user_id hashpartitioning
    assert "hashpartitioning(user_id" in plan


def test_asof_semantics(spark, sf_dir):
    rows = rel_asof_join(spark, sf_dir).collect()
    assert rows, "no purchases in fixture?"
    matched = [r for r in rows if r.view_event_id is not None]
    assert matched, "no purchase has a prior view?"
    for r in matched[:200]:
        assert r.view_us <= r.purchase_us  # never a future view
    # every purchase appears exactly once (left as-of, no fan-out)
    ids = [r.purchase_event_id for r in rows]
    assert len(ids) == len(set(ids))


def test_stratified_sample_rows_is_map_only_and_deterministic(spark, sf_dir):
    df = stratified_sample_rows(spark, sf_dir)
    assert count_shuffles(simple_plan(df)) == 0  # pure scan+filter
    a = sorted(r.event_id for r in df.select("event_id").collect())
    b = sorted(r.event_id for r in stratified_sample_rows(spark, sf_dir)
               .select("event_id").collect())
    assert a == b  # resampling yields the identical subset
    # rate sanity: ~KEEP/MOD of the table, well away from 0 and 1
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    rate = len(a) / total
    expect = SAMPLE_KEEP / SAMPLE_MOD
    assert abs(rate - expect) < 0.05, rate


def test_stratified_sample_agg_matches_row_sample(spark, sf_dir):
    per_stratum = {
        r.event_type: r.n_sampled
        for r in rel_stratified_sample(spark, sf_dir).collect()
    }
    from collections import Counter

    raw = Counter(
        r.event_type
        for r in stratified_sample_rows(spark, sf_dir).select("event_type").collect()
    )
    assert per_stratum == dict(raw)
