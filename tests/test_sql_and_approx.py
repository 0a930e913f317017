"""SQL entry-point parity + approx-distinct tolerance (SURVEY Q14's
5%-of-exact contract, which hash-matching can't express)."""

from __future__ import annotations

from decision_tree_analytics_spark.operators.relational import (
    q11_hash_agg,
    q12_distinct_agg,
    q14_approx_distinct,
)
from decision_tree_analytics_spark.sql import run_sql


def test_sql_surface_matches_dataframe_plan(spark, sf_dir):
    sql_rows = run_sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               AVG(l_extendedprice) AS avg_price,
               COUNT(*) AS cnt_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
    ).collect()
    df_rows = q11_hash_agg(spark, sf_dir).collect()
    norm = lambda rows: sorted(
        (r.l_returnflag, r.l_linestatus, round(r.sum_qty, 6), round(r.avg_price, 6), r.cnt_order)
        for r in rows
    )
    assert norm(sql_rows) == norm(df_rows)


def test_approx_distinct_within_5pct(spark, sf_dir):
    exact = {r.event_type: r.uniq_users for r in q12_distinct_agg(spark, sf_dir).collect()}
    approx = {
        r.event_type: r.approx_uniq_users
        for r in q14_approx_distinct(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(1, 0.05 * ex), (k, ex, approx[k])


def test_approx_quantile_within_1pct(spark, sf_dir):
    import pyspark.sql.functions as F

    from decision_tree_analytics_spark.operators.relational import (
        rel_approx_quantile,
    )
    from decision_tree_analytics_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.pcts
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.5, 0.95, 0.99))"
            ).alias("pcts")
        )
        .collect()
    }
    approx = {
        r.l_returnflag: (r.p50, r.p95, r.p99)
        for r in rel_approx_quantile(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, ex in exact.items():
        for e, a in zip(ex, approx[flag]):
            assert abs(a - e) <= 0.01 * abs(e) + 1e-9, (flag, e, a)


def test_histogram_quantile_within_one_bin(spark, sf_dir):
    """The 128-bin sketch's p50/p90/p99 must sit within one bin width
    of the exact DISCRETE quantile (the sketch reports the upper edge
    of the bin where cumulative mass crosses q, i.e. percentile_disc
    semantics — interpolated percentiles can sit several empty bins
    lower in sparse tails)."""
    import math

    import pyspark.sql.functions as F

    from decision_tree_analytics_spark.operators.relational import (
        HIST_BINS,
        rel_histogram_quantile,
    )
    from decision_tree_analytics_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vals = {
        r.event_type: sorted(r.vs)
        for r in ev.groupBy("event_type")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    }
    for r in rel_histogram_quantile(spark, sf_dir).collect():
        vs = vals[r.event_type]
        bin_w = (vs[-1] - vs[0]) / HIST_BINS
        for est, q in zip((r.p50_est, r.p90_est, r.p99_est), (0.5, 0.9, 0.99)):
            disc = vs[max(math.ceil(q * len(vs)) - 1, 0)]
            assert abs(est - disc) <= bin_w + 1e-9, (r.event_type, est, disc)


def test_kmv_estimate_tracks_exact_distinct(spark, sf_dir):
    """KMV(64) per-group distinct estimate within ~3/sqrt(K) of exact
    (and exact when the group has < K distinct users)."""
    import pyspark.sql.functions as F

    from decision_tree_analytics_spark.operators.relational import (
        KMV_K,
        rel_kmv_distinct,
    )
    from decision_tree_analytics_spark.sources.tables import load_table

    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rel_kmv_distinct(spark, sf_dir).collect():
        ex = exact[r.event_type]
        if ex < KMV_K:
            assert r.est_distinct == ex, (r.event_type, ex, r.est_distinct)
        else:
            assert abs(r.est_distinct - ex) <= 3 / KMV_K**0.5 * ex + 1e-9, (
                r.event_type,
                ex,
                r.est_distinct,
            )


def test_secondary_sort_carry_survives_tiny_arrow_batches(spark, sf_dir):
    """Force 7-row Arrow batches so nearly every user group straddles
    a batch boundary — the carry logic must still produce exactly the
    window-equivalent answer."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from decision_tree_analytics_spark.operators.udf_inventory import (
        udf_secondary_sort,
    )
    from decision_tree_analytics_spark.sources.tables import load_table

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    saved = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")
        got = {
            r.user_id: (r.n_events, r.n_increases)
            for r in udf_secondary_sort(spark, sf_dir).collect()
        }
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.expr("ts div 1000"), "event_id")
    exp = {
        r.user_id: (r.n, r.inc)
        for r in ev.withColumn("pv", F.lag("value").over(w))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("pv").isNotNull() & (F.col("value") > F.col("pv")), 1
                ).otherwise(0)
            ).alias("inc"),
        )
        .collect()
    }
    assert got == exp


def test_kmv_setops_estimates_track_exact(spark, sf_dir):
    """Union/intersection estimates within ~4/sqrt(K) relative error
    of the exact set cardinalities (exact when both sketches kept
    everything, i.e. theta == 1)."""
    import pyspark.sql.functions as F

    from decision_tree_analytics_spark.operators.relational import (
        KMV_K,
        rel_kmv_setops,
    )
    from decision_tree_analytics_spark.sources.tables import load_table

    d = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    sets = {
        t: {r.user_id for r in rows}
        for t, rows in (
            (r.event_type, d.filter(F.col("event_type") == r.event_type)
             .select("user_id").collect())
            for r in d.select("event_type").distinct().collect()
        )
    }
    tol = 4 / KMV_K**0.5
    for r in rel_kmv_setops(spark, sf_dir).collect():
        a, b = sets[r.type_a], sets[r.type_b]
        ex_u, ex_i = len(a | b), len(a & b)
        assert abs(r.est_union - ex_u) <= tol * ex_u + 1e-9, (
            r.type_a, r.type_b, ex_u, r.est_union)
        assert abs(r.est_inter - ex_i) <= tol * max(ex_i, ex_u / 4) + 1e-9, (
            r.type_a, r.type_b, ex_i, r.est_inter)


def test_countmin_never_underestimates_and_is_tight_here(spark, sf_dir):
    """The CMS guarantee: est >= exact for every probe (a min of
    counters each of which includes the token's own contributions).
    At this corpus/width (w=1024 >> distinct tokens' collision mass)
    the over-count should also stay small relative to the stream."""
    from decision_tree_analytics_spark.operators.relational import (
        rel_countmin_sketch,
    )

    rows = rel_countmin_sketch(spark, sf_dir).collect()
    assert rows, "probe set must be non-empty at every SF"
    for r in rows:
        assert r.est >= r.n_exact, (r.tok, r.n_exact, r.est)
        assert r.overcount == r.est - r.n_exact
    # sanity: the sketch is not saturated — median rel_err under 100%
    errs = sorted(r.rel_err for r in rows)
    assert errs[len(errs) // 2] < 1.0


def test_entity_snm_finds_planted_near_miss(spark, tmp_path):
    """A one-edit name variant planted next to a frequent name must
    surface as a (dist=1) pair with the right per-name row counts and
    canonical keys; an unrelated name (different 2-char block) must
    not pair with it."""
    import pyspark.sql.functions as F  # noqa: F401

    from decision_tree_analytics_spark.operators.relational import (
        rel_entity_snm,
    )

    rows = [
        (1, "blue widget", "Brand#1", "T", 1, 1.0),
        (2, "blue widget", "Brand#1", "T", 1, 1.0),
        (3, "blue widgex", "Brand#1", "T", 1, 1.0),  # 1 edit away
        (4, "red gear", "Brand#1", "T", 1, 1.0),     # different block
    ]
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/part.parquet")
    out = rel_entity_snm(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.a_name, r.b_name, r.dist) == ("blue widget", "blue widgex", 1)
    assert (r.a_rows, r.b_rows) == (2, 1)
    assert (r.a_key, r.b_key) == (1, 3)


def test_hll_estimate_tracks_exact_distinct(spark, sf_dir):
    """The HLL estimate must land within the m=512 error envelope of
    the exact distinct count for every event_type, use at most m
    registers, and report a rel_err consistent with its own columns."""
    import pytest

    from decision_tree_analytics_spark.operators.relational import (
        HLL_M,
        rel_hll_sketch,
    )

    rows = rel_hll_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_hit <= HLL_M
        assert r.n_hit <= r.n_exact
        # 1.04/sqrt(512) ~ 4.6% asymptotic; linear counting is tighter
        # at small cardinality.  3-sigma-ish envelope:
        assert r.rel_err <= 0.15, (r.event_type, r.rel_err)
        assert abs(r.est_hll - r.n_exact) / r.n_exact == pytest.approx(
            r.rel_err, abs=1e-6
        )
