"""Round-12 candidate operators (operators/pending_r12.py) — full
oracle verification plus one structural invariant each, run NOW so
r12 can register them into its fresh slots already proven.  They are
deliberately NOT in the contract yet (see the module docstring for
the r11 window math)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from decision_tree_analytics_spark.operators.pending_r12 import (
    PENDING_ORACLES,
    PENDING_QUERIES,
    REJ_THRESHOLD_PPM,
    VACUUM_GENS,
    VACUUM_KEEP,
)
from tests.oracle_harness import compare


def test_pending_queries_match_oracles(spark, sf_dir, oracle_con):
    assert set(PENDING_QUERIES) == set(PENDING_ORACLES)
    for name, fn in sorted(PENDING_QUERIES.items()):
        compare(fn(spark, sf_dir), oracle_con, PENDING_ORACLES[name], name)


def test_pending_plan_shapes(spark, sf_dir):
    """Plan locks, pre-staged for the r12 registration: the quantile
    grid is ONE corpus exchange (stack + argmin window run on the
    |event_type|x25 aggregate — the Generate is the stack, not a
    corpus explode); DiD is one corpus rollup + the 20-cell pivot
    (bounds broadcast); rejection sampling shares one
    hashpartitioning(prompt_id) between the window and the pool
    groupBy (the preference-pairs shape)."""

    def plan(name):
        df = PENDING_QUERIES[name](spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan("ml_quantile_reg")
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Generate") == 1  # the stack, post-aggregate
    p = plan("rel_did")
    assert p.count("Exchange hashpartitioning") == 2
    assert p.count("BroadcastExchange") == 1  # the split-day scalar
    p = plan("ns_rejection_sample")
    assert p.count("Exchange hashpartitioning") == 2
    # Vacuum planner: the persisted reference table feeds BOTH
    # aggregation branches from the cache — count InMemoryTableScan,
    # never "Scan parquet" substrings (a persisted sub-plan's text
    # repeats its child FileScan under every InMemoryRelation print).
    p = plan("snap_vacuum_plan")
    assert p.count("InMemoryTableScan") == 2


_CLUSTER_DRIVER = r"""
import os, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo_tests!r})
os.environ["PYSPARK_PYTHON"] = sys.executable
os.environ["PYSPARK_DRIVER_PYTHON"] = sys.executable
os.environ["PYTHONPATH"] = {repo!r} + os.pathsep + os.environ.get("PYTHONPATH", "")
from pyspark.sql import SparkSession
from tests.oracle_harness import compare, duckdb_connection
from decision_tree_analytics_spark.operators.pending_r12 import (
    PENDING_ORACLES,
    PENDING_QUERIES,
)

spark = (
    SparkSession.builder.master("local-cluster[2,4,2048]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.executorEnv.PYTHONPATH", {repo!r})
    .getOrCreate()
)
con = duckdb_connection({sf!r})
for name in sorted(PENDING_QUERIES):
    compare(PENDING_QUERIES[name](spark, {sf!r}), con, PENDING_ORACLES[name], name)
    print("CLUSTER-MATCH", name, flush=True)
spark.stop()
print("ALL-OK")
"""


def test_pending_queries_match_on_real_cluster(sf_dir):
    """All five candidates oracle-checked on a REAL 2-JVM
    local-cluster — pre-staging the multi-JVM evidence their r12
    cluster-suite entries will claim (vacuum's persisted refs read
    from remote block managers; the quantile grid's stack+window on
    a real exchange; DiD's broadcast scalar shipped cross-JVM)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CLUSTER_DRIVER.format(repo=repo, repo_tests=repo, sf=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0 and "ALL-OK" in proc.stdout, (
        f"stdout tail: {proc.stdout[-3000:]}\nstderr tail: {proc.stderr[-3000:]}"
    )
    for name in PENDING_QUERIES:
        assert f"CLUSTER-MATCH {name}" in proc.stdout


def test_rejection_sample_invariants(spark, sf_dir):
    pdf = PENDING_QUERIES["ns_rejection_sample"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf.n_accepted <= pdf.n_prompts).all()
    assert (pdf.acceptance_ppm <= 1_000_000).all()
    # Every accepted prompt's best reward clears the bar, so the
    # accepted mean must too (NaN rows = sources with 0 accepted).
    m = pdf.mean_accepted_reward_ppm.dropna()
    assert (m >= REJ_THRESHOLD_PPM).all()
    # Selection can only lift quality: advantage is non-negative.
    assert (pdf.mean_advantage_ppm >= 0).all()


def test_vacuum_plan_invariants(spark, sf_dir):
    pdf = (
        PENDING_QUERIES["snap_vacuum_plan"](spark, sf_dir)
        .toPandas()
        .sort_values("gen")
        .reset_index(drop=True)
    )
    assert list(pdf.gen) == list(range(VACUUM_GENS))
    # Retention policy: exactly the last VACUUM_KEEP generations are
    # live; nothing they reference may be reclaimed.
    assert (pdf.vacuumable == (pdf.gen < VACUUM_GENS - VACUUM_KEEP)).all()
    live = pdf[pdf.vacuumable == 0]
    assert (
        pdf.cum_bytes_reclaimed.iloc[-1]
        == pdf[pdf.vacuumable == 1].bytes_last_ref.sum()
    )
    # A live generation's expiry bytes never enter the reclaim total.
    assert (
        pdf.cum_bytes_reclaimed.diff().fillna(pdf.cum_bytes_reclaimed.iloc[0])[
            live.index
        ]
        == 0
    ).all()
    # Conservation: every file has exactly one last reference.
    from decision_tree_analytics_spark.operators.cdc import (
        _order_layout_manifest,
    )

    n_files = (
        _order_layout_manifest(spark, sf_dir)
        .filter(F.col("layout") == "clustered")
        .count()
    )
    assert pdf.n_files_last_ref.sum() == n_files
    # cum is monotone non-decreasing.
    assert (pdf.cum_bytes_reclaimed.diff().dropna() >= 0).all()


def test_quantile_reg_is_grid_argmin(spark, sf_dir):
    """The winner per event type must beat every other grid point —
    recomputed independently in pandas from the raw rows."""
    import math

    from decision_tree_analytics_spark.operators.pending_r12 import (
        QREG_COMBOS,
    )
    from decision_tree_analytics_spark.sources.tables import load_table

    got = PENDING_QUERIES["ml_quantile_reg"](spark, sf_dir).toPandas()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).alias("y"),
            F.expr("((ts div 1000) div 3600000000) % 24").alias("h"),
        )
        .toPandas()
    )
    for _, row in got.iterrows():
        sub = ev[ev.event_type == row.event_type]
        losses = {}
        for a, b in QREG_COMBOS:
            yhat = a + b * sub.h
            r = sub.y - yhat
            losses[(a, b)] = int((r.where(r > 0, 0) * 9 - r.where(r <= 0, 0)).sum())
        best = min(losses.items(), key=lambda kv: (kv[1], kv[0]))
        assert (row.intercept_cents, row.slope_cents) == best[0]
        assert row.loss10 == best[1]
        # q=0.9 sanity: the fitted line over-predicts far more often
        # than it under-predicts (at least half the rows sit at or
        # under it even on a coarse grid).
        yhat = row.intercept_cents + row.slope_cents * sub.h
        assert (sub.y <= yhat).mean() >= 0.5 or math.isnan(row.loss10)


def test_mann_kendall_matches_replay(spark, sf_dir):
    from decision_tree_analytics_spark.sources.tables import load_table

    got = (
        PENDING_QUERIES["rel_mann_kendall"](spark, sf_dir)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("x"))
        .toPandas()
    )
    for et, g in daily.groupby("event_type"):
        xs = list(g.sort_values("day").x)
        n = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        assert got.loc[et, "n_days"] == n
        assert got.loc[et, "s_stat"] == s
        assert got.loc[et, "var18"] == n * (n - 1) * (2 * n + 5)
        assert abs(got.loc[et, "trend_ppm"]) <= 1_000_000


def test_video_frame_plan_matches_replay(spark, sf_dir):
    """Pure-Python GOP/byte-offset replay over every clip: the plan's
    closed-form offsets must equal a frame-by-frame walk of the
    modeled stream (I-frame at each GOP head, P-frames between)."""
    pdf = (
        PENDING_QUERIES["mm_video_frame_plan"](spark, sf_dir)
        .toPandas()
        .sort_values(["doc_id", "k"])
    )
    assert len(pdf) > 0
    from decision_tree_analytics_spark.operators.pending_r12 import (
        VIDEO_HEADER_BYTES,
    )

    for doc_id, g in pdf.groupby("doc_id"):
        fps = 24 + (doc_id % 3) * 3
        dur = doc_id % 19 + 2
        gop = 12 + (doc_id % 2) * 3
        pixels = 1280 * 720 if doc_id % 2 == 0 else 640 * 360
        n_frames = fps * dur
        i_b, p_b = pixels // 2, pixels // 10
        # Walk the stream frame by frame, recording each GOP head.
        offsets, off = [], VIDEO_HEADER_BYTES
        for idx in range(n_frames):
            if idx % gop == 0:
                offsets.append(off)
            off += i_b if idx % gop == 0 else p_b
        assert list(g.byte_offset) == offsets
        assert list(g.frame_idx) == [k * gop for k in range(len(offsets))]
        assert list(g.ts_us) == [
            k * gop * 1_000_000 // fps for k in range(len(offsets))
        ]
        assert g.gop_len.sum() == n_frames  # GOPs tile the clip exactly
        assert list(g.is_last)[-1] == 1 and sum(g.is_last) == 1


def test_hodges_lehmann_matches_replay(spark, sf_dir):
    from decision_tree_analytics_spark.sources.tables import load_table

    got = (
        PENDING_QUERIES["rel_hodges_lehmann"](spark, sf_dir)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),"
                " 16, 10) AS BIGINT) % 2"
            ).alias("arm"),
            F.expr("(ts div 1000) div 86400000000").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).alias("cents"),
        )
        .groupBy("event_type", "arm", "day")
        .agg(F.sum("cents").alias("x"))
        .toPandas()
    )
    for et, g in daily.groupby("event_type"):
        ts = g[g.arm == 1]
        cs = g[g.arm == 0]
        diffs = sorted(
            int(xt) - int(xc) for xt in ts.x for xc in cs.x
        )
        n = len(diffs)
        if n == 0:
            assert et not in got.index
            continue
        lo, hi = diffs[(n + 1) // 2 - 1], diffs[n // 2]
        import math

        want = math.floor(((lo + hi) / 2) * 100 + 0.5) / 100
        assert got.loc[et, "n_pairs"] == n
        assert got.loc[et, "hl_shift_cents"] == want


def test_did_matches_pandas_replay(spark, sf_dir):
    from decision_tree_analytics_spark.sources.tables import load_table

    got = (
        PENDING_QUERIES["rel_did"](spark, sf_dir)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),"
                " 16, 10) AS BIGINT) % 2"
            ).alias("arm"),
            F.expr("(ts div 1000) div 86400000000").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).alias("cents"),
        )
        .toPandas()
    )
    split = (rows.day.min() + rows.day.max() + 1) // 2
    rows["post"] = (rows.day >= split).astype(int)

    def mean_micro(sub):
        return int(sub.cents.sum()) * 10_000 // len(sub) if len(sub) else None

    for et, g in rows.groupby("event_type"):
        cells = {
            (a, p): mean_micro(g[(g.arm == a) & (g.post == p)])
            for a in (0, 1)
            for p in (0, 1)
        }
        want = (cells[(1, 1)] - cells[(1, 0)]) - (
            cells[(0, 1)] - cells[(0, 0)]
        )
        assert got.loc[et, "did_micro"] == want
        assert got.loc[et, "pre_ctrl_micro"] == cells[(0, 0)]
