"""Pure-Python replay checks for the round-8 operators — each query's
statistic recomputed with plain Python/numpy on the collected (bounded)
inputs, mirroring test_graph.py's Python-BFS equality pattern.  The
oracle suite proves cross-engine agreement; these prove the statistic
is the TEXTBOOK one, not merely the same wrong number twice."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from decision_tree_analytics_spark.operators.graph import (
    SP_COST_SCALE,
    _trade_edges,
    graph_closeness,
)
from decision_tree_analytics_spark.operators.stats_ext import (
    US_PER_DAY,
    ml_brier_decomposition,
    ml_mcc_kappa,
    rel_changepoint,
    rel_gini,
    rel_theil_sen,
)
from decision_tree_analytics_spark.operators.source_io import src_schema_merge
from decision_tree_analytics_spark.sources.tables import load_table


def _daily_cents(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        F.expr(f"(ts div 1000) div {US_PER_DAY}").alias("day"),
        F.floor(F.col("value") * 100 + 0.5).alias("cents"),
    )
    pdf = (
        e.groupBy("day")
        .agg(F.sum("cents").cast("long").alias("y"))
        .orderBy("day")
        .toPandas()
    )
    return pdf["day"].to_numpy(), pdf["y"].to_numpy()


def test_gini_matches_textbook_formula(spark, sf_dir):
    out = {r["c_mktsegment"]: r for r in rel_gini(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.floor(F.col("o_totalprice") * 100 + 0.5).alias("cents")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum("cents").alias("spend"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "spend")
        .toPandas()
    )
    for seg, g in spend.groupby("c_mktsegment"):
        x = np.sort(g["spend"].to_numpy().astype(float))
        n = len(x)
        gini = 2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (n + 1) / n
        assert 0.0 <= out[seg]["gini"] < 1.0
        assert abs(out[seg]["gini"] - gini) < 1e-5, seg
        assert out[seg]["n_customers"] == n


def test_theil_sen_matches_numpy_median_of_slopes(spark, sf_dir):
    row = rel_theil_sen(spark, sf_dir).collect()[0]
    days, y = _daily_cents(spark, sf_dir)
    x = (days - days.min()).astype(float)
    slopes = [
        (y[j] - y[i]) / (x[j] - x[i])
        for i in range(len(x))
        for j in range(i + 1, len(x))
    ]
    assert row["n_pairs"] == len(slopes)
    assert abs(row["ts_slope_cents_per_day"] - float(np.median(slopes))) < 1e-5
    resid = y - np.median(slopes) * x
    assert abs(row["ts_intercept_cents"] - float(np.median(resid))) < 1.0


def test_changepoint_matches_bruteforce_argmax(spark, sf_dir):
    row = rel_changepoint(spark, sf_dir).collect()[0]
    days, y = _daily_cents(spark, sf_dir)
    yd = y / 100.0  # dollars
    nd = len(yd)
    best = max(
        (
            (k * (nd - k) / nd) * (yd[:k].mean() - yd[k:].mean()) ** 2
            for k in range(1, nd)
        ),
    )
    got_k = row["n_left"]
    score = (got_k * (nd - got_k) / nd) * (
        yd[:got_k].mean() - yd[got_k:].mean()
    ) ** 2
    assert abs(score - best) < 1e-6 * max(1.0, best)
    assert row["n_left"] + row["n_right"] == nd
    assert abs(row["gap_score"] - best) < 0.02


def test_mcc_kappa_match_hand_formulas(spark, sf_dir):
    row = ml_mcc_kappa(spark, sf_dir).collect()[0]
    n, tp, fp, fn, tn = row["n"], row["tp"], row["fp"], row["fn"], row["tn"]
    assert tp + fp + fn + tn == n
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    po = (tp + tn) / n
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert abs(row["mcc"] - mcc) < 1e-5
    assert abs(row["kappa"] - kappa) < 1e-5
    assert -1.0 <= row["mcc"] <= 1.0 and -1.0 <= row["kappa"] <= 1.0


def test_brier_decomposition_identity_and_direct_mean(spark, sf_dir):
    row = ml_brier_decomposition(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.floor(F.col("l_discount") * 100 + 0.5) / 10.0).alias("s"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("y"),
    ).toPandas()
    direct = float(((li["s"] - li["y"]) ** 2).mean())
    assert abs(row["brier"] - direct) < 1e-5
    # Murphy identity holds up to the reported within-bin residual
    assert (
        abs(
            row["brier"]
            - (row["reliability"] - row["resolution"] + row["uncertainty"])
            - row["decomp_gap"]
        )
        < 1e-5
    )
    assert row["reliability"] >= 0 and row["resolution"] >= 0
    assert 0 <= row["uncertainty"] <= 0.25


def _dijkstra(adj, src):
    import heapq

    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):  # undirected: adj carries both ways
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_closeness_matches_python_dijkstra(spark, sf_dir):
    out = {r["nation"]: r for r in graph_closeness(spark, sf_dir).collect()}
    edges = (
        _trade_edges(spark, sf_dir)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "weight",
        )
        .groupBy("a", "b")
        .agg(F.sum("weight").alias("w"))
        .collect()
    )
    adj: dict[str, list[tuple[str, int]]] = {}
    for r in edges:
        c = max(int(math.floor(SP_COST_SCALE / r["w"] + 0.5)), 1)
        adj.setdefault(r["a"], []).append((r["b"], c))
        adj.setdefault(r["b"], []).append((r["a"], c))
    for src in adj:
        dist = _dijkstra(adj, src)
        reach = {t: d for t, d in dist.items() if t != src}
        assert out[src]["n_reach"] == len(reach)
        assert out[src]["sum_dist_micro"] == sum(reach.values())
        assert out[src]["harmonic_micro"] == sum(
            10**12 // d for d in reach.values()
        )


def test_schema_merge_buckets_by_writer_generation(spark, sf_dir):
    rows = {r["segment"]: r for r in src_schema_merge(spark, sf_dir).collect()}
    c = load_table(spark, sf_dir, "customer")
    n_even = c.filter(F.col("c_custkey") % 2 == 0).count()
    pre = rows["<pre-evolution>"]
    assert pre["n_customers"] == n_even
    assert pre["min_key"] % 2 == 0 and pre["max_key"] % 2 == 0
    # every evolved segment holds odd keys only
    for seg, r in rows.items():
        if seg != "<pre-evolution>":
            assert r["min_key"] % 2 == 1 and r["max_key"] % 2 == 1
