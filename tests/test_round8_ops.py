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


def test_learning_curve_matches_numpy_per_fraction(spark, sf_dir):
    import hashlib

    from decision_tree_analytics_spark.operators.stats_ext import (
        LC_BUCKETS,
        ml_learning_curve,
    )

    rows = {
        r["frac_16ths"]: r for r in ml_learning_curve(spark, sf_dir).collect()
    }
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("long").alias("x"),
            F.floor(F.col("l_extendedprice") + 0.5).alias("y"),
        )
        .toPandas()
    )
    li["bucket"] = [
        int(hashlib.md5(f"{o}-{l}".encode()).hexdigest()[:8], 16) % LC_BUCKETS
        for o, l in zip(li["l_orderkey"], li["l_linenumber"])
    ]
    test = li[li["bucket"] == LC_BUCKETS - 1]
    assert len(rows) == LC_BUCKETS - 1
    prev_n = 0
    for k in (1, 8, LC_BUCKETS - 1):
        train = li[li["bucket"] < k]
        b, a = np.polyfit(
            train["x"].to_numpy(float), train["y"].to_numpy(float), 1
        )
        mse = float(
            ((test["y"] - (a + b * test["x"])) ** 2).mean()
        )
        assert rows[k]["n_train"] == len(train)
        assert abs(rows[k]["slope"] - b) < 1e-3
        assert abs(rows[k]["intercept"] - a) < 1.0
        assert abs(rows[k]["test_mse"] - mse) < 1e-3 * max(1.0, mse)
    for k in sorted(rows):
        assert rows[k]["n_train"] > prev_n
        prev_n = rows[k]["n_train"]


def test_kcore_converged_and_matches_python_peel(spark, sf_dir):
    from decision_tree_analytics_spark.operators.graph import (
        KCORE_K,
        graph_kcore,
    )

    out = {r["nation"]: r["core_degree"] for r in graph_kcore(spark, sf_dir).collect()}
    edges = (
        _trade_edges(spark, sf_dir)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .collect()
    )
    adj: dict[str, set[str]] = {}
    for r in edges:
        adj.setdefault(r["a"], set()).add(r["b"])
        adj.setdefault(r["b"], set()).add(r["a"])
    # python peel to the FIXED POINT (not a round cap)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < KCORE_K}
        if not drop:
            break
        alive -= drop
    expect = {v: len(adj[v] & alive) for v in alive}
    assert out == expect  # fixed rounds reached the true k-core


def test_funnel_latency_matches_pandas_replay(spark, sf_dir):
    from decision_tree_analytics_spark.operators.relational import (
        rel_funnel_latency,
    )

    row = rel_funnel_latency(spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.expr("ts div 1000").alias("t"))
        .toPandas()
    )
    lat = []
    for _, g in ev.groupby("user_id"):
        s = g.loc[g["event_type"] == "signup", "t"]
        if s.empty:
            continue
        t0 = s.min()
        p = g.loc[(g["event_type"] == "purchase") & (g["t"] > t0), "t"]
        if not p.empty:
            lat.append(int(p.min() - t0))
    assert row["n_converted"] == len(lat)
    assert row["min_us"] == min(lat) and row["max_us"] == max(lat)
    assert abs(row["p50_us"] - float(np.percentile(lat, 50))) < 1.0


def test_threshold_tuning_best_flag_is_argmax_f1(spark, sf_dir):
    from decision_tree_analytics_spark.operators.stats_ext import (
        ml_threshold_tuning,
    )

    rows = ml_threshold_tuning(spark, sf_dir).collect()
    assert len(rows) == 11
    assert sum(r["is_best"] for r in rows) == 1
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == rows[0]["tp"] + rows[0][
            "fp"
        ] + rows[0]["fn"] + rows[0]["tn"]
        if r["precision"] is not None and r["recall"] is not None:
            pr = r["precision"] + r["recall"]
            if pr > 0 and r["f1"] is not None:
                hm = 2 * r["precision"] * r["recall"] / pr
                assert abs(r["f1"] - hm) < 1e-4
    best = max(rows, key=lambda r: (r["f1"] or -1, -r["thr_m"]))
    flagged = next(r for r in rows if r["is_best"] == 1)
    assert flagged["f1"] == best["f1"]
    # threshold at 0 predicts everything positive: recall = 1
    all_pos = next(r for r in rows if r["thr_m"] == 0)
    assert all_pos["fn"] == 0 and all_pos["recall"] == 1.0


def test_boilerplate_prefix_counts_match_pandas(spark, sf_dir):
    import hashlib

    from decision_tree_analytics_spark.operators.text import (
        BOILERPLATE_PREFIX_TOKENS,
        BOILERPLATE_TOP_K,
        ns_boilerplate_prefix,
    )

    rows = ns_boilerplate_prefix(spark, sf_dir).collect()
    assert 0 < len(rows) <= BOILERPLATE_TOP_K
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    from collections import Counter

    cnt = Counter(
        hashlib.md5(
            " ".join(t.lower().strip().split(" ")[:BOILERPLATE_PREFIX_TOKENS]).encode()
        ).hexdigest()
        for t in docs["text"]
    )
    for r in rows:
        assert cnt[r["prefix_md5"]] == r["n_docs"]
        assert r["is_shared"] == (1 if r["n_docs"] >= 2 else 0)
    # the listing is sorted by shared-ness first
    ns = [r["n_docs"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_embedding_audit_matches_numpy_norms(spark, sf_dir):
    from decision_tree_analytics_spark.operators.similarity import (
        sim_embedding_audit,
    )

    rows = {r["label"]: r for r in sim_embedding_audit(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    for label, g in emb.groupby("label"):
        mat = np.stack(g["embedding"].to_numpy())
        norms = np.sqrt((mat.astype(np.float64) ** 2).sum(axis=1))
        r = rows[label]
        assert r["n_vecs"] == len(g)
        assert r["min_dim"] == r["max_dim"] == mat.shape[1]
        assert r["n_zero"] == int((norms == 0).sum())
        # micro-unit norms within 1 micro of numpy (per-element pico
        # rounding can shift the last digit)
        assert abs(r["min_norm_micro"] - round(norms.min() * 1e6)) <= 2
        assert abs(r["max_norm_micro"] - round(norms.max() * 1e6)) <= 2


def test_code_detect_ratios_match_python(spark, sf_dir):
    import re

    from decision_tree_analytics_spark.operators.text import (
        CODE_SYMBOLS,
        ns_code_detect,
    )

    rows = {r["source"]: r for r in ns_code_detect(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("source", "text").toPandas()
    pat = re.compile(CODE_SYMBOLS)
    dig = re.compile(r"[0-9]")
    for source, g in docs.groupby("source"):
        sym = [
            int(len(pat.findall(t)) / len(t) * 1e6 + 0.5) if len(t) else 0
            for t in g["text"]
        ]
        r = rows[source]
        assert r["n_docs"] == len(g)
        assert r["max_sym_ppm"] == max(sym)
        assert r["mean_sym_ppm"] == int(sum(sym) / len(sym) + 0.5)
        assert all(dig.match("5") for _ in [0])  # sanity of the regex module


def test_csv_malformed_counts_planted_bad_rows(spark, sf_dir):
    from decision_tree_analytics_spark.operators.source_io import (
        N_MALFORMED,
        src_csv_malformed,
    )

    row = src_csv_malformed(spark, sf_dir).collect()[0]
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert row["n_corrupt"] == N_MALFORMED
    assert row["n_good"] == n_orders
    assert row["n_rows"] == n_orders + N_MALFORMED


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    from decision_tree_analytics_spark.operators.stats_ext import (
        ml_bootstrap_ci,
    )

    rows = ml_bootstrap_ci(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # the point estimate sits inside (or at worst at) the 90%-ish CI
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"], r
        # replica means concentrate near the point estimate (CLT):
        # half-width well under 20% of the mean at these n
        assert (r["ci_hi"] - r["ci_lo"]) < 0.4 * r["mean_value"]


def test_hits_scores_are_l1_normalized_and_weight_ranked(spark, sf_dir):
    from decision_tree_analytics_spark.operators.graph import (
        HITS_SCALE,
        graph_hits,
    )

    rows = graph_hits(spark, sf_dir).collect()
    tot_h = sum(r["hub_micro"] for r in rows)
    tot_a = sum(r["auth_micro"] for r in rows)
    # integer-div normalization truncates: sum in (SCALE - n, SCALE]
    assert HITS_SCALE - len(rows) <= tot_h <= HITS_SCALE
    assert HITS_SCALE - len(rows) <= tot_a <= HITS_SCALE
    assert all(r["hub_micro"] >= 0 and r["auth_micro"] >= 0 for r in rows)
    assert max(r["auth_micro"] for r in rows) > HITS_SCALE // len(rows)


def test_span_corruption_spans_stay_in_stratum_and_doc(spark, sf_dir):
    from decision_tree_analytics_spark.operators.text import (
        SPAN_STRATUM,
        ns_span_corruption,
    )

    rows = ns_span_corruption(spark, sf_dir).collect()
    assert rows
    per_doc: dict[int, list] = {}
    for r in rows:
        assert 2 <= r["len_tok"] <= 4
        lo = r["span_id"] * SPAN_STRATUM
        assert lo <= r["start_tok"]
        assert r["start_tok"] + r["len_tok"] <= lo + SPAN_STRATUM  # in stratum
        assert r["start_tok"] + r["len_tok"] <= r["n_tok"]  # in doc
        per_doc.setdefault(r["doc_id"], []).append(r)
    # non-overlapping by construction; ~15% mask rate at mean span 3
    for doc, spans in per_doc.items():
        spans.sort(key=lambda r: r["start_tok"])
        for a, b in zip(spans, spans[1:]):
            assert a["start_tok"] + a["len_tok"] <= b["start_tok"]
    masked = sum(r["len_tok"] for r in rows)
    toks = sum({r["doc_id"]: r["n_tok"] for r in rows}.values())
    assert 0.10 <= masked / toks <= 0.20


def test_audio_chunks_tile_the_clip(spark, sf_dir):
    from decision_tree_analytics_spark.operators.multimodal import (
        mm_audio_chunk_plan,
    )

    rows = mm_audio_chunk_plan(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, chunks in per_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        sr = chunks[0]["sr"]
        hop = sr // 2
        assert all(c["start_sample"] == i * hop for i, c in enumerate(chunks))
        assert chunks[-1]["is_last"] == 1
        assert all(c["n_samp"] <= sr and c["n_samp"] >= hop for c in chunks)
        # full coverage: last chunk reaches the clip end
        end = chunks[-1]["start_sample"] + chunks[-1]["n_samp"]
        assert end == (doc % 10 + 1) * sr


def test_python_datasource_generates_every_partition_once(spark, sf_dir):
    from collections import Counter

    from decision_tree_analytics_spark.operators.source_io import (
        PYDS_PARTITIONS,
        PYDS_ROWS_PER_PART,
        _pyds_row,
        src_python_datasource,
    )

    rows = {r["tag"]: r for r in src_python_datasource(spark, sf_dir).collect()}
    total = PYDS_PARTITIONS * PYDS_ROWS_PER_PART
    expect = Counter()
    sums: Counter = Counter()
    for tid in range(total):
        _, _, cents, tag = _pyds_row(tid)
        expect[tag] += 1
        sums[tag] += cents
    assert sum(r["n_trades"] for r in rows.values()) == total
    for tag, r in rows.items():
        assert r["n_trades"] == expect[tag]
        assert r["sum_cents"] == sums[tag]
        assert r["n_parts"] >= 1
    # id range proves no partition was dropped or duplicated
    assert min(r["min_id"] for r in rows.values()) == 0
    assert max(r["max_id"] for r in rows.values()) == total - 1
