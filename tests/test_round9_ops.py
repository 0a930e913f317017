"""Round-9 operators: Python-replay and structural tests.

Each test replays the operator's math independently (pandas/hashlib)
or asserts the structural invariants the op guarantees; the
cross-engine value check lives in tests/test_oracle_queries.py via
the shared QUERIES/ORACLES registration.
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
import pytest

from decision_tree_analytics_spark.operators.dedup import (
    URL_DOMAIN_QUOTA,
    dedup_url_quota,
)
from decision_tree_analytics_spark.operators.stats_ext import (
    SPRT_A_MICRO,
    SPRT_B_MICRO,
    SPRT_F_MICRO,
    SPRT_S_MICRO,
    ml_pr_auc,
    ml_sprt_monitor,
    rel_cuped,
)
from decision_tree_analytics_spark.operators.text import (
    CHAT_SKELETON,
    MDIFF_BUCKETS,
    MDIFF_G1_GATE,
    MDIFF_G1_HIGH,
    MDIFF_G2_GATE,
    MDIFF_G2_HIGH,
    OOV_VOCAB_TOP_N,
    ns_chat_template,
    ns_manifest_diff,
    ns_oov_rate,
)
from decision_tree_analytics_spark.sources.tables import load_table

TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def _md5_bucket(val, mod):
    return int(hashlib.md5(str(val).encode()).hexdigest()[:8], 16) % mod


# ------------------------------------------------------------------
# ns_manifest_diff
# ------------------------------------------------------------------


def _manifest_gens(docs: pd.DataFrame):
    d = docs.copy()
    d["n_tok"] = d["text"].map(lambda t: len(str(t).lower().strip().split(" ")))
    d["bucket"] = d["doc_id"].map(lambda i: _md5_bucket(i, MDIFF_BUCKETS))
    g1 = d[(d.bucket != 0) & (d.n_tok >= MDIFF_G1_GATE)].copy()
    g1["tier"] = g1.n_tok.map(lambda n: "high" if n >= MDIFF_G1_HIGH else "mid")
    g2 = d[(d.bucket != 1) & (d.n_tok >= MDIFF_G2_GATE)].copy()
    g2["tier"] = g2.n_tok.map(lambda n: "high" if n >= MDIFF_G2_HIGH else "mid")
    return g1, g2


def test_manifest_diff_replays_in_pandas(spark, sf_dir):
    out = ns_manifest_diff(spark, sf_dir).toPandas().set_index("source")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).toPandas()
    g1, g2 = _manifest_gens(docs)
    m = g1.merge(g2, on="doc_id", how="outer", suffixes=("_1", "_2"))
    added = m[m.source_1.isna()].groupby("source_2").size()
    removed = m[m.source_2.isna()].groupby("source_1").size()
    both = m[m.source_1.notna() & m.source_2.notna()]
    requal = both[both.tier_1 != both.tier_2].groupby("source_2").size()
    tok_delta = (
        g2.groupby("source").n_tok.sum().astype(int)
        .sub(g1.groupby("source").n_tok.sum().astype(int), fill_value=0)
    )
    for src, row in out.iterrows():
        assert row["docs_added"] == added.get(src, 0)
        assert row["docs_removed"] == removed.get(src, 0)
        assert row["docs_requalified"] == requal.get(src, 0)
        assert row["token_delta"] == tok_delta.get(src, 0)
    # Every diff category is populated somewhere (fixture guarantee).
    assert out["docs_added"].sum() > 0
    assert out["docs_removed"].sum() > 0
    assert out["docs_unchanged"].sum() > 0


# ------------------------------------------------------------------
# dedup_url_quota
# ------------------------------------------------------------------


def test_url_quota_replays_in_pandas(spark, sf_dir):
    out = dedup_url_quota(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text"
    ).toPandas()
    docs["url_md5"] = docs["text"].map(
        lambda t: hashlib.md5(str(t).encode()).hexdigest()
    )
    # one output row per unique (source, url)
    uniq = docs.drop_duplicates(["source", "url_md5"])
    assert len(out) == len(uniq)
    # keeper per url = max n_chars, then min doc_id
    best = (
        docs.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .drop_duplicates(["source", "url_md5"])
        .set_index(["source", "url_md5"])["doc_id"]
    )
    for r in out.itertuples():
        assert best[(r.source, r.url_md5)] == r.doc_id
    # per-domain ranks are 1..n and the quota flag matches
    for src, grp in out.groupby("source"):
        assert sorted(grp.domain_rank) == list(range(1, len(grp) + 1))
        assert (grp.is_kept == (grp.domain_rank <= URL_DOMAIN_QUOTA)).all()


# ------------------------------------------------------------------
# rel_cuped
# ------------------------------------------------------------------


def test_cuped_theta_pooled_and_means_exact(spark, sf_dir):
    out = rel_cuped(spark, sf_dir).toPandas().set_index("arm")
    assert len(out) == 2
    # theta is the POOLED estimate — identical in both arms
    assert out.loc[0, "theta"] == out.loc[1, "theta"]
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["day"] = ev["ts"] // 1000 // 86400000000
    ev["cents"] = (ev["value"] * 100 + 0.5).map(math.floor)
    p = ev[ev.event_type == "purchase"]
    from decision_tree_analytics_spark.operators.stats_ext import CUPED_CUT_DAY

    per = pd.DataFrame({"user_id": ev.user_id.unique()}).set_index("user_id")
    per["x"] = p[p.day < CUPED_CUT_DAY].groupby("user_id").cents.sum()
    per["y"] = p[p.day >= CUPED_CUT_DAY].groupby("user_id").cents.sum()
    per = per.fillna(0).astype(int).reset_index()
    per["arm"] = per.user_id.map(lambda u: _md5_bucket(u, 2))
    for arm, grp in per.groupby("arm"):
        assert out.loc[arm, "n_users"] == len(grp)
        assert out.loc[arm, "mean_y"] == pytest.approx(
            math.floor(grp.y.sum() / len(grp) + 0.5) / 100.0
        )
    # adjusted means move but preserve the overall pooled mean roughly
    # (CUPED is mean-preserving up to quantization per arm mix)
    assert (out["mean_y_adj"] - out["mean_y"]).abs().max() < out["mean_y"].max()


# ------------------------------------------------------------------
# ml_sprt_monitor
# ------------------------------------------------------------------


def test_sprt_replays_in_pandas(spark, sf_dir):
    out = ml_sprt_monitor(spark, sf_dir).toPandas().set_index("arm")
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["day"] = ev["ts"] // 1000 // 86400000000
    ev["arm"] = ev.user_id.map(lambda u: _md5_bucket(u, 2))
    ev["x"] = (ev.event_type == "purchase").astype(int)
    for arm, grp in ev.groupby("arm"):
        daily = grp.groupby("day").x.agg(["sum", "count"]).sort_index()
        cs = cf = 0
        stop_day, llr_at = None, None
        for day, row in daily.iterrows():
            cs += int(row["sum"])
            cf += int(row["count"] - row["sum"])
            llr = cs * SPRT_S_MICRO + cf * SPRT_F_MICRO
            if llr >= SPRT_A_MICRO or llr <= SPRT_B_MICRO:
                stop_day, llr_at, n_obs = day, llr, cs + cf
                break
        else:
            stop_day, llr_at, n_obs = day, llr, cs + cf
        assert out.loc[arm, "look_day"] == stop_day
        assert out.loc[arm, "llr_micro"] == llr_at
        assert out.loc[arm, "n_obs"] == n_obs
        want = (
            "accept_h1"
            if llr_at >= SPRT_A_MICRO
            else "accept_h0" if llr_at <= SPRT_B_MICRO else "continue"
        )
        assert out.loc[arm, "decision"] == want


# ------------------------------------------------------------------
# ml_pr_auc
# ------------------------------------------------------------------


def test_pr_auc_replays_in_pandas(spark, sf_dir):
    out = ml_pr_auc(spark, sf_dir).toPandas().sort_values("thr_m", ascending=False)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_discount", "l_returnflag"
    ).toPandas()
    li["dm"] = (li.l_discount * 100 + 0.5).map(math.floor)
    li["y"] = (li.l_returnflag == "R").astype(int)
    grid = (
        li.groupby("dm")
        .agg(n_k=("y", "size"), pos_k=("y", "sum"))
        .sort_index(ascending=False)
    )
    p_tot = int(grid.pos_k.sum())
    tp = fp = 0
    contrib_sum = 0
    rows = []
    for dm, row in grid.iterrows():
        tp += int(row.pos_k)
        fp += int(row.n_k - row.pos_k)
        prec = tp * 1_000_000 // (tp + fp)
        contrib_sum += int(row.pos_k) * prec
        rows.append((dm, tp, fp, prec, tp * 1_000_000 // p_tot))
    ap = contrib_sum // p_tot
    got = list(
        out[["thr_m", "tp", "fp", "prec_micro", "recall_micro"]].itertuples(
            index=False, name=None
        )
    )
    assert got == rows
    assert (out.ap_micro == ap).all()
    # recall at the loosest threshold is exactly 1.0
    assert out.iloc[-1]["recall_micro"] == 1_000_000
    assert 0 < ap <= 1_000_000


# ------------------------------------------------------------------
# ns_oov_rate / ns_chat_template
# ------------------------------------------------------------------


def test_oov_rate_replays_in_pandas(spark, sf_dir):
    out = ns_oov_rate(spark, sf_dir).toPandas().set_index("lang")
    docs = load_table(spark, sf_dir, "documents").select("lang", "text").toPandas()
    toks = []
    for r in docs.itertuples():
        for t in TOKEN_RE.findall(str(r.text).lower()):
            toks.append((r.lang, t))
    tdf = pd.DataFrame(toks, columns=["lang", "tok"])
    counts = tdf.groupby("tok").size().reset_index(name="n")
    vocab = set(
        counts.sort_values(["n", "tok"], ascending=[False, True])
        .head(OOV_VOCAB_TOP_N)["tok"]
    )
    tdf["oov"] = (~tdf.tok.isin(vocab)).astype(int)
    rep = tdf.groupby("lang").agg(n_tokens=("tok", "size"), n_oov=("oov", "sum"))
    for lang, row in rep.iterrows():
        assert out.loc[lang, "n_tokens"] == row.n_tokens
        assert out.loc[lang, "n_oov"] == row.n_oov
        assert out.loc[lang, "oov_ppm"] == row.n_oov * 1_000_000 // row.n_tokens


def test_chat_template_replays_in_pandas(spark, sf_dir):
    from decision_tree_analytics_spark.operators.text import (
        CHAT_MAX_TOKENS,
        CHAT_PROMPT_CHARS,
    )

    out = ns_chat_template(spark, sf_dir).toPandas().set_index("lang")
    skel = len(TOKEN_RE.findall(CHAT_SKELETON))
    docs = load_table(spark, sf_dir, "documents").select("lang", "text").toPandas()
    rep = {}
    for r in docs.itertuples():
        t = str(r.text)
        p = len(TOKEN_RE.findall(t[:CHAT_PROMPT_CHARS].lower()))
        c = len(TOKEN_RE.findall(t[CHAT_PROMPT_CHARS:].lower()))
        n, content, trunc = rep.get(r.lang, (0, 0, 0))
        rep[r.lang] = (
            n + 1,
            content + p + c,
            trunc + (1 if p + c + skel > CHAT_MAX_TOKENS else 0),
        )
    for lang, (n, content, trunc) in rep.items():
        assert out.loc[lang, "n_examples"] == n
        assert out.loc[lang, "content_tokens"] == content
        assert out.loc[lang, "overhead_tokens"] == n * skel
        assert out.loc[lang, "n_truncated"] == trunc
        assert out.loc[lang, "overhead_ppm"] == (
            n * skel * 1_000_000 // (content + n * skel)
        )


# ------------------------------------------------------------------
# snap_compaction_plan
# ------------------------------------------------------------------


def test_compaction_plan_replays_in_pandas(spark, sf_dir):
    from decision_tree_analytics_spark.operators.cdc import (
        COMPACT_TARGET_BYTES,
        snap_compaction_plan,
    )

    out = snap_compaction_plan(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["day"] = ev["ts"] // 1000 // 86400000000
    files = (
        ev.assign(b=ev.props.map(lambda p: len(str(p)) + 32))
        .groupby(["event_type", "day"])
        .agg(n_rows=("b", "size"), bytes=("b", "sum"))
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    for et, grp in files.groupby("event_type"):
        cum = 0
        for r in grp.itertuples():
            want_bin = cum // COMPACT_TARGET_BYTES
            cum += r.bytes
            got = out[(out.event_type == et) & (out.day == r.day)].iloc[0]
            assert got.bin_id == want_bin
            assert got.n_rows == r.n_rows and got.bytes == r.bytes
    # bin stats are internally consistent
    for (_, _), grp in out.groupby(["event_type", "bin_id"]):
        assert (grp.n_files_in_bin == len(grp)).all()
        assert (grp.bin_bytes == grp.bytes.sum()).all()


# ------------------------------------------------------------------
# graph_random_walks
# ------------------------------------------------------------------


def test_random_walks_replay_and_shape(spark, sf_dir):
    from decision_tree_analytics_spark.operators.graph import (
        WALK_STEPS,
        WALKS_PER_NODE,
        _trade_edges,
        graph_random_walks,
    )

    out = graph_random_walks(spark, sf_dir).toPandas()
    edges = _trade_edges(spark, sf_dir).toPandas()
    adj = {}
    for r in edges[edges.src != edges.dst].itertuples():
        adj.setdefault(r.src, []).append(r.dst)
    nodes = sorted(set(edges.src) | set(edges.dst))
    rows = set()
    for n in nodes:
        for w in range(WALKS_PER_NODE):
            cur = n
            rows.add((n, w, 0, cur))
            for step in range(1, WALK_STEPS + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(
                    nbrs,
                    key=lambda d: hashlib.md5(
                        f"{cur}-{w}-{step}-{d}".encode()
                    ).hexdigest(),
                )
                rows.add((n, w, step, cur))
    got = set(
        out[["start_node", "walk_id", "step", "node"]].itertuples(
            index=False, name=None
        )
    )
    assert got == rows
    # every (start, walk) has a full-length trajectory on this graph
    per_walk = out.groupby(["start_node", "walk_id"]).step.max()
    assert (per_walk == WALK_STEPS).all()


# ------------------------------------------------------------------
# rel_power_analysis
# ------------------------------------------------------------------


def test_power_analysis_replays_in_python(spark, sf_dir):
    from decision_tree_analytics_spark.operators.stats_ext import (
        POWER_LIFT_PPM_GRID,
        POWER_Z_ALPHA_MICRO,
        POWER_Z_BETA_MICRO,
        rel_power_analysis,
    )

    out = rel_power_analysis(spark, sf_dir).toPandas().set_index("lift_ppm")
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    first = ev.drop_duplicates("user_id", keep="first")
    n = len(first)
    conv = int((first.event_type == "purchase").sum())
    p = conv / n
    z = (POWER_Z_ALPHA_MICRO + POWER_Z_BETA_MICRO) / 1e6
    for lift_ppm in POWER_LIFT_PPM_GRID:
        lift = lift_ppm / 1e6
        req = z * z * 2.0 * p * (1.0 - p) / (p * lift * (p * lift))
        mde = z * math.sqrt(2.0 * p * (1.0 - p) / (n / 2.0)) / p
        row = out.loc[lift_ppm]
        assert row["n_users"] == n
        assert row["p_micro"] == math.floor(p * 1e6 + 0.5)
        assert row["required_n_per_arm"] == math.floor(req + 0.5)
        assert row["mde_now_ppm"] == math.floor(mde * 1e6 + 0.5)
    # monotone: bigger target lift needs fewer samples
    assert out["required_n_per_arm"].is_monotonic_decreasing


# ------------------------------------------------------------------
# ns_tokenizer_fertility
# ------------------------------------------------------------------


def test_tokenizer_fertility_replays_in_python(spark, sf_dir):
    from decision_tree_analytics_spark.operators.text import (
        ns_tokenizer_fertility,
    )

    out = ns_tokenizer_fertility(spark, sf_dir).toPandas().set_index("lang")
    docs = load_table(spark, sf_dir, "documents").select("lang", "text").toPandas()
    rep = {}
    for r in docs.itertuples():
        t = str(r.text)
        ws = len(t.lower().strip().split(" "))
        re_t = len(TOKEN_RE.findall(t.lower()))
        n, w_sum, r_sum, c_sum = rep.get(r.lang, (0, 0, 0, 0))
        rep[r.lang] = (n + 1, w_sum + ws, r_sum + re_t, c_sum + len(t))
    for lang, (n, w_sum, r_sum, c_sum) in rep.items():
        row = out.loc[lang]
        assert row["n_docs"] == n
        assert row["ws_words"] == w_sum and row["re_tokens"] == r_sum
        assert row["fertility_ppm"] == r_sum * 1_000_000 // w_sum
        assert row["chars_per_token_micro"] == c_sum * 1_000_000 // r_sum
        # a BPE-ish regex never merges across whitespace: fertility >= 1
        assert row["fertility_ppm"] >= 1_000_000
