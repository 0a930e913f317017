"""Round-11 operator: ns_preference_pairs Python-replay and
structural tests.  The cross-engine value check lives in
tests/test_oracle_queries.py via the shared QUERIES/ORACLES
registration; here the pairing/rollup logic is replayed independently
in pure pandas and the audit invariants are locked.
"""

from __future__ import annotations

import re

import pandas as pd

from decision_tree_analytics_spark.operators.text import (
    PREF_MARGIN_PPM,
    PREF_POOL,
    STOPWORDS,
    ns_preference_pairs,
)
from decision_tree_analytics_spark.sources.tables import load_table

# Java regex \w and RE2 \w are ASCII classes; Python's re defaults to
# unicode — re.ASCII pins the replay to the engines' semantics.
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.ASCII)
_STOP_EN = set(STOPWORDS["en"])


def _replay(docs: pd.DataFrame) -> pd.DataFrame:
    """Pure-Python replica of the full pipeline (reward, pools,
    argmax/argmin with the doc_id tie-break, margin filter, rollup)."""
    rows = []
    for r in docs.itertuples(index=False):
        # strip(' ') not strip(): both engines' trim() removes SPACES
        # only, while Python's bare strip() eats \t/\n/\r too — a
        # corpus with non-space edge whitespace would diverge.
        ws = r.text.strip(" ").lower().split(" ")
        stop = sum(1 for t in ws if t in _STOP_EN)
        rows.append(
            {
                "doc_id": r.doc_id,
                "source": r.source,
                "prompt_id": r.doc_id // PREF_POOL,
                "reward_ppm": stop * 1_000_000 // len(ws),
                "re_tokens": len(_TOKEN_RE.findall(r.text.lower())),
            }
        )
    per = pd.DataFrame(rows)
    out: dict[str, dict] = {}
    for _pid, g in per.groupby("prompt_id"):
        if len(g) < 2:
            continue
        best = g.sort_values(["reward_ppm", "doc_id"], ascending=[False, True]).iloc[0]
        worst = g.sort_values(["reward_ppm", "doc_id"], ascending=[True, True]).iloc[0]
        gap = int(best.reward_ppm - worst.reward_ppm)
        usable = 1 if gap >= PREF_MARGIN_PPM else 0
        s = out.setdefault(
            best.source,
            {
                "n_groups": 0,
                "n_pairs": 0,
                "cross_source_pairs": 0,
                "longer": 0,
                "gap_sum": 0,
                "sum_len_delta": 0,
            },
        )
        s["n_groups"] += 1
        s["n_pairs"] += usable
        if usable:
            s["cross_source_pairs"] += int(best.source != worst.source)
            s["longer"] += int(best.re_tokens > worst.re_tokens)
            s["gap_sum"] += gap
            s["sum_len_delta"] += int(best.re_tokens - worst.re_tokens)
    recs = []
    for src, s in out.items():
        n = s["n_pairs"]
        recs.append(
            {
                "source": src,
                "n_groups": s["n_groups"],
                "n_pairs": n,
                "cross_source_pairs": s["cross_source_pairs"],
                "chosen_longer_ppm": s["longer"] * 1_000_000 // n if n else None,
                "mean_gap_ppm": s["gap_sum"] // n if n else None,
                "sum_len_delta": s["sum_len_delta"],
            }
        )
    return pd.DataFrame(recs).sort_values("source").reset_index(drop=True)


def test_preference_pairs_matches_python_replay(spark, sf_dir):
    got = (
        ns_preference_pairs(spark, sf_dir)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).toPandas()
    want = _replay(docs)
    assert list(got.columns) == list(want.columns)
    for col in want.columns:
        # .where(notna, None) keeps float64 dtype, so a pair-less
        # source's NULL round-trips as NaN and nan != nan red-flagged
        # a true match at sf0.01 — render through a sentinel instead.
        g = got[col].astype(object).where(got[col].notna(), "<N>").tolist()
        w = want[col].astype(object).where(want[col].notna(), "<N>").tolist()
        assert g == w, f"column {col}: {g} != {w}"


def test_preference_pairs_audit_invariants(spark, sf_dir):
    pdf = ns_preference_pairs(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    # Usable pairs are a subset of candidate groups; cross-source
    # pairs a subset of usable pairs.
    assert (pdf.n_pairs <= pdf.n_groups).all()
    assert (pdf.cross_source_pairs <= pdf.n_pairs).all()
    # Rates are ppm-bounded; the margin filter makes every usable
    # pair's gap >= PREF_MARGIN_PPM, so the mean is too.
    live = pdf[pdf.n_pairs > 0]
    assert ((live.chosen_longer_ppm >= 0) & (live.chosen_longer_ppm <= 1_000_000)).all()
    assert (live.mean_gap_ppm >= PREF_MARGIN_PPM).all()
    # Zero-pair sources report NULL rates, never a division blow-up.
    dead = pdf[pdf.n_pairs == 0]
    assert dead.chosen_longer_ppm.isna().all()
    assert dead.mean_gap_ppm.isna().all()
    assert (dead.sum_len_delta == 0).all()
    # Group conservation: every pool of >= 2 docs yields exactly one
    # group row attributed to exactly one winning source.
    docs = load_table(spark, sf_dir, "documents").select("doc_id").toPandas()
    pools = (docs.doc_id // PREF_POOL).value_counts()
    assert pdf.n_groups.sum() == int((pools >= 2).sum())
