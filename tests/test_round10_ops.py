"""Round-10 operators: Python-replay and structural tests.

Each test replays the operator's math independently (pandas/hashlib)
or asserts the structural invariants the op guarantees; the
cross-engine value check lives in tests/test_oracle_queries.py via
the shared QUERIES/ORACLES registration.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from decision_tree_analytics_spark.operators.cdc import (
    CLUSTER_DAYS,
    N_HASH_FILES,
    snap_overlap_depth,
    snap_skipping_audit,
)
from decision_tree_analytics_spark.operators.text import (
    EPOCH_BUDGET_MULT,
    MAX_EPOCH_MILLI,
    ns_epoch_plan,
)
from decision_tree_analytics_spark.sources.tables import load_table


def _hash_fid(key: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % N_HASH_FILES


# ------------------------------------------------------------------
# ns_epoch_plan
# ------------------------------------------------------------------


def test_epoch_plan_budget_accounting(spark, sf_dir):
    pdf = ns_epoch_plan(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    total_tokens = int(pdf["n_tokens"].sum())
    budget = EPOCH_BUDGET_MULT * total_tokens
    # Weights are floor-quantized ppm shares: they sum to at most 1e6
    # and undershoot by at most one ulp per source.
    wsum = int(pdf["weight_ppm"].sum())
    assert wsum <= 1_000_000
    assert wsum > 1_000_000 - len(pdf) - 1
    # The cap binds: no source trains past MAX_EPOCH_MILLI epochs.
    assert (pdf["epochs_milli"] <= MAX_EPOCH_MILLI).all()
    assert (pdf["epochs_milli"] >= 0).all()
    # effective re-derives the post-cap spend; shortfall is its gap
    # to the ask (floor rounding keeps both within one token-milli).
    eff = pdf["epochs_milli"] * pdf["n_tokens"] // 1000
    assert (pdf["effective_tokens"] == eff).all()
    assert (
        pdf["shortfall_tokens"] == pdf["target_tokens"] - pdf["effective_tokens"]
    ).all()
    assert (pdf["shortfall_tokens"] >= 0).all()
    # Post-cap spend never exceeds the budget (floor-rounded targets
    # already undershoot the exact shares).
    assert int(pdf["effective_tokens"].sum()) <= budget


def test_epoch_plan_upsamples_small_sources(spark, sf_dir):
    """alpha=0.5 smoothing gives smaller sources MORE epochs: the
    epochs_milli ordering must be the reverse of the n_tokens
    ordering wherever token counts differ materially."""
    pdf = ns_epoch_plan(spark, sf_dir).toPandas()
    if pdf["n_tokens"].nunique() < 2:
        return  # degenerate fixture: nothing to compare
    lo = pdf.loc[pdf["n_tokens"].idxmin()]
    hi = pdf.loc[pdf["n_tokens"].idxmax()]
    if lo["n_tokens"] == hi["n_tokens"]:
        return
    # The smallest source gets at least as many epochs as the largest
    # (strictly more unless both hit the cap).
    assert lo["epochs_milli"] >= hi["epochs_milli"]


# ------------------------------------------------------------------
# shared manifest replay
# ------------------------------------------------------------------


def _manifest_replay(spark, sf_dir) -> pd.DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    days = (
        o["o_orderdate"].astype("datetime64[us]")
        - pd.Timestamp("1970-01-01")
    ).dt.days
    rows = []
    for layout, fid in (
        ("clustered", days // CLUSTER_DAYS),
        ("hashed", o["o_orderkey"].map(_hash_fid)),
    ):
        g = pd.DataFrame({"file_id": fid, "day": days}).groupby("file_id")
        m = g["day"].agg(["min", "max", "size"]).reset_index()
        m.insert(0, "layout", layout)
        rows.append(m)
    return pd.concat(rows, ignore_index=True).rename(
        columns={"min": "min_day", "max": "max_day", "size": "n_rows"}
    )


# ------------------------------------------------------------------
# snap_skipping_audit
# ------------------------------------------------------------------


def test_skipping_audit_layout_contrast(spark, sf_dir):
    pdf = snap_skipping_audit(spark, sf_dir).toPandas()
    clu = pdf[pdf["layout"] == "clustered"].set_index("probe_bucket")
    hsh = pdf[pdf["layout"] == "hashed"].set_index("probe_bucket")
    assert len(clu) == len(hsh) > 0
    # Clustered files ARE the probe buckets: every probe overlaps
    # exactly one file, so it skips all the others and scans exactly
    # that bucket's rows.
    assert (clu["n_files_skipped"] == clu["n_files"] - 1).all()
    total = load_table(spark, sf_dir, "orders").count()
    assert int(clu["rows_scanned"].sum()) == total
    # Zone maps on a hash layout are never better than on the
    # clustered one, and strictly worse in aggregate.
    joined = clu.join(hsh, lsuffix="_c", rsuffix="_h")
    assert (joined["skip_ppm_c"] >= joined["skip_ppm_h"]).all()
    assert int(clu["n_files_skipped"].sum()) > int(hsh["n_files_skipped"].sum())


def test_skipping_audit_replay(spark, sf_dir):
    pdf = snap_skipping_audit(spark, sf_dir).toPandas()
    man = _manifest_replay(spark, sf_dir)
    probes = sorted(
        man.loc[man["layout"] == "clustered", "file_id"].unique()
    )
    exp = []
    for layout, m in man.groupby("layout"):
        for p in probes:
            lo, hi = p * CLUSTER_DAYS, (p + 1) * CLUSTER_DAYS
            skip = (m["max_day"] < lo) | (m["min_day"] >= hi)
            exp.append(
                (
                    layout,
                    p,
                    len(m),
                    int(skip.sum()),
                    int(skip.sum()) * 1_000_000 // len(m),
                    int(m.loc[~skip, "n_rows"].sum()),
                )
            )
    exp_df = pd.DataFrame(
        exp,
        columns=[
            "layout",
            "probe_bucket",
            "n_files",
            "n_files_skipped",
            "skip_ppm",
            "rows_scanned",
        ],
    )
    key = ["layout", "probe_bucket"]
    got = pdf.sort_values(key).reset_index(drop=True)[exp_df.columns]
    want = exp_df.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64", errors="ignore"), want.astype(got.dtypes.to_dict())
    )


# ------------------------------------------------------------------
# snap_overlap_depth
# ------------------------------------------------------------------


def test_overlap_depth_replay_and_contrast(spark, sf_dir):
    pdf = snap_overlap_depth(spark, sf_dir).toPandas()
    man = _manifest_replay(spark, sf_dir)
    # Python sweep-line replay.
    exp = []
    for layout, m in man.groupby("layout"):
        deltas: dict[int, list[int]] = {}
        for _, r in m.iterrows():
            deltas.setdefault(int(r["min_day"]), [0, 0])[0] += 1
            deltas.setdefault(int(r["max_day"]) + 1, [0, 0])[1] += 1
        depth = 0
        for day in sorted(deltas):
            opens, closes = deltas[day]
            depth += opens - closes
            exp.append((layout, day, opens, closes, depth))
    exp_df = pd.DataFrame(
        exp, columns=["layout", "day", "n_opens", "n_closes", "depth"]
    )
    key = ["layout", "day"]
    got = pdf.sort_values(key).reset_index(drop=True)[exp_df.columns]
    want = exp_df.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # Contrast: a date-clustered layout has depth <= 1 everywhere
    # (files are disjoint day windows); the hash layout's peak depth
    # is its entire file count (every file spans the range).
    clu = pdf[pdf["layout"] == "clustered"]
    hsh = pdf[pdf["layout"] == "hashed"]
    assert int(clu["depth"].max()) == 1
    n_hash_files = int(
        man.loc[man["layout"] == "hashed", "file_id"].nunique()
    )
    assert int(hsh["depth"].max()) >= (n_hash_files + 1) // 2
    # Sweep conservation: every opened file closes.
    for m in (clu, hsh):
        assert int(m["n_opens"].sum()) == int(m["n_closes"].sum())
        assert int(m.sort_values("day")["depth"].iloc[-1]) == 0
