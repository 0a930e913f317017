"""Driver-contract invariants for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_contract_wiring(spark):
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert len(qs) >= 60
    assert set(osql) <= set(qs)
    # every query is callable with (spark, sf_dir)
    import inspect

    for name, fn in qs.items():
        params = inspect.signature(fn).parameters
        assert len(params) >= 2, name


def test_rows_only_queries_are_the_documented_exceptions():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    rows_only = set(qs) - set(osql)
    # engine-seeded, sketch-based, or iterative ops only — everything
    # else must carry an oracle
    assert rows_only == {
        "q14_approx_distinct",
        "rel_approx_quantile",
        "q26_dt_train_predict",
        "ml_rf_train_predict",
        "sim_ivf_topk",
    }


def test_driver_sampled_names_exist_and_rotate_first():
    """Rotation-contract hygiene: every name in _DRIVER_SAMPLED must
    be a real query (a typo in a rotation commit would silently waste
    a driver sample slot), and all_queries() must enumerate every
    never-sampled query BEFORE any sampled one (the property the
    per-round rotation relies on)."""
    from decision_tree_analytics_spark.operators import (
        _DRIVER_SAMPLED,
        all_queries,
    )

    qs = list(all_queries())
    missing = _DRIVER_SAMPLED - set(qs)
    assert not missing, f"_DRIVER_SAMPLED names not in the contract: {missing}"
    flags = [name in _DRIVER_SAMPLED for name in qs]
    # once we hit the first sampled name, everything after is sampled
    if True in flags:
        first = flags.index(True)
        assert all(flags[first:]), "sampled query enumerated before a fresh one"


def test_driver_verified_keys_loader():
    """The auto-rotation loader counts hash-green and clean rows-only
    (err == 'no_oracle') rows, and rejects real error rows (r02's
    unhashable-array traceback must NOT count as verified)."""
    from decision_tree_analytics_spark import operators as O

    ks = O._driver_verified_keys()
    # r1-r5 curated history reproduces exactly from the files.
    assert ks == O._DRIVER_SAMPLED
    assert "q14_approx_distinct" in ks  # rows-only, err == 'no_oracle'
    assert "rel_approx_quantile" in ks  # r02 errored, r03 clean row wins


def test_all_queries_enumeration_is_fresh_first():
    """Never-driver-verified queries enumerate before verified ones,
    with _RECHECK_PRIORITY promoted between the two blocks."""
    from decision_tree_analytics_spark import operators as O

    names = list(O.all_queries())
    sampled = O._DRIVER_SAMPLED | O._driver_verified_keys()
    n_fresh = sum(1 for k in names if k not in sampled)
    assert all(k not in sampled for k in names[:n_fresh])
    promoted = names[n_fresh : n_fresh + len(O._RECHECK_PRIORITY)]
    assert promoted == [k for k in O._RECHECK_PRIORITY if k in names]
