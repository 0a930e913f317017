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
