"""Every declared query must hash-match its DuckDB oracle — the local
mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from decision_tree_analytics_spark import operators
from tests.oracle_harness import compare

QUERIES = operators.all_queries()
ORACLES = operators.all_oracles()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_dir, oracle_con):
    df = QUERIES[name](spark, sf_dir)
    compare(df, oracle_con, ORACLES[name], name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
