"""Property-based tests (hypothesis) for the schema toolkit — the
invariants that keep trainer and predictor vector layouts in
agreement no matter how a user spells the config."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from decision_tree_analytics_spark.schema import get_feature_list

NUMERIC_NAMES = [f"n{i}" for i in range(8)]
LABEL = "label"

SCHEMA = StructType(
    [StructField(n, IntegerType() if i % 2 else DoubleType(), True)
     for i, n in enumerate(NUMERIC_NAMES)]
    + [StructField(LABEL, DoubleType(), True), StructField("s", StringType(), True)]
)


@given(st.permutations(NUMERIC_NAMES))
@settings(max_examples=50, deadline=None)
def test_include_order_never_matters(perm):
    """Vector layout is schema-positional regardless of config order."""
    fl = get_feature_list(SCHEMA, ",".join(perm), None, LABEL)
    assert list(fl) == NUMERIC_NAMES
    assert list(fl.values()) == list(range(len(NUMERIC_NAMES)))


@given(st.sets(st.sampled_from(NUMERIC_NAMES)))
@settings(max_examples=50, deadline=None)
def test_include_and_complement_exclude_agree(subset):
    """Selecting S by include-list == excluding (all \\ S) — the
    trainer/predictor agreement contract (SURVEY §1.4)."""
    if not subset:
        return
    include = ",".join(sorted(subset))
    complement = [n for n in NUMERIC_NAMES if n not in subset] + ["s"]
    exclude = ",".join(complement)
    assert get_feature_list(SCHEMA, include, None, LABEL) == get_feature_list(
        SCHEMA, None, exclude, LABEL
    )


@given(st.sampled_from(NUMERIC_NAMES), st.integers(min_value=2, max_value=100))
@settings(max_examples=30, deadline=None)
def test_cardinality_maps_name_to_vector_index(name, card):
    from decision_tree_analytics_spark.schema import get_categorical_feature_info

    fl = get_feature_list(SCHEMA, None, "s", LABEL)
    info = get_categorical_feature_info(fl, f"{name}:{card}")
    assert info == {fl[name]: card}
