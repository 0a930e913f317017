"""Port of the reference's DecisionTreeConfigTest — four negative
cases asserting byte-identical error messages
(DecisionTreeConfigTest.java:44-95), plus the contracts SURVEY §2.2
infers for SparkUtils."""

from __future__ import annotations

import pytest

from decision_tree_analytics_spark.config import PredictorConfig, TrainerConfig
from decision_tree_analytics_spark.errors import ConfigValidationError
from decision_tree_analytics_spark.schema import (
    get_categorical_feature_info,
    get_feature_list,
)
from tests.fixtures.flights import TRAIN_SCHEMA


def _trainer(**kw):
    base = dict(file_set_name="decision-tree-model", label_field="delayed")
    base.update(kw)
    return TrainerConfig(**base)


def test_invalid_label_name():
    with pytest.raises(ConfigValidationError) as e:
        _trainer(label_field="dealyed").validate(TRAIN_SCHEMA)
    assert str(e.value) == "Label field dealyed does not exists in the input schema."


def test_invalid_feature_name():
    cfg = _trainer(
        feature_fields_to_include="dofM,dofW,carrier,originId,destinationId"
    )
    with pytest.raises(ConfigValidationError) as e:
        cfg.validate(TRAIN_SCHEMA)
    assert str(e.value) == "Field destinationId does not exists in the input schema."


def test_string_feature_via_default_all():
    with pytest.raises(ConfigValidationError) as e:
        _trainer().validate(TRAIN_SCHEMA)
    assert (
        str(e.value)
        == "Features must be of type : int, double, float, long but was of type "
        "STRING for field tailNum."
    )


def test_non_double_label():
    with pytest.raises(ConfigValidationError) as e:
        _trainer(label_field="tailNum").validate(TRAIN_SCHEMA)
    assert str(e.value) == "Label field must be of type Double, but was STRING."


def test_include_exclude_mutually_exclusive():
    cfg = _trainer(
        feature_fields_to_include="dofM", feature_fields_to_exclude="dofW"
    )
    with pytest.raises(ConfigValidationError):
        cfg.validate(TRAIN_SCHEMA)


def test_feature_order_is_schema_positional():
    """Include-list (any order) and exclude-list configs selecting the
    same 8 fields must yield identical vector layouts (SURVEY §1.4)."""
    include = get_feature_list(
        TRAIN_SCHEMA,
        "elapsedTime,dofM,dofW,carrier,originId,destId,scheduleDepTime,scheduledArrTime",
        None,
        "delayed",
    )
    exclude = get_feature_list(
        TRAIN_SCHEMA,
        None,
        "tailNum,flightNum,origin,dest,deptime,depDelayMins,arrTime,arrDelay,distance,delayed",
        "delayed",
    )
    assert include == exclude
    assert list(include) == [
        "dofM", "dofW", "carrier", "originId", "destId",
        "scheduleDepTime", "scheduledArrTime", "elapsedTime",
    ]


def test_cardinality_mapping_parse():
    fl = {"dofM": 0, "dofW": 1}
    assert get_categorical_feature_info(fl, "dofW:7") == {1: 7}
    assert get_categorical_feature_info(fl, None) == {}
    with pytest.raises(ConfigValidationError):
        get_categorical_feature_info(fl, "nope:7")
    with pytest.raises(ConfigValidationError):
        get_categorical_feature_info(fl, "dofW:seven")


def test_predictor_excludes_prediction_field():
    cfg = PredictorConfig(
        file_set_name="m", prediction_field="delayed",
        feature_fields_to_exclude="tailNum,flightNum,origin,dest,deptime,depDelayMins,arrTime,arrDelay,distance",
    )
    fl = cfg.validate(TRAIN_SCHEMA)
    assert "delayed" not in fl and len(fl) == 8
