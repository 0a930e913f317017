"""End-to-end pipeline-DAG test — the rebuild of the reference's
entry point C (ETLBatchConfig source → stage → sink,
DecisionTreeRegressionTest.java:120-142,173-211), driven through the
Pipeline API with a real CSV source."""

from __future__ import annotations

import pyspark.sql.functions as F

from decision_tree_analytics_spark.config import PredictorConfig, TrainerConfig
from decision_tree_analytics_spark.pipeline import (
    Pipeline,
    PredictorTransform,
    TrainerSink,
)
from decision_tree_analytics_spark.sources.formats import read_csv, write_csv
from tests.fixtures import flights


def derive_label(df):
    """O14: delayed = depDelayMins > 40 (the reference's test-side ETL)."""
    return df.withColumn(
        "delayed",
        F.when(F.col("depDelayMins") > 40, F.lit(1.0)).otherwise(F.lit(0.0)),
    )


def test_train_then_predict_pipeline(spark, tmp_path):
    # Stage 0: land the fixture as a real CSV source.
    csv_dir = str(tmp_path / "flights_csv")
    write_csv(
        flights.flight_train_df(spark).drop("delayed"), csv_dir, header=True
    )
    model_dir = str(tmp_path / "models")

    train_cfg = TrainerConfig(
        file_set_name="dt",
        feature_fields_to_include=flights.TRAINER_FEATURES,
        cardinality_mapping="dofW:7",
        label_field="delayed",
        max_depth=9,
        max_bins=100,
    )
    model = Pipeline(
        source=lambda s: read_csv(s, csv_dir, flights.FLIGHT_SCHEMA, header=True),
        transforms=[derive_label],
        sink=TrainerSink(train_cfg, model_dir),
    ).run(spark)
    assert model is not None and model.numFeatures == 8

    predict_cfg = PredictorConfig(
        file_set_name="dt",
        feature_fields_to_exclude=flights.PREDICTOR_EXCLUDES,
        prediction_field="delayed",
    )
    out = Pipeline(
        source=lambda s: flights.flight_predict_df(s),
        transforms=[PredictorTransform(predict_cfg, model_dir)],
        sink=lambda df: df.orderBy("flightNum").collect(),
    ).run(spark)
    assert len(out) == 6
    assert all(r.delayed in (0.0, 1.0) for r in out)
