"""Pipeline composition — the reference's CDAP ETL DAG, Spark-first.

In the reference, "a query" is a user-authored stage DAG
(``ETLBatchConfig``: source → transforms → sink,
DecisionTreeRegressionTest.java:120-125) where each stage is a black
box over an RDD.  Here a pipeline is the same shape over DataFrames —
but because every stage expresses its work declaratively, Catalyst
fuses the whole chain into one optimized plan instead of executing
stage-materialized hops; only the sink forces execution.

The ML stages plug in directly:

    Pipeline(
        source=lambda s: read_csv(s, path, schema),
        transforms=[derive_label],
        sink=TrainerSink(cfg, base_dir),
    ).run(spark)
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from decision_tree_analytics_spark.config import PredictorConfig, TrainerConfig
from decision_tree_analytics_spark.ml.predictor import DecisionTreePredictorStage
from decision_tree_analytics_spark.ml.trainer import DecisionTreeTrainerStage


@dataclass
class TrainerSink:
    """Terminal stage: train + persist (reference SparkSink role)."""

    config: TrainerConfig
    base_dir: str

    def __call__(self, df: DataFrame) -> Any:
        return DecisionTreeTrainerStage(self.config, self.base_dir).run(df)


@dataclass
class PredictorTransform:
    """Record→record transform (reference SparkCompute role)."""

    config: PredictorConfig
    base_dir: str

    def __call__(self, df: DataFrame) -> DataFrame:
        return DecisionTreePredictorStage(self.config, self.base_dir).transform(df)


@dataclass
class Pipeline:
    """source → transforms* → sink.

    ``source``: SparkSession → DataFrame
    ``transforms``: DataFrame → DataFrame (lazy, fused by Catalyst)
    ``sink``: DataFrame → result (the only action)
    """

    source: Callable[[SparkSession], DataFrame]
    transforms: Sequence[Callable[[DataFrame], DataFrame]] = field(default_factory=list)
    sink: Callable[[DataFrame], Any] | None = None

    def dataframe(self, spark: SparkSession) -> DataFrame:
        df = self.source(spark)
        for t in self.transforms:
            df = t(df)
        return df

    def run(self, spark: SparkSession) -> Any:
        df = self.dataframe(spark)
        return self.sink(df) if self.sink is not None else df
