"""Typed configs mirroring the reference plugin's widget keys.

Keys, defaults and bounds follow
``/root/reference/widgets/DecisionTreeTrainer-sparksink.json:51-67``
and ``DecisionTreeTrainer.java:84-88`` (maxDepth=10, maxBins=100,
UI minimum 2 for both).  The docs' ``featuresToInclude`` spelling is a
docs bug (SURVEY §2.1 note); the code property names are used.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.types import StructType

from decision_tree_analytics_spark import schema as S
from decision_tree_analytics_spark.errors import ConfigValidationError


@dataclass(frozen=True)
class FeatureSelectingConfig:
    """Common config (reference MLTrainerConfig / MLPredictorConfig)."""

    file_set_name: str  # FileSet dataset name → base model directory
    path: str | None = None  # optional sub-path inside the FileSet
    feature_fields_to_include: str | None = None
    feature_fields_to_exclude: str | None = None
    # Registry extension: None keeps the reference's single-directory
    # layout; "latest" or an explicit "vNNNN" selects a version subdir
    # (ml/registry.py).  Trainers should pin an explicit version (or
    # use ModelRegistry.save); predictors typically track "latest".
    model_version: str | None = None

    def resolve_model_path(self, base_dir: str) -> str:
        """FileSet path resolution (SparkMLTrainer.java:148-152):
        base/<fileSetName>[/<path>][/<version>]."""
        p = os.path.join(base_dir, self.file_set_name)
        if self.path:
            p = os.path.join(p, self.path.lstrip("/"))
        if self.model_version:
            from decision_tree_analytics_spark.ml.registry import resolve_version

            p = resolve_version(p, self.model_version)
        return p


@dataclass(frozen=True)
class TrainerConfig(FeatureSelectingConfig):
    label_field: str = "label"
    max_depth: int = 10  # DecisionTreeTrainer.java:84-85
    max_bins: int = 100  # DecisionTreeTrainer.java:87-88
    cardinality_mapping: str | None = None

    def __post_init__(self) -> None:
        # Widget bound: min 2 (widgets/DecisionTreeTrainer-sparksink.json:51-67).
        if self.max_depth < 2:
            raise ConfigValidationError("maxDepth must be at least 2.")
        if self.max_bins < 2:
            raise ConfigValidationError("maxBins must be at least 2.")

    def validate(self, input_schema: StructType) -> dict[str, int]:
        """Configure-time validation (SparkMLTrainer.java:88-92,100-105).
        Returns the resolved feature list."""
        if input_schema is None:
            raise ConfigValidationError("Input Schema must be a known constant.")
        S.validate_label_field_for_trainer(input_schema, self.label_field)
        feature_list = S.get_feature_list(
            input_schema,
            self.feature_fields_to_include,
            self.feature_fields_to_exclude,
            self.label_field,
        )
        S.get_categorical_feature_info(feature_list, self.cardinality_mapping)
        return feature_list


@dataclass(frozen=True)
class PredictorConfig(FeatureSelectingConfig):
    prediction_field: str = "prediction"

    def validate(self, input_schema: StructType) -> dict[str, int]:
        """Configure-time validation (SparkMLPredictor.java:87-90,98-104)."""
        if input_schema is None:
            raise ConfigValidationError("Input Schema must be a known constant.")
        return S.get_feature_list(
            input_schema,
            self.feature_fields_to_include,
            self.feature_fields_to_exclude,
            self.prediction_field,
        )
