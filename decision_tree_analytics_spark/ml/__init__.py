from decision_tree_analytics_spark.ml.features import assemble_features  # noqa: F401
from decision_tree_analytics_spark.ml.predictor import DecisionTreePredictorStage  # noqa: F401
from decision_tree_analytics_spark.ml.trainer import DecisionTreeTrainerStage  # noqa: F401
