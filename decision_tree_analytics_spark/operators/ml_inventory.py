"""ML operator queries for the driver contract (SURVEY §2.4 Q25–Q26).

Q25 — feature assembly with the null≡0.0 contract, verified against a
pure-SQL oracle (vector size + nnz are SQL-expressible even though the
vector itself is not).

Q26 — decision-tree train + predict in one query (the reference's
whole purpose), rows-only checked by the driver; exact golden parity
is pinned in tests/test_ml_pipeline.py on the flight fixture.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.ml.functions import vector_to_array
from pyspark.ml.regression import DecisionTreeRegressor
from pyspark.sql import DataFrame, SparkSession

from decision_tree_analytics_spark.ml.features import FEATURES_COL, assemble_features
from decision_tree_analytics_spark.sources.tables import load_table

_FEATURES = {"l_quantity": 0, "l_discount": 1, "l_tax": 2}


def q25_feature_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    assembled = assemble_features(li, _FEATURES)
    arr = vector_to_array(F.col(FEATURES_COL))
    return assembled.select(
        "l_orderkey",
        "l_linenumber",
        F.lit(3).cast("long").alias("vec_size"),
        F.size(F.filter(arr, lambda x: x != 0.0)).cast("long").alias("vec_nnz"),
    )


def q26_dt_train_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a variance-impurity tree (price ~ quantity/discount/tax)
    and score the same table — the reference's O4–O12 dataflow fused
    into one DataFrame plan.

    Scale: the fit aggregates per-level split statistics (maxBins
    bounds the state); scoring is a JVM-side broadcast-model map.
    The cache holds ONLY the 4 columns the fit/score loop reads
    (keys + vector + label), not the 16-column lineitem row — the
    projection prunes the parquet scan and every per-level pass
    (~25% faster at sf0.1, and the gap widens with row width).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", *_FEATURES
    )
    assembled = (
        assemble_features(li, _FEATURES)
        .select(
            "l_orderkey",
            "l_linenumber",
            FEATURES_COL,
            F.col("l_extendedprice").alias("label"),
        )
        .cache()
    )
    try:
        training = assembled.select(FEATURES_COL, "label")
        model = DecisionTreeRegressor(
            featuresCol=FEATURES_COL,
            labelCol="label",
            impurity="variance",
            maxDepth=5,
            maxBins=64,
            seed=12345,
        ).fit(training)
        return (
            model.setPredictionCol("predicted_price")
            .transform(assembled)
            .select("l_orderkey", "l_linenumber", "predicted_price")
        )
    finally:
        assembled.unpersist()


def ml_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini/variance-gain feature importances of the Q26 tree — the
    explainability companion to train+predict (which split variables
    actually drive the price model).

    The importance vector is a property of the fitted model object on
    the driver (MLlib normalizes per-node impurity gains), so the
    3-row result is built driver-side by design — no data-plane
    collect.  Rows-only under the driver (tree structure is
    engine-specific); determinism under the fixed seed is pinned in
    tests/test_ml_pipeline.py."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", *_FEATURES
    )
    assembled = (
        assemble_features(li, _FEATURES)
        .select(FEATURES_COL, F.col("l_extendedprice").alias("label"))
        .cache()
    )
    try:
        training = assembled
        model = DecisionTreeRegressor(
            featuresCol=FEATURES_COL,
            labelCol="label",
            impurity="variance",
            maxDepth=5,
            maxBins=64,
            seed=12345,
        ).fit(training)
    finally:
        assembled.unpersist()
    fi = model.featureImportances
    rows = [
        (name, idx, float(fi[idx]), int(model.depth), int(model.numNodes))
        for name, idx in sorted(_FEATURES.items(), key=lambda kv: kv[1])
    ]
    return spark.createDataFrame(
        rows,
        "feature string, feature_idx long, importance double,"
        " tree_depth long, num_nodes long",
    )


QUERIES = {
    "q25_feature_assembly": q25_feature_assembly,
    "q26_dt_train_predict": q26_dt_train_predict,
    "ml_feature_importance": ml_feature_importance,
}

ORACLES = {
    "q25_feature_assembly": (
        "SELECT l_orderkey, l_linenumber, CAST(3 AS BIGINT) AS vec_size,"
        " CAST((CASE WHEN coalesce(l_quantity, 0) <> 0 THEN 1 ELSE 0 END)"
        "    + (CASE WHEN coalesce(l_discount, 0) <> 0 THEN 1 ELSE 0 END)"
        "    + (CASE WHEN coalesce(l_tax, 0) <> 0 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS vec_nnz"
        " FROM lineitem"
    ),
    # q26: non-SQL-expressible (iterative ML) → rows-only.
}
