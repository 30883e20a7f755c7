"""MLlib estimator registry (SURVEY.md §2h, M8-M15 + declared surface).

Keyed by ``(algorithm, task)`` like the reference's if/elif chain
(reference src/ml_pipeline.py:115-179); defaults mirror its
hyperparameters (numTrees=100, maxDepth=10, maxIter=100, seed=42).
The README-declared-but-never-implemented algorithms (naive_bayes,
glm, gmm, als — reference README.md:55-58) are implemented here for
real, plus the rest of MLlib's everyday estimators (decision trees,
LinearSVC + OneVsRest, MLP, isotonic regression) so a reference user
never hits a missing-algorithm wall.
"""

from __future__ import annotations

from pyspark.ml.classification import (
    DecisionTreeClassifier,
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    MultilayerPerceptronClassifier,
    NaiveBayes,
    OneVsRest,
    RandomForestClassifier,
)
from pyspark.ml.clustering import BisectingKMeans, GaussianMixture, KMeans
from pyspark.ml.recommendation import ALS
from pyspark.ml.regression import (
    DecisionTreeRegressor,
    GBTRegressor,
    GeneralizedLinearRegression,
    IsotonicRegression,
    LinearRegression,
    RandomForestRegressor,
)

SEED = 42


def _rf_classifier(p):
    return RandomForestClassifier(
        featuresCol=p["features"], labelCol=p["label"],
        numTrees=p.get("num_trees", 100), maxDepth=p.get("max_depth", 10), seed=SEED,
    )


def _logistic(p):
    return LogisticRegression(
        featuresCol=p["features"], labelCol=p["label"],
        maxIter=p.get("max_iter", 100), regParam=p.get("reg_param", 0.01),
    )


def _gbt_classifier(p):
    return GBTClassifier(
        featuresCol=p["features"], labelCol=p["label"],
        maxIter=p.get("max_iter", 100), maxDepth=p.get("max_depth", 5), seed=SEED,
    )


def _naive_bayes(p):
    return NaiveBayes(featuresCol=p["features"], labelCol=p["label"])


def _rf_regressor(p):
    return RandomForestRegressor(
        featuresCol=p["features"], labelCol=p["label"],
        numTrees=p.get("num_trees", 100), maxDepth=p.get("max_depth", 10), seed=SEED,
    )


def _linear(p):
    return LinearRegression(
        featuresCol=p["features"], labelCol=p["label"], maxIter=p.get("max_iter", 100)
    )


def _gbt_regressor(p):
    return GBTRegressor(
        featuresCol=p["features"], labelCol=p["label"],
        maxIter=p.get("max_iter", 100), seed=SEED,
    )


def _glm(p):
    return GeneralizedLinearRegression(
        featuresCol=p["features"], labelCol=p["label"],
        family=p.get("family", "gaussian"), link=p.get("link", "identity"),
        maxIter=p.get("max_iter", 100),
    )


def _kmeans(p):
    return KMeans(featuresCol=p["features"], k=p.get("k", 5), seed=SEED)


def _bisecting(p):
    return BisectingKMeans(featuresCol=p["features"], k=p.get("k", 5), seed=SEED)


def _gmm(p):
    return GaussianMixture(featuresCol=p["features"], k=p.get("k", 5), seed=SEED)


def _dt_classifier(p):
    return DecisionTreeClassifier(
        featuresCol=p["features"], labelCol=p["label"],
        maxDepth=p.get("max_depth", 10), seed=SEED,
    )


def _linear_svc(p):
    return LinearSVC(
        featuresCol=p["features"], labelCol=p["label"],
        maxIter=p.get("max_iter", 100), regParam=p.get("reg_param", 0.01),
    )


def _one_vs_rest(p):
    return OneVsRest(
        featuresCol=p["features"], labelCol=p["label"], classifier=_linear_svc(p)
    )


def _mlp(p):
    # layers must be supplied by the caller: [n_features, ..., n_classes]
    return MultilayerPerceptronClassifier(
        featuresCol=p["features"], labelCol=p["label"],
        layers=p.get("layers", [4, 8, 2]), maxIter=p.get("max_iter", 100), seed=SEED,
    )


def _dt_regressor(p):
    return DecisionTreeRegressor(
        featuresCol=p["features"], labelCol=p["label"],
        maxDepth=p.get("max_depth", 10), seed=SEED,
    )


def _isotonic(p):
    return IsotonicRegression(featuresCol=p["features"], labelCol=p["label"])


def _als(p):
    return ALS(
        userCol=p.get("user_col", "user"), itemCol=p.get("item_col", "item"),
        ratingCol=p.get("rating_col", "rating"), rank=p.get("rank", 10), seed=SEED,
    )


MODEL_REGISTRY = {
    ("random_forest", "classification"): _rf_classifier,
    ("logistic_regression", "classification"): _logistic,
    ("gradient_boosting", "classification"): _gbt_classifier,
    ("naive_bayes", "classification"): _naive_bayes,
    ("decision_tree", "classification"): _dt_classifier,
    ("linear_svc", "classification"): _linear_svc,
    ("one_vs_rest", "classification"): _one_vs_rest,
    ("mlp", "classification"): _mlp,
    ("decision_tree", "regression"): _dt_regressor,
    ("isotonic", "regression"): _isotonic,
    ("random_forest", "regression"): _rf_regressor,
    ("linear_regression", "regression"): _linear,
    ("gradient_boosting", "regression"): _gbt_regressor,
    ("glm", "regression"): _glm,
    ("kmeans", "clustering"): _kmeans,
    ("bisecting_kmeans", "clustering"): _bisecting,
    ("gmm", "clustering"): _gmm,
    ("als", "recommendation"): _als,
}


def build_estimator(
    algorithm: str,
    task: str,
    features_col: str = "features",
    label_col: str = "label",
    **params,
):
    key = (algorithm, task)
    if key not in MODEL_REGISTRY:
        raise ValueError(
            f"unsupported (algorithm, task) {key}; supported: {sorted(MODEL_REGISTRY)}"
        )
    p = {"features": features_col, "label": label_col, **params}
    return MODEL_REGISTRY[key](p)
