"""Train/predict orchestration (SURVEY.md §3 E1, re-expressed).

The reference's orchestrator (src/ml_pipeline.py:181-221) does:
randomSplit → feature pipeline → Pipeline(features + model) → fit →
transform → evaluate → save. Same lifecycle here, minus its
anti-patterns (no eager count on load, no blocking metric loops).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.setops import random_split
from .models import build_estimator


def embedding_features(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """array<float> → MLlib vector column 'features' (JVM-side)."""
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(
        "features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )


def train_model(
    df: DataFrame,
    algorithm: str,
    task: str,
    feature_stages: list | None = None,
    label_col: str = "label",
    split: tuple[float, float] = (0.8, 0.2),
    **params,
) -> tuple[PipelineModel, DataFrame]:
    """fit on a seeded train split, return (model, test predictions)."""
    train_df, test_df = random_split(df, list(split), seed=42)
    est = build_estimator(algorithm, task, label_col=label_col, **params)
    pipe = Pipeline(stages=(feature_stages or []) + [est])
    model = pipe.fit(train_df)
    return model, model.transform(test_df)


def train_predict_embeddings(
    emb: DataFrame, algorithm: str = "random_forest", task: str = "classification"
) -> DataFrame:
    """Driver-facing ML smoke: embeddings table → features → train on
    80% → predict on all rows. Returns (vec_id, label, prediction)."""
    df = embedding_features(emb).withColumn("label", F.col("label").cast("double"))
    params = {"num_trees": 20, "max_depth": 5} if algorithm == "random_forest" else {}
    model, _ = train_model(df, algorithm, task, **params)
    return model.transform(df).select(
        "vec_id", "label", F.col("prediction").cast("double").alias("prediction")
    )


def train_predict_regression(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    algorithm: str = "linear_regression",
    **params,
) -> tuple[PipelineModel, DataFrame]:
    """Tabular regression smoke (M2 + M12/M13): assemble numeric
    features inside the pipeline so transform works on raw rows; fit on
    the seeded 80% split, return (model, test predictions)."""
    from pyspark.ml.feature import VectorAssembler

    va = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features", handleInvalid="skip"
    )
    return train_model(
        df, algorithm, "regression", feature_stages=[va], label_col=label_col, **params
    )


def cluster_embeddings(emb: DataFrame, k: int = 5) -> DataFrame:
    """KMeans (M14) cluster sizes — seeded, deterministic given data."""
    df = embedding_features(emb)
    est = build_estimator("kmeans", "clustering", k=k)
    model = est.fit(df)
    return (
        model.transform(df)
        .groupBy(F.col("prediction").alias("cluster"))
        .agg(F.count("*").alias("n"))
    )


def save_model(model: PipelineModel, path: str) -> None:
    """S7 sink (reference src/ml_pipeline.py:296)."""
    model.write().overwrite().save(path)


def load_model(path: str) -> PipelineModel:
    return PipelineModel.load(path)
