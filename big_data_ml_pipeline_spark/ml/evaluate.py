"""Evaluation metrics (SURVEY.md §2h M18).

Implements everything the reference computes (AUC-ROC, AUC-PR,
accuracy, f1, weightedPrecision, weightedRecall —
reference src/ml_pipeline.py:223-242) PLUS the metrics its config
declares but never wires (rmse/mae/r2, silhouette —
reference config/pipeline_config.yaml:109-115) and a custom
Davies-Bouldin index (not in MLlib) as a single distributed agg.
"""

from __future__ import annotations

from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    ClusteringEvaluator,
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate_classification(
    predictions: DataFrame, label_col: str = "label", binary: bool | None = None
) -> dict[str, float]:
    """Reference metric set (src/ml_pipeline.py:223-242): AUC-ROC and
    AUC-PR when the label is binary, plus the multiclass quartet."""
    out: dict[str, float] = {}
    if binary is None:
        binary = predictions.select(label_col).distinct().count() == 2
    if binary:
        ev = BinaryClassificationEvaluator(labelCol=label_col)
        for name in ("areaUnderROC", "areaUnderPR"):
            out[name] = ev.evaluate(predictions, {ev.metricName: name})
    multi = MulticlassClassificationEvaluator(labelCol=label_col, predictionCol="prediction")
    for name in ("accuracy", "f1", "weightedPrecision", "weightedRecall"):
        out[name] = multi.evaluate(predictions, {multi.metricName: name})
    return out


def evaluate_regression(predictions: DataFrame, label_col: str = "label") -> dict[str, float]:
    ev = RegressionEvaluator(labelCol=label_col, predictionCol="prediction")
    return {
        name: ev.evaluate(predictions, {ev.metricName: name})
        for name in ("rmse", "mae", "r2")
    }


def evaluate_clustering(
    predictions: DataFrame, features_col: str = "features"
) -> dict[str, float]:
    ev = ClusteringEvaluator(featuresCol=features_col, predictionCol="prediction")
    return {
        "silhouette": ev.evaluate(predictions),
        "davies_bouldin": davies_bouldin(predictions, features_col),
    }


def davies_bouldin(
    predictions: DataFrame, features_col: str = "features", prediction_col: str = "prediction"
) -> float:
    """Davies-Bouldin index: mean over clusters of max_{j≠i}
    (s_i + s_j) / d(c_i, c_j), with s = mean distance to centroid.

    Distributed shape: ONE aggregation over the data computes per-cluster
    centroids and scatters (vector sums via array aggregation); only the
    k×k centroid-distance matrix is computed on the driver (k is small).
    MLlib has no DB index — custom agg per SURVEY.md §7.
    """
    from pyspark.ml.functions import vector_to_array

    arr = predictions.select(
        F.col(prediction_col).alias("cluster"),
        vector_to_array(F.col(features_col)).alias("v"),
    )
    dim = len(arr.select("v").first()["v"])
    sums = [F.sum(F.col("v")[i]).alias(f"s{i}") for i in range(dim)]
    stats = (
        arr.groupBy("cluster")
        .agg(F.count("*").alias("n"), *sums)
        .collect()
    )
    centroids = {
        r["cluster"]: [r[f"s{i}"] / r["n"] for i in range(dim)] for r in stats
    }
    # second pass: mean distance to own centroid (scatter)
    cent_lit = F.map_from_arrays(
        F.array(*[F.lit(c) for c in centroids]),
        F.array(*[F.array(*[F.lit(x) for x in v]) for v in centroids.values()]),
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("v"),
                cent_lit[F.col("cluster")],
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scatters = {
        r["cluster"]: r["s"]
        for r in arr.select("cluster", dist.alias("d"))
        .groupBy("cluster")
        .agg(F.avg("d").alias("s"))
        .collect()
    }
    import math

    ks = sorted(centroids)
    if len(ks) < 2:
        return 0.0
    total = 0.0
    for i in ks:
        worst = 0.0
        for j in ks:
            if i == j:
                continue
            d = math.sqrt(
                sum((a - b) ** 2 for a, b in zip(centroids[i], centroids[j]))
            )
            if d > 0:
                worst = max(worst, (scatters[i] + scatters[j]) / d)
        total += worst
    return total / len(ks)
