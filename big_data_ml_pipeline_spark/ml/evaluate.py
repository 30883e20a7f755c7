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


def is_binary_label(df: DataFrame, label_col: str = "label") -> bool:
    """Cheap binary-vs-multiclass probe: ``distinct().limit(3)`` stops
    the distinct early instead of materializing every group over the
    full table (the previous ``distinct().count()`` was a whole extra
    full-table job per evaluate/tune call — VERDICT r1 item #3).
    Callers that already know pass ``binary=`` and skip even this."""
    return df.select(label_col).distinct().limit(3).count() == 2


def evaluate_classification(
    predictions: DataFrame, label_col: str = "label", binary: bool | None = None
) -> dict[str, float]:
    """Reference metric set (src/ml_pipeline.py:223-242): AUC-ROC and
    AUC-PR when the label is binary, plus the multiclass quartet."""
    out: dict[str, float] = {}
    if binary is None:
        binary = is_binary_label(predictions, label_col)
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
    # Two DB keys so the dispersion semantics are visible in the output
    # (ADVICE r2: r2 silently changed the q default): "davies_bouldin"
    # is the sklearn-compatible mean-distance form (q=1);
    # "davies_bouldin_q2" is the RMS form computable in ONE aggregation
    # job — the 100 TB path.
    return {
        "silhouette": ev.evaluate(predictions),
        "davies_bouldin": davies_bouldin(predictions, features_col, q=1),
        "davies_bouldin_q2": davies_bouldin(predictions, features_col, q=2),
    }


def davies_bouldin(
    predictions: DataFrame,
    features_col: str = "features",
    prediction_col: str = "prediction",
    q: int = 2,
) -> float:
    """Davies-Bouldin index: mean over clusters of max_{j≠i}
    (s_i + s_j) / d(c_i, c_j), with s the within-cluster dispersion.

    ``q`` picks the dispersion from the original Davies & Bouldin (1979)
    family:

    - ``q=2`` (default): RMS distance to centroid. ONE aggregation job:
      posexplode the feature vector and group by (cluster, dim) for
      per-dimension sums and squared sums with map-side combine — the
      shuffle carries k×dim rows, the driver gets centroids via s/n and
      scatters via the identity E‖x−c‖² = Σ ss/n − ‖c‖². No separate
      job to learn the vector dimension (it falls out of the explode).
    - ``q=1``: sklearn-compatible mean distance to centroid. Needs a
      second pass (the centroid must exist before distances can be
      averaged; no sum/count identity applies to E‖x−c‖).

    Only the k×k centroid-distance matrix is computed on the driver
    (k is small). MLlib has no DB index — custom agg per SURVEY.md §7.
    """
    import math

    from pyspark.ml.functions import vector_to_array

    arr = predictions.select(
        F.col(prediction_col).alias("cluster"),
        vector_to_array(F.col(features_col)).alias("v"),
    )
    ex = arr.select("cluster", F.posexplode("v").alias("pos", "x"))
    rows = (
        ex.groupBy("cluster", "pos")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("s"),
            F.sum(F.col("x") * F.col("x")).alias("ss"),
        )
        .collect()
    )
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r
    centroids = {
        c: [d[p]["s"] / d[p]["n"] for p in sorted(d)] for c, d in by_cluster.items()
    }
    ks = sorted(centroids)
    if len(ks) < 2:
        return 0.0

    if q == 2:
        scatters = {}
        for c, d in by_cluster.items():
            n = d[0]["n"]
            sumsq = sum(r["ss"] for r in d.values())
            norm_c = sum(x * x for x in centroids[c])
            scatters[c] = math.sqrt(max(0.0, sumsq / n - norm_c))
    elif q == 1:
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
    else:
        raise ValueError(f"unsupported dispersion order q={q!r}")

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
