"""Hyperparameter tuning (SURVEY.md §2h M17).

CrossValidator + ParamGridBuilder with the reference's grids
(reference src/ml_pipeline.py:244-287: RF numTrees×maxDepth, LR
regParam×elasticNetParam; 3 folds, parallelism 4).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame

from .evaluate import is_binary_label
from .models import build_estimator

DEFAULT_GRIDS = {
    "random_forest": {"numTrees": [50, 100], "maxDepth": [5, 10]},
    "logistic_regression": {"regParam": [0.01, 0.1], "elasticNetParam": [0.0, 0.5]},
}


def tune(
    df: DataFrame,
    algorithm: str,
    task: str,
    feature_stages: list | None = None,
    grid: dict[str, list] | None = None,
    num_folds: int = 3,
    parallelism: int = 4,
    label_col: str = "label",
    binary: bool | None = None,
):
    """Returns (best PipelineModel, avg metric per grid point).

    ``binary`` skips the label-cardinality probe entirely when the
    caller already knows (the orchestrator does); when None, the probe
    is the early-stopping ``distinct().limit(3)`` form, not a full
    count over the label column."""
    est = build_estimator(algorithm, task, label_col=label_col)
    grid = grid if grid is not None else DEFAULT_GRIDS.get(algorithm, {})
    builder = ParamGridBuilder()
    for pname, values in grid.items():
        builder = builder.addGrid(est.getParam(pname), values)
    if task == "classification":
        if binary is None:
            binary = is_binary_label(df, label_col)
        evaluator = (
            BinaryClassificationEvaluator(labelCol=label_col)
            if binary
            else MulticlassClassificationEvaluator(labelCol=label_col, metricName="f1")
        )
    elif task == "regression":
        evaluator = RegressionEvaluator(labelCol=label_col, metricName="rmse")
    else:
        raise ValueError(f"tuning unsupported for task {task!r}")
    pipe = Pipeline(stages=(feature_stages or []) + [est])
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=builder.build(),
        evaluator=evaluator,
        numFolds=num_folds,
        parallelism=parallelism,
        seed=42,
    )
    model = cv.fit(df)
    return model.bestModel, list(model.avgMetrics)
