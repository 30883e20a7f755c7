"""Tests for the declared-surface transformers (SURVEY.md §2g) and
CrossValidator tuning (M17)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_ml_pipeline_spark.features import transformers as tr
from big_data_ml_pipeline_spark.ml.tuning import tune


def test_one_hot_encode(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",), ("c",)], ["cat"])
    out = tr.one_hot_encode(df, ["cat"])
    assert "cat_onehot" in out.columns
    vecs = {r["cat"]: r["cat_onehot"] for r in out.collect()}
    # 3 categories + handleInvalid=keep slot, dropLast → size 3
    assert vecs["a"].size == 3
    assert vecs["a"] != vecs["b"]


def test_bucketize_fixed_splits(spark):
    df = spark.createDataFrame([(0.5,), (1.5,), (99.0,)], ["x"])
    out = tr.bucketize(df, "x", [0.0, 1.0, 2.0, float("inf")])
    got = [r["x_bucket"] for r in out.collect()]
    assert got == [0.0, 1.0, 2.0]


def test_sql_transformer(spark):
    df = spark.createDataFrame([(2, 3)], ["a", "b"])
    out = tr.sql_transform(df, "SELECT *, a * b AS ab FROM __THIS__")
    assert out.first()["ab"] == 6


def test_interaction_vectors(spark):
    df = spark.createDataFrame([(2.0, 3.0)], ["a", "b"])
    out = tr.interact_vectors(df, ["a", "b"], "ab")
    assert out.first()["ab"].toArray().tolist() == [6.0]


def test_assemble(spark):
    df = spark.createDataFrame([(1.0, 2.0)], ["a", "b"])
    out = tr.assemble(df, ["a", "b"])
    assert out.first()["features"].toArray().tolist() == [1.0, 2.0]


def test_cross_validated_tuning(spark):
    rows = [(float(i % 10), float((i * 3) % 7), 1.0 if (i % 10) > 4 else 0.0)
            for i in range(80)]
    df = tr.assemble(
        spark.createDataFrame(rows, ["f1", "f2", "label"]), ["f1", "f2"]
    )
    best, metrics = tune(
        df,
        "logistic_regression",
        "classification",
        grid={"regParam": [0.01, 0.5]},
        num_folds=2,
        parallelism=2,
    )
    assert len(metrics) == 2  # one avg metric per grid point
    preds = best.transform(df)
    assert "prediction" in preds.columns
