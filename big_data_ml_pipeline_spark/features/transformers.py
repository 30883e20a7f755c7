"""Declared-surface feature transformers (SURVEY.md §2g).

The reference *imports* SQLTransformer, Interaction, OneHotEncoder and
Bucketizer but never uses them (reference src/feature_engineering.py:9-12)
— declared intent we implement for real. All are thin, typed wrappers
over MLlib transformers so they compose with the Pipeline builder in
``features/pipeline.py``.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import (
    Bucketizer,
    Interaction,
    OneHotEncoder,
    SQLTransformer,
    StringIndexer,
    VectorAssembler,
)
from pyspark.sql import DataFrame


def one_hot_encode(
    df: DataFrame, categorical_cols: list[str], drop_last: bool = True
) -> DataFrame:
    """StringIndexer → OneHotEncoder per categorical column, one fitted
    pipeline (single pass over the data for all index maps).

    Output: ``{col}_onehot`` sparse vectors. At 100 TB the index map is
    a broadcast dictionary — cardinality must fit driver memory; use
    frequency/target encoding (operators/aggregates.py) for
    ultra-high-cardinality columns instead.
    """
    indexed = [f"{c}_indexed" for c in categorical_cols]
    pipe = Pipeline(
        stages=[
            StringIndexer(
                inputCols=list(categorical_cols), outputCols=indexed, handleInvalid="keep"
            ),
            OneHotEncoder(
                inputCols=indexed,
                outputCols=[f"{c}_onehot" for c in categorical_cols],
                dropLast=drop_last,
            ),
        ]
    )
    return pipe.fit(df).transform(df)


def bucketize(
    df: DataFrame, col: str, splits: list[float], output_col: str | None = None
) -> DataFrame:
    """Fixed-boundary binning (vs QuantileDiscretizer's data-driven
    boundaries). ``splits`` must be monotonically increasing; pass
    ``float('-inf')``/``float('inf')`` edges for open intervals."""
    b = Bucketizer(
        splits=list(splits),
        inputCol=col,
        outputCol=output_col or f"{col}_bucket",
        handleInvalid="keep",
    )
    return b.transform(df)


def sql_transform(df: DataFrame, statement: str) -> DataFrame:
    """SQLTransformer: an arbitrary SELECT over ``__THIS__`` — the
    declarative escape hatch for config-driven feature pipelines; the
    statement compiles through Catalyst like any other query."""
    return SQLTransformer(statement=statement).transform(df)


def interact_vectors(
    df: DataFrame, input_cols: list[str], output_col: str = "interactions"
) -> DataFrame:
    """MLlib Interaction: elementwise products of all input columns
    (numeric or vector) — the vector-typed counterpart of
    operators/projection.interaction_features."""
    return Interaction(inputCols=list(input_cols), outputCol=output_col).transform(df)


def assemble(
    df: DataFrame, input_cols: list[str], output_col: str = "features"
) -> DataFrame:
    """VectorAssembler convenience (M2) for ad-hoc vector building."""
    va = VectorAssembler(inputCols=list(input_cols), outputCol=output_col, handleInvalid="skip")
    return va.transform(df)
