"""Feature pipeline builder (SURVEY.md §2h M1-M3, M16).

Reference behavior (src/ml_pipeline.py:76-113): schema introspection
discovers roles — string columns → StringIndexer (handleInvalid=keep),
numeric → passthrough — then VectorAssembler(handleInvalid=skip) →
StandardScaler(withStd, no mean centering). Reproduced with explicit
role override.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, FloatType, IntegerType, LongType, StringType

NUMERIC_TYPES = (IntegerType, LongType, FloatType, DoubleType)


def discover_roles(
    df: DataFrame, label_col: str | None = None
) -> tuple[list[str], list[str]]:
    """Runtime schema introspection: (categorical, numeric) feature
    columns — reference src/ml_pipeline.py:85-95 semantics."""
    categorical, numeric = [], []
    for field in df.schema.fields:
        if field.name == label_col:
            continue
        if isinstance(field.dataType, StringType):
            categorical.append(field.name)
        elif isinstance(field.dataType, NUMERIC_TYPES):
            numeric.append(field.name)
    return categorical, numeric


def feature_stages(
    categorical_cols: list[str],
    numeric_cols: list[str],
    output_col: str = "features",
    scale: bool = True,
) -> list:
    """M1 StringIndexer per categorical (single multi-column indexer —
    one pass, unlike the reference's per-column stages) + M2
    VectorAssembler + M3 StandardScaler(withMean=False)."""
    stages: list = []
    indexed = [f"{c}_indexed" for c in categorical_cols]
    if categorical_cols:
        stages.append(
            StringIndexer(
                inputCols=list(categorical_cols),
                outputCols=indexed,
                handleInvalid="keep",
            )
        )
    assembled = "features_raw" if scale else output_col
    stages.append(
        VectorAssembler(
            inputCols=list(numeric_cols) + indexed,
            outputCol=assembled,
            handleInvalid="skip",
        )
    )
    if scale:
        stages.append(
            StandardScaler(
                inputCol=assembled, outputCol=output_col, withStd=True, withMean=False
            )
        )
    return stages


def build_feature_pipeline(
    df: DataFrame,
    categorical_cols: list[str] | None = None,
    numeric_cols: list[str] | None = None,
    label_col: str | None = None,
    output_col: str = "features",
    scale: bool = True,
) -> PipelineModel:
    """Fit the feature pipeline; roles discovered from the schema when
    not given (reference's config-override-then-introspect order)."""
    if categorical_cols is None or numeric_cols is None:
        disc_cat, disc_num = discover_roles(df, label_col)
        categorical_cols = disc_cat if categorical_cols is None else categorical_cols
        numeric_cols = disc_num if numeric_cols is None else numeric_cols
    pipe = Pipeline(stages=feature_stages(categorical_cols, numeric_cols, output_col, scale))
    return pipe.fit(df)
