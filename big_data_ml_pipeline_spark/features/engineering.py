"""FeatureEngineer — the reference's 13 DataFrame-level feature
transforms (reference src/feature_engineering.py, 277 lines), re-done
single-pass and scale-safe.

Differences from the reference, by design (SURVEY.md §4 anti-patterns):
 - loops of ``withColumn`` → one ``select`` per transform
   (operators/projection.py);
 - per-column ``first()`` stats jobs → one multi-aggregate job;
 - per-column QuantileDiscretizer fits → single multi-column fit;
 - naive shuffle joins for encodings → broadcast join-backs.
"""

from __future__ import annotations

from pyspark.ml.feature import (
    Imputer,
    PCA,
    PolynomialExpansion,
    QuantileDiscretizer,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import freq_counts, grouped_stats
from ..operators.joins import join_back
from ..operators.projection import (
    interaction_features,
    ratio_features,
    time_features,
    with_columns,
)
from ..operators.windows import lag_features, rolling_features
from ..functions import davg


class FeatureEngineer:
    """API-compatible with the reference's FeatureEngineer
    (src/feature_engineering.py:19-23) — construct with a SparkSession,
    call transform methods; every method is DataFrame → DataFrame."""

    def __init__(self, spark_session):
        self.spark = spark_session

    # -- reference behavior 1: time features (src/feature_engineering.py:25-34)
    def create_time_features(self, df: DataFrame, timestamp_col: str) -> DataFrame:
        return time_features(df, timestamp_col)

    # -- 2: aggregation features (src/feature_engineering.py:36-58)
    def create_aggregation_features(
        self, df: DataFrame, group_cols: list[str], agg_cols: list[str]
    ) -> DataFrame:
        agg_df = grouped_stats(df, group_cols, agg_cols)
        return join_back(df, agg_df, group_cols)

    # -- 3: ratio features (src/feature_engineering.py:60-74)
    def create_ratio_features(
        self, df: DataFrame, numerator_cols: list[str], denominator_cols: list[str]
    ) -> DataFrame:
        return ratio_features(df, numerator_cols, denominator_cols)

    # -- 4: interactions (src/feature_engineering.py:76-85)
    def create_interaction_features(self, df: DataFrame, feature_cols: list[str]) -> DataFrame:
        return interaction_features(df, feature_cols)

    # -- 5: binning (src/feature_engineering.py:87-101) — ONE multi-column fit
    def create_binning_features(
        self, df: DataFrame, numeric_cols: list[str], num_bins: int = 10
    ) -> DataFrame:
        disc = QuantileDiscretizer(
            inputCols=list(numeric_cols),
            outputCols=[f"{c}_binned" for c in numeric_cols],
            numBuckets=num_bins,
            handleInvalid="keep",
        )
        return disc.fit(df).transform(df)

    # -- 6: polynomial features (src/feature_engineering.py:103-114)
    def create_polynomial_features(
        self, df: DataFrame, input_col: str = "features", degree: int = 2,
        output_col: str = "poly_features",
    ) -> DataFrame:
        poly = PolynomialExpansion(degree=degree, inputCol=input_col, outputCol=output_col)
        return poly.transform(df)

    # -- 7: PCA (src/feature_engineering.py:116-128)
    def create_pca_features(
        self, df: DataFrame, input_col: str = "features", k: int = 10,
        output_col: str = "pca_features",
    ) -> DataFrame:
        model = PCA(k=k, inputCol=input_col, outputCol=output_col).fit(df)
        return model.transform(df)

    # -- 8: missing-value handling (src/feature_engineering.py:130-154)
    def handle_missing_values(
        self, df: DataFrame, numeric_cols: list[str] | None = None, strategy: str = "mean"
    ) -> DataFrame:
        if strategy == "drop":
            return df.na.drop()
        if numeric_cols is None:
            numeric_cols = [
                f.name
                for f in df.schema.fields
                if f.dataType.simpleString() in ("int", "bigint", "float", "double")
            ]
        if not numeric_cols:
            return df
        imputer = Imputer(
            inputCols=numeric_cols,
            outputCols=[f"{c}_imputed" for c in numeric_cols],
            strategy=strategy if strategy in ("mean", "median") else "mean",
        )
        out = imputer.fit(df).transform(df)
        # reference swaps imputed columns in place (src/feature_engineering.py:147-151)
        for c in numeric_cols:
            out = out.drop(c).withColumnRenamed(f"{c}_imputed", c)
        return out

    # -- 9: outlier features (src/feature_engineering.py:156-176) — ONE stats job
    def create_outlier_features(
        self, df: DataFrame, numeric_cols: list[str], threshold: float = 3.0
    ) -> DataFrame:
        stats = df.select(
            *[F.mean(c).alias(f"__mu_{c}") for c in numeric_cols],
            *[F.stddev_samp(c).alias(f"__sd_{c}") for c in numeric_cols],
        )
        out = df.crossJoin(F.broadcast(stats))
        exprs = {
            f"{c}_is_outlier": (
                F.abs(F.col(c) - F.col(f"__mu_{c}")) > threshold * F.col(f"__sd_{c}")
            ).cast("int")
            for c in numeric_cols
        }
        out = with_columns(out, exprs)
        return out.drop(*[f"__mu_{c}" for c in numeric_cols], *[f"__sd_{c}" for c in numeric_cols])

    # -- 9b: winsorization (extension — the reference only FLAGS
    # outliers; clipping to exact percentiles is the standard companion
    # transform). ONE percentile job for all columns, broadcast back —
    # never a per-column pass.
    def clip_to_percentiles(
        self, df: DataFrame, numeric_cols: list[str],
        lower: float = 0.01, upper: float = 0.99,
    ) -> DataFrame:
        """Winsorize: clamp each column to its exact [lower, upper]
        percentiles (``F.percentile`` — the exact interpolating
        aggregate, deterministic unlike approxQuantile). Adds
        ``{col}_clipped``; one global agg job + broadcast join, same
        scale shape as create_outlier_features. NULL inputs stay NULL
        (greatest/least skip nulls, which would otherwise silently
        impute the lower percentile — every FeatureEngineer transform
        propagates nulls)."""
        stats = df.select(
            *[F.percentile(F.col(c), lower).alias(f"__lo_{c}") for c in numeric_cols],
            *[F.percentile(F.col(c), upper).alias(f"__hi_{c}") for c in numeric_cols],
        )
        out = df.crossJoin(F.broadcast(stats))
        exprs = {
            f"{c}_clipped": F.when(
                F.col(c).isNotNull(),
                F.least(F.greatest(F.col(c), F.col(f"__lo_{c}")), F.col(f"__hi_{c}")),
            )
            for c in numeric_cols
        }
        out = with_columns(out, exprs)
        return out.drop(
            *[f"__lo_{c}" for c in numeric_cols],
            *[f"__hi_{c}" for c in numeric_cols],
        )

    # -- 10: lags (src/feature_engineering.py:178-196)
    def create_lag_features(
        self, df: DataFrame, partition_cols: list[str], order_col: str,
        value_col: str, lags: list[int] = (1, 7, 30),
    ) -> DataFrame:
        return lag_features(df, partition_cols, order_col, value_col, lags)

    # -- 11: rolling windows (src/feature_engineering.py:198-222)
    def create_rolling_features(
        self, df: DataFrame, partition_cols: list[str], order_col: str,
        value_col: str, windows: list[int] = (7, 30),
    ) -> DataFrame:
        return rolling_features(df, partition_cols, order_col, value_col, windows)

    # -- 12: frequency encoding (src/feature_engineering.py:224-233)
    def create_frequency_encoding(self, df: DataFrame, categorical_cols: list[str]) -> DataFrame:
        out = df
        for c in categorical_cols:
            out = join_back(out, freq_counts(out, c), [c])
        return out

    # -- 13: target encoding (src/feature_engineering.py:236-249)
    def create_target_encoding(
        self, df: DataFrame, categorical_cols: list[str], target_col: str
    ) -> DataFrame:
        out = df
        for c in categorical_cols:
            means = out.groupBy(c).agg(F.mean(target_col).alias(f"{c}_target_encoded"))
            out = join_back(out, means, [c])
        return out
