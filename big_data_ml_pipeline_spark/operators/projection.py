"""Projection / scalar-expression operators (SURVEY.md §2b, P1-P10).

Single-pass design: the reference grows the logical plan with one
``withColumn`` per derived feature inside Python loops
(reference src/feature_engineering.py:63-73, 80-83) — at hundreds of
features that makes Catalyst analysis itself a bottleneck. Every
operator here emits ONE ``select`` with all expressions.
"""

from __future__ import annotations

from itertools import combinations
from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import (
    epoch_day_of_month,
    epoch_day_of_week,
    epoch_hour,
    epoch_is_weekend,
    null_safe_div,
)


def with_columns(df: DataFrame, exprs: Mapping[str, Column]) -> DataFrame:
    """Add/replace many derived columns in one projection (P2)."""
    existing = [F.col(c) for c in df.columns if c not in exprs]
    derived = [e.alias(name) for name, e in exprs.items()]
    return df.select(*existing, *derived)


def ratio_features(
    df: DataFrame, numerators: list[str], denominators: list[str]
) -> DataFrame:
    """All num/denom ratio columns, 0 on zero denominator (P5, P6).

    Semantics of reference src/feature_engineering.py:60-74 (ratio is 0,
    not null, when the denominator is 0), computed in a single select.
    Output columns: ``{num}_to_{denom}_ratio``.
    """
    exprs = {
        f"{n}_to_{d}_ratio": null_safe_div(F.col(n), F.col(d))
        for n in numerators
        for d in denominators
        if n != d
    }
    return with_columns(df, exprs)


def interaction_features(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Pairwise products ``{a}_x_{b}`` for all column pairs (P10).

    Reference: src/feature_engineering.py:76-85 (loop of withColumn);
    here one projection.
    """
    exprs = {f"{a}_x_{b}": F.col(a) * F.col(b) for a, b in combinations(feature_cols, 2)}
    return with_columns(df, exprs)


def time_features(df: DataFrame, timestamp_col: str) -> DataFrame:
    """Reference-faithful epoch-arithmetic time features (P7).

    hour / day_of_week / day_of_month / is_weekend exactly as
    reference src/feature_engineering.py:25-34 computes them (fractional
    doubles, Thursday-origin dow — see functions/scalar.py docstrings).
    """
    ts = F.col(timestamp_col)
    return with_columns(
        df,
        {
            "hour": epoch_hour(ts),
            "day_of_week": epoch_day_of_week(ts),
            "day_of_month": epoch_day_of_month(ts),
            "is_weekend": epoch_is_weekend(ts),
        },
    )


def time_features_native(df: DataFrame, timestamp_col: str) -> DataFrame:
    """Calendar-correct variant using native Catalyst date functions."""
    ts = F.col(timestamp_col)
    return with_columns(
        df,
        {
            "hour": F.hour(ts),
            "day_of_week": F.dayofweek(ts),  # 1 = Sunday .. 7 = Saturday
            "day_of_month": F.dayofmonth(ts),
            "is_weekend": F.dayofweek(ts).isin(1, 7).cast("int"),
        },
    )
