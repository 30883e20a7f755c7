"""Vector math over ``array<float|double>`` columns — pure Catalyst.

Higher-order functions (`zip_with`, `aggregate`, `transform`) keep the
dot product / norms JVM-side and deterministic (sequential fold over the
array), so no Pandas UDF is needed for the dense-vector hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    """Cast array<float> → array<double> (exact widening) so downstream
    arithmetic is double-precision on every engine."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (sequential, deterministic).

    Oracle SQL (DuckDB): ``list_dot_product(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))``.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays; 0.0 when either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom).otherwise(F.lit(0.0))
