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


def nested_double_lit(values) -> Column:
    """Literal (arbitrarily nested) array of doubles as ONE parsed
    expression.

    ``F.lit`` / ``F.array`` over Python lists issue one py4j call PER
    SCALAR — a 2048-entry PQ cross-term table costs ~4 s of pure
    driver time, and the IVF/PQ expression kits embed several such
    tables per query. Rendering the same doubles as a single SQL
    string (``repr`` + ``D`` suffix — exact round-trip, including
    subnormals and ±1.79e308, pinned in tests) and parsing it once is
    ~10× faster with bit-identical Literal values. Plan shape is
    unchanged (same nested-array Literal node), so exchange reuse and
    the SQL twins are unaffected. Non-finite values are rejected —
    none of the kits produce them."""

    def _fmt(v) -> str:
        if isinstance(v, (list, tuple)):
            if not v:
                # 'array()' parses as an empty UNTYPED array, silently
                # mismatching array<double> consumers downstream.
                raise ValueError("empty list in nested_double_lit")
            return "array(" + ",".join(_fmt(x) for x in v) + ")"
        fv = float(v)
        if fv != fv or fv in (float("inf"), float("-inf")):
            raise ValueError("non-finite value in nested_double_lit")
        return repr(fv) + "D"

    return F.expr(_fmt(values))
