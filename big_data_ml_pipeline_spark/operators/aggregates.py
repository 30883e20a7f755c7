"""Aggregation operators (SURVEY.md §2d, A1-A5 + free Spark extras).

All single-job, single-pass: Spark's hash aggregation does map-side
partial aggregation automatically, so each of these is one shuffle of
pre-combined partials — the correct shape at 100 TB. The reference's
per-column ``first()`` loop (src/feature_engineering.py:163-165) is the
anti-pattern these replace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: stat name -> aggregate builder. "std" is SAMPLE stddev
#: (stddev_samp), matching both the reference and DuckDB defaults;
#: "stddev" is accepted as an alias but emits "{col}_std" so output
#: names match reference create_aggregation_features exactly.
STATS = {
    "mean": F.mean,
    "std": F.stddev_samp,
    "stddev": F.stddev_samp,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}

#: keys iterated when the caller doesn't pick stats ("stddev" excluded —
#: it's an input alias for "std", not a distinct stat).
_DEFAULT_STATS = ["mean", "std", "min", "max", "count"]


def grouped_stats(
    df: DataFrame,
    group_cols: list[str],
    agg_cols: list[str],
    stats: list[str] | None = None,
) -> DataFrame:
    """Per-group mean/std/min/max/count for each value column (A1).

    Output aliases ``{col}_{stat}`` exactly like reference
    src/feature_engineering.py:44-51 (note ``{col}_std``, not
    ``_stddev`` — API parity for code migrating off
    create_aggregation_features), computed as ONE multi-aggregate.
    """
    stats = [("std" if s == "stddev" else s) for s in (stats or _DEFAULT_STATS)]
    exprs = [
        STATS[s](F.col(c)).alias(f"{c}_{s}") for c in agg_cols for s in stats
    ]
    return df.groupBy(*group_cols).agg(*exprs)


def freq_counts(df: DataFrame, col: str) -> DataFrame:
    """Per-category row counts for frequency encoding (A2).

    Reference: src/feature_engineering.py:231."""
    return df.groupBy(col).agg(F.count("*").alias(f"{col}_freq"))


def target_means(df: DataFrame, col: str, target: str) -> DataFrame:
    """Per-category target means for target encoding (A3).

    Reference: src/feature_engineering.py:244-246."""
    return df.groupBy(col).agg(F.mean(target).alias(f"{col}_target_mean"))


def global_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Global (un-grouped) mean+stddev for many columns in ONE job (A4).

    Replaces the reference's per-column driver loop
    (src/feature_engineering.py:163-165: one Spark job per column).
    Output: ``{col}_mean``, ``{col}_std`` — the same ``_std`` suffix as
    :func:`grouped_stats` (RENAMED from ``{col}_stddev`` in r3 so the
    module uses one convention; ADVICE r2).
    """
    exprs = []
    for c in cols:
        exprs.append(F.mean(c).alias(f"{c}_mean"))
        exprs.append(F.stddev_samp(c).alias(f"{c}_std"))
    return df.select(*exprs)


def grouping_rollup(df: DataFrame, group_cols: list[str], agg_exprs: list) -> DataFrame:
    """ROLLUP aggregation (subtotals per prefix of group_cols + grand total)."""
    return df.rollup(*group_cols).agg(*agg_exprs)


def grouping_cube(df: DataFrame, group_cols: list[str], agg_exprs: list) -> DataFrame:
    """CUBE aggregation (all grouping-set combinations)."""
    return df.cube(*group_cols).agg(*agg_exprs)


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ approximate distinct count — the scale path for
    cardinality on 100 TB (exact COUNT(DISTINCT) is a full shuffle)."""
    return df.select(F.approx_count_distinct(col, rsd).alias(f"{col}_approx_distinct"))


def pivot_agg(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    values: list,
    agg_expr,
) -> DataFrame:
    """Wide pivot: one output column per pivot value, computed as a
    single hash aggregation (Spark rewrites pivot into conditional
    aggregates — no extra shuffle vs a plain groupBy). Passing
    ``values`` explicitly matters at scale: without it Spark first runs
    a distinct() job over the pivot column to discover them."""
    return df.groupBy(*group_cols).pivot(pivot_col, values).agg(agg_expr)


def unpivot(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Long melt of ``value_cols`` via the native ``unpivot`` operator
    (a zero-shuffle Expand: each input row emits len(value_cols) rows
    in place — never a UNION of re-scans)."""
    return df.unpivot(
        list(id_cols), list(value_cols), var_name, value_name
    )


def grouped_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-group percentiles, aliased ``p50``/``p90``/…

    ``exact=True`` uses SQL ``percentile`` (interpolated, bit-identical
    to DuckDB's ``quantile_cont`` — verified) but buffers each group's
    values; at 100 TB with huge groups switch ``exact=False`` for
    ``approx_percentile`` (t-digest sketch: bounded memory, mergeable
    map-side, no full buffer) and accept engine-specific results.
    """
    fn = "percentile" if exact else "approx_percentile"
    exprs = [
        F.expr(f"{fn}({value_col}, {p})").alias(f"p{str(p)[2:].ljust(2, '0')}")
        for p in percentiles
    ]
    return df.groupBy(*group_cols).agg(*exprs)
