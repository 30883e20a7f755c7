"""Set operations, sampling, sort/limit (SURVEY.md §2f).

The reference's only sampling operator is ``randomSplit([0.8, 0.2],
seed=42)`` (src/ml_pipeline.py:186); everything else here is declared
surface the engine exposes because real query workloads need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """UNION ALL by column name (safe under differing column order)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def distinct_union(*dfs: DataFrame) -> DataFrame:
    """SQL UNION (dedup) — a shuffle on all columns; prefer union_all
    + downstream dedup-on-key at scale."""
    return union_all(*dfs).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def random_split(
    df: DataFrame, weights: list[float] = (0.8, 0.2), seed: int = 42
) -> list[DataFrame]:
    """Reference train/test split (src/ml_pipeline.py:186), seed pinned."""
    return df.randomSplit(list(weights), seed=seed)


def top_k(df: DataFrame, order_exprs: list, k: int) -> DataFrame:
    """Global top-k: ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject,
    which keeps only k rows per partition then k overall (no full sort)."""
    return df.orderBy(*order_exprs).limit(k)
