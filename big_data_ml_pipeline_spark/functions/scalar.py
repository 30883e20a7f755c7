"""Scalar expression helpers (SURVEY.md §2b, §2g).

All pure Column→Column builders — they stay inside Catalyst/codegen, no
Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def null_safe_div(num: Column, denom: Column, on_zero: float = 0.0) -> Column:
    """Guarded division: ``num/denom`` when ``denom != 0`` else ``on_zero``.

    Matches the reference's ratio-feature semantics — 0 (not null) on a
    zero denominator, null only when inputs are null (reference
    src/feature_engineering.py:60-74). Oracle SQL:
    ``CASE WHEN d <> 0 THEN n / d ELSE 0 END``.
    """
    return F.when(denom != 0, num / denom).otherwise(F.lit(on_zero))


# ---------------------------------------------------------------------------
# Reference-semantics time features (reference src/feature_engineering.py:25-34).
# The reference derives time parts by *epoch arithmetic*, not calendar
# functions, and its `/` is Spark double division, so every feature is a
# FRACTIONAL double: hour = epoch%86400/3600, day_of_week =
# (epoch/86400)%7 (Thursday-origin AND fractional), day_of_month =
# (epoch/86400)%31+1. We reproduce those semantics faithfully under
# ``epoch_*`` names and recommend the native calendar functions
# (F.hour / F.dayofweek / F.dayofmonth) for new code.
# ---------------------------------------------------------------------------


def _epoch_seconds(ts: Column) -> Column:
    # cast(ts as long) truncates sub-second precision.
    return ts.cast("timestamp").cast("long")


def epoch_hour(ts: Column) -> Column:
    """Fractional hour-of-day via epoch arithmetic: ``epoch % 86400 / 3600``.

    Oracle SQL: ``(CAST(floor(epoch(ts)) AS BIGINT) % 86400) / 3600.0``.
    """
    return _epoch_seconds(ts) % 86400 / 3600


def epoch_day_of_week(ts: Column) -> Column:
    """Fractional day-of-week: ``(epoch / 86400) % 7`` — 0 = Thursday.

    Oracle SQL: ``(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) % 7``.
    """
    return _epoch_seconds(ts) / 86400 % 7


def epoch_day_of_month(ts: Column) -> Column:
    """Reference's (incorrect, reproduced) day-of-month: (epoch/86400)%31+1.

    Oracle SQL: ``(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) % 31 + 1``.
    """
    return _epoch_seconds(ts) / 86400 % 31 + 1


def epoch_is_weekend(ts: Column) -> Column:
    """Weekend flag exactly as the reference computes it
    (src/feature_engineering.py:32): ``isin([5,6])`` against the
    *fractional* day_of_week, so it fires only at exact midnights that
    land on epoch-dow 5/6. Faithful reproduction; use
    ``F.dayofweek(ts).isin(1, 7)`` for a real weekend flag. 1/0 int."""
    return F.when(epoch_day_of_week(ts).isin(5.0, 6.0), 1).otherwise(0)


def json_get(col: Column, field: str) -> Column:
    """Extract a top-level JSON field as string.

    Spark: ``get_json_object(col, '$.field')``; DuckDB oracle:
    ``json_extract_string(col, '$.field')``.
    """
    return F.get_json_object(col, f"$.{field}")
