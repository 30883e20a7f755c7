"""Hash-stable aggregation of fixed-decimal doubles.

Floating-point SUM/AVG over a distributed table is order-dependent:
different partitionings give last-ulp-different results, which breaks
value-hash comparison against any oracle (SURVEY.md §7 traps). The test
data's money-like columns carry exactly 2 decimal digits, so we
aggregate them EXACTLY: scale to integer cents, sum as BIGINT (exact,
associative, order-independent), divide once at the end. The matching
oracle-SQL pattern is in ``__spark_entry__.py``.

At 100 TB this is also the *fast* path: integer sums vectorize better
than doubles and the map-side partial aggregation stays exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _cents(col: Column, scale: int) -> Column:
    return F.round(col * F.lit(10**scale)).cast("long")


def dsum(col: Column, scale: int = 2) -> Column:
    """Exact SUM of a fixed-decimal double.

    Oracle SQL: ``CAST(SUM(CAST(ROUND(x * 100) AS BIGINT)) AS BIGINT) / 100.0``
    """
    return F.sum(_cents(col, scale)) / F.lit(float(10**scale))


def davg(col: Column, scale: int = 2) -> Column:
    """Exact-sum AVG of a fixed-decimal double (one double division at the end).

    Oracle SQL:
    ``CAST(SUM(CAST(ROUND(x*100) AS BIGINT)) AS BIGINT) / 100.0 / COUNT(x)``
    """
    return F.sum(_cents(col, scale)) / F.lit(float(10**scale)) / F.count(col)


def dstddev_samp(col: Column, scale: int = 2) -> Column:
    """Sample stddev computed from exact integer moments.

    variance = (n·Σx² − (Σx)²) / (n·(n−1)), with x scaled to integer
    cents and moments summed as DECIMAL(38,0) (exact). The only float
    ops are one subtraction/division/sqrt on exactly-reproducible
    integers, so the result is bit-stable across partitionings and
    engines. Oracle SQL mirror uses HUGEINT.
    """
    x = _cents(col, scale).cast("decimal(38,0)")
    n = F.count(col).cast("decimal(38,0)")
    sx = F.sum(x)
    sxx = F.sum((x * x).cast("decimal(38,0)"))
    var_scaled = (sxx * n - sx * sx).cast("double") / (n * (n - F.lit(1).cast("decimal(38,0)"))).cast(
        "double"
    )
    return F.sqrt(var_scaled) / F.lit(float(10**scale))
