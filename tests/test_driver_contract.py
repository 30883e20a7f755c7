"""Sanity checks on the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import __spark_entry__ as entrymod

from conftest import SF0001


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # non-SQL-expressible queries are the documented rows-only set
    rows_only = set(qs) - set(oracles)
    assert all(name >= "q40" for name in rows_only)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    got = df.collect()
    assert len(got) == 6  # 3 returnflag × 2 linestatus groups at sf0.001
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_queries_return_aliased_columns(spark):
    """Driver hash-compare sorts columns by name — no query may emit a
    default aggregate name like 'sum(x)' or 'count(1)'."""
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, SF0001)
        for c in df.columns:
            assert "(" not in c, f"{name} leaks unaliased column {c!r}"
