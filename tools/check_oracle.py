"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column
names/types and exact cell values (order-insensitive). Strictly harsher
than any reasonable hash check — if this passes, the driver's should.

Usage: PYTHONPATH=. python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from big_data_ml_pipeline_spark.session import get_session
from big_data_ml_pipeline_spark.sources.catalog import TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith(("datetime", "date")):
            df[c] = df[c].map(lambda v: None if v is None or v != v else str(v))
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count spark={len(sdf)} oracle={len(odf)}")
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        problems.append(f"columns spark={scols} oracle={ocols}")
        return problems
    s, o = normalize(sdf), normalize(odf)
    if len(s) != len(o):
        return problems
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            a = sv.astype(float)
            b = ov.astype(float)
            both_nan = a.isna() & b.isna()
            eq = (a == b) | both_nan
            if not eq.all():
                bad = (~eq).idxmax()
                diff = (a - b).abs().max()
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, max|Δ|={diff!r}, "
                    f"first at row {bad}: spark={a[bad]!r} oracle={b[bad]!r}"
                )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at row {bad}: "
                    f"spark={sv[bad]!r} oracle={ov[bad]!r} "
                    f"(dtypes {sv.dtype}/{ov.dtype})"
                )
    # dtype drift report (informational — the driver compares schemas)
    for c in sdf.columns:
        sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
        if sk != ok:
            problems.append(f"DTYPE col {c}: spark={sdf[c].dtype} oracle={odf[c].dtype}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_session(app_name="oracle-check", shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed, passed = [], []
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            odf = con.sql(sql).df()
            problems = compare(name, sdf, odf)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION {type(exc).__name__}: {exc}"]
        dt = time.time() - t0
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({dt:.1f}s)")
            for p in problems[:6]:
                print(f"     {p}")
        else:
            passed.append(name)
            print(f"ok   {name} ({dt:.1f}s)")

    print(f"\n{len(passed)} passed, {len(failed)} failed")
    if failed:
        print("failed:", " ".join(failed))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
