"""Test-data catalog: the TPC-H-ish star schema the driver generates.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier
part orders lineitem events documents embeddings — one parquet each
under a scale-factor directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to always broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events(df)
    return df


def normalize_wallclock_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a file timestamp column to a µs TimestampType whose
    instant equals the file's wall clock read as UTC, matching DuckDB's
    naive read of the same parquet.

    Two generator vintages exist:
    - parquet TIMESTAMP(NANOS): with nanosAsLong it reads as a nanos
      BIGINT; convert via exact integer division (DIV 1000 — double
      division would round 19-digit nanos).
    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as
      TIMESTAMP_NTZ. Convert wall-clock → epoch µs with timestampdiff
      over NTZ operands (timezone-independent — a cast to TIMESTAMP
      would re-interpret through the session zone, and to_utc_timestamp
      coerces NTZ through the session zone before shifting), then
      rebuild the instant with timestamp_micros."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn(
            col,
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
                )
            ),
        )
    return df


def _normalize_events(df: DataFrame) -> DataFrame:
    return normalize_wallclock_ts(df, "ts")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the catalog; also pins runtime confs (UTC, AQE) so query
    semantics don't depend on who built the session."""
    apply_runtime_confs(spark)
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
