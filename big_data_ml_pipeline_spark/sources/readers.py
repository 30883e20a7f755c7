"""Batch sources (SURVEY.md §2a, S1-S5, S9).

Extension-dispatching loader with the reference's behavior
(reference src/ml_pipeline.py:57-74) minus its anti-pattern: no eager
``df.count()`` on load (an extra full scan that is wrong at 100 TB;
SURVEY.md §4).

Paths are engine-agnostic strings (local, s3a://, hdfs://) resolved by
Hadoop FS connectors, matching the reference's configured cloud paths
(reference config/pipeline_config.yaml:13-14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_data(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Load a table, dispatching on explicit ``fmt`` or file extension.

    Supported: parquet (S1), csv (S2, header+inferSchema like the
    reference src/ml_pipeline.py:65-66), json, orc, delta (S3; optional
    dependency — raises a clear error when delta-spark is absent).
    """
    fmt = (fmt or _infer_format(path)).lower()
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.options(**options).parquet(path)
    if fmt == "csv":
        opts = {"header": "true", "inferSchema": schema is None, **options}
        return reader.options(**opts).csv(path)
    if fmt in ("json", "jsonl"):
        return reader.options(**options).json(path)
    if fmt in ("text", "txt"):
        # Raw text corpora: one row per line, column `value` (the LLM
        # ingestion entry format next to JSONL).
        return reader.options(**options).text(path)
    if fmt == "orc":
        return reader.options(**options).orc(path)
    if fmt == "delta":
        try:
            return reader.format("delta").options(**options).load(path)
        except Exception as exc:  # pragma: no cover - optional dep
            raise RuntimeError(
                "delta format requested but delta-spark is not installed/configured"
            ) from exc
    raise ValueError(f"unsupported format: {fmt!r} for path {path!r}")


def _infer_format(path: str) -> str:
    lowered = path.rstrip("/").lower()
    for ext in ("parquet", "csv", "json", "jsonl", "orc", "txt"):
        if lowered.endswith("." + ext):
            return ext
    # The reference defaults unknown extensions to delta
    # (src/ml_pipeline.py:67-71); we default to parquet, the dominant
    # lake format, and require delta to be explicit.
    return "parquet"
