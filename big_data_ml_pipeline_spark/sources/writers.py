"""Batch sinks (SURVEY.md §2a, S6).

The reference writes batch predictions with ``mode("overwrite").parquet``
(reference api/api.py:213). We generalize: format dispatch, partitioned
writes (partitionBy is how a 100 TB table stays prunable), and optional
bucketing for shuffle-free downstream joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_data(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "delta":
        writer.format("delta").save(path)
    else:
        writer.format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table.

    Bucketing both sides of a recurring large join on the join key
    removes the shuffle entirely — the core scale lever for repeated
    fact-fact joins at 100 TB.
    """
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    num_files: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Range-cluster the output on ``cluster_col``: repartitionByRange
    so each output file covers a DISJOINT value range, then sort within
    partitions so row groups inside a file are ordered too.

    This is the file-layout lever for 100 TB scan pruning: parquet
    footers carry per-column min/max, so a predicate on the cluster
    column lets any engine (Spark, DuckDB, Trino) skip whole files and
    row groups. ``partitionBy`` prunes on LOW-cardinality columns via
    directories; range clustering prunes on HIGH-cardinality ones
    (timestamps, ids) without exploding the file count.

    repartitionByRange samples the column to pick balanced boundaries
    (skew-resistant); NULLs land in the first partition.
    """
    from pyspark.sql import functions as F

    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    n_shards: int,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Physical training-export sink: apply
    :func:`~..operators.setops.deterministic_shard` and land one
    ``shard=K`` directory per shard with rows ordered by ``pos`` inside
    the files — a trainer streaming ``shard=K`` sequentially reads the
    deterministic pseudo-random order with zero further shuffling.

    The shard window already exchanges on the shard key, so the write
    adds NO extra shuffle: tasks hold whole shards, sortWithinPartitions
    orders them, partitionBy splits directories. Re-running over
    re-partitioned input produces byte-identical shard membership and
    order (content-hash determinism) — at 100 TB that means a resumed
    or re-run export job never scrambles what a trainer already
    consumed.
    """
    from ..operators.setops import deterministic_shard

    (
        deterministic_shard(df, key_cols, n_shards)
        .sortWithinPartitions("shard", "pos")
        .write.mode(mode)
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    n_shards: int,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """JSONL training-corpus export: the :func:`write_training_shards`
    layout (deterministic ``shard=K`` directories, rows in the
    content-hash pseudo-random order) in newline-delimited JSON — the
    interchange format LLM training stacks actually consume. Spark's
    json sink writes one object per line, so each part file IS a
    ``.jsonl`` shard; pass ``compression='gzip'`` for ``.jsonl.gz``.

    Same scale contract as the parquet sink: the shard window already
    exchanged on the shard key, the write adds no shuffle, and reruns
    over re-partitioned input are byte-identical per shard.
    """
    from ..operators.setops import deterministic_shard

    writer = (
        deterministic_shard(df, key_cols, n_shards)
        .sortWithinPartitions("shard", "pos")
        .write.mode(mode)
        .partitionBy("shard")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.format("json").save(path)


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits_per_col: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Multi-column interleaved (Z-order) clustering: the
    :func:`write_range_clustered` idea for MORE THAN ONE high-
    cardinality predicate column. Range clustering makes files disjoint
    in ONE column; a filter on any other column still touches every
    file. Z-ordering quantile-buckets each column, interleaves the
    bucket bits into a Morton code, and range-clusters on the code —
    every listed column's values are then locally concentrated per
    file, so parquet footer min/max prunes files for predicates on ANY
    of them (the Delta/Iceberg OPTIMIZE ZORDER layout, expressed as a
    plain Spark write).

    Quantile bucketing (not fixed-width) keeps buckets balanced under
    skew; the cut points come from one ``approxQuantile`` pass
    (driver-side array of 2^bits values per column — KBs) and are
    embedded as broadcast literals, so the bucket assignment is
    map-only. The write is the same repartitionByRange +
    sortWithinPartitions shape as range clustering: ONE shuffle.

    NULLs sort to bucket 0 (the first file range), matching
    repartitionByRange's null placement.

    ``bits_per_col`` is auto-reduced so the interleaved code fits in the
    63 non-sign bits of a long — otherwise the top bucket bits would
    land in the sign bit and scramble the cluster order for high
    buckets.
    """
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("write_zorder requires at least one column")
    bits_per_col = min(bits_per_col, 63 // len(cols))
    if bits_per_col < 1:
        raise ValueError(f"too many z-order columns ({len(cols)}) for a 63-bit code")
    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = {
        c: q
        for c, q in zip(
            cols, df.stat.approxQuantile(cols, probs, 0.001)
        )
    }

    def bucket(c: str):
        lit_cuts = F.array(*[F.lit(float(x)) for x in cuts[c]])
        col = F.col(c).cast("double")
        return F.when(col.isNull(), F.lit(0)).otherwise(
            F.size(F.filter(lit_cuts, lambda x: x < col))
        )

    morton = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        b = bucket(c).cast("long")
        for i in range(bits_per_col):
            morton = morton + (
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + j,
                )
            )
    tagged = df.withColumn("__z", morton)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        tagged.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )
