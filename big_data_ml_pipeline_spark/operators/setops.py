"""Set operations, sampling, sort/limit (SURVEY.md §2f).

The reference's only sampling operator is ``randomSplit([0.8, 0.2],
seed=42)`` (src/ml_pipeline.py:186); everything else here is declared
surface the engine exposes because real query workloads need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    """Reference train/test split (src/ml_pipeline.py:186), seed pinned.

    NB randomSplit samples per input partition, so the exact membership
    depends on how the scan was split — fine for ML sampling, wrong for
    anything that must be reproducible across cluster sizes or reruns
    over re-partitioned data. For that, use :func:`hash_split`."""
    return df.randomSplit(list(weights), seed=seed)


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    train_pct: int = 80,
    salt: str = "split-42",
) -> list[DataFrame]:
    """Content-deterministic train/test split: a row's bucket is
    ``md5(key || salt) % 100`` — a pure function of its key, so the
    split is identical on any partitioning, cluster size, or engine
    (the md5-derived hash is reproducible in ANSI SQL, cf.
    dedup.md5_hash32). This is the split a 100 TB training pipeline
    should use: adding executors or compacting files never moves a row
    across the boundary, unlike :func:`random_split`.

    NULL-keyed rows are handled explicitly (ADVICE r2): each key column
    is encoded ``'v' || value`` with NULL → ``'~'`` before joining with
    ``|``, so NULLs hash to a deterministic bucket instead of being
    silently skipped (``concat_ws`` drops NULL elements, which would
    make ('a', NULL) and (NULL, 'a') collide)."""
    from ..operators.dedup import md5_hash32

    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.concat(F.lit("v"), F.col(c).cast("string")), F.lit("~"))
            for c in key_cols
        ],
        F.lit(salt),
    )
    bucket = F.pmod(md5_hash32(key), F.lit(100))
    return [df.filter(bucket < train_pct), df.filter(bucket >= train_pct)]


def component_split(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    salt: str = "split-42",
    group_col: str | None = None,
) -> list[DataFrame]:
    """Leakage-safe train/test split (VERDICT r9 item 3): bucket on
    ``md5(duplicate-group label)`` instead of md5(row id), so every
    duplicate GROUP lands wholly on one side. Plain :func:`hash_split`
    can strand near-duplicate twins across the boundary — a test
    document whose near-copy sits in train is contamination that
    ngram/semantic decontamination (q105/q124) scrubbed at corpus prep
    and a row-keyed split silently reintroduces.

    ``components`` must be a RESOLVED (id, comp) label table — one row
    per id: batch :func:`~.dedup.connected_components` output, or
    ``resolve_components`` over the streaming ingests' VERSIONED state
    (passing the raw versioned table would multiply corpus rows
    through the join and could land one document on both sides — the
    exact leakage this operator exists to prevent, so duplicate labels
    fail loudly here). Documents without a label (never matched any
    duplicate screen) are singletons and bucket on their own id,
    identical to :func:`hash_split`. With ``group_col``, the resolved
    group label survives on the outputs (e.g. for per-split group
    accounting).

    Scale shape: ONE left equi-join of the corpus against the (much
    smaller) label table, then the same map-only md5 bucket filter as
    hash_split — content-deterministic across partitionings, cluster
    sizes, and engines."""
    comp = components.select(
        F.col("id").alias(id_col), F.col("comp").alias("__comp")
    ).dropDuplicates([id_col, "__comp"])
    # One label per id or fail loudly (see docstring). One small job
    # on the label table — far cheaper than the silent row
    # multiplication an unresolved versioned table would cause.
    conflicted = (
        comp.groupBy(id_col).count().filter(F.col("count") > 1).head(1)
    )
    if conflicted:
        raise ValueError(
            "component_split: components carries multiple labels for "
            f"{id_col}={conflicted[0][id_col]} — pass RESOLVED labels "
            "(resolve_components for versioned streaming state)"
        )
    keyed = df.join(comp, on=id_col, how="left").withColumn(
        "__grp", F.coalesce(F.col("__comp"), F.col(id_col))
    )
    train, test = hash_split(keyed, ["__grp"], train_pct, salt)
    if group_col:
        return [
            s.withColumnRenamed("__grp", group_col).drop("__comp")
            for s in (train, test)
        ]
    return [s.drop("__grp", "__comp") for s in (train, test)]


def stratified_sample(
    df: DataFrame, col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-class Bernoulli sampling (``DataFrame.sampleBy``) — the
    quick way to rebalance skewed classes/languages/domains. Membership
    depends on partitioning (per-partition RNG streams), so use
    :func:`deterministic_class_cap` when the sample must be
    reproducible across cluster layouts."""
    return df.sampleBy(col, fractions, seed)


def deterministic_class_cap(
    df: DataFrame,
    class_col: str,
    key_cols: list[str],
    max_per_class: int,
    salt: str = "cap-42",
) -> DataFrame:
    """Cap each class at ``max_per_class`` rows, chosen by md5 hash of
    the row key — a pure function of content, so the SAME rows survive
    on any partitioning, cluster size, or engine (cf. hash_split).
    This is how a 100 TB training mix caps over-represented sources
    without a bias toward storage order: one ranking window per class,
    and Spark's WindowGroupLimit pushes the rank bound below the
    exchange so only ``max_per_class`` rows per class are ever sorted.
    """
    from pyspark.sql import Window

    from ..operators.dedup import md5_hash32

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols], F.lit(salt))
    w = Window.partitionBy(class_col).orderBy(
        md5_hash32(key).asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_class)
        .drop("__rn")
    )


def weighted_class_sample(
    df: DataFrame,
    class_col: str,
    key_cols: list[str],
    weight_col: str,
    k_per_class: int,
    salt: str = "wsample-42",
) -> DataFrame:
    """Weighted sampling without replacement, k rows per class, via the
    Efraimidis-Spirakis A-res scheme: rank rows by u^(1/w) where u is a
    uniform derived from md5 of the row key — so, like
    :func:`deterministic_class_cap`, the SAME rows are chosen on any
    partitioning or cluster size, but selection probability scales with
    ``weight_col`` (e.g. a quality score: better documents sampled
    more). One ranking window per class; WindowGroupLimit bounds the
    per-class sort at k. Zero-or-negative weights never win against any
    positive weight (their sort key is forced to -inf)."""
    from pyspark.sql import Window

    from ..operators.dedup import md5_hash32

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols], F.lit(salt))
    # md5_hash32 ∈ [0, 2^32): shift to (0, 1] so ln(u) is finite.
    u = (md5_hash32(key) + F.lit(1.0)) / F.lit(float(1 << 32))
    w = F.col(weight_col).cast("double")
    # rank key: u^(1/w), computed as ln(u)/w for numerical range; larger
    # is better. Monotone transform → same order as u^(1/w).
    score = F.when(w > 0, F.log(u) / w).otherwise(F.lit(float("-inf")))
    order = [score.desc(), *[F.col(c).asc() for c in key_cols]]
    rn = F.row_number().over(Window.partitionBy(class_col).orderBy(*order))
    return df.withColumn("__rn", rn).filter(F.col("__rn") <= k_per_class).drop("__rn")


def deterministic_shard(
    df: DataFrame,
    key_cols: list[str],
    n_shards: int,
    salt: str = "shard-42",
) -> DataFrame:
    """Deterministic global shuffle + sharding for training export: the
    final step of a corpus pipeline, where documents must land in
    ``n_shards`` output files in an order uncorrelated with storage
    order (so a sequential trainer sees an i.i.d.-looking stream), yet
    bit-identically reproducible across reruns, cluster sizes, and
    engines. A row's shard is ``md5(key || salt) % n_shards`` and its
    position within the shard is its rank under an independent second
    hash (same md5 family, ``|order`` suffix) — both pure functions of
    content, like :func:`hash_split`.

    Scale shape: ONE shard-keyed exchange + per-shard sort. At 100 TB
    use n_shards in the thousands (shards ≈ several × cores) so each
    shard sorts a bounded slice; the sort key is an 8-byte hash, so
    this is exactly the repartition+sortWithinPartitions shape Spark's
    writers execute, expressed as a query. Adding executors or
    compacting input files never moves a row or changes its position.
    """
    from pyspark.sql import Window

    from ..operators.dedup import md5_hash32

    key = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in key_cols], F.lit(salt)
    )
    order_key = F.concat_ws("|", key, F.lit("order"))
    w = Window.partitionBy("shard").orderBy(
        md5_hash32(order_key).asc(), *[F.col(c).asc() for c in key_cols]
    )
    return df.withColumn(
        "shard", F.pmod(md5_hash32(key), F.lit(n_shards))
    ).withColumn("pos", F.row_number().over(w).cast("long"))


def top_k(df: DataFrame, order_exprs: list, k: int) -> DataFrame:
    """Global top-k: ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject,
    which keeps only k rows per partition then k overall (no full sort)."""
    return df.orderBy(*order_exprs).limit(k)


def proportional_mix(
    df: DataFrame,
    weights: dict[str, int],
    group_col: str = "source",
    key_cols: list[str] | None = None,
    salt: str = "mix-42",
) -> DataFrame:
    """Deterministic corpus mixing to integer target RATIOS: downsample
    every group so the surviving counts follow ``weights`` exactly —
    the "mix sources 3:2:1" step of training-corpus assembly (cf. the
    domain weights of The Pile / DoReMi-style mixtures), computed as a
    pure function of row content.

    The feasible scale is ``s = min_g floor(n_g / w_g)`` over the
    groups named in ``weights``; group g keeps exactly ``w_g * s``
    rows, chosen by md5 rank (same content-hash policy as
    :func:`deterministic_class_cap`, so the SAME rows survive on any
    partitioning, cluster size, or engine). Groups absent from
    ``weights`` are dropped — the mixture defines the corpus.

    Scale shape: two consumers of the input — a groupBy(count) whose
    |weights|-row result folds to the 1-row scale and broadcasts back,
    and the per-group ranking window. The count branch is map-side
    partial aggregation (15 longs cross the wire), but it DOES
    re-evaluate the input plan (its column pruning differs from the
    window branch, so the exchanges never canonicalize equal and AQE
    cannot reuse one); when the input is an expensive pipeline stage,
    materialize it first (parquet/localCheckpoint) — at 100 TB the
    mix runs over a landed corpus anyway. WindowGroupLimit cannot
    bound this window (the cap is a column, not a literal), so each
    group sorts fully; pre-filter with a cheap md5-threshold pass if
    groups are huge. Returns the surviving rows with their group
    column.
    """
    from pyspark.sql import Window

    from ..operators.dedup import md5_hash32

    keys = key_cols or []
    wmap = F.create_map(
        *[F.lit(x) for kv in sorted(weights.items()) for x in kv]
    )
    base = df.filter(F.col(group_col).isin(list(weights)))
    counts = (
        base.groupBy(group_col)
        .agg(F.count("*").alias("__n"))
        .select(
            F.floor(F.col("__n") / wmap[F.col(group_col)]).alias("__scale")
        )
        .agg(F.min("__scale").alias("__scale"))
    )
    key = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in keys], F.lit(salt)
    )
    w = Window.partitionBy(group_col).orderBy(
        md5_hash32(key).asc(), *[F.col(c).asc() for c in keys]
    )
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(counts))
        .filter(F.col("__rn") <= wmap[F.col(group_col)] * F.col("__scale"))
        .drop("__rn", "__scale")
    )


def temperature_mix_report(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.3,
    budget: int = 10_000,
) -> DataFrame:
    """Temperature-based mixture design (the multilingual-LM sampling
    recipe: draw group g with probability q_g ∝ p_g^α, α < 1 upweights
    the tail): per-group natural share p, tempered share q, and the
    integer document quota a ``budget``-sized sample should take from
    each group (capped at the group's size). The quota column is what
    :func:`proportional_mix` / :func:`deterministic_class_cap` then
    materialize.

    Determinism: p^α is quantized to integer nano-units per group; the
    normalizer is a BIGINT sum; the quota is PURE integer arithmetic
    (``(budget · w_q) DIV Σw_q``) — no float ever crosses an aggregate
    or a floor boundary, so the report is engine-exact.

    Scale shape: ONE map-side-combined count shuffle over the corpus;
    everything after runs on a |groups|-row table (two scalar
    broadcasts). At 100 TB this is the cheapest query in the pipeline.
    """
    c = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    t = c.select(F.sum("n_docs").cast("long").alias("n_total"))
    w = c.crossJoin(F.broadcast(t)).select(
        "g",
        "n_docs",
        "n_total",
        F.round(
            F.pow(F.col("n_docs").cast("double") / F.col("n_total"), F.lit(alpha))
            * 1e9
        )
        .cast("long")
        .alias("w_q"),
    )
    s = w.select(F.sum("w_q").cast("long").alias("sum_w"))
    return (
        w.crossJoin(F.broadcast(s))
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("n_total")).alias("p"),
            (F.col("w_q").cast("double") / F.col("sum_w")).alias("q"),
            F.least(
                F.col("n_docs"),
                F.expr(f"({budget} * w_q) DIV sum_w"),
            ).alias("quota"),
        )
    )
