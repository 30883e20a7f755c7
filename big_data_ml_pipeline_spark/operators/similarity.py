"""Similarity search over embedding columns (north-star extension).

Two tiers:
 - ``brute_force_topk`` — exact cosine top-k against a query vector.
   One broadcast of the query + a single TakeOrderedAndProject; the
   baseline and the correctness oracle.
 - ``lsh_bucketed_pairs`` / ``ivf_topk`` — the scale paths. Random
   hyperplane LSH (signed projections) buckets vectors so candidate
   generation is per-bucket; IVF assigns vectors to the nearest of k
   sampled centroids and searches only the query's nprobe cells.

All vector math is Catalyst higher-order functions over array<double>
(functions/vector.py) — deterministic, no UDF, no collect — except
``cosine_near_dup_pairs_gemm``, which batches each block's pair matrix
through one numpy GEMM (measured 5× faster than the per-pair
zip_with fold at sf0.1 with bit-identical 6-digit-rounded output).
"""

from __future__ import annotations

import math
import sys
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import (
    cosine_similarity,
    dot,
    dot_sql,
    double_sql,
    l2_norm,
    l2_norm_sql,
    cached_expr,
    nested_double_lit,
    safe_ident,
    to_double_array,
    to_double_array_sql,
)

if TYPE_CHECKING:  # imported lazily inside tasks
    import pandas as pd


def brute_force_topk(
    embeddings: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k of ``embeddings`` rows against the single row
    in ``query_df``. Returns (id, sim) ordered by sim desc, id asc.

    The query side is broadcast (1 row); the scan side streams — no
    shuffle at all, and the global top-k is TakeOrderedAndProject
    (k rows per partition → k total), which is exactly the right plan
    at any scale.
    """
    q = F.broadcast(
        query_df.select(
            to_double_array(F.col(query_vec_col)).alias("__q")
        ).withColumn("__qn", l2_norm("__q"))
    )
    # Norms aliased once per side (cosine_similarity inline would
    # re-fold each norm per consumer — the CSE trap, see NOTES); same
    # fold order as the naive form, so results are bit-identical.
    denom = F.col("__n") * F.col("__qn")
    sim = F.when(denom != 0, dot("__v", "__q") / denom).otherwise(
        F.lit(0.0)
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        embeddings.select(
            F.col(id_col), to_double_array(F.col(vec_col)).alias("__v")
        )
        .withColumn("__n", l2_norm("__v"))
        .crossJoin(q)
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact k-nearest-neighbours JOIN: top-k corpus rows per query row.

    The query set is broadcast (a query batch is small by definition);
    the corpus streams through one projection computing all query sims,
    then a per-query ranking window keeps k rows. Shuffle = (qid) keys
    only — corpus×queries never materializes beyond the map side.
    Similarity is rounded before ranking so ties break identically on
    every engine (then by corpus id).
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("qid"),
            to_double_array(F.col(query_vec_col)).alias("__q"),
        ).withColumn("__qn", l2_norm("__q"))
    )
    # Norms once per side (see brute_force_topk); bit-identical to the
    # inline cosine, just not re-folded per consumer.
    denom = F.col("__n") * F.col("__qn")
    sim = F.round(
        F.when(denom != 0, dot("__v", "__q") / denom).otherwise(
            F.lit(0.0)
        ),
        round_digits,
    )
    scored = (
        embeddings.select(
            F.col(id_col), to_double_array(F.col(vec_col)).alias("__v")
        )
        .withColumn("__n", l2_norm("__v"))
        .crossJoin(q)
        .select(F.col("qid"), F.col(id_col), sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "sim", F.col("rn").cast("long").alias("rn"))
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    block_cols: list[str],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_block_size: int | None = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocking-key groups.

    All-pairs cosine is O(n²); blocking on ``block_cols`` turns the
    candidate set into an equi-join keyed on the block, so the shuffle
    partitions by block key and pairs never form across blocks — the
    standard near-dup shape at corpus scale (block by language/domain/
    LSH bucket). Each row's L2 norm is computed ONCE in the projection
    below the join, so a candidate pair costs a single zip_with dot
    product. Blocks beyond ``max_block_size`` degrade to a linear star
    join on the min-id representative (dedup._bucket_pairs). Returns
    (id_a, id_b, sim) with id_a < id_b and rounded sim >= threshold.
    """
    from .dedup import _bucket_pairs

    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        to_double_array(F.col(vec_col)).alias("__v"),
    ).withColumn("__n", l2_norm("__v"))
    cand = _bucket_pairs(base, list(block_cols), ["__v", "__n"], max_block_size)
    denom = F.col("__n_a") * F.col("__n_b")
    sim = F.round(
        F.when(denom != 0, dot("__v_a", "__v_b") / denom).otherwise(0.0),
        round_digits,
    )
    return (
        cand.select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def cosine_near_dup_pairs_gemm(
    df: DataFrame,
    block_cols: list[str],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_block_size: int | None = 4096,
) -> DataFrame:
    """Blocked near-dup pairs with the within-block compute as one GEMM.

    Same contract as :func:`cosine_near_dup_pairs` (id_a < id_b, sim
    rounded and thresholded), but each block's all-pairs cosine is a
    single numpy ``(M/|M|) @ (M/|M|).T`` inside ``applyInPandas`` —
    Arrow moves the block once and BLAS does the O(n²·d) work, instead
    of one zip_with allocation + fold per candidate pair. Measured 5×
    faster at sf0.1; output matched the Catalyst version bit-for-bit
    after 6-digit rounding.

    At 100 TB the blocking key must keep blocks bounded (lang alone is
    too coarse — compose with an LSH bucket, cf. ``lsh_bucketed_pairs``);
    each task materializes one block's matrix (n·d doubles) plus its
    upper-triangle sims. Blocks beyond ``max_block_size`` degrade to a
    linear star comparison against the block's min-id row (same policy
    as dedup._bucket_pairs) — the n·n sim matrix is never allocated for
    a degenerate block.
    """
    # Executors may not have this package on PYTHONPATH (the driver
    # harness imports us by file path) — serialize the closure by value.
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass

    thr, digits = float(threshold), int(round_digits)
    max_block = None if max_block_size is None else int(max_block_size)

    def block_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        ids = pdf["__id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "sim": "float64"}
            )
        M = np.stack(pdf["__v"].to_numpy()).astype("float64", copy=False)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0] = 1.0  # zero vectors → sim 0 with everything
        unit = M / norms
        if max_block is not None and len(ids) > max_block:
            # Degenerate block: star against the min-id row, O(n·d).
            order = np.argsort(ids)
            ids_s, unit_s = ids[order], unit[order]
            sims = np.round(unit_s[1:] @ unit_s[0], digits)
            keep = sims >= thr
            return pd.DataFrame(
                {
                    "id_a": np.full(int(keep.sum()), ids_s[0]),
                    "id_b": ids_s[1:][keep],
                    "sim": sims[keep],
                }
            )
        sims_full = unit @ unit.T
        iu = np.triu_indices(len(ids), k=1)
        sims = np.round(sims_full[iu], digits)
        ia, ib = ids[iu[0]], ids[iu[1]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        keep = sims >= thr
        return pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep], "sim": sims[keep]})

    prepped = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in block_cols],
        to_double_array(F.col(vec_col)).alias("__v"),
    )
    return prepped.groupBy(*block_cols).applyInPandas(
        block_pairs, schema="id_a long, id_b long, sim double"
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure Python, tiny;
    shipped to executors as literals)."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def _bucket_expr(vec_col, planes: list[list[float]]):
    """Signed-projection LSH bucket id: bit i = sign(v · plane_i)."""
    bits = []
    for i, plane in enumerate(planes):
        lit_plane = nested_double_lit(plane)
        proj = dot(vec_col, lit_plane)
        bits.append(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucketed_pairs(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int | None = 4096,
    n_tables: int = 1,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold among vectors
    sharing a signed-projection LSH bucket. The self-join is an
    equi-join on the bucket id (one shuffle, Σ|bucket|² work) instead of
    an n² cross join; buckets beyond ``max_bucket_size`` degrade to a
    linear star join on the min-id representative (dedup._bucket_pairs)
    so an identical-vector flood cannot go quadratic.

    ``n_tables`` OR-amplifies recall: a single n-plane table catches a
    pair with probability (1 - θ/π)^n_planes (≈0.4-0.55 for cosine
    ≈0.95 at 8 planes — measured in tests/test_recall_quality.py), so
    T independent tables lift recall to 1-(1-p)^T at T× the bucket-join
    cost. The join key becomes (table, bucket) — still one equi-join
    shuffle — and each pair is kept once (min-table wins). Default 1
    keeps the single-table shape the oracle twin (q42) mirrors in SQL.
    """
    from .dedup import _bucket_pairs

    # Materialize the double-cast vector once; feeding the raw
    # to_double_array expression into _bucket_expr would re-cast the
    # array once per plane (the two-consumer CSE trap, see NOTES).
    base = embeddings.select(
        F.col(id_col).alias("id"), to_double_array(F.col(vec_col)).alias("v")
    )
    if n_tables == 1:
        planes = random_hyperplanes(dim, n_planes, seed)
        tagged = base.select(
            "id", "v", _bucket_expr(F.col("v"), planes).alias("bucket")
        )
        cand = _bucket_pairs(tagged, ["bucket"], ["v"], max_bucket_size)
    else:
        # One row per (vector, table): explode the T bucket ids computed
        # in a single projection, then the SAME single equi-join keyed
        # by (table, bucket). Derived seeds keep tables independent yet
        # deterministic.
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    _bucket_expr(
                        F.col("v"), random_hyperplanes(dim, n_planes, seed + 1000 * t)
                    ).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        tagged = base.select(
            "id", "v", F.explode(buckets).alias("tb")
        ).select("id", "v", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
        cand = _bucket_pairs(
            tagged, ["tbl", "bucket"], ["v"], max_bucket_size
        ).dropDuplicates(["id_a", "id_b"])
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("v_a"), F.col("v_b")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def deterministic_ivf_centroids(
    dim: int, n_cells: int = 16, seed: int = 42
) -> list[list[float]]:
    """Pseudo-random gaussian centroids from a seeded generator — pure
    Python literals, identical on every engine/partitioning (the same
    shared-literal trick as :func:`random_hyperplanes`). Worse recall
    per probe than KMeans cells, but exactly reproducible in an ANSI
    SQL twin — the oracle anchor for the IVF machinery."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_cells)]


def fit_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> list[list[float]]:
    """Offline IVF coarse quantizer: MLlib KMeans over the embedding
    column (distributed Lloyd iterations), returning the k cluster
    centers as plain Python lists — small enough to ship to every
    executor as literals/broadcast regardless of corpus size. Fit once,
    reuse across many ``ivf_topk`` calls (the standard IVF build/probe
    split)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    df = embeddings.select(
        array_to_vector(to_double_array(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(df)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _centroid_exprs(cents: list[list[float]], round_assign_digits: int | None):
    """Shared centroid-literal machinery for assignment and probing:
    returns (cell_sims, top_cells) closures over the broadcast centroid
    and centroid-norm literal arrays (see ivf_topk for the bit-stability
    reasoning).

    Both closures accept column NAMES (strings) or Columns. The string
    path renders the identical expression as ONE SQL string parsed
    server-side (r17: the pyspark HOF builders cost ~15-30 py4j round
    trips each, and driver-side construction dominated the IVF/PQ
    query family's wall clock); the trees and values are bit-identical
    either way. ``top_cells`` composes with ``cell_sims`` — passing
    the string output of one into the other keeps the whole fan-out a
    single parse."""
    cent_sql = double_sql([[float(x) for x in c] for c in cents])
    cnorm_sql = double_sql(
        [math.sqrt(sum(x * x for x in c)) for c in cents]
    )
    cent_lit = cached_expr(cent_sql)
    cnorm_lit = cached_expr(cnorm_sql)

    def cell_sims_sql(vec: str, vnorm: str) -> str:
        den = f"({vnorm} * nc)"
        s = (
            f"zip_with({cent_sql}, {cnorm_sql}, (c, nc) -> "
            f"CASE WHEN ({den} != 0) THEN ({dot_sql(vec, 'c')} / {den}) "
            "ELSE 0.0D END)"
        )
        if round_assign_digits is not None:
            s = f"transform({s}, s -> round(s, {int(round_assign_digits)}))"
        return s

    def cell_sims(vec, vnorm):
        # String operands are substituted INSIDE the (c, nc) lambda
        # body, so names must be plain identifiers and not c/nc;
        # anything else takes the (identical-tree) Column path.
        if (
            safe_ident(vec, ("c", "nc")) is not None
            and safe_ident(vnorm, ("c", "nc")) is not None
        ):
            return cached_expr(cell_sims_sql(vec, vnorm))
        if isinstance(vec, str):
            vec = F.col(vec)
        if isinstance(vnorm, str):
            vnorm = F.col(vnorm)
        sims = F.zip_with(
            cent_lit,
            cnorm_lit,
            lambda c, nc: F.when(
                (vnorm * nc) != 0, dot(vec, c) / (vnorm * nc)
            ).otherwise(F.lit(0.0)),
        )
        if round_assign_digits is not None:
            sims = F.transform(sims, lambda s: F.round(s, round_assign_digits))
        return sims

    def top_cells(sims, n: int):
        if isinstance(sims, str):
            return cached_expr(
                f"transform(slice(reverse(array_sort(zip_with({sims}, "
                f"sequence(0, {len(cents) - 1}), "
                "(s, i) -> struct(s AS s, (-i) AS ni)))), "
                f"1, {int(n)}), p -> -(p.ni))"
            )
        idx = F.sequence(F.lit(0), F.lit(len(cents) - 1))
        ranked = F.reverse(
            F.array_sort(
                F.zip_with(
                    sims, idx, lambda s, i: F.struct(s.alias("s"), (-i).alias("ni"))
                )
            )
        )
        return F.transform(F.slice(ranked, 1, n), lambda p: -p["ni"])

    cell_sims.sql = cell_sims_sql
    return cell_sims, top_cells


def ivf_index(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_assign_digits: int | None = None,
) -> DataFrame:
    """Persistable IVF index: (id, v, cell) — every vector assigned to
    its nearest centroid. Land as parquet (partition or range-cluster
    by ``cell``) and probe arriving queries with
    ``ivf_topk(..., index=loaded)`` — the build/probe split at scale:
    the 100 TB corpus is assigned ONCE (a single broadcast-map pass),
    and each query batch reads only its nprobe cells. The centroids
    are plain literals, so an index built months ago probes
    identically today."""
    cell_sims, _ = _centroid_exprs(centroids, round_assign_digits)
    return (
        embeddings.select(
            F.col(id_col), to_double_array(F.col(vec_col)).alias("v")
        )
        .withColumn("__vnorm", l2_norm("v"))
        .withColumn("__sims", cell_sims("v", "__vnorm"))
        .select(
            F.col(id_col),
            "v",
            (F.array_position(F.col("__sims"), F.array_max(F.col("__sims"))) - 1)
            .cast("int")
            .alias("cell"),
        )
    )


def ivf_knn_join(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    round_assign_digits: int | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """Batch IVF probe: approximate top-k corpus rows for EVERY query
    row — the multi-query twin of :func:`ivf_topk` and the approximate
    twin of :func:`knn_join`. Returns (qid, id, sim, rn).

    The corpus is assigned once (or comes prebuilt via ``index``); the
    query batch — small by definition — computes its nprobe cells in
    one projection and is broadcast, so the probe is ONE equi-join on
    ``cell`` touching ~nprobe/n_cells of the corpus, then a per-query
    ranking window over the candidates only. At 100 TB with the index
    parquet range-clustered by cell, footer pruning means a query batch
    physically reads only its probed cells. Recall vs the exact
    :func:`knn_join` is measured with asserted floors in
    tests/test_recall_quality.py; nprobe = n_cells reproduces the exact
    result by construction.
    """
    from pyspark.sql import Window

    cell_sims, top_cells = _centroid_exprs(centroids, round_assign_digits)
    assigned = (
        index
        if index is not None
        else ivf_index(embeddings, centroids, id_col, vec_col, round_assign_digits)
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("qid"),
            to_double_array(F.col(query_vec_col)).alias("qv"),
        )
        .withColumn("__qnorm", l2_norm("qv"))
        .select(
            "qid",
            "qv",
            "__qnorm",
            F.explode(
                top_cells(cell_sims.sql("qv", "__qnorm"), nprobe)
            ).alias("cell"),
        )
    )
    # Norms hoisted to once-per-row projections (corpus side below the
    # join, query side in the broadcast): cosine_similarity inline
    # would re-fold ||v|| per probing query and ||qv|| per candidate —
    # the q43 CSE trap. denom-product + guard matches the inline
    # expression bit-for-bit.
    denom = F.col("__n") * F.col("__qnorm")
    scored = (
        assigned.withColumn("__n", l2_norm("v"))
        .join(q, on="cell")
        .select(
            F.col("qid"),
            F.col(id_col),
            F.round(
                F.when(denom != 0, dot("v", "qv") / denom).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "sim", F.col("rn").cast("long").alias("rn"))
    )


def ivf_recall_report(
    embeddings: DataFrame,
    centroids: list[list[float]],
    query_pred,
    k: int = 10,
    nprobes: tuple[int, ...] = (1, 2, 4),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_assign_digits: int | None = 6,
) -> DataFrame:
    """The nprobe ↔ recall trade-off an IVF index owes its users
    (VERDICT r8 item 6): for every probe budget in ``nprobes``, the
    measured recall@k of the IVF probe against the EXACT brute-force
    top-k over the same corpus and query set. Returns one row per
    budget — (nprobe, n_queries, n_hits, recall) with ``recall =
    n_hits / (n_queries·k)`` (micro-averaged; a probed-cell set holding
    fewer than k members is a real recall penalty and is charged as
    one).

    Engine-exact and oracle-twinnable end to end: cell assignment uses
    the rounded-argmax/ASC-tie determinism kit, candidate cosines are
    rounded to 6 digits before ranking, ties break by corpus id, and
    the final recall is one bigint/bigint IEEE division.

    Scale shape: the corpus is assigned ONCE (a broadcast-map pass
    shared by every probe budget — NOT one assignment per nprobe);
    probing all budgets together costs a single cell equi-join against
    the max(nprobes)-cell query fan-out plus one (nprobe, qid) ranking
    window over the candidate rows; the exact baseline is the q38
    broadcast knn_join. Only the query batch is ever broadcast."""
    spark = embeddings.sparkSession
    # Normalize the budgets (ADVICE r9): a duplicate nprobe would emit
    # duplicate (nprobe, cell_rank) rows in the budget fan-out below,
    # double-counting every candidate inside that budget's ranking
    # window and corrupting its top-k/recall; a budget beyond the cell
    # count would silently report the exhaustive number under a label
    # promising more cells than exist.
    nprobes = tuple(sorted({int(n) for n in nprobes}))
    if not nprobes or nprobes[0] < 1:
        raise ValueError(f"nprobes must be positive ints, got {nprobes}")
    if nprobes[-1] > len(centroids):
        raise ValueError(
            f"max nprobe {nprobes[-1]} exceeds the index's "
            f"{len(centroids)} cells"
        )
    cell_sims, top_cells = _centroid_exprs(centroids, round_assign_digits)
    max_np = max(nprobes)
    assigned = ivf_index(
        embeddings, centroids, id_col, vec_col, round_assign_digits
    )
    queries = embeddings.filter(query_pred)
    # Query → its max(nprobes) closest cells, keeping the probe rank so
    # one candidate join serves every budget (cell_rank <= nprobe).
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"),
            to_double_array(F.col(vec_col)).alias("qv"),
        )
        .withColumn("__qnorm", l2_norm("qv"))
        .select(
            "qid",
            "qv",
            "__qnorm",
            F.posexplode(
                top_cells(cell_sims.sql("qv", "__qnorm"), max_np)
            ).alias("__p", "cell"),
        )
        .withColumn("cell_rank", (F.col("__p") + 1).cast("int"))
        .drop("__p")
    )
    denom = F.col("__n") * F.col("__qnorm")
    cand = (
        assigned.withColumn("__n", l2_norm("v"))
        .join(q, on="cell")
        .select(
            "qid",
            F.col(id_col),
            F.round(
                F.when(
                    denom != 0, dot("v", "qv") / denom
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("sim"),
            "cell_rank",
        )
    )
    # (nprobe, cell_rank) expanded driver-side so the budget fan-out is
    # an EQUI broadcast join on cell_rank, not a theta-join BNL.
    budgets = F.broadcast(
        spark.createDataFrame(
            [
                (int(n), r)
                for n in sorted(nprobes)
                for r in range(1, int(n) + 1)
            ],
            "nprobe int, cell_rank int",
        )
    )
    w = Window.partitionBy("nprobe", "qid").orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    ranked = (
        cand.join(budgets, on="cell_rank")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
    )
    exact = knn_join(
        embeddings, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=id_col, query_vec_col=vec_col,
    ).select("qid", F.col(id_col), F.lit(1).alias("__hit"))
    return (
        ranked.join(exact, on=["qid", id_col], how="left")
        .groupBy(F.col("nprobe").cast("long").alias("nprobe"))
        .agg(
            F.countDistinct("qid").cast("long").alias("n_queries"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hits"),
        )
        .withColumn(
            "recall",
            F.col("n_hits") / (F.col("n_queries") * F.lit(int(k))),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    round_assign_digits: int | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: every vector is assigned to its
    nearest centroid (argmax cosine, computed against the broadcast
    centroid array); the query searches only its ``nprobe`` closest
    cells.

    ``centroids`` should come from :func:`fit_ivf_centroids` (real
    KMeans cells → balanced lists, better recall per probe) or
    :func:`deterministic_ivf_centroids` (cross-engine reproducible).
    When None, falls back to a deterministic corpus sample — cheaper to
    build, worse cell balance. At 100 TB the assignment pass is a
    single broadcast-map job and the search touches nprobe/n_cells of
    the data.

    Ties in cell ranking break toward the LOWER cell index, and
    ``round_assign_digits`` rounds assignment cosines first — together
    these make cell assignment bit-stable across engines so an ANSI SQL
    twin (ORDER BY sim DESC, cell ASC) computes the identical IVF.

    ``index``: a prebuilt :func:`ivf_index` table (possibly reloaded
    from parquet) assigned with the SAME centroids — skips the
    assignment pass entirely; only the query side computes cell sims.
    """
    if index is not None and centroids is None:
        raise ValueError("index requires the centroids it was built with")
    if centroids is None:
        cents = [
            row["c"]
            for row in (
                embeddings.select(to_double_array(F.col(vec_col)).alias("c"))
                .orderBy(F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed)))
                .limit(n_cells)
                .collect()
            )
        ]
    else:
        cents = centroids
    # Centroid + norm literals precomputed driver-side: sqrt of the
    # same sequential double fold DuckDB's sqrt(list_dot_product(c,c))
    # and Spark's l2_norm both run, so the literal is bit-identical to
    # computing it per row — which Catalyst otherwise does (a literal
    # inside a HOF lambda referencing the lambda variable cannot
    # constant-fold). The row's norm is passed into cell_sims as a
    # column computed ONCE (the naive per-cell cosine_similarity
    # re-folds it n_cells times — the dominant cost of the assignment
    # pass). Argmax uses first-occurrence (= lowest-index) tie-break;
    # __sims is a materialized column so the 16 dot folds run once.
    cell_sims, top_cells = _centroid_exprs(cents, round_assign_digits)
    assigned = (
        index
        if index is not None
        else ivf_index(embeddings, cents, id_col, vec_col, round_assign_digits)
    )
    q = F.broadcast(
        query_df.select(to_double_array(F.col(vec_col)).alias("qv"))
        .withColumn("__qnorm", l2_norm("qv"))
        .select(
            "qv",
            "__qnorm",
            F.explode(
                top_cells(cell_sims.sql("qv", "__qnorm"), nprobe)
            ).alias("cell"),
        )
    )
    # Candidate scoring with once-per-row norms (the same CSE fix as
    # the assignment pass above); bit-identical to inline
    # cosine_similarity.
    denom = F.col("__n") * F.col("__qnorm")
    return (
        assigned.withColumn("__n", l2_norm("v"))
        .join(q, on="cell")
        .select(
            F.col(id_col),
            F.round(
                F.when(denom != 0, dot("v", "qv") / denom).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def semdedup(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.85,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_assign_digits: int | None = None,
    round_digits: int = 6,
    max_cell_size: int | None = 4096,
    use_gemm: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with a coarse quantizer,
    find cosine near-duplicate pairs WITHIN each cluster only, and
    remove every vector that has a qualifying twin with a lower id
    (the paper keeps one representative per duplicate set; min-id is
    the deterministic, SQL-expressible greedy version of that rule —
    a vector survives iff no lower-id vector in its cell is within
    ``threshold``).

    Returns one row per input vector: (id, cell, is_kept) with
    ``is_kept`` a BIGINT flag (1 = survivor, 0 = semantic duplicate).

    Scale shape: assignment is the :func:`ivf_index` broadcast-map
    pass (no shuffle); candidate pairs form only inside a cell via the
    blocked equi-join of :func:`cosine_near_dup_pairs` (GEMM variant
    when ``use_gemm``), so the O(n²) is bounded per cell — at 100 TB
    you grow ``len(centroids)`` with the corpus so cells stay bounded,
    and ``max_cell_size`` star-degrades any degenerate cell. The final
    flag join is an id-keyed equi-join against the (small) removed
    set. The corpus is scanned twice (assignment feeds both the pair
    join and the output flag join — both branches are map-only above
    the scan); persist the index (``ivf_index`` → parquet) to make the
    second read a cheap columnar re-scan at scale.
    """
    assigned = ivf_index(embeddings, centroids, id_col, vec_col, round_assign_digits)
    pair_fn = cosine_near_dup_pairs_gemm if use_gemm else cosine_near_dup_pairs
    pairs = pair_fn(
        assigned,
        block_cols=["cell"],
        threshold=threshold,
        id_col=id_col,
        vec_col="v",
        round_digits=round_digits,
        max_block_size=max_cell_size,
    )
    removed = (
        pairs.select(F.col("id_b").alias(id_col)).distinct().withColumn("__rm", F.lit(1))
    )
    return (
        assigned.select(id_col, "cell")
        .join(removed, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("cell").cast("long").alias("cell"),
            F.when(F.col("__rm").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_kept"),
        )
    )


def _dim_scales(
    df: DataFrame, id_col: str, vec_col: str
) -> tuple[DataFrame, DataFrame]:
    """(exploded elements, per-dimension max-abs scales). ``pos`` is
    1-based (matches SQL array indexing / generate_series)."""
    e = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(to_double_array(F.col(vec_col))).alias("pos0", "val"),
    ).select("id", (F.col("pos0") + 1).cast("long").alias("pos"), "val")
    scales = e.groupBy("pos").agg(F.max(F.abs(F.col("val"))).alias("scale"))
    return e, scales


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-dimension scalar quantization of an embedding
    corpus to ``bits``-bit integer codes — the storage/bandwidth lever
    of a 100 TB vector pipeline (int8 cuts an array<float> column 4×
    and feeds SIMD distance kernels downstream). Each dimension d gets
    scale_d = max|v_d| over the corpus; codes are
    ``round(v / scale * (2^(bits-1)-1))`` ∈ [-127, 127] for int8.

    Returns (id, codes array<int>, one row per vector). Max-abs is the
    right symmetric scale for zero-centred embeddings; the per-dim
    scales (a dim-count-row table) broadcast back onto the element
    stream, so the cost is one posexplode + one dim-key shuffle of
    dim-count partials + one id-key re-assembly shuffle. Re-assembly
    sorts each vector's elements by pos inside the aggregate (array_
    sort on (pos, code) structs) — deterministic on any partitioning.
    """
    levels = float((1 << (bits - 1)) - 1)
    e, scales = _dim_scales(df, id_col, vec_col)
    coded = e.join(F.broadcast(scales), "pos").select(
        "id",
        "pos",
        F.when(
            F.col("scale") > 0,
            F.round(F.col("val") / F.col("scale") * F.lit(levels)),
        )
        .otherwise(F.lit(0.0))
        .cast("int")
        .alias("code"),
    )
    return (
        coded.groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
        .select(F.col("id").alias(id_col), "codes")
    )


def quantization_report(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-dimension reconstruction-error report for
    :func:`quantize_embeddings` — the go/no-go check before committing
    a corpus to int8 storage: (pos, scale, mean_abs_err, max_abs_err,
    n_vals) per dimension, errors measured between ``v`` and the
    dequantized ``code * scale / levels``.

    Determinism (oracle-checkable): per-element abs errors are
    quantized to integer nano-units before the SUM (the unigram_loglik
    pattern) so the mean is exact integer arithmetic; scale and max
    are exact aggregates rounded once for display. Scale shape: one
    posexplode + dim-key scales (broadcast back, map-side) + ONE
    dim-key shuffle of integer partials — output is dim-count rows
    regardless of corpus size.
    """
    levels = float((1 << (bits - 1)) - 1)
    e, scales = _dim_scales(df, id_col, vec_col)
    err = e.join(F.broadcast(scales), "pos").select(
        "pos",
        "scale",
        F.abs(
            F.col("val")
            - F.when(
                F.col("scale") > 0,
                F.round(F.col("val") / F.col("scale") * F.lit(levels))
                * F.col("scale")
                / F.lit(levels),
            ).otherwise(F.lit(0.0))
        ).alias("abs_err"),
    )
    return err.groupBy("pos").agg(
        F.round(F.max("scale"), 6).alias("scale"),
        (
            F.sum(F.round(F.col("abs_err") * 1e9).cast("long")).cast("double")
            / (F.count("*") * F.lit(1e9))
        ).alias("mean_abs_err"),
        F.round(F.max("abs_err"), 6).alias("max_abs_err"),
        F.count("*").cast("long").alias("n_vals"),
    )


def quantized_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Cosine top-k computed over the int8-quantized corpus — what
    retrieval looks like AFTER committing to :func:`quantize_embeddings`
    storage: both sides dequantized to the nearest code level with the
    corpus's per-dimension scales, so the returned similarities carry
    exactly the quantization error a code-resident index would.
    Returns (id, qsim) ordered by qsim desc, id asc.

    Determinism (oracle-checkable): the dot product and norms are
    sums of per-dimension terms quantized to integer pico-units
    (ROUND(term·1e12) AS BIGINT — the unigram_loglik pattern at higher
    precision), so the aggregation is exact integer arithmetic on any
    partitioning; one sqrt+divide at the end, rounded once.

    Scale shape: corpus exploded once; scales (dim-count rows) and the
    dequantized query (dim-count rows) broadcast onto the element
    stream map-side; ONE id-key shuffle of two integer partials; then
    TakeOrderedAndProject. At 100 TB you'd store the codes (the
    quantize-once path) and keep only the search half of this plan —
    fused here so the oracle can check quantize+search end-to-end.
    """
    levels = F.lit(float((1 << (bits - 1)) - 1))

    def dq(val):
        return (
            F.when(
                F.col("scale") > 0,
                F.round(val / F.col("scale") * levels) * F.col("scale") / levels,
            )
            .otherwise(F.lit(0.0))
        )

    e, scales = _dim_scales(df, id_col, vec_col)
    deq = e.join(F.broadcast(scales), "pos").select(
        "id", "pos", dq(F.col("val")).alias("dq")
    )
    qe, _ = _dim_scales(query_df, id_col, vec_col)
    qdq = qe.join(F.broadcast(scales), "pos").select(
        "pos", dq(F.col("val")).alias("qdq")
    )
    nb = qdq.select(
        F.sum(F.round(F.col("qdq") * F.col("qdq") * 1e12).cast("long")).alias(
            "nb_q"
        )
    )
    pv = (
        deq.join(F.broadcast(qdq), "pos")
        .groupBy("id")
        .agg(
            F.sum(F.round(F.col("dq") * F.col("qdq") * 1e12).cast("long")).alias(
                "dot_q"
            ),
            F.sum(F.round(F.col("dq") * F.col("dq") * 1e12).cast("long")).alias(
                "na_q"
            ),
        )
    )
    sim = F.when(
        (F.col("na_q") > 0) & (F.col("nb_q") > 0),
        (F.col("dot_q").cast("double") / 1e12)
        / (
            F.sqrt(F.col("na_q").cast("double") / 1e12)
            * F.sqrt(F.col("nb_q").cast("double") / 1e12)
        ),
    ).otherwise(F.lit(0.0))
    return (
        pv.crossJoin(F.broadcast(nb))
        .select(F.col("id").alias(id_col), F.round(sim, round_digits).alias("qsim"))
        .orderBy(F.col("qsim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def semantic_decontamination(
    train: DataFrame,
    eval_df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
    round_assign_digits: int | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """Embedding-space train/eval decontamination — the semantic
    complement of :func:`~.dedup.ngram_contamination`: flag every
    training vector whose cosine similarity to ANY eval-set vector
    reaches ``threshold`` (paraphrased benchmark leakage that n-gram
    overlap misses). Returns one row per training vector:
    (id, max_eval_sim, is_clean BIGINT).

    Scale shape: the training corpus is assigned to IVF cells once (or
    comes prebuilt via ``index`` — at 100 TB, the same persisted cell
    index the search path uses); the eval set — small by definition —
    expands to its ``nprobe`` nearest cells and broadcasts, so
    candidate scoring is ONE equi-join on ``cell`` touching
    ~nprobe/n_cells of the corpus. A train vector lives in exactly one
    cell, so (train, eval) candidate pairs are unique by construction
    — the per-train max needs no dedup. Like all IVF paths this is
    approximate: recall of flagged pairs follows the measured IVF
    recall floors (tests/test_recall_quality.py); nprobe = n_cells is
    exhaustive.
    """
    cell_sims, top_cells = _centroid_exprs(centroids, round_assign_digits)
    assigned = (
        index
        if index is not None
        else ivf_index(train, centroids, id_col, vec_col, round_assign_digits)
    )
    q = F.broadcast(
        eval_df.select(
            F.col(eval_id_col).alias("qid"),
            to_double_array(F.col(eval_vec_col)).alias("qv"),
        )
        .withColumn("__qnorm", l2_norm("qv"))
        .select(
            "qid",
            "qv",
            "__qnorm",
            F.explode(
                top_cells(cell_sims.sql("qv", "__qnorm"), nprobe)
            ).alias("cell"),
        )
    )
    # Norms hoisted once per row on each side (the ivf_knn_join CSE
    # fix); denom-product + guard is bit-identical to the inline
    # cosine_similarity expression.
    denom = F.col("__n") * F.col("__qnorm")
    worst = (
        assigned.withColumn("__n", l2_norm("v"))
        .join(q, on="cell")
        .groupBy(id_col)
        .agg(
            F.max(
                F.round(
                    F.when(
                        denom != 0, dot("v", "qv") / denom
                    ).otherwise(F.lit(0.0)),
                    6,
                )
            ).alias("__max_sim")
        )
    )
    # Output base: the raw train ids, NOT assigned.select(id) — the
    # assignment keeps every row, so the id sets are identical, and
    # re-using `assigned` here would evaluate the 16-cell centroid
    # fold a second time (measured ~2× the query cost at sf0.1).
    ids = (
        index.select(id_col)
        if index is not None
        else train.select(F.col(id_col))
    )
    return (
        ids.join(worst, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__max_sim"), F.lit(0.0)).alias("max_eval_sim"),
            F.when(F.coalesce(F.col("__max_sim"), F.lit(0.0)) < threshold, 1)
            .otherwise(0)
            .cast("long")
            .alias("is_clean"),
        )
    )


def semantic_decontamination_pq(
    train: DataFrame,
    eval_df: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    threshold: float = 0.30,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
    round_assign_digits: int | None = None,
    round_digits: int = 9,
    screen_round_digits: int = 6,
    index: DataFrame | None = None,
    residual: bool = False,
) -> DataFrame:
    """:func:`semantic_decontamination` over a CODES-ONLY train side —
    the decontamination pass a 100 TB deployment actually runs: the
    training corpus is represented by its persisted
    :func:`ivf_pq_index` (``index`` — id, cell, codes; m small ints
    per vector), the eval set broadcasts with its nprobe cell fan-out
    plus per-subspace ADC lookup tables, and every (train, eval)
    candidate is scored by the asymmetric ADC cosine (raw eval vector
    vs the train vector's reconstruction) in m ``element_at`` lookups
    — NO raw training vector is read at screen time. Same output
    contract as the raw operator: (id, max_eval_sim, is_clean) with
    the rounded per-train MAX (order-independent, so the SQL twin is
    exact — q172). ADC similarity is bounded by quantization
    distortion (q167/q169), so thresholds calibrate against the ADC
    scale, not the raw-cosine scale; recall vs the raw screen follows
    the measured distortion, and ``nprobe = n_cells`` makes the CELL
    side exhaustive.

    ``residual=True`` speaks the RESIDUAL code space (an
    ``ivf_pq_index(residual=True)`` train side): the ADC cosine
    scores the raw eval vector against centroid(cell) +
    reconstruction via the residual screen kit — the post-join
    ``cell`` is the TRAIN vector's assigned cell, exactly what the
    cross-term algebra needs. Pass the matching index or let the
    inline encode build it."""
    enc = (
        index
        if index is not None
        else ivf_pq_index(
            train, centroids, codebooks, id_col, vec_col,
            round_assign_digits, round_digits, residual=residual,
        )
    )
    prep_raw, adc_cos = pq_adc_screen_kit(
        codebooks, centroids=centroids if residual else None
    )
    cell_sims, top_cells = _centroid_exprs(centroids, round_assign_digits)
    qbase = prep_raw(
        eval_df.select(
            F.col(eval_id_col).alias("qid"),
            to_double_array(F.col(eval_vec_col)).alias("__qv"),
        ),
        F.col("__qv"),
    )
    # __adc_norm IS the eval vector's L2 norm — reuse it for the cell
    # ranking instead of folding a second norm (the q43 re-fold trap).
    q = F.broadcast(
        qbase.select(
            "qid",
            "__adc_luts",
            "__adc_norm",
            *(["__adc_cdots"] if residual else []),
            F.explode(
                top_cells(
                    cell_sims.sql("__qv", "__adc_norm"), nprobe
                )
            ).alias("cell"),
        )
    )
    worst = (
        enc.join(q, on="cell")
        .groupBy(id_col)
        .agg(
            F.max(
                F.round(adc_cos("codes"), screen_round_digits)
            ).alias("__max_sim")
        )
    )
    ids = (
        index.select(id_col)
        if index is not None
        else train.select(F.col(id_col))
    )
    return (
        ids.join(worst, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__max_sim"), F.lit(0.0)).alias("max_eval_sim"),
            F.when(F.coalesce(F.col("__max_sim"), F.lit(0.0)) < threshold, 1)
            .otherwise(0)
            .cast("long")
            .alias("is_clean"),
        )
    )


def cluster_balanced_sample(
    embeddings: DataFrame,
    centroids: list[list[float]],
    per_cell: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_assign_digits: int | None = None,
    salt: str = "cbs-42",
) -> DataFrame:
    """Cluster-balanced diversity sampling (the SSL-prototype /
    DataComp recipe: sample evenly across embedding-space clusters
    instead of uniformly over rows, so dense regions stop dominating
    the training mix): assign every vector to its IVF cell (the q43
    deterministic centroid kit), keep at most ``per_cell`` rows per
    cell chosen by content-hash rank, and return every input row as
    (id, cell, is_kept).

    The within-cell rank is ``md5(id || salt)`` (the hash_split /
    proportional_mix family), so the kept set is a pure function of
    content — identical across partitionings, reruns, engines — and
    NOT correlated with storage order the way a LIMIT-per-cell would
    be.

    Scale shape: assignment is the same broadcast-literal map pass as
    :func:`ivf_index` (no shuffle); the rank is ONE cell-keyed window
    shuffle of (id, cell) pairs — 16 bytes a row, never the vectors.
    Cells are capped at ``per_cell`` regardless of skew, so a
    degenerate dense cluster cannot blow up any downstream consumer.
    """
    from pyspark.sql import Window

    from .dedup import md5_hash32

    assigned = ivf_index(
        embeddings,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        round_assign_digits=round_assign_digits,
    ).select(id_col, "cell")
    rank_key = md5_hash32(
        F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
    )
    w = Window.partitionBy("cell").orderBy(rank_key.asc(), F.col(id_col).asc())
    return assigned.withColumn(
        "is_kept", F.row_number().over(w) <= F.lit(per_cell)
    )


def rrf_fuse(
    rankings: list[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009): combine any number
    of (id, rank) rankings into ``score = Σ 1/(k+rank)``, the
    hybrid-retrieval glue between a lexical ranking (BM25, q126) and a
    semantic one (embedding cosine, q28/q122) that needs no score
    calibration between systems. Each input contributes its rank as a
    ``{name}_rank`` column (NULL when the item is absent from that
    system, contributing 0 to the score).

    Determinism: ranks are small integers and each term is one IEEE
    division — the sum has a fixed expression order, so the fused
    score is engine-exact. Scale shape: a chain of full-outer
    id-equi-joins over TOP-K-sized inputs (retrieval candidates, not
    corpora) — trivially broadcastable.
    """
    out = None
    for df, name in rankings:
        side = df.select(F.col(id_col), F.col("rank").alias(f"{name}_rank"))
        out = side if out is None else out.join(side, on=id_col, how="full_outer")
    score = None
    for _, name in rankings:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"{name}_rank")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return out.withColumn("rrf_score", score)


def ivf_cell_stats(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_assign_digits: int | None = None,
) -> DataFrame:
    """IVF index health report: one row per CELL (including empty
    ones) with its vector count, corpus fraction, and load factor
    (count / perfectly-balanced count). The observability query behind
    ANN operations at scale — a load factor ≫ 1 on a hot cell means
    probe latency skew and a stale centroid set; empty cells mean
    wasted nprobe budget. Pure integers + one ratio, engine-exact.

    Scale shape: the assignment is the broadcast-literal map pass of
    :func:`ivf_index`; the aggregation shuffles |cells| integer
    partials. The full cell list comes from the centroid literals, so
    empty cells survive via a left join at |cells| scale.
    """
    n_cells = len(centroids)
    assigned = ivf_index(
        embeddings, centroids, id_col=id_col, vec_col=vec_col,
        round_assign_digits=round_assign_digits,
    )
    counts = assigned.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_vectors")
    )
    total = counts.select(F.sum("n_vectors").cast("long").alias("n_total"))
    spark = embeddings.sparkSession
    all_cells = spark.range(n_cells).select(F.col("id").cast("int").alias("cell"))
    return (
        all_cells.join(counts, "cell", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "cell",
            F.coalesce("n_vectors", F.lit(0)).cast("long").alias("n_vectors"),
            (F.coalesce("n_vectors", F.lit(0)).cast("double") / F.col("n_total"))
            .alias("frac"),
            (
                F.coalesce("n_vectors", F.lit(0)).cast("double")
                * F.lit(n_cells)
                / F.col("n_total")
            ).alias("load_factor"),
        )
    )


def ivf_recenter(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_assign_digits: int | None = None,
) -> DataFrame:
    """One deterministic Lloyd update of the IVF centroid set — the
    index-MAINTENANCE operator for a drifting corpus: when the ingest
    drift table (streaming/embeddings cell-histogram JSD) or
    :func:`ivf_cell_stats` load factors show mass migrating across
    cells, recenter each cell on the mean of its current members and
    rebuild the index with the updated centroids.

    Returns one row per (cell, pos): (cell, pos, n_members,
    centroid_val) — the pos-th coordinate (1-based) of the cell's new
    centroid and the membership count; empty cells emit no rows (keep
    their old centroid or retire them — the caller's policy). The mean
    uses the q92 quantized-integer pattern (coordinates scaled to 1e-6
    integers before the SUM), so the result is partition-order
    independent and engine-exact — a *verifiable* KMeans step, unlike
    an MLlib refit.

    Scale shape: assignment is the broadcast-literal map pass of
    :func:`ivf_index`; the update is ONE (cell, pos) aggregation with
    map-side partials — |cells|·dim output rows, no window, no
    collect, nothing driver-side.
    """
    assigned = ivf_index(
        embeddings, centroids, id_col=id_col, vec_col=vec_col,
        round_assign_digits=round_assign_digits,
    )
    ex = assigned.select("cell", F.posexplode("v").alias("pos0", "x"))
    return (
        ex.groupBy(
            F.col("cell").cast("long").alias("cell"),
            (F.col("pos0") + 1).cast("long").alias("pos"),
        )
        .agg(
            F.count("*").cast("long").alias("n_members"),
            (
                F.sum(F.round(F.col("x") * 1_000_000).cast("long")).cast("bigint")
                / (F.count("*") * F.lit(1_000_000.0))
            ).alias("centroid_val"),
        )
    )


def ivf_recenter_loop(
    embeddings: DataFrame,
    centroids: list[list[float]],
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``n_iters`` chained Lloyd steps as ONE lazy Catalyst plan, with
    per-iteration convergence evidence: (iter, cell, n_members,
    inertia_q) — the quantized-integer cell inertia
    ``Σ round((1−csim)·10⁶)`` under that iteration's centroid set.
    The driver-surface form of the :func:`ivf_recenter` maintenance
    step (orchestrator ``recenter_iters`` collects the KB-scale
    centroid update between steps; here iteration-2 centroids stay a
    DATAFRAME, so nothing ever lands on the driver and the whole loop
    is one oracle-checkable query).

    Engine-exact by integer quantization end to end: dot products and
    norms are sums of per-coordinate ``round(x·c·10¹²)`` BIGINT terms
    (commutative — partition-order independent, unlike a float sum),
    cosine is rounded to 6 digits before the argmax (ASC cell ties),
    and recentered coordinates are ``round(Σ round(x·10⁶)/n)`` integer
    micro-units; empty cells keep their previous centroid. Every
    arithmetic step maps 1:1 onto the generated SQL twin.

    Scale shape: per iteration, one broadcast cross join of the corpus
    against the |cells|-row centroid table (map-only scoring via a
    fixed-order zip_with fold), one |corpus|-keyed ranking window on
    (id) — perfectly spread — and one (cell, pos) aggregation with
    map-side partials for the update. No collect, no literal rebuild:
    the plan composes across iterations.

    Cost note (ADVICE r8): with the fully-lazy composition each
    iteration's centroid DataFrame embeds every prior iteration's
    assignment subplan, so corpus-scoring work grows roughly
    quadratically in ``n_iters`` — fine at the default 2 (the q155
    shape: one lazy plan, oracle-exact), expensive beyond it. For
    ``n_iters > 2`` the |cells|-row centroid table is therefore
    ``localCheckpoint``-ed between iterations, truncating the lineage
    so each iteration scores the corpus exactly once (values are
    identical — only plan reuse changes).
    """
    Q = 1_000_000
    P = 1_000_000_000_000
    spark = embeddings.sparkSession
    c1q = [[int(round(x * Q)) for x in c] for c in centroids]
    cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(c1q)],
        "cell int, carr_q array<bigint>",
    )

    def iqsum(arr):
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda a, t: a + t
        )

    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "nv_q",
        iqsum(
            F.transform(
                "v", lambda x: F.round(x * x * P).cast("long")
            )
        ),
    )
    reports = []
    for it in range(1, n_iters + 1):
        cc = cents.select(
            "cell",
            F.transform(
                "carr_q", lambda q: q.cast("double") / Q
            ).alias("c"),
        ).withColumn(
            "nc_q",
            iqsum(
                F.transform(
                    "c", lambda x: F.round(x * x * P).cast("long")
                )
            ),
        )
        dot_q = iqsum(
            F.zip_with(
                "v", "c", lambda x, c: F.round(x * c * P).cast("long")
            )
        )
        sim = F.round(
            (dot_q.cast("double") / P)
            / (
                F.sqrt(F.col("nv_q").cast("double") / P)
                * F.sqrt(F.col("nc_q").cast("double") / P)
            ),
            6,
        )
        scored = base.crossJoin(F.broadcast(cc)).select(
            "id", "v", "cell", sim.alias("csim")
        )
        wv = Window.partitionBy("id").orderBy(
            F.col("csim").desc(), F.col("cell").asc()
        )
        assigned = scored.withColumn(
            "__rn", F.row_number().over(wv)
        ).filter(F.col("__rn") == 1)
        reports.append(
            assigned.groupBy(
                F.col("cell").cast("long").alias("cell")
            )
            .agg(
                F.count("*").cast("long").alias("n_members"),
                F.sum(
                    F.round((F.lit(1.0) - F.col("csim")) * Q).cast("long")
                )
                .cast("long")
                .alias("inertia_q"),
            )
            .select(
                F.lit(it).cast("long").alias("iter"),
                "cell",
                "n_members",
                "inertia_q",
            )
        )
        if it < n_iters:
            ex = assigned.select(
                "cell", F.posexplode("v").alias("pos0", "x")
            )
            upd = ex.groupBy("cell", "pos0").agg(
                F.round(
                    F.sum(
                        F.round(F.col("x") * Q).cast("long")
                    ).cast("double")
                    / F.count("*")
                )
                .cast("long")
                .alias("cq")
            )
            newc = upd.groupBy("cell").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos0", "cq"))),
                    lambda s: s["cq"],
                ).alias("carr_q")
            )
            cents = (
                cents.select("cell", F.col("carr_q").alias("__old"))
                .join(newc, "cell", "left")
                .select(
                    "cell",
                    F.coalesce("carr_q", "__old").alias("carr_q"),
                )
            )
            if n_iters > 2:
                # Pin the KB-scale centroid table so iteration k+1
                # does not re-embed (and re-run) iterations 1..k's
                # corpus-scoring subplans — see docstring cost note.
                cents = cents.localCheckpoint(eager=True)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def hard_negative_pairs(
    embeddings: DataFrame,
    centroids: list[list[float]],
    k_pos: int = 5,
    k_neg: int = 5,
    query_pred=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
    round_assign_digits: int | None = None,
    salt: str = "neg-42",
    n_buckets: int = 8,
) -> DataFrame:
    """Contrastive-training pair mining: for every query vector, its
    ``k_pos`` nearest corpus neighbours (label 1, via the q110 batch
    IVF probe) plus ``k_neg`` deterministic random non-neighbours
    (label 0, content-hash-ranked rows that did NOT surface as
    positives) — the (query, candidate, sim-or-null, label) table a
    retriever/embedding trainer consumes.

    The negative pool is an EQUI-join on content-hash buckets: every
    query owns the pseudo-random bucket ``md5(qid) % n_buckets`` and
    pairs only with candidates whose ``md5(cand_id) % n_buckets``
    matches — a 1/n_buckets slice of the corpus per query, never the
    query × corpus cross join. Within the pool, negatives are md5-rank
    selected over (qid, cand_id, salt) and anti-joined against the
    positives so labels never collide; self-pairs are excluded from
    both sides. Everything is a pure content function — reproducible
    on any partitioning or engine.

    Scale shape: positives are the :func:`ivf_knn_join` banded probe
    (never all-pairs); the negative pool is one bucket-keyed equi-join
    whose per-query fan-out is corpus/n_buckets — raise ``n_buckets``
    with the corpus so the pool stays bounded (the default 8 keeps the
    q137 oracle twin stable; it is a knob, not a constant).
    """
    from pyspark.sql import Window

    from .dedup import md5_hash32

    queries = (
        embeddings.filter(query_pred)
        if query_pred is not None
        else embeddings
    )
    pos = ivf_knn_join(
        embeddings, queries, centroids, k=k_pos + 1, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col,
        round_assign_digits=round_assign_digits,
    )
    # ivf_knn_join returns (qid, vec_id, sim, rn); drop self-matches and
    # re-rank to k_pos.
    pos = (
        pos.filter(F.col("qid") != F.col(id_col))
        .withColumn(
            "rn2",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.col("sim").desc(), F.col(id_col).asc()
                )
            ),
        )
        .filter(F.col("rn2") <= k_pos)
        .select("qid", F.col(id_col).alias("cand_id"), "sim")
        .withColumn("label", F.lit(1))
    )
    qids = queries.select(F.col(id_col).alias("qid")).withColumn(
        "__bkt",
        F.pmod(
            md5_hash32(F.concat_ws("|", F.col("qid"), F.lit(salt + "-q"))),
            F.lit(n_buckets),
        ),
    )
    cands = embeddings.select(F.col(id_col).alias("cand_id")).withColumn(
        "__bkt",
        F.pmod(
            md5_hash32(F.concat_ws("|", F.col("cand_id"), F.lit(salt + "-c"))),
            F.lit(n_buckets),
        ),
    )
    pool = (
        qids.join(cands, "__bkt")
        .filter(F.col("qid") != F.col("cand_id"))
        .join(pos.select("qid", "cand_id"), ["qid", "cand_id"], "left_anti")
    )
    w = Window.partitionBy("qid").orderBy(
        md5_hash32(
            F.concat_ws("|", F.col("qid"), F.col("cand_id"), F.lit(salt))
        ).asc(),
        F.col("cand_id").asc(),
    )
    neg = (
        pool.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_neg)
        .select(
            "qid", "cand_id",
            F.lit(None).cast("double").alias("sim"),
            F.lit(0).alias("label"),
        )
    )
    return pos.unionByName(neg)


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ — Jégou et al. 2011, "Product
# Quantization for Nearest Neighbor Search"). The memory-bounded ANN
# layer: a 64-double vector becomes m small integer codes, so the
# candidate side of a probe carries bytes instead of the raw vectors —
# at 100 TB the difference between an index that fits hot storage and
# one that doesn't. Same build/probe split and determinism-kit
# conventions as the IVF machinery above.
# ---------------------------------------------------------------------------


def pq_codebooks(
    dim: int, m: int = 8, k: int = 16, seed: int = 42
) -> list[list[list[float]]]:
    """Deterministic per-subspace codebooks (the oracle anchor, like
    :func:`deterministic_ivf_centroids`): m codebooks of k centroids
    over dim/m-wide subvectors, pure Python literals reproducible in
    an ANSI SQL twin. Data-blind — for real retrieval quality train
    with :func:`fit_pq_codebooks`; this kit pins the MACHINERY
    (encode/ADC arithmetic) exactly."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    return [
        deterministic_ivf_centroids(dim=d, n_cells=k, seed=seed + 1000 * (j + 1))
        for j in range(m)
    ]


def fit_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    sample_fraction: float | None = None,
    centroids: list[list[float]] | None = None,
    round_assign_digits: int | None = None,
    rotation: list[list[float]] | None = None,
) -> list[list[list[float]]]:
    """Data-trained codebooks: one seeded MLlib KMeans per subspace
    over the sliced subvectors (the PQ paper's training step). m
    bounded fits over dim/m-wide columns; returns plain literals like
    every other centroid kit so downstream encode/probe plans are
    identical either way.

    With ``centroids``, training runs over the RESIDUALS
    v − centroid(cell) (Jégou 2011 §III-A trains the product
    quantizer on residuals for IVFADC) — pass the same assignment
    knobs the index build uses so training sees exactly the vectors
    the codes will quantize.

    With ``rotation`` (OPQ, Ge 2013 — ADVICE r15: codebooks installed
    into a rotated code space must be TRAINED in that space), training
    runs over R·v — or R·(v − centroid) under ``centroids``, the same
    rotate-after-subtract order :func:`pq_append_codes` encodes with —
    so the fitted entries live where the codes will quantize. One
    extra map-only projection (a transform over the rotation Literal
    dotting the materialized vector, the q43 no-re-fold pattern).

    ``sample_fraction`` (VERDICT r10 item 2's scale bound): codebook
    training needs a representative SAMPLE, not the corpus — at 100 TB
    m sequential full-corpus KMeans fits are the dominant build cost
    for no recall benefit (Jégou 2011 trains on subsets). When set,
    ONE seeded Bernoulli sample is drawn, projected to the double
    array, and persisted, so the m fits share a single bounded scan
    instead of m full re-reads."""
    from pyspark.ml.functions import array_to_vector

    base = embeddings.select(to_double_array(F.col(vec_col)).alias("v"))
    if sample_fraction is not None:
        base = base.sample(fraction=sample_fraction, seed=seed)
    if centroids is not None:
        cell_sims, top_cells = _centroid_exprs(centroids, round_assign_digits)
        base = base.withColumn("__n", l2_norm("v")).select(
            F.element_at(
                top_cells(cell_sims.sql("v", "__n"), 1), 1
            ).alias("cell"),
            "v",
        )
        base = base.select(
            _residual_expr("v", "cell", centroids).alias("v")
        )
    if rotation is not None:
        rot_lit = nested_double_lit(
            [[float(x) for x in r] for r in rotation]
        )
        base = base.withColumnRenamed("v", "__v0").select(
            F.transform(
                rot_lit, lambda row: dot(row, F.col("__v0"))
            ).alias("v")
        )
    base = base.persist()
    try:
        first = base.first()
        if first is None:
            raise ValueError(
                "fit_pq_codebooks: embeddings frame is empty"
                + (" after sampling" if sample_fraction is not None else "")
            )
        dim = len(first["v"])
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        d = dim // m
        out = []
        for j in range(m):
            sub = base.select(
                array_to_vector(
                    F.slice(F.col("v"), j * d + 1, d)
                ).alias("features")
            )
            from pyspark.ml.clustering import KMeans

            model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(sub)
            out.append([[float(x) for x in c] for c in model.clusterCenters()])
        return out
    finally:
        base.unpersist()


def _residual_expr(vec_expr, cell_expr, centroids: list[list[float]]):
    """The IVFADC residual (Jégou 2011 §III-A): v − centroid(cell),
    elementwise over the full vector — the quantity residual PQ codes
    quantize instead of the raw vector. One nested-Literal centroid
    table + one ``element_at`` by the row's cell + one ``zip_with``:
    map-only, one plan node for the table (the q165 tree-size lesson).
    Slicing commutes with elementwise subtraction, so downstream
    subspace slices of this expression are bit-identical to slicing
    first and subtracting per-subspace — the SQL twins subtract over
    the full vector too."""
    if (
        safe_ident(vec_expr) is not None
        and safe_ident(cell_expr) is not None
    ):
        cent_sql = double_sql([[float(x) for x in c] for c in centroids])
        return cached_expr(
            f"zip_with({to_double_array_sql(vec_expr)}, "
            f"element_at({cent_sql}, {cell_expr} + 1), (a, b) -> a - b)"
        )
    if isinstance(cell_expr, str):
        cell_expr = F.col(cell_expr)
    cent_lit = nested_double_lit(
        [[float(x) for x in c] for c in centroids]
    )
    return F.zip_with(
        to_double_array(vec_expr),
        F.element_at(cent_lit, cell_expr + 1),
        lambda a, b: a - b,
    )


def _lloyd_kmeans_np(X, k: int, seed: int, n_iter: int = 25):
    """Deterministic Lloyd k-means over numpy rows (driver-side, for
    OPQ's bounded-sample alternation): seeded distinct-row init, empty
    clusters reseeded to DISTINCT high-distance points (ADVICE r15:
    two simultaneously-empty clusters must not collapse onto one
    duplicate centroid — each takes the next-farthest unused point
    from the iteration's pre-update assignment distances). Pure numpy
    — the caller guarantees the sample is bounded, so no Spark job is
    involved."""
    import numpy as np

    rng = np.random.default_rng(seed)
    idx = rng.choice(len(X), size=k, replace=False)
    C = X[idx].astype("float64").copy()
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        # Farthest-first order of candidate reseeds (stable: equal
        # distances keep row order), consumed one per empty cluster.
        far_order = np.argsort(-d2.min(1), kind="stable")
        n_used = 0
        for c in range(k):
            msk = a == c
            if msk.any():
                C[c] = X[msk].mean(0)
            else:
                C[c] = X[far_order[n_used % len(X)]]
                n_used += 1
    return C


def fit_opq_rotation_np(
    X,
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    n_iter: int = 10,
    kmeans_iter: int = 25,
):
    """Non-parametric OPQ (Ge, He, Ke & Sun, CVPR 2013 §3.1) over a
    bounded in-memory sample: learn an ORTHOGONAL rotation R and
    per-subspace codebooks minimizing PQ quantization distortion
    ‖Rx − q(Rx)‖², by alternating (a) the orthogonal Procrustes update
    R ← UVᵀ from SVD(YᵀX) with the reconstructions Y fixed, and
    (b) code reassignment + Lloyd codebook updates in the rotated
    space. Initialized at R = I with plain-PQ codebooks, and every
    step is non-increasing in the objective, so the final OPQ
    distortion is ≤ the plain PQ distortion BY CONSTRUCTION on the
    training sample.

    Returns ``(rotation, opq_codebooks, pq_codebooks)`` — all plain
    Python float lists, usable as nested literals by the expression
    kits and reproducible in SQL twins (no engine-side fit)."""
    import numpy as np

    X = np.asarray(X, dtype="float64")
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    pq_cbs = [
        _lloyd_kmeans_np(X[:, j * d:(j + 1) * d], k, seed + j, kmeans_iter)
        for j in range(m)
    ]
    R = np.eye(dim)
    C = [c.copy() for c in pq_cbs]
    for _ in range(n_iter):
        Xr = X @ R.T
        Y = np.empty_like(Xr)
        for j in range(m):
            sub = Xr[:, j * d:(j + 1) * d]
            d2 = ((sub[:, None, :] - C[j][None]) ** 2).sum(-1)
            Y[:, j * d:(j + 1) * d] = C[j][d2.argmin(1)]
        U, _, Vt = np.linalg.svd(Y.T @ X)
        R = U @ Vt
        Xr = X @ R.T
        for j in range(m):
            sub = Xr[:, j * d:(j + 1) * d]
            for _ in range(2):  # Lloyd from current C: non-increasing
                d2 = ((sub[:, None, :] - C[j][None]) ** 2).sum(-1)
                a = d2.argmin(1)
                for c in range(k):
                    msk = a == c
                    if msk.any():
                        C[j][c] = sub[msk].mean(0)
    tolist = lambda A: [[float(x) for x in r] for r in A]  # noqa: E731
    return (
        tolist(R),
        [tolist(cb) for cb in C],
        [tolist(cb) for cb in pq_cbs],
    )


def fit_opq_rotation(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    n_iter: int = 10,
    kmeans_iter: int = 25,
    max_rows: int = 20000,
    centroids: list[list[float]] | None = None,
    round_assign_digits: int | None = None,
):
    """:func:`fit_opq_rotation_np` over a BOUNDED, DETERMINISTIC sample
    of the corpus: the ``max_rows`` lowest-``id_col`` rows (a top-k
    TakeOrderedAndProject, never a full collect — the
    fit_pq_codebooks sample precedent). Rotation fitting is a
    dim×dim SVD alternation; like codebook training it needs a
    representative sample, not the corpus (Ge 2013 trains on subsets
    too). Returns (rotation, opq_codebooks, pq_codebooks) literals.

    With ``centroids`` (the full OPQ→IVF→PQ composition, VERDICT r15
    item 3), the alternation trains on the RESIDUALS v −
    centroid(cell) — the quantity ``pq_append_codes(centroids=…,
    rotation=…)`` rotates and encodes — so BOTH returned kits live in
    the residual space: ``opq_codebooks`` with the learned rotation,
    ``pq_codebooks`` as the same-seed plain residual baseline, and
    OPQ total distortion ≤ plain by the alternation's monotonicity."""
    base = embeddings.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("v")
    )
    if centroids is not None:
        cell_sims, top_cells = _centroid_exprs(centroids, round_assign_digits)
        base = base.withColumn("__n", l2_norm("v")).select(
            F.col(id_col),
            F.element_at(
                top_cells(cell_sims.sql("v", "__n"), 1), 1
            ).alias("cell"),
            "v",
        )
        base = base.select(
            F.col(id_col),
            _residual_expr("v", "cell", centroids).alias("v"),
        )
    rows = (
        base
        .orderBy(F.col(id_col).asc())
        .limit(max_rows)
        .collect()
    )
    if not rows:
        raise ValueError("fit_opq_rotation: embeddings frame is empty")
    X = [r["v"] for r in rows]
    return fit_opq_rotation_np(
        X, m=m, k=k, seed=seed, n_iter=n_iter, kmeans_iter=kmeans_iter
    )


def load_opq_anchor() -> dict:
    """The committed OPQ anchor kit — rotation + OPQ codebooks + the
    same-seed plain-PQ codebooks, fitted ONCE by
    ``tools/fit_opq_anchor.py`` (reproducible: deterministic sample,
    seeded numpy alternation) on the sf0.01 anchor corpus and checked
    in as plain literals, exactly like the deterministic centroid
    kits: both engines of every oracle twin read the identical
    doubles, and queries stay deterministic at every SF."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "opq_anchor.json",
    )
    with open(path) as f:
        return json.load(f)


def load_opq_residual_anchor() -> dict:
    """The committed OPQ+RESIDUAL anchor kit (the Faiss OPQ→IVF→PQ
    composition, VERDICT r15 item 3): per-subspace codebooks trained
    on the ROTATED RESIDUALS R·(v − centroid(cell)) — the OPQ anchor's
    rotation, the deterministic q43 coarse cells — fitted once by
    ``tools/fit_opq_residual_anchor.py`` (bounded deterministic
    sample, seeded numpy Lloyd) and checked in as plain literals:
    both engines of the q190 twin read identical doubles at every
    SF."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "opq_residual_anchor.json",
    )
    with open(path) as f:
        return json.load(f)


def _pq_exprs(
    codebooks: list[list[list[float]]],
    round_digits: int = 9,
    rotation: list[list[float]] | None = None,
):
    """Shared PQ expression builders over codebook literals.

    With ``rotation`` (OPQ, Ge 2013): prep first maps the vector to
    R·v — one ``transform`` over the rotation-matrix Literal, each
    output component a sequential-fold dot against the MATERIALIZED
    ``__pqv0`` column (computed once; inlining the cast would re-fold
    it per rotation row, the q43 trap) — and every downstream slice /
    code / LUT runs in the rotated space. The codebooks passed in must
    live in that space. One extra map-only projection; plan shape
    otherwise identical, so the SQL twins mirror it with one extra
    list_transform CTE.

    Returns (prep, codes_col, luts_col):
      prep(df, vec_col)  -> df with __pqs{j} (subvector) and __pqn{j}
                            (its squared norm, folded ONCE — inlining
                            it would re-fold per candidate, the q43
                            re-fold trap) materialized per subspace;
      codes_col()        -> array<int> of per-subspace argmin codes
                            over ROUND(|s|² − 2·s·c + |c|², round_digits)
                            with first-occurrence (lowest code) ties —
                            the exact expression the SQL twin mirrors;
      luts_col()         -> array<array<bigint>> ADC lookup tables,
                            each term quantized to nano-units so the
                            final distance sum is integer-exact;
      dists(j)           -> the subspace's raw per-candidate distance
                            array (codes/luts/reports all derive from
                            this one expression)."""
    m = len(codebooks)
    d = len(codebooks[0][0])

    def prep(df: DataFrame, vec_expr) -> DataFrame:
        # Subvector and its squared norm materialized ONCE per
        # subspace in their own selects — inlined into the candidate
        # lambda they would re-evaluate per codebook entry (the q43
        # re-fold trap). vec_expr may be any Column (residual algebra,
        # a plain column); everything downstream of __pqv is built as
        # one-parse SQL strings over the materialized names (r17 —
        # the HOF builders' py4j round trips dominated the PQ query
        # family's wall clock).
        if rotation is not None:
            rot_sql = double_sql([[float(x) for x in r] for r in rotation])
            stage1 = df.withColumn(
                "__pqv0", to_double_array(vec_expr)
            ).select(
                "*",
                cached_expr(
                    f"transform({rot_sql}, row -> "
                    + dot_sql("row", "__pqv0")
                    + ")"
                ).alias("__pqv"),
            )
        else:
            stage1 = df.withColumn("__pqv", to_double_array(vec_expr))
        stage2 = stage1.select(
            "*",
            *[
                cached_expr(f"slice(__pqv, {j * d + 1}, {d})").alias(f"__pqs{j}")
                for j in range(m)
            ],
        )
        return stage2.select(
            "*",
            *[
                cached_expr(dot_sql(f"__pqs{j}", f"__pqs{j}")).alias(f"__pqn{j}")
                for j in range(m)
            ],
        )

    # Tree-size lesson (measured at sf0.1, 2000 rows — execution is
    # trivial, PLAN+CODEGEN per call is what costs): k expanded dot()
    # folds per subspace = 8-12s; fully-unrolled scalar arithmetic
    # (1024 multiply-add nodes) = 8-16s; zip_with over CreateArray
    # literal trees = ~5s. The winner is zip_with over SINGLE Literal
    # nodes (one plan node per codebook instead of 128 scalar
    # literals): ~1-2s. The per-element float arithmetic and order are
    # identical in every form, so the SQL twins never changed.
    def _dists_sql(j: int) -> str:
        cb = double_sql([[float(x) for x in cb] for cb in codebooks[j]])
        cb2 = double_sql(
            [float(sum(x * x for x in cb)) for cb in codebooks[j]]
        )
        return (
            f"zip_with({cb}, {cb2}, (cbv, cb2) -> "
            f"__pqn{j} - 2.0D * {dot_sql(f'__pqs{j}', 'cbv')} + cb2)"
        )

    def _rounded_dists_sql(j: int) -> str:
        return (
            f"transform({_dists_sql(j)}, x -> round(x, {int(round_digits)}))"
        )

    def codes_col():
        per_j = []
        for j in range(m):
            rd = _rounded_dists_sql(j)
            per_j.append(
                f"CAST(array_position({rd}, array_min({rd})) - 1 AS INT)"
            )
        return cached_expr("array(" + ", ".join(per_j) + ")")

    def luts_col():
        return cached_expr(
            "array("
            + ", ".join(
                f"transform({_dists_sql(j)}, "
                "x -> CAST(round(x * 1000000000.0D, 0) AS BIGINT))"
                for j in range(m)
            )
            + ")"
        )

    def min_dist_col(j: int):
        # the ASSIGNED entry's rounded distance — array_min of the
        # same rounded array codes_col argmins over
        return cached_expr(f"array_min({_rounded_dists_sql(j)})")

    return prep, codes_col, luts_col, min_dist_col



def pq_append_codes(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "v",
    round_digits: int = 9,
    centroids: list[list[float]] | None = None,
    cell_col: str = "cell",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """Append a PQ ``codes array<int>`` column to ``df`` keeping every
    existing column — the state-table form of :func:`pq_encode` (the
    streaming embedding ingest and its legacy-layout migration both
    encode (id, v, cell, fp) rows in place). Same argmin/rounding/tie
    rule as pq_encode; map-only. With ``centroids``, codes quantize
    the RESIDUAL v − centroid(``cell_col``) instead of the raw vector
    (true IVFADC, Jégou 2011 §III-A) — the row must already carry its
    assigned cell. With ``rotation``, the quantized quantity is
    rotated first (OPQ; composes with centroids: rotate the
    residual)."""
    prep, codes_col, _, _ = _pq_exprs(
        codebooks, round_digits, rotation=rotation
    )
    vec = (
        _residual_expr(F.col(vec_col), F.col(cell_col), centroids)
        if centroids is not None
        else F.col(vec_col)
    )
    return prep(df, vec).select(*df.columns, codes_col().alias("codes"))


def pq_adc_screen_kit(
    codebooks: list[list[list[float]]],
    centroids: list[list[float]] | None = None,
    rotation: list[list[float]] | None = None,
):
    """Expression kit for screening RAW vectors against PQ CODES — the
    asymmetric form (Jégou 2011 §III-B: query stays exact, database
    side is its reconstruction). Powers the codes-only streaming
    embedding state (VERDICT r10 item 1): the landed table carries
    (id, cell, codes, fp) — bytes per vector — and the cross-batch
    cosine screen compares each incoming raw vector against the
    RECONSTRUCTION of every landed candidate in its cell.

    Returns ``(prep_raw, adc_cos)``:

    - ``prep_raw(df, vec_expr)`` → df + ``__adc_luts`` (per subspace,
      the dot products of the raw subvector with every codebook entry
      — m arrays of k doubles, computed ONCE per raw row in its own
      projection, the q43 re-fold lesson) and ``__adc_norm`` (the raw
      vector's L2 norm).
    - ``adc_cos(codes_col)`` → cosine of the raw vector against the
      codes' reconstruction: Σ_j lut_j[code_j] / (‖v‖·‖recon‖) with
      ‖recon‖² = Σ_j ‖cb_j[code_j]‖² read from a literal table — m
      integer lookups per (raw, candidate) pair, no reconstruction
      materialized, no raw landed vector read. 0.0 when either norm
      is 0 (cosine_similarity's convention). Deterministic per pair
      (per-row sequential folds); the ingest rounds it via its
      ``screen_round_digits`` knob before thresholding.

    With ``centroids``, the kit speaks RESIDUAL codes (true IVFADC,
    Jégou 2011 §III-A applied to the cosine screen): a candidate's
    reconstruction is ``centroid(cell) + Σ_j cb_j[code_j]``, so

    - ``prep_raw`` additionally materializes ``__adc_cdots`` — the raw
      vector's dot product with EVERY coarse centroid (n_cells
      doubles, the same cost family as the cell assignment itself);
    - ``adc_cos(codes_col, cell_col)`` (``cell_col`` defaults to the
      post-join ``cell`` column — the CANDIDATE's assigned cell, which
      every screen join carries as its key) becomes
      ``(cdots[cell] + Σ_j lut_j[code_j]) / (‖v‖·‖recon‖)`` with
      ``‖recon‖² = ‖c‖² + Σ_j (2·c_j·cb_j[code_j] + ‖cb_j[code_j]‖²)``
      read from a ``[cell][j][code]`` literal table of driver-
      precomputed Python floats — still m+1 / m+1 lookups per pair,
      no reconstruction materialized. The cross-term table is
      n_cells·m·k doubles embedded as ONE nested Literal node (the
      q165 tree-size lesson); beyond ~2M entries prefer a broadcast
      join table instead (guarded).

    With ``rotation`` (OPQ, Ge 2013), the kit speaks ROTATED-space
    codes: ``prep_raw`` maps the incoming raw vector to R·v first
    (one transform over the rotation Literal, dots against the
    materialized cast column), and the codebooks — plus centroids, if
    residual — must live in the rotated space. Because R is
    orthogonal the cosine is mathematically unchanged; numerically
    everything (norm included) is computed in the rotated space on
    both engines, so twins stay bit-exact.
    """
    m = len(codebooks)
    d = len(codebooks[0][0])
    cb2 = [
        [float(sum(x * x for x in cb)) for cb in codebooks[j]]
        for j in range(m)
    ]
    residual = centroids is not None
    if residual:
        k = len(codebooks[0])
        if len(centroids) * m * k > 2_000_000:
            raise ValueError(
                "residual ADC cross-term literal would exceed 2M entries "
                f"({len(centroids)} cells × {m} × {k}); use a coarser "
                "cell kit or a broadcast cross-term table"
            )
        cent = [[float(x) for x in c] for c in centroids]
        c2 = [float(sum(x * x for x in c)) for c in cent]
        # rt[cell][j][code] = 2·(centroid slice_j)·cb + ‖cb‖² — plain
        # Python floats, shared verbatim with the SQL twins (no
        # engine-side fold to mirror).
        rt = [
            [
                [
                    float(
                        2.0 * sum(c[j * d + i] * cb[i] for i in range(d))
                        + cb2[j][ci]
                    )
                    for ci, cb in enumerate(codebooks[j])
                ]
                for j in range(m)
            ]
            for c in cent
        ]

    def prep_raw(df: DataFrame, vec_expr) -> DataFrame:
        # vec_expr may be any Column; everything downstream of __adcv
        # is one-parse SQL over the materialized names (r17 — the HOF
        # builders' py4j round trips dominated wall clock).
        if rotation is not None:
            rot_sql = double_sql([[float(x) for x in r] for r in rotation])
            stage1 = df.withColumn(
                "__adcv0", to_double_array(vec_expr)
            ).select(
                "*",
                cached_expr(
                    f"transform({rot_sql}, row -> "
                    + dot_sql("row", "__adcv0")
                    + ")"
                ).alias("__adcv"),
            )
        else:
            stage1 = df.withColumn("__adcv", to_double_array(vec_expr))
        stage2 = stage1.select(
            "*",
            *[
                cached_expr(f"slice(__adcv, {j * d + 1}, {d})").alias(
                    f"__adcs{j}"
                )
                for j in range(m)
            ],
        )

        def _lut_sql(j: int) -> str:
            cb = double_sql([[float(x) for x in c] for c in codebooks[j]])
            return (
                f"transform({cb}, cbv -> "
                + dot_sql(f"__adcs{j}", "cbv")
                + ")"
            )

        extra = []
        if residual:
            extra.append(
                cached_expr(
                    f"transform({double_sql(cent)}, cv -> "
                    + dot_sql("__adcv", "cv")
                    + ")"
                ).alias("__adc_cdots")
            )
        return stage2.select(
            *df.columns,
            cached_expr(
                "array(" + ", ".join(_lut_sql(j) for j in range(m)) + ")"
            ).alias("__adc_luts"),
            l2_norm("__adcv").alias("__adc_norm"),
            *extra,
        )

    def adc_cos(codes_col, cell_col=None):
        # codes_col / cell_col: column NAMES (one server-side parse)
        # or Columns (original builder path) — identical trees.
        if safe_ident(codes_col) is not None and (
            cell_col is None or safe_ident(cell_col) is not None
        ):
            if residual:
                cell1 = f"({cell_col if cell_col is not None else 'cell'} + 1)"
                dotsum = f"element_at(__adc_cdots, {cell1})"
                r2 = f"element_at({double_sql(c2)}, {cell1})"
                rt_cell = f"element_at({double_sql(rt)}, {cell1})"
                for j in range(m):
                    code1 = f"(element_at({codes_col}, {j + 1}) + 1)"
                    dotsum = (
                        f"{dotsum} + element_at(element_at(__adc_luts, "
                        f"{j + 1}), {code1})"
                    )
                    r2 = (
                        f"{r2} + element_at(element_at({rt_cell}, "
                        f"{j + 1}), {code1})"
                    )
            else:
                cb2_sql = double_sql(cb2)
                dotsum = None
                r2 = None
                for j in range(m):
                    code1 = f"(element_at({codes_col}, {j + 1}) + 1)"
                    t = (
                        f"element_at(element_at(__adc_luts, {j + 1}), "
                        f"{code1})"
                    )
                    n = (
                        f"element_at(element_at({cb2_sql}, {j + 1}), "
                        f"{code1})"
                    )
                    dotsum = t if dotsum is None else f"{dotsum} + {t}"
                    r2 = n if r2 is None else f"{r2} + {n}"
            den = f"(__adc_norm * sqrt({r2}))"
            return cached_expr(
                f"CASE WHEN ({den} != 0) THEN (({dotsum}) / {den}) "
                "ELSE 0.0D END"
            )
        if isinstance(codes_col, str):
            codes_col = F.col(codes_col)
        if isinstance(cell_col, str):
            cell_col = F.col(cell_col)
        if residual:
            cell1 = (
                cell_col if cell_col is not None else F.col("cell")
            ) + 1
            dotsum = F.element_at(F.col("__adc_cdots"), cell1)
            r2 = F.element_at(nested_double_lit(c2), cell1)
            rt_cell = F.element_at(nested_double_lit(rt), cell1)
            for j in range(m):
                code1 = F.element_at(codes_col, j + 1) + 1
                dotsum = dotsum + F.element_at(
                    F.element_at(F.col("__adc_luts"), j + 1), code1
                )
                r2 = r2 + F.element_at(F.element_at(rt_cell, j + 1), code1)
            denom = F.col("__adc_norm") * F.sqrt(r2)
            return F.when(denom != 0, dotsum / denom).otherwise(F.lit(0.0))
        cb2_lit = nested_double_lit(cb2)
        dotsum = None
        r2 = None
        for j in range(m):
            code1 = F.element_at(codes_col, j + 1) + 1
            t = F.element_at(F.element_at(F.col("__adc_luts"), j + 1), code1)
            n = F.element_at(F.element_at(cb2_lit, j + 1), code1)
            dotsum = t if dotsum is None else dotsum + t
            r2 = n if r2 is None else r2 + n
        denom = F.col("__adc_norm") * F.sqrt(r2)
        return F.when(denom != 0, dotsum / denom).otherwise(F.lit(0.0))

    return prep_raw, adc_cos


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 9,
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """PQ-encode every vector: (id, codes array<int>) with codes[j] =
    argmin_c ROUND(‖s_j − c‖², 9), lowest code on ties. Map-only —
    encoding 100 TB is a single scan; the output is the compact
    representation every ADC probe reads instead of the raw vectors.
    With ``rotation``, codes quantize R·v (OPQ) — codebooks must live
    in the rotated space."""
    prep, codes_col, _, _ = _pq_exprs(
        codebooks, round_digits, rotation=rotation
    )
    return prep(embeddings, F.col(vec_col)).select(
        F.col(id_col), codes_col().alias("codes")
    )


def ivf_pq_index(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_assign_digits: int | None = None,
    round_digits: int = 9,
    residual: bool = False,
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """The composed IVF-PQ index: (id, cell, codes) in ONE map-only
    pass over the corpus — coarse cell from the IVF kit, fine codes
    from the PQ codebooks. This table (two ints + m small ints per
    vector) is what a 100 TB deployment keeps hot; the raw vectors
    stay cold.

    ``residual=True`` is true IVFADC (Jégou 2011 §III-A): codes
    quantize v − centroid(cell) instead of v. Residual magnitudes are
    a fraction of raw-vector magnitudes once the coarse quantizer has
    absorbed the cell's mean, so the same m×k code budget spends its
    resolution on the part the cell doesn't explain — the lever that
    lifts pre-rerank ADC recall at identical storage (VERDICT r13
    item 1). Still one map-only pass.

    ``rotation`` (OPQ): codes quantize the ROTATED quantity — R·v, or
    R·(v − centroid) under ``residual`` — against codebooks trained in
    that space; coarse cells stay in the raw space (the rotation only
    re-parameterizes the fine quantizer)."""
    assigned = ivf_index(
        embeddings, centroids, id_col, vec_col, round_assign_digits
    )
    prep, codes_col, _, _ = _pq_exprs(
        codebooks, round_digits, rotation=rotation
    )
    vec = (
        _residual_expr("v", "cell", centroids)
        if residual
        else F.col("v")
    )
    return prep(assigned, vec).select(
        F.col(id_col), F.col("cell"), codes_col().alias("codes")
    )


def pq_reconstruction_report(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 9,
    centroids: list[list[float]] | None = None,
    round_assign_digits: int | None = None,
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """The distortion evidence a PQ index owes its users (the q157
    recall-report precedent applied to quantization): per subspace,
    how far vectors sit from their assigned codebook entry —
    (subspace, n_vectors, sum_dist_q, mean_sq_dist) with sum_dist_q
    the nano-unit integer sum of each vector's ASSIGNED (minimum)
    rounded squared subvector distance and mean = sum/n/1e9 (one IEEE
    division of exact integers — oracle-checkable). A subspace whose
    mean distortion dwarfs the others is where ADC ranking quality
    leaks; give it more codes or train with fit_pq_codebooks.

    Scale shape: the encode pass's map-only distance arrays, one
    m-row explode per vector, ONE subspace-keyed integer aggregation —
    reduce side bounded by m, not corpus size.

    With ``centroids``, distortion is measured over the RESIDUALS
    v − centroid(cell) (the quantity residual IVFADC codes quantize,
    Jégou 2011 §III-A) — the raw-vs-residual comparison is the
    evidence for whether residual encoding buys accuracy on a given
    corpus (q177).

    With ``rotation``, distortion is measured in the ROTATED space
    R·v against codebooks trained there (OPQ, Ge 2013) — the
    rotated-vs-raw comparison is the evidence for whether the learned
    rotation buys accuracy at identical code budget (q185)."""
    prep, _, _, min_dist_col = _pq_exprs(
        codebooks, round_digits, rotation=rotation
    )
    m = len(codebooks)
    if centroids is not None:
        assigned = ivf_index(
            embeddings, centroids, id_col, vec_col, round_assign_digits
        )
        prepped = prep(
            assigned, _residual_expr("v", "cell", centroids)
        )
    else:
        prepped = prep(
            embeddings.select(F.col(id_col), F.col(vec_col)), F.col(vec_col)
        )
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("subspace"),
                F.round(min_dist_col(j) * 1e9).cast("long").alias("dist_q"),
            )
            for j in range(m)
        ]
    )
    return (
        prepped.select(F.explode(pairs).alias("p"))
        .select(F.col("p.subspace").alias("subspace"),
                F.col("p.dist_q").alias("dist_q"))
        .groupBy("subspace")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.sum("dist_q").cast("long").alias("sum_dist_q"),
        )
        .select(
            "subspace",
            "n_vectors",
            "sum_dist_q",
            (F.col("sum_dist_q").cast("double") / F.col("n_vectors") / 1e9)
            .alias("mean_sq_dist"),
        )
    )


def pq_cell_distortion_report(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_assign_digits: int | None = None,
    round_digits: int = 9,
    rotation: list[list[float]] | None = None,
    cells_from: DataFrame | None = None,
) -> DataFrame:
    """Per-CELL residual quantization distortion — the maintenance
    signal :func:`pq_reconstruction_report` (per subspace) can't give:
    WHICH coarse cells the residual codebooks serve poorly. A cell
    whose mean residual distortion dwarfs the others is where the
    coarse quantizer stopped explaining its vectors — the recenter
    (ivf_recenter / drift report) or refit (codebook rotation)
    candidate list, ranked.

    Per vector: assigned cell + the nano-unit integer SUM over
    subspaces of the assigned (minimum) rounded residual distance;
    one cell-keyed integer aggregation (reduce side bounded by
    n_cells) onto a static n_cells-row spine, so the row count never
    depends on which cells are populated. mean = sum/n/1e9, one IEEE
    division of exact integers (0.0 for empty cells) — exact against
    the generated SQL twin (q183). ``rotation`` measures in the
    ROTATED residual space (OPQ states) — pass the state's kit.

    ``cells_from`` (ADVICE r15: a STATEFUL index's maintenance signal
    must measure the membership the state actually stores): an
    (``id_col``, cell) frame — e.g. the codes-only state table — used
    as the cell assignment instead of re-running the IVF argmax.
    After a repair moves centroids, a fresh re-assignment can place
    boundary rows in cells that differ from their stored membership
    and mis-attribute distortion to the wrong cells; the state's own
    column is the membership every selective repair
    (recenter_state_cells / cells-restricted rotation) operates on.
    One id equi-join replaces the map-only assignment."""
    prep, _, _, min_dist_col = _pq_exprs(
        codebooks, round_digits, rotation=rotation
    )
    m = len(codebooks)
    if cells_from is not None:
        assigned = embeddings.select(
            F.col(id_col), to_double_array(F.col(vec_col)).alias("v")
        ).join(
            cells_from.select(
                F.col(id_col), F.col("cell").cast("int").alias("cell")
            ),
            on=id_col,
        )
    else:
        assigned = ivf_index(
            embeddings, centroids, id_col, vec_col, round_assign_digits
        )
    prepped = prep(
        assigned, _residual_expr("v", "cell", centroids)
    )
    total = None
    for j in range(m):
        t = F.round(min_dist_col(j) * 1e9).cast("long")
        total = t if total is None else total + t
    per_cell = (
        prepped.select(F.col("cell"), total.alias("__dq"))
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.sum("__dq").cast("long").alias("sum_dist_q"),
        )
    )
    spine = embeddings.sparkSession.range(len(centroids)).select(
        F.col("id").cast("long").alias("cell")
    )
    return (
        spine.join(
            per_cell.select(
                F.col("cell").cast("long").alias("cell"),
                "n_vectors", "sum_dist_q",
            ),
            "cell", "left",
        )
        .select(
            "cell",
            F.coalesce("n_vectors", F.lit(0)).cast("long").alias(
                "n_vectors"
            ),
            F.coalesce("sum_dist_q", F.lit(0)).cast("long").alias(
                "sum_dist_q"
            ),
            F.when(
                F.coalesce("n_vectors", F.lit(0)) > 0,
                F.coalesce("sum_dist_q", F.lit(0)).cast("double")
                / F.coalesce("n_vectors", F.lit(1))
                / 1e9,
            )
            .otherwise(F.lit(0.0))
            .alias("mean_sq_dist"),
        )
        .orderBy("cell")
    )


def ivf_pq_knn_join(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    round_assign_digits: int | None = None,
    round_digits: int = 9,
    index: DataFrame | None = None,
    rerank_from: int | None = None,
    rerank_round_digits: int = 6,
    residual: bool = False,
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-PQ probe with asymmetric distance computation (ADC): for
    every query, rank the candidates in its nprobe cells by
    Σ_j lut_j[code_j] — m integer lookups per candidate instead of a
    dim-length float fold, over a candidate side that carries CODES
    instead of vectors. Returns (qid, id, adist_q, rn) with adist_q
    the nano-unit integer ADC distance (ascending = nearer).

    Scale shape: the corpus is assigned+encoded ONCE (``index`` =
    :func:`ivf_pq_index` output reused across query batches); the
    query batch broadcasts with its nprobe cell fan-out AND its m×k
    quantized lookup tables computed in its own projection; ONE cell
    equi-join; per-(query, candidate) work is m ``element_at`` lookups
    + an integer sum — no raw corpus vector is ever read at probe
    time. Exactness: every lut term is ROUND(·1e9) BIGINT, so the
    distance sum is commutative integer arithmetic — the oracle twin
    (q166) matches it exactly; ranking ties break by candidate id.

    ``rerank_from=R`` (IVFADC+R, Jégou 2011 §III-C): take the ADC
    top-R per query, fetch ONLY those R raw corpus vectors, and
    re-rank them by exact cosine (rounded to ``rerank_round_digits``,
    ties by id) down to k — returns (qid, id, sim, rn) instead of the
    integer ADC distance. The recall lever that keeps raw vectors
    cold: per query the raw corpus is touched at exactly R ids (one
    broadcast equi-join of the candidate list against the corpus),
    never per cell. Oracle-checkable end to end (q171).

    ``residual=True`` probes a RESIDUAL index (true IVFADC): the
    query's lookup tables are built per probed cell from the query's
    OWN residual q − centroid(cell), so Σ_j lut_j[code_j] is the exact
    quantized ‖(q−c) − recon(codes)‖² in that cell's residual frame —
    which equals ‖q − (c + recon)‖², the distance to the candidate's
    full reconstruction, so distances stay comparable ACROSS probed
    cells. Cost: the broadcast query fan-out carries nprobe lut sets
    per query instead of one — still |queries|·nprobe·m·k small
    integers, map-only. A pre-built ``index`` must have been encoded
    with the SAME ``residual`` setting (codes carry no provenance —
    the q168 `_PQ_SPEC` marker guards the streaming state, but a
    batch index table is the caller's contract).

    ``rotation`` (OPQ, Ge 2013): both sides of the ADC comparison move
    to the rotated space — the index codes quantize R·v (or the
    rotated residual) and the query LUTs are built from the rotated
    query — while coarse cells and the exact-cosine rerank stay in the
    raw space. Since R is orthogonal, ‖R·x − recon‖² = ‖x −
    Rᵀrecon‖², so ADC distances remain distances to reconstructions
    of the raw vectors; a pre-built ``index`` must use the SAME
    rotation."""
    m = len(codebooks)
    cell_sims, top_cells = _centroid_exprs(centroids, round_assign_digits)
    enc = (
        index
        if index is not None
        else ivf_pq_index(
            embeddings, centroids, codebooks, id_col, vec_col,
            round_assign_digits, round_digits, residual=residual,
            rotation=rotation,
        )
    )
    prep, _, luts_col, _ = _pq_exprs(
        codebooks, round_digits, rotation=rotation
    )
    if residual:
        qr = queries.select(
            F.col(query_id_col).alias("qid"),
            to_double_array(F.col(query_vec_col)).alias("__qv"),
        ).withColumn("__qnorm", l2_norm("__qv"))
        qcells = qr.select(
            "qid",
            "__qv",
            F.explode(
                top_cells(
                    cell_sims.sql("__qv", "__qnorm"), nprobe
                )
            ).alias("cell"),
        )
        qprep = prep(
            qcells, _residual_expr("__qv", "cell", centroids)
        )
        q = F.broadcast(
            qprep.select("qid", "cell", luts_col().alias("__luts"))
        )
    else:
        qbase = prep(
            queries.select(
                F.col(query_id_col).alias("qid"),
                to_double_array(F.col(query_vec_col)).alias("__qv"),
            ),
            F.col("__qv"),
        ).withColumn("__qnorm", l2_norm("__qv"))
        q = F.broadcast(
            qbase.select(
                "qid",
                luts_col().alias("__luts"),
                F.explode(
                    top_cells(
                        cell_sims.sql("__qv", "__qnorm"), nprobe
                    )
                ).alias("cell"),
            )
        )
    adist = None
    for j in range(m):
        term = F.element_at(
            F.element_at(F.col("__luts"), j + 1),
            F.element_at(F.col("codes"), j + 1) + 1,
        )
        adist = term if adist is None else adist + term
    scored = enc.join(q, on="cell").select(
        "qid", F.col(id_col), adist.alias("adist_q")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("adist_q").asc(), F.col(id_col).asc()
    )
    ranked = scored.withColumn("rn", F.row_number().over(w))
    if rerank_from is None:
        return ranked.filter(F.col("rn") <= k).select(
            "qid", id_col, "adist_q", F.col("rn").cast("long").alias("rn")
        )
    cand = ranked.filter(F.col("rn") <= rerank_from).select("qid", id_col)
    corp = embeddings.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("__cv")
    )
    qraw = queries.select(
        F.col(query_id_col).alias("qid"),
        to_double_array(F.col(query_vec_col)).alias("__qrv"),
    )
    # Candidate list (|queries|·R rows) broadcasts against the corpus:
    # the only raw-vector reads are the R hits per query.
    rr = (
        corp.join(F.broadcast(cand), on=id_col)
        .join(F.broadcast(qraw), on="qid")
        .withColumn(
            "sim",
            F.round(
                cosine_similarity("__qrv", "__cv"),
                rerank_round_digits,
            ),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        rr.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "sim", F.col("rn").cast("long").alias("rn"))
    )


def pq_rerank_recall_report(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query_pred,
    k: int = 10,
    rerank_budgets: tuple[int, ...] = (10, 20, 40),
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_assign_digits: int | None = 6,
    round_digits: int = 9,
    residual: bool = False,
) -> DataFrame:
    """The rerank_from ↔ recall curve of the IVF-PQ probe — the q157
    publish-your-evidence precedent applied to IVFADC+R: for every
    shortlist budget R in ``rerank_budgets``, the measured recall@k of
    ADC-top-R-then-exact-rerank against the exact brute-force top-k.
    One row per budget: (rerank_from, n_queries, n_hits, recall) with
    recall = n_hits / (n_queries·k), n_queries counted from the query
    frame itself (a query whose probed cells yield zero ADC candidates
    counts against recall — ADVICE r13) — the table that tells an operator
    how much shortlist depth buys back the quantization-distortion
    loss q167 reports. The R=k row IS plain ADC's candidate set
    (re-ranking k of k can't change membership), so the curve reads
    as "plain ADC vs deeper shortlists" directly: measured on the
    near-random sf0.01 corpus with the data-blind kit codebooks at
    nprobe=4 — 10 → 0.12, 20 → 0.16, 40 → 0.26 (cell recall bounds
    the ceiling; on clustered data with trained codebooks the same
    machinery reaches 1.0, tests/test_recall_quality.py).

    Engine-exact: the ADC candidate ranking is the integer-adist
    machinery of :func:`ivf_pq_knn_join`; the budget fan-out is a
    literal (rerank_from, rn) table so one candidate list serves every
    budget through an EQUI join (no theta-join BNL); rerank and exact
    baseline cosines are rounded to 6 digits with id ties; the final
    recall is one BIGINT/BIGINT IEEE division.

    Scale shape: the corpus is encoded once inside the shared ADC
    probe; the shortlist (|queries|·max(R) rows) broadcasts against
    the corpus for its raw-vector fetch; only the ground-truth
    baseline is the allowlisted q38 broadcast cross join."""
    spark = embeddings.sparkSession
    budgets = tuple(sorted({int(r) for r in rerank_budgets}))
    if not budgets or budgets[0] < k:
        raise ValueError(
            f"rerank budgets must be >= k={k}, got {rerank_budgets}"
        )
    queries = embeddings.filter(query_pred)
    cand = ivf_pq_knn_join(
        embeddings, queries, centroids, codebooks, k=budgets[-1],
        nprobe=nprobe, id_col=id_col, vec_col=vec_col,
        query_id_col=id_col, query_vec_col=vec_col,
        round_assign_digits=round_assign_digits, round_digits=round_digits,
        residual=residual,
    ).select("qid", id_col, F.col("rn").cast("int").alias("__arn"))
    bud = F.broadcast(
        spark.createDataFrame(
            [(int(R), r) for R in budgets for r in range(1, R + 1)],
            "rerank_from int, __arn int",
        )
    )
    corp = embeddings.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("__cv")
    ).withColumn("__cn", l2_norm("__cv"))
    qraw = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"),
            to_double_array(F.col(vec_col)).alias("__qv3"),
        ).withColumn("__qn3", l2_norm("__qv3"))
    )
    denom = F.col("__cn") * F.col("__qn3")
    sim = F.round(
        F.when(
            denom != 0, dot("__cv", "__qv3") / denom
        ).otherwise(F.lit(0.0)),
        6,
    )
    rr = (
        corp.join(F.broadcast(cand.join(bud, on="__arn")), on=id_col)
        .join(qraw, on="qid")
        .select("rerank_from", "qid", F.col(id_col), sim.alias("sim"))
    )
    w = Window.partitionBy("rerank_from", "qid").orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    topk = rr.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    exact = knn_join(
        embeddings, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=id_col, query_vec_col=vec_col,
    ).select("qid", F.col(id_col), F.lit(1).alias("__hit"))
    # Denominator from the QUERY FRAME, not from topk (ADVICE r13): a
    # query whose nprobe cells yield zero ADC candidates must count
    # against recall, not silently drop out of n_queries and inflate
    # it. The (budget × query) spine is |budgets|·|queries| rows —
    # bounded — and every hit left-joins onto it.
    spine = F.broadcast(
        spark.createDataFrame(
            [(int(R),) for R in budgets], "rerank_from int"
        )
    ).crossJoin(queries.select(F.col(id_col).alias("qid")))
    per_q = (
        topk.join(exact, on=["qid", id_col], how="left")
        .groupBy("rerank_from", "qid")
        .agg(F.sum(F.coalesce("__hit", F.lit(0))).alias("__h"))
    )
    return (
        spine.join(per_q, on=["rerank_from", "qid"], how="left")
        .groupBy(F.col("rerank_from").cast("long").alias("rerank_from"))
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.sum(F.coalesce("__h", F.lit(0))).cast("long").alias(
                "n_hits"
            ),
        )
        .withColumn(
            "recall",
            F.col("n_hits") / (F.col("n_queries") * F.lit(int(k))),
        )
    )
