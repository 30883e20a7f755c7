"""Streaming embedding ingestion with semantic dedup (north-star
extension).

The embedding-space sibling of :mod:`.corpus`: replay embedding shards
as a stream and land only vectors that are neither exact nor SEMANTIC
(cosine) duplicates of anything already ingested — SemDeDup on the
ingest path instead of as a batch pass. The landed table IS the dedup
state: every row carries its IVF cell (the q43 deterministic centroid
kit), so the cross-batch screen is ONE cell-keyed equi-join of the
batch against the landed rows of the same cells — never an all-pairs
scan, at any corpus size.

This is the 100 TB design: new embedding shards arrive continuously →
broadcast-literal cell assignment at wire speed (map-only) → exact
anti-join on the vector fingerprint → per-cell cosine screen against
the landed corpus → append survivors. State lives in the output table
itself (no streaming state store), so a restart is free and the dedup
horizon is the whole corpus.

Reference parity: none — the reference has no streaming code at all
(SURVEY.md §2i); this composes our own IVF assignment + semdedup
operators with Structured Streaming.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity
from ..operators.similarity import ivf_index, semdedup
from ..session import apply_runtime_confs


def embeddings_file_schema(spark: SparkSession, path_dir: str):
    """Probe parquet footers for the stream schema (driver-side batch
    read, no job) — same vintage-proofing as corpus.documents_file_schema."""
    apply_runtime_confs(spark)
    emb_file = os.path.join(path_dir, "embeddings.parquet")
    target = emb_file if os.path.exists(emb_file) else path_dir
    return spark.read.parquet(target).schema


def read_embeddings_stream(
    spark: SparkSession, path_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream replaying embedding shards as they land."""
    apply_runtime_confs(spark)
    emb_only = os.path.exists(os.path.join(path_dir, "embeddings.parquet"))
    return (
        spark.readStream.schema(embeddings_file_schema(spark, path_dir))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "embeddings.parquet" if emb_only else "*.parquet")
        .parquet(path_dir)
    )


def ingest_embeddings_stream(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = None,
    track_drift: bool = False,
    cell_n_buckets: int | None = None,
    track_components: bool = False,
    components_n_buckets: int | None = None,
    components_auto_compact_files: int | None = None,
    round_assign_digits: int | None = None,
    screen_round_digits: int | None = None,
):
    """Append only semantically-novel vectors to the landed IVF corpus.

    Per micro-batch (inside foreachBatch, batch semantics):
     1. exact dedup — the vector fingerprint is ``xxhash64`` of the
        raw float array; min-id per fingerprint survives within the
        batch, and fingerprints already landed are anti-joined out.
        Running the EXACT screen first also makes at-least-once replay
        safe: a replayed batch's landed rows are removed here, BEFORE
        the semantic screen could see them as their own cosine-1.0
        twins and drop them without them being truly landed twice.
     2. within-batch semantic dedup — :func:`~..operators.similarity.
        semdedup` keeps the min-id representative of every cosine-
        ``threshold`` clique per IVF cell.
     3. cross-batch semantic screen — batch survivors join the LANDED
        rows of the same cell; any batch vector with a landed cosine-
        ``threshold`` neighbour is dropped. The landed table is the
        index: (id, v, cell), one cell-keyed equi-join, no side state.
     4. append survivors to ``out_dir`` (single write — nothing else
        to keep consistent).

    With ``track_drift=True``, each batch appends one row to
    ``{out_dir}_drift`` — (batch_id, n_batch_vecs, n_landed_vecs,
    n_shared_cells, jsd_bits): the Jensen-Shannon divergence between
    the batch's and the landed corpus's IVF CELL histograms — the
    embedding-space analogue of the document path's token-distribution
    drift. A crawl source drifting in embedding space shows up as mass
    moving across cells long before any per-vector screen fires. Cost:
    one |cells|-sized aggregate per side per batch.

    With ``compact_every=N`` the landed table is rewritten every N
    batches range-clustered on ``cell`` (one file set per cell range),
    so per-cell probes prune files by footer min/max instead of
    reading every appended fragment — the same fragmentation bound as
    the MinHash index compaction.

    With ``cell_n_buckets=B`` the landed table is kept as a BUCKETED
    external table on ``cell`` instead (VERDICT r8 item 3 — the third
    and last hot state table, after the gram and MinHash indexes): the
    per-batch cross-batch cosine screen — a cell equi-join of the
    batch against the corpus-sized landed side — then needs NO
    landed-side exchange (the bucketed scan satisfies the join's
    distribution; only the batch-sized probe shuffles), appends land
    one file per bucket, and ``compact_every`` folds each bucket's
    accumulated files back to one while preserving the layout. A
    ``_BUCKET_SPEC`` marker written at registration time refuses
    reopening at a different bucket count.

    With ``track_components=True``, the ingest also maintains
    ``{out_dir}_components`` — (id, comp) labels for every SEMANTIC
    duplicate group seen across the whole ingest history, the
    embedding-space sibling of the document ingest's group tracking.
    Edges are exactly the drop evidence each screen produces: exact
    star edges from the fingerprint reductions, within-batch cosine
    pairs per IVF cell (the SemDeDup rule's own pair set), and
    cross-batch cosine matches. Because only survivors land, the
    dropped vectors' (id, v, cell, fp) rows are appended to
    ``{out_dir}_screened`` and the cross-batch screen probes landed ∪
    screened — a new vector chained ONLY through a dropped twin still
    joins its group AND is still dropped, as one-shot batch semantics
    would. Keep/drop stays SemDeDup's greedy lower-id-twin rule; the
    group labels are connected components over the pair evidence
    (merged incrementally by
    :func:`~..operators.dedup.update_components`; ``comp`` = min id
    reachable). ``components_n_buckets`` selects the append-only
    versioned id-bucketed state layout, exactly as on the document
    ingest. Write order: components BEFORE the corpus append (replay
    idempotence), screened extras after it (re-derived on replay).
    Under ``cell_n_buckets`` the screened extras share the landed
    table's bucketed-on-``cell`` layout (their probes are the same
    cell equi-joins), and ``compact_every`` folds them (dedup +
    defragment — one file set per bucket again; see
    :func:`compact_screened_extras`). An empty extras table costs one
    ``head(1)`` probe per batch and nothing else.

    ``round_assign_digits`` / ``screen_round_digits`` are the batch
    operators' determinism knobs threaded onto the ingest: rounded
    argmax cell assignment (the q43 kit) and a 6-digit-rounded
    cross-batch cosine make the whole streamed outcome mirrorable in
    ANSI SQL (the q164 probe uses both; the within-batch pair screens
    already round to 6 digits). Defaults (None) keep raw floats —
    byte-identical to the previous behavior.

    Returns the finished StreamingQuery (Trigger.AvailableNow).
    """
    from ..operators.similarity import cosine_near_dup_pairs
    from ..sources.state import recover_interrupted_swap
    from .corpus import (
        _append_bucketed,
        _check_bucket_marker,
        _components_setup,
        _has_parquet,
        _merge_component_state,
        _read_state_dir,
        _register_bucketed_state,
        _rewrite_bucketed_state,
        _state_table_name,
        _write_bucket_marker,
    )

    # The landed table IS the dedup state: finish/roll back any
    # compaction swap a previous run crashed inside, or a restarted
    # stream would see landed=None and re-ingest duplicates (ADVICE r6).
    recover_interrupted_swap(out_dir.rstrip("/"))
    comp_dir = out_dir.rstrip("/") + "_components"
    screened_dir = out_dir.rstrip("/") + "_screened"
    recover_interrupted_swap(comp_dir)
    # The screened extras table is compacted (swapped) below, so a crash
    # inside ITS swap needs the same repair as the landed table's.
    recover_interrupted_swap(screened_dir)
    cb, comp_tbl = _components_setup(
        stream.sparkSession, comp_dir, track_components,
        components_n_buckets,
        stream.schema[id_col].dataType.simpleString(),
    )

    nb = int(cell_n_buckets or 0)
    id_ddl = stream.schema[id_col].dataType.simpleString()
    state_ddl = (
        f"`{id_col}` {id_ddl}, `v` array<double>, `cell` int, `fp` bigint"
    )
    scr_tbl = None
    if nb:
        _check_bucket_marker(out_dir.rstrip("/"), nb, "embedding corpus")
        emb_tbl = _register_bucketed_state(
            stream.sparkSession,
            out_dir.rstrip("/"),
            _state_table_name(out_dir.rstrip("/"), "emb_corpus"),
            state_ddl,
            ["cell"],
            nb,
        )
        # Marker before any data file can land (ADVICE r8 ordering).
        _write_bucket_marker(out_dir.rstrip("/"), nb)
        if track_components:
            # The screened extras share the landed table's layout
            # (ADVICE r9): dropped vectors are probed by the SAME
            # cell equi-joins, so an unbucketed extras side would
            # re-shuffle per batch exactly what cell_n_buckets was
            # added to eliminate — on duplicate-heavy streams extras
            # can rival the landed corpus.
            _check_bucket_marker(
                screened_dir, nb, "embedding screened extras"
            )
            scr_tbl = _register_bucketed_state(
                stream.sparkSession,
                screened_dir,
                _state_table_name(screened_dir, "emb_screened"),
                state_ddl,
                ["cell"],
                nb,
            )
            _write_bucket_marker(screened_dir, nb)
    else:
        emb_tbl = None

    _read_state = _read_state_dir  # shared missing-vs-corrupt handling

    def _screen_sim(v_col, lv_col):
        simc = cosine_similarity(v_col, lv_col)
        if screen_round_digits is not None:
            simc = F.round(simc, screen_round_digits)
        return simc

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tagged = batch_df.withColumn("fp", F.xxhash64(F.col(vec_col)))
        cached = tagged.persist()
        try:
            # 1: exact dedup, within-batch then vs landed (and, under
            # group tracking, vs the screened extras too — an exact
            # twin of a DROPPED vector is dropped in batch mode).
            keep = cached.groupBy("fp").agg(F.min(id_col).alias(id_col))
            exact_within = None
            if track_components:
                exact_within = (
                    cached.select(F.col(id_col), "fp")
                    .join(keep.withColumnRenamed(id_col, "__keep"), on="fp")
                    .filter(F.col(id_col) != F.col("__keep"))
                    .select(
                        F.col("__keep").alias("id_a"),
                        F.col(id_col).alias("id_b"),
                    )
                )
            batch = cached.join(keep, on=[id_col, "fp"], how="left_semi")
            if nb:
                # The bucketed table read carries its `cell` hash
                # distribution into the cosine-screen join below — no
                # landed-side exchange, at any corpus size.
                landed = (
                    spark.table(emb_tbl)
                    if _has_parquet(out_dir.rstrip("/"))
                    else None
                )
            else:
                landed = _read_state(spark, out_dir)
            if track_components:
                extras = (
                    spark.table(scr_tbl)
                    if nb and _has_parquet(screened_dir)
                    else (None if nb else _read_state(spark, screened_dir))
                )
                # Skip the extras probe entirely when the frame is
                # empty (ADVICE r9): an empty-but-existing _screened
                # dir otherwise duplicates the whole probe pipeline —
                # exact min, cosine join, anti-join — per batch for
                # zero rows. head(1) is one cheap job on the pinned
                # listing; on a dedup-free stream it stays the only
                # extras cost forever.
                if extras is not None and not extras.head(1):
                    extras = None
                # Landed and extras are probed SEPARATELY: a union
                # would discard both catalog tables' CLUSTERED BY
                # (cell) distribution and re-shuffle the whole corpus
                # side per batch — the exchange cell_n_buckets exists
                # to eliminate. Each state frame keeps its own join.
                states = [s for s in (landed, extras) if s is not None]
            else:
                states = [landed] if landed is not None else []
            exact_cross = None
            if track_components and states:
                per_state_min = [
                    s.select("fp", F.col(id_col))
                    .join(
                        F.broadcast(batch.select("fp").distinct()),
                        on="fp", how="left_semi",
                    )
                    .groupBy("fp")
                    .agg(F.min(id_col).alias("__sid"))
                    for s in states
                ]
                state_min = per_state_min[0]
                for sm in per_state_min[1:]:
                    state_min = state_min.unionByName(sm)
                state_min = state_min.groupBy("fp").agg(
                    F.min("__sid").alias("__sid")
                )
                exact_cross = (
                    batch.select(F.col(id_col), "fp")
                    .join(state_min, on="fp")
                    .select(
                        F.col("__sid").alias("id_a"),
                        F.col(id_col).alias("id_b"),
                    )
                )
            for s in states:
                batch = batch.join(s.select("fp"), on="fp", how="left_anti")
            if track_components:
                # 2+3 with pair evidence: assignment ONCE on the full
                # post-exact batch; within-batch pairs are the SemDeDup
                # rule's own pair set (identical params), cross-batch
                # matches keep (batch id, state id). Both pair frames
                # are pinned eagerly so the drop anti-joins below reuse
                # them instead of re-running the cosine joins.
                assigned_b = ivf_index(
                    batch, centroids, id_col=id_col, vec_col=vec_col,
                    round_assign_digits=round_assign_digits,
                ).join(batch.select(id_col, "fp"), on=id_col)
                pairs_w = cosine_near_dup_pairs(
                    assigned_b, block_cols=["cell"], threshold=threshold,
                    id_col=id_col, vec_col="v", max_block_size=4096,
                ).select("id_a", "id_b").localCheckpoint(eager=True)
                near_pairs = None
                if states:
                    per_state = [
                        assigned_b.join(
                            s.select(
                                F.col("cell"),
                                F.col("v").alias("__lv"),
                                F.col(id_col).alias("__sid"),
                            ),
                            on="cell",
                        )
                        .filter(
                            _screen_sim(F.col("v"), F.col("__lv"))
                            >= F.lit(threshold)
                        )
                        .select(
                            F.col("__sid").alias("id_a"),
                            F.col(id_col).alias("id_b"),
                        )
                        for s in states
                    ]
                    near_pairs = per_state[0]
                    for ps in per_state[1:]:
                        near_pairs = near_pairs.unionByName(ps)
                    near_pairs = near_pairs.localCheckpoint(eager=True)
                comp_edges = pairs_w
                for extra_e in (exact_within, exact_cross, near_pairs):
                    if extra_e is not None:
                        comp_edges = comp_edges.unionByName(extra_e)
                # Pin edges BEFORE any state write below.
                comp_edges = comp_edges.localCheckpoint(eager=True)
                # Drops: greedy lower-id within-batch twins + any
                # cross-batch match (same evidence as the edges, read
                # from the pinned frames).
                dropped_w = pairs_w.select(
                    F.col("id_b").alias(id_col)
                ).distinct()
                dropped_x = (
                    near_pairs.select(F.col("id_b").alias(id_col)).distinct()
                    if near_pairs is not None
                    else None
                )
                assigned = assigned_b.join(
                    dropped_w, on=id_col, how="left_anti"
                )
                if dropped_x is not None:
                    assigned = assigned.join(
                        dropped_x, on=id_col, how="left_anti"
                    )
                _merge_component_state(
                    spark, comp_dir, comp_tbl, cb, comp_edges,
                    batch_id, stream.schema[id_col].dataType,
                    compact_every=compact_every,
                    auto_compact_files=components_auto_compact_files,
                )
            else:
                # 2: within-batch semantic dedup (min-id rep per clique).
                kept_ids = (
                    semdedup(batch, centroids, threshold=threshold,
                             id_col=id_col, vec_col=vec_col,
                             round_assign_digits=round_assign_digits)
                    .filter(F.col("is_kept") == 1)
                    .select(id_col)
                )
                batch = batch.join(kept_ids, on=id_col, how="left_semi")
                # 3: cross-batch semantic screen via the landed cells.
                assigned = ivf_index(
                    batch, centroids, id_col=id_col, vec_col=vec_col,
                    round_assign_digits=round_assign_digits,
                )
                assigned = assigned.join(
                    batch.select(id_col, "fp"), on=id_col
                )
                if landed is not None:
                    near = (
                        assigned.join(
                            landed.select(
                                F.col("cell"), F.col("v").alias("__lv")
                            ),
                            on="cell",
                        )
                        .filter(
                            _screen_sim(F.col("v"), F.col("__lv"))
                            >= F.lit(threshold)
                        )
                        .select(id_col)
                        .distinct()
                    )
                    assigned = assigned.join(near, on=id_col, how="left_anti")
            # 4: single append — the survivors ARE the new state.
            survivors = assigned.select(id_col, "v", "cell", "fp").localCheckpoint(
                eager=True
            )

            def cell_hist(df_):
                c = df_.groupBy("cell").agg(
                    F.count("*").cast("long").alias("cnt")
                )
                return {r["cell"]: r["cnt"] for r in c.collect()}

            # Pin the landed histogram BEFORE the append: the bucketed
            # CATALOG table refreshes its file listing in place on
            # insert, so a post-append read would count this batch's
            # own survivors into the corpus side (the plain-parquet
            # path pins its listing at _read_state time, but collecting
            # here keeps both modes on the same pre-append snapshot).
            hl = (
                cell_hist(landed)
                if track_drift and landed is not None
                else {}
            )
            if nb:
                _append_bucketed(survivors, emb_tbl, nb, ["cell"])
            else:
                survivors.write.mode("append").parquet(out_dir)
            if track_components:
                # Screened extras: the DROPPED vectors' rows, so later
                # batches can chain (and be screened) through them.
                # After the corpus append — a replayed batch re-derives
                # them (dropped vectors never land, so they survive the
                # exact screen on replay); duplicate extra rows are
                # benign (distinct pair evidence, idempotent merges).
                extras_delta = (
                    assigned_b.join(
                        survivors.select(id_col), on=id_col, how="left_anti"
                    )
                    .select(id_col, "v", "cell", "fp")
                    .localCheckpoint(eager=True)
                )
                if nb:
                    _append_bucketed(extras_delta, scr_tbl, nb, ["cell"])
                else:
                    extras_delta.write.mode("append").parquet(screened_dir)
            if track_drift:
                # Cell-histogram JSD of the checkpointed survivors vs
                # the pre-append landed snapshot. Written after the
                # corpus append — observability never blocks landing.
                hb = cell_hist(survivors)
                tb, tl = sum(hb.values()), sum(hl.values())
                shared = set(hb) & set(hl)
                jsd_q = pa_q = pb_q = 0
                import math as _m

                for cell in shared:
                    pa, pb = hb[cell] / tb, hl[cell] / tl
                    mm = (pa + pb) / 2.0
                    jsd_q += round((0.5 * pa * _m.log2(pa / mm)
                                    + 0.5 * pb * _m.log2(pb / mm)) * 1e9)
                    pa_q += round(pa * 1e9)
                    pb_q += round(pb * 1e9)
                jsd = (jsd_q + 0.5 * (2e9 - pa_q - pb_q)) / 1e9 if tb else 1.0
                spark.createDataFrame(
                    [(int(batch_id), int(tb), int(tl), len(shared), float(jsd))],
                    "batch_id long, n_batch_vecs long, n_landed_vecs long, "
                    "n_shared_cells int, jsd_bits double",
                ).write.mode("append").parquet(out_dir.rstrip("/") + "_drift")
            if compact_every and (batch_id + 1) % compact_every == 0 and os.path.exists(out_dir):
                if nb:
                    # Fold per-append bucket files back to one per
                    # bucket, PRESERVING the shuffle-free join layout
                    # (same murmur3 spec rides the directory swap).
                    _rewrite_bucketed_state(
                        spark,
                        out_dir.rstrip("/"),
                        emb_tbl,
                        spark.table(emb_tbl),
                        nb,
                        ["cell"],
                    )
                else:
                    compact_embedding_corpus(spark, out_dir)
                if track_components and _has_parquet(screened_dir):
                    compact_screened_extras(
                        spark, screened_dir, scr_tbl, nb, id_col
                    )
        finally:
            cached.unpersist()

    query = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def compact_screened_extras(
    spark: SparkSession,
    screened_dir: str,
    scr_tbl: str | None,
    n_buckets: int,
    id_col: str = "vec_id",
) -> None:
    """Fold the group-tracking screened-extras table (ADVICE r9).
    Replay itself adds no duplicates — the extras table participates
    in the exact fp screen, so a replayed dropped vector is screened
    by its own extras row (pytest pins zero growth across a full
    fresh-checkpoint replay) — but appends still fragment the dir one
    file set per batch, and the fold bounds that plus any duplicate
    rows a non-stream writer ever lands. A dropped vector's (id, v,
    cell, fp) row is deterministic, so dropDuplicates on the id is an
    exact fold. Bucketed mode preserves the shuffle-free cell layout
    through the same crash-safe rewrite as the landed table; plain
    mode range-clusters on ``cell`` through the same atomic dir
    swap."""
    from .corpus import _rewrite_bucketed_state

    scr_df = (
        spark.table(scr_tbl)
        if n_buckets
        else spark.read.parquet(screened_dir)
    ).dropDuplicates([id_col])
    if n_buckets:
        _rewrite_bucketed_state(
            spark, screened_dir, scr_tbl, scr_df, n_buckets, ["cell"]
        )
    else:
        from ..sources.state import TMP_SUFFIX, atomic_swap_dirs

        n_out = max(2, spark.sparkContext.defaultParallelism // 4)
        (
            scr_df.repartitionByRange(n_out, F.col("cell"))
            .sortWithinPartitions("cell")
            .write.mode("overwrite")
            .parquet(screened_dir.rstrip("/") + TMP_SUFFIX)
        )
        atomic_swap_dirs(screened_dir)


def compact_embedding_corpus(
    spark: SparkSession, path: str, num_files: int | None = None
) -> None:
    """Rewrite the landed embedding corpus range-clustered on ``cell``
    so per-cell probes and the streaming screen's cell join prune files
    by parquet footer min/max — appends fragment the table one file per
    batch otherwise. Swapped in via sources.state.atomic_swap_dirs; an
    interrupted swap of THIS table is the dangerous one (the landed
    table is the dedup state — a missing dir reads as 'no state' and
    re-ingests duplicates), so ingest_embeddings_stream repairs any
    leftover swap before its first batch."""
    from ..sources.state import TMP_SUFFIX, atomic_swap_dirs

    df = spark.read.parquet(path)
    n = num_files or max(2, spark.sparkContext.defaultParallelism // 4)
    (
        df.repartitionByRange(n, F.col("cell"))
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(path.rstrip("/") + TMP_SUFFIX)
    )
    atomic_swap_dirs(path)
