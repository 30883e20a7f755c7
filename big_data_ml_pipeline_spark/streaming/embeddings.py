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

from ..functions.vector import cosine_similarity, l2_norm, l2_norm_sql
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


def _pq_fingerprint(
    codebooks: list[list[list[float]]],
    residual_centroids: list[list[float]] | None = None,
    rotation: list[list[float]] | None = None,
) -> str:
    """Content fingerprint of a codebook kit (md5 over the exact float
    repr literals — the same strings the SQL twins embed). Residual
    codes are a DIFFERENT code space under the same codebooks (they
    quantize v − centroid(cell)), so residual mode folds the coarse
    centroids into the fingerprint: reopening residual codes as raw
    codes — or under different coarse centroids — fails the marker
    check instead of silently screening against wrong
    reconstructions. OPQ codes (quantizing the ROTATED quantity) are
    likewise a different code space under the same codebooks, so a
    rotation folds in the same way. Raw-mode fingerprints are
    unchanged (existing states stay valid)."""
    import hashlib

    if residual_centroids is None:
        payload = repr(codebooks)
    else:
        payload = repr(("residual", residual_centroids, codebooks))
    if rotation is not None:
        payload = repr(("opq", rotation)) + payload
    return hashlib.md5(payload.encode()).hexdigest()


def _check_pq_marker(
    state_dir: str, codebooks: list[list[list[float]]],
    residual_centroids: list[list[float]] | None = None,
    rotation: list[list[float]] | None = None,
) -> None:
    """Refuse to screen against codes produced by a DIFFERENT codebook
    kit — the codes themselves carry no provenance, so a mismatched
    kit would silently compute ADC similarities against the wrong
    reconstructions (the `_BUCKET_SPEC` lesson applied to the PQ
    layout: no engine-side check exists)."""
    marker = os.path.join(state_dir, "_PQ_SPEC")
    if os.path.exists(marker):
        with open(marker) as f:
            prev = f.read().strip()
        if prev != _pq_fingerprint(codebooks, residual_centroids, rotation):
            raise ValueError(
                f"codes-only embedding state at {state_dir} was encoded "
                "with a different codebook kit (or the other raw/residual "
                "code space); reopen with the original kit or re-encode "
                "via migrate_embedding_state_to_pq / "
                "rotate_embedding_state_codebooks after clearing the state"
            )


def _write_pq_marker(
    state_dir: str, codebooks: list[list[list[float]]],
    residual_centroids: list[list[float]] | None = None,
    overwrite: bool = False,
    rotation: list[list[float]] | None = None,
) -> None:
    """Idempotent marker write at OPEN time, before any data file can
    land (the ADVICE-r8 ordering: a crash mid-first-batch must never
    leave codes on disk without the spec guarding their reuse).
    ``overwrite=True`` replaces an existing marker — only valid when
    the caller is about to (re-)encode the whole state under the
    given kit (migration/rotation), never on a plain reopen."""
    os.makedirs(state_dir, exist_ok=True)
    marker = os.path.join(state_dir, "_PQ_SPEC")
    if overwrite or not os.path.exists(marker):
        with open(marker, "w") as f:
            f.write(_pq_fingerprint(codebooks, residual_centroids, rotation))


def _check_embedding_state_layout(
    spark: SparkSession, path: str, pq_mode: bool
) -> None:
    """Refuse a silent hot-state layout switch (VERDICT r10 item 1's
    migration contract): the raw layout carries ``v array<double>``,
    the PQ layout ``codes array<int>`` — reopening one as the other
    would either crash deep inside a batch join or, worse, silently
    screen against the wrong representation. Driver-side footer probe,
    no job."""
    from .corpus import _has_parquet

    if not _has_parquet(path):
        return
    cols = {f.name for f in spark.read.parquet(path).schema.fields}
    if pq_mode and "codes" not in cols:
        raise ValueError(
            f"embedding state at {path} carries raw vectors (legacy "
            "layout); run migrate_embedding_state_to_pq before "
            "reopening with codebooks"
        )
    if not pq_mode and "codes" in cols:
        raise ValueError(
            f"embedding state at {path} is codes-only (PQ layout); "
            "reopen with the codebooks it was built with"
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
    codebooks: list[list[list[float]]] | None = None,
    pq_round_digits: int = 9,
    nprobe: int = 1,
    pq_residual: bool = False,
    pq_rotation: list[list[float]] | None = None,
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

    With ``codebooks`` (VERDICT r10 item 1 — the 100 TB hot-state fix),
    the landed table and the screened extras are CODES-ONLY: ``(id,
    codes array<int>, cell, fp)`` — m small ints per vector instead of
    the raw ``array<double>`` — so the ONE unboundedly-growing state
    table stores bytes, not vectors; the raw corpus stays cold. The
    semantic screens switch to the asymmetric form (ADC, Jégou 2011
    §III-B) via :func:`~..operators.similarity.pq_adc_screen_kit`: an
    incoming RAW vector is compared against each candidate's
    RECONSTRUCTION through m integer lookups — cross-batch against the
    landed/extras codes, and within a batch the lower-id side
    contributes its codes (the representation it is about to land
    with), so within-batch and cross-batch apply the IDENTICAL
    comparison and the streamed outcome still equals the one-shot
    batch reduction under the q164 conditions (id-ordered contiguous
    batches + ``track_components`` + the rounding knobs — the q168
    probe's oracle mirrors the ADC expression term-for-term). The
    within-batch RULE is the same in BOTH layouts: SemDeDup's min-id
    rule, i.e. drop on ANY lower-id same-cell twin, kept or dropped
    (:func:`~..operators.similarity.semdedup` removes every ``id_b``
    of its pair set — an A—B—C chain lands {A} in both layouts and
    both tracking modes; pinned by ``tests/test_pq_streaming_state.
    py::test_pq_within_batch_rule_identical_across_layouts``). What
    ``codebooks=`` DOES change is the similarity itself: screens
    compare an incoming raw vector against candidates'
    RECONSTRUCTIONS, so a vector far from its quantization can
    keep/drop differently than under the raw-layout ingest's raw-raw
    cosine (same pin test, quantization fixture) — an inherent
    property of the codes-only design, independent of the tracking
    mode. Reopening a legacy raw-layout state dir with ``codebooks``
    fails loudly — run :func:`migrate_embedding_state_to_pq` first.

    ``nprobe`` (VERDICT r13 item 3): how many cells an INCOMING vector
    probes in every semantic screen — within-batch and cross-batch, in
    both layouts. The default 1 is SemDeDup's cell-local design (and
    the historical behavior, byte-identical): a twin that straddles a
    cell boundary — assigned to the neighbouring cell — is not seen.
    ``nprobe=2+`` explodes each incoming vector to its top-n cells
    before the screens' cell equi-joins (the batch decontamination's
    probe pattern, q172), so boundary twins are caught; candidates
    are still compared at their single ASSIGNED cell, so the join
    fan-out is nprobe × batch on the PROBE side only, never on the
    corpus side. Stream == one-shot batch still holds under the q164
    conditions with the rule "drop b iff some lower-id rep a has
    cell(a) ∈ top-nprobe-cells(b) and sim ≥ threshold"
    (tests/test_pq_streaming_state.py::test_ingest_nprobe_*).

    ``pq_residual`` (round-14 close of the NOTES known non-goal):
    with ``codebooks``, the hot state stores RESIDUAL codes — each
    landed/screened vector's codes quantize v − centroid(cell) (true
    IVFADC, Jégou 2011 §III-A), so the same m×k code budget spends
    its resolution on the part the coarse cell doesn't explain. Every
    ADC screen switches to the residual reconstruction algebra
    (``pq_adc_screen_kit(codebooks, centroids=centroids)``):
    sim(v, cand) = (v·c + Σ_j lut_j) / (‖v‖·‖c + recon‖) with the
    cross-term ‖·‖² table precomputed driver-side — still m+1 literal
    lookups per pair, map-only prep. Residual codes are a DIFFERENT
    code space under the same codebooks, so the ``_PQ_SPEC``
    fingerprint folds the coarse centroids in: reopening residual
    state in raw mode (or vice versa, or under different centroids)
    fails loudly. Stream == one-shot batch holds under the same
    conditions as raw-code PQ — only the similarity function changes.

    With ``pq_rotation`` (OPQ, Ge 2013 — requires ``codebooks``), the
    hot state's codes quantize the ROTATED quantity (R·v, or the
    rotated residual under ``pq_residual``) against codebooks trained
    in that space, and every ADC screen rotates the incoming raw
    vector first (``pq_adc_screen_kit(rotation=...)``). Since R is
    orthogonal the cosine is mathematically unchanged — the rotation
    buys reconstruction accuracy at identical state size. OPQ codes
    are a different code space under the same codebooks, so the
    ``_PQ_SPEC`` fingerprint folds the rotation in (the residual
    precedent).

    Returns the finished StreamingQuery (Trigger.AvailableNow).
    """
    from ..operators.similarity import _centroid_exprs, cosine_near_dup_pairs
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

    if track_drift and len(centroids) > 65536:
        # The drift report collects one (cell, count) histogram per
        # side per batch to the driver — bounded by n_cells, which is
        # fine at any realistic IVF fan-out but would quietly become a
        # driver-side bottleneck at an extreme cell count (VERDICT r13
        # nit 2: make the implicit bound explicit). 64Ki cells ×
        # ~16 B/entry ≈ 1 MiB per histogram — comfortably under any
        # driver budget; beyond that, disable drift or aggregate it as
        # a side output instead.
        raise ValueError(
            f"track_drift collects a per-batch cell histogram to the "
            f"driver; {len(centroids)} cells exceeds the supported "
            "bound (65536) — disable track_drift at this fan-out"
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
    pq = codebooks is not None
    if pq_residual and not pq:
        raise ValueError("pq_residual requires codebooks")
    if pq_rotation is not None and not pq:
        raise ValueError("pq_rotation requires codebooks")
    res_cents = centroids if (pq and pq_residual) else None
    _check_embedding_state_layout(stream.sparkSession, out_dir.rstrip("/"), pq)
    _check_embedding_state_layout(stream.sparkSession, screened_dir, pq)
    if pq:
        _check_pq_marker(
            out_dir.rstrip("/"), codebooks, res_cents, pq_rotation
        )
        _write_pq_marker(
            out_dir.rstrip("/"), codebooks, res_cents,
            rotation=pq_rotation,
        )
        if track_components:
            _check_pq_marker(screened_dir, codebooks, res_cents, pq_rotation)
            _write_pq_marker(
                screened_dir, codebooks, res_cents, rotation=pq_rotation
            )
    cb, comp_tbl = _components_setup(
        stream.sparkSession, comp_dir, track_components,
        components_n_buckets,
        stream.schema[id_col].dataType.simpleString(),
    )

    nb = int(cell_n_buckets or 0)
    id_ddl = stream.schema[id_col].dataType.simpleString()
    payload_ddl = "`codes` array<int>" if pq else "`v` array<double>"
    state_ddl = (
        f"`{id_col}` {id_ddl}, {payload_ddl}, `cell` int, `fp` bigint"
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

    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    _pc_sims, _pc_top = (
        _centroid_exprs(centroids, round_assign_digits)
        if nprobe > 1
        else (None, None)
    )

    def _with_probe_cells(df_, keep_cols):
        """Explode a batch frame (must carry `v`) to one row per
        top-``nprobe`` probe cell — the b-side of every semantic
        screen when nprobe > 1. Candidates keep their single ASSIGNED
        cell, so only the batch-sized probe side fans out; the
        corpus-side join stays one row per landed vector."""
        return df_.select(
            *keep_cols,
            F.explode(
                _pc_top(_pc_sims.sql("v", l2_norm_sql("v")), nprobe)
            ).alias("cell"),
        )

    if pq:
        from ..operators.similarity import pq_adc_screen_kit, pq_append_codes

        # Residual + rotation (ADVICE r15 high): the screen kit's
        # residual algebra lives ENTIRELY in the rotated space — codes
        # quantize R·(v − c), so a candidate's rotated-space
        # reconstruction is R·c + Σ_j cb_j[code_j] and the kit needs
        # R·c, not c. pq_append_codes conversely subtracts the RAW
        # centroid before rotating (rotate ∘ subtract), and the
        # _PQ_SPEC fingerprint stays raw-centroid-keyed — one shared
        # res_cents cannot serve both, so the screen gets its own
        # rotated copy (driver-side, n_cells × dim floats).
        screen_cents = res_cents
        if res_cents is not None and pq_rotation is not None:
            screen_cents = [
                [
                    float(sum(r[i] * c[i] for i in range(len(c))))
                    for r in pq_rotation
                ]
                for c in res_cents
            ]
        prep_raw, adc_cos = pq_adc_screen_kit(
            codebooks, centroids=screen_cents, rotation=pq_rotation
        )
        # Residual mode carries one extra precomputed probe column —
        # the raw vector's centroid dot table (see pq_adc_screen_kit).
        _adc_cols = ["__adc_luts", "__adc_norm"] + (
            ["__adc_cdots"] if pq_residual else []
        )

        def _adc_sim(codes_col):
            # Post-join, `cell` is always the CANDIDATE's assigned
            # cell (probes fan out; candidates never do), which is
            # exactly the cell the residual algebra needs.
            simc = adc_cos(codes_col)
            if screen_round_digits is not None:
                simc = F.round(simc, screen_round_digits)
            return simc

    def _cell_hist(df_):
        c = df_.groupBy("cell").agg(F.count("*").cast("long").alias("cnt"))
        return {r["cell"]: r["cnt"] for r in c.collect()}

    def _write_drift(spark, batch_id, survivors, hl):
        # Cell-histogram JSD of the checkpointed survivors vs the
        # pre-append landed snapshot. Written after the corpus append —
        # observability never blocks landing. Layout-agnostic: both the
        # raw and codes-only paths carry `cell`.
        hb = _cell_hist(survivors)
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

    def _maybe_compact(spark, batch_id):
        # _has_parquet, not exists: the PQ marker pre-creates the state
        # dir at open, and compacting a dir with no data files yet
        # would fail the plain-parquet read.
        if not (compact_every and (batch_id + 1) % compact_every == 0
                and _has_parquet(out_dir.rstrip("/"))):
            return
        if nb:
            # Fold per-append bucket files back to one per bucket,
            # PRESERVING the shuffle-free join layout (same murmur3
            # spec rides the directory swap).
            _rewrite_bucketed_state(
                spark, out_dir.rstrip("/"), emb_tbl,
                spark.table(emb_tbl), nb, ["cell"],
            )
        else:
            compact_embedding_corpus(spark, out_dir)
        if track_components and _has_parquet(screened_dir):
            compact_screened_extras(spark, screened_dir, scr_tbl, nb, id_col)

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
                if nprobe > 1:
                    # b probes its top-n cells; a sits at its assigned
                    # cell — pair iff cell(a) ∈ topn(b), matching the
                    # cross-batch rule below exactly.
                    bpr = _with_probe_cells(
                        assigned_b,
                        [F.col(id_col).alias("id_b"),
                         F.col("v").alias("__bv")],
                    )
                    pairs_w = (
                        bpr.join(
                            assigned_b.select(
                                "cell",
                                F.col(id_col).alias("id_a"),
                                F.col("v").alias("__av"),
                            ),
                            on="cell",
                        )
                        .filter(F.col("id_a") < F.col("id_b"))
                        .filter(
                            _screen_sim(F.col("__bv"), F.col("__av"))
                            >= F.lit(threshold)
                        )
                        .select("id_a", "id_b")
                        .localCheckpoint(eager=True)
                    )
                else:
                    pairs_w = cosine_near_dup_pairs(
                        assigned_b, block_cols=["cell"], threshold=threshold,
                        id_col=id_col, vec_col="v", max_block_size=4096,
                    ).select("id_a", "id_b").localCheckpoint(eager=True)
                probe_side = (
                    _with_probe_cells(
                        assigned_b, [F.col(id_col), F.col("v")]
                    )
                    if nprobe > 1
                    else assigned_b
                )
                near_pairs = None
                if states:
                    per_state = [
                        probe_side.join(
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
                if nprobe > 1:
                    assigned = ivf_index(
                        batch, centroids, id_col=id_col, vec_col=vec_col,
                        round_assign_digits=round_assign_digits,
                    ).join(batch.select(id_col, "fp"), on=id_col)
                    bpr = _with_probe_cells(
                        assigned,
                        [F.col(id_col).alias("__idb"),
                         F.col("v").alias("__bv")],
                    )
                    dropped_w = (
                        bpr.join(
                            assigned.select(
                                "cell",
                                F.col(id_col).alias("__ida"),
                                F.col("v").alias("__av"),
                            ),
                            on="cell",
                        )
                        .filter(F.col("__ida") < F.col("__idb"))
                        .filter(
                            _screen_sim(F.col("__bv"), F.col("__av"))
                            >= F.lit(threshold)
                        )
                        .select(F.col("__idb").alias(id_col))
                        .distinct()
                    )
                    assigned = assigned.join(
                        dropped_w, on=id_col, how="left_anti"
                    )
                else:
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
                    probe_nt = (
                        _with_probe_cells(
                            assigned, [F.col(id_col), F.col("v")]
                        )
                        if nprobe > 1
                        else assigned
                    )
                    near = (
                        probe_nt.join(
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

            # Pin the landed histogram BEFORE the append: the bucketed
            # CATALOG table refreshes its file listing in place on
            # insert, so a post-append read would count this batch's
            # own survivors into the corpus side (the plain-parquet
            # path pins its listing at _read_state time, but collecting
            # here keeps both modes on the same pre-append snapshot).
            hl = (
                _cell_hist(landed)
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
                _write_drift(spark, batch_id, survivors, hl)
            _maybe_compact(spark, batch_id)
        finally:
            cached.unpersist()

    def write_batch_pq(batch_df: DataFrame, batch_id: int) -> None:
        """Codes-only twin of write_batch (VERDICT r10 item 1): the
        hot state carries (id, codes, cell, fp); every semantic screen
        is the asymmetric ADC comparison — incoming raw vector vs a
        candidate's codes — through pq_adc_screen_kit, so the batch's
        raw vectors are read once and never stored."""
        spark = batch_df.sparkSession
        tagged = batch_df.withColumn("fp", F.xxhash64(F.col(vec_col)))
        cached = tagged.persist()
        try:
            # 1: exact dedup — identical to the raw path (the
            # fingerprint is computed on the incoming raw vector and
            # STORED, so the exact screen never needs `v` back).
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
                landed = (
                    spark.table(emb_tbl)
                    if _has_parquet(out_dir.rstrip("/"))
                    else None
                )
            else:
                landed = _read_state(spark, out_dir)
            extras = None
            if track_components:
                extras = (
                    spark.table(scr_tbl)
                    if nb and _has_parquet(screened_dir)
                    else (None if nb else _read_state(spark, screened_dir))
                )
                if extras is not None and not extras.head(1):
                    extras = None
            states = [s for s in (landed, extras) if s is not None]
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
            # Assignment + PQ encode + ADC prep ONCE per batch — all
            # map-only over the batch; the corpus side is never touched
            # until the cell equi-joins below.
            assigned_b = ivf_index(
                batch, centroids, id_col=id_col, vec_col=vec_col,
                round_assign_digits=round_assign_digits,
            ).join(batch.select(id_col, "fp"), on=id_col)
            encoded_b = pq_append_codes(
                assigned_b, codebooks, vec_col="v",
                round_digits=pq_round_digits, centroids=res_cents,
                rotation=pq_rotation,
            )
            probe_b = prep_raw(encoded_b, F.col("v"))
            # 2: within-batch ADC pairs — the lower-id side contributes
            # its CODES (the representation it is about to land with),
            # the higher-id side its raw vector: exactly the comparison
            # a later batch would make against the landed table, so
            # within-batch and cross-batch screens are the same
            # function and the streamed outcome matches the one-shot
            # pair rule (drop on ANY lower-id twin in the same cell).
            a_side = probe_b.select(
                F.col("cell"),
                F.col(id_col).alias("id_a"),
                F.col("codes").alias("__acodes"),
            )
            b_side = (
                _with_probe_cells(
                    probe_b,
                    [F.col(id_col).alias("id_b"),
                     *[F.col(c) for c in _adc_cols]],
                )
                if nprobe > 1
                else probe_b.select(
                    F.col("cell"), F.col(id_col).alias("id_b"),
                    *_adc_cols,
                )
            )
            pairs_w = (
                b_side
                .join(a_side, on="cell")
                .filter(F.col("id_a") < F.col("id_b"))
                .filter(_adc_sim("__acodes") >= F.lit(threshold))
                .select("id_a", "id_b")
                .localCheckpoint(eager=True)
            )
            # 3: cross-batch ADC screen vs landed (∪ screened extras
            # under group tracking — chains through dropped twins).
            # Probed separately per state frame to keep each bucketed
            # table's CLUSTERED BY (cell) distribution (see raw path).
            probe_x = (
                _with_probe_cells(
                    probe_b,
                    [F.col(id_col), *[F.col(c) for c in _adc_cols]],
                )
                if nprobe > 1
                else probe_b
            )
            near_pairs = None
            if states:
                per_state = [
                    probe_x.join(
                        s.select(
                            F.col("cell"),
                            F.col("codes").alias("__scodes"),
                            F.col(id_col).alias("__sid"),
                        ),
                        on="cell",
                    )
                    .filter(_adc_sim("__scodes") >= F.lit(threshold))
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
            if track_components:
                comp_edges = pairs_w
                for extra_e in (exact_within, exact_cross, near_pairs):
                    if extra_e is not None:
                        comp_edges = comp_edges.unionByName(extra_e)
                # Pin edges BEFORE any state write below.
                comp_edges = comp_edges.localCheckpoint(eager=True)
                _merge_component_state(
                    spark, comp_dir, comp_tbl, cb, comp_edges,
                    batch_id, stream.schema[id_col].dataType,
                    compact_every=compact_every,
                    auto_compact_files=components_auto_compact_files,
                )
            dropped = pairs_w.select(F.col("id_b").alias(id_col))
            if near_pairs is not None:
                dropped = dropped.unionByName(
                    near_pairs.select(F.col("id_b").alias(id_col))
                )
            # 4: single append — codes-only survivors ARE the new state.
            survivors = (
                encoded_b.join(
                    dropped.distinct(), on=id_col, how="left_anti"
                )
                .select(id_col, "codes", "cell", "fp")
                .localCheckpoint(eager=True)
            )
            hl = (
                _cell_hist(landed)
                if track_drift and landed is not None
                else {}
            )
            if nb:
                _append_bucketed(survivors, emb_tbl, nb, ["cell"])
            else:
                survivors.write.mode("append").parquet(out_dir)
            if track_components:
                extras_delta = (
                    encoded_b.join(
                        survivors.select(id_col), on=id_col, how="left_anti"
                    )
                    .select(id_col, "codes", "cell", "fp")
                    .localCheckpoint(eager=True)
                )
                if nb:
                    _append_bucketed(extras_delta, scr_tbl, nb, ["cell"])
                else:
                    extras_delta.write.mode("append").parquet(screened_dir)
            if track_drift:
                _write_drift(spark, batch_id, survivors, hl)
            _maybe_compact(spark, batch_id)
        finally:
            cached.unpersist()

    query = (
        stream.writeStream.foreachBatch(write_batch_pq if pq else write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def migrate_embedding_state_to_pq(
    spark: SparkSession,
    out_dir: str,
    codebooks: list[list[list[float]]],
    cell_n_buckets: int | None = None,
    id_col: str = "vec_id",
    pq_round_digits: int = 9,
    residual_centroids: list[list[float]] | None = None,
    rotation: list[list[float]] | None = None,
) -> str:
    """Upgrade a legacy raw-vector embedding state dir — landed table
    plus its ``_screened`` sibling if present — to the codes-only PQ
    layout in one crash-safe map pass per table (VERDICT r10 item 1's
    migration contract): ``(id, v, cell, fp)`` → ``(id, codes, cell,
    fp)`` with ``codes`` from :func:`~..operators.similarity.
    pq_append_codes` (identical argmin/rounding/tie rule to the ingest
    itself, so a migrated row is byte-identical to the row the PQ
    ingest would have landed). The rewrite lands in a ``__tmp`` dir and
    swaps atomically (the compaction-swap precedent,
    ``sources.state.atomic_swap_dirs``); a crash at any point is
    repaired by ``recover_interrupted_swap`` — which both this function
    and the ingest run first. Idempotent: an already-migrated dir is a
    no-op. Returns a short status string per table, joined by '; '.

    Pass the same ``cell_n_buckets`` the ingest uses: bucketed mode
    rewrites through the registered catalog table so the murmur3
    bucket layout (and the shuffle-free probe joins it powers)
    survives the migration; plain mode range-clusters on ``cell``.

    ``residual_centroids``: migrate into the RESIDUAL code space
    instead (the ingest's ``pq_residual=True`` layout) — codes
    quantize v − centroid(cell) using the legacy rows' own ``cell``
    column, and the ``_PQ_SPEC`` fingerprint folds the centroids in.
    Pass the SAME coarse centroids the ingest uses.
    """
    from ..operators.similarity import pq_append_codes
    from ..sources.state import (
        TMP_SUFFIX,
        atomic_swap_dirs,
        recover_interrupted_swap,
    )
    from .corpus import (
        _check_bucket_marker,
        _has_parquet,
        _register_bucketed_state,
        _rewrite_bucketed_state,
        _state_table_name,
    )

    nb = int(cell_n_buckets or 0)
    id_ddl = None
    statuses = []
    targets = [(out_dir.rstrip("/"), "emb_corpus")]
    screened = out_dir.rstrip("/") + "_screened"
    if os.path.isdir(screened):
        targets.append((screened, "emb_screened"))
    for path, prefix in targets:
        recover_interrupted_swap(path)
        if not _has_parquet(path):
            statuses.append(f"{path}: no state")
            continue
        df = spark.read.parquet(path)
        cols = set(df.columns)
        if "codes" in cols and "v" not in cols:
            # Guard the no-op path too: "already migrated" must mean
            # "with THESE codebooks, in THIS code space" (and heal a
            # marker a crash between swap and marker-write may have
            # lost).
            _check_pq_marker(path, codebooks, residual_centroids, rotation)
            _write_pq_marker(path, codebooks, residual_centroids,
                             rotation=rotation)
            statuses.append(f"{path}: already migrated")
            continue
        if "v" not in cols:
            raise ValueError(
                f"embedding state at {path} has neither `v` nor `codes`"
                " — not an embedding state table"
            )
        enc = pq_append_codes(
            df, codebooks, vec_col="v", round_digits=pq_round_digits,
            centroids=residual_centroids, rotation=rotation,
        ).select(id_col, "codes", "cell", "fp")
        if nb:
            _check_bucket_marker(path, nb, "embedding state migration")
            id_ddl = id_ddl or df.schema[id_col].dataType.simpleString()
            tbl = _register_bucketed_state(
                spark, path, _state_table_name(path, prefix),
                f"`{id_col}` {id_ddl}, `codes` array<int>, `cell` int, "
                "`fp` bigint",
                ["cell"], nb,
            )
            # Marker BEFORE the rewrite (ADVICE r13): the rewrite
            # copies an existing _PQ_SPEC into its tmp dir, so codes
            # and fingerprint swap in atomically together — writing it
            # after leaves a crash window where codes-only files sit
            # on disk unguarded and the next open would "heal" the
            # marker with whatever kit the caller passes. A pre-swap
            # crash instead leaves raw layout + marker, which the
            # PQ-mode layout check still rejects. Overwrite: on a
            # raw-layout dir any existing marker is a crashed earlier
            # attempt's, and it must match the kit THIS rewrite
            # encodes with.
            _write_pq_marker(path, codebooks, residual_centroids,
                             overwrite=True, rotation=rotation)
            _rewrite_bucketed_state(spark, path, tbl, enc, nb, ["cell"])
        else:
            n_out = max(2, spark.sparkContext.defaultParallelism // 4)
            (
                enc.repartitionByRange(n_out, F.col("cell"))
                .sortWithinPartitions("cell")
                .write.mode("overwrite")
                .parquet(path + TMP_SUFFIX)
            )
            # The marker rides the swap: codes and their fingerprint
            # land atomically together.
            _write_pq_marker(path + TMP_SUFFIX, codebooks,
                             residual_centroids, rotation=rotation)
            atomic_swap_dirs(path)
        statuses.append(f"{path}: migrated")
    return "; ".join(statuses)


def rotate_embedding_state_codebooks(
    spark: SparkSession,
    out_dir: str,
    new_codebooks: list[list[list[float]]],
    raw_corpus: DataFrame,
    old_codebooks: list[list[list[float]]] | None = None,
    cell_n_buckets: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pq_round_digits: int = 9,
    old_centroids: list[list[float]] | None = None,
    new_centroids: list[list[float]] | None = None,
    cells: list[int] | None = None,
    old_rotation: list[list[float]] | None = None,
    new_rotation: list[list[float]] | None = None,
) -> str:
    """Re-encode a LIVE codes-only embedding state under retrained
    codebooks (VERDICT r13 item 2 — the lifecycle gap
    migrate_embedding_state_to_pq can't cover: codes cannot be
    re-encoded from codes). Joins each state table — landed corpus
    plus its ``_screened`` sibling if present — back to the COLD raw
    corpus by id, recomputes ``codes`` with the new kit (identical
    argmin/rounding/tie rule to the ingest, via
    :func:`~..operators.similarity.pq_append_codes`), keeps ``cell``
    and ``fp`` untouched (centroids and raw bytes don't change under
    a codebook rotation), and swaps each table in crash-safely with
    the NEW ``_PQ_SPEC`` fingerprint riding the same swap — a crash
    at any point leaves old codes + old marker or new codes + new
    marker, never a mismatched pair. Continuing the ingest with the
    new kit afterwards equals a fresh ingest that used the new kit
    from the start (pytest-pinned).

    ``old_codebooks`` (recommended) asserts the state was encoded
    with the kit you think it was; rotation refuses a fingerprint
    mismatch instead of silently re-encoding someone else's state.
    Raises if any state id is missing from ``raw_corpus`` — a partial
    rotation would silently mix code spaces.

    ``old_centroids`` / ``new_centroids`` select the RESIDUAL code
    space on either side (the ingest's ``pq_residual``): pass
    ``old_centroids`` when the existing state holds residual codes
    (its fingerprint folds the coarse centroids in), ``new_centroids``
    to re-encode residuals — so rotation also covers the raw→residual
    upgrade of a live codes-only state. Cells are NEVER reassigned
    here (that would be a re-index, not a rotation), so pass the same
    coarse kit the ingest uses.

    Scale shape: per table, ONE id equi-join against the cold corpus
    (shuffle on the join key — unavoidable and linear) + the map-only
    encode; the bucketed layout (pass the ingest's
    ``cell_n_buckets``) is preserved through the catalog-table
    rewrite, so post-rotation probes stay exchange-free.

    ``cells`` (VERDICT r14 item 4 — SELECTIVE maintenance): re-encode
    ONLY the rows assigned to the listed coarse cells; every other
    row keeps its codes verbatim. Legal only for a RESIDUAL state
    whose kit changed NOWHERE ELSE — the guard requires identical
    codebooks and identical centroids outside ``cells`` (otherwise
    untouched rows would silently hold stale codes in the new code
    space). Because unflagged cells' residuals are untouched by a
    flagged-cell recenter, the selective result is BIT-IDENTICAL to a
    full rotation under the same new kit (pytest-pinned) — but the
    join + encode touch only the flagged cells' members: at 100 TB,
    repairing 3 drifted cells of 4096 costs 3/4096ths of a full
    rotation, not all of it.
    """
    from ..operators.similarity import pq_append_codes
    from ..sources.state import (
        TMP_SUFFIX,
        atomic_swap_dirs,
        recover_interrupted_swap,
    )
    from .corpus import (
        _check_bucket_marker,
        _has_parquet,
        _register_bucketed_state,
        _rewrite_bucketed_state,
        _state_table_name,
    )

    nb = int(cell_n_buckets or 0)
    if cells is not None:
        cset = sorted({int(x) for x in cells})
        if new_centroids is None or old_centroids is None:
            raise ValueError(
                "cells-restricted rotation only applies to a RESIDUAL "
                "state (raw codes don't depend on centroids — there is "
                "nothing cell-local to re-encode)"
            )
        if old_codebooks is None:
            raise ValueError(
                "cells-restricted rotation requires old_codebooks — the "
                "untouched cells' codes must provably live in the same "
                "code space"
            )
        if new_codebooks != old_codebooks:
            raise ValueError(
                "cells-restricted rotation cannot change codebooks — "
                "codes in untouched cells would go stale"
            )
        if new_rotation != old_rotation:
            raise ValueError(
                "cells-restricted rotation cannot change the OPQ "
                "rotation — every cell's codes live in the rotated "
                "space, so a rotation change invalidates untouched "
                "cells too"
            )
        for i, (a, b) in enumerate(zip(old_centroids, new_centroids)):
            if i not in cset and list(a) != list(b):
                raise ValueError(
                    f"centroid {i} changed but is not in cells= — a "
                    "partial rotation would mix code spaces"
                )
    new_fp = _pq_fingerprint(new_codebooks, new_centroids, new_rotation)
    raw = raw_corpus.select(
        F.col(id_col), F.col(vec_col).alias("__raw_v")
    )
    statuses = []
    targets = [(out_dir.rstrip("/"), "emb_corpus")]
    screened = out_dir.rstrip("/") + "_screened"
    if os.path.isdir(screened):
        targets.append((screened, "emb_screened"))
    for path, prefix in targets:
        recover_interrupted_swap(path)
        if not _has_parquet(path):
            statuses.append(f"{path}: no state")
            continue
        df = spark.read.parquet(path)
        if "codes" not in df.columns:
            raise ValueError(
                f"embedding state at {path} is not codes-only — rotation "
                "re-encodes PQ codes; run migrate_embedding_state_to_pq "
                "for a raw-layout state"
            )
        marker = os.path.join(path, "_PQ_SPEC")
        if os.path.exists(marker):
            with open(marker) as f:
                prev = f.read().strip()
            if prev == new_fp:
                statuses.append(f"{path}: already rotated")
                continue
            if (
                old_codebooks is not None
                and prev != _pq_fingerprint(
                    old_codebooks, old_centroids, old_rotation
                )
            ):
                raise ValueError(
                    f"embedding state at {path} was encoded with a "
                    "different kit than old_codebooks — refusing to "
                    "rotate a state of unknown provenance"
                )
        if cells is not None:
            todo = df.filter(F.col("cell").isin(cset))
            n_todo = todo.count()
            enc_changed = pq_append_codes(
                todo.drop("codes").join(raw, on=id_col),
                new_codebooks, vec_col="__raw_v",
                round_digits=pq_round_digits, centroids=new_centroids,
                rotation=new_rotation,
            ).select(id_col, "codes", "cell", "fp")
            n_enc = enc_changed.count()
            if n_enc != n_todo:
                raise ValueError(
                    f"selective rotation of {path}: raw_corpus covers "
                    f"{n_enc} of {n_todo} flagged-cell rows — every "
                    "flagged id needs its cold raw vector to re-encode"
                )
            enc = (
                df.filter(~F.col("cell").isin(cset))
                .select(id_col, "codes", "cell", "fp")
                .unionByName(enc_changed)
            )
        else:
            n_state = df.count()
            enc = pq_append_codes(
                df.drop("codes").join(raw, on=id_col),
                new_codebooks, vec_col="__raw_v",
                round_digits=pq_round_digits, centroids=new_centroids,
                rotation=new_rotation,
            ).select(id_col, "codes", "cell", "fp")
            n_enc = enc.count()
            if n_enc != n_state:
                raise ValueError(
                    f"rotation of {path}: raw_corpus covers {n_enc} of "
                    f"{n_state} state rows — every landed/screened id "
                    "needs its cold raw vector to re-encode"
                )
        if nb:
            _check_bucket_marker(path, nb, "embedding codebook rotation")
            id_ddl = df.schema[id_col].dataType.simpleString()
            tbl = _register_bucketed_state(
                spark, path, _state_table_name(path, prefix),
                f"`{id_col}` {id_ddl}, `codes` array<int>, `cell` int, "
                "`fp` bigint",
                ["cell"], nb,
            )
            # New marker rides the rewrite's swap (pq_spec=...): codes
            # and fingerprint land atomically together.
            _rewrite_bucketed_state(
                spark, path, tbl, enc, nb, ["cell"], pq_spec=new_fp
            )
        else:
            n_out = max(2, spark.sparkContext.defaultParallelism // 4)
            (
                enc.repartitionByRange(n_out, F.col("cell"))
                .sortWithinPartitions("cell")
                .write.mode("overwrite")
                .parquet(path + TMP_SUFFIX)
            )
            with open(os.path.join(path + TMP_SUFFIX, "_PQ_SPEC"), "w") as f:
                f.write(new_fp)
            atomic_swap_dirs(path)
        statuses.append(f"{path}: rotated")
    return "; ".join(statuses)


def recenter_state_cells(
    spark: SparkSession,
    out_dir: str,
    raw_corpus: DataFrame,
    centroids: list[list[float]],
    cells: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Recenter ONLY the listed coarse cells of a live embedding state
    on their CURRENT landed members (VERDICT r14 item 4): each flagged
    cell's centroid becomes the quantized-integer mean (the
    ivf_recenter 1e-6 pattern — partition-order independent) of the
    raw vectors of the rows the state assigns to it; every other
    centroid is returned verbatim. Never reassigns a row — the state's
    own ``cell`` column is the membership, exactly the contract the
    selective rotation (``cells=``) requires. A flagged cell with no
    members keeps its old centroid.

    Scale shape: one semi-join-shaped id equi-join restricted to the
    flagged cells' members + ONE (cell, pos) aggregation; the collect
    is |flagged| × dim rows — KB-scale, like every centroid update."""
    from ..functions.vector import to_double_array

    cset = sorted({int(x) for x in cells})
    state = spark.read.parquet(out_dir.rstrip("/"))
    raw = raw_corpus.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("__rv")
    )
    members = (
        state.filter(F.col("cell").isin(cset))
        .select(id_col, "cell")
        .join(raw, on=id_col)
    )
    rows = (
        members.select("cell", F.posexplode("__rv").alias("pos0", "x"))
        .groupBy("cell", "pos0")
        .agg(
            (
                F.sum(
                    F.round(F.col("x") * 1_000_000).cast("long")
                ).cast("bigint")
                / (F.count("*") * F.lit(1_000_000.0))
            ).alias("cv")
        )
        .collect()
    )
    got: dict[int, dict[int, float]] = {}
    for r in rows:
        got.setdefault(int(r["cell"]), {})[int(r["pos0"])] = float(r["cv"])
    new_cents = [[float(x) for x in c] for c in centroids]
    for cell, d in got.items():
        new_cents[cell] = [d[i] for i in range(len(new_cents[cell]))]
    return new_cents


def split_state_cell(
    spark: SparkSession,
    out_dir: str,
    raw_corpus: DataFrame,
    centroids: list[list[float]],
    cell: int,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_n_buckets: int | None = None,
    pq_round_digits: int = 9,
    residual: bool = False,
    rotation: list[list[float]] | None = None,
    round_assign_digits: int | None = None,
    n_iter: int = 5,
) -> list[list[float]]:
    """Split one OVERLOADED coarse cell of a live codes-only embedding
    state via 2-means on its CURRENT members (VERDICT r15 item 5 —
    the maintenance sibling recenter/rotate/maintain don't cover: a
    hot cell's probe cost grows linearly forever until its population
    is divided). The flagged cell's centroid is replaced by one
    2-means child and the other child is APPENDED at index
    ``len(centroids)``; every other centroid — and every other cell's
    rows — stays bit-identical. Returns the widened centroid kit.

    2-means (seeded deterministically: child A starts at the current
    centroid, child B at the member with the LOWEST rounded cosine to
    it, ties by id): ``n_iter`` rounds of rounded-argmax assignment
    (ties → A, matching the ivf rule's first-max-wins with A's index
    below B's) + the quantized-integer mean update
    (:func:`recenter_state_cells`'s partition-order-independent rule);
    an empty side keeps its centroid. Each round is ONE distributed
    (side, pos) aggregation over the flagged members only.

    State rewrite (landed + ``_screened`` sibling): flagged-cell rows
    joined back to the cold raw corpus, reassigned between A and B by
    the final rounded rule, and — in the RESIDUAL code space — both
    halves' codes re-encoded against their new centroid (A moved too);
    raw codes keep their bytes (they don't depend on the cell).
    Untouched cells' rows are copied verbatim, the new ``_PQ_SPEC``
    fingerprint (which folds the widened centroids under
    ``residual``) rides the same crash-safe swap as the rotation, and
    the bucketed layout survives through the catalog-table rewrite.
    On a corpus whose cells are separated (the regime where splitting
    is meaningful), the post-split state equals a fresh ingest under
    the widened kit (pytest-pinned).

    Scale shape: the 2-means touches ONLY the flagged cell's members
    (n_iter bounded aggregations + one 1-row collect for the far
    seed); the rewrite is the rotation's id equi-join restricted to
    those members plus a verbatim copy of everything else."""
    from ..functions.vector import to_double_array
    from ..operators.similarity import nested_double_lit, pq_append_codes
    from ..sources.state import (
        TMP_SUFFIX,
        atomic_swap_dirs,
        recover_interrupted_swap,
    )
    from .corpus import (
        _check_bucket_marker,
        _has_parquet,
        _register_bucketed_state,
        _rewrite_bucketed_state,
        _state_table_name,
    )

    cell = int(cell)
    if not 0 <= cell < len(centroids):
        raise ValueError(f"cell {cell} out of range 0..{len(centroids) - 1}")
    nb = int(cell_n_buckets or 0)
    recover_interrupted_swap(out_dir.rstrip("/"))
    state = spark.read.parquet(out_dir.rstrip("/"))
    if "codes" not in state.columns:
        raise ValueError(
            "split_state_cell operates on the codes-only state layout; "
            "migrate first (migrate_embedding_state_to_pq)"
        )
    res_cents = centroids if residual else None
    _check_pq_marker(out_dir.rstrip("/"), codebooks, res_cents, rotation)
    raw = raw_corpus.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("__rv")
    )
    members = (
        state.filter(F.col("cell") == cell)
        .select(id_col)
        .join(raw, on=id_col)
    ).persist()
    try:
        n_members = members.count()
        if n_members < 2:
            return [list(map(float, c)) for c in centroids]

        def _sim(cvec):
            simc = cosine_similarity(
                F.col("__rv"), nested_double_lit([float(x) for x in cvec])
            )
            if round_assign_digits is not None:
                simc = F.round(simc, round_assign_digits)
            return simc

        c_a = [float(x) for x in centroids[cell]]
        far = (
            members.select(id_col, "__rv", _sim(c_a).alias("__s"))
            .orderBy(F.col("__s").asc(), F.col(id_col).asc())
            .limit(1)
            .collect()[0]
        )
        c_b = [float(x) for x in far["__rv"]]

        def _means(side_col):
            rows = (
                members.select(side_col.alias("__side"),
                               F.posexplode("__rv").alias("pos0", "x"))
                .groupBy("__side", "pos0")
                .agg(
                    (
                        F.sum(
                            F.round(F.col("x") * 1_000_000).cast("long")
                        ).cast("bigint")
                        / (F.count("*") * F.lit(1_000_000.0))
                    ).alias("cv")
                )
                .collect()
            )
            got: dict[int, dict[int, float]] = {}
            for r in rows:
                got.setdefault(int(r["__side"]), {})[int(r["pos0"])] = float(
                    r["cv"]
                )
            return got

        for _ in range(int(n_iter)):
            side = F.when(_sim(c_a) >= _sim(c_b), F.lit(0)).otherwise(
                F.lit(1)
            )
            got = _means(side)
            if 0 in got:
                c_a = [got[0][i] for i in range(len(c_a))]
            if 1 in got:
                c_b = [got[1][i] for i in range(len(c_b))]
        new_cents = [[float(x) for x in c] for c in centroids]
        new_cents[cell] = c_a
        new_cents.append(c_b)
        b_index = len(new_cents) - 1
        new_res_cents = new_cents if residual else None
        new_fp = _pq_fingerprint(codebooks, new_res_cents, rotation)

        final_side = F.when(_sim(c_a) >= _sim(c_b), F.lit(cell)).otherwise(
            F.lit(b_index)
        )
        targets = [(out_dir.rstrip("/"), "emb_corpus")]
        screened = out_dir.rstrip("/") + "_screened"
        if os.path.isdir(screened):
            recover_interrupted_swap(screened)
            targets.append((screened, "emb_screened"))
        for path, prefix in targets:
            if not _has_parquet(path):
                continue
            df = spark.read.parquet(path)
            untouched = df.filter(F.col("cell") != cell).select(
                id_col, "codes", "cell", "fp"
            )
            moved = (
                df.filter(F.col("cell") == cell)
                .select(id_col, "fp", "codes")
                .join(raw, on=id_col)
                .select(
                    id_col, "fp", "codes",
                    F.col("__rv").alias("v"),
                    final_side.cast("int").alias("cell"),
                )
            )
            n_flag = df.filter(F.col("cell") == cell).count()
            n_moved = moved.count()
            if n_moved != n_flag:
                raise ValueError(
                    f"split of {path}: raw_corpus covers {n_moved} of "
                    f"{n_flag} flagged-cell rows — every member needs its "
                    "cold raw vector to reassign"
                )
            if residual:
                enc_moved = pq_append_codes(
                    moved.drop("codes"), codebooks, vec_col="v",
                    round_digits=pq_round_digits, centroids=new_cents,
                    rotation=rotation,
                ).select(id_col, "codes", "cell", "fp")
            else:
                # Raw/OPQ-raw codes don't depend on the cell — only
                # the assignment moves; the bytes stay verbatim.
                enc_moved = moved.select(id_col, "codes", "cell", "fp")
            enc = untouched.unionByName(enc_moved)
            if nb:
                _check_bucket_marker(path, nb, "embedding cell split")
                id_ddl = df.schema[id_col].dataType.simpleString()
                tbl = _register_bucketed_state(
                    spark, path, _state_table_name(path, prefix),
                    f"`{id_col}` {id_ddl}, `codes` array<int>, "
                    "`cell` int, `fp` bigint",
                    ["cell"], nb,
                )
                _rewrite_bucketed_state(
                    spark, path, tbl, enc, nb, ["cell"], pq_spec=new_fp
                )
            else:
                n_out = max(2, spark.sparkContext.defaultParallelism // 4)
                (
                    enc.repartitionByRange(n_out, F.col("cell"))
                    .sortWithinPartitions("cell")
                    .write.mode("overwrite")
                    .parquet(path + TMP_SUFFIX)
                )
                with open(
                    os.path.join(path + TMP_SUFFIX, "_PQ_SPEC"), "w"
                ) as f:
                    f.write(new_fp)
                atomic_swap_dirs(path)
        return new_cents
    finally:
        members.unpersist()


def retire_state_cell(
    spark: SparkSession,
    out_dir: str,
    centroids: list[list[float]],
    cell: int,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    cell_n_buckets: int | None = None,
    residual: bool = False,
    rotation: list[list[float]] | None = None,
) -> list[list[float]]:
    """Retire an EMPTY coarse cell of a live codes-only embedding
    state — the :func:`split_state_cell` sibling completing the
    classical index-maintenance family (an empty cell wastes nprobe
    budget forever, q135's other flag): the LAST centroid moves into
    the retired slot (swap-with-last, the O(1) compaction), the kit
    shrinks by one, and ONLY the former last cell's rows re-label to
    the freed index — their codes stay byte-identical (residual codes
    depend on centroid VALUES, which don't change; only the index
    moves), and every other row is untouched. Refuses if the flagged
    cell has ANY member in the landed or screened table (retiring a
    populated cell would orphan rows), or if it is the last cell.
    The shrunken-kit ``_PQ_SPEC`` rides the crash-safe swap.

    Index-move caveat (documented, fixture-safe): relocating the last
    centroid to a lower index can flip an EXACT assignment tie
    between it and a centroid whose index sat between the two — a
    measure-zero event under rounded cosine; continued ingests assign
    with the compacted kit going forward."""
    from ..sources.state import (
        TMP_SUFFIX,
        atomic_swap_dirs,
        recover_interrupted_swap,
    )
    from .corpus import (
        _check_bucket_marker,
        _has_parquet,
        _register_bucketed_state,
        _rewrite_bucketed_state,
        _state_table_name,
    )

    cell = int(cell)
    last = len(centroids) - 1
    if not 0 <= cell <= last:
        raise ValueError(f"cell {cell} out of range 0..{last}")
    if len(centroids) < 2:
        raise ValueError("cannot retire the only cell")
    nb = int(cell_n_buckets or 0)
    recover_interrupted_swap(out_dir.rstrip("/"))
    res_cents = centroids if residual else None
    _check_pq_marker(out_dir.rstrip("/"), codebooks, res_cents, rotation)
    targets = [(out_dir.rstrip("/"), "emb_corpus")]
    screened = out_dir.rstrip("/") + "_screened"
    if os.path.isdir(screened):
        recover_interrupted_swap(screened)
        targets.append((screened, "emb_screened"))
    frames = []
    for path, prefix in targets:
        if not _has_parquet(path):
            continue
        df = spark.read.parquet(path)
        if "codes" not in df.columns:
            raise ValueError(
                "retire_state_cell operates on the codes-only state "
                "layout; migrate first (migrate_embedding_state_to_pq)"
            )
        n_members = df.filter(F.col("cell") == cell).count()
        if n_members:
            raise ValueError(
                f"cell {cell} has {n_members} member(s) in {path} — "
                "only EMPTY cells retire (recenter or split populated "
                "ones)"
            )
        frames.append((path, prefix, df))
    new_cents = [[float(x) for x in c] for c in centroids]
    moved = new_cents.pop()
    if cell != last:
        new_cents[cell] = moved
    new_res_cents = new_cents if residual else None
    new_fp = _pq_fingerprint(codebooks, new_res_cents, rotation)
    for path, prefix, df in frames:
        enc = df.select(
            F.col(id_col), "codes",
            F.when(F.col("cell") == last, F.lit(cell))
            .otherwise(F.col("cell"))
            .cast("int")
            .alias("cell"),
            "fp",
        )
        if nb:
            _check_bucket_marker(path, nb, "embedding cell retire")
            id_ddl = df.schema[id_col].dataType.simpleString()
            tbl = _register_bucketed_state(
                spark, path, _state_table_name(path, prefix),
                f"`{id_col}` {id_ddl}, `codes` array<int>, "
                "`cell` int, `fp` bigint",
                ["cell"], nb,
            )
            _rewrite_bucketed_state(
                spark, path, tbl, enc, nb, ["cell"], pq_spec=new_fp
            )
        else:
            n_out = max(2, spark.sparkContext.defaultParallelism // 4)
            (
                enc.repartitionByRange(n_out, F.col("cell"))
                .sortWithinPartitions("cell")
                .write.mode("overwrite")
                .parquet(path + TMP_SUFFIX)
            )
            with open(os.path.join(path + TMP_SUFFIX, "_PQ_SPEC"), "w") as f:
                f.write(new_fp)
            atomic_swap_dirs(path)
    return new_cents


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
        _carry_pq_spec(screened_dir, screened_dir.rstrip("/") + TMP_SUFFIX)
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
    _carry_pq_spec(path, path.rstrip("/") + TMP_SUFFIX)
    atomic_swap_dirs(path)


def _carry_pq_spec(src_dir: str, dst_dir: str) -> None:
    """Ride the codebook-fingerprint marker through a directory swap —
    a compaction/migration rewrite must never strip the guard on its
    own files (same rule as _BUCKET_SPEC in the bucketed rewrite)."""
    import shutil

    spec = os.path.join(src_dir.rstrip("/"), "_PQ_SPEC")
    if os.path.exists(spec):
        shutil.copy(spec, os.path.join(dst_dir, "_PQ_SPEC"))


def copy_embedding_state(src: str, dest: str) -> None:
    """File-level copy of a landed embedding state and its siblings
    (``_screened``, ``_components``, ``_drift``) INCLUDING the
    ``_PQ_SPEC`` / ``_BUCKET_SPEC`` markers — the non-destructive base
    of :meth:`~..orchestrator.PipelineOrchestrator.
    merge_embedding_states` (merge = copy A, replay B's members
    through the real ingest). Refuses an existing destination; the
    checkpoint is NOT copied (the replay runs under its own)."""
    import shutil

    src, dest = src.rstrip("/"), dest.rstrip("/")
    if not os.path.isdir(src):
        raise ValueError(f"no embedding state at {src}")
    for suffix in ("", "_screened", "_components", "_drift"):
        if os.path.exists(dest + suffix):
            raise ValueError(
                f"merge destination already exists: {dest + suffix}"
            )
    for suffix in ("", "_screened", "_components", "_drift"):
        if os.path.isdir(src + suffix):
            shutil.copytree(src + suffix, dest + suffix)


def state_member_ids(
    spark: SparkSession, src: str, id_col: str = "vec_id"
) -> DataFrame:
    """Distinct ids carried by a state — landed plus the ``_screened``
    extras sibling when present (dropped members still matter: their
    codes chain future screens, so a merge must replay them too)."""
    src = src.rstrip("/")
    ids = spark.read.parquet(src).select(id_col)
    screened = src + "_screened"
    if os.path.isdir(screened) and any(
        n.endswith(".parquet") for n in os.listdir(screened)
    ):
        ids = ids.unionByName(
            spark.read.parquet(screened).select(id_col)
        )
    return ids.distinct()


def read_state_pq_spec(src: str) -> str | None:
    """The state's ``_PQ_SPEC`` fingerprint, or None for a raw-layout
    state — merge refuses to combine states with different kits."""
    marker = os.path.join(src.rstrip("/"), "_PQ_SPEC")
    if not os.path.exists(marker):
        return None
    with open(marker) as fh:
        return fh.read().strip()
