"""Codes-only PQ streaming embedding state (VERDICT r10 item 1).

Covers the four contracts the ADC wiring depends on:

1. **ADC arithmetic pin** — ``pq_adc_screen_kit``'s ``adc_cos`` equals a
   pure-Python IEEE-754 reference computed with the IDENTICAL fold
   grouping (per-subspace partial dot products summed in j order)
   bit-for-bit. NOTE the ADVICE-r11 phrasing "equals
   cosine_similarity(raw, reconstruction) bit-for-bit" cannot hold
   literally: the flat cosine folds all dim elements in one sequence
   while ADC sums m per-subspace partials — IEEE addition is not
   associative, so the two differ in the last ulps. What the
   stream==batch contract actually needs is that the BATCH TWIN uses
   the same grouped expression — pinned here against Python (and in the
   q168 oracle twin term-for-term). The flat form is asserted to within
   1e-9 and equal after the screen's 6-digit rounding.
2. **stream == batch** — the codes-only ingest over id-ordered shards
   lands exactly the one-shot pair-rule reduction (drop on ANY lower-id
   same-cell rep whose CODES the raw vector ADC-matches), with the
   landed table carrying (id, codes, cell, fp) and NO raw vectors.
3. **Layout guard** — reopening a legacy raw-vector state dir with
   codebooks fails loudly (and vice versa).
4. **Migration** — ``migrate_embedding_state_to_pq`` upgrades a legacy
   dir (landed + screened extras) crash-safely and idempotently, and a
   PQ ingest continued on the migrated state matches the phase-aware
   one-shot reduction.
"""

from __future__ import annotations

import math
import os
import time
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from big_data_ml_pipeline_spark.operators.similarity import (
    deterministic_ivf_centroids,
    pq_adc_screen_kit,
    pq_append_codes,
    pq_codebooks,
    pq_encode,
)
from big_data_ml_pipeline_spark.streaming import embeddings as se

DIM, M, K, NCELLS = 16, 4, 4, 4
D = DIM // M
CBS = pq_codebooks(dim=DIM, m=M, k=K)
CENTS = deterministic_ivf_centroids(dim=DIM, n_cells=NCELLS)


# ---------------------------------------------------------------- python ref
# Pure-Python IEEE-754 references mirroring the Spark expressions'
# exact fold order: aggregate(zip_with(a,b,*), 0.0, acc+x) is a
# sequential left fold, F.round is HALF_UP over the shortest-repr
# decimal (java BigDecimal.valueOf == Python Decimal(repr(x))).

def seq_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def seq_norm(a):
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return math.sqrt(acc)


def rhu(x, n):
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP
        )
    )


CB2 = [[float(sum(x * x for x in cb)) for cb in CBS[j]] for j in range(M)]


def py_codes(v, round_digits=9):
    codes = []
    for j in range(M):
        s = v[j * D: (j + 1) * D]
        sn = seq_dot(s, s)
        dists = [
            rhu(sn - 2.0 * seq_dot(s, cb) + CB2[j][c], round_digits)
            for c, cb in enumerate(CBS[j])
        ]
        codes.append(dists.index(min(dists)))
    return codes


def py_adc_cos(v, codes):
    dotsum = None
    r2 = None
    for j in range(M):
        t = seq_dot(v[j * D: (j + 1) * D], CBS[j][codes[j]])
        n = CB2[j][codes[j]]
        dotsum = t if dotsum is None else dotsum + t
        r2 = n if r2 is None else r2 + n
    denom = seq_norm(v) * math.sqrt(r2)
    return dotsum / denom if denom != 0 else 0.0


def py_cell(v):
    vnorm = seq_norm(v)
    sims = []
    for c in CENTS:
        nc = math.sqrt(sum(x * x for x in c))
        s = seq_dot(v, c) / (vnorm * nc) if (vnorm * nc) != 0 else 0.0
        sims.append(rhu(s, 6))
    return sims.index(max(sims))


def py_raw_cos(a, b):
    denom = seq_norm(a) * seq_norm(b)
    return seq_dot(a, b) / denom if denom != 0 else 0.0


def one_shot(rows, thr, pq_from_id=None):
    """One-shot pair-rule reduction: min-id rep per identical vector,
    then drop any rep with a lower-id same-cell twin. ``pq_from_id``
    phase boundary: a rep b with id >= pq_from_id is screened with the
    ADC sim against the lower rep's CODES (the PQ ingest's rule),
    below it with the raw-raw cosine (the legacy ingest's rule); both
    rounded to 6 digits. Returns (kept ids, dropped-semantic ids,
    reps dict id->v)."""
    first = {}
    for vid, v in sorted(rows):
        key = tuple(v)
        if key not in first:
            first[key] = vid
    reps = {vid: v for vid, v in rows if first[tuple(v)] == vid}
    cells = {vid: py_cell(v) for vid, v in reps.items()}
    codes = {vid: py_codes(v) for vid, v in reps.items()}
    dropped = set()
    for vid in sorted(reps):
        for lower in sorted(reps):
            if lower >= vid:
                break
            if cells[lower] != cells[vid]:
                continue
            if pq_from_id is not None and vid >= pq_from_id:
                sim = py_adc_cos(reps[vid], codes[lower])
            else:
                sim = py_raw_cos(reps[vid], reps[lower])
            if rhu(sim, 6) >= thr:
                dropped.add(vid)
                break
    return set(reps) - dropped, dropped, reps


# ---------------------------------------------------------------- fixtures

def recon(p, q, r, s):
    """A vector that IS its own PQ reconstruction (distance-0 codes),
    so its ADC self-similarity is exactly 1 and near copies score
    ~0.999 — lets the fixture plant semantic twins the coarse k=4
    codebooks actually catch."""
    return [float(x) for x in CBS[0][p] + CBS[1][q] + CBS[2][r] + CBS[3][s]]


def near(v, eps, coord=0):
    out = list(v)
    out[coord] = out[coord] + eps
    return [float(x) for x in out]


def write_shards(spark, in_dir, shards):
    os.makedirs(in_dir, exist_ok=True)
    for i, rows in enumerate(shards):
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        p = os.path.join(in_dir, f"s{i}.parquet")
        df.toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))


BASE = [recon(0, 1, 2, 3), recon(1, 0, 3, 2), recon(2, 3, 0, 1),
        recon(3, 2, 1, 0), recon(0, 0, 1, 1), recon(2, 2, 3, 3)]

# Shard layout (ids ascending across shards — the q164 replay-order
# condition): shard1 plants an exact dup, shard2 a cross-batch near
# twin AND a chain through it (31 twins 30 which twins 11's base),
# shard3 an exact dup of a DROPPED vector (extras fp screen) plus a
# novel vector.
SHARD1 = [(10, BASE[0]), (11, BASE[1]), (12, BASE[2]), (13, BASE[0])]
SHARD2 = [(20, BASE[3]), (21, near(BASE[1], 1e-3)), (22, BASE[4])]
SHARD3 = [(30, near(BASE[1], 2e-3)), (31, BASE[5]), (32, near(BASE[1], 1e-3))]
ALL_ROWS = SHARD1 + SHARD2 + SHARD3
THR = 0.9


def test_adc_cos_bitexact_vs_grouped_reference(spark):
    """adc_cos == the grouped-fold Python reference bit-for-bit, and
    ~= the flat reconstruction cosine to 1e-9 / equal at the screen's
    6-digit rounding (the association caveat documented above)."""
    import random

    rng = random.Random(42)
    vecs = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(20)]
    vecs += BASE + [near(BASE[0], 1e-3)]
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    enc = pq_append_codes(df, CBS, vec_col="embedding")
    prep_raw, adc_cos = pq_adc_screen_kit(CBS)
    # Screen every vector against every OTHER vector's codes — the
    # exact shape the ingest's cell joins produce.
    a = enc.select(
        F.col("vec_id").alias("id_a"), F.col("codes").alias("__acodes")
    )
    b = prep_raw(df, F.col("embedding")).select(
        F.col("vec_id").alias("id_b"), "__adc_luts", "__adc_norm"
    )
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in b.crossJoin(a)
        .select("id_a", "id_b", adc_cos(F.col("__acodes")).alias("sim"))
        .collect()
    }
    codes = {r["vec_id"]: list(r["codes"]) for r in enc.collect()}
    by_id = dict(rows)
    n_close = 0
    for (ia, ib), sim in got.items():
        expect = py_adc_cos(by_id[ib], codes[ia])
        assert sim == expect, (ia, ib, sim, expect)  # bit-for-bit
        rec = [x for j in range(M) for x in CBS[j][codes[ia][j]]]
        flat = py_raw_cos(by_id[ib], rec)
        assert abs(sim - flat) < 1e-9
        if rhu(sim, 6) == rhu(flat, 6):
            n_close += 1
    # 6-digit rounding: allow the (never-yet-seen) boundary straddle
    # on at most a stray pair, but the fixture must agree en masse.
    assert n_close >= len(got) - 1
    # Spark's codes match the Python HALF_UP argmin reference too.
    for vid, v in rows:
        assert codes[vid] == py_codes(v), vid


def test_pq_ingest_codes_only_stream_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [SHARD1, SHARD2, SHARD3])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out, ckpt,
        centroids=CENTS, threshold=THR, track_components=True,
        round_assign_digits=6, screen_round_digits=6, codebooks=CBS,
    )
    landed = spark.read.parquet(out)
    assert set(landed.columns) == {"vec_id", "codes", "cell", "fp"}
    kept, dropped, reps = one_shot(ALL_ROWS, THR, pq_from_id=0)
    # The fixture must exercise every screen: exact dups (13, 32),
    # a cross-batch ADC drop (21), and a chain through a dropped twin
    # (30 vs 21's codes).
    assert dropped, "fixture no longer plants semantic twins"
    got = {r["vec_id"]: r for r in landed.collect()}
    assert set(got) == kept
    for vid in kept:
        assert list(got[vid]["codes"]) == py_codes(reps[vid])
        assert got[vid]["cell"] == py_cell(reps[vid])
    # Extras carry the DROPPED reps (codes-only too); landed ∪ extras
    # = all reps exactly once.
    extras = spark.read.parquet(out + "_screened")
    assert set(extras.columns) == {"vec_id", "codes", "cell", "fp"}
    eids = {r["vec_id"] for r in extras.select("vec_id").collect()}
    assert eids == dropped
    # Replay with a fresh checkpoint: the fp screens (landed + extras)
    # land nothing new.
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out,
        str(tmp_path / "ck2"),
        centroids=CENTS, threshold=THR, track_components=True,
        round_assign_digits=6, screen_round_digits=6, codebooks=CBS,
    )
    assert spark.read.parquet(out).count() == len(kept)
    assert spark.read.parquet(out + "_screened").count() == len(dropped)


def test_pq_ingest_bucketed_matches_plain(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [SHARD1, SHARD2, SHARD3])
    results = {}
    for mode, nb in (("plain", None), ("bucketed", 4)):
        out = str(tmp_path / f"out_{mode}")
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in_dir), out,
            str(tmp_path / f"ck_{mode}"),
            centroids=CENTS, threshold=THR, track_components=True,
            round_assign_digits=6, screen_round_digits=6, codebooks=CBS,
            cell_n_buckets=nb, compact_every=2,
        )
        results[mode] = {
            (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
            for r in spark.read.parquet(out).collect()
        }
    assert results["plain"] == results["bucketed"]
    out_b = str(tmp_path / "out_bucketed")
    assert os.path.exists(out_b + "/_BUCKET_SPEC")
    # The cross-batch ADC screen's cell join against the bucketed
    # CODES table needs no landed-side exchange — the codes-only
    # layout inherits the raw path's shuffle-free screen (the r8
    # bucketed-state property, re-pinned on the new schema).
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    tbl = corpus_ops._state_table_name(out_b, "emb_corpus")
    probe = spark.createDataFrame(
        [(99, BASE[0])], ["vec_id", "embedding"]
    ).selectExpr("vec_id", "cast(pmod(vec_id, 4) as int) as cell")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = probe.join(spark.table(tbl).select("cell", "codes"), on="cell")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1  # probe side only
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pq_ingest_rejects_legacy_layout(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [SHARD1])
    out = str(tmp_path / "out")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out, str(tmp_path / "ck"),
        centroids=CENTS, threshold=THR,
        round_assign_digits=6, screen_round_digits=6,
    )
    assert "v" in spark.read.parquet(out).columns
    with pytest.raises(ValueError, match="legacy"):
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in_dir), out,
            str(tmp_path / "ck2"),
            centroids=CENTS, threshold=THR, codebooks=CBS,
        )
    # And the reverse: a codes-only dir refuses a raw-mode reopen.
    out2 = str(tmp_path / "out2")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out2,
        str(tmp_path / "ck3"),
        centroids=CENTS, threshold=THR, codebooks=CBS,
        round_assign_digits=6, screen_round_digits=6,
    )
    with pytest.raises(ValueError, match="codes-only"):
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in_dir), out2,
            str(tmp_path / "ck4"),
            centroids=CENTS, threshold=THR,
        )


def test_pq_state_migration_continues_exactly(spark, tmp_path):
    """Legacy raw-mode history (shard1, group tracking on) → migrate →
    PQ ingest of shards 2+3 on the migrated state == the phase-aware
    one-shot reduction (raw rule below id 20, ADC rule from 20 up).
    Also pins idempotence and the crash-leftover repair."""
    in1, in23 = str(tmp_path / "in1"), str(tmp_path / "in23")
    write_shards(spark, in1, [SHARD1])
    write_shards(spark, in23, [SHARD2, SHARD3])
    out = str(tmp_path / "out")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in1), out, str(tmp_path / "ck1"),
        centroids=CENTS, threshold=THR, track_components=True,
        round_assign_digits=6, screen_round_digits=6,
    )
    legacy = {
        r["vec_id"]: r for r in spark.read.parquet(out).collect()
    }
    assert "v" in next(iter(legacy.values())).asDict()
    # Crash leftover: a half-written rewrite must be discarded, not
    # swapped in.
    from big_data_ml_pipeline_spark.sources.state import TMP_SUFFIX

    stale = out + TMP_SUFFIX
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "junk"), "w") as fh:
        fh.write("x")
    status = se.migrate_embedding_state_to_pq(spark, out, CBS)
    assert "migrated" in status
    assert not os.path.exists(stale)
    migrated = spark.read.parquet(out)
    assert set(migrated.columns) == {"vec_id", "codes", "cell", "fp"}
    # Migrated codes == pq_encode of the legacy raw vectors, row by row.
    legacy_codes = {
        vid: py_codes([float(x) for x in r["v"]])
        for vid, r in legacy.items()
    }
    for r in migrated.collect():
        assert list(r["codes"]) == legacy_codes[r["vec_id"]]
        assert r["cell"] == legacy[r["vec_id"]]["cell"]
        assert r["fp"] == legacy[r["vec_id"]]["fp"]
    assert "already migrated" in se.migrate_embedding_state_to_pq(
        spark, out, CBS
    )
    # Continue in PQ mode over shards 2+3.
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in23), out, str(tmp_path / "ck2"),
        centroids=CENTS, threshold=THR, track_components=True,
        round_assign_digits=6, screen_round_digits=6, codebooks=CBS,
    )
    kept, dropped, reps = one_shot(ALL_ROWS, THR, pq_from_id=20)
    got = {r["vec_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == kept
    for vid in kept:
        assert list(got[vid]["codes"]) == py_codes(reps[vid])


def test_pq_encode_matches_append_codes(spark):
    """pq_encode and pq_append_codes share one expression builder —
    pin that the state-table form emits identical codes."""
    rows = [(i, v) for i, v in enumerate(BASE)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, CBS).collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in pq_append_codes(df, CBS, vec_col="embedding").collect()
    }
    assert a == b
    # And the self-reconstruction property the fixture relies on:
    # a concat-of-codebook-entries vector encodes to those entries.
    assert a[0] == [0, 1, 2, 3]


def test_pq_state_migration_bucketed(spark, tmp_path):
    """Bucketed-layout migration: a raw ingest history kept as a
    CLUSTERED BY (cell) table migrates to codes-only through the
    registered catalog table (murmur3 bucket layout and _BUCKET_SPEC
    survive), and a bucketed PQ ingest continued on it matches the
    plain two-phase run row for row."""
    in1, in23 = str(tmp_path / "in1"), str(tmp_path / "in23")
    write_shards(spark, in1, [SHARD1])
    write_shards(spark, in23, [SHARD2, SHARD3])
    results = {}
    for mode, nb in (("plain", None), ("bucketed", 4)):
        out = str(tmp_path / f"out_{mode}")
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in1), out,
            str(tmp_path / f"ck1_{mode}"),
            centroids=CENTS, threshold=THR, track_components=True,
            round_assign_digits=6, screen_round_digits=6,
            cell_n_buckets=nb,
        )
        status = se.migrate_embedding_state_to_pq(
            spark, out, CBS, cell_n_buckets=nb
        )
        assert "migrated" in status
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in23), out,
            str(tmp_path / f"ck2_{mode}"),
            centroids=CENTS, threshold=THR, track_components=True,
            round_assign_digits=6, screen_round_digits=6, codebooks=CBS,
            cell_n_buckets=nb,
        )
        results[mode] = {
            (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
            for r in spark.read.parquet(out).collect()
        }
    assert results["plain"] == results["bucketed"]
    out_b = str(tmp_path / "out_bucketed")
    with open(os.path.join(out_b, "_BUCKET_SPEC")) as fh:
        assert fh.read().strip() == "4"
    kept, _, reps = one_shot(ALL_ROWS, THR, pq_from_id=20)
    assert {t[0] for t in results["plain"]} == kept


def test_pq_codebook_marker_guards_reopen(spark, tmp_path):
    """_PQ_SPEC fingerprint marker (the _BUCKET_SPEC lesson applied to
    the codes-only layout): codes carry no provenance, so reopening a
    codes-only state with a DIFFERENT codebook kit must fail loudly —
    otherwise every ADC screen would silently compare raw vectors
    against the wrong reconstructions. The marker survives compaction
    (rides the swap) and guards the migration no-op path too."""
    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [SHARD1, SHARD2])
    out = str(tmp_path / "out")
    kw = dict(centroids=CENTS, threshold=THR, track_components=True,
              round_assign_digits=6, screen_round_digits=6)
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out,
        str(tmp_path / "ck"), codebooks=CBS, compact_every=1, **kw
    )
    assert os.path.exists(out + "/_PQ_SPEC")  # survived compaction
    assert os.path.exists(out + "_screened/_PQ_SPEC")
    other = pq_codebooks(dim=DIM, m=M, k=K, seed=7)
    with pytest.raises(ValueError, match="different codebook kit"):
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in_dir), out,
            str(tmp_path / "ck2"), codebooks=other, **kw
        )
    # The same kit reopens fine; a full replay lands nothing new.
    n = spark.read.parquet(out).count()
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out,
        str(tmp_path / "ck3"), codebooks=CBS, **kw
    )
    assert spark.read.parquet(out).count() == n
    with pytest.raises(ValueError, match="different codebook kit"):
        se.migrate_embedding_state_to_pq(spark, out, other)


def test_adc_bitexact_randomized_configs(spark):
    """Property sweep generalizing the bit-for-bit pin: across seeded
    random (dim, m, k) configs with ARBITRARY random codebooks (not
    the deterministic kit), Spark's encode argmin and adc_cos equal
    the pure-Python IEEE references exactly. Guards the expression
    builders against silent fold-order regressions for any codebook
    shape a user supplies."""
    import random

    for seed, dim, m, k in [(1, 8, 2, 3), (2, 12, 3, 5), (3, 32, 8, 4)]:
        rng = random.Random(seed)
        d = dim // m
        cbs = [
            [[rng.uniform(-2, 2) for _ in range(d)] for _ in range(k)]
            for _ in range(m)
        ]
        cb2 = [[float(sum(x * x for x in cb)) for cb in cbs[j]]
               for j in range(m)]
        vecs = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(12)]
        rows = [(i, v) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        enc = pq_append_codes(df, cbs, vec_col="embedding")
        codes = {r["vec_id"]: list(r["codes"]) for r in enc.collect()}

        def pcodes(v):
            out = []
            for j in range(m):
                s = v[j * d:(j + 1) * d]
                sn = seq_dot(s, s)
                dists = [
                    rhu(sn - 2.0 * seq_dot(s, cb) + cb2[j][c], 9)
                    for c, cb in enumerate(cbs[j])
                ]
                out.append(dists.index(min(dists)))
            return out

        def padc(v, cs):
            dotsum = r2 = None
            for j in range(m):
                t = seq_dot(v[j * d:(j + 1) * d], cbs[j][cs[j]])
                n = cb2[j][cs[j]]
                dotsum = t if dotsum is None else dotsum + t
                r2 = n if r2 is None else r2 + n
            den = seq_norm(v) * math.sqrt(r2)
            return dotsum / den if den != 0 else 0.0

        by_id = dict(rows)
        for vid, v in rows:
            assert codes[vid] == pcodes(v), (seed, vid)
        prep_raw, adc_cos = pq_adc_screen_kit(cbs)
        a = enc.select(
            F.col("vec_id").alias("id_a"), F.col("codes").alias("__ac")
        )
        b = prep_raw(df, F.col("embedding")).select(
            F.col("vec_id").alias("id_b"), "__adc_luts", "__adc_norm"
        )
        got = (
            b.crossJoin(a)
            .select("id_a", "id_b", adc_cos(F.col("__ac")).alias("sim"))
            .collect()
        )
        for r in got:
            expect = padc(by_id[r["id_b"]], codes[r["id_a"]])
            assert r["sim"] == expect, (seed, r["id_a"], r["id_b"])


def test_pq_migration_bucketed_marker_rides_swap(spark, tmp_path):
    """ADVICE r13 (medium): the bucketed migration must stamp _PQ_SPEC
    BEFORE the rewrite so the marker rides the atomic swap with the
    codes — a crash between swap and a late marker write would leave
    codes-only files whose next open 'heals' the marker with whatever
    kit the caller passes, defeating the wrong-codebook guard. Pins:
    (a) a crash inside the rewrite leaves raw layout + marker, which
    PQ-mode open still rejects; (b) a retry with a DIFFERENT kit
    overwrites the stale marker so data and fingerprint stay paired."""
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [SHARD1])
    out = str(tmp_path / "out")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out, str(tmp_path / "ck"),
        centroids=CENTS, threshold=THR, track_components=True,
        round_assign_digits=6, screen_round_digits=6, cell_n_buckets=4,
    )
    assert "v" in spark.read.parquet(out).columns
    real_rewrite = corpus_ops._rewrite_bucketed_state

    def boom(*a, **kw):
        raise RuntimeError("injected crash before the swap")

    corpus_ops._rewrite_bucketed_state = boom
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            se.migrate_embedding_state_to_pq(spark, out, CBS, cell_n_buckets=4)
    finally:
        corpus_ops._rewrite_bucketed_state = real_rewrite
    # Crash window state: marker present (for THIS kit), layout still
    # raw — and the PQ-mode layout check still refuses the dir.
    with open(os.path.join(out, "_PQ_SPEC")) as fh:
        assert fh.read().strip() == se._pq_fingerprint(CBS)
    assert "v" in spark.read.parquet(out).columns
    with pytest.raises(ValueError, match="legacy"):
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in_dir), out,
            str(tmp_path / "ck2"),
            centroids=CENTS, threshold=THR, track_components=True,
            codebooks=CBS, cell_n_buckets=4,
        )
    # Retrying the migration with a DIFFERENT kit must not inherit the
    # crashed attempt's fingerprint: the marker is overwritten in step
    # with the data it guards.
    other = pq_codebooks(dim=DIM, m=M, k=K, seed=7)
    status = se.migrate_embedding_state_to_pq(
        spark, out, other, cell_n_buckets=4
    )
    assert "migrated" in status
    with open(os.path.join(out, "_PQ_SPEC")) as fh:
        assert fh.read().strip() == se._pq_fingerprint(other)
    with pytest.raises(ValueError, match="different codebook kit"):
        se.migrate_embedding_state_to_pq(spark, out, CBS, cell_n_buckets=4)


def test_pq_within_batch_rule_identical_across_layouts(spark, tmp_path):
    """Resolve VERDICT r13 "what's wrong" #1 / ADVICE r13 by PINNING
    the truth: the within-batch dedup RULE is identical in the raw and
    codes-only layouts — SemDeDup's min-id rule is itself "drop on ANY
    lower-id same-cell twin" (similarity.semdedup removes every id_b
    of its pair set), so there is no pair-vs-greedy divergence to
    guard. On an A—B—C chain (cos(A,B), cos(B,C) >= thr, cos(A,C) <
    thr) BOTH layouts land {A} in BOTH tracking modes; a future
    'simplification' of either path to a greedy kept-rep rule (which
    would keep C) breaks this pin loudly.

    What ``codebooks=`` genuinely changes is the similarity FUNCTION:
    screens compare against reconstructions, so a vector far from its
    quantization can keep/drop differently than raw-raw cosine —
    pinned by the second fixture (raw drops E, PQ keeps it), in every
    tracking mode."""
    import math as _m

    # Hand-made kit: one IVF cell; m=2 codebooks whose entries are
    # unit vectors at 0/25/50/90 degrees in each 2-d subspace. A, B, C
    # are exact reconstructions (concat of entries), so the ADC sim
    # IS the raw cosine: cos(A,B)=cos(B,C)=cos(25 deg)~0.906 >= 0.9,
    # cos(A,C)=cos(50 deg)~0.643 < 0.9.
    angles = [0.0, 25.0, 50.0, 90.0]
    entry = [[_m.cos(_m.radians(a)), _m.sin(_m.radians(a))] for a in angles]
    cbs = [entry, entry]
    cents = [[1.0, 0.0, 0.0, 0.0]]

    def at(deg):
        return [_m.cos(_m.radians(deg)), _m.sin(_m.radians(deg))] * 2

    A, B, C = at(0.0), at(25.0), at(50.0)
    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [[(10, A), (11, B), (12, C)]])
    for tracking in (False, True):
        for tag, cb_kit in (("raw", None), ("pq", cbs)):
            out = str(tmp_path / f"out_{tag}_{tracking}")
            se.ingest_embeddings_stream(
                se.read_embeddings_stream(spark, in_dir), out,
                str(tmp_path / f"ck_{tag}_{tracking}"),
                centroids=cents, threshold=0.9,
                track_components=tracking,
                round_assign_digits=6, screen_round_digits=6,
                codebooks=cb_kit,
            )
            kept = {r["vec_id"] for r in spark.read.parquet(out).collect()}
            assert kept == {10}, (tag, tracking, kept)
    # Quantization divergence fixture: D at 10 deg encodes to the
    # 0-deg entry, E at 35 deg to the 25-deg entry. Raw cosine
    # cos(D,E)=cos(25 deg)~0.906 >= 0.9 -> raw layout drops E; the ADC
    # screen compares E's raw vector against D's RECONSTRUCTION (the
    # 0-deg entry): cos(35 deg)~0.819 < 0.9 -> codes-only layout keeps
    # E. The divergence is the similarity function, not the rule, and
    # it shows in every tracking mode.
    in2 = str(tmp_path / "in2")
    write_shards(spark, in2, [[(20, at(10.0)), (21, at(35.0))]])
    for tracking in (False, True):
        expected = {"raw": {20}, "pq": {20, 21}}
        for tag, cb_kit in (("raw", None), ("pq", cbs)):
            out = str(tmp_path / f"q_{tag}_{tracking}")
            se.ingest_embeddings_stream(
                se.read_embeddings_stream(spark, in2), out,
                str(tmp_path / f"qck_{tag}_{tracking}"),
                centroids=cents, threshold=0.9,
                track_components=tracking,
                round_assign_digits=6, screen_round_digits=6,
                codebooks=cb_kit,
            )
            kept = {r["vec_id"] for r in spark.read.parquet(out).collect()}
            assert kept == expected[tag], (tag, tracking, kept)


def test_pq_codebook_rotation_continues_exactly(spark, tmp_path):
    """Codebook rotation for a LIVE codes-only state (VERDICT r13
    item 2): ingest shards 1+2 under kit A, rotate the landed AND
    screened tables to kit B by joining back to the cold raw corpus,
    continue the ingest over shard 3 under kit B — and the final
    state equals a fresh ingest that used kit B from the start, in
    plain and bucketed layouts. Kit B is kit A with every codebook's
    entries REVERSED: the reconstruction SET per subspace is
    identical, so every ADC screen decision is provably unchanged and
    the pin isolates the rotation machinery itself (codes must all
    change; keep/drop must not). Also pins: the new _PQ_SPEC lands
    with the new codes on both tables, a wrong old_codebooks refuses,
    re-rotation is a no-op, and a raw_corpus that misses state ids
    refuses."""
    kit_b = [list(reversed(cb)) for cb in CBS]
    in12, in3, in_all = (
        str(tmp_path / "in12"), str(tmp_path / "in3"), str(tmp_path / "inall")
    )
    write_shards(spark, in12, [SHARD1, SHARD2])
    write_shards(spark, in3, [SHARD3])
    write_shards(spark, in_all, [SHARD1, SHARD2, SHARD3])
    raw_corpus = spark.createDataFrame(
        [(i, v) for i, v in SHARD1 + SHARD2 + SHARD3],
        ["vec_id", "embedding"],
    )
    kw = dict(centroids=CENTS, threshold=THR, track_components=True,
              round_assign_digits=6, screen_round_digits=6)
    for mode, nb in (("plain", None), ("bucketed", 4)):
        out = str(tmp_path / f"out_{mode}")
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in12), out,
            str(tmp_path / f"ck1_{mode}"),
            codebooks=CBS, cell_n_buckets=nb, **kw
        )
        before = {r["vec_id"]: list(r["codes"])
                  for r in spark.read.parquet(out).collect()}
        # Wrong provenance refuses.
        other = pq_codebooks(dim=DIM, m=M, k=K, seed=99)
        with pytest.raises(ValueError, match="different kit"):
            se.rotate_embedding_state_codebooks(
                spark, out, kit_b, raw_corpus, old_codebooks=other,
                cell_n_buckets=nb,
            )
        # Incomplete cold corpus refuses (drop one landed id).
        some_id = next(iter(before))
        with pytest.raises(ValueError, match="raw_corpus covers"):
            se.rotate_embedding_state_codebooks(
                spark, out, kit_b,
                raw_corpus.filter(F.col("vec_id") != some_id),
                old_codebooks=CBS, cell_n_buckets=nb,
            )
        status = se.rotate_embedding_state_codebooks(
            spark, out, kit_b, raw_corpus, old_codebooks=CBS,
            cell_n_buckets=nb,
        )
        assert status.count("rotated") == 2, status  # landed + screened
        for d in (out, out + "_screened"):
            with open(os.path.join(d, "_PQ_SPEC")) as fh:
                assert fh.read().strip() == se._pq_fingerprint(kit_b), d
        after = {r["vec_id"]: list(r["codes"])
                 for r in spark.read.parquet(out).collect()}
        assert set(after) == set(before)
        for vid in after:  # every code re-encoded: reversed index
            assert after[vid] == [K - 1 - c for c in before[vid]], vid
        assert "already rotated" in se.rotate_embedding_state_codebooks(
            spark, out, kit_b, raw_corpus, cell_n_buckets=nb,
        )
        # Continue under kit B; compare against a fresh kit-B run.
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in3), out,
            str(tmp_path / f"ck2_{mode}"),
            codebooks=kit_b, cell_n_buckets=nb, **kw
        )
        fresh = str(tmp_path / f"fresh_{mode}")
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in_all), fresh,
            str(tmp_path / f"ckf_{mode}"),
            codebooks=kit_b, cell_n_buckets=nb, **kw
        )
        for suffix in ("", "_screened"):
            got = {
                (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
                for r in spark.read.parquet(out + suffix).collect()
            }
            want = {
                (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
                for r in spark.read.parquet(fresh + suffix).collect()
            }
            assert got == want, (mode, suffix)


def _angle_vec(deg):
    import math as _m

    return [_m.cos(_m.radians(deg)), _m.sin(_m.radians(deg))] * 2


def test_ingest_nprobe_catches_boundary_twins(spark, tmp_path):
    """VERDICT r13 item 3: the streaming semantic screen's nprobe
    knob. Fixture: two centroids at 0° and 40° (in a repeated 2-d
    plane), twins v1 at 19° and v2 at 21° (cos(v1,v2)=cos 2° ≈ 0.9994
    ≥ 0.9) that straddle the cell boundary — v1 assigns to cell 0,
    v2 to cell 1. At nprobe=1 (SemDeDup cell-local, the default and
    historical behavior) BOTH land; at nprobe=2 v2 probes its second
    cell, finds v1, and is dropped. Pinned in BOTH layouts (raw
    cosine and ADC — v1 is an exact codebook reconstruction so the
    ADC sim IS the raw cosine), within-batch AND cross-batch, with
    and without tracking."""
    cents = [_angle_vec(0.0), _angle_vec(40.0)]
    entry = [_angle_vec(19.0)[:2], _angle_vec(90.0)[:2],
             _angle_vec(135.0)[:2], _angle_vec(180.0)[:2]]
    cbs = [entry, entry]
    v1, v2 = _angle_vec(19.0), _angle_vec(21.0)
    # within-batch fixture: same shard; cross-batch: separate shards.
    in_w, in_x = str(tmp_path / "in_w"), str(tmp_path / "in_x")
    write_shards(spark, in_w, [[(10, v1), (11, v2)]])
    write_shards(spark, in_x, [[(10, v1)], [(11, v2)]])
    case = 0
    for in_dir in (in_w, in_x):
        for tracking in (False, True):
            for cb_kit in (None, cbs):
                for np_, want in ((1, {10, 11}), (2, {10})):
                    out = str(tmp_path / f"o{case}")
                    se.ingest_embeddings_stream(
                        se.read_embeddings_stream(spark, in_dir), out,
                        str(tmp_path / f"c{case}"),
                        centroids=cents, threshold=0.9,
                        track_components=tracking,
                        round_assign_digits=6, screen_round_digits=6,
                        codebooks=cb_kit, nprobe=np_,
                    )
                    kept = {
                        r["vec_id"]
                        for r in spark.read.parquet(out).collect()
                    }
                    assert kept == want, (
                        in_dir, tracking, cb_kit is not None, np_, kept
                    )
                    case += 1


def test_ingest_nprobe2_stream_equals_batch(spark, tmp_path):
    """stream == one-shot batch at nprobe=2 (the q164/q168 contract
    generalized): the streamed PQ ingest over id-ordered shards with
    nprobe=2 lands exactly the one-shot reduction under the rule
    'drop b iff some lower-id rep a has cell(a) ∈ top-2-cells(b) and
    ADC sim ≥ threshold' — including chains through dropped twins
    (track_components extras) and exact dups."""
    def py_top_cells(v, n):
        vnorm = seq_norm(v)
        sims = []
        for c in CENTS:
            nc = math.sqrt(sum(x * x for x in c))
            sv = seq_dot(v, c) / (vnorm * nc) if (vnorm * nc) != 0 else 0.0
            sims.append(rhu(sv, 6))
        order = sorted(range(len(CENTS)), key=lambda i: (-sims[i], i))
        return order[:n]

    def one_shot_nprobe(rows, thr, n):
        first = {}
        for vid, v in sorted(rows):
            key = tuple(v)
            if key not in first:
                first[key] = vid
        reps = {vid: v for vid, v in rows if first[tuple(v)] == vid}
        cells = {vid: py_cell(v) for vid, v in reps.items()}
        codes = {vid: py_codes(v) for vid, v in reps.items()}
        dropped = set()
        for vid in sorted(reps):
            probe = py_top_cells(reps[vid], n)
            for lower in sorted(reps):
                if lower >= vid:
                    break
                if cells[lower] not in probe:
                    continue
                if rhu(py_adc_cos(reps[vid], codes[lower]), 6) >= thr:
                    dropped.add(vid)
                    break
        return set(reps) - dropped, dropped, reps

    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [SHARD1, SHARD2, SHARD3])
    out = str(tmp_path / "out")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out, str(tmp_path / "ck"),
        centroids=CENTS, threshold=THR, track_components=True,
        round_assign_digits=6, screen_round_digits=6, codebooks=CBS,
        nprobe=2,
    )
    kept, dropped, reps = one_shot_nprobe(ALL_ROWS, THR, 2)
    got = {r["vec_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == kept, (set(got), kept)
    for vid in kept:
        assert list(got[vid]["codes"]) == py_codes(reps[vid])
        assert got[vid]["cell"] == py_cell(reps[vid])
    # nprobe=2 must be at least as aggressive as nprobe=1 on the same
    # stream; the extras table carries exactly the dropped reps.
    kept1, _, _ = one_shot(ALL_ROWS, THR, pq_from_id=0)
    assert kept <= kept1
    eids = {r["vec_id"]
            for r in spark.read.parquet(out + "_screened").collect()}
    assert eids == dropped


# ------------------------------------------------------ residual (IVFADC)
# Round-14 close of the NOTES known non-goal: the streaming PQ ingest
# with RESIDUAL codes (pq_residual=True). The reconstruction becomes
# centroid(cell) + Σ_j cb_j[code_j], so the ADC cosine gains the
# centroid dot term and the [cell][j][code] cross-term norm table.
# Python references mirror pq_adc_screen_kit's residual fold order:
# dotsum = cdot(cell); += lut_j ...; r2 = c2[cell]; += rt[cell][j][c].

C2_CENT = [float(sum(x * x for x in c)) for c in CENTS]
RT_CENT = [
    [
        [
            float(2.0 * sum(c[j * D + i] * cb[i] for i in range(D))
                  + CB2[j][ci])
            for ci, cb in enumerate(CBS[j])
        ]
        for j in range(M)
    ]
    for c in CENTS
]
# Residual ADC on this fixture: near-twins of BASE[1] score ≈0.854,
# every unrelated same-cell pair ≤0.562 (measured) — 0.7 separates.
THR_RES = 0.7


def py_res_codes(v, cell, round_digits=9):
    r = [v[i] - CENTS[cell][i] for i in range(DIM)]
    codes = []
    for j in range(M):
        s = r[j * D: (j + 1) * D]
        sn = seq_dot(s, s)
        dists = [
            rhu(sn - 2.0 * seq_dot(s, cb) + CB2[j][c], round_digits)
            for c, cb in enumerate(CBS[j])
        ]
        codes.append(dists.index(min(dists)))
    return codes


def py_res_adc_cos(v, cell, codes):
    dotsum = seq_dot(v, CENTS[cell])
    r2 = C2_CENT[cell]
    for j in range(M):
        dotsum = dotsum + seq_dot(v[j * D: (j + 1) * D], CBS[j][codes[j]])
        r2 = r2 + RT_CENT[cell][j][codes[j]]
    denom = seq_norm(v) * math.sqrt(r2)
    return dotsum / denom if denom != 0 else 0.0


def one_shot_res(rows, thr, res_from_id=0):
    """One-shot pair-rule reduction under the RESIDUAL ADC similarity
    (with ``res_from_id`` the phase boundary: below it the legacy
    raw-raw cosine rule applies — the migration test's shape)."""
    first = {}
    for vid, v in sorted(rows):
        key = tuple(v)
        if key not in first:
            first[key] = vid
    reps = {vid: v for vid, v in rows if first[tuple(v)] == vid}
    cells = {vid: py_cell(v) for vid, v in reps.items()}
    codes = {vid: py_res_codes(v, cells[vid]) for vid, v in reps.items()}
    dropped = set()
    for vid in sorted(reps):
        for lower in sorted(reps):
            if lower >= vid:
                break
            if cells[lower] != cells[vid]:
                continue
            if vid >= res_from_id:
                sim = py_res_adc_cos(reps[vid], cells[lower], codes[lower])
            else:
                sim = py_raw_cos(reps[vid], reps[lower])
            if rhu(sim, 6) >= thr:
                dropped.add(vid)
                break
    return set(reps) - dropped, dropped, reps


def test_residual_adc_cos_bitexact(spark):
    """pq_adc_screen_kit(codebooks, centroids=...) == the grouped-fold
    Python residual reference bit-for-bit, and ~= the flat cosine
    against the materialized residual reconstruction to 1e-9."""
    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(12)]
    vecs += BASE[:3]
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    from big_data_ml_pipeline_spark.operators.similarity import ivf_index

    assigned = ivf_index(df, CENTS, id_col="vec_id", vec_col="embedding")
    enc = pq_append_codes(assigned, CBS, vec_col="v", centroids=CENTS)
    prep_raw, adc_cos = pq_adc_screen_kit(CBS, centroids=CENTS)
    a = enc.select(
        F.col("cell"), F.col("vec_id").alias("id_a"),
        F.col("codes").alias("__acodes"),
    )
    b = prep_raw(df, F.col("embedding")).select(
        F.col("vec_id").alias("id_b"),
        "__adc_luts", "__adc_norm", "__adc_cdots",
    )
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in b.crossJoin(a)
        .select("id_a", "id_b", adc_cos(F.col("__acodes")).alias("sim"))
        .collect()
    }
    meta = {r["vec_id"]: (r["cell"], list(r["codes"])) for r in enc.collect()}
    by_id = dict(rows)
    for (ia, ib), sim in got.items():
        cell, codes = meta[ia]
        assert codes == py_res_codes(by_id[ia], cell), ia
        expect = py_res_adc_cos(by_id[ib], cell, codes)
        assert sim == expect, (ia, ib, sim, expect)  # bit-for-bit
        rec = [
            CENTS[cell][j * D + i] + CBS[j][codes[j]][i]
            for j in range(M) for i in range(D)
        ]
        assert abs(sim - py_raw_cos(by_id[ib], rec)) < 1e-9


def test_residual_pq_ingest_stream_equals_batch(spark, tmp_path):
    """pq_residual=True: the streamed codes-only ingest with residual
    codes lands exactly the one-shot pair-rule reduction under the
    residual ADC similarity; landed codes == the Python residual
    argmin; the _PQ_SPEC marker refuses the raw↔residual code-space
    mixups; replay lands nothing new."""
    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [SHARD1, SHARD2, SHARD3])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    kw = dict(centroids=CENTS, threshold=THR_RES, track_components=True,
              round_assign_digits=6, screen_round_digits=6, codebooks=CBS)
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out, ckpt,
        pq_residual=True, **kw
    )
    landed = spark.read.parquet(out)
    assert set(landed.columns) == {"vec_id", "codes", "cell", "fp"}
    kept, dropped, reps = one_shot_res(ALL_ROWS, THR_RES)
    # Fixture exercises every screen: exact dups (13, 32), a
    # cross-batch residual-ADC drop (21), a chain through a dropped
    # twin (30 vs 21's codes).
    assert {21, 30} <= dropped and dropped != set()
    got = {r["vec_id"]: r for r in landed.collect()}
    assert set(got) == kept
    for vid in kept:
        assert got[vid]["cell"] == py_cell(reps[vid])
        assert list(got[vid]["codes"]) == py_res_codes(
            reps[vid], got[vid]["cell"]
        )
    eids = {r["vec_id"]
            for r in spark.read.parquet(out + "_screened").collect()}
    assert eids == dropped
    # Code-space guards: raw-mode reopen of a residual state refuses
    # (same codebooks — the marker must still differ), and so does a
    # residual reopen under different coarse centroids.
    with pytest.raises(ValueError, match="different codebook kit"):
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in_dir), out,
            str(tmp_path / "ck2"), **kw
        )
    other_cents = deterministic_ivf_centroids(
        dim=DIM, n_cells=NCELLS, seed=9
    )
    with pytest.raises(ValueError, match="different codebook kit"):
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in_dir), out,
            str(tmp_path / "ck3"),
            centroids=other_cents, threshold=THR_RES,
            track_components=True, round_assign_digits=6,
            screen_round_digits=6, codebooks=CBS, pq_residual=True,
        )
    # Replay with a fresh checkpoint: fp screens land nothing new.
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out,
        str(tmp_path / "ck4"), pq_residual=True, **kw
    )
    assert spark.read.parquet(out).count() == len(kept)
    assert spark.read.parquet(out + "_screened").count() == len(dropped)


def test_residual_migration_and_rotation_upgrade(spark, tmp_path):
    """Residual lifecycle: (a) a legacy raw-vector state migrates
    straight into the residual code space (residual_centroids=) and a
    continued pq_residual ingest matches the phase-aware one-shot
    reduction; (b) a live RAW-codes state upgrades to residual codes
    via rotation (new_centroids=) and continuing matches a fresh
    residual ingest from scratch."""
    in1, in23 = str(tmp_path / "in1"), str(tmp_path / "in23")
    in12, in3 = str(tmp_path / "in12"), str(tmp_path / "in3")
    in_all = str(tmp_path / "inall")
    write_shards(spark, in1, [SHARD1])
    write_shards(spark, in23, [SHARD2, SHARD3])
    write_shards(spark, in12, [SHARD1, SHARD2])
    write_shards(spark, in3, [SHARD3])
    write_shards(spark, in_all, [SHARD1, SHARD2, SHARD3])
    kw = dict(centroids=CENTS, threshold=THR_RES, track_components=True,
              round_assign_digits=6, screen_round_digits=6)
    # (a) legacy raw-vector shard1 history -> residual migration.
    out = str(tmp_path / "out_mig")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in1), out,
        str(tmp_path / "cka1"), **kw
    )
    status = se.migrate_embedding_state_to_pq(
        spark, out, CBS, residual_centroids=CENTS
    )
    assert "migrated" in status
    # Raw-mode PQ reopen refuses the residual marker; the residual
    # no-op path heals/verifies it.
    with pytest.raises(ValueError, match="different codebook kit"):
        se.migrate_embedding_state_to_pq(spark, out, CBS)
    assert "already migrated" in se.migrate_embedding_state_to_pq(
        spark, out, CBS, residual_centroids=CENTS
    )
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in23), out,
        str(tmp_path / "cka2"), codebooks=CBS, pq_residual=True, **kw
    )
    kept, dropped, reps = one_shot_res(ALL_ROWS, THR_RES, res_from_id=20)
    got = {r["vec_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == kept
    for vid in kept:
        assert list(got[vid]["codes"]) == py_res_codes(
            reps[vid], got[vid]["cell"]
        )
    # (b) raw-codes state (shards 1+2) -> rotation upgrade to residual.
    out_rot = str(tmp_path / "out_rot")
    raw_corpus = spark.createDataFrame(
        [(i, v) for i, v in SHARD1 + SHARD2 + SHARD3],
        ["vec_id", "embedding"],
    )
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in12), out_rot,
        str(tmp_path / "ckb1"), codebooks=CBS, **kw
    )
    status = se.rotate_embedding_state_codebooks(
        spark, out_rot, CBS, raw_corpus, old_codebooks=CBS,
        new_centroids=CENTS,
    )
    assert status.count("rotated") == 2, status
    for d in (out_rot, out_rot + "_screened"):
        with open(os.path.join(d, "_PQ_SPEC")) as fh:
            assert fh.read().strip() == se._pq_fingerprint(CBS, CENTS), d
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in3), out_rot,
        str(tmp_path / "ckb2"), codebooks=CBS, pq_residual=True, **kw
    )
    fresh = str(tmp_path / "fresh")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_all), fresh,
        str(tmp_path / "ckf"), codebooks=CBS, pq_residual=True, **kw
    )
    for suffix in ("", "_screened"):
        got_s = {
            (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
            for r in spark.read.parquet(out_rot + suffix).collect()
        }
        want_s = {
            (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
            for r in spark.read.parquet(fresh + suffix).collect()
        }
        assert got_s == want_s, suffix


def test_residual_ingest_nprobe2_stream_equals_batch(spark, tmp_path):
    """Residual codes × nprobe=2 (the interaction that threads the
    __adc_cdots probe column through the probe-cell explosion):
    stream == one-shot batch under the rule 'drop b iff some lower-id
    rep a has cell(a) ∈ top-2-cells(b) and RESIDUAL ADC sim ≥
    threshold' (codes/cell/cross-term all at a's assigned cell)."""
    def py_top_cells(v, n):
        vnorm = seq_norm(v)
        sims = []
        for c in CENTS:
            nc = math.sqrt(sum(x * x for x in c))
            sv = seq_dot(v, c) / (vnorm * nc) if (vnorm * nc) != 0 else 0.0
            sims.append(rhu(sv, 6))
        order = sorted(range(len(CENTS)), key=lambda i: (-sims[i], i))
        return order[:n]

    def one_shot_res_nprobe(rows, thr, n):
        first = {}
        for vid, v in sorted(rows):
            key = tuple(v)
            if key not in first:
                first[key] = vid
        reps = {vid: v for vid, v in rows if first[tuple(v)] == vid}
        cells = {vid: py_cell(v) for vid, v in reps.items()}
        codes = {vid: py_res_codes(v, cells[vid]) for vid, v in reps.items()}
        dropped = set()
        for vid in sorted(reps):
            probe = py_top_cells(reps[vid], n)
            for lower in sorted(reps):
                if lower >= vid:
                    break
                if cells[lower] not in probe:
                    continue
                sim = py_res_adc_cos(
                    reps[vid], cells[lower], codes[lower]
                )
                if rhu(sim, 6) >= thr:
                    dropped.add(vid)
                    break
        return set(reps) - dropped, dropped, reps

    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [SHARD1, SHARD2, SHARD3])
    out = str(tmp_path / "out")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out, str(tmp_path / "ck"),
        centroids=CENTS, threshold=THR_RES, track_components=True,
        round_assign_digits=6, screen_round_digits=6, codebooks=CBS,
        nprobe=2, pq_residual=True,
    )
    kept, dropped, reps = one_shot_res_nprobe(ALL_ROWS, THR_RES, 2)
    got = {r["vec_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == kept, (set(got), kept)
    for vid in kept:
        assert got[vid]["cell"] == py_cell(reps[vid])
        assert list(got[vid]["codes"]) == py_res_codes(
            reps[vid], got[vid]["cell"]
        )
    # nprobe=2 at least as aggressive as nprobe=1 under the same rule.
    kept1, _, _ = one_shot_res(ALL_ROWS, THR_RES)
    assert kept <= kept1
    eids = {r["vec_id"]
            for r in spark.read.parquet(out + "_screened").collect()}
    assert eids == dropped


def test_selective_cell_maintenance_equals_full_rotation(spark, tmp_path):
    """VERDICT r14 item 4: the selective repair loop — q183-style
    flagged cells → recenter_state_cells on current members →
    cells-restricted rotation — produces a state BIT-IDENTICAL to a
    full rotation under the same moved kit (landed + screened tables
    and _PQ_SPEC markers), while actually changing codes in the
    repaired cells. Also pins the three selective-rotation guards:
    codebook changes, centroid changes outside the flagged set, and
    raw (non-residual) states all refuse."""
    import shutil

    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [SHARD1, SHARD2, SHARD3])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    kw = dict(centroids=CENTS, threshold=THR_RES,
              round_assign_digits=6, screen_round_digits=6,
              codebooks=CBS)
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out, ckpt,
        pq_residual=True, **kw
    )
    raw_corpus = spark.createDataFrame(
        [(i, v) for i, v in ALL_ROWS], ["vec_id", "embedding"]
    )
    pre = {r["vec_id"]: (tuple(r["codes"]), r["cell"])
           for r in spark.read.parquet(out).collect()}
    cells_present = sorted({c for _, c in pre.values()})
    flagged = cells_present[:2]
    new_cents = se.recenter_state_cells(
        spark, out, raw_corpus, CENTS, flagged
    )
    for i, (a, b) in enumerate(zip(CENTS, new_cents)):
        if i in flagged:
            assert list(a) != list(b), i  # recentered on real members
        else:
            assert list(a) == list(b), i  # untouched verbatim

    # Baseline: FULL rotation of an identical copy under the same kit.
    full = str(tmp_path / "full")
    shutil.copytree(out, full)
    if os.path.isdir(out + "_screened"):
        shutil.copytree(out + "_screened", full + "_screened")
    st_sel = se.rotate_embedding_state_codebooks(
        spark, out, CBS, raw_corpus, old_codebooks=CBS,
        old_centroids=CENTS, new_centroids=new_cents, cells=flagged,
    )
    st_full = se.rotate_embedding_state_codebooks(
        spark, full, CBS, raw_corpus, old_codebooks=CBS,
        old_centroids=CENTS, new_centroids=new_cents,
    )
    assert "rotated" in st_sel and "rotated" in st_full
    want_fp = se._pq_fingerprint(CBS, new_cents)
    for base in (out, full):
        for suffix in ("", "_screened"):
            if not os.path.isdir(base + suffix):
                continue
            with open(os.path.join(base + suffix, "_PQ_SPEC")) as fh:
                assert fh.read().strip() == want_fp, (base, suffix)
    changed = 0
    for suffix in ("", "_screened"):
        if not os.path.isdir(out + suffix):
            continue
        sel = {(r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
               for r in spark.read.parquet(out + suffix).collect()}
        ful = {(r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
               for r in spark.read.parquet(full + suffix).collect()}
        assert sel == ful, suffix
    for r in spark.read.parquet(out).collect():
        was_codes, was_cell = pre[r["vec_id"]]
        assert r["cell"] == was_cell  # never reassigns
        if was_cell in flagged and tuple(r["codes"]) != was_codes:
            changed += 1
    assert changed > 0  # the repair re-encoded something real

    # Guards. (State is already at the new kit; the guards raise at
    # argument-validation time, before any marker is consulted.)
    other_cbs = [list(reversed(cb)) for cb in CBS]
    with pytest.raises(ValueError, match="cannot change codebooks"):
        se.rotate_embedding_state_codebooks(
            spark, out, other_cbs, raw_corpus, old_codebooks=CBS,
            old_centroids=new_cents, new_centroids=new_cents,
            cells=flagged,
        )
    drifted = [list(c) for c in new_cents]
    unflagged = [c for c in cells_present if c not in flagged]
    victim = unflagged[0] if unflagged else (
        len(new_cents) - 1 if (len(new_cents) - 1) not in flagged else 0
    )
    drifted[victim] = [x + 1.0 for x in drifted[victim]]
    with pytest.raises(ValueError, match="not in cells"):
        se.rotate_embedding_state_codebooks(
            spark, out, CBS, raw_corpus, old_codebooks=CBS,
            old_centroids=new_cents, new_centroids=drifted,
            cells=flagged,
        )
    with pytest.raises(ValueError, match="RESIDUAL"):
        se.rotate_embedding_state_codebooks(
            spark, out, CBS, raw_corpus, old_codebooks=CBS,
            cells=flagged,
        )


def test_opq_ingest_codes_marker_and_continuation(spark, tmp_path):
    """pq_rotation (OPQ in the hot path): the codes-only ingest under a
    rotation lands ROTATED-space codes (== pq_append_codes(rotation=)
    on the landed survivors, the batch twin), the _PQ_SPEC fingerprint
    folds the rotation in (raw-PQ reopen and different-rotation reopen
    both refuse), replay lands nothing new, a continued ingest equals
    a fresh full ingest byte-for-byte, and the cells-restricted
    rotation guard refuses rotation changes."""
    from big_data_ml_pipeline_spark.operators.similarity import ivf_index

    # Reversal permutation — orthogonal, so the kit algebra is
    # exercised end-to-end with analytically transparent rotated
    # vectors (R·v = reversed(v)).
    R = [[1.0 if j == DIM - 1 - i else 0.0 for j in range(DIM)]
         for i in range(DIM)]
    in12, in3, in_all = (
        str(tmp_path / "in12"), str(tmp_path / "in3"),
        str(tmp_path / "inall"),
    )
    write_shards(spark, in12, [SHARD1, SHARD2])
    write_shards(spark, in3, [SHARD3])
    write_shards(spark, in_all, [SHARD1, SHARD2, SHARD3])
    kw = dict(centroids=CENTS, threshold=THR, track_components=True,
              round_assign_digits=6, screen_round_digits=6,
              codebooks=CBS, pq_rotation=R)
    out = str(tmp_path / "out")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in12), out,
        str(tmp_path / "ck1"), **kw
    )
    landed = spark.read.parquet(out)
    assert set(landed.columns) == {"vec_id", "codes", "cell", "fp"}
    with open(os.path.join(out, "_PQ_SPEC")) as fh:
        assert fh.read().strip() == se._pq_fingerprint(
            CBS, None, rotation=R
        )
    # Batch twin: rotated-space codes of the landed survivors.
    raw12 = spark.createDataFrame(
        [(i, v) for i, v in SHARD1 + SHARD2], ["vec_id", "embedding"]
    )
    got = {r["vec_id"]: list(r["codes"]) for r in landed.collect()}
    expect = {
        r["vec_id"]: list(r["codes"])
        for r in pq_append_codes(
            ivf_index(raw12, CENTS, round_assign_digits=6),
            CBS, vec_col="v", rotation=R,
        ).collect()
        if r["vec_id"] in got
    }
    assert got == expect
    # And they are NOT the raw-space codes (the rotation is real).
    raw_codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_append_codes(
            ivf_index(raw12, CENTS, round_assign_digits=6),
            CBS, vec_col="v",
        ).collect()
    }
    assert any(got[v] != raw_codes[v] for v in got)
    # Marker guards: raw-PQ reopen and different-rotation reopen refuse.
    with pytest.raises(ValueError, match="different codebook kit"):
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in3), out,
            str(tmp_path / "ckx"),
            **{**kw, "pq_rotation": None},
        )
    R2 = [[1.0 if j == i else 0.0 for j in range(DIM)]
          for i in range(DIM)]
    with pytest.raises(ValueError, match="different codebook kit"):
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, in3), out,
            str(tmp_path / "cky"),
            **{**kw, "pq_rotation": R2},
        )
    # Continuation == fresh full ingest, byte for byte.
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in3), out,
        str(tmp_path / "ck2"), **kw
    )
    fresh = str(tmp_path / "fresh")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_all), fresh,
        str(tmp_path / "ckf"), **kw
    )
    for suffix in ("", "_screened"):
        got_s = {
            (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
            for r in spark.read.parquet(out + suffix).collect()
        }
        want_s = {
            (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
            for r in spark.read.parquet(fresh + suffix).collect()
        }
        assert got_s == want_s, suffix
    # Replay with a fresh checkpoint: nothing new lands.
    n = spark.read.parquet(out).count()
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_all), out,
        str(tmp_path / "ck3"), **kw
    )
    assert spark.read.parquet(out).count() == n
    # Selective rotation cannot change the rotation.
    raw_all = spark.createDataFrame(
        [(i, v) for i, v in SHARD1 + SHARD2 + SHARD3],
        ["vec_id", "embedding"],
    )
    with pytest.raises(ValueError, match="cannot change the OPQ"):
        se.rotate_embedding_state_codebooks(
            spark, out, CBS, raw_all, old_codebooks=CBS,
            old_centroids=CENTS, new_centroids=CENTS,
            cells=[0], old_rotation=R, new_rotation=R2,
        )


# ------------------------------------------------- residual + rotation (OPQ)
# ADVICE r15 (high): when pq_residual and pq_rotation are COMBINED, the
# ingest's ADC screen kit must see ROTATED centroids — the kit's
# residual algebra lives entirely in the rotated space (codes quantize
# R·(v − c), so a candidate's rotated-space reconstruction is
# R·c + Σ_j cb_j[code_j]). Feeding it raw centroids mixes spaces and
# the screen cosine is silently wrong (measured on the reported pair:
# true −0.1485, mixed-space kit +0.0550). These pins go through BOTH
# the kit and the real ingest wiring.

R_REV = [[1.0 if j == DIM - 1 - i else 0.0 for j in range(DIM)]
         for i in range(DIM)]


def py_rotate(v, rot=R_REV):
    return [seq_dot(r, v) for r in rot]


ROT_CENTS = [py_rotate(c) for c in CENTS]
C2_ROT = [float(sum(x * x for x in c)) for c in ROT_CENTS]
RT_ROT = [
    [
        [
            float(2.0 * sum(c[j * D + i] * cb[i] for i in range(D))
                  + CB2[j][ci])
            for ci, cb in enumerate(CBS[j])
        ]
        for j in range(M)
    ]
    for c in ROT_CENTS
]


def py_res_rot_codes(v, cell, round_digits=9):
    """pq_append_codes(centroids=, rotation=) reference: rotate AFTER
    the raw-space centroid subtraction (rotate ∘ subtract)."""
    r = [v[i] - CENTS[cell][i] for i in range(DIM)]
    rr = py_rotate(r)
    codes = []
    for j in range(M):
        s = rr[j * D: (j + 1) * D]
        sn = seq_dot(s, s)
        dists = [
            rhu(sn - 2.0 * seq_dot(s, cb) + CB2[j][c], round_digits)
            for c, cb in enumerate(CBS[j])
        ]
        codes.append(dists.index(min(dists)))
    return codes


def py_res_rot_adc_cos(v, cell, codes):
    """Grouped-fold mirror of the kit under (rotated centroids,
    rotation): everything — query, centroid dots, cross-term table —
    in the rotated space."""
    rv = py_rotate(v)
    dotsum = seq_dot(rv, ROT_CENTS[cell])
    r2 = C2_ROT[cell]
    for j in range(M):
        dotsum = dotsum + seq_dot(rv[j * D: (j + 1) * D], CBS[j][codes[j]])
        r2 = r2 + RT_ROT[cell][j][codes[j]]
    denom = seq_norm(rv) * math.sqrt(r2)
    return dotsum / denom if denom != 0 else 0.0


def one_shot_res_rot(rows, thr):
    """One-shot pair-rule reduction under the residual+rotation ADC
    similarity (the exact algebra the fixed ingest screens with)."""
    first = {}
    for vid, v in sorted(rows):
        key = tuple(v)
        if key not in first:
            first[key] = vid
    reps = {vid: v for vid, v in rows if first[tuple(v)] == vid}
    cells = {vid: py_cell(v) for vid, v in reps.items()}
    codes = {vid: py_res_rot_codes(v, cells[vid]) for vid, v in reps.items()}
    dropped = set()
    for vid in sorted(reps):
        for lower in sorted(reps):
            if lower >= vid:
                break
            if cells[lower] != cells[vid]:
                continue
            sim = py_res_rot_adc_cos(reps[vid], cells[lower], codes[lower])
            if rhu(sim, 6) >= thr:
                dropped.add(vid)
                break
    return set(reps) - dropped, dropped, reps


def test_residual_rotation_adc_cos_bitexact(spark):
    """The residual+rotation kit (rotated centroids, per its contract)
    == the grouped-fold Python reference bit-for-bit, and ~= the FLAT
    exact cosine of the rotated query against the rotated-space
    reconstruction R·c + Σ cb[code] to 1e-9 — the pin ADVICE r15 asked
    for (the mixed-space kit was off by ~0.2 in magnitude AND sign)."""
    import random

    rng = random.Random(11)
    vecs = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(10)]
    vecs += BASE[:3] + [near(BASE[1], 1e-3)]
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    from big_data_ml_pipeline_spark.operators.similarity import ivf_index

    assigned = ivf_index(df, CENTS, id_col="vec_id", vec_col="embedding")
    enc = pq_append_codes(
        assigned, CBS, vec_col="v", centroids=CENTS, rotation=R_REV
    )
    prep_raw, adc_cos = pq_adc_screen_kit(
        CBS, centroids=ROT_CENTS, rotation=R_REV
    )
    a = enc.select(
        F.col("cell"), F.col("vec_id").alias("id_a"),
        F.col("codes").alias("__acodes"),
    )
    b = prep_raw(df, F.col("embedding")).select(
        F.col("vec_id").alias("id_b"),
        "__adc_luts", "__adc_norm", "__adc_cdots",
    )
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in b.crossJoin(a)
        .select("id_a", "id_b", adc_cos(F.col("__acodes")).alias("sim"))
        .collect()
    }
    meta = {r["vec_id"]: (r["cell"], list(r["codes"])) for r in enc.collect()}
    by_id = dict(rows)
    for (ia, ib), sim in got.items():
        cell, codes = meta[ia]
        assert codes == py_res_rot_codes(by_id[ia], cell), ia
        expect = py_res_rot_adc_cos(by_id[ib], cell, codes)
        assert sim == expect, (ia, ib, sim, expect)  # bit-for-bit
        rec = [
            ROT_CENTS[cell][j * D + i] + CBS[j][codes[j]][i]
            for j in range(M) for i in range(D)
        ]
        flat = py_raw_cos(py_rotate(by_id[ib]), rec)
        assert abs(sim - flat) < 1e-9, (ia, ib, sim, flat)


def test_residual_rotation_ingest_stream_equals_batch(spark, tmp_path):
    """pq_residual + pq_rotation THROUGH the real ingest (the wiring
    ADVICE r15 flagged): the streamed codes-only ingest lands exactly
    the one-shot pair-rule reduction under the residual+rotation ADC
    similarity, landed codes == the rotate∘subtract Python argmin, and
    the _PQ_SPEC marker folds centroids AND rotation in."""
    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [SHARD1, SHARD2, SHARD3])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    kw = dict(centroids=CENTS, threshold=THR_RES, track_components=True,
              round_assign_digits=6, screen_round_digits=6, codebooks=CBS,
              pq_residual=True, pq_rotation=R_REV)
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out, ckpt, **kw
    )
    landed = spark.read.parquet(out)
    assert set(landed.columns) == {"vec_id", "codes", "cell", "fp"}
    with open(os.path.join(out, "_PQ_SPEC")) as fh:
        assert fh.read().strip() == se._pq_fingerprint(
            CBS, CENTS, rotation=R_REV
        )
    kept, dropped, reps = one_shot_res_rot(ALL_ROWS, THR_RES)
    # The fixture still exercises every screen in the rotated algebra:
    # exact dups (13, 32), a cross-batch ADC drop (21), a chain
    # through a dropped twin (30 vs 21's codes).
    assert {21, 30} <= dropped
    got = {r["vec_id"]: r for r in landed.collect()}
    assert set(got) == kept
    for vid in kept:
        assert got[vid]["cell"] == py_cell(reps[vid])
        assert list(got[vid]["codes"]) == py_res_rot_codes(
            reps[vid], got[vid]["cell"]
        )
    eids = {r["vec_id"]
            for r in spark.read.parquet(out + "_screened").collect()}
    assert eids == dropped


def test_cell_distortion_report_uses_provided_membership(spark):
    """pq_cell_distortion_report(cells_from=) measures distortion BY
    the provided (id, cell) membership — the state table's stored
    cells — instead of re-running the IVF argmax (ADVICE r15: after a
    repair moves centroids, re-assignment can mis-attribute boundary
    rows to cells the selective-maintenance machinery never touches)."""
    from big_data_ml_pipeline_spark.operators.similarity import (
        pq_cell_distortion_report,
    )

    rows = [(i + 1, BASE[i]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    natural = {vid: py_cell(v) for vid, v in rows}
    # Override one row's membership to a cell the argmax would NOT pick.
    override = {vid: c for vid, c in natural.items()}
    override[4] = (natural[4] + 1) % NCELLS
    mapping = spark.createDataFrame(
        [(vid, c) for vid, c in override.items()], ["vec_id", "cell"]
    )
    rep = {
        r["cell"]: r
        for r in pq_cell_distortion_report(
            df, CENTS, CBS, id_col="vec_id", vec_col="embedding",
            cells_from=mapping,
        ).collect()
    }

    def py_res_dist_q(v, cell):
        r = [v[i] - CENTS[cell][i] for i in range(DIM)]
        total = 0
        for j in range(M):
            s = r[j * D: (j + 1) * D]
            sn = seq_dot(s, s)
            dmin = min(
                rhu(sn - 2.0 * seq_dot(s, cb) + CB2[j][c], 9)
                for c, cb in enumerate(CBS[j])
            )
            total += int(rhu(dmin * 1e9, 0))
        return total

    by_id = dict(rows)
    for cell in range(NCELLS):
        members = [vid for vid, c in override.items() if c == cell]
        assert rep[cell]["n_vectors"] == len(members), cell
        assert rep[cell]["sum_dist_q"] == sum(
            py_res_dist_q(by_id[vid], cell) for vid in members
        ), cell


# ------------------------------------------------------------- cell split
def test_split_state_cell_equals_fresh_ingest(spark, tmp_path):
    """split_state_cell (VERDICT r15 item 5): an overloaded cell's
    2-means split yields a state BIT-IDENTICAL to a fresh codes-only
    ingest under the widened kit (same ids, cells, residual codes,
    fps), untouched cells' rows are byte-for-byte unchanged, the
    _PQ_SPEC folds the widened centroids, and the q135 health report
    shows the hot cell's load factor drop. Also pins the orchestrator
    surface (auto-flag by stored-membership load, config widened in
    place) and the too-few-members no-op."""
    import numpy as np

    from big_data_ml_pipeline_spark.operators.similarity import (
        ivf_cell_stats,
    )
    from big_data_ml_pipeline_spark.orchestrator import PipelineOrchestrator

    C = np.array(CENTS, dtype="float64")
    rng = np.random.RandomState(7)
    # A direction orthogonal to every kit centroid: the two planted
    # sub-families both argmax to cell 1 under the original kit but
    # separate cleanly under 2-means.
    d = rng.randn(DIM)
    for c in C:
        cn = c / np.linalg.norm(c)
        d -= (d @ cn) * cn
    d /= np.linalg.norm(d)
    c1 = C[1] / np.linalg.norm(C[1])
    rows = []
    for i in range(5):  # family A: hugs the centroid
        v = c1 + 0.08 * rng.randn(DIM) * 0.1 + 0.05 * d
        rows.append((10 + i, [float(x) for x in v]))
    for i in range(5):  # family B: same cell, rotated toward d
        v = 0.8 * c1 + 0.6 * d + 0.008 * rng.randn(DIM)
        rows.append((20 + i, [float(x) for x in v]))
    rows.append((30, [float(x) for x in C[0] * 1.1]))
    rows.append((31, [float(x) for x in C[2] * 0.9]))
    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [rows])
    kw = dict(centroids=CENTS, threshold=0.999999, codebooks=CBS,
              round_assign_digits=6, screen_round_digits=6,
              pq_residual=True)
    out = str(tmp_path / "out")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out,
        str(tmp_path / "ck"), **kw
    )
    state0 = {
        (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
        for r in spark.read.parquet(out).collect()
    }
    assert len(state0) == len(rows)
    # Both families really sit in cell 1 pre-split (load factor ~3x).
    by_cell = {}
    for vid, _, c, _ in state0:
        by_cell.setdefault(c, set()).add(vid)
    assert by_cell[1] == set(range(10, 15)) | set(range(20, 25))
    raw = spark.createDataFrame(rows, ["vec_id", "embedding"])
    load0 = {
        r["cell"]: r["load_factor"]
        for r in ivf_cell_stats(
            raw, CENTS, round_assign_digits=6
        ).collect()
    }
    new_cents = se.split_state_cell(
        spark, out, raw, CENTS, 1, CBS,
        residual=True, round_assign_digits=6,
    )
    assert len(new_cents) == NCELLS + 1
    for i in range(NCELLS):
        if i != 1:
            assert new_cents[i] == [float(x) for x in CENTS[i]]
    with open(os.path.join(out, "_PQ_SPEC")) as fh:
        assert fh.read().strip() == se._pq_fingerprint(CBS, new_cents)
    # Fresh ingest under the widened kit == the split state, bit for bit.
    fresh = str(tmp_path / "fresh")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), fresh,
        str(tmp_path / "ckf"),
        **{**kw, "centroids": new_cents},
    )
    got = {
        (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
        for r in spark.read.parquet(fresh).collect()
    }
    assert got == want
    # Untouched cells: byte-identical to the pre-split state.
    assert {t for t in got if t[2] not in (1, NCELLS)} == {
        t for t in state0 if t[2] != 1
    }
    # The two families actually divided between old cell and new cell.
    a_ids = {t[0] for t in got if t[2] == 1}
    b_ids = {t[0] for t in got if t[2] == NCELLS}
    assert {frozenset(a_ids), frozenset(b_ids)} == {
        frozenset(range(10, 15)), frozenset(range(20, 25))
    }
    # q135 health: the hot cell's load factor drops after the split.
    load1 = {
        r["cell"]: r["load_factor"]
        for r in ivf_cell_stats(
            raw, new_cents, round_assign_digits=6
        ).collect()
    }
    assert max(load1[1], load1[NCELLS]) < load0[1]
    # Too-few-members: a 1-member cell is a no-op (kit unchanged).
    same = se.split_state_cell(
        spark, out, raw, new_cents, 0, CBS,
        residual=True, round_assign_digits=6,
    )
    assert same == [list(map(float, c)) for c in new_cents]
    # Orchestrator surface: auto-flags the most loaded cell by STORED
    # membership and widens the config kit in place.
    cfg = {"embeddings": {"ingest_threshold": 0.999999,
                          "ingest_dim": DIM, "ingest_n_cells": NCELLS,
                          "ingest_round_assign_digits": 6,
                          "ingest_screen_round_digits": 6,
                          "ingest_centroids": [
                              [float(x) for x in c] for c in CENTS
                          ],
                          "pq": {"m": M, "k": K, "ingest": True,
                                 "residual": True, "codebooks": CBS}}}
    orch = PipelineOrchestrator(config=cfg, spark=spark)
    out2 = str(tmp_path / "out2")
    orch.ingest_embeddings_stream(str(in_dir), out2, str(tmp_path / "ck2"))
    res = orch.split_embedding_cell(out2, raw)
    assert res["cell"] == 1 and res["n_cells"] == NCELLS + 1
    assert orch.config["embeddings"]["ingest_centroids"] == res["centroids"]
    assert res["centroids"] == new_cents
    got2 = {
        (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
        for r in spark.read.parquet(out2).collect()
    }
    assert got2 == want
    # Continued ingest reopens the widened marker cleanly.
    more = str(tmp_path / "more")
    write_shards(spark, more, [[(40, [0.5] * DIM)]])
    orch.ingest_embeddings_stream(str(more), out2, str(tmp_path / "ck3"))
    assert spark.read.parquet(out2).count() == len(rows) + 1


def test_retire_state_cell_empty_cell(spark, tmp_path):
    """retire_state_cell (split's sibling): an EMPTY cell retires by
    swap-with-last — the kit shrinks by one, only the former last
    cell's rows re-label (codes byte-identical — centroid VALUES are
    unchanged), the result equals a fresh ingest under the compacted
    kit, a populated cell refuses, and the orchestrator surface
    auto-flags by stored membership and shrinks the config kit."""
    from big_data_ml_pipeline_spark.orchestrator import PipelineOrchestrator

    cells = {i: py_cell(v) for i, v in enumerate(BASE)}
    used = sorted(set(cells.values()))
    # The BASE fixture must cover >= 2 cells and leave >= 1 empty for
    # this test's shape; pick rows covering every used cell.
    assert len(used) >= 2 and len(used) < NCELLS, cells
    rows = [(10 + i, v) for i, v in enumerate(BASE)]
    empty = next(i for i in range(NCELLS) if i not in used)
    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [rows])
    kw = dict(centroids=CENTS, threshold=0.999999, codebooks=CBS,
              round_assign_digits=6, screen_round_digits=6,
              pq_residual=True)
    out = str(tmp_path / "out")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), out,
        str(tmp_path / "ck"), **kw
    )
    state0 = {
        (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
        for r in spark.read.parquet(out).collect()
    }
    # Populated cell refuses.
    with pytest.raises(ValueError, match="member"):
        se.retire_state_cell(
            spark, out, CENTS, used[0], CBS, residual=True
        )
    new_cents = se.retire_state_cell(
        spark, out, CENTS, empty, CBS, residual=True
    )
    assert len(new_cents) == NCELLS - 1
    last = NCELLS - 1
    if empty != last:
        assert new_cents[empty] == [float(x) for x in CENTS[last]]
    with open(os.path.join(out, "_PQ_SPEC")) as fh:
        assert fh.read().strip() == se._pq_fingerprint(CBS, new_cents)
    got = {
        (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
        for r in spark.read.parquet(out).collect()
    }
    # Codes and fps byte-identical; only former-last rows re-labeled.
    relabel = {
        (vid, codes, empty if c == last else c, fp)
        for vid, codes, c, fp in state0
    }
    assert got == relabel
    # Fresh ingest under the compacted kit lands the identical state.
    fresh = str(tmp_path / "fresh")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_dir), fresh,
        str(tmp_path / "ckf"), **{**kw, "centroids": new_cents}
    )
    want = {
        (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
        for r in spark.read.parquet(fresh).collect()
    }
    assert got == want
    # Orchestrator surface: auto-flags the empty cell, shrinks config.
    cfg = {"embeddings": {"ingest_threshold": 0.999999,
                          "ingest_dim": DIM, "ingest_n_cells": NCELLS,
                          "ingest_round_assign_digits": 6,
                          "ingest_screen_round_digits": 6,
                          "ingest_centroids": [
                              [float(x) for x in c] for c in CENTS
                          ],
                          "pq": {"m": M, "k": K, "ingest": True,
                                 "residual": True, "codebooks": CBS}}}
    orch = PipelineOrchestrator(config=cfg, spark=spark)
    out2 = str(tmp_path / "out2")
    orch.ingest_embeddings_stream(str(in_dir), out2, str(tmp_path / "ck2"))
    res = orch.retire_embedding_cell(out2)
    assert res["cell"] == empty and res["n_cells"] == NCELLS - 1
    assert orch.config["embeddings"]["ingest_centroids"] == new_cents
    # A fully-populated kit reports untriggered.
    res2 = orch.retire_embedding_cell(out2)
    if res2["cell"] is not None:
        # another empty existed in the fixture — retire it too, then
        # the next call must be untriggered or keep shrinking until
        # every cell is populated
        assert res2["n_cells"] < NCELLS
    # Continued ingest under the shrunken kit reopens cleanly.
    more = str(tmp_path / "more")
    write_shards(spark, more, [[(40, near(BASE[0], 5e-2))]])
    orch.ingest_embeddings_stream(str(more), out2, str(tmp_path / "ck3"))


def test_retire_auto_flag_counts_screened_cells(spark, tmp_path):
    """retire_embedding_cell(cell=None) treats a cell populated ONLY in
    the ``_screened`` extras sibling as populated (ADVICE r16):
    retire_state_cell refuses cells with members in EITHER table, so
    the auto-flag must skip screened-only cells instead of picking one
    the retire then errors on."""
    from pyspark.sql import functions as F

    from big_data_ml_pipeline_spark.orchestrator import PipelineOrchestrator

    rows = [(10, BASE[0])]
    c0 = py_cell(BASE[0])
    in_dir = str(tmp_path / "in")
    write_shards(spark, in_dir, [rows])
    cfg = {"embeddings": {"ingest_threshold": 0.999999,
                          "ingest_dim": DIM, "ingest_n_cells": NCELLS,
                          "ingest_round_assign_digits": 6,
                          "ingest_screen_round_digits": 6,
                          "ingest_centroids": [
                              [float(x) for x in c] for c in CENTS
                          ],
                          "pq": {"m": M, "k": K, "ingest": True,
                                 "residual": True, "codebooks": CBS}}}
    orch = PipelineOrchestrator(config=cfg, spark=spark)
    out = str(tmp_path / "out")
    orch.ingest_embeddings_stream(str(in_dir), out, str(tmp_path / "ck"))
    empties = [i for i in range(NCELLS) if i != c0]
    assert len(empties) >= 2  # one gets the screened row, one stays empty
    # Seed a screened-extras row in the FIRST empty cell — the landed
    # table knows nothing about it (the shape a recenter that moves
    # landed rows but strands an extras row produces).
    landed = spark.read.parquet(out)
    landed.limit(1).withColumn(
        "cell", F.lit(empties[0]).cast(landed.schema["cell"].dataType)
    ).withColumn(
        "vec_id", F.lit(999).cast(landed.schema["vec_id"].dataType)
    ).write.mode("overwrite").parquet(out + "_screened")
    res = orch.retire_embedding_cell(out)
    # The screened-only cell was skipped; the next genuinely empty
    # cell retired without erroring.
    assert res["cell"] == empties[1]
    assert res["n_cells"] == NCELLS - 1


def test_merge_embedding_states_equals_fresh_ingest(spark, tmp_path):
    """merge_embedding_states (merge_corpus_states' embedding sibling):
    copy-A + replay-B-members-through-the-real-ingest must land the
    IDENTICAL state (landed AND screened extras, codes byte-equal) as
    a fresh ingest over A's shards followed by B's — the cross-source
    screens chain through extras exactly as the streamed path does.
    Also pins the in-place (dest == src_a) zero-copy variant, the
    _PQ_SPEC kit guard, the shared-id refusal, and the codes-only
    raw_b requirement."""
    from big_data_ml_pipeline_spark.orchestrator import PipelineOrchestrator

    cfg = {"embeddings": {"ingest_threshold": THR,
                          "ingest_dim": DIM, "ingest_n_cells": NCELLS,
                          "ingest_round_assign_digits": 6,
                          "ingest_screen_round_digits": 6,
                          "ingest_track_components": True,
                          "ingest_centroids": [
                              [float(x) for x in c] for c in CENTS
                          ],
                          "pq": {"m": M, "k": K, "ingest": True,
                                 "residual": True, "codebooks": CBS}}}

    def ingest(name, shards):
        orch = PipelineOrchestrator(config=cfg, spark=spark)
        in_dir = str(tmp_path / f"in_{name}")
        write_shards(spark, in_dir, shards)
        out = str(tmp_path / f"out_{name}")
        orch.ingest_embeddings_stream(
            in_dir, out, str(tmp_path / f"ck_{name}")
        )
        return orch, out

    _, out_a = ingest("a", [SHARD1, SHARD2])
    _, out_b = ingest("b", [SHARD3])
    _, fresh = ingest("fresh", [SHARD1, SHARD2, SHARD3])

    raw_all = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in ALL_ROWS],
        "vec_id long, embedding array<double>",
    )

    def state_set(out):
        landed = {
            (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
            for r in spark.read.parquet(out).collect()
        }
        scr = {
            (r["vec_id"], tuple(r["codes"]), r["cell"], r["fp"])
            for r in spark.read.parquet(out + "_screened").collect()
        }
        return landed, scr

    orch = PipelineOrchestrator(config=cfg, spark=spark)
    dest = str(tmp_path / "merged")
    res = orch.merge_embedding_states(out_a, out_b, dest, raw_b=raw_all)
    assert res["n_a"] + res["n_b_members"] >= res["n_landed"]
    assert state_set(dest) == state_set(fresh)

    # In-place zero-copy variant: identical outcome, no copy step.
    res2 = orch.merge_embedding_states(out_a, out_b, out_a,
                                       raw_b=raw_all)
    assert res2["n_landed"] == res["n_landed"]
    assert state_set(out_a) == state_set(fresh)

    # Kit guard: a raw-layout state refuses to merge with a PQ one.
    cfg_raw = {"embeddings": {"ingest_threshold": THR,
                              "ingest_dim": DIM,
                              "ingest_n_cells": NCELLS,
                              "ingest_round_assign_digits": 6,
                              "ingest_screen_round_digits": 6,
                              "ingest_centroids": [
                                  [float(x) for x in c] for c in CENTS
                              ]}}
    orch_raw = PipelineOrchestrator(config=cfg_raw, spark=spark)
    in_raw = str(tmp_path / "in_raw")
    write_shards(spark, in_raw, [SHARD3])
    out_raw = str(tmp_path / "out_raw")
    orch_raw.ingest_embeddings_stream(
        in_raw, out_raw, str(tmp_path / "ck_raw")
    )
    with pytest.raises(ValueError, match="_PQ_SPEC"):
        orch.merge_embedding_states(
            out_b, out_raw, str(tmp_path / "m2"), raw_b=raw_all
        )
    # Shared ids refuse (B merged into the merged state again).
    with pytest.raises(ValueError, match="BOTH states"):
        orch.merge_embedding_states(dest, out_b,
                                    str(tmp_path / "m3"),
                                    raw_b=raw_all)
    # Codes-only states need the cold raw corpus.
    _, out_solo = ingest("solo", [SHARD1])
    with pytest.raises(ValueError, match="raw_b"):
        orch.merge_embedding_states(
            out_b, out_solo, str(tmp_path / "m4")
        )
