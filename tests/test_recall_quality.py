"""Quality measurement for the approximate operators (VERDICT r5 item 1).

Determinism was already proven (q40-q43 oracle twins); these tests
measure what the approximations are FOR — recall against the exact
baselines the repo already ships — and pin floors so a refactor that
silently degrades quality fails CI:

- IVF (`ivf_knn_join`) recall@10 vs exact `knn_join`, per nprobe, with
  the structural guarantee nprobe = n_cells == exact.
- Signed-projection LSH pair recall on PLANTED near-duplicates of the
  real sf0.01 embeddings (the natural data has no cosine ≥ 0.8 pairs —
  max top-1 sim ≈ 0.48 — so near-dup recall must be measured on
  planted perturbations), single-table vs OR-amplified multi-table.
- MinHash banded pair recall + estimate error vs exact `jaccard_pairs`
  on the sf0.01 documents (25 true pairs at jaccard ≥ 0.9).
- SimHash banded recall vs the exact Hamming-ball truth — 1.0 by the
  pigeonhole guarantee (≤3 differing bits cannot touch all four
  16-bit bands), asserted exactly.

Measured values are recorded in NOTES.md per round.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_ml_pipeline_spark.operators import dedup as dedup_ops
from big_data_ml_pipeline_spark.operators import similarity as sim_ops
from big_data_ml_pipeline_spark.sources.catalog import load_table

SF001 = "/root/testdata/sf0.01"


def _exact_topk(spark, emb, queries, k=10):
    """Ground truth: exact knn_join → {qid: [id, ...] ranked}."""
    got = {}
    for r in sim_ops.knn_join(emb, queries, k=k).collect():
        got.setdefault(r["qid"], []).append((r["rn"], r["vec_id"]))
    return {q: [i for _, i in sorted(v)] for q, v in got.items()}


@pytest.fixture(scope="module")
def emb_and_queries(spark):
    emb = load_table(spark, SF001, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") % 20 == 0)  # 25 spread-out queries
    return emb, queries


def test_ivf_recall_floors_and_exactness(spark, emb_and_queries):
    """Recall@10 of the batch IVF probe vs exact kNN at n_cells=16:
    rises with nprobe, meets measured floors, and is EXACT at full
    probe. Floors are ~0.05 under the values measured on the frozen
    sf0.01 vintage (nprobe=4 ≈ 0.69, nprobe=8 ≈ 0.87) — this synthetic
    corpus is near-uniform on the sphere, the hardest case for a coarse
    quantizer, so real clustered corpora sit above these numbers."""
    emb, queries = emb_and_queries
    cents = sim_ops.fit_ivf_centroids(emb, n_cells=16)
    index = sim_ops.ivf_index(emb, cents).persist()
    try:
        exact = _exact_topk(spark, emb, queries, k=10)
        assert len(exact) == 25

        def recall_at(nprobe):
            got = {}
            res = sim_ops.ivf_knn_join(
                emb, queries, cents, k=10, nprobe=nprobe, index=index
            ).collect()
            for r in res:
                got.setdefault(r["qid"], set()).add(r["vec_id"])
            return sum(
                len(got.get(q, set()) & set(ids)) / len(ids)
                for q, ids in exact.items()
            ) / len(exact)

        r4, r8 = recall_at(4), recall_at(8)
        print(f"IVF recall@10 n_cells=16: nprobe=4 {r4:.3f}, nprobe=8 {r8:.3f}")
        assert r4 >= 0.60
        assert r8 >= 0.80
        assert r8 >= r4  # monotone in probe depth
        # Full probe IS brute force: identical ranked ids per query.
        full = {}
        for r in sim_ops.ivf_knn_join(
            emb, queries, cents, k=10, nprobe=16, index=index
        ).collect():
            full.setdefault(r["qid"], []).append((r["rn"], r["vec_id"]))
        assert {q: [i for _, i in sorted(v)] for q, v in full.items()} == exact
    finally:
        index.unpersist()


def test_lsh_planted_near_dup_recall(spark, emb_and_queries):
    """Plant 25 near-duplicates (cosine ≈ 0.95-0.99) of real sf0.01
    vectors; single-table 8-plane LSH catches a pair with probability
    (1-θ/π)^8 ≈ 0.5 (measured ≈ 0.5-0.6), and 4 OR-amplified tables
    lift recall to ≈ 1-(1-p)^4 (measured ≥ 0.9). Precision is exact by
    construction — the operator verifies true cosine ≥ threshold on
    every candidate."""
    import numpy as np

    emb, _ = emb_and_queries
    base = emb.filter(F.col("vec_id") % 20 == 0).collect()  # 25 bases
    rng = np.random.RandomState(7)
    planted_rows, true_pairs = [], set()
    for r in base:
        v = np.array(r["embedding"], dtype=float)
        noise = rng.randn(v.size)
        noise /= np.linalg.norm(noise)
        v2 = v + 0.22 * np.linalg.norm(v) * noise
        cos = float(
            v @ v2 / (np.linalg.norm(v) * np.linalg.norm(v2))
        )
        assert cos >= 0.92  # planted pair really is a near-dup
        pid = 10_000 + r["vec_id"]
        planted_rows.append((pid, [float(x) for x in v2]))
        true_pairs.add((r["vec_id"], pid))
    planted = spark.createDataFrame(
        planted_rows, schema="vec_id long, embedding array<double>"
    )
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(planted)

    def recall(n_tables):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in sim_ops.lsh_bucketed_pairs(
                corpus, threshold=0.9, n_tables=n_tables
            ).collect()
        }
        return len(pairs & true_pairs) / len(true_pairs), pairs

    r1, _ = recall(1)
    r4, pairs4 = recall(4)
    print(f"LSH planted recall: 1 table {r1:.3f}, 4 tables {r4:.3f}")
    assert r1 >= 0.30  # single 8-bit table: the honest baseline
    assert r4 >= 0.80 and r4 >= r1  # OR-amplification pays
    # precision: every reported pair truly has cosine >= 0.9
    corpus_map = {r["vec_id"]: np.array(r["embedding"]) for r in corpus.collect()}
    for a, b in pairs4:
        va, vb = corpus_map[a], corpus_map[b]
        assert va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)) >= 0.9 - 1e-9


def test_minhash_pair_recall_vs_exact_jaccard(spark):
    """MinHash banded pairs vs the exact jaccard_pairs baseline on the
    sf0.01 documents: all true pairs sit at jaccard ≥ 0.9, where the
    16-band × 4-row scheme's candidate probability 1-(1-j⁴)¹⁶ ≈ 1, so
    recall should be ≈ 1.0 (floor 0.9 allows estimator noise); the
    64-hash estimate tracks true jaccard within 0.15."""
    docs = load_table(spark, SF001, "documents").select("doc_id", "text")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup_ops.jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert len(exact) >= 10  # the planted duplicate structure exists
    approx = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup_ops.minhash_dedup_pairs(docs).filter(
            F.col("est_jaccard") >= 0.5
        ).collect()
    }
    hit = set(exact) & set(approx)
    rec = len(hit) / len(exact)
    err = [abs(approx[p] - exact[p]) for p in hit]
    print(
        f"MinHash vs exact jaccard: {len(exact)} true pairs, recall "
        f"{rec:.3f}, mean |est-true| {sum(err)/len(err):.3f}"
    )
    assert rec >= 0.9
    assert sum(err) / len(err) <= 0.15


def test_simhash_banding_recall_is_total(spark):
    """The 4×16-bit banding is a GUARANTEE, not a heuristic: a pair
    within Hamming distance 3 differs in ≤3 bands, so at least one band
    matches exactly — recall vs the exact Hamming-ball truth must be
    1.0. The exact truth is a full all-pairs XOR popcount (fine at 500
    docs; the guarantee it validates is what lets the banded join
    replace it at scale)."""
    docs = load_table(spark, SF001, "documents").select("doc_id", "text")
    sigs = dedup_ops.simhash_signatures(docs, "text", "doc_id")
    a, b = sigs.alias("a"), sigs.alias("b")
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.sh").bitwiseXOR(F.col("b.sh"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert truth  # non-vacuous: the corpus has hamming-close pairs
    banded = {
        (r["id_a"], r["id_b"])
        for r in dedup_ops.simhash_dedup_pairs(docs, max_bucket_size=None)
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    missed = truth - banded
    print(f"SimHash truth pairs {len(truth)}, banded recall "
          f"{1 - len(missed)/len(truth):.3f}")
    assert not missed  # recall exactly 1.0


def test_quantized_topk_recall_vs_exact(spark, emb_and_queries):
    """Int8 quantization must not wreck retrieval: top-10 under
    quantized cosine vs exact brute-force top-10 for 5 query vectors.
    int8 error (~scale/254 per dim) barely moves cosines, so the floor
    is high; measured 2026-08: recall@10 = 1.0, max |qsim−sim| < 0.01
    on the sf0.01 corpus."""
    emb, _ = emb_and_queries
    recalls = []
    for qid in (0, 100, 200, 300, 400):
        qdf = emb.filter(F.col("vec_id") == qid)
        exact = {
            r["vec_id"]: r["sim"]
            for r in sim_ops.brute_force_topk(emb, qdf, k=10).collect()
        }
        quant = {
            r["vec_id"]: r["qsim"]
            for r in sim_ops.quantized_topk(emb, qdf, k=10).collect()
        }
        recalls.append(len(exact.keys() & quant.keys()) / 10.0)
        for vid in exact.keys() & quant.keys():
            assert abs(exact[vid] - quant[vid]) < 0.01
    assert sum(recalls) / len(recalls) >= 0.9


def test_semantic_decontamination_exhaustive_and_probe_subset(spark, emb_and_queries):
    """nprobe = n_cells must reproduce the brute-force per-train max
    eval cosine exactly; a partial probe (nprobe=4) may only MISS
    contamination, never invent it (flagged set ⊆ exhaustive set)."""
    emb, _ = emb_and_queries
    train = emb.filter(F.col("vec_id") % 100 != 0)
    ev = emb.filter(F.col("vec_id") % 100 == 0)
    cents = sim_ops.deterministic_ivf_centroids(dim=64, n_cells=16)

    from big_data_ml_pipeline_spark.functions.vector import (
        cosine_similarity,
        to_double_array,
    )

    truth = {
        r["vec_id"]: r["m"]
        for r in train.select(
            "vec_id", to_double_array(F.col("embedding")).alias("tv")
        )
        .crossJoin(
            ev.select(to_double_array(F.col("embedding")).alias("qv"))
        )
        .groupBy("vec_id")
        .agg(F.max(F.round(cosine_similarity(F.col("tv"), F.col("qv")), 6)).alias("m"))
        .collect()
    }
    full = {
        r["vec_id"]: (r["max_eval_sim"], r["is_clean"])
        for r in sim_ops.semantic_decontamination(
            train, ev, cents, threshold=0.35, nprobe=16, round_assign_digits=6
        ).collect()
    }
    assert set(full) == set(truth)
    for vid, m in truth.items():
        assert abs(full[vid][0] - m) < 1e-9
        assert full[vid][1] == (1 if m < 0.35 else 0)
    probe = {
        r["vec_id"]: r["is_clean"]
        for r in sim_ops.semantic_decontamination(
            train, ev, cents, threshold=0.35, nprobe=4, round_assign_digits=6
        ).collect()
    }
    flagged_probe = {v for v, c in probe.items() if c == 0}
    flagged_full = {v for v, (_, c) in full.items() if c == 0}
    assert flagged_probe <= flagged_full
    assert flagged_full, "corpus must contain at least one contaminated vector"


def test_winnowing_recall_vs_exact_jaccard(spark):
    """Winnowing overlap pairs vs the exact jaccard baseline on sf0.01
    documents: every true near-dup pair (jaccard ≥ 0.5 on 3-token
    shingles) shares a long common token run, and the winnowing
    guarantee (any shared run of w+k-1 = 8 tokens yields a shared
    fingerprint) makes recall exactly 1.0 — positional overlap
    subsumes bag overlap at this similarity level."""
    from big_data_ml_pipeline_spark.operators import text as text_ops

    docs = load_table(spark, SF001, "documents").select("doc_id", "text")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup_ops.jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert len(exact) >= 10
    winnow = {
        (r["id_a"], r["id_b"])
        for r in text_ops.winnowing_overlap_pairs(
            docs, k=4, w=5, min_shared=2
        ).collect()
    }
    hit = exact & winnow
    rec = len(hit) / len(exact)
    print(f"Winnowing vs exact jaccard: {len(exact)} true pairs, recall {rec:.3f}")
    assert rec >= 0.95


def test_sketch_calibration_error_bound(spark):
    """The q130 calibration surface itself: over every banded candidate
    at sf0.01, the 64-hash MinHash estimate stays within 0.2 of the
    exact Jaccard everywhere and within 0.06 on average — the sketch is
    usable as a THRESHOLD, not just a rank."""
    docs = load_table(spark, SF001, "documents").select("doc_id", "text")
    rows = dedup_ops.minhash_calibration(docs, min_est=0.2).collect()
    assert len(rows) >= 10
    errs = [r["abs_err"] for r in rows]
    assert max(errs) <= 0.2
    assert sum(errs) / len(errs) <= 0.06


def test_hard_negative_pairs_structure(spark, emb_and_queries):
    """Mining table invariants at sf0.01: every query gets exactly 5
    positives (self excluded, sim present) and 5 negatives (sim NULL),
    positive/negative sets are disjoint, and the selection is
    identical on a repartitioned input (content-hash determinism)."""
    emb, _ = emb_and_queries
    cents = sim_ops.deterministic_ivf_centroids(dim=64, n_cells=16)
    out = sim_ops.hard_negative_pairs(
        emb, cents, k_pos=5, k_neg=5,
        query_pred=F.col("vec_id") % 100 == 0,
        nprobe=4, round_assign_digits=6,
    ).collect()
    from collections import defaultdict

    per_q = defaultdict(lambda: {"pos": set(), "neg": set()})
    for r in out:
        kind = "pos" if r["label"] == 1 else "neg"
        per_q[r["qid"]][kind].add(r["cand_id"])
        if r["label"] == 1:
            assert r["sim"] is not None and r["cand_id"] != r["qid"]
        else:
            assert r["sim"] is None
    for q, d in per_q.items():
        assert len(d["pos"]) == 5 and len(d["neg"]) == 5, q
        assert not d["pos"] & d["neg"], q
        assert q not in d["neg"], q
    out2 = sim_ops.hard_negative_pairs(
        emb.repartition(7), cents, k_pos=5, k_neg=5,
        query_pred=F.col("vec_id") % 100 == 0,
        nprobe=4, round_assign_digits=6,
    ).collect()
    key = lambda rows: sorted((r["qid"], r["cand_id"], r["label"]) for r in rows)
    assert key(out) == key(out2)


def test_hard_negative_pairs_n_buckets_knob(spark, emb_and_queries):
    """ADVICE r6: n_buckets is a real parameter (the scale lever the
    docstring promises). A finer bucketing still yields k_neg negatives
    per query, disjoint from positives."""
    emb, _ = emb_and_queries
    cents = sim_ops.deterministic_ivf_centroids(dim=64, n_cells=16)
    out = sim_ops.hard_negative_pairs(
        emb, cents, k_pos=3, k_neg=4,
        query_pred=F.col("vec_id") % 200 == 0,
        nprobe=4, round_assign_digits=6, n_buckets=32,
    ).collect()
    from collections import defaultdict

    per_q = defaultdict(lambda: {1: set(), 0: set()})
    for r in out:
        per_q[r["qid"]][r["label"]].add(r["cand_id"])
    assert per_q
    for q, d in per_q.items():
        assert len(d[1]) == 3 and len(d[0]) == 4, q
        assert not d[1] & d[0], q


# ---------------------------------------------------------------------------
# Clustered-corpus recall (VERDICT r6 item 3): the r6 floors above are
# measured on a near-uniform sphere — the HARD case for IVF but the
# EASY case for SemDeDup (nothing to prune). This fixture plants 20
# perturbation families (tight clusters, member-seed cosine ~0.95,
# within-cluster ~0.9) and measures the same operators where their
# approximations actually bite. Measured on this fixture (seed 42):
# IVF recall@10 = 1.0 from nprobe=1 (KMeans keeps families intact —
# vs 0.66 at nprobe=4 on the uniform corpus), SemDeDup removal recall
# 1.0 with 0 false removals (468 true duplicates), decontamination
# flagged-set recall 1.0 with 0 false flags from nprobe=2.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clustered_corpus(spark):
    import numpy as np

    rng = np.random.RandomState(42)
    seeds = rng.randn(20, 64)
    seeds /= np.linalg.norm(seeds, axis=1, keepdims=True)
    rows, vecs = [], []
    for c in range(20):
        for m in range(25):
            v = seeds[c] + 0.04 * rng.randn(64)
            v /= np.linalg.norm(v)
            rows.append((c * 25 + m, [float(x) for x in v]))
            vecs.append(v)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sim_ops.fit_ivf_centroids(emb, n_cells=16)
    return emb, cents, np.array(vecs), seeds


def test_ivf_recall_on_clustered_corpus(spark, clustered_corpus):
    """On clustered data the coarse quantizer is nearly lossless:
    recall@10 at nprobe=4 ≥ 0.95 (measured 1.0 — each family lands in
    one cell; the uniform-sphere floor at the same nprobe is 0.60)."""
    import numpy as np

    emb, cents, V, _ = clustered_corpus
    queries = emb.filter(F.col("vec_id") % 25 == 7)
    exact = {}
    for c in range(20):
        qi = c * 25 + 7
        sims = V @ V[qi]
        sims[qi] = 2.0  # knn_join convention: the query itself ranks first
        exact[qi] = set(np.argsort(-sims)[:10])
    got = {}
    for r in sim_ops.ivf_knn_join(emb, queries, cents, k=10, nprobe=4).collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    rec = sum(
        len(got.get(q, set()) & ids) / len(ids) for q, ids in exact.items()
    ) / len(exact)
    print(f"IVF clustered recall@10 nprobe=4: {rec:.3f}")
    assert rec >= 0.95


def test_semdedup_prune_recall_on_clustered_corpus(spark, clustered_corpus):
    """SemDeDup removal set vs brute-force cosine ≥ τ ground truth:
    every vector with a lower-id twin ANYWHERE in the corpus must be
    pruned (recall floor 0.98, measured 1.0 over 468 true duplicates)
    and nothing without one may be (false removals are structurally 0 —
    the in-cell pair join verifies the true cosine)."""
    emb, cents, V, _ = clustered_corpus
    tau = 0.9
    S = V @ V.T
    truth = {
        i for i in range(len(V))
        if any(S[i, j] >= tau - 1e-9 for j in range(i))
    }
    assert len(truth) > 400  # the fixture really is full of duplicates
    removed = {
        r["vec_id"]
        for r in sim_ops.semdedup(emb, cents, threshold=tau)
        .filter(F.col("is_kept") == 0).collect()
    }
    rec = len(removed & truth) / len(truth)
    print(f"SemDeDup clustered prune recall: {rec:.3f} ({len(truth)} true dups)")
    assert rec >= 0.98
    assert not removed - truth  # no survivor is falsely pruned


def test_semantic_decontamination_recall_on_clustered_corpus(
    spark, clustered_corpus
):
    """Flagged-set recall vs the exhaustive eval×train truth: every
    training vector within threshold of ANY eval vector (the 20 family
    seeds) must be flagged from nprobe=2 up (floor 0.98, measured 1.0
    over 496 true hits; false flags structurally 0)."""
    import numpy as np

    emb, cents, V, seeds = clustered_corpus
    thr = 0.93
    ev = spark.createDataFrame(
        [(1000 + c, [float(x) for x in seeds[c]]) for c in range(20)],
        "vec_id long, embedding array<double>",
    )
    truth = {
        i for i in range(len(V))
        if float(np.max(seeds @ V[i])) >= thr - 1e-9
    }
    assert len(truth) > 400
    for nprobe in (2, 4):
        flagged = {
            r["vec_id"]
            for r in sim_ops.semantic_decontamination(
                emb, ev, cents, threshold=thr, nprobe=nprobe
            ).filter(F.col("is_clean") == 0).collect()
        }
        rec = len(flagged & truth) / len(truth)
        print(f"decontam clustered recall nprobe={nprobe}: {rec:.3f}")
        assert rec >= 0.98
        assert not flagged - truth


def test_ivf_recenter_lloyd_invariant(spark, clustered_corpus):
    """One Lloyd step on the planted-cluster corpus. The PROVABLE
    update property: with assignments fixed, moving each centroid to
    its members' mean never increases the within-cell squared-distance
    objective (the mean is the unique minimizer) — asserted per cell
    up to the 1e-6 quantization. Also: membership counts partition the
    corpus, and the new centroid equals the numpy member mean to
    quantization accuracy."""
    import numpy as np

    emb, cents, V, seeds = clustered_corpus
    rows = sim_ops.ivf_recenter(emb, cents, round_assign_digits=6).collect()
    assert sum(r["n_members"] for r in rows) / 64 == len(V)  # 64 dims each
    new, counts = {}, {}
    for r in rows:
        new.setdefault(r["cell"], [0.0] * 64)[r["pos"] - 1] = r["centroid_val"]
        counts[r["cell"]] = r["n_members"]

    # Recompute the assignment with the same rounded-argmax rule.
    C = np.array(cents)
    sims = np.round(
        (V @ C.T)
        / (np.linalg.norm(V, axis=1)[:, None] * np.linalg.norm(C, axis=1)[None, :]),
        6,
    )
    assign = np.argmax(sims, axis=1)  # first occurrence wins = ASC tie
    members = {c: V[assign == c] for c in new}
    for cell, m in members.items():
        assert counts[cell] == len(m)
        c_old, c_new = np.array(cents[cell]), np.array(new[cell])
        # new centroid == member mean, to quantization accuracy
        assert np.max(np.abs(c_new - m.mean(axis=0))) < 1e-5
        inertia_old = float(((m - c_old) ** 2).sum())
        inertia_new = float(((m - c_new) ** 2).sum())
        assert inertia_new <= inertia_old + 1e-6 * len(m)


def test_ivf_recenter_loop_converges_on_clustered_corpus(spark, clustered_corpus):
    """The chained-loop form (q155): per-iteration reports account for
    every vector, and on clustered data one mean-update strictly
    reduces total quantized inertia (the deterministic seed centroids
    are far from the 20 planted families; the recentred set is not).
    Arithmetic exactness is the oracle twin's job — this pins the
    loop's BEHAVIOR: chaining, accounting, convergence direction."""
    emb, cents, V, _ = clustered_corpus
    rows = sim_ops.ivf_recenter_loop(emb, cents, n_iters=2).collect()
    by_iter = {}
    for r in rows:
        by_iter.setdefault(r["iter"], []).append(r)
    assert set(by_iter) == {1, 2}
    n = emb.count()
    for it, cells in by_iter.items():
        assert sum(c["n_members"] for c in cells) == n, it
        assert all(c["inertia_q"] >= 0 for c in cells), it
    assert sum(c["inertia_q"] for c in by_iter[2]) < sum(
        c["inertia_q"] for c in by_iter[1]
    )


def test_ivf_recenter_loop_empty_cells_keep_centroids(spark):
    """With 2 vectors and 16 cells, 14+ cells are empty after iter 1:
    the loop must carry their previous centroids into iteration 2
    (not drop them), and both iterations must still account for both
    vectors."""
    emb = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 63), (1, [0.0, 1.0] + [0.0] * 62)],
        "vec_id long, embedding array<double>",
    )
    cents = sim_ops.deterministic_ivf_centroids(dim=64, n_cells=16)
    rows = sim_ops.ivf_recenter_loop(emb, cents, n_iters=2).collect()
    for it in (1, 2):
        assert sum(r["n_members"] for r in rows if r["iter"] == it) == 2, it


def test_ivf_recall_report_monotone_and_consistent(spark, emb_and_queries):
    """ivf_recall_report (q157, VERDICT r8 item 6): the reported
    recall@k must (a) be MONOTONE non-decreasing in nprobe — probing
    more cells can only add candidates; (b) agree exactly with a
    hand-computed intersection of ivf_knn_join and exact knn_join
    top-k sets at each budget; (c) reach 1.0 when nprobe == n_cells
    (probing everything IS the exact search)."""
    emb, queries = emb_and_queries
    cents = sim_ops.deterministic_ivf_centroids(dim=64, n_cells=16)
    report = {
        r["nprobe"]: r
        for r in sim_ops.ivf_recall_report(
            emb, cents, F.col("vec_id") % 20 == 0, k=10,
            nprobes=(1, 2, 4, 16),
        ).collect()
    }
    assert sorted(report) == [1, 2, 4, 16]
    recalls = [report[n]["recall"] for n in (1, 2, 4, 16)]
    assert recalls == sorted(recalls)  # monotone in probe budget
    assert report[16]["recall"] == 1.0  # all cells == exact search
    # cross-check each budget against the two graded operators
    exact = _exact_topk(spark, emb, queries, k=10)
    for n in (1, 2, 4):
        approx = {}
        for r in sim_ops.ivf_knn_join(
            emb, queries, cents, k=10, nprobe=n, round_assign_digits=6
        ).collect():
            approx.setdefault(r["qid"], set()).add(r["vec_id"])
        hits = sum(
            len(approx.get(q, set()) & set(ids)) for q, ids in exact.items()
        )
        assert report[n]["n_hits"] == hits
        assert report[n]["n_queries"] == len(exact)
        assert report[n]["recall"] == hits / (len(exact) * 10)


def test_ivf_recall_report_normalizes_and_validates_nprobes(
    spark, emb_and_queries
):
    """ADVICE r9: duplicate nprobe values must not double-count
    candidates inside a budget's ranking window (the report must equal
    the deduplicated call exactly), and a budget beyond the index's
    cell count must raise instead of silently reporting the exhaustive
    number under a label promising more cells than exist."""
    import pytest as _pytest

    emb, _ = emb_and_queries
    cents = sim_ops.deterministic_ivf_centroids(dim=64, n_cells=16)
    pred = F.col("vec_id") % 20 == 0
    clean = {
        r["nprobe"]: (r["n_hits"], r["recall"])
        for r in sim_ops.ivf_recall_report(
            emb, cents, pred, k=10, nprobes=(1, 4)
        ).collect()
    }
    dup = {
        r["nprobe"]: (r["n_hits"], r["recall"])
        for r in sim_ops.ivf_recall_report(
            emb, cents, pred, k=10, nprobes=(4, 1, 4, 4, 1)
        ).collect()
    }
    assert dup == clean
    with _pytest.raises(ValueError, match="exceeds the index's 16 cells"):
        sim_ops.ivf_recall_report(emb, cents, pred, k=10, nprobes=(1, 17))
    with _pytest.raises(ValueError, match="positive"):
        sim_ops.ivf_recall_report(emb, cents, pred, k=10, nprobes=(0, 4))


def test_ivf_pq_recall_on_clustered_corpus(spark, clustered_corpus):
    """IVF-PQ ADC probe quality with TRAINED codebooks (fit_pq_codebooks
    — the deterministic kit is the q165/q166 oracle anchor, not the
    retrieval path): on the clustered corpus the quantized distances
    must surface the planted FAMILIES. PQ deliberately collapses a
    tight family to (near-)identical codes, so which 10 of a 25-member
    family fill the top-10 is tie-arbitrary — exact-member recall@10
    is structurally ~0.45 here and is floor-pinned as such, while the
    family-level pins are strict: every query's top-1 is from its own
    family, the query itself appears in its own top-10, and codes are
    within [0, k)."""
    import numpy as np

    emb, cents, V, _ = clustered_corpus
    cbs = sim_ops.fit_pq_codebooks(emb, m=8, k=16)
    assert len(cbs) == 8 and all(len(cb) == 16 for cb in cbs)
    enc = sim_ops.pq_encode(emb, cbs)
    codes = {r["vec_id"]: r["codes"] for r in enc.collect()}
    assert len(codes) == 500
    assert all(0 <= c < 16 for cs in codes.values() for c in cs)

    queries = emb.filter(F.col("vec_id") % 25 == 7)
    got = {}
    for r in sim_ops.ivf_pq_knn_join(
        emb, queries, cents, cbs, k=10, nprobe=4, round_assign_digits=6
    ).collect():
        got.setdefault(r["qid"], []).append((r["rn"], r["vec_id"]))
    assert len(got) == 20
    hits = 0
    for c in range(20):
        qi = c * 25 + 7
        sims = V @ V[qi]
        sims[qi] = 2.0
        exact_top = set(np.argsort(-sims)[:10].tolist())
        ranked = [v for _, v in sorted(got[qi])]
        assert ranked[0] // 25 == c  # top hit from the query's family
        assert qi in ranked  # the query survives its own quantization
        hits += len(set(ranked) & exact_top)
    recall = hits / (20 * 10)
    # measured 0.455: within-family ranking is tie-arbitrary once
    # codes collapse — the floor pins "retrieves the family", not
    # "re-derives the exact cosine order PQ exists to avoid computing"
    assert recall >= 0.35, recall


def test_trained_pq_codebooks_beat_kit_per_subspace(spark, clustered_corpus):
    """Trained-codebook distortion evidence (VERDICT r10 item 2): on
    clustered data, fit_pq_codebooks (seeded, sample-bounded) must
    beat the data-blind deterministic kit in mean squared
    reconstruction distortion on EVERY subspace — the per-subspace
    claim q169 publishes on the driver surface. Also pins the
    sample_fraction path's shape contract."""
    emb, _, _, _ = clustered_corpus
    kit = sim_ops.pq_codebooks(dim=64, m=8, k=16)
    trained = sim_ops.fit_pq_codebooks(
        emb, m=8, k=16, seed=42, sample_fraction=0.8
    )
    assert len(trained) == 8 and all(len(cb) == 16 for cb in trained)
    rk = {
        r["subspace"]: r["mean_sq_dist"]
        for r in sim_ops.pq_reconstruction_report(emb, kit).collect()
    }
    rt = {
        r["subspace"]: r["mean_sq_dist"]
        for r in sim_ops.pq_reconstruction_report(emb, trained).collect()
    }
    assert set(rk) == set(rt) == set(range(8))
    for j in range(8):
        assert rt[j] <= rk[j], (j, rt[j], rk[j])


def test_rrf_fusion_improves_hits_at_k(spark):
    """Retrieval-quality evidence for rrf_fuse (VERDICT r10 item 5):
    on COMPLEMENTARY rankings — each system ranks the relevant doc
    first on half the queries and eighth on the other half, with
    disjoint noise elsewhere — fused hits@3 is 10/10 while either
    system alone scores 5/10, and per query the fused outcome is
    never below the better single system. Pure rank-table fusion
    (rrf_fuse's actual input interface): rel gets 1/(60+1) + 1/(60+8)
    ≈ 0.0311, strictly above any single-system noise doc's best
    1/(60+1) ≈ 0.0164 — the complementarity argument itself, pinned."""
    K = 3
    lex_hits = cos_hits = rrf_hits = 0
    for q in range(10):
        rel = 1000 + q
        strong_lex = q % 2 == 0
        lex_rank_rel = 1 if strong_lex else 8
        cos_rank_rel = 8 if strong_lex else 1
        lex_rows = [(rel, lex_rank_rel)]
        cos_rows = [(rel, cos_rank_rel)]
        for rank in range(1, 11):
            if rank != lex_rank_rel:
                lex_rows.append((2000 + q * 100 + rank, rank))
            if rank != cos_rank_rel:
                cos_rows.append((3000 + q * 100 + rank, rank))
        lex = spark.createDataFrame(lex_rows, "doc_id long, rank long")
        cos = spark.createDataFrame(cos_rows, "doc_id long, rank long")
        fused = sim_ops.rrf_fuse([(lex, "lex"), (cos, "cos")], k=60)
        top = [
            r["doc_id"]
            for r in fused.orderBy(
                F.col("rrf_score").desc(), F.col("doc_id").asc()
            )
            .limit(K)
            .collect()
        ]
        lex_hit = lex_rank_rel <= K
        cos_hit = cos_rank_rel <= K
        rrf_hit = rel in top
        lex_hits += lex_hit
        cos_hits += cos_hit
        rrf_hits += rrf_hit
        assert rrf_hit >= max(lex_hit, cos_hit), q
    assert lex_hits == 5 and cos_hits == 5
    assert rrf_hits == 10


def test_ivf_pq_rerank_recovers_exact_order(spark, clustered_corpus):
    """IVFADC+R (q171): exact re-ranking of the ADC top-40 shortlist
    recovers the exact-cosine top-10 the plain ADC ranking scrambles
    — measured recall@10 1.0 vs 0.455 plain on this fixture (the
    quantization-distortion ceiling q167 reports). Floor at 0.9; also
    pins that rerank touches only shortlist members (every returned
    id must appear in the ADC top-40) and the (sim, rn) contract."""
    import numpy as np

    emb, cents, V, _ = clustered_corpus
    cbs = sim_ops.fit_pq_codebooks(emb, m=8, k=16)
    queries = emb.filter(F.col("vec_id") % 25 == 7)
    adc40 = {}
    for r in sim_ops.ivf_pq_knn_join(
        emb, queries, cents, cbs, k=40, nprobe=4, round_assign_digits=6
    ).collect():
        adc40.setdefault(r["qid"], set()).add(r["vec_id"])
    got = {}
    for r in sim_ops.ivf_pq_knn_join(
        emb, queries, cents, cbs, k=10, nprobe=4, round_assign_digits=6,
        rerank_from=40,
    ).collect():
        assert r["sim"] is not None and 1 <= r["rn"] <= 10
        assert r["vec_id"] in adc40[r["qid"]], (r["qid"], r["vec_id"])
        got.setdefault(r["qid"], []).append((r["rn"], r["vec_id"]))
    hits = 0
    for c in range(20):
        qi = c * 25 + 7
        sims = V @ V[qi]
        sims[qi] = 2.0
        exact_top = set(np.argsort(-sims)[:10].tolist())
        hits += len({v for _, v in got[qi]} & exact_top)
    recall = hits / 200
    assert recall >= 0.9, recall


def test_pq_decontamination_flags_planted_twins(spark, clustered_corpus):
    """ADC decontamination over a codes-only train side (q172,
    similarity.semantic_decontamination_pq): with data-trained
    codebooks and an exhaustive cell probe, every same-family train
    member of every eval query is flagged (measured 480/480 at ADC
    sim median 0.925), while far-away distractor vectors stay clean —
    the screen discriminates, it doesn't just fire. Also pins the
    output contract: one row per train id, is_clean == (max_eval_sim
    < threshold)."""
    import numpy as np

    emb, cents, _, _ = clustered_corpus
    rng = np.random.RandomState(7)
    distract = []
    for i in range(50):
        v = rng.randn(64)
        v /= np.linalg.norm(v)
        distract.append((10_000 + i, [float(x) for x in v]))
    full = emb.unionByName(
        spark.createDataFrame(distract, "vec_id long, embedding array<double>")
    )
    cbs = sim_ops.fit_pq_codebooks(emb, m=8, k=16)
    evalq = emb.filter(F.col("vec_id") % 25 == 7)
    train = full.filter(F.col("vec_id") % 25 != 7)
    out = sim_ops.semantic_decontamination_pq(
        train, evalq, cents, cbs, threshold=0.5, nprobe=16,
        round_assign_digits=6,
    )
    res = {
        r["vec_id"]: (r["max_eval_sim"], r["is_clean"])
        for r in out.collect()
    }
    assert len(res) == train.count()  # one row per train id
    for vid, (s, c) in res.items():
        assert c == (0 if s >= 0.5 else 1), (vid, s, c)
    fam = {vid for vid in res if vid < 10_000}
    flagged_fam = sum(1 for vid in fam if res[vid][1] == 0)
    assert flagged_fam == len(fam), (flagged_fam, len(fam))
    clean_distractors = sum(
        1 for vid in res if vid >= 10_000 and res[vid][1] == 1
    )
    # random 64-dim unit vectors sit far below ADC 0.5 of any family
    # seed; allow a stray collision but require the mass to stay clean
    assert clean_distractors >= 48, clean_distractors


def test_pq_rerank_recall_curve_monotone(spark, clustered_corpus):
    """q173's curve on the clustered fixture: recall@k is monotone in
    the shortlist budget (provably — under the shared rounded-sim/id
    total order, hits = |exact-top-k ∩ shortlist|, and shortlists
    nest), every query is counted in every row, and a 40-deep
    shortlist with trained codebooks recovers (near-)exact order."""
    emb, cents, _, _ = clustered_corpus
    cbs = sim_ops.fit_pq_codebooks(emb, m=8, k=16)
    rows = {
        r["rerank_from"]: r
        for r in sim_ops.pq_rerank_recall_report(
            emb, cents, cbs, F.col("vec_id") % 25 == 7, k=10,
            rerank_budgets=(10, 20, 40), nprobe=4,
            round_assign_digits=6,
        ).collect()
    }
    assert set(rows) == {10, 20, 40}
    assert all(rows[R]["n_queries"] == 20 for R in rows)
    assert (
        rows[10]["recall"] <= rows[20]["recall"] <= rows[40]["recall"]
    ), {R: rows[R]["recall"] for R in rows}
    assert rows[40]["recall"] >= 0.9, rows[40]["recall"]


def test_residual_pq_beats_raw_codes_on_clustered_corpus(
    spark, clustered_corpus
):
    """Residual IVFADC evidence (VERDICT r13 item 1, Jégou 2011
    §III-A): with codebooks TRAINED on what they will quantize (raw
    vectors vs cell residuals), the residual index must (a) cut
    trained reconstruction distortion on EVERY subspace — the cell
    mean absorbs the family structure, so the same m×k budget
    resolves the remainder — and (b) lift ADC-only recall@10 at
    nprobe=4 over the raw-code index. Measured on this fixture
    (seed 42): distortion roughly halves per subspace; recall 0.44 →
    0.605. Floors pinned with margin (KMeans seeds are stable but not
    contractual)."""
    import numpy as np

    emb, cents, V, _ = clustered_corpus
    raw_cbs = sim_ops.fit_pq_codebooks(emb, m=8, k=16)
    res_cbs = sim_ops.fit_pq_codebooks(
        emb, m=8, k=16, centroids=cents, round_assign_digits=6
    )
    rk = {
        r["subspace"]: r["mean_sq_dist"]
        for r in sim_ops.pq_reconstruction_report(emb, raw_cbs).collect()
    }
    rr = {
        r["subspace"]: r["mean_sq_dist"]
        for r in sim_ops.pq_reconstruction_report(
            emb, res_cbs, centroids=cents, round_assign_digits=6
        ).collect()
    }
    assert set(rk) == set(rr) == set(range(8))
    for j in range(8):
        assert rr[j] <= rk[j], (j, rr[j], rk[j])

    queries = emb.filter(F.col("vec_id") % 25 == 7)

    def recall(cbs, residual):
        got = {}
        for r in sim_ops.ivf_pq_knn_join(
            emb, queries, cents, cbs, k=10, nprobe=4,
            round_assign_digits=6, residual=residual,
        ).collect():
            got.setdefault(r["qid"], []).append((r["rn"], r["vec_id"]))
        hits = 0
        for c in range(20):
            qi = c * 25 + 7
            sims = V @ V[qi]
            sims[qi] = 2.0
            exact_top = set(np.argsort(-sims)[:10].tolist())
            ranked = [v for _, v in sorted(got[qi])]
            hits += len(set(ranked) & exact_top)
        return hits / 200.0

    raw_rec = recall(raw_cbs, residual=False)
    res_rec = recall(res_cbs, residual=True)
    print(f"ADC-only recall@10: raw {raw_rec:.3f} residual {res_rec:.3f}")
    assert res_rec >= raw_rec + 0.05, (raw_rec, res_rec)
    assert res_rec >= 0.5, res_rec


def test_opq_rotation_cuts_distortion_keeps_recall(spark, clustered_corpus):
    """OPQ evidence (VERDICT r14 item 3, Ge 2013): fit_opq_rotation's
    Procrustes/Lloyd alternation starts at (I, plain-PQ) and every
    step is non-increasing, so total OPQ distortion ≤ total plain-PQ
    distortion BY CONSTRUCTION on the training sample; on this
    clustered fixture it roughly halves per subspace (8/8 wins,
    measured 0.019-0.030 → 0.010-0.011 mean sq dist) and brute ADC
    recall@10 holds (0.43 → 0.44). Also pins: R is orthogonal, the
    rotated encode stays in [0, k), and the screen-kit rotation path
    agrees with pq_encode's codes."""
    import numpy as np

    emb, cents, V, _ = clustered_corpus
    R, opq_cbs, pq_cbs = sim_ops.fit_opq_rotation(emb, m=8, k=16)
    Rm = np.array(R)
    assert abs(Rm @ Rm.T - np.eye(64)).max() < 1e-12
    rk = {
        r["subspace"]: r["sum_dist_q"]
        for r in sim_ops.pq_reconstruction_report(emb, pq_cbs).collect()
    }
    rr = {
        r["subspace"]: r["sum_dist_q"]
        for r in sim_ops.pq_reconstruction_report(
            emb, opq_cbs, rotation=R
        ).collect()
    }
    assert set(rk) == set(rr) == set(range(8))
    assert sum(rr.values()) <= sum(rk.values())
    wins = sum(1 for j in range(8) if rr[j] <= rk[j])
    assert wins >= 7, (wins, rr, rk)

    queries = emb.filter(F.col("vec_id") % 25 == 7)

    def adc_recall(cbs, rot):
        enc = sim_ops.pq_encode(emb, cbs, rotation=rot).withColumnRenamed(
            "vec_id", "cand_id"
        )
        prep, adc = sim_ops.pq_adc_screen_kit(cbs, rotation=rot)
        q = prep(
            queries.select(F.col("vec_id").alias("qid"), "embedding"),
            F.col("embedding"),
        )
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(
            F.col("s").desc(), F.col("cand_id").asc()
        )
        top = (
            q.crossJoin(enc)
            .select("qid", "cand_id", adc(F.col("codes")).alias("s"))
            .withColumn("rn", F.row_number().over(w))
            .filter("rn <= 10")
            .collect()
        )
        got = {}
        for r in top:
            got.setdefault(r["qid"], []).append(r["cand_id"])
        hits = 0
        for c in range(20):
            qi = c * 25 + 7
            sims = V @ V[qi]
            sims[qi] = 2.0
            hits += len(
                set(got[qi]) & set(np.argsort(-sims)[:10].tolist())
            )
        return hits / 200.0

    raw_rec = adc_recall(pq_cbs, None)
    opq_rec = adc_recall(opq_cbs, R)
    print(f"ADC recall@10: raw-PQ {raw_rec:.3f} OPQ {opq_rec:.3f}")
    assert opq_rec >= raw_rec - 0.02, (raw_rec, opq_rec)
    assert opq_rec >= 0.40, opq_rec


def test_opq_residual_composition_on_clustered_corpus(
    spark, clustered_corpus
):
    """The full OPQ→IVF→PQ composition (VERDICT r15 item 3): the
    TRAINING path composes — fit_opq_rotation(centroids=) alternates
    on residuals, so its OPQ kit must not lose to its same-seed plain
    residual baseline in total trained distortion (monotone by
    construction) — and the PROBE path composes: ivf_pq_knn_join
    (residual=True, rotation=R) ADC-only recall@10 at nprobe=4 must
    hold the residual-only recall (residuals of this fixture are
    near-isotropic noise, so the rotation is distortion/recall
    NEUTRAL, as Ge 2013 predicts for iid dimensions — the pin is "the
    composition never hurts", with the q185 clustered-raw test
    covering where OPQ wins). Codes round-trip: the probe's own index
    equals pq_append_codes under the same kit."""
    import numpy as np

    emb, cents, V, _ = clustered_corpus
    R, opqres_cbs, res_cbs = sim_ops.fit_opq_rotation(
        emb, m=8, k=16, centroids=cents, round_assign_digits=6
    )
    Rm = np.array(R)
    assert abs(Rm @ Rm.T - np.eye(64)).max() < 1e-12
    base = {
        r["subspace"]: r["sum_dist_q"]
        for r in sim_ops.pq_reconstruction_report(
            emb, res_cbs, centroids=cents, round_assign_digits=6
        ).collect()
    }
    comp = {
        r["subspace"]: r["sum_dist_q"]
        for r in sim_ops.pq_reconstruction_report(
            emb, opqres_cbs, centroids=cents, round_assign_digits=6,
            rotation=R,
        ).collect()
    }
    assert set(base) == set(comp) == set(range(8))
    # Monotone alternation: total rotated-residual distortion ≤ the
    # same-seed plain-residual total (1e-9-quantization slack).
    assert sum(comp.values()) <= sum(base.values()) + 8

    queries = emb.filter(F.col("vec_id") % 25 == 7)

    def recall(cbs, rot):
        got = {}
        for r in sim_ops.ivf_pq_knn_join(
            emb, queries, cents, cbs, k=10, nprobe=4,
            round_assign_digits=6, residual=True, rotation=rot,
        ).collect():
            got.setdefault(r["qid"], set()).add(r["vec_id"])
        hits = 0
        for c in range(20):
            qi = c * 25 + 7
            sims = V @ V[qi]
            sims[qi] = 2.0
            hits += len(
                got.get(qi, set()) & set(np.argsort(-sims)[:10].tolist())
            )
        return hits / 200.0

    res_rec = recall(res_cbs, None)
    comp_rec = recall(opqres_cbs, R)
    print(f"ADC recall@10 residual {res_rec:.3f} OPQ+residual {comp_rec:.3f}")
    assert comp_rec >= res_rec - 0.02, (res_rec, comp_rec)
    assert comp_rec >= 0.5, comp_rec
    # Probe-side index == the encode operator under the same kit.
    from big_data_ml_pipeline_spark.operators.similarity import (
        ivf_index,
        pq_append_codes,
    )

    idx = sim_ops.ivf_pq_index(
        emb, cents, opqres_cbs, round_assign_digits=6,
        residual=True, rotation=R,
    )
    direct = pq_append_codes(
        ivf_index(emb, cents, round_assign_digits=6),
        opqres_cbs, vec_col="v", centroids=cents, rotation=R,
    )
    assert {
        (r["vec_id"], r["cell"], tuple(r["codes"])) for r in idx.collect()
    } == {
        (r["vec_id"], r["cell"], tuple(r["codes"])) for r in direct.collect()
    }
