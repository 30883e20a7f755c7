"""Exact-value tests for the north-star text / dedup / similarity
operators (training-data-pipeline surface)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from big_data_ml_pipeline_spark.operators import dedup as dedup_ops
from big_data_ml_pipeline_spark.operators import similarity as sim_ops
from big_data_ml_pipeline_spark.operators import text as text_ops


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def test_token_and_char_counts(spark):
    df = spark.createDataFrame([("the  cat sat",), ("",)], ["text"])
    out = df.select(
        text_ops.token_count(F.col("text")).alias("n"),
        text_ops.char_count(F.col("text")).alias("c"),
        text_ops.avg_token_length(F.col("text")).alias("avg"),
    ).collect()
    assert (out[0]["n"], out[0]["c"]) == (3, 12)
    assert out[0]["avg"] == 3.0  # mean of len('the'), len('cat'), len('sat')
    assert (out[1]["n"], out[1]["avg"]) == (0, 0.0)  # guarded empty doc


def test_text_stats_exploded_matches_one_pass(spark):
    df = spark.createDataFrame(
        [
            (1, "The cat and the dog, of course!"),
            (2, ""),
            (3, "le chat et la souris"),
            (4, "x " * 200),
        ],
        ["doc_id", "text"],
    )
    cols = [
        "doc_id", "n_tokens", "n_chars_computed", "avg_token_len",
        "punct_ratio", "stopword_ratio", "quality", "lang_pred", "fp",
    ]
    fast = {r["doc_id"]: r for r in text_ops.text_stats(df).select(*cols).collect()}
    slow = {
        r["doc_id"]: r
        for r in text_ops.text_stats_exploded(df).select(*cols).collect()
    }
    assert fast.keys() == slow.keys()
    for k in fast:
        for c in cols:
            a, b = fast[k][c], slow[k][c]
            if isinstance(a, float):
                assert b == pytest.approx(a), (k, c)
            else:
                assert a == b, (k, c)


def test_punct_and_stopword_ratios(spark):
    df = spark.createDataFrame([("ab!?",), ("the dog of war runs",)], ["text"])
    out = df.select(
        text_ops.punct_ratio(F.col("text")).alias("p"),
        text_ops.stopword_ratio(F.col("text")).alias("s"),
    ).collect()
    assert out[0]["p"] == 0.5
    assert out[1]["s"] == 2 / 5  # 'the', 'of' of 5 tokens


def test_lang_id_markers(spark):
    cases = [
        ("the cat and hat", "en"),
        ("der hund und katze", "de"),
        ("le chat et chien", "fr"),
        ("el perro y gato", "es"),
        ("xyzzy plugh", "und"),
    ]
    df = spark.createDataFrame(cases, ["text", "want"])
    got = df.select("want", text_ops.lang_id(F.col("text")).alias("got")).collect()
    for r in got:
        assert r["got"] == r["want"]


def test_bpe_token_count(spark):
    df = spark.createDataFrame(
        [("Hello world, it's 42 degrees!",), ("",)], ["text"]
    )
    out = df.select(text_ops.bpe_token_count(F.col("text")).alias("n")).collect()
    # Hello | _world | , | _it | 's | _42 | _degrees | !
    assert out[0]["n"] == 8
    assert out[1]["n"] == 0


def test_rolling_hash_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "A  B   C"), (4, "")], ["id", "text"]
    )
    out = {
        r["id"]: r["h"]
        for r in df.select(
            "id", text_ops.rolling_hash_fingerprint(F.col("text")).alias("h")
        ).collect()
    }
    assert out[1] != out[2]  # same bag of tokens, different order
    assert out[1] == out[3]  # case/whitespace-insensitive
    assert out[4] == 0
    assert all(0 <= v < text_ops.ROLLING_HASH_MOD for v in out.values())


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("  hello world ",), ("different",)], ["text"]
    )
    got = [r[0] for r in df.select(text_ops.fingerprint(F.col("text"))).collect()]
    assert got[0] == got[1] != got[2]
    assert got[0] == hashlib.md5(b"hello world").hexdigest()


def test_quality_score_range_and_order(spark):
    good = "word " * 150
    bad = "!!! ??? ###"
    df = spark.createDataFrame([(good,), (bad,)], ["text"])
    got = [r[0] for r in df.select(text_ops.quality_score(F.col("text"))).collect()]
    assert all(0.0 <= v <= 1.0 for v in got)
    assert got[0] > got[1]


def test_vocabulary_counts_doc_freq_and_rank(spark):
    df = spark.createDataFrame(
        [(1, "The the cat"), (2, "the dog"), (3, "")], ["doc_id", "text"]
    )
    got = {
        r["token"]: (r["n_occurrences"], r["doc_freq"], r["rank"])
        for r in text_ops.vocabulary(df, k=2).collect()
    }
    # case-folded: 'the' appears 3x across 2 docs; k=2 keeps the top-2
    # by (count desc, token asc) -> 'the' then 'cat'.
    assert got == {"the": (3, 2, 1), "cat": (1, 1, 2)}


def test_quality_rules_signals_and_keep(spark):
    df = spark.createDataFrame(
        [
            (1, "The the THE quick fox"),  # case-folded repetition
            (2, ""),  # empty doc: every guard fires
            (3, "the cat and a dog ran to of the barn fast"),  # passes all
            (4, "spam " * 20),  # one token repeated: repetition reject
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in text_ops.quality_rules(df, min_tokens=5).collect()
    }
    # Case consistency: distinct_ratio and top_token_frac agree on what
    # a repeated token is ('The the THE' is ONE token thrice).
    assert out[1]["distinct_ratio"] == pytest.approx(3 / 5)
    assert out[1]["top_token_frac"] == pytest.approx(3 / 5)
    assert out[1]["keep"] is False  # top-token dominance
    # Empty doc: all signals guarded to 0.0, rejected.
    r2 = out[2]
    assert (r2["n_tokens"], r2["mean_token_len"], r2["stopword_frac"]) == (0, 0.0, 0.0)
    assert (r2["distinct_ratio"], r2["top_token_frac"], r2["keep"]) == (0.0, 0.0, False)
    # A natural sentence passes every gate.
    assert out[3]["keep"] is True
    assert out[3]["stopword_frac"] > 0.01
    # Token soup: n_tokens fine but distinct_ratio/top_token_frac reject.
    assert out[4]["distinct_ratio"] == pytest.approx(1 / 20)
    assert out[4]["top_token_frac"] == 1.0
    assert out[4]["keep"] is False


def test_top_token_share_matches_bruteforce(spark):
    from collections import Counter

    texts = [
        "a b c a b a",
        "x",
        "Mixed CASE mixed case MIXED",
        " ".join(f"tok{i}" for i in range(5000)),  # all-distinct soup
        " ".join(f"tok{i % 7}" for i in range(5000)),  # 7 hot tokens
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])
    got = {
        r["id"]: r["s"]
        for r in df.select(
            "id", text_ops.top_token_share(F.col("text")).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = t.lower().split()
        want = Counter(toks).most_common(1)[0][1] / len(toks)
        assert got[i] == pytest.approx(want), i


def test_ngram_repetition_short_and_repeated_docs(spark):
    df = spark.createDataFrame(
        [
            (1, ""),  # 0 tokens
            (2, "one two"),  # fewer tokens than n
            (3, "one two three"),  # exactly one trigram
            (4, "a b " * 4),  # trigrams alternate: 6 total, 2 distinct
            (5, "w x y z"),  # 2 distinct trigrams, no dup
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in text_ops.ngram_repetition(df, n=3).collect()
    }
    assert (out[1]["n_ngrams"], out[1]["dup_frac"]) == (0, 0.0)
    assert (out[2]["n_ngrams"], out[2]["dup_frac"]) == (0, 0.0)
    assert (out[3]["n_ngrams"], out[3]["n_distinct"]) == (1, 1)
    assert out[3]["dup_frac"] == 0.0
    assert (out[4]["n_ngrams"], out[4]["n_distinct"]) == (6, 2)
    assert out[4]["dup_frac"] == pytest.approx(4 / 6)
    assert (out[5]["n_ngrams"], out[5]["n_distinct"], out[5]["dup_frac"]) == (2, 2, 0.0)


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

def test_unigram_loglik(spark):
    import math

    df = spark.createDataFrame(
        [
            (1, "the the cat"),  # common tokens -> higher mean logp
            (2, "zyxwv"),  # hapax -> lowest
            (3, ""),  # empty doc survives with 0 tokens
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text_ops.unigram_loglik(df).collect()}
    # Corpus: the=2, cat=1, zyxwv=1, N=4. Quantized per-token logp.
    q = lambda p: round(math.log10(p) * 1_000_000)
    want1 = (q(2 / 4) + q(2 / 4) + q(1 / 4)) / 1_000_000 / 3
    want2 = q(1 / 4) / 1_000_000 / 1
    assert out[1]["n_tokens"] == 3
    assert out[1]["mean_logp"] == pytest.approx(want1, abs=1e-12)
    assert out[2]["mean_logp"] == pytest.approx(want2, abs=1e-12)
    assert out[1]["mean_logp"] > out[2]["mean_logp"]
    assert (out[3]["n_tokens"], out[3]["mean_logp"]) == (0, 0.0)


def test_ivf_index_build_probe_split(spark, tmp_path):
    """A persisted IVF index probed later must return exactly what the
    inline assignment returns — the build/probe split is free."""
    from big_data_ml_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = sim_ops.deterministic_ivf_centroids(dim, n_cells=8)
    query = emb.orderBy("vec_id").limit(1)

    direct = sim_ops.ivf_topk(
        emb, query, k=5, nprobe=3, centroids=cents
    ).collect()

    idx_path = str(tmp_path / "ivf_index")
    sim_ops.ivf_index(emb, cents).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    via_index = sim_ops.ivf_topk(
        emb, query, k=5, nprobe=3, centroids=cents, index=index
    ).collect()

    assert [(r["vec_id"], r["sim"]) for r in direct] == [
        (r["vec_id"], r["sim"]) for r in via_index
    ]
    assert len(direct) == 5
    with pytest.raises(ValueError, match="centroids"):
        sim_ops.ivf_topk(emb, query, index=index)


def test_minhash_index_incremental_equals_recompute(spark, tmp_path):
    """Incremental screening: querying a persisted banded index with a
    new shard must find exactly the cross-corpus candidate pairs a full
    minhash_dedup_pairs recompute over (corpus + shard) would — the
    hash family is deterministic, so signatures persisted earlier join
    signatures computed later."""
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    corpus_rows = [(i, f"{base} variant {i} " + "filler words here " * 3)
                   for i in range(1, 6)]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    shard = spark.createDataFrame(
        [
            (101, corpus_rows[1][1] + " tail"),  # near-dup of doc 2
            (102, "completely different content about query engines and "
                  "columnar storage formats with nothing shared at all"),
        ],
        ["doc_id", "text"],
    )
    # Persist and reload the index: survives the parquet round-trip.
    idx_path = str(tmp_path / "minhash_index")
    dedup_ops.minhash_index(corpus).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    got = {
        (r["query_id"], r["index_id"]): r["est_jaccard"]
        for r in dedup_ops.query_minhash_index(
            index, shard, threshold=0.3
        ).collect()
    }
    assert (101, 2) in got and got[(101, 2)] >= 0.3
    assert all(q != 102 for q, _ in got)  # fresh doc matches nothing

    # Equivalence with full recompute, restricted to cross pairs.
    full = dedup_ops.minhash_dedup_pairs(
        corpus.unionByName(shard), max_bucket_size=None
    )
    cross = {
        (r["id_b"], r["id_a"]): r["est_jaccard"]
        for r in full.collect()
        if r["id_b"] > 100 and r["id_a"] <= 100
    }
    want = {k: v for k, v in cross.items() if v >= 0.3}
    assert got == pytest.approx(want)


def test_compact_minhash_index_preserves_query_results(spark, tmp_path):
    """compact_minhash_index rewrites an append-fragmented index into
    fewer range-clustered files, drops retry-duplicate rows, and
    re-applies the global bucket cap — with IDENTICAL query results
    (VERDICT r5 item 3)."""
    import glob

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    corpus_rows = [(i, f"{base} variant {i} " + "filler words here " * 3)
                   for i in range(1, 9)]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    idx_path = str(tmp_path / "minhash_index")
    # Simulate ingest-cadence fragmentation: one append per 2-doc
    # micro-batch, plus a full duplicate append (an at-least-once retry).
    for lo in range(1, 9, 2):
        shard = corpus.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 2)
        )
        dedup_ops.minhash_index(shard).write.mode("append").parquet(idx_path)
    dedup_ops.minhash_index(
        corpus.filter(F.col("doc_id") <= 2)
    ).write.mode("append").parquet(idx_path)

    shard = spark.createDataFrame(
        [(101, corpus_rows[1][1] + " tail"),
         (102, "totally unrelated content about columnar storage formats "
               "and vectorized execution with nothing shared at all")],
        ["doc_id", "text"],
    )

    def probe():
        index = spark.read.parquet(idx_path)
        return sorted(
            (r["query_id"], r["index_id"], r["est_jaccard"])
            for r in dedup_ops.query_minhash_index(
                index, shard, threshold=0.3
            ).collect()
        )

    before = probe()
    files_before = len(glob.glob(idx_path + "/*.parquet"))
    rows_before = spark.read.parquet(idx_path).count()

    dedup_ops.compact_minhash_index(spark, idx_path, num_files=2)

    assert probe() == before and before  # identical, non-trivial
    files_after = glob.glob(idx_path + "/*.parquet")
    assert len(files_after) <= 2 < files_before
    # retry-duplicate rows were dropped
    compacted = spark.read.parquet(idx_path)
    assert compacted.count() < rows_before
    assert compacted.count() == compacted.dropDuplicates(
        ["id", "band", "bucket"]
    ).count()
    # no leftover temp/backup dirs
    assert not glob.glob(str(tmp_path / "minhash_index__*"))


def test_compact_index_reapplies_global_bucket_cap(spark, tmp_path):
    """Across appends a hot (band, bucket) can exceed max_bucket_size
    even though each batch was capped (ADVICE r5); compaction restores
    the global bound with the same lowest-id rule a fresh build uses."""
    text = "identical duplicate document text repeated many times over " * 3
    idx_path = str(tmp_path / "hot_index")
    # 3 appended batches of 4 identical docs: per-batch cap of 4 never
    # trips, but the persisted bucket holds 12 rows per (band, bucket).
    for lo in (0, 100, 200):
        batch = spark.createDataFrame(
            [(lo + i, text) for i in range(4)], ["doc_id", "text"]
        )
        dedup_ops.minhash_index(batch, max_bucket_size=4).write.mode(
            "append"
        ).parquet(idx_path)
    per_bucket = (
        spark.read.parquet(idx_path).groupBy("band", "bucket").count()
    )
    assert per_bucket.agg(F.max("count")).first()[0] == 12

    dedup_ops.compact_minhash_index(spark, idx_path, max_bucket_size=4)
    compacted = spark.read.parquet(idx_path)
    per_bucket = compacted.groupBy("band", "bucket").count()
    assert per_bucket.agg(F.max("count")).first()[0] <= 4
    # lowest ids win — identical to a fresh full build's cap rule
    assert {r["id"] for r in compacted.select("id").distinct().collect()} == {
        0, 1, 2, 3
    }


def test_simhash_index_incremental_equals_recompute(spark, tmp_path):
    """SimHash twin of the minhash index test: persisted index probed
    with a new shard finds exactly the cross-corpus candidates a full
    recompute over (corpus + shard) would."""
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    corpus_rows = [(i, f"{base} variant {i} " + "filler words here " * 3)
                   for i in range(1, 6)]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    shard = spark.createDataFrame(
        [
            (101, corpus_rows[1][1] + " tail"),  # near-dup of doc 2
            (102, "completely different content about query engines and "
                  "columnar storage formats with nothing shared at all"),
        ],
        ["doc_id", "text"],
    )
    idx_path = str(tmp_path / "simhash_index")
    dedup_ops.simhash_index(corpus).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    got = {
        (r["query_id"], r["index_id"]): r["hamming"]
        for r in dedup_ops.query_simhash_index(
            index, shard, max_hamming=10
        ).collect()
    }
    assert (101, 2) in got
    assert all(q != 102 for q, _ in got)

    full = dedup_ops.simhash_dedup_pairs(
        corpus.unionByName(shard), max_bucket_size=None
    )
    cross = {
        (r["id_b"], r["id_a"]): r["hamming"]
        for r in full.collect()
        if r["id_b"] > 100 and r["id_a"] <= 100 and r["hamming"] <= 10
    }
    assert got == cross


def test_ngram_contamination(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated sentence with other words entirely"),
            (3, "short doc"),  # fewer tokens than n -> 0 grams
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "QUICK Brown Fox jumps tonight")], ["doc_id", "text"]
    )
    out_df = dedup_ops.ngram_contamination(train, eval_df, n=3)
    # Eval side must broadcast: the training side is never shuffled on
    # the gram key.
    assert "BroadcastHashJoin" in out_df._jdf.queryExecution().executedPlan().toString() or \
        "BroadcastHashJoin" in out_df._jdf.queryExecution().toString()
    out = {r["doc_id"]: r for r in out_df.collect()}
    # Eval trigrams (case-folded): {quick brown fox, brown fox jumps,
    # fox jumps tonight}; doc 1 shares the first two of its 7.
    assert (out[1]["n_grams"], out[1]["hit_grams"]) == (7, 2)
    assert out[1]["hit_frac"] == pytest.approx(2 / 7)
    assert out[1]["contaminated"] is True
    assert (out[2]["hit_grams"], out[2]["contaminated"]) == (0, False)
    assert (out[3]["n_grams"], out[3]["hit_frac"], out[3]["contaminated"]) == (
        0, 0.0, False,
    )
    # min_hits above the overlap clears the verdict.
    strict = {
        r["doc_id"]: r["contaminated"]
        for r in dedup_ops.ngram_contamination(train, eval_df, n=3, min_hits=3).collect()
    }
    assert strict == {1: False, 2: False, 3: False}


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["text"])
    got = [r[0] for r in df.select(dedup_ops.word_shingles(F.col("text"), 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # shorter than n → empty set


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "Same  Doc"), (2, "same doc"), (3, "other")], ["doc_id", "text"]
    )
    kept = sorted(r["doc_id"] for r in dedup_ops.exact_dedup(df).collect())
    assert kept == [1, 3]
    groups = {r["first_id"]: r["n_dups"] for r in dedup_ops.duplicate_groups(df).collect()}
    assert groups == {1: 2, 3: 1}


def test_jaccard_pairs_exact_value(spark):
    # shingle sets {a b c, b c d} vs {a b c, b c e}: |∩|=1, |∪|=3
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "zz yy xx ww")], ["doc_id", "text"]
    )
    got = dedup_ops.jaccard_pairs(df, threshold=0.2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert math.isclose(r["jaccard"], 1 / 3, rel_tol=1e-12)


def test_jaccard_blocking_prunes_cross_block_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "a b c d", "s2")], ["doc_id", "text", "source"]
    )
    assert dedup_ops.jaccard_pairs(df, threshold=0.1).count() == 1
    assert dedup_ops.jaccard_pairs(df, threshold=0.1, block_col="source").count() == 0


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base.replace("lazy", "sleepy")
    other = "completely unrelated text about spark query engines and shuffles " * 3
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"]
    )
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in dedup_ops.minhash_dedup_pairs(df).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] > 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_identical_docs_full_signature_match(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon")],
        ["doc_id", "text"],
    )
    got = dedup_ops.minhash_dedup_pairs(df).collect()
    assert len(got) == 1 and got[0]["est_jaccard"] == 1.0


def test_minhash_oracle_variant_finds_near_duplicates(spark):
    """The md5/universal-hash family (q70) must behave like the
    xxhash64 fast path: near-dups caught, unrelated docs not."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base.replace("lazy", "sleepy")
    other = "completely unrelated text about spark query engines and shuffles " * 3
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other), (4, base)], ["doc_id", "text"]
    )
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in dedup_ops.minhash_dedup_pairs_oracle(df).collect()}
    assert pairs[(1, 4)] == 1.0          # identical docs: full signature match
    assert pairs.get((1, 2), 0) > 0.5    # near-dup caught
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_oracle_variant_identical_and_near(spark):
    """md5-half-based simhash (q71): identical docs at Hamming 0,
    near-identical docs within the band threshold, unrelated docs
    absent."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "totally different words entirely " * 5)],
        ["doc_id", "text"],
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup_ops.simhash_dedup_pairs_oracle(df).collect()}
    assert got[(1, 2)] == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_hamming_zero_for_identical(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "alpha beta gamma zeta")],
        ["doc_id", "text"],
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup_ops.simhash_dedup_pairs(df).collect()}
    assert got[(1, 2)] == 0
    # one swapped token moves few bits; candidates share a 16-bit band
    for (a, b), h in got.items():
        assert 0 <= h <= 64


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def _emb_df(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # identical to query
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
        (3, [1.0, 1.0, 0.0, 0.0]),   # 45°
        (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    return spark.createDataFrame(vecs, ["vec_id", "embedding"])


def test_brute_force_topk_exact(spark):
    emb = _emb_df(spark)
    out = sim_ops.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=3)
    got = [(r["vec_id"], r["sim"]) for r in out.collect()]
    assert got[0] == (0, 1.0) and got[1] == (1, 1.0)
    assert got[2][0] == 3 and math.isclose(got[2][1], round(1 / math.sqrt(2), 6))


def test_cosine_near_dup_pairs_blocked(spark):
    rows = [
        (1, "en", [1.0, 0.0]),
        (2, "en", [1.0, 0.0]),     # exact dup of 1, same block
        (3, "en", [0.0, 1.0]),     # orthogonal → excluded by threshold
        (4, "de", [1.0, 0.0]),     # dup of 1 but different block → excluded
        (5, "de", [2.0, 0.02]),    # near-dup of 4 within block
    ]
    df = spark.createDataFrame(rows, ["vec_id", "lang", "embedding"])
    out = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in sim_ops.cosine_near_dup_pairs(df, ["lang"], threshold=0.9).collect()
    }
    assert set(out) == {(1, 2), (4, 5)}
    assert out[(1, 2)] == 1.0
    assert 0.9 <= out[(4, 5)] < 1.0


def test_cosine_near_dup_gemm_matches_catalyst(spark):
    """The GEMM (applyInPandas) path and the pure-Catalyst path must
    agree pair-for-pair at the rounded-sim level — q57 relies on it."""
    rows = [
        (1, "en", [1.0, 0.0]),
        (2, "en", [1.0, 0.0]),
        (3, "en", [0.0, 1.0]),
        (4, "de", [1.0, 0.0]),
        (5, "de", [2.0, 0.02]),
        (6, "de", [0.0, 0.0]),    # zero vector: sim 0 with everything
        (7, "fr", [3.0, 4.0]),    # singleton block → no pairs
    ]
    df = spark.createDataFrame(rows, ["vec_id", "lang", "embedding"])
    for threshold in (0.9, 0.0):
        catalyst = {
            (r["id_a"], r["id_b"]): r["sim"]
            for r in sim_ops.cosine_near_dup_pairs(df, ["lang"], threshold=threshold).collect()
        }
        gemm = {
            (r["id_a"], r["id_b"]): r["sim"]
            for r in sim_ops.cosine_near_dup_pairs_gemm(
                df, ["lang"], threshold=threshold
            ).collect()
        }
        assert catalyst == gemm


def test_lsh_bucketed_pairs_finds_identical(spark):
    emb = _emb_df(spark)
    pairs = {(r["id_a"], r["id_b"]): r["sim"]
             for r in sim_ops.lsh_bucketed_pairs(emb, n_planes=4, dim=4, threshold=0.9).collect()}
    assert pairs.get((0, 1)) == 1.0
    assert all(s >= 0.9 for s in pairs.values())


def test_knn_join_per_query_topk(spark):
    emb = _emb_df(spark)
    out = sim_ops.knn_join(emb, emb.filter(F.col("vec_id") <= 1), k=2)
    got = {(r["qid"], r["rn"]): r["vec_id"] for r in out.collect()}
    # queries 0 and 1 are identical vectors; each ranks (0, 1) first
    assert got[(0, 1)] == 0 and got[(0, 2)] == 1
    assert got[(1, 1)] == 0 and got[(1, 2)] == 1
    assert len(got) == 4


def test_ivf_topk_contains_exact_matches(spark):
    emb = _emb_df(spark)
    out = sim_ops.ivf_topk(emb, emb.filter(F.col("vec_id") == 0), k=2, n_cells=2, nprobe=2)
    got = [(r["vec_id"], r["sim"]) for r in out.collect()]
    assert got[0] == (0, 1.0) and got[1] == (1, 1.0)


def test_ivf_topk_with_kmeans_centroids(spark):
    emb = _emb_df(spark)
    cents = sim_ops.fit_ivf_centroids(emb, n_cells=2, max_iter=5)
    assert len(cents) == 2 and all(len(c) == len(cents[0]) for c in cents)
    out = sim_ops.ivf_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=2, n_cells=2, nprobe=2, centroids=cents
    )
    got = [(r["vec_id"], r["sim"]) for r in out.collect()]
    assert got[0] == (0, 1.0) and got[1] == (1, 1.0)


def test_tf_idf_top_terms_exact(spark):
    """Exact smoothed-TFIDF values and deterministic tie order against
    a hand-computed python twin."""
    import math

    from big_data_ml_pipeline_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "durian")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.term): (r.tfidf, r.rn)
        for r in text_ops.tf_idf_top_terms(docs, k=3).collect()
    }
    n = 3
    dfreq = {"apple": 1, "banana": 2, "cherry": 1, "durian": 1}

    def tfidf(cnt, doc_len, term):
        return round((cnt / doc_len) * math.log((n + 1) / (dfreq[term] + 1)), 6)

    assert got[(1, "apple")] == (tfidf(2, 3, "apple"), 1)
    assert got[(1, "banana")] == (tfidf(1, 3, "banana"), 2)
    assert got[(2, "cherry")] == (tfidf(1, 2, "cherry"), 1)
    assert got[(2, "banana")] == (tfidf(1, 2, "banana"), 2)
    # single-term doc: idf ln(4/2), tf 1.0; and no rn>1 rows exist
    assert got[(3, "durian")] == (round(math.log(2.0), 6), 1)
    assert len(got) == 5


# ---------------------------------------------------------------------------
# PII scrub / chunking / token-budget sampling (training-data pipeline ops)
# ---------------------------------------------------------------------------

def test_scrub_pii_replaces_all_three_kinds(spark):
    from big_data_ml_pipeline_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org or 555-123-4567 at 192.168.0.1 ok")],
        ["id", "text"],
    )
    out = df.select(text_ops.scrub_pii(F.col("text")).alias("t")).first()["t"]
    assert out == "mail <EMAIL> or <PHONE> at <IP> ok"


def test_scrub_pii_leaves_clean_text_untouched(spark):
    from big_data_ml_pipeline_spark.operators import text as text_ops

    txt = "plain words 12 and punctuation! no pii here."
    df = spark.createDataFrame([(1, txt)], ["id", "text"])
    assert df.select(text_ops.scrub_pii(F.col("text")).alias("t")).first()["t"] == txt


def test_chunk_tokens_covers_every_token_with_overlap(spark):
    from big_data_ml_pipeline_spark.operators import text as text_ops

    n, size, overlap = 150, 64, 16
    words = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(1, words)], ["doc_id", "text"])
    rows = (
        text_ops.chunk_tokens(df, chunk_size=size, overlap=overlap)
        .orderBy("chunk_id")
        .collect()
    )
    # starts at 1, 49, 97 (stride 48); last chunk absorbs the tail
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert [r["n_chunk_tokens"] for r in rows] == [64, 64, 54]
    seen = set()
    for r in rows:
        seen.update(r["chunk_text"].split(" "))
    assert len(seen) == n  # full coverage, no token dropped
    # consecutive chunks share exactly `overlap` tokens
    a, b = rows[0]["chunk_text"].split(" "), rows[1]["chunk_text"].split(" ")
    assert a[-overlap:] == b[:overlap]


def test_chunk_tokens_short_and_empty_docs(spark):
    from big_data_ml_pipeline_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    rows = text_ops.chunk_tokens(df, chunk_size=8, overlap=2).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert set(by_id) == {1}  # empty/whitespace docs emit no chunks
    assert by_id[1]["n_chunk_tokens"] == 3


def test_chunk_tokens_rejects_bad_overlap(spark):
    from big_data_ml_pipeline_spark.operators import text as text_ops

    with pytest.raises(ValueError):
        text_ops.chunk_tokens(spark.range(1), chunk_size=8, overlap=8)


def test_token_budget_sample_keeps_first_overshooter(spark):
    from big_data_ml_pipeline_spark.operators import text as text_ops

    # lang a: docs of 4 tokens each, budget 10 -> docs starting at
    # 0, 4, 8 kept (8 < 10), doc starting at 12 dropped.
    docs = [(i, "a", "w w w w") for i in range(4)] + [(10, "b", "x x")]
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    kept = text_ops.token_budget_sample(df, budget_tokens=10).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert sorted(by_lang["a"]) == [0, 1, 2]
    assert by_lang["b"] == [10]
    totals = {r["doc_id"]: r["running_total"] for r in kept}
    assert totals[2] == 12  # overshooter included, budget reached


# ---------------------------------------------------------------------------
# SemDeDup (similarity.semdedup)
# ---------------------------------------------------------------------------

def test_semdedup_removes_higher_id_twin_within_cell(spark):
    # Two centroids split the space; 0/1 identical (cell of [1,0..]),
    # 3 is 45° off (sim 0.707 ≥ 0.6 with both) but only flagged if it
    # lands in the same cell; 2 orthogonal survives.
    emb = _emb_df(spark)
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = {
        r["vec_id"]: (r["cell"], r["is_kept"])
        for r in sim_ops.semdedup(emb, cents, threshold=0.9).collect()
    }
    assert len(out) == 5                      # every input row comes back
    assert out[0][1] == 1 and out[1][1] == 0  # min-id survivor rule
    assert out[2][1] == 1                     # orthogonal → kept
    assert out[4][1] == 1                     # opposite: cosine -1 → kept


def test_semdedup_gemm_matches_catalyst_and_partitioning(spark):
    emb = _emb_df(spark)
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    a = sorted(tuple(r) for r in sim_ops.semdedup(emb, cents, threshold=0.6).collect())
    b = sorted(
        tuple(r)
        for r in sim_ops.semdedup(
            emb.repartition(7), cents, threshold=0.6, use_gemm=True
        ).collect()
    )
    assert a == b


def test_semdedup_degenerate_cell_star_degrade(spark):
    # 100 identical vectors in one cell with max_cell_size=10: the
    # star-degrade compares everyone against the min id only — all
    # but vec 0 are still removed (identical to the uncapped answer
    # here), and the n² pair join is never formed.
    rows = [(i, [1.0, 0.0]) for i in range(100)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sim_ops.semdedup(
        emb, [[1.0, 0.0], [0.0, 1.0]], threshold=0.9, max_cell_size=10
    )
    kept = sorted(r["vec_id"] for r in out.filter(F.col("is_kept") == 1).collect())
    assert kept == [0]


# ---------------------------------------------------------------------------
# Sequence packing (text.pack_sequences)
# ---------------------------------------------------------------------------

def test_pack_sequences_boundaries_and_overflow_bound(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "a b c"),          # 3 tokens → pack 0 (cum 3)
            (2, "en", "d e f g"),        # 4 → pack 0 (starts at 3 < 5)
            (3, "en", "h i"),            # starts at 7 → pack 1
            (4, "en", "j k l m n o p"),  # 7 tokens > budget: starts at 9 → pack 1
            (5, "en", "q"),              # starts at 16 → pack 3 (long doc skips pack 2)
            (6, "de", "x y z"),          # separate group restarts at pack 0
        ],
        ["doc_id", "lang", "text"],
    )
    out = {
        r["doc_id"]: (r["pack_id"], r["running_total"])
        for r in text_ops.pack_sequences(docs, budget_tokens=5).collect()
    }
    assert out == {1: (0, 3), 2: (0, 7), 3: (1, 9), 4: (1, 16), 5: (3, 17), 6: (0, 3)}


def test_pack_sequences_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(tuple(r) for r in text_ops.pack_sequences(docs, 256).collect())
    b = sorted(
        tuple(r) for r in text_ops.pack_sequences(docs.repartition(13), 256).collect()
    )
    assert a == b
    # every pack's token total overflows the budget by < its last doc
    from collections import defaultdict

    packs = defaultdict(list)
    for doc_id, lang, n_tokens, running, pack_id in a:
        packs[(lang, pack_id)].append(n_tokens)
    for toks in packs.values():
        assert sum(toks) - max(toks) < 256


# ---------------------------------------------------------------------------
# Duplicate-chunk removal (text.dedup_chunks)
# ---------------------------------------------------------------------------

def test_dedup_chunks_keeps_first_occurrence_and_reassembles(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # chunks: "a b", "c d" — both first
            (2, "a b x y"),      # "a b" dups doc 1 → dropped; "x y" kept
            (3, "c d a b"),      # both chunks dup doc 1 → empty survivor
            (4, "z"),            # short tail chunk, unique
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_kept_chunks"], r["text_deduped"])
        for r in text_ops.dedup_chunks(docs, chunk_size=2).collect()
    }
    assert out[1] == (2, 2, "a b c d")
    assert out[2] == (2, 1, "x y")
    assert out[3] == (2, 0, "")     # fully-duplicated doc reported, not lost
    assert out[4] == (1, 1, "z")


def test_dedup_chunks_within_doc_repeat_collapses(spark):
    docs = spark.createDataFrame([(7, "a b a b a b")], ["doc_id", "text"])
    out = text_ops.dedup_chunks(docs, chunk_size=2).collect()[0]
    assert (out["n_chunks"], out["n_kept_chunks"], out["text_deduped"]) == (3, 1, "a b")


# ---------------------------------------------------------------------------
# DSIR importance + int8 quantization (round 6)
# ---------------------------------------------------------------------------

def test_dsir_importance_prefers_target_vocabulary(spark):
    # Target docs speak "alpha/beta", background speaks "zeta/omega";
    # a fresh doc written in the target vocabulary must outscore one
    # written in the background vocabulary.
    df = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", True),
            (2, "alpha beta beta alpha", True),
            (3, "zeta omega zeta omega", False),
            (4, "zeta omega omega zeta", False),
            (5, "alpha beta alpha", False),   # target-like outsider
            (6, "zeta omega zeta", False),    # background-like outsider
            (7, "", False),                   # empty doc -> 0.0 exactly
        ],
        ["doc_id", "text", "is_t"],
    )
    out = {
        r["doc_id"]: r
        for r in text_ops.dsir_importance(
            df, F.col("is_t"), text_col="text", id_col="doc_id"
        ).collect()
    }
    assert out[5]["importance"] > 0 > out[6]["importance"]
    assert out[7]["importance"] == 0.0 and out[7]["n_tokens"] == 0


def test_dsir_importance_partition_invariant(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pred = F.col("source").isin("src0", "src1", "src2")
    a = text_ops.dsir_importance(df, pred).collect()
    b = text_ops.dsir_importance(df.repartition(7), pred).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_quantize_embeddings_roundtrip_error_bound(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes = sim_ops.quantize_embeddings(emb)
    rows = codes.collect()
    assert len(rows) == emb.count()
    flat = [c for r in rows for c in r["codes"]]
    assert min(flat) >= -127 and max(flat) <= 127
    # Per-dim max error must be <= scale/(2*127) + float slack: the
    # report's max_abs_err column checks the same bound distributedly.
    rep = sim_ops.quantization_report(emb).collect()
    assert len(rep) == 64
    for r in rep:
        assert r["max_abs_err"] <= r["scale"] / 254.0 + 1e-6
        assert 0.0 <= r["mean_abs_err"] <= r["max_abs_err"] + 1e-9


def test_quantization_zero_dimension_maps_to_code_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [0.0, -2.0])], ["vec_id", "embedding"]
    )
    codes = {r["vec_id"]: r["codes"] for r in
             sim_ops.quantize_embeddings(df).collect()}
    assert codes[1] == [0, 64] and codes[2] == [0, -127]
    rep = {r["pos"]: r for r in sim_ops.quantization_report(df).collect()}
    assert rep[1]["scale"] == 0.0 and rep[1]["max_abs_err"] == 0.0


def test_bpe_pair_counts_exact_weighted(spark):
    from big_data_ml_pipeline_spark.operators import text as text_ops

    # "ab" occurs in 'abab' (×2 per occurrence... adjacent PAIRS of
    # chars: 'abab' -> ab, ba, ab) and 'ab'. Corpus: 'abab ab ab x'
    # -> vocab {abab:1, ab:2, x:1}; pairs: ab: 2*1 + 1*2 = 4, ba: 1.
    df = spark.createDataFrame([(1, "abab ab Ab x")], ["doc_id", "text"])
    out = {r["pair"]: (r["pair_count"], r["n_token_types"])
           for r in text_ops.bpe_pair_counts(df, k=10).collect()}
    assert out["ab"] == (4, 2)   # in 'abab' twice, in 'ab' (x2 occurrences) once each
    assert out["ba"] == (1, 1)
    assert "x" not in out        # single-char token contributes no pair


def test_bigram_loglik_rare_transitions_score_lower(spark):
    # Same unigrams, different transitions: "a b" (seen twice) vs
    # "b a" (seen once) — the rarer transition must score lower, and
    # the values must equal the hand-computed quantized model exactly.
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "b a"), (4, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text_ops.bigram_loglik(df).collect()}
    q = lambda x: round(math.log10(x) * 1e6) / 1e6
    # unigrams: a=3, b=3, N=6; bigrams: "a b"=2, "b a"=1.
    assert abs(out[1]["mean_logp"] - (q(3 / 6) + q(2 / 3)) / 2) < 1e-9
    assert abs(out[3]["mean_logp"] - (q(3 / 6) + q(1 / 3)) / 2) < 1e-9
    assert out[3]["mean_logp"] < out[1]["mean_logp"]
    assert out[4]["mean_logp"] == 0.0 and out[4]["n_tokens"] == 0


def test_bm25_ranks_matches_and_respects_length_norm(spark):
    from big_data_ml_pipeline_spark.operators import text as text_ops

    # d1: two query hits in a short doc; d2: one hit, same length;
    # d3: one hit buried in a long doc (length-normalized below d2);
    # d4: no hits (absent from results).
    df = spark.createDataFrame(
        [
            (1, "cat dog x y"),
            (2, "cat q x y"),
            (3, "cat " + " ".join(f"f{i}" for i in range(20))),
            (4, "u v w z"),
        ],
        ["doc_id", "text"],
    )
    out = text_ops.bm25_topk(df, ("cat", "dog"), k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1 and 4 not in ids
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n_terms"] == 2
    assert by_id[2]["score"] > by_id[3]["score"]  # shorter doc wins


def test_winnowing_guarantee_and_disjoint_docs(spark):
    from big_data_ml_pipeline_spark.operators import text as text_ops

    # Docs 1/2 share a run of w+k-1 = 8 tokens -> the winnowing
    # guarantee promises >= 1 shared fingerprint. Doc 3 is disjoint.
    run = "a b c d e f g h"
    df = spark.createDataFrame(
        [
            (1, "p q r " + run),
            (2, run + " s t u"),
            (3, "m n o m n o m n o m n o"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in text_ops.winnowing_overlap_pairs(df, k=4, w=5).collect()
    }
    assert pairs.get((1, 2), 0) >= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnowing_short_doc_keeps_global_min(spark):
    from big_data_ml_pipeline_spark.operators import text as text_ops

    # 5 tokens, k=4 -> 2 grams < w=5 grams: exactly ONE fingerprint
    # (the global min), not zero.
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    fps = text_ops.winnowing_fingerprints(df, k=4, w=5).collect()
    assert len(fps) == 1


def test_source_divergence_identical_and_disjoint(spark):
    from big_data_ml_pipeline_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "a b c a", "s1"),
            (2, "a b c a", "s2"),   # identical distribution to s1
            (3, "x y z x", "s3"),   # disjoint vocabulary
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in text_ops.source_divergence(df).collect()
    }
    assert abs(out[("s1", "s2")]["jsd_bits"]) < 1e-8
    # Disjoint distributions: JSD = 1 bit exactly; no shared tokens
    # means the pair row is absent from the shared join — the 1-bit
    # case is reached via a pair sharing SOME mass below.
    assert ("s1", "s3") not in out  # no shared tokens -> no row
    df2 = spark.createDataFrame(
        [(1, "a a a b", "p"), (2, "a c c c", "q")], ["doc_id", "text", "source"]
    )
    r = text_ops.source_divergence(df2).collect()[0]
    # Hand-computed: pa = {a:3/4, b:1/4}, pb = {a:1/4, c:3/4};
    # shared token 'a': m = 1/2; contrib = .5*(3/4)*log2(3/2) + .5*(1/4)*log2(1/2)
    import math as _m

    exp = (
        0.5 * 0.75 * _m.log2(1.5)
        + 0.5 * 0.25 * _m.log2(0.5)
        + 0.5 * (1 - 0.75)
        + 0.5 * (1 - 0.25)
    )
    assert abs(r["jsd_bits"] - exp) < 1e-6
    assert r["n_shared_tokens"] == 1


def test_cluster_balanced_sample_caps_and_determinism(spark):
    from big_data_ml_pipeline_spark.operators import similarity as sim_ops

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim_ops.deterministic_ivf_centroids(dim=64, n_cells=16)
    out = sim_ops.cluster_balanced_sample(
        emb, cents, per_cell=3, round_assign_digits=6
    )
    rows_all = out.collect()
    assert len(rows_all) == emb.count()  # every row flagged, none dropped
    from collections import Counter

    kept_per_cell = Counter(r["cell"] for r in rows_all if r["is_kept"])
    assert all(v <= 3 for v in kept_per_cell.values())
    # Determinism across partitionings: same kept set on repartition(7).
    out2 = sim_ops.cluster_balanced_sample(
        emb.repartition(7), cents, per_cell=3, round_assign_digits=6
    )
    kept1 = {r["vec_id"] for r in rows_all if r["is_kept"]}
    kept2 = {r["vec_id"] for r in out2.collect() if r["is_kept"]}
    assert kept1 == kept2


def test_minhash_calibration_exact_on_identical_docs(spark):
    from big_data_ml_pipeline_spark.operators import dedup as dedup_ops

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),                       # identical: est == exact == 1.0
            (3, base + " extra tail words"), # high-overlap near-dup
            (4, "totally different text about nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in dedup_ops.minhash_calibration(df, min_est=0.2).collect()
    }
    assert out[(1, 2)]["est_jaccard"] == 1.0
    assert out[(1, 2)]["exact_jaccard"] == 1.0
    assert out[(1, 2)]["abs_err"] == 0.0
    near = out[(1, 3)]
    # Doc 1: 10 tokens -> 8 shingles, all contained in doc 3's 11
    # shingles -> exact Jaccard = 8 / (8 + 11 - 8) = 8/11.
    assert abs(near["exact_jaccard"] - 8 / 11) < 1e-12
    assert abs(near["abs_err"] - abs(near["est_jaccard"] - 8 / 11)) < 1e-12
    assert all(k[1] != 4 and k[0] != 4 for k in out)


def test_trigram_backoff_hand_computed(spark):
    """Held-out stupid backoff: seen trigrams use the trigram ratio;
    unseen grams back off with 0.4 per level down to the OOV floor.
    Values must equal the hand-computed quantized model exactly."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "a b c"), (4, "x a b")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in text_ops.trigram_backoff_loglik(
            df, F.col("doc_id") <= 2
        ).collect()
    }
    q = lambda x: round(math.log10(x) * 1e6) / 1e6
    # Model from docs 1-2: uni a:2 b:2 c:1 d:1 (N=6); bi 'a b':2,
    # 'b c':1, 'b d':1; tri 'a b c':1, 'a b d':1.
    exp3 = (q(2 / 6) + q(2 / 2) + q(1 / 2)) / 3
    assert abs(out[3]["mean_logp"] - exp3) < 1e-9
    # Doc 4 'x a b': OOV unigram floor, bigram-missing backoff to
    # uni(a), trigram-missing backoff to 0.4*bi(a b)/uni(a).
    exp4 = (q(0.4 / 6) + q(0.4 * 2 / 6) + q(0.4 * 2 / 2)) / 3
    assert abs(out[4]["mean_logp"] - exp4) < 1e-9
    assert out[4]["mean_logp"] < out[3]["mean_logp"]
    assert out[3]["n_tokens"] == 3


def test_token_entropy_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # 0 bits
            (2, "a b c d"),              # uniform over 4: 2 bits, norm 1.0
            (3, "a a b"),               # H = 2/3*log2(3/2) + 1/3*log2(3)
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text_ops.token_entropy(df).collect()}
    assert out[1]["entropy_bits"] == 0.0 and out[1]["norm_entropy"] == 0.0
    assert abs(out[2]["entropy_bits"] - 2.0) < 1e-8
    assert abs(out[2]["norm_entropy"] - 1.0) < 1e-8
    want3 = (2 / 3) * math.log2(3 / 2) + (1 / 3) * math.log2(3)
    assert abs(out[3]["entropy_bits"] - want3) < 1e-8
    assert out[4]["n_tokens"] == 0 and out[4]["entropy_bits"] == 0.0


def test_source_minhash_overlap_extremes(spark):
    # Two identical sources -> all 64 positions match (est 1.0);
    # a disjoint-vocabulary source shares ~nothing with either.
    rows = []
    for i in range(6):
        text = f"alpha beta gamma delta epsilon zeta token{i} eta theta"
        rows.append((i, text, "s1"))
        rows.append((100 + i, text, "s2"))
        rows.append((200 + i, f"uno dos tres cuatro cinco seis w{i} siete ocho", "s3"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        (r["source_a"], r["source_b"]): r["est_jaccard"]
        for r in dedup_ops.source_minhash_overlap(df).collect()
    }
    assert out[("s1", "s2")] == 1.0
    assert out.get(("s1", "s3"), 0.0) < 0.2
    assert out.get(("s2", "s3"), 0.0) < 0.2


def test_distribution_shift_matches_source_divergence(spark):
    """distribution_shift(a, b) == the q129 pairwise JSD for the same
    two corpora; identical corpora -> 0; disjoint -> 1 bit; empty side
    handled."""
    a = spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"])
    b = spark.createDataFrame([(2, "a c c c")], ["doc_id", "text"])
    r = text_ops.distribution_shift(a, b).collect()[0]
    both = a.withColumn("source", F.lit("p")).unionByName(
        b.withColumn("source", F.lit("q"))
    )
    want = text_ops.source_divergence(both).collect()[0]
    assert abs(r["jsd_bits"] - want["jsd_bits"]) < 1e-12
    assert r["n_shared_tokens"] == want["n_shared_tokens"]
    assert (r["n_tokens_a"], r["n_tokens_b"]) == (4, 4)
    same = text_ops.distribution_shift(a, a).collect()[0]
    assert abs(same["jsd_bits"]) < 1e-9
    dis = spark.createDataFrame([(3, "x y z")], ["doc_id", "text"])
    far = text_ops.distribution_shift(a, dis).collect()[0]
    assert abs(far["jsd_bits"] - 1.0) < 1e-9 and far["n_shared_tokens"] == 0
    empty = spark.createDataFrame([], "doc_id long, text string")
    e = text_ops.distribution_shift(a, empty).collect()[0]
    assert e["n_tokens_b"] == 0 and e["jsd_bits"] == 1.0


def test_unigram_loglik_from_counts_hand_computed(spark):
    """External-model LM scoring with Laplace smoothing: seen tokens
    score by (cnt+1)/(N+V+1); OOV tokens by 1/(N+V+1); empty docs 0."""
    counts = spark.createDataFrame(
        [("a", 3), ("b", 1)], ["token", "cnt"]
    )  # N=4, V=2 -> denominator 7
    df = spark.createDataFrame(
        [(1, "a b"), (2, "zzz"), (3, "")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in
           text_ops.unigram_loglik_from_counts(df, counts).collect()}
    q = lambda x: round(math.log10(x) * 1e6) / 1e6
    assert abs(out[1]["mean_logp"] - (q(4 / 7) + q(2 / 7)) / 2) < 1e-9
    assert abs(out[2]["mean_logp"] - q(1 / 7)) < 1e-9
    assert out[3]["mean_logp"] == 0.0 and out[3]["n_tokens"] == 0
    # Partial-unmerged counts fold identically.
    parts = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1)], ["token", "cnt"]
    )
    out2 = {r["doc_id"]: r["mean_logp"] for r in
            text_ops.unigram_loglik_from_counts(df, parts).collect()}
    assert out2[1] == out[1]["mean_logp"]


# ---------------------------------------------------------------------------
# Substring-level duplicate-span dedup (VERDICT r6 item 1)
# ---------------------------------------------------------------------------

def _mk_words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_duplicate_spans_catch_chunk_straddling_dup(spark):
    """A 24-token substring shared across two docs but OFFSET so it
    straddles the q114 chunk boundary: chunk-level dedup (fixed
    boundaries) provably finds NO duplicate chunk, while the span
    operator recovers the exact token range."""
    shared = _mk_words("dup", 24)
    # doc 1: shared at positions 0..23; doc 2: shared at 20..43 —
    # with chunk_size=16 doc1 splits it [0:16)+[16:24), doc2 [20:32)+...
    # no chunk text can match (different alignment, unique padding).
    d1 = shared + " " + _mk_words("a", 20)
    d2 = _mk_words("b", 20) + " " + shared + " " + _mk_words("c", 8)
    df = spark.createDataFrame([(1, d1), (2, d2)], ["doc_id", "text"])

    chunk = text_ops.dedup_chunks(df, chunk_size=16)
    assert all(
        r["n_kept_chunks"] == r["n_chunks"] for r in chunk.collect()
    ), "precondition: chunk dedup must miss the straddling span"

    spans = text_ops.duplicate_spans(df, k=5, min_len=10).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
            for r in spans] == [(2, 20, 43, 24)]


def test_duplicate_spans_keeper_and_merge_semantics(spark):
    """Min-id doc keeps its text; two nearby shared runs in one doc
    merge into a single span when their gap <= k, stay separate
    otherwise; within-doc-only repetition is NOT flagged."""
    s1, s2 = _mk_words("x", 12), _mk_words("y", 12)
    owner = s1 + " " + _mk_words("o", 30) + " " + s2
    # borrower: s1 then a 3-token gap then s2 (gap < k=5 -> one span).
    borrower = _mk_words("p", 7) + " " + s1 + " q0 q1 q2 " + s2
    # self-repeater: its own phrase twice, shared with nobody.
    rep = _mk_words("z", 8) + " " + _mk_words("z", 8)
    df = spark.createDataFrame(
        [(10, owner), (20, borrower), (30, rep)], ["doc_id", "text"]
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"]) for r in
        text_ops.duplicate_spans(df, k=5, min_len=10).collect()
    )
    # borrower: s1 at 7..18, gap q0-q2 at 19..21, s2 at 22..33.
    # Last matching 5-gram of s1 starts at 14; first of s2 at 22 —
    # gap 8 > k with the 3 filler tokens? positions 14 and 22 differ
    # by 8 > 5 -> SEPARATE spans.
    assert spans == [(20, 7, 18), (20, 22, 33)]
    # Owner (min id) keeps everything; self-repetition unflagged.
    assert {d for d, _, _ in spans} == {20}

    # Shrink the gap to 1 token -> positions 14 and 20 differ by 6 > 5
    # still separate; remove the gap entirely -> contiguous, one span.
    fused = _mk_words("p", 7) + " " + s1 + " " + s2
    df2 = spark.createDataFrame([(10, owner), (20, fused)], ["doc_id", "text"])
    spans2 = [
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in text_ops.duplicate_spans(df2, k=5, min_len=10).collect()
    ]
    assert spans2 == [(20, 7, 30, 24)]


def test_excise_duplicate_spans_reassembly(spark):
    """Excision removes exactly the span tokens from non-keeper docs,
    keeps every other token in order, and leaves keepers untouched;
    hashed=True produces the identical span set."""
    shared = _mk_words("dup", 16)
    d1 = "alpha beta " + shared + " gamma delta"
    d2 = "one two three four " + shared + " five six"
    d3 = "completely unrelated text with enough words to stand alone here"
    df = spark.createDataFrame([(1, d1), (2, d2), (3, d3)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           text_ops.excise_duplicate_spans(df, k=5, min_len=10).collect()}
    assert len(out) == 3
    assert out[1]["clean_text"] == d1 and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "one two three four five six"
    assert out[2]["n_removed"] == 16 and out[2]["n_tokens"] == 22
    assert out[3]["clean_text"] == d3 and out[3]["n_removed"] == 0
    # One copy of the substring survives corpus-wide.
    survivors = sum(shared in r["clean_text"] for r in out.values())
    assert survivors == 1

    a = sorted(map(tuple, text_ops.duplicate_spans(df, k=5, min_len=10).collect()))
    b = sorted(map(tuple, text_ops.duplicate_spans(
        df, k=5, min_len=10, hashed=True).collect()))
    assert a == b


def test_duplicate_spans_vs_literal_python(spark):
    """Cross-check the full pipeline against a literal Python
    implementation (positional k-grams, min-id keeper, interval merge)
    on the sf0.001 corpus head — every span identical."""
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").orderBy("doc_id").limit(120).collect()
    )
    k, min_len = 4, 8
    docs = {r["doc_id"]: r["text"].split() for r in rows}
    gram_where = {}
    for did, toks in docs.items():
        for p in range(len(toks) - k + 1):
            gram_where.setdefault(" ".join(toks[p:p + k]), set()).add(did)
    expected = set()
    for did, toks in docs.items():
        hits = [
            p for p in range(len(toks) - k + 1)
            if (lambda ds: len(ds) >= 2 and min(ds) != did)(
                gram_where[" ".join(toks[p:p + k])]
            )
        ]
        run: list[int] = []
        for p in hits + [None]:
            if run and (p is None or p - run[-1] > k):
                s, e = run[0], run[-1] + k - 1
                if e - s + 1 >= min_len:
                    expected.add((did, s, e, e - s + 1))
                run = []
            if p is not None:
                run.append(p)
    sub = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in text_ops.duplicate_spans(sub, k=k, min_len=min_len).collect()
    }
    assert got == expected and expected


# ---------------------------------------------------------------------------
# BPE encode (VERDICT r6 item 2)
# ---------------------------------------------------------------------------

def _literal_bpe(word, merges):
    """Reference implementation: GPT-2-style greedy min-rank loop."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    units = list(word)
    while len(units) > 1:
        cand = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(units, units[1:]))
            if (a, b) in ranks
        ]
        if not cand:
            break
        rank = min(cand)[0]
        a, b = merges[rank]
        out, i = [], 0
        while i < len(units):
            if i < len(units) - 1 and units[i] == a and units[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(units[i])
                i += 1
        units = out
    return units


def test_bpe_encode_adversarial_hand_computed(spark):
    """Hand-computed adversarial cases: a later merge EXPOSING an
    earlier-rank pair (one-pass-per-merge application gets this wrong),
    left-to-right greedy runs on repeated characters, and unknown
    characters passing through as singletons."""
    merges = [("x", "ab"), ("a", "b"), ("aa", "a"), ("a", "a")]
    df = spark.createDataFrame(
        [(1, "xab"), (2, "aaaa"), (3, "aaaaa"), (4, "q"), (5, "ab xab AB")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["bpe_tokens"] for r in
           text_ops.bpe_encode(df, merges).collect()}
    # (a,b) fires first (rank 1), creating (x, ab) at rank 0 — the
    # re-scan MUST pick it up.
    assert out[1] == ["xab"]
    # (a,a) rank 3: left-to-right pairing.
    assert out[2] == ["aa", "aa"]
    # [a]*5 -> [aa, aa, a] -> (aa,a) rank 2 applies -> [aa, aaa].
    assert out[3] == ["aa", "aaa"]
    assert out[4] == ["q"]
    # Case-folded; whitespace words concatenate in order.
    assert out[5] == ["ab", "xab", "ab"]


def test_bpe_encode_matches_literal_python_on_corpus(spark):
    """Spark encoding == the literal Python encoder for every word of
    the sf0.001 corpus head under the q143 merge table."""
    from __spark_entry__ import Q143_BPE_MERGES

    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").orderBy("doc_id").limit(60).collect()
    )
    df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], ["doc_id", "text"]
    )
    got = {r["doc_id"]: list(r["bpe_tokens"]) for r in
           text_ops.bpe_encode(df, Q143_BPE_MERGES).collect()}
    for r in rows:
        expect = []
        for w in r["text"].lower().split():
            if w:
                expect.extend(_literal_bpe(w, Q143_BPE_MERGES))
        assert got[r["doc_id"]] == expect, r["doc_id"]


def test_bpe_feeds_packing_and_chunking(spark):
    """The wiring VERDICT asked for: pack_sequences budgets on
    n_bpe_tokens via n_tokens_col, and chunk_tokens windows over the
    bpe_tokens array via tokens_col — context budgets measured in
    tokenizer tokens, not whitespace words."""
    merges = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d")]
    df = spark.createDataFrame(
        [(i, "the quick and steady hand then struck " * 3) for i in range(6)],
        ["doc_id", "text"],
    )
    enc = text_ops.bpe_encode(df, merges)
    one = enc.first()
    assert one["n_bpe_tokens"] > one["n_tokens"]  # chars split > words

    packed = text_ops.pack_sequences(
        enc.withColumn("grp", F.lit("g")),
        budget_tokens=64, id_col="doc_id", group_col="grp",
        n_tokens_col="n_bpe_tokens",
    ).collect()
    assert {r["n_tokens"] for r in packed} == {one["n_bpe_tokens"]}
    # Packs respect the BPE budget: each doc's running total // 64.
    per = one["n_bpe_tokens"]
    expect_pack = [(i * per) // 64 for i in range(6)]
    assert sorted(r["pack_id"] for r in packed) == sorted(expect_pack)

    chunks = text_ops.chunk_tokens(
        enc, chunk_size=16, overlap=0, id_col="doc_id",
        tokens_col="bpe_tokens",
    )
    got = chunks.filter(F.col("doc_id") == 0).orderBy("chunk_id").collect()
    # Chunk token counts sum to the doc's BPE token count and every
    # chunk text is whitespace-joined BPE units.
    assert sum(r["n_chunk_tokens"] for r in got) == per
    flat = " ".join(r["chunk_text"] for r in got).split()
    assert flat == list(one["bpe_tokens"])


# ---------------------------------------------------------------------------
# Per-language quality profiles (VERDICT r6 item 7)
# ---------------------------------------------------------------------------

def test_quality_rules_lang_profiles(spark):
    """A German document with zero ENGLISH stopwords fails the default
    gate but passes under the 'de' profile (stopword floor lifted);
    an English doc is still held to the English floor; an unknown
    language falls back to the defaults; profiles without lang_col
    raise."""
    de = ("der schnelle braune fuchs springt über den faulen hund "
          "während die sonne hinter den bergen langsam untergeht "
          "und der alte müller seine mühle am rauschenden bach öffnet") * 2
    en_bad = ("quick brown fox jumps over lazy dog near riverbank "
              "while evening sunlight fades behind distant mountain peaks "
              "casting long shadows across quiet meadow grass tonight") * 2
    en_good = ("the quick brown fox jumps over the lazy dog and then "
               "returns to the den of a fox family near the edge of a "
               "quiet forest while the sun sets over the hills") * 2
    df = spark.createDataFrame(
        [(1, de, "de"), (2, en_bad, "en"), (3, en_good, "en"),
         (4, en_bad, "xx")],
        ["doc_id", "text", "lang"],
    )
    default = {r["doc_id"]: r["keep"] for r in
               text_ops.quality_rules(df).collect()}
    assert default == {1: False, 2: False, 3: True, 4: False}

    prof = {r["doc_id"]: r["keep"] for r in text_ops.quality_rules(
        df, lang_col="lang",
        lang_profiles=text_ops.GOPHER_LANG_PROFILES,
    ).collect()}
    # de: stopword floor lifted -> passes; en without stopwords still
    # fails (floor RAISED to 0.05); unknown 'xx' -> defaults -> fails.
    assert prof == {1: True, 2: False, 3: True, 4: False}

    with pytest.raises(ValueError, match="lang_col"):
        text_ops.quality_rules(
            df, lang_profiles=text_ops.GOPHER_LANG_PROFILES
        )


def test_within_doc_repeat_excision(spark):
    """scope='within_doc': a repeated run collapses to its first
    occurrence, isolated word repeats below min_len survive, and the
    cross-doc keeper rule does not apply (a doc sharing text with
    another doc but with no internal repeats is untouched)."""
    d1 = "intro words then a b c d e a b c d e closing remark"
    d2 = "a b c d e completely separate document with fresh words here"
    d3 = "one two one two one two padding padding more filler words"
    df = spark.createDataFrame([(1, d1), (2, d2), (3, d3)], ["doc_id", "text"])
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in text_ops.duplicate_spans(
            df, k=2, min_len=4, scope="within_doc"
        ).collect()
    }
    # d1: second 'a b c d e' at tokens 8-12; d3: 'one two' x3 — repeat
    # evidence at positions 2..4 covering tokens 2-5.
    assert (1, 8, 12) in spans
    assert any(d == 3 for d, _, _ in spans)
    assert not any(d == 2 for d, _, _ in spans)  # cross-doc is ignored
    out = {r["doc_id"]: r for r in text_ops.excise_duplicate_spans(
        df, k=2, min_len=4, scope="within_doc").collect()}
    assert out[1]["clean_text"] == "intro words then a b c d e closing remark"
    assert out[2]["clean_text"] == d2 and out[2]["n_removed"] == 0
    assert out[3]["clean_text"].startswith("one two ")
    assert "one two one" not in out[3]["clean_text"]


def test_duplicate_spans_skew_safe_identical(spark):
    """skew_safe=True (aggregate+join-back, map-side partials — the
    boilerplate-flood guard) produces the identical span set to the
    default window path on the sf0.001 corpus."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, text_ops.duplicate_spans(
        docs, k=5, min_len=10).collect()))
    b = sorted(map(tuple, text_ops.duplicate_spans(
        docs, k=5, min_len=10, skew_safe=True).collect()))
    assert a == b and a


def test_bpe_encode_degenerate_inputs(spark):
    """Empty text, whitespace-only text, and NULL text all encode to
    empty token streams with zero counts; single-char words pass
    through untouched."""
    from __spark_entry__ import Q143_BPE_MERGES

    df = spark.createDataFrame(
        [(1, ""), (2, "   \t  "), (3, None), (4, "a b c")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           text_ops.bpe_encode(df, Q143_BPE_MERGES).collect()}
    for i in (1, 2, 3):
        assert list(out[i]["bpe_tokens"]) == []
        assert out[i]["n_tokens"] == 0 and out[i]["n_bpe_tokens"] == 0
    assert list(out[4]["bpe_tokens"]) == ["a", "b", "c"]


def test_duplicate_spans_short_and_empty_docs(spark):
    """Documents shorter than k produce no grams and never appear in
    the span table; excision returns them untouched (empty text stays
    empty)."""
    shared = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, shared + " longer doc body here"),
         (4, "prefix " + shared)],
        "doc_id long, text string",
    )
    spans = text_ops.duplicate_spans(df, k=5, min_len=10).collect()
    assert {r["doc_id"] for r in spans} == {4}
    out = {r["doc_id"]: r for r in
           text_ops.excise_duplicate_spans(df, k=5, min_len=10).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_tokens"] == 0
    assert out[2]["clean_text"] == "one two" and out[2]["n_removed"] == 0
    assert out[4]["clean_text"] == "prefix"


def test_clean_corpus_accounting(spark):
    """q151 composition invariant on the corpus: per document,
    n_tokens_final == n_tokens_orig - n_cross_removed -
    n_within_removed (each excision removes exactly the tokens it
    accounts for), all non-negative, and at least one doc was touched
    by each stage."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q151_clean_corpus"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 500
    assert any(r["n_cross_removed"] > 0 for r in rows)
    assert any(r["n_within_removed"] > 0 for r in rows)
    for r in rows:
        assert r["n_tokens_final"] == (
            r["n_tokens_orig"] - r["n_cross_removed"] - r["n_within_removed"]
        ), r["doc_id"]
        assert 0 <= r["n_tokens_final"] <= r["n_tokens_orig"]


def test_bpe_span_excision_matches_literal_python(spark):
    """The q153 chain — bpe_encode → within-doc duplicate_spans →
    excision, all over ``tokens_col`` — against the literal Python
    encoder chained into a literal Python span twin, on adversarial
    repetitive strings (character runs, merge-exposing words, repeats
    that only exist at the BPE-unit level)."""
    from __spark_entry__ import Q143_BPE_MERGES

    texts = [
        (0, "the theme the theme the theme and then the theme"),
        (1, "and and and and and and and and"),
        (2, "ababab ababab ababab ababab ababab ababab"),
        (3, "one two three four five"),
        (4, ""),
        (5, "xab xab aaaa xab xab aaaa xab xab aaaa"),
        (6, "thethethethe andandandand thethethethe"),
    ]
    k, min_len = 2, 4
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    enc = text_ops.bpe_encode(df, Q143_BPE_MERGES)
    spans = text_ops.duplicate_spans(
        enc, k=k, min_len=min_len, scope="within_doc",
        tokens_col="bpe_tokens",
    )
    cleaned = text_ops.excise_spans(
        enc, spans, tokens_col="bpe_tokens", emit_tokens=True
    )
    got_spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in spans.collect()
    }
    got_clean = {
        r["doc_id"]: (list(r["clean_tokens"]), r["n_tokens"], r["n_removed"])
        for r in cleaned.collect()
    }
    # q153 ships the 8-byte hashed gram key — identical span set to
    # the string-gram path (the cross_doc twin of this pin exists at
    # test_duplicate_spans_hashed_identity).
    hashed_spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in text_ops.duplicate_spans(
            enc, k=k, min_len=min_len, scope="within_doc",
            tokens_col="bpe_tokens", hashed=True,
        ).collect()
    }
    assert hashed_spans == got_spans

    expect_spans = set()
    for did, text in texts:
        toks = []
        for w in text.lower().split():
            if w:
                toks.extend(_literal_bpe(w, Q143_BPE_MERGES))
        first, hits = {}, []
        for p in range(len(toks) - k + 1):
            g = tuple(toks[p:p + k])
            if g in first:
                hits.append(p)
            else:
                first[g] = p
        spans_py, run = [], []
        for p in hits + [None]:
            if run and (p is None or p - run[-1] > k):
                s, e = run[0], run[-1] + k - 1
                if e - s + 1 >= min_len:
                    spans_py.append((s, e))
                run = []
            if p is not None:
                run.append(p)
        removed = set()
        for s, e in spans_py:
            expect_spans.add((did, s, e, e - s + 1))
            removed.update(range(s, e + 1))
        kept = [t for i, t in enumerate(toks) if i not in removed]
        # Losslessness IS this equality: the Spark result must be the
        # original token list with exactly the removed index set
        # deleted (a previous standalone "subsequence" check here was
        # vacuous — ADVICE r8 — and is subsumed by this assertion).
        assert got_clean[did] == (kept, len(toks), len(removed)), did
    assert got_spans == expect_spans


def test_ccnet_buckets_tier_invariants(spark):
    """ccnet_buckets (q159): per language the NTILE split is
    equal-count (sizes differ by at most 1), every document lands in
    exactly one tier, and tier score ranges are ordered — bucket 1's
    minimum mean_logp is >= bucket 2's maximum, etc. (the head IS the
    most natural text)."""
    rows = []
    for lang, n in (("en", 10), ("de", 7)):
        for i in range(n):
            # vary naturalness: more repeats of corpus-common tokens
            # => higher unigram loglik
            common = "the and of to in " * (i + 1)
            rare = f"zz{lang}{i}q xx{lang}{i}w "
            rows.append((len(rows), lang, (common + rare).strip()))
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    rep = text_ops.ccnet_buckets(docs, n_buckets=3).collect()
    by_lang: dict = {}
    for r in rep:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, n in (("en", 10), ("de", 7)):
        tiers = by_lang[lang]
        assert sorted(tiers) == [1, 2, 3]
        sizes = [tiers[b]["n_docs"] for b in (1, 2, 3)]
        assert sum(sizes) == n
        assert max(sizes) - min(sizes) <= 1
        # ordered, non-overlapping score ranges head -> tail
        assert tiers[1]["min_logp"] >= tiers[2]["max_logp"]
        assert tiers[2]["min_logp"] >= tiers[3]["max_logp"]
        assert tiers[1]["max_logp"] >= tiers[1]["min_logp"]


def test_ccnet_buckets_empty_docs_sink_to_tail(spark):
    """Token-less documents score the 0.0 sentinel — ABOVE every real
    document's strictly-negative mean log10 probability — so the tier
    ordering leads with a has-tokens key: empties must land in the
    LAST bucket, never the head the recipe trains on."""
    rows = [(i, "en", "the and of to in common words here now so") for i in range(6)]
    rows += [(100, "en", ""), (101, "en", "   ")]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    rep = text_ops.ccnet_buckets(docs, n_buckets=3)
    # tier sizes: 8 docs -> 3/3/2; both empties must be in bucket 3
    per_doc = (
        text_ops.unigram_loglik(docs)
        .filter("n_tokens = 0")
        .count()
    )
    assert per_doc == 2
    tiers = {r["bucket"]: r for r in rep.collect()}
    assert tiers[3]["n_docs"] == 2
    assert tiers[3]["n_tokens_total"] == 0  # the tail IS the empties
    assert tiers[1]["n_docs"] == 3 and tiers[2]["n_docs"] == 3


def test_compact_index_cap_prefers_landed_ids(spark, tmp_path):
    """ADVICE r9: under group tracking the index also holds DROPPED
    docs' rows; the compaction cap must keep LANDED survivors' witness
    rows over lower-id dropped rows in a hot bucket (default lowest-id
    would evict them and silently lower cross-batch screen recall).
    Within each preference class the lowest-id rule is unchanged, so
    the result is still deterministic."""
    text = "identical duplicate document text repeated many times over " * 3
    idx_path = str(tmp_path / "hot_index_pref")
    for lo in (0, 100, 200):
        batch = spark.createDataFrame(
            [(lo + i, text) for i in range(4)], ["doc_id", "text"]
        )
        dedup_ops.minhash_index(batch, max_bucket_size=4).write.mode(
            "append"
        ).parquet(idx_path)
    landed = spark.createDataFrame(
        [(201,), (202,), (103,)], ["doc_id"]
    )
    dedup_ops.compact_minhash_index(
        spark, idx_path, max_bucket_size=4, prefer_ids=landed
    )
    compacted = spark.read.parquet(idx_path)
    assert (
        compacted.groupBy("band", "bucket")
        .count()
        .agg(F.max("count"))
        .first()[0]
        <= 4
    )
    # all three landed ids survive every bucket's cap; the remaining
    # slot goes to the lowest dropped id — deterministic as before.
    assert {
        r["id"] for r in compacted.select("id").distinct().collect()
    } == {103, 201, 202, 0}


def _literal_bpe_learn(texts, n_merges):
    """Reference BPE trainer (Sennrich et al. 2016 learn_bpe): greedy
    corpus-weighted pair argmax + left-to-right re-segmentation, ties
    broken (count DESC, pair ASC) like the operator."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                vocab[w] += 1
    segs = {w: list(w) for w in vocab}
    out = []
    for rank in range(n_merges):
        stats = Counter()
        for w, cnt in vocab.items():
            u = segs[w]
            for i in range(len(u) - 1):
                stats[(u[i], u[i + 1])] += cnt
        if not stats:
            break
        (a, b), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, a, b, c))
        for w in vocab:
            u = segs[w]
            new, i = [], 0
            while i < len(u):
                if i < len(u) - 1 and u[i] == a and u[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(u[i])
                    i += 1
            segs[w] = new
    return out, segs


def test_bpe_learn_merges_matches_literal_python(spark):
    """bpe_learn_merges (q162, VERDICT r9 item 4) == the literal
    Sennrich trainer on an adversarial fixture: overlapping pairs
    ('aaaa' — greedy left-to-right must yield 2 merges, not 3 counted
    as mergeable), merged symbols re-pairing in later rounds
    ('el'+'l', 'h'+'el'), count ties resolved by pair order,
    single-char and repeated tokens, and a unit whose SUFFIX equals
    the merge's left side ('xal'+'l' must NOT fake a ('l','l')
    match)."""
    from big_data_ml_pipeline_spark.operators.text import (
        bpe_encode,
        bpe_learn_merges,
    )

    texts = [
        "aaaa aaaa aa hello hello hell help",
        "xall xall ll ll banana band bands",
        "a b ab ab abab",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [
        (r["merge_rank"], r["a"], r["b"], r["pair_count"])
        for r in bpe_learn_merges(df, n_merges=10)
        .orderBy("merge_rank")
        .collect()
    ]
    expect, final_segs = _literal_bpe_learn(texts, 10)
    assert got == expect

    # chain invariant: encoding the SAME corpus with the learned table
    # reproduces the trainer's final segmentation word for word.
    merges = [(a, b) for _, a, b, _ in expect]
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, merges).collect()
    }
    for i, t in enumerate(texts):
        expect_units = []
        for w in t.lower().split():
            expect_units.extend(final_segs[w])
        assert enc[i] == expect_units, i


def test_bpe_learn_merges_batched_equals_sequential(spark):
    """bpe_learn_merges(batch_size=M) == the sequential trainer
    (VERDICT r16 item 4): the provably-safe batch rule (symbol-
    disjoint prefix, concat-collision guard, strict-above-cut) must
    yield the IDENTICAL merge table — ranks, pairs, and counts — on
    the adversarial fixture (overlaps, re-pairing merged symbols,
    ties) and on a wide corpus where batches genuinely fire, at
    several batch sizes; batch_size=1 stays byte-identical to the
    sequential anchor (q162's oracle) and rounds genuinely shrink."""
    from big_data_ml_pipeline_spark.operators.text import bpe_learn_merges

    adversarial = [
        "aaaa aaaa aa hello hello hell help",
        "xall xall ll ll banana band bands",
        "a b ab ab abab",
    ]
    # Wide fixture: many frequent DISJOINT pairs with distinct counts
    # — the shape where batching pays (real corpora are Zipfian but
    # wide at the character-pair level).
    wide = [
        " ".join(
            ["qu"] * 40 + ["er"] * 36 + ["ty"] * 32 + ["io"] * 28
            + ["pl"] * 24 + ["km"] * 20 + ["vb"] * 16 + ["xz"] * 12
        ),
        "quer tyio plkm vbxz quer tyio",
    ]
    for texts in (adversarial, wide):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        want = [
            tuple(r)
            for r in bpe_learn_merges(df, n_merges=10)
            .orderBy("merge_rank").collect()
        ]
        for m in (2, 4, 10):
            stats: dict = {}
            got = [
                tuple(r)
                for r in bpe_learn_merges(
                    df, n_merges=10, batch_size=m, batch_stats=stats
                ).orderBy("merge_rank").collect()
            ]
            assert got == want, (texts is wide, m)
            assert stats["rounds"] <= 10
            if texts is wide:
                # Batching genuinely fires on the wide corpus.
                assert stats["rounds"] < 10, (m, stats)
                assert max(stats["batch_sizes"]) > 1, (m, stats)


def test_bpe_learn_merges_stops_when_exhausted(spark):
    """A corpus whose every token is a single character has no pair to
    merge anywhere after... immediately: the learner emits zero rows
    short of crashing — and validates n_merges."""
    import pytest as _pytest

    from big_data_ml_pipeline_spark.operators.text import bpe_learn_merges

    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "c a b")], ["doc_id", "text"]
    )
    rows = bpe_learn_merges(df, n_merges=5).collect()
    assert rows == []
    with _pytest.raises(ValueError, match="n_merges"):
        bpe_learn_merges(df, n_merges=0)
