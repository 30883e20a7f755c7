"""Property-based tests (hypothesis) for the trickiest custom operators.

Random inputs, independent Python/pandas oracles — these catch boundary
semantics (ties, tolerance edges, empty partitions) that fixed fixtures
miss.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_ml_pipeline_spark.functions import dsum
from big_data_ml_pipeline_spark.operators.joins import as_of_join
from big_data_ml_pipeline_spark.operators.dedup import word_shingles

BASE = datetime(2024, 1, 1)

_spark = None


@pytest.fixture(autouse=True)
def _cache_spark(spark):
    # hypothesis re-runs the test body many times; grab the session once
    global _spark
    _spark = spark


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left_offsets=st.lists(st.integers(0, 500), min_size=1, max_size=12),
    right_offsets=st.lists(st.integers(0, 500), min_size=0, max_size=8),
    tolerance=st.one_of(st.none(), st.integers(1, 300)),
)
def test_as_of_join_matches_pandas_merge_asof(left_offsets, right_offsets, tolerance):
    """as_of_join == pandas.merge_asof (direction='backward') for every
    random event layout, with and without tolerance."""
    left = pd.DataFrame({
        "uid": 1,
        "ts": [BASE + timedelta(seconds=s) for s in sorted(left_offsets)],
        "eid": range(len(left_offsets)),
    })
    right = pd.DataFrame({
        "uid": pd.Series([1] * len(right_offsets), dtype="int64"),
        "ts": pd.to_datetime(
            [BASE + timedelta(seconds=s) for s in sorted(right_offsets)]
        ),
        "px": pd.Series([float(s) for s in sorted(right_offsets)], dtype="float64"),
    })
    # merge_asof demands unique ordered keys on the right side
    right = right.drop_duplicates(subset=["ts"], keep="last")

    want = pd.merge_asof(
        left, right.drop(columns=["uid"]), on="ts",
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
        direction="backward",
    )

    sleft = _spark.createDataFrame(left)
    # explicit schema: an empty right side has no rows to infer from
    sright = _spark.createDataFrame(right, schema="uid long, ts timestamp, px double")
    got = (
        as_of_join(sleft, sright, ["uid"], "ts", ["px"],
                   tolerance_seconds=tolerance)
        .orderBy("eid").toPandas()
    )
    assert list(got["px_asof"].fillna(-1)) == list(want["px"].fillna(-1))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.decimals(min_value=-10000, max_value=10000, places=2).map(float),
    min_size=1, max_size=50,
))
def test_dsum_exact_for_two_decimal_values(vals):
    """dsum == exact decimal sum for any 2-decimal inputs, any
    partitioning (floats would drift; integer cents cannot)."""
    df = _spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(3)
    got = df.select(dsum(F.col("x")).alias("s")).first()["s"]
    want = round(sum(round(v * 100) for v in vals)) / 100.0
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=12))
def test_word_shingles_match_python(words):
    text = " ".join(words)
    df = _spark.createDataFrame([(text,)], ["text"])
    got = df.select(word_shingles(F.col("text"), 3).alias("sh")).first()["sh"]
    toks = [w for w in text.split() if w]
    want = list(dict.fromkeys(
        " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
    )) if len(toks) >= 3 else []
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left_offsets=st.lists(st.integers(0, 100), min_size=1, max_size=10),
    right_rows=st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 50)),  # (ts, tiebreak id)
        min_size=1, max_size=12, unique_by=lambda t: t[1],
    ),
)
def test_as_of_join_tiebreak_picks_max_id(left_offsets, right_rows):
    """With duplicate right timestamps, tiebreak_col must make the row
    with the LARGEST id win — checked against a per-row Python oracle."""
    from big_data_ml_pipeline_spark.operators.joins import as_of_join as aoj

    left = [(1, BASE + timedelta(seconds=s), i) for i, s in enumerate(sorted(left_offsets))]
    right = [(1, BASE + timedelta(seconds=s), float(tb), tb) for s, tb in right_rows]

    sleft = _spark.createDataFrame(left, "uid long, ts timestamp, eid long")
    sright = _spark.createDataFrame(right, "uid long, ts timestamp, px double, rid long")
    got = (
        aoj(sleft, sright, ["uid"], "ts", ["px"], tiebreak_col="rid")
        .orderBy("eid").toPandas()
    )

    def oracle(lts):
        cands = [(ts, tb) for (_, ts, _, tb) in right if ts <= lts]
        if not cands:
            return -1.0
        return float(max(cands)[1])

    want = [oracle(ts) for (_, ts, _) in left]
    assert list(got["px_asof"].fillna(-1)) == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=50, unique=True),
       parts=st.integers(1, 7))
def test_hash_split_matches_python_md5(keys, parts):
    """hash_split membership == a pure-Python md5 computation, for any
    repartitioning — the content-determinism contract."""
    import hashlib

    from big_data_ml_pipeline_spark.operators.setops import hash_split

    df = _spark.createDataFrame([(k,) for k in keys], "k long").repartition(parts)
    train, test = hash_split(df, ["k"])
    got_train = sorted(r["k"] for r in train.collect())
    got_test = sorted(r["k"] for r in test.collect())

    def bucket(k):
        # 'v' prefix = the non-NULL marker of hash_split's NULL-safe
        # key encoding (NULL keys encode as '~')
        h = hashlib.md5(f"v{k}|split-42".encode()).hexdigest()[:8]
        return int(h, 16) % 100

    want_train = sorted(k for k in keys if bucket(k) < 80)
    want_test = sorted(k for k in keys if bucket(k) >= 80)
    assert got_train == want_train and got_test == want_test


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20)).filter(lambda t: t[0] != t[1]),
    min_size=1, max_size=25,
))
def test_connected_components_match_union_find(edges):
    """Label propagation == a driver-side union-find on random graphs."""
    from big_data_ml_pipeline_spark.operators.dedup import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {v: find(v) for v in parent}

    df = _spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=st.lists(st.sampled_from(["aa", "Bb", "cC", "dd", "e"]),
                      min_size=0, max_size=20))
def test_ngram_repetition_matches_python(words):
    from big_data_ml_pipeline_spark.operators.text import ngram_repetition

    text = " ".join(words)
    df = _spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = ngram_repetition(df, n=3).first()
    toks = [w for w in text.lower().split() if w]
    grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
    total, distinct = len(grams), len(set(grams))
    assert got["n_ngrams"] == total
    assert got["n_distinct"] == distinct
    want = (total - distinct) / total if total else 0.0
    assert got["dup_frac"] == pytest.approx(want)
    assert 0.0 <= got["dup_frac"] < 1.0 or total == 0


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=st.lists(st.sampled_from(["the", "And", "fox", "RUN", "zq"]),
                      min_size=0, max_size=25))
def test_quality_rules_signals_match_python(words):
    from collections import Counter

    from big_data_ml_pipeline_spark.operators.text import quality_rules

    text = " ".join(words)
    df = _spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = quality_rules(df).first()
    toks = text.split()
    ltoks = text.lower().split()
    assert got["n_tokens"] == len(toks)
    if toks:
        assert got["mean_token_len"] == pytest.approx(
            sum(len(t) for t in toks) / len(toks))
        stop = sum(1 for t in ltoks if t in ("the", "a", "and", "of", "to"))
        assert got["stopword_frac"] == pytest.approx(stop / len(ltoks))
        assert got["distinct_ratio"] == pytest.approx(len(set(ltoks)) / len(ltoks))
        assert got["top_token_frac"] == pytest.approx(
            Counter(ltoks).most_common(1)[0][1] / len(ltoks))
    else:
        assert (got["mean_token_len"], got["top_token_frac"]) == (0.0, 0.0)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=10),
    min_size=1, max_size=5))
def test_self_contamination_flags_every_long_doc(docs):
    from big_data_ml_pipeline_spark.operators.dedup import ngram_contamination

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = _spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in ngram_contamination(df, df, n=3).collect()}
    assert set(out) == {i for i, _ in rows}
    for i, ws in enumerate(docs):
        r = out[i]
        assert 0 <= r["hit_grams"] <= r["n_grams"]
        assert 0.0 <= r["hit_frac"] <= 1.0
        if len(ws) >= 3:
            # every gram of a doc is in the eval set (it IS the eval set)
            assert r["hit_grams"] == r["n_grams"] and r["contaminated"]
        else:
            assert r["n_grams"] == 0 and not r["contaminated"]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from(["x", "y", "zz", "Q"]), min_size=0, max_size=8),
    min_size=1, max_size=4))
def test_unigram_loglik_matches_python(docs):
    import math
    from collections import Counter

    from big_data_ml_pipeline_spark.operators.text import unigram_loglik

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = _spark.createDataFrame(rows, ["doc_id", "text"])
    corpus = Counter(t for _, text in rows for t in text.lower().split())
    n_total = sum(corpus.values())
    q = {t: round(math.log10(c / n_total) * 1_000_000) for t, c in corpus.items()}
    out = {r["doc_id"]: r for r in unigram_loglik(df).collect()}
    for i, (_, text) in enumerate(rows):
        toks = text.lower().split()
        r = out[i]
        assert r["n_tokens"] == len(toks)
        want = sum(q[t] for t in toks) / 1_000_000 / len(toks) if toks else 0.0
        assert r["mean_logp"] == pytest.approx(want, abs=1e-9)
        assert r["mean_logp"] <= 0.0


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=30),
        min_size=1, max_size=6,
    ),
)
def test_winnowing_fingerprints_match_python(docs):
    """winnowing_fingerprints == a literal Python implementation of the
    Schleimer et al. selection (k=3 grams, w=4 windows, short-doc
    global-min rule) over random token lists, including the md5 gram
    hash."""
    import hashlib

    from big_data_ml_pipeline_spark.operators.text import winnowing_fingerprints

    k, w = 3, 4

    def md5_32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    want = set()
    for i, toks in enumerate(docs):
        grams = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
        hashes = [md5_32(g) for g in grams]
        if not hashes:
            continue
        if len(hashes) < w:
            fps = {min(hashes)}
        else:
            fps = {min(hashes[j:j + w]) for j in range(len(hashes) - w + 1)}
        want |= {(i, fp) for fp in fps}

    df = _spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in winnowing_fingerprints(df, k=k, w=w).collect()
    }
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=20),
        min_size=1, max_size=6,
    ),
)
def test_token_entropy_matches_python(docs):
    """token_entropy == the quantized Python Shannon entropy for every
    random corpus (including empty and single-token docs)."""
    import math as m
    from collections import Counter

    from big_data_ml_pipeline_spark.operators.text import token_entropy

    df = _spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    for i, toks in enumerate(docs):
        n = len(toks)
        counts = Counter(toks)
        ent_q = sum(
            round(-(c / n) * m.log2(c / n) * 1e9) for c in counts.values()
        ) if n else 0
        ent = ent_q / 1e9
        assert got[i]["n_tokens"] == n
        assert got[i]["n_distinct"] == len(counts)
        assert abs(got[i]["entropy_bits"] - (ent if n else 0.0)) < 1e-12
        if n > 1 and len(counts) > 1:
            want_norm = round(ent / m.log2(n) * 1e9) / 1e9
            assert abs(got[i]["norm_entropy"] - want_norm) < 1e-12
        else:
            assert got[i]["norm_entropy"] == 0.0
        assert 0.0 <= got[i]["norm_entropy"] <= 1.0 + 1e-9


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    corp=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=12),
        min_size=2, max_size=8,
    ),
    terms=st.lists(st.sampled_from("abcdef"), min_size=1, max_size=3,
                   unique=True),
)
def test_bm25_matches_python(corp, terms):
    """bm25_topk == a literal quantized-Okapi Python implementation
    (Lucene idf) for random corpora and query term sets."""
    import math as m

    from big_data_ml_pipeline_spark.operators.text import bm25_topk

    k1, b = 1.2, 0.75
    N = len(corp)
    sum_dl = sum(len(d) for d in corp)
    dfreq = {
        t: sum(1 for d in corp if t in d) for t in terms
    }
    want = {}
    for i, d in enumerate(corp):
        score_q = 0
        n_terms = 0
        for t in terms:
            tf = d.count(t)
            if tf == 0:
                continue
            n_terms += 1
            idf_q = round(
                m.log(1.0 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5)) * 1e6
            )
            denom = tf + k1 * (1.0 - b) + (k1 * b) * (len(d) * N) / sum_dl
            score_q += round((idf_q / 1e6) * (tf * (k1 + 1.0)) / denom * 1e6)
        if n_terms:
            want[i] = (n_terms, score_q / 1e6)

    df = _spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(corp)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in bm25_topk(df, tuple(terms), k=100, k1=k1, b=b).collect()
    }
    assert got.keys() == want.keys()
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    a=st.lists(st.sampled_from("abcde"), min_size=1, max_size=15),
    b=st.lists(st.sampled_from("abcde"), min_size=1, max_size=15),
)
def test_source_divergence_matches_python_jsd(a, b):
    """source_divergence == the quantized Python Jensen-Shannon
    divergence for any two random sources sharing >= 1 token
    (the no-shared-token case legitimately emits no row)."""
    import math as m
    from collections import Counter

    from big_data_ml_pipeline_spark.operators.text import source_divergence

    ca, cb = Counter(a), Counter(b)
    shared = set(ca) & set(cb)
    df = _spark.createDataFrame(
        [(1, " ".join(a), "sa"), (2, " ".join(b), "sb")],
        ["doc_id", "text", "source"],
    )
    rows = source_divergence(df).collect()
    if not shared:
        assert rows == []
        return
    (r,) = rows
    na, nb = len(a), len(b)
    jsd_q = pa_q = pb_q = 0
    for t in shared:
        pa, pb = ca[t] / na, cb[t] / nb
        mm = (pa + pb) / 2.0
        jsd_q += round((0.5 * pa * m.log2(pa / mm)
                        + 0.5 * pb * m.log2(pb / mm)) * 1e9)
        pa_q += round(pa * 1e9)
        pb_q += round(pb * 1e9)
    want = (jsd_q + 0.5 * (2e9 - pa_q - pb_q)) / 1e9
    assert r["n_shared_tokens"] == len(shared)
    assert abs(r["jsd_bits"] - want) < 1e-12
    assert -1e-9 <= r["jsd_bits"] <= 1.0 + 1e-9  # JSD in bits is [0, 1]


def _py_duplicate_spans(docs, k, min_len, scope):
    """Literal Python twin of text.duplicate_spans (both scopes)."""
    grams = {}
    for did, toks in docs.items():
        for p in range(len(toks) - k + 1):
            g = " ".join(toks[p:p + k])
            grams.setdefault(g, []).append((did, p))
    spans = set()
    for did, toks in docs.items():
        if scope == "cross_doc":
            hits = [
                p for p in range(len(toks) - k + 1)
                if (lambda occ: len({d for d, _ in occ}) >= 2
                    and min(d for d, _ in occ) != did)(
                    grams[" ".join(toks[p:p + k])])
            ]
        else:
            hits = [
                p for p in range(len(toks) - k + 1)
                if min(q for d, q in grams[" ".join(toks[p:p + k])]
                       if d == did) < p
            ]
        run = []
        for p in hits + [None]:
            if run and (p is None or p - run[-1] > k):
                s, e = run[0], run[-1] + k - 1
                if e - s + 1 >= min_len:
                    spans.add((did, s, e, e - s + 1))
                run = []
            if p is not None:
                run.append(p)
    return spans


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=30),
        min_size=1, max_size=6,
    ),
    k=st.integers(2, 4),
    scope=st.sampled_from(["cross_doc", "within_doc"]),
)
def test_duplicate_spans_match_literal_python(docs, k, scope):
    """duplicate_spans == the literal Python implementation for random
    highly-repetitive token streams (4-letter alphabet maximizes gram
    collisions within and across docs), both scopes, arbitrary k."""
    from big_data_ml_pipeline_spark.operators.text import duplicate_spans

    corpus = {i: list(ws) for i, ws in enumerate(docs)}
    min_len = k + 1
    expected = _py_duplicate_spans(corpus, k, min_len, scope)
    df = _spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in corpus.items()],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(
            df, k=k, min_len=min_len, scope=scope
        ).collect()
    }
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=1, max_size=18,
    ),
    cut1=st.integers(0, 18),
    cut2=st.integers(0, 18),
)
def test_incremental_components_match_union_find(edges, cut1, cut2):
    """Chained update_components over an ARBITRARY 3-way split of a
    random edge list == a driver-side union-find over the whole list —
    the incremental merge is order- and batching-independent. The
    delta variant must agree: resolving state ∪ delta latest-wins at
    each step reproduces the same final labels."""
    from big_data_ml_pipeline_spark.operators.dedup import (
        update_components,
        update_components_delta,
    )

    a, b = sorted([min(cut1, len(edges)), min(cut2, len(edges))])
    chunks = [c for c in (edges[:a], edges[a:b], edges[b:]) if c]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {v: find(v) for v in parent}

    state = None
    resolved: dict = {}
    for chunk in chunks:
        cdf = _spark.createDataFrame(chunk, "id_a long, id_b long")
        delta = update_components_delta(state, cdf)
        resolved.update(
            {r["id"]: r["comp"] for r in delta.collect()}
        )
        state = update_components(state, cdf).localCheckpoint(eager=True)
    got = {r["id"]: r["comp"] for r in state.collect()}
    assert got == want
    assert resolved == want


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n=st.integers(min_value=40, max_value=120),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_opq_alternation_monotone_and_orthogonal(seed, n):
    """fit_opq_rotation_np's structural guarantees on ARBITRARY data
    (Ge 2013): the returned rotation is orthogonal to machine
    precision, the OPQ codebook shapes match the plain-PQ ones, and —
    because the alternation starts at (I, plain-PQ) and every step is
    non-increasing — the OPQ training-sample distortion never exceeds
    the plain-PQ distortion. Pure numpy; no Spark session."""
    import numpy as np

    from big_data_ml_pipeline_spark.operators.similarity import (
        fit_opq_rotation_np,
    )

    dim, m, k = 16, 4, 4
    rng = np.random.default_rng(seed)
    # Mix of isotropic noise and a low-rank structured component so
    # both regimes (rotation helps / rotation neutral) are exercised.
    basis = rng.normal(size=(3, dim))
    X = rng.normal(size=(n, 3)) @ basis + 0.3 * rng.normal(size=(n, dim))
    R, opq_cbs, pq_cbs = fit_opq_rotation_np(
        X.tolist(), m=m, k=k, seed=7, n_iter=4, kmeans_iter=8
    )
    Rm = np.array(R)
    assert abs(Rm @ Rm.T - np.eye(dim)).max() < 1e-10
    assert len(opq_cbs) == len(pq_cbs) == m
    assert all(len(cb) == k and len(cb[0]) == dim // m for cb in opq_cbs)

    def dist(V, cbs):
        total = 0.0
        d = dim // m
        for j in range(m):
            sub = V[:, j * d:(j + 1) * d]
            C = np.array(cbs[j])
            total += ((sub[:, None, :] - C[None]) ** 2).sum(-1).min(1).sum()
        return total

    d_pq = dist(X, pq_cbs)
    d_opq = dist(X @ Rm.T, opq_cbs)
    assert d_opq <= d_pq * (1 + 1e-9), (d_opq, d_pq)


def test_lloyd_kmeans_empty_cluster_reseeds_distinct():
    """ADVICE r15: simultaneously-empty clusters must reseed to
    DISTINCT high-distance points, not all collapse onto one farthest
    point (duplicate centroids). Fixture: two duplicated points seed
    four centroids, so two clusters go empty in the first assignment;
    the two far points must both become centroids."""
    import numpy as np

    from big_data_ml_pipeline_spark.operators.similarity import (
        _lloyd_kmeans_np,
    )

    X = np.array(
        [[0.0, 0.0], [0.0, 0.0], [10.0, 10.0], [10.0, 10.0],
         [0.0, 10.0], [10.0, 0.0]]
    )
    seed = next(
        s for s in range(500)
        if set(
            np.random.default_rng(s).choice(len(X), size=4, replace=False)
        ) == {0, 1, 2, 3}
    )
    C = _lloyd_kmeans_np(X, k=4, seed=seed, n_iter=1)
    cents = {tuple(np.round(c, 9)) for c in C}
    assert len(cents) == 4
    assert (0.0, 10.0) in cents and (10.0, 0.0) in cents
