"""Model-based quality filtering (CCNet / DataComp-LM composition).

Rule signals and LM proxies (operators/text.py) score documents with
hand-set thresholds; modern pipelines (Wenzek et al. 2020 §4.3 CCNet;
Li et al. 2024 DataComp-LM) instead TRAIN a classifier on weak labels
drawn from the corpus's own quality extremes — head-tier documents as
positives, tail-tier as negatives — and keep documents the model
scores as head-like. This module is that composition, built entirely
from pieces that already carry oracle twins or parity tests:

  features  = q103's Gopher/C4 rule signals + q106's corpus-unigram
              LM proxy (quality_rules / unigram_loglik)
  weak labels = q159's per-language NTILE head/tail tiers
              (ccnet_buckets' ordering rule, applied per document)
  model     = M9 LogisticRegression (ml/models.py registry — the
              reference's estimator table, src/ml_pipeline.py:129-135)

Scale shape: the feature pass is q103+q106 (map-only signals, one
vocab shuffle + one id shuffle for the LM proxy); tier labeling adds
ONE per-language window (never a global sort); training fits on the
two extreme tiers only (≤ 2/n_buckets of the corpus); scoring is a
single model.transform map over the feature table — no additional
shuffle at any corpus size.

The classifier's probabilities are iterative-solver floats, so the
scoring query is rows-only on the driver surface; correctness is
pinned by pytest invariants instead (AUC floor on a planted-quality
corpus, exact row preservation, head-tier mean score > tail-tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.text import (
    quality_rules,
    unigram_loglik,
    unigram_loglik_from_counts,
)

#: The six model features — q103's five rule signals + q106's proxy.
QUALITY_FEATURES = [
    "n_tokens",
    "mean_token_len",
    "stopword_frac",
    "distinct_ratio",
    "top_token_frac",
    "mean_logp",
]


def quality_feature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = None,
    lm_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-document feature table: (id[, lang], *QUALITY_FEATURES).

    Deterministic (each feature is an exact-integer division or the
    quantized-integer LM mean), exactly one row per input document —
    empty documents score 0.0 everywhere, never NULL, so the
    downstream assembler never drops rows. ``lm_counts`` (a (token,
    cnt) table, e.g. the streaming vocabulary summary) scores the LM
    proxy under an EXTERNAL unigram model instead of the frame's own
    distribution — the right form when scoring a small batch against
    the corpus-so-far model."""
    keep_cols = [id_col] + ([lang_col] if lang_col else [])
    sigs = quality_rules(
        df.select(*keep_cols, text_col), text_col=text_col
    ).select(
        *keep_cols,
        "n_tokens",
        "mean_token_len",
        "stopword_frac",
        "distinct_ratio",
        "top_token_frac",
    )
    lm = (
        unigram_loglik_from_counts(
            df, lm_counts, text_col=text_col, id_col=id_col
        )
        if lm_counts is not None
        else unigram_loglik(df, text_col=text_col, id_col=id_col)
    ).select(id_col, "mean_logp")
    return sigs.join(lm, on=id_col)


def _tier_labels(
    feats: DataFrame,
    id_col: str,
    lang_col: str | None,
    n_buckets: int,
) -> DataFrame:
    """q159's tier rule per document: NTILE over (has-tokens DESC,
    mean_logp DESC, id ASC) within each language (one window per
    language — ccnet_buckets' exact ordering, empty docs sink to the
    tail). Returns only the two extreme tiers with ``label`` 1.0
    (head) / 0.0 (tail) — the weak-label training set."""
    part = (
        F.col(lang_col)
        if lang_col
        # Non-foldable single-partition key: a lit(0) would be
        # constant-folded OUT of the partition spec (WindowExec
        # warning + whole-corpus single reducer was the r8 lesson);
        # pmod(n_tokens, 1) survives and hashes everything together
        # only when no language column exists.
        else F.pmod(F.col("n_tokens"), F.lit(1))
    )
    w = Window.partitionBy(part).orderBy(
        (F.col("n_tokens") > 0).desc(),
        F.col("mean_logp").desc(),
        F.col(id_col).asc(),
    )
    tiered = feats.withColumn("__tier", F.ntile(n_buckets).over(w))
    return tiered.filter(
        F.col("__tier").isin(1, n_buckets)
    ).withColumn(
        "label",
        F.when(F.col("__tier") == 1, F.lit(1.0)).otherwise(F.lit(0.0)),
    )


def fit_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = None,
    n_buckets: int = 3,
    max_iter: int = 100,
    reg_param: float = 0.01,
    lm_counts: DataFrame | None = None,
):
    """Train the CCNet-style quality classifier on this corpus's own
    head-vs-tail tiers and return the fitted PipelineModel (assembler
    + M9 LogisticRegression) — persistable with ml.train.save_model
    and reusable as a streaming-ingest gate (score arriving batches
    without retraining). ``n_buckets`` controls tier width (3 → train
    on the top and bottom thirds; larger values train on sharper
    extremes)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler

    from .models import build_estimator

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    feats = quality_feature_table(df, text_col, id_col, lang_col, lm_counts)
    train = _tier_labels(feats, id_col, lang_col, n_buckets)
    # A corpus too small for its tier count (or an all-identical one)
    # can leave one weak-label class empty; the LR fit would fail with
    # an opaque solver error — name the cause instead. One tiny agg on
    # the (already ≤2/n_buckets-sized) training slice.
    if train.select("label").distinct().count() < 2:
        raise ValueError(
            "quality classifier: head and tail tiers did not "
            "yield two label classes — corpus too small or degenerate "
            f"for n_buckets={n_buckets}"
        )
    # handleInvalid="error": the features are non-NULL by construction
    # (0.0 sentinels for empty docs) — a dropped row here would break
    # the one-row-per-document contract silently.
    va = VectorAssembler(
        inputCols=QUALITY_FEATURES,
        outputCol="features",
        handleInvalid="error",
    )
    lr = build_estimator(
        "logistic_regression",
        "classification",
        label_col="label",
        max_iter=max_iter,
        reg_param=reg_param,
    )
    return Pipeline(stages=[va, lr]).fit(train)


def score_quality(
    model,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_threshold: float = 0.5,
    lm_counts: DataFrame | None = None,
) -> DataFrame:
    """Score EVERY document under a fitted quality classifier: exactly
    one row per input — (id_col, p_head, keep) with ``p_head`` =
    P(head-like | features) and ``keep = p_head >= keep_threshold``.
    The feature pass recomputes the same deterministic table the
    trainer used; pass the training corpus's vocabulary summary as
    ``lm_counts`` when scoring a SMALL batch (a batch-local unigram
    proxy is meaningless at a few hundred rows)."""
    from pyspark.ml.functions import vector_to_array

    feats = quality_feature_table(df, text_col, id_col, None, lm_counts)
    scored = model.transform(feats)
    return scored.select(
        F.col(id_col),
        F.element_at(vector_to_array(F.col("probability")), 2).alias(
            "p_head"
        ),
    ).withColumn("keep", F.col("p_head") >= F.lit(keep_threshold))


def quality_classifier_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = None,
    n_buckets: int = 3,
    keep_threshold: float = 0.5,
    max_iter: int = 100,
    reg_param: float = 0.01,
) -> DataFrame:
    """One-shot train-and-score (the q160 driver surface):
    :func:`fit_quality_classifier` on the corpus's own tiers, then
    :func:`score_quality` over every document."""
    model = fit_quality_classifier(
        df, text_col, id_col, lang_col, n_buckets, max_iter, reg_param
    )
    return score_quality(model, df, text_col, id_col, keep_threshold)
