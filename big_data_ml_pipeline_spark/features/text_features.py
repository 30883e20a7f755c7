"""MLlib text-feature estimators (north-star extension).

The bridge from the corpus operators (operators/text.py — pure
Catalyst, oracle-checkable) to MLlib's estimator/transformer text
stack: tokenize → stopword-filter → n-gram → count-vectorize → IDF
as ONE Pipeline, plus a Word2Vec trainer — the in-engine path from
raw documents to bag-of-words / dense-embedding feature columns that
the ml/ estimators consume.

Reference parity: none (the reference has no text features at all);
this extends SURVEY.md §2h with the public `pyspark.ml.feature` text
surface. All distributed semantics are MLlib's own: CountVectorizer's
vocabulary build is a distributed count + top-k, IDF is one aggregate
over the term-frequency vectors, Word2Vec is the MLlib skip-gram
implementation (seeded here for reproducibility of the SHAPE —
embedding VALUES are still init/parallelism dependent, which is why
these stay pytest-checked rather than oracle-checked).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    NGram,
    RegexTokenizer,
    StopWordsRemover,
    Word2Vec,
)
from pyspark.sql import DataFrame


def build_text_pipeline(
    text_col: str = "text",
    vocab_size: int = 1 << 12,
    min_df: float = 1.0,
    ngram_n: int | None = None,
    stopwords: list[str] | None = None,
    output_col: str = "text_features",
) -> Pipeline:
    """Tokenize → stopword-filter → (optional n-gram) → CountVectorizer
    → IDF as one MLlib Pipeline producing ``output_col`` (a sparse
    TF-IDF vector ready for any ml/ estimator).

    RegexTokenizer uses the same ``\\s+`` split + lowercase as
    operators/text.tokens, so token identities line up with the
    Catalyst-side vocabulary (q109) and LM scores. Scale shape is
    MLlib's: vocabulary = one distributed count + top-``vocab_size``;
    each transform is map-only.
    """
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern=r"\s+",
        toLowercase=True,
    )
    stop = StopWordsRemover(
        inputCol="__tokens", outputCol="__filtered",
        stopWords=(
            list(stopwords) if stopwords is not None
            else StopWordsRemover.loadDefaultStopWords("english")
        ),
    )
    stages = [tok, stop]
    count_in = "__filtered"
    if ngram_n is not None:
        stages.append(NGram(n=ngram_n, inputCol="__filtered", outputCol="__grams"))
        count_in = "__grams"
    stages.append(
        CountVectorizer(
            inputCol=count_in, outputCol="__tf", vocabSize=vocab_size,
            minDF=min_df,
        )
    )
    stages.append(IDF(inputCol="__tf", outputCol=output_col))
    return Pipeline(stages=stages)


def fit_text_features(
    df: DataFrame,
    text_col: str = "text",
    **kwargs,
) -> tuple[PipelineModel, DataFrame]:
    """Fit :func:`build_text_pipeline` and return (model, transformed)
    with the intermediate working columns dropped."""
    model = build_text_pipeline(text_col=text_col, **kwargs).fit(df)
    out = model.transform(df).drop("__tokens", "__filtered", "__grams", "__tf")
    return model, out


def train_word2vec(
    df: DataFrame,
    text_col: str = "text",
    vector_size: int = 32,
    min_count: int = 1,
    seed: int = 42,
    output_col: str = "w2v",
):
    """Train MLlib Word2Vec on the corpus (whitespace-lowercase tokens,
    matching operators/text.tokens) and return (model, transformed) —
    transformed carries the per-document mean vector in ``output_col``,
    and ``model.getVectors()`` is the learned token-embedding table
    (the in-engine path to an `embeddings`-style column without an
    external model)."""
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern=r"\s+",
        toLowercase=True,
    )
    toked = tok.transform(df)
    w2v = Word2Vec(
        inputCol="__tokens", outputCol=output_col,
        vectorSize=vector_size, minCount=min_count, seed=seed,
    )
    model = w2v.fit(toked)
    return model, model.transform(toked).drop("__tokens")
