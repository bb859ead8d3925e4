"""Corpus-trained bigram language-model quality scoring — the
CCNet-style "perplexity filter" shape (Wenzek et al. 2020,
arXiv:1911.00359 train a KenLM on a reference corpus and bucket
documents by perplexity; here the model is a pruned bigram table
trained distributively on a reference DataFrame, so the whole loop
stays inside Spark with no external model artifact).

Scale shape (100 TB): training is two combiner-friendly counts
(unigrams, bigrams) — map-side partials, one shuffle each — followed
by top-V / min-count pruning, which bounds the model size by
construction.  Scoring explodes each document's adjacent token pairs
and joins them against the pruned model; with the default
``broadcast_model=True`` that join is an explicit broadcast (the
pruned model is small by construction), so scoring costs ONE shuffle —
the per-document combiner re-aggregation — regardless of corpus size.
Set ``broadcast_model=False`` only if the pruned model is deliberately
huge; the join then shuffles on the bigram hash.

The scoring contract is integer-first: ``n_bigrams`` /
``n_known_bigrams`` / ``known_count_sum`` are exact integers
(cross-engine SQL-oracle-able); ``avg_logprob`` (add-one-smoothed
log2 P(w2|w1), the perplexity proxy used for bucketing) is a float
convenience column — filter on it, but oracle on the integers.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mgspark.pipeline.textstats import (
    word_ngrams_from_tokens_expr,
    ws_tokens_expr,
)

__all__ = ["BigramLM", "lm_train", "lm_score"]


@dataclass(frozen=True)
class BigramLM:
    """A pruned bigram model: two small DataFrames plus the smoothing
    denominator ingredients.  ``unigrams``: (tok, n) for the top-V
    vocabulary; ``bigrams``: (bg, n) with ``bg`` the space-joined pair,
    restricted to pairs whose BOTH tokens are in-vocabulary and whose
    count >= min_count.  ``vocab_size`` is the retained |V| (the
    add-one smoothing denominator uses V+1, counting an OOV bucket)."""

    unigrams: DataFrame
    bigrams: DataFrame
    vocab_size: int


def lm_train(
    ref: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    min_count: int = 2,
) -> BigramLM:
    """Train the pruned bigram model on a reference corpus.

    Vocabulary = top ``vocab_size`` tokens by count (ties broken by
    token string, so the model is deterministic at any parallelism);
    bigram table = adjacent in-vocabulary pairs with count >=
    ``min_count``.  Both tables are eagerly materialized via
    ``persist`` + count so the training scan never re-runs per scoring
    query."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    uni = (
        ref.select(F.explode(ws_tokens_expr(text_col, null_as_empty=True)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .persist()
    )
    vocab = uni.select("tok")
    bi = (
        ref.select(ws_tokens_expr(text_col, null_as_empty=True).alias("_toks"))
        .select(
            F.explode(word_ngrams_from_tokens_expr(F.col("_toks"), 2)).alias("bg")
        )
        .groupBy("bg")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
        .withColumn("_w1", F.substring_index("bg", " ", 1))
        .withColumn("_w2", F.substring_index("bg", " ", -1))
        .join(F.broadcast(vocab.withColumnRenamed("tok", "_w1")), "_w1", "left_semi")
        .join(F.broadcast(vocab.withColumnRenamed("tok", "_w2")), "_w2", "left_semi")
        .select("bg", "n")
        .persist()
    )
    # ONE heavy job: materializing the bigram table also materializes
    # the persisted vocabulary (its broadcast build executes uni's
    # plan), so the vocab-size count that follows is a cache read —
    # previously two sequential full-scan jobs.
    bi.count()
    kept_v = uni.count()
    return BigramLM(unigrams=uni, bigrams=bi, vocab_size=int(kept_v))


def lm_score(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document fluency features under the trained model:

    (id, n_bigrams, n_known_bigrams, known_count_sum, avg_logprob)

    - ``n_bigrams``: adjacent token pairs in the document (0 for docs
      with < 2 tokens — they still appear, with NULL avg_logprob).
    - ``n_known_bigrams``: pairs present in the pruned bigram table.
    - ``known_count_sum``: sum of the model counts of those pairs —
      with n_bigrams an exact-integer fluency proxy (higher = more of
      the document is made of common continuations).
    - ``avg_logprob``: mean add-one-smoothed log2 P(w2 | w1) =
      log2((c(w1,w2)+1) / (c(w1)+V+1)); unknown context w1 scores
      against c(w1)=0.  The CCNet-style bucketing key (more negative =
      less reference-like), rounded to 4 decimals.
    """
    maybe_b = F.broadcast if broadcast_model else (lambda d: d)
    doc_bg = docs.select(
        F.col(id_col).alias("id"),
        ws_tokens_expr(text_col, null_as_empty=True).alias("_toks"),
    ).select(
        "id",
        F.explode_outer(word_ngrams_from_tokens_expr(F.col("_toks"), 2)).alias("bg"),
    )
    uni_ctx = lm.unigrams.select(
        F.col("tok").alias("_ctx"), F.col("n").alias("_ctx_n")
    )
    joined = (
        doc_bg.join(maybe_b(lm.bigrams), "bg", "left")
        .withColumn("_ctx", F.substring_index("bg", " ", 1))
        .join(maybe_b(uni_ctx), "_ctx", "left")
    )
    logp = F.log2(
        (F.coalesce(F.col("n"), F.lit(0)) + 1)
        / (F.coalesce(F.col("_ctx_n"), F.lit(0)) + lm.vocab_size + 1)
    )
    return joined.groupBy("id").agg(
        F.count("bg").cast("long").alias("n_bigrams"),
        F.count("n").cast("long").alias("n_known_bigrams"),
        F.sum(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("known_count_sum"),
        F.round(F.avg(F.when(F.col("bg").isNotNull(), logp)), 4).alias("avg_logprob"),
    )
