"""DSIR-style data selection: importance resampling on hashed n-gram
features (Xie et al. 2023, arXiv:2302.03169).

Given a small TARGET corpus (the distribution you want more of — e.g.
curated high-quality text) and a large RAW corpus, DSIR (1) featurizes
every document as a bag of hashed word n-grams, (2) fits two bucketed
unigram-over-buckets models — target and raw, (3) scores each raw
document with the log importance weight ``sum_b cnt_doc(b) *
(log p_target(b) - log p_raw(b))``, and (4) resamples without
replacement proportionally to the weights (Gumbel top-k).

Scale shape (100 TB raw corpus):

* Featurization is one gram explosion per corpus — map-side, no
  shuffle until the combiner-friendly count aggregations.
* Each bucket model is exactly ``n_buckets`` rows (default 10 000) —
  both are BROADCAST to score documents; the only wide exchange in
  scoring is the per-doc combiner sum.
* Resampling is ``TakeOrdered``-shaped (sort + limit n), never a full
  global sort; the Gumbel keys are pure functions of (id, seed) via
  the same Knuth hash as :mod:`mgspark.pipeline.sampling`, so the
  selected set is identical at any cluster size and across retries.

The bucket hash is the first 8 hex chars of sha256 over the gram
string, mod ``n_buckets`` — chosen over xxhash64 because DuckDB
computes the identical value (``('0x' || substr(sha256(g),1,8))::
BIGINT``), making the integer feature sums exactly cross-engine
oracle-able.  sha256 per gram costs more CPU than xxhash64; scoring is
one pass and the gram relation is reused for both models, so the
portability is worth it (swap `_bucket_expr` for xxhash64+pmod if a
non-oracled deployment needs the cycles back).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mgspark.pipeline.sampling import sample_hash_expr
from mgspark.pipeline.textstats import (
    word_ngrams_from_tokens_expr,
    ws_tokens_expr,
)

__all__ = [
    "hashed_gram_buckets",
    "dsir_bucket_model",
    "dsir_log_weights",
    "dsir_resample",
]

_MOD = 1 << 32


def _bucket_expr(gram_col, n_buckets: int):
    """Portable bucket id in [0, n_buckets): sha256 prefix mod buckets.
    ``conv`` parses 8 hex chars (< 2^32, no sign issues); DuckDB's hex
    string cast computes the identical integer."""
    return (
        F.conv(F.substring(F.sha2(gram_col, 256), 1, 8), 16, 10).cast("long")
        % F.lit(int(n_buckets))
    ).alias("bucket")


def hashed_gram_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    keep_empty_docs: bool = False,
) -> DataFrame:
    """Per-document hashed-n-gram feature relation: one row per
    (id, bucket) with the doc's gram count in that bucket.  Grams are
    the union over ``ns`` of word n-grams (DSIR uses unigrams+bigrams);
    counts are raw occurrences, NOT distinct — a doc that repeats a
    phrase weighs it more, per the paper's bag-of-grams model.

    Map-side explode + one combiner-friendly count; output size is at
    most min(doc grams, n_buckets) rows per doc.

    ``keep_empty_docs=True`` switches to ``explode_outer`` so a
    gram-less document still yields one (id, NULL bucket, cnt=0) row —
    scoring uses this to keep every doc WITHOUT a corpus-size
    re-join against the id column (the aggregation itself carries
    docs through).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not ns:
        raise ValueError("ns must name at least one gram order")
    # Tokenize ONCE per row in its own projection; building the gram
    # arrays from the materialized token column keeps the split out of
    # the per-position lambda (see word_ngrams_from_tokens_expr).
    pre = df.select(
        F.col(id_col).cast("long").alias("id"),
        ws_tokens_expr(text_col, null_as_empty=True).alias("_toks"),
    )
    grams = F.flatten(
        F.array(
            *[word_ngrams_from_tokens_expr(F.col("_toks"), n) for n in ns]
        )
    )
    explode = F.explode_outer if keep_empty_docs else F.explode
    return (
        pre.select("id", explode(grams).alias("_gram"))
        .select(
            "id",
            F.when(
                F.col("_gram").isNotNull(), _bucket_expr(F.col("_gram"), n_buckets)
            ).alias("bucket"),
        )
        # a non-null gram always buckets non-null, so count("bucket")
        # is the gram count — and exactly 0 on the explode_outer row
        .groupBy("id", "bucket")
        .agg(F.count(F.col("bucket")).alias("cnt"))
    )


def dsir_bucket_model(
    df: DataFrame,
    text_col: str,
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Corpus-level bucket counts (bucket, cnt) — the unnormalized
    hashed-gram unigram model.  Exactly ``<= n_buckets`` rows however
    large the corpus: safe to broadcast, cheap to persist."""
    pre = df.select(
        ws_tokens_expr(text_col, null_as_empty=True).alias("_toks")
    )
    grams = F.flatten(
        F.array(
            *[word_ngrams_from_tokens_expr(F.col("_toks"), n) for n in ns]
        )
    )
    return (
        pre.select(F.explode(grams).alias("_gram"))
        .select(_bucket_expr(F.col("_gram"), n_buckets))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    smoothing: float = 1.0,
    target_predicate=None,
) -> DataFrame:
    """Score every raw document against the target distribution.

    Returns one row per raw doc:

    * ``id`` — the document id (cast long);
    * ``n_grams`` — total featurized grams (bigint);
    * ``target_count_sum`` / ``raw_count_sum`` — sums over the doc's
      grams of the corpus-level count of each gram's bucket in the
      target / raw model (bigint; integer-exact, cross-engine
      oracle-able);
    * ``log_weight`` — the DSIR log importance weight with add-
      ``smoothing`` Laplace smoothing on both models (double; use for
      :func:`dsir_resample`, keep out of hash-compared contracts).

    ONE scan of each corpus: the raw model is derived from the per-doc
    bucket relation (``groupBy(bucket)`` over it — no second gram
    explosion), and both models are materialized driver-side IN ONE
    JOB (they are ``<= n_buckets`` rows BY CONSTRUCTION — that bound,
    not the corpus size, is what reaches the driver) to fold their
    totals into the log-normalizer scalars, then re-broadcast as one
    relation for the scoring join.
    Docs with zero grams get ``n_grams = 0`` and ``log_weight = 0.0``
    (an empty product — importance 1 — rather than NULL, so downstream
    resampling never drops them silently); they ride through the
    feature relation as an ``explode_outer`` zero-count row, so the
    whole score is two combiner aggregations plus one broadcast join —
    no corpus-size re-join on the id column ever happens.

    ``target_predicate`` (instead of ``target``) declares the target
    corpus as a row filter over ``raw`` keyed on the featurized ``id``
    column — e.g. the deterministic hash-sample predicate.  The target
    model is then a second conditional sum over the SAME per-doc bucket
    relation: the target corpus is never gram-exploded or sha256-hashed
    a second time, halving the featurization work — the common
    "curated subset of the same corpus" DSIR deployment.  Identical
    counts to featurizing the subset separately (a doc's grams bucket
    the same way on either side).
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    if (target is None) == (target_predicate is None):
        raise ValueError("pass exactly one of target / target_predicate")
    from mgspark.cacheutil import transient_persist

    spark = raw.sparkSession
    doc_buckets = transient_persist(
        hashed_gram_buckets(
            raw, text_col, id_col, n_buckets, ns, keep_empty_docs=True
        )
    )
    if target_predicate is not None:
        models_pd = (
            doc_buckets.where(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(
                F.sum("cnt").cast("long").alias("_rcnt"),
                F.sum(F.when(target_predicate, F.col("cnt")).otherwise(F.lit(0)))
                .cast("long")
                .alias("_tcnt"),
            )
            .toPandas()
        )
    else:
        # Both models in ONE action: tag-and-union, then one groupBy —
        # a single driver round-trip instead of two sequential ones.
        raw_model = (
            doc_buckets.where(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.sum("cnt").cast("long").alias("_rcnt"))
        )
        target_model = dsir_bucket_model(target, text_col, n_buckets, ns).select(
            "bucket", F.lit(0).cast("long").alias("_rcnt"),
            F.col("cnt").cast("long").alias("_tcnt"),
        )
        models_pd = (
            raw_model.select("bucket", "_rcnt", F.lit(0).cast("long").alias("_tcnt"))
            .unionByName(target_model)
            .groupBy("bucket")
            .agg(
                F.sum("_rcnt").cast("long").alias("_rcnt"),
                F.sum("_tcnt").cast("long").alias("_tcnt"),
            )
            .toPandas()
        )
    t_total = int(models_pd["_tcnt"].sum()) if len(models_pd) else 0
    r_total = int(models_pd["_rcnt"].sum()) if len(models_pd) else 0
    t_log_z = math.log(t_total + smoothing * n_buckets)
    r_log_z = math.log(r_total + smoothing * n_buckets)
    models = F.broadcast(
        spark.createDataFrame(
            models_pd, "bucket long, _rcnt long, _tcnt long"
        )
    )
    # a NULL bucket (empty doc) matches nothing in the broadcast
    # side — its _tcnt/_rcnt coalesce to 0 and its cnt is already 0,
    # so it contributes exactly nothing while keeping the id alive
    joined = doc_buckets.join(models, "bucket", "left").select(
        "id",
        "cnt",
        F.coalesce(F.col("_tcnt"), F.lit(0)).alias("_tcnt"),
        F.coalesce(F.col("_rcnt"), F.lit(0)).alias("_rcnt"),
    )
    scored = joined.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.sum(F.col("cnt") * F.col("_tcnt"))
        .cast("long")
        .alias("target_count_sum"),
        F.sum(F.col("cnt") * F.col("_rcnt"))
        .cast("long")
        .alias("raw_count_sum"),
        F.sum(
            F.col("cnt")
            * (
                F.log(F.col("_tcnt") + F.lit(float(smoothing)))
                - F.lit(t_log_z)
                - F.log(F.col("_rcnt") + F.lit(float(smoothing)))
                + F.lit(r_log_z)
            )
        ).alias("log_weight"),
    )
    return scored.select(
        "id",
        "n_grams",
        "target_count_sum",
        "raw_count_sum",
        F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
    )


def dsir_resample(
    weights: DataFrame,
    n: int,
    seed: int = 0,
    id_col: str = "id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """Select ``n`` documents without replacement, proportionally to
    ``exp(weight_col)`` — the Gumbel top-k trick: rank by ``log_weight +
    Gumbel(0,1)`` and keep the top ``n``.

    The Gumbel draw is deterministic: ``u = (knuth_hash(id, seed) +
    0.5) / 2^32`` then ``g = -log(-log u)`` — a pure function of
    (id, seed), so the selected set is identical at any parallelism
    and across retries (same guarantee, same hash, as
    :func:`mgspark.pipeline.sampling.hash_sample`).  Plan is sort+limit
    (TakeOrdered at execution) — no global sort materializes.

    Ties in the key order break by id (descending keys, ascending id),
    making the result total-order deterministic even for equal weights.
    """
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    u = (sample_hash_expr(id_col, seed) + F.lit(0.5)) / F.lit(float(_MOD))
    gumbel = -F.log(-F.log(u))
    key = (F.col(weight_col) + gumbel).alias("_gumbel_key")
    return (
        weights.select("*", key)
        .orderBy(F.col("_gumbel_key").desc(), F.col(id_col).asc())
        .limit(int(n))
        .drop("_gumbel_key")
    )
