"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Everything — including the stopword/CJK language-ID heuristic — is pure
JVM column expressions (whole-stage codegen, SQL-oracle-able); the
``*_exprs`` helpers expose the raw Columns so composed pipelines fuse
into one projection.  Language ID accuracy is additionally checked in
pytest against the documents table's ``lang`` labels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

__all__ = [
    "token_stats",
    "bpe_token_stats",
    "BPE_TOKEN_PATTERN",
    "quality_score",
    "quality_exprs",
    "lang_id",
    "lang_pred_expr",
    "fingerprint",
    "tfidf_top_terms",
]


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_tokens, n_chars): whitespace token count + char length."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")).cast(
            "long"
        ).alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


# BPE-ish tokenizer regex (GPT-2-style, simplified): letter runs, single
# digits (BPE tokenizers split numbers), punctuation runs.  Explicit
# whitespace class — Java regex \s and RE2 \s disagree on \x0B, and the
# pattern must evaluate identically in Spark and the DuckDB oracle.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]+"


def bpe_token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens): whitespace token count next to a
    BPE-ish regex token count — the pre-tokenization granularity an LLM
    pipeline budgets by.  Pure JVM ``regexp_extract_all`` (a
    CodegenFallback expression: interpreted JVM projection, still no
    Python anywhere in the scan), so it is SQL-oracle-able.  For space-delimited text n_bpe >= n_ws (the
    regex splits inside tokens, never across them) — except degenerate
    tokens made only of tab/newline characters, which count for n_ws but
    match no regex branch (the whitespace class is explicit because Java
    and RE2 disagree on \\s)."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")).cast(
            "long"
        ).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), F.lit(0))
        ).cast("long").alias("n_bpe_tokens"),
    )


def quality_exprs(text_col: str) -> dict:
    """The quality feature expressions as named Columns, reusable inside
    larger single-projection pipelines (no forced intermediate select)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text_col).cast("double")
    clean = F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9 ]", "")
    alpha_ratio = F.when(n_chars > 0, F.length(clean) / n_chars).otherwise(F.lit(0.0))
    mean_tok = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    score = F.round(
        alpha_ratio
        * F.when(n_tokens >= 10, F.lit(1.0)).otherwise(n_tokens / F.lit(10.0)),
        4,
    )
    return {
        "n_tokens": n_tokens,
        "alpha_ratio": F.round(alpha_ratio, 4),
        "mean_token_len": F.round(mean_tok, 4),
        "quality": score,
    }


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic quality features + score, all JVM expressions.

    Features: alpha ratio (alnum+space chars / chars), mean token length,
    token count.  Score: alpha_ratio clipped-scaled against degenerate
    docs; mirrors the SQL oracle exactly (integer counts, one division,
    round 4).
    """
    exprs = quality_exprs(text_col)
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        *[col.alias(name) for name, col in exprs.items()],
    )


# Tiny per-language stopword lists: enough signal for a heuristic
# classifier on the testdata languages.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "with", "as"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "eine", "zu", "im"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "dans", "que", "pour", "du"},
}


def lang_pred_expr(text_col: str):
    """The language-prediction Column, reusable inside larger
    single-projection pipelines."""
    langs = sorted(_STOPWORDS)
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    n_chars = F.greatest(F.length(F.coalesce(F.col(text_col), F.lit(""))), F.lit(1))
    cjk_ratio = F.regexp_count(
        F.coalesce(F.col(text_col), F.lit("")), F.lit("[一-鿿]")
    ) / n_chars

    score_cols = {}
    for lang in langs:
        words = F.array(*[F.lit(w) for w in sorted(_STOPWORDS[lang])])
        score_cols[lang] = F.size(F.filter(toks, lambda t: F.array_contains(words, t)))
    best = F.greatest(*[score_cols[lang] for lang in langs])

    pred = F.when(cjk_ratio > 0.05, F.lit("zh")).when(
        (F.size(toks) == 0) | (best == 0), F.lit("und")
    )
    # First max in sorted lang order — same tie-break as np.argmax.
    for lang in langs:
        pred = pred.when(score_cols[lang] == best, F.lit(lang))
    return pred


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: (id, lang_pred).

    Scores = count of tokens in each language's stopword list (argmax
    over counts equals argmax over fractions — shared denominator); CJK
    detection via the Unicode block ratio; 'und' fallback when no
    evidence.  Pure JVM column expressions (whole-stage codegen, no
    Python in the scan) — and therefore SQL-oracle-able.
    """
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        lang_pred_expr(text_col).alias("lang_pred"),
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Per-document TF-IDF keyterms: (id, term, tf, doc_freq, rank) for
    the top ``k`` terms by ``tf * ln((N+1)/(df+1))`` (smoothed idf),
    ties broken by term ascending.

    Pure DataFrame composition: explode -> (id, term) count -> term
    doc-frequency -> join -> per-document window top-k.  Shuffle story
    at scale: two combiner-friendly aggregations plus one join on term
    (the doc-frequency side is vocabulary-sized — broadcastable) and one
    window partitioned by document id.  The released columns are
    integers + the rank, so the result is engine-comparable without
    float stringification (the float score stays internal).
    """
    from pyspark.sql import Window

    from mgspark.cacheutil import transient_persist

    # The exploded terms feed BOTH the tf and doc-frequency branches
    # (different aggregates, so ReusedExchange cannot dedupe them);
    # persist to scan + explode the corpus once, not twice.
    terms = transient_persist(
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            ).alias("term"),
        )
    )
    terms.count()
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    doc_freq = (
        terms.distinct().groupBy("term").agg(F.count("*").alias("doc_freq"))
    )
    n_docs = df.count()
    scored = tf.join(doc_freq, "term").withColumn(
        "_s",
        F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("doc_freq") + 1.0)),
    )
    win = Window.partitionBy("id").orderBy(F.desc("_s"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(
            "id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Normalized content fingerprint: sha256 of lowercased,
    whitespace-collapsed text.  (id, fp string) — SQL-oracle-able."""
    normalized = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    )
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.sha2(normalized, 256).alias("fp"),
    )
