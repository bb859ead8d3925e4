"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting, Gopher-style repetition stats, PII redaction.

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
    "repetition_stats",
    "redact_pii",
    "ws_tokens_expr",
    "word_ngrams_expr",
    "word_ngrams_from_tokens_expr",
    "EMAIL_PATTERN",
    "IPV4_PATTERN",
    "LONGNUM_PATTERN",
]


def ws_tokens_expr(text_col: str, null_as_empty: bool = False):
    """The canonical whitespace tokenization shared by every operator
    that counts or enumerates tokens (token_stats, bpe_token_stats,
    quality_exprs, repetition_stats, sequence packing): split on single
    spaces, drop empty strings.  Changing it here changes ALL of them —
    and every DuckDB oracle built on
    ``list_filter(string_split(text, ' '), x -> x <> '')`` must follow.
    ``null_as_empty=True`` coalesces NULL text to zero tokens (operators
    whose arithmetic must stay total, e.g. packing offsets); the default
    propagates NULL like SQL."""
    src = F.col(text_col)
    if null_as_empty:
        src = F.coalesce(src, F.lit(""))
    return F.filter(F.split(src, " "), lambda t: t != "")


def word_ngrams_expr(text_col: str, n: int):
    """Array of space-joined word ``n``-grams over the canonical
    whitespace tokenization (`ws_tokens_expr`, NULL text -> empty).
    Shared by repetition_stats, decontamination, ExactSubstr, and DSIR
    so every side of a cross-corpus comparison grams identically.
    ANSI-safe: ``sequence(1, 0)`` would count DOWN, so short documents
    gate to an empty array.

    Each gram is ``concat_ws(slice(toks, i, n))`` — ONE reference to the
    token array per position.  The per-token ``element_at(toks, i+j)``
    form is ~8x slower end-to-end: the ``toks`` subexpression (a
    split+filter over the raw text) is not common-subexpression-
    eliminated inside a higher-order lambda, so n references re-run the
    tokenization n times per position."""
    if n < 1:
        raise ValueError(f"word_ngrams_expr requires n >= 1, got {n}")
    return word_ngrams_from_tokens_expr(
        ws_tokens_expr(text_col, null_as_empty=True), n
    )


def word_ngrams_from_tokens_expr(toks_col, n: int):
    """Word n-grams over an already-materialized token ARRAY column.

    Spark does not common-subexpression-eliminate across higher-order-
    function boundaries, so when :func:`word_ngrams_expr` embeds the
    tokenization expression directly, the split+filter re-runs once per
    gram position — O(positions) full tokenizations per document.  Hot
    callers should instead materialize the token array in its own
    projection (``df.select(ws_tokens_expr(c).alias("_toks"))``) and
    pass ``F.col("_toks")`` here: each slice is then O(n) array
    references.  CollapseProject keeps the two projections separate
    (the alias is referenced more than once and split is not cheap), so
    the materialization survives optimization.  Measured 4.5x on the
    DSIR featurization at sf0.1 (3.5 s -> 0.8 s for the explosion).
    """
    if n < 1:
        raise ValueError(f"word_ngrams_from_tokens_expr requires n >= 1, got {n}")
    positions = F.when(
        F.size(toks_col) >= n, F.sequence(F.lit(1), F.size(toks_col) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        positions, lambda i: F.concat_ws(" ", F.slice(toks_col, i, n))
    )


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_tokens, n_chars): whitespace token count + char length."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.size(ws_tokens_expr(text_col)).cast("long").alias("n_tokens"),
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
        F.size(ws_tokens_expr(text_col)).cast("long").alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), F.lit(0))
        ).cast("long").alias("n_bpe_tokens"),
    )


def quality_exprs(text_col: str) -> dict:
    """The quality feature expressions as named Columns, reusable inside
    larger single-projection pipelines (no forced intermediate select)."""
    toks = ws_tokens_expr(text_col)
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

    Staged projections (same expressions, same results as the one-shot
    :func:`lang_pred_expr`): the lowered token array materializes once,
    then the per-language stopword counts, then the argmax — the
    monolithic Column re-ran the regex split inside every language's
    filter lambda and every score twice more in the argmax chain (no
    CSE across higher-order functions).  Measured ~2x at sf0.1.
    """
    langs = sorted(_STOPWORDS)
    p_toks = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    ).select(
        "id",
        "_t",
        F.filter(
            F.split(F.lower(F.col("_t")), r"\s+"), lambda t: t != ""
        ).alias("_ltoks"),
    )
    score_cols = []
    for lang in langs:
        words = F.array(*[F.lit(w) for w in sorted(_STOPWORDS[lang])])
        score_cols.append(
            F.size(
                F.filter(F.col("_ltoks"), lambda t: F.array_contains(words, t))
            ).alias(f"_s_{lang}")
        )
    p_scores = p_toks.select(
        "id",
        (
            F.regexp_count(F.col("_t"), F.lit("[一-鿿]"))
            / F.greatest(F.length("_t"), F.lit(1))
        ).alias("_cjk"),
        F.size("_ltoks").alias("_ntoks"),
        *score_cols,
    )
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in langs])
    pred = F.when(F.col("_cjk") > 0.05, F.lit("zh")).when(
        (F.col("_ntoks") == 0) | (best == 0), F.lit("und")
    )
    # First max in sorted lang order — same tie-break as np.argmax.
    for lang in langs:
        pred = pred.when(F.col(f"_s_{lang}") == best, F.lit(lang))
    return p_scores.select("id", pred.alias("lang_pred"))


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
            F.explode(ws_tokens_expr(text_col)).alias("term"),
        )
    )
    terms.count()
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    doc_freq = (
        terms.distinct().groupBy("term").agg(F.count("*").alias("doc_freq"))
    )
    # N rides the scoring plan as a 1-row crossJoin instead of a
    # separate df.count() job — same value, same double arithmetic.
    totals = df.agg(F.count(F.lit(1)).cast("long").alias("_n_docs"))
    scored = tf.join(doc_freq, "term").crossJoin(totals).withColumn(
        "_s",
        F.col("tf")
        * F.log((F.col("_n_docs") + 1.0) / (F.col("doc_freq") + 1.0)),
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


def repetition_stats(
    df: DataFrame, text_col: str, id_col: str, n: int = 2
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1): per
    document, the fraction of duplicate lines, the fraction of characters
    inside duplicate line instances, and the most frequent word ``n``-gram
    with its character fraction.  Columns: (id, n_lines, n_dup_lines,
    dup_line_chars, line_chars, text_chars, dup_line_frac,
    dup_line_char_frac, top_ngram, top_ngram_count, top_ngram_char_frac).
    The integer columns are the exact numerators/denominators of the
    fractions — cross-engine comparisons should use those (ROUND on a
    dyadic-rational tie differs between Spark HALF_UP and IEEE
    half-even engines).  Ids must be unique per row.

    Line stats are pure JVM array expressions, zero shuffle: sort the
    non-blank lines, detect duplicates by comparing each element to its
    predecessor via a null-shifted ``zip_with`` (O(L log L) per row; any
    consistent sort groups equals, so engine sort-order differences cannot
    change the counts).  N-gram stats are explode -> two combiner-friendly
    aggregations: ``groupBy(id, gram).count`` then a per-id argmax via
    ``min(struct(-count, gram))`` (count desc, gram asc tie-break) — no
    window, no per-row quadratic scan, so a pathological document with
    millions of repeated grams costs one combiner row, not O(grams^2).
    The two branches join on id (both sides are one row per document).

    Documents with fewer than ``n`` tokens release count 0 and an empty
    top gram; documents with no non-blank lines release zero fractions.
    """
    if n < 2:
        raise ValueError(f"repetition_stats requires n >= 2, got {n}")
    did = F.col(id_col).cast("long").alias("id")

    # Every intermediate array (lines, sorted lines, dup flags) is
    # materialized in its own projection: higher-order functions are not
    # common-subexpression-eliminated, so referencing the `lines`
    # expression from five consumers re-ran the split+trim-filter five
    # times per row (and the fraction columns re-ran their numerator
    # aggregates).  CollapseProject keeps these projections separate —
    # each alias is referenced more than once and none is cheap.
    lines = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"),
        lambda x: F.trim(x) != "",
    )
    p_lines = df.select(
        did,
        F.length(F.coalesce(F.col(text_col), F.lit("")))
        .cast("long")
        .alias("text_chars"),
        lines.alias("_lines"),
    )
    p_sorted = p_lines.select(
        "id", "text_chars", "_lines", F.array_sort("_lines").alias("_slines")
    )
    # [null, s1, ..., s_{L-1}]: each element paired with its predecessor.
    shifted = F.slice(
        F.concat(F.array(F.lit(None).cast("string")), F.col("_slines")),
        1,
        F.greatest(F.size("_slines"), F.lit(1)),
    )
    p_flags = p_sorted.select(
        "id",
        "text_chars",
        "_lines",
        F.zip_with(
            F.col("_slines"),
            shifted,
            lambda cur, prev: F.when(
                prev.isNotNull() & (cur == prev), F.length(cur)
            ).otherwise(F.lit(-1)),
        ).alias("_dup_flags"),
    )
    p_counts = p_flags.select(
        "id",
        "text_chars",
        F.size("_lines").cast("long").alias("n_lines"),
        F.aggregate(
            F.col("_dup_flags"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.when(x >= 0, 1).otherwise(0),
        ).alias("n_dup_lines"),
        F.aggregate(
            F.col("_dup_flags"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.when(x >= 0, x).otherwise(0),
        ).alias("dup_line_chars"),
        F.aggregate(
            F.col("_lines"), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("line_chars"),
    )
    line_side = p_counts.select(
        "id",
        "n_lines",
        "n_dup_lines",
        "dup_line_chars",
        "line_chars",
        "text_chars",
        F.round(
            F.when(
                F.col("n_lines") > 0, F.col("n_dup_lines") / F.col("n_lines")
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("dup_line_frac"),
        F.round(
            F.when(
                F.col("line_chars") > 0,
                F.col("dup_line_chars") / F.col("line_chars"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("dup_line_char_frac"),
    )

    # No per-doc extras ride the explode: the char denominator already
    # sits on line_side as text_chars, so the hot (id, gram) shuffle
    # carries exactly (id, gram) and the fraction is computed post-join.
    exploded = df.select(
        did, ws_tokens_expr(text_col, null_as_empty=True).alias("_toks")
    ).select(
        "id",
        F.explode(word_ngrams_from_tokens_expr(F.col("_toks"), n)).alias("gram"),
    )
    counts = exploded.groupBy("id", "gram").agg(F.count("*").alias("cnt"))
    top = counts.groupBy("id").agg(
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("gram"))).alias("t"),
    )
    gram_side = top.select(
        "id",
        F.col("t.gram").alias("top_ngram"),
        (-F.col("t.nc")).cast("long").alias("top_ngram_count"),
    )
    return line_side.join(gram_side, "id", "left").select(
        "id",
        "n_lines",
        "n_dup_lines",
        "dup_line_chars",
        "line_chars",
        "text_chars",
        "dup_line_frac",
        "dup_line_char_frac",
        F.coalesce("top_ngram", F.lit("")).alias("top_ngram"),
        F.coalesce("top_ngram_count", F.lit(0)).cast("long").alias(
            "top_ngram_count"
        ),
        F.round(
            F.when(
                (F.col("text_chars") > 0) & F.col("top_ngram_count").isNotNull(),
                F.col("top_ngram_count")
                * F.length(F.col("top_ngram"))
                / F.col("text_chars"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("top_ngram_char_frac"),
    )


# PII patterns shared by Spark (Java regex) and the DuckDB oracle (RE2):
# no lookaround, no \d / \s shorthand (engines disagree on Unicode
# classes), explicit character classes only — identical matches in both.
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_PATTERN = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
LONGNUM_PATTERN = "[0-9]{7,}"


def redact_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Redact common PII shapes for training-data curation: emails ->
    ``<EMAIL>``, IPv4 literals -> ``<IP>``, 7+-digit runs (phone/account
    numbers) -> ``<NUM>``.  Columns: (id, redacted, n_emails, n_ips,
    n_longnums).

    Applied in that order so each later pattern sees the earlier
    redactions (an IP inside an email is counted once, as the email; the
    digit-run pass cannot re-match digits inside a redacted IP).  Counts
    are taken on the same intermediate the replacement runs on, so
    ``n_*`` is exactly the number of substitutions made.  One JVM
    projection — ``regexp_replace``/``regexp_count`` column expressions,
    no Python, no shuffle — so the operator is a zero-shuffle map at any
    scale and SQL-oracle-able.
    """
    t0 = F.coalesce(F.col(text_col), F.lit(""))
    n_emails = F.regexp_count(t0, F.lit(EMAIL_PATTERN))
    t1 = F.regexp_replace(t0, EMAIL_PATTERN, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(IPV4_PATTERN))
    t2 = F.regexp_replace(t1, IPV4_PATTERN, "<IP>")
    n_nums = F.regexp_count(t2, F.lit(LONGNUM_PATTERN))
    t3 = F.regexp_replace(t2, LONGNUM_PATTERN, "<NUM>")
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        t3.alias("redacted"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_nums.cast("long").alias("n_longnums"),
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
