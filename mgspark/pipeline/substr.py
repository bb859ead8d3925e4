"""Exact substring (duplicate-span) detection: find every ``w``-token
window whose exact token sequence occurs at least ``min_count`` times
across the corpus, merge overlapping/adjacent duplicated windows into
per-document spans, and optionally strip those spans from the text —
the ExactSubstr deduplication of Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better" (arXiv:2107.06499, §4.1;
the paper uses 50-BPE-token windows over a suffix array; here the unit
is the canonical whitespace token and the duplicated-window index is a
distributed hash count, which finds exactly the same >= w-token
repeated substrings without a global suffix-array build).

Scale shape (100 TB corpus): the corpus gram relation is the one big
intermediate — ``tokens_per_doc`` rows/doc, 8 bytes of key after
``xxhash64`` hashing.  It is aggregated with a combiner-friendly
count (map-side partials), filtered to the duplicated keys (a small
fraction of all windows at real dup rates), and joined back — AQE
turns that join broadcast whenever the duplicated-key set is small.
The span merge is gaps-and-islands over ONE exchange + ONE sort per
document (lag + running sum share the same window spec).  Nothing is
ever collected to the driver.

``hash_grams=True`` (the scale default) counts windows by
``xxhash64`` — a 2^-64 per-pair collision can only merge two distinct
windows and OVER-flag, the safe direction for dedup.  The string-keyed
variant stays for exact cross-engine oracling (same contract as
`pipeline.decontam`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mgspark.pipeline.textstats import (
    word_ngrams_from_tokens_expr,
    ws_tokens_expr,
)

__all__ = ["dup_window_positions", "dup_spans", "dup_span_stats", "remove_dup_spans"]


def dup_window_positions(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 13,
    min_count: int = 2,
    hash_grams: bool = True,
) -> DataFrame:
    """(id, pos) for every 1-based token position starting a ``w``-token
    window whose token sequence occurs >= ``min_count`` times in the
    corpus (occurrences counted globally, INCLUDING repeats within one
    document — a doc that repeats its own boilerplate is flagged)."""
    if w < 1:
        raise ValueError(f"dup_window_positions requires w >= 1, got {w}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    # Tokenize once per row in its own projection — the w-token window
    # strings are then O(w) slices of the materialized array instead of
    # re-splitting the text once per window position (see
    # word_ngrams_from_tokens_expr).
    grams = docs.select(
        F.col(id_col).alias("id"),
        ws_tokens_expr(text_col, null_as_empty=True).alias("_toks"),
    ).select(
        "id",
        F.posexplode(
            word_ngrams_from_tokens_expr(F.col("_toks"), w)
        ).alias("_p0", "gram"),
    ).select(
        "id",
        (F.col("_p0") + 1).alias("pos"),
        (F.xxhash64("gram") if hash_grams else F.col("gram")).alias("_wk"),
    )
    dup_keys = (
        grams.groupBy("_wk")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_wk")
    )
    return grams.join(dup_keys, "_wk").select("id", "pos")


def dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 13,
    min_count: int = 2,
    hash_grams: bool = True,
) -> DataFrame:
    """Merged duplicated spans per document: (id, span_start, span_end,
    span_tokens, n_windows), token positions 1-based inclusive.
    Overlapping and touching windows merge (a window starting exactly
    where the previous coverage ends extends the same span), so spans
    are maximal runs of tokens covered by duplicated windows.

    Plan: the join from `dup_window_positions`, then gaps-and-islands —
    ``lag`` and the running break-sum share one (id)-partitioned sort,
    so the merge costs one exchange + one sort; the per-span groupBy is
    a combiner aggregation on top.
    """
    marked = dup_window_positions(docs, text_col, id_col, w, min_count, hash_grams)
    by_pos = Window.partitionBy("id").orderBy("pos")
    # Window [pos, pos+w-1]; with positions sorted, coverage ends at
    # prev_pos + w - 1, so a new span starts when pos - prev_pos > w
    # (leaving >= 1 uncovered token between them).
    brk = F.when(F.col("pos") - F.lag("pos").over(by_pos) > w, 1).otherwise(0)
    islands = marked.withColumn("_island", F.sum(brk).over(by_pos))
    return (
        islands.groupBy("id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (w - 1)).alias("span_end"),
            F.count("*").cast("long").alias("n_windows"),
        )
        .select(
            "id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
            "n_windows",
        )
    )


def dup_span_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 13,
    min_count: int = 2,
    hash_grams: bool = True,
) -> DataFrame:
    """Per-document duplication summary, integer-only (exactly
    SQL-oracle-able): (id, n_dup_windows, n_spans, dup_tokens) for every
    document with at least one duplicated window.  ``dup_tokens`` is the
    size of the UNION of duplicated windows (merged spans), i.e. how
    many tokens ExactSubstr dedup would remove."""
    spans = dup_spans(docs, text_col, id_col, w, min_count, hash_grams)
    return spans.groupBy("id").agg(
        F.sum("n_windows").cast("long").alias("n_dup_windows"),
        F.count("*").cast("long").alias("n_spans"),
        F.sum("span_tokens").cast("long").alias("dup_tokens"),
    )


def remove_dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 13,
    min_count: int = 2,
    hash_grams: bool = True,
) -> DataFrame:
    """ExactSubstr dedup applied: rewrite ``text_col`` with every token
    covered by a duplicated span removed (remaining tokens re-joined by
    single spaces — the inverse of the canonical tokenization; original
    inter-token whitespace is not preserved).  Documents with no
    duplicated window pass through unchanged; all other columns are
    preserved.

    Unlike keep-one-per-cluster dedup this removes EVERY occurrence of
    a duplicated substring, matching arXiv:2107.06499 §4.1 ("we remove
    all but one" is their variant; removing all is the conservative
    form also discussed there — parameterize by dropping the span list
    for one member per cluster if keep-one semantics are needed).

    Plan: per-doc span lists are small (collect_list per id — bounded by
    tokens/w), joined LEFT onto the corpus on id; the rewrite is a pure
    JVM higher-order filter over the token array (no Python).
    """
    spans = dup_spans(docs, text_col, id_col, w, min_count, hash_grams)
    span_lists = spans.groupBy("id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = ws_tokens_expr(text_col, null_as_empty=True)
    cleaned = F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(
        F.concat_ws(
            " ",
            F.filter(
                toks,
                lambda t, i: ~F.exists(
                    F.col("_spans"),
                    lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
                ),
            ),
        )
    )
    out = docs.join(
        span_lists.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn(text_col, cleaned)
    return out.drop("_spans")
