"""Benchmark decontamination: flag/drop training documents that share
word n-grams with an evaluation set (the GPT-3/PaLM-style 13-gram
overlap check; Brown et al. 2020 §C use n=13, min_overlap=1).

Scale shape (100 TB corpus vs ~MB-scale eval sets): the eval side —
distinct (bench_id, gram) — is tiny by construction, so it is
explicitly broadcast and the corpus side streams map-side against it:
the only wide exchange is the combiner-friendly per-(doc, bench) count
aggregation over MATCHED grams (a minuscule fraction of the corpus),
never a corpus-wide gram shuffle.  Both sides gram via the shared
`textstats.word_ngrams_expr`, so tokenization cannot drift between the
corpus and the eval set.

``hash_grams=True`` (the scale default) joins on ``xxhash64(gram)``
instead of the n-gram string — ~8 bytes per matched row instead of
~6*n, at a 2^-64 per-pair collision risk (a collision only ever
OVER-flags, which is the safe direction for decontamination).  The
string-join variant stays for exact cross-engine oracling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mgspark.pipeline.textstats import (
    word_ngrams_from_tokens_expr,
    ws_tokens_expr,
)

__all__ = ["contamination_report", "decontaminate"]


def _gram_relation(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    hash_grams: bool,
    widen: bool = False,
) -> DataFrame:
    # The corpus side is map-only into a broadcast join — no shuffle
    # ever widens it, so its parallelism is exactly the input split
    # count.  A small input (one parquet split) would run the CPU-heavy
    # gram explosion on one core; widen it to the cluster, gated so a
    # real at-scale input (splits >= cores) never pays a corpus shuffle.
    if widen:
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    # explode (not explode_outer): gram-less documents contribute no
    # rows, and word_ngrams_expr never emits NULL elements — important
    # because xxhash64 maps NULL to the seed, never to NULL, so a
    # post-hash null filter would not work.
    grams = df.select(
        F.col(id_col).alias("_cid"),
        ws_tokens_expr(text_col, null_as_empty=True).alias("_toks"),
    ).select(
        "_cid",
        F.explode(
            F.array_distinct(word_ngrams_from_tokens_expr(F.col("_toks"), n))
        ).alias("gram"),
    )
    if hash_grams:
        grams = grams.select("_cid", F.xxhash64("gram").alias("gram"))
    return grams


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 13,
    hash_grams: bool = True,
) -> DataFrame:
    """Per (document, benchmark item) overlap counts:
    (doc_id, bench_id, n_shared_grams) for every pair sharing at least
    one word ``n``-gram.  Grams are counted once per side (distinct
    within each document and each bench item).

    One corpus scan; the bench gram relation is broadcast (eval sets
    are small by definition — a bench too large to broadcast should be
    split and the reports unioned).
    """
    if n < 1:
        raise ValueError(f"contamination_report requires n >= 1, got {n}")
    if id_col == bench_id_col:
        raise ValueError(
            f"id_col and bench_id_col must differ (both {id_col!r}) — the "
            "report carries one column per side"
        )
    if "gram" in (id_col, bench_id_col):
        raise ValueError("'gram' is reserved for the join key column")
    doc_grams = _gram_relation(docs, text_col, id_col, n, hash_grams, widen=True)
    bench_grams = _gram_relation(bench, bench_text_col, bench_id_col, n, hash_grams)
    return (
        doc_grams.withColumnRenamed("_cid", id_col)
        .join(
            F.broadcast(bench_grams.withColumnRenamed("_cid", bench_id_col)),
            "gram",
        )
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").cast("long").alias("n_shared_grams"))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 13,
    min_overlap: int = 1,
    hash_grams: bool = True,
) -> DataFrame:
    """Drop every document sharing >= ``min_overlap`` distinct word
    ``n``-grams with ANY benchmark item; returns the kept rows of
    ``docs`` unchanged.  Executed as a broadcast LEFT ANTI join against
    the distinct contaminated-id set — the corpus is scanned twice
    (gram pass + keep pass) but never shuffled on document rows."""
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    contaminated = (
        contamination_report(
            docs, bench, text_col, id_col, bench_text_col, bench_id_col,
            n=n, hash_grams=hash_grams,
        )
        .filter(F.col("n_shared_grams") >= min_overlap)
        .select(id_col)
        .distinct()
    )
    return docs.join(F.broadcast(contaminated), id_col, "left_anti")
