"""Cross-document line-level dedup (boilerplate removal).

The CCNet / RefinedWeb recipe: a line (or paragraph) that recurs across
many documents is boilerplate — navigation bars, cookie banners, license
headers — and is stripped from every document while the document itself
survives.  This is the ACROSS-document complement to
``textstats.repetition_stats`` (within-document repetition) and operates
at line granularity, unlike the whole-document dedup family in
``pipeline/dedup.py``.

Scale design: one ``posexplode(split(text))`` scan feeds a
combiner-friendly ``countDistinct(doc)`` per line; removal anti-joins
the exploded lines against the hot set (lines above the
document-frequency threshold) ON ``xxhash64(line)`` — 8-byte keys
instead of raw line strings on the exchange; a collision can only
over-remove a line, the safe direction (same argument as decontam's
hashed grams).  The join itself is SIZE-GATED: ``broadcast_hot=True``
(default) broadcasts the hot set — right for curated corpora where the
hot tail is small — while ``broadcast_hot=False`` falls back to a plain
shuffle anti-join for web-scale corpora where "lines with doc_freq > 2"
is millions-to-billions of rows and a forced broadcast would OOM the
executors.  Reassembly is one groupBy(doc) with an order-restoring
``array_sort`` over (pos, line) structs — all built-in JVM expressions,
no Python anywhere.

Determinism: line keys are exact string matches and positions are
explicit, so the cleaned text is a pure function of the corpus and the
threshold — the DuckDB oracle replays the identical pipeline in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "line_doc_freq",
    "boilerplate_lines",
    "remove_boilerplate_lines",
    "write_multiline_docs_parquet",
]


def _literal_regex(sep: str) -> str:
    """Quote ``sep`` so Java regex treats it as a LITERAL separator.

    ``F.split`` interprets its pattern as a Java regex; the documented
    semantics here are literal (``sep='.'`` or ``'|'`` must not become
    match-anything / alternation).  ``\\Q...\\E`` quoting, with any
    embedded ``\\E`` stitched through."""
    return "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _exploded_lines(df: DataFrame, text_col: str, id_col: str, sep: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.col(text_col), _literal_regex(sep), -1)
        ).alias("pos", "line"),
    )


def line_doc_freq(
    df: DataFrame, text_col: str, id_col: str, sep: str = "\n"
) -> DataFrame:
    """(line, doc_freq): in how many distinct documents each exact line
    occurs.  Empty lines count like any other line (document or strip
    them upstream if the corpus uses blank-line paragraph breaks)."""
    return (
        _exploded_lines(df, text_col, id_col, sep)
        .groupBy("line")
        .agg(F.countDistinct("id").alias("doc_freq"))
    )


def boilerplate_lines(
    df: DataFrame, text_col: str, id_col: str, max_doc_freq: int = 2, sep: str = "\n"
) -> DataFrame:
    """The hot set: lines whose document frequency exceeds the
    threshold.  Small by construction (the distribution's heavy tail),
    hence broadcastable."""
    return line_doc_freq(df, text_col, id_col, sep).filter(
        F.col("doc_freq") > max_doc_freq
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_doc_freq: int = 2,
    sep: str = "\n",
    broadcast_hot: bool = True,
) -> DataFrame:
    """Strip every line occurring in more than ``max_doc_freq`` distinct
    documents; keep remaining lines in their original order.  Output:
    (id, clean_text, n_kept, n_removed) — one row per input document,
    with ``clean_text = ''`` when every line was boilerplate.  Integer
    line counts keep the oracle float-free.

    The anti-join key is ``xxhash64(line)`` in BOTH modes (8-byte keys;
    a collision only over-removes — safe).  ``broadcast_hot=False``
    switches the hot-set join from broadcast to shuffle: on a web-scale
    corpus the >``max_doc_freq`` line set is NOT small, and broadcasting
    it would OOM — the escape hatch mirrors ``lm_score``'s
    ``broadcast_model``."""
    lines = _exploded_lines(df, text_col, id_col, sep).withColumn(
        "_lh", F.xxhash64("line")
    )
    hot = boilerplate_lines(df, text_col, id_col, max_doc_freq, sep).select(
        F.xxhash64("line").alias("_lh")
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    kept = lines.join(hot, "_lh", "left_anti")
    ordered = F.array_sort(F.collect_list(F.struct("pos", "line")))
    reassembled = kept.groupBy("id").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["line"]), sep
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = lines.groupBy("id").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        totals.join(reassembled, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_total") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def write_multiline_docs_parquet(
    path: str, n: int = 120, seed: int = 61
) -> str:
    """Deterministic multi-line corpus with PLANTED boilerplate: a
    global header in every doc, one of three per-source footers, a
    navigation line in half the docs, and 3-6 unique content lines per
    doc (word choices seeded).  Spark-free (pyarrow), idempotent,
    atomic — mirrors the other contract fixtures."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    words = [
        "table", "scan", "merge", "shuffle", "batch", "sketch", "stream",
        "window", "filter", "join", "hash", "sort", "column", "row",
    ]
    header = "=== corpus header: do not remove ==="
    nav = "home | docs | about | contact"
    footers = [f"(c) source-{s} footer" for s in range(3)]
    ids, texts, sources = [], [], []
    for i in range(n):
        source = i % 3
        content = [
            " ".join(rng.choice(words, size=int(rng.integers(4, 9))))
            + f" #{i}.{j}"
            for j in range(int(rng.integers(3, 7)))
        ]
        doc_lines = [header]
        if i % 2 == 0:
            doc_lines.append(nav)
        doc_lines.extend(content)
        doc_lines.append(footers[source])
        ids.append(i)
        texts.append("\n".join(doc_lines))
        sources.append(f"source-{source}")
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(sources, pa.string()),
        }
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
