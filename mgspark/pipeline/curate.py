"""Document-curation composition: the one-call pipeline a training-data
job runs before tokenization — exact dedup, quality scoring, threshold
filter, per-document stats.

Each stage is an already-tested operator (`dedup.dedup_exact`,
`textstats.quality_score`, `textstats.lang_id`); the composition stays
pure DataFrame ops, so Catalyst fuses the projections and the whole
pipeline is SQL-oracle-able.  At scale the only shuffle is the dedup
groupBy on sha256(text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mgspark.pipeline.dedup import dedup_exact
from mgspark.pipeline.textstats import lang_pred_expr, quality_exprs

__all__ = ["curate_documents"]


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    keep_langs: list[str] | None = None,
    near_dup_threshold: float | None = None,
) -> DataFrame:
    """Curated corpus rows: (id, n_tokens, quality, lang_pred).

    Pipeline: exact dedup (keep min id per distinct text) -> optional
    NEAR dedup (MinHash+LSH pairs -> connected components -> keep one
    per cluster, when ``near_dup_threshold`` is set) -> quality score ->
    drop documents below ``min_quality`` or shorter than ``min_tokens``
    -> heuristic language id -> optional language filter.  Quality and
    language are raw column expressions over the deduped rows, so
    everything past the dedup shuffles fuses into one projection (the
    quality filter sits below the language expression — no join, no
    wasted lang scoring on dropped documents).
    """
    deduped = dedup_exact(df, text_col, id_col)
    if near_dup_threshold is not None:
        from mgspark.pipeline.dedup import dedup_near, minhash_dedup_pairs

        pairs = minhash_dedup_pairs(
            deduped, text_col, id_col, threshold=near_dup_threshold
        )
        deduped = dedup_near(deduped, id_col, pairs)
    exprs = quality_exprs(text_col)
    kept = deduped.where(
        (exprs["quality"] >= min_quality) & (exprs["n_tokens"] >= min_tokens)
    )
    out = kept.select(
        F.col(id_col).alias("id"),
        exprs["n_tokens"].alias("n_tokens"),
        exprs["quality"].alias("quality"),
        lang_pred_expr(text_col).alias("lang_pred"),
    )
    if keep_langs is not None:
        out = out.where(F.col("lang_pred").isin(list(keep_langs)))
    return out
