"""Deterministic sequence packing for LLM training batches.

GPT-style packing: documents are concatenated in a fixed order and the
token stream is chunked every ``budget`` tokens, documents spanning chunk
boundaries (the standard causal-LM data layout).  A single global
concatenation order would serialize at 100 TB, so the corpus is first
split into ``n_shards`` independent streams by a seeded Knuth
multiplicative hash of the document id — the same pure-function hash the
sampling operators use (`sampling.sample_hash_expr`), so shard
assignment is a function of (id, seed) alone and the layout is
bit-identical at any cluster size or input partitioning.  Within a shard
documents are ordered by id and each document's token offset is a
running-sum window; its chunk span follows arithmetically.

Plan shape at scale: one exchange (hash-partition by shard) + one sort
per partition — the window's partition key is the shard, so parallelism
equals ``n_shards`` and each state is a single running counter.  No
Python, no second shuffle; `packing_stats` reuses the same exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mgspark.pipeline.sampling import sample_hash_expr

__all__ = ["pack_sequences", "packing_stats"]


def _sharded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int,
    n_shards: int,
    seed: int,
) -> DataFrame:
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from mgspark.pipeline.textstats import ws_tokens_expr

    n_tokens = F.size(ws_tokens_expr(text_col, null_as_empty=True)).cast("long")
    # A NULL id hashes to a NULL shard (sampling's filter-identically
    # convention), but here it would also get an all-equal NULL sort key
    # — running offsets within the NULL shard would then depend on
    # arbitrary tie order, silently breaking the bit-identical-layout
    # contract.  Reject instead.
    id_val = F.col(id_col).cast("bigint")
    shard = F.when(
        id_val.isNotNull(),
        F.pmod(sample_hash_expr(id_col, seed), F.lit(n_shards)),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"pack_sequences: NULL {id_col} — the packing layout "
                "requires unique non-null integral ids in [0, 2^31)"
            )
        ).cast("bigint")
    )
    return df.select(
        id_val.alias("id"),
        shard.cast("long").alias("shard"),
        n_tokens.alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int,
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Assign each document its place in the packed token stream:
    (id, shard, n_tokens, tok_start, seq_first, seq_last).

    ``tok_start`` is the document's offset in its shard's concatenated
    token stream (id order); the document's tokens land in training
    sequences ``seq_first .. seq_last`` of ``budget`` tokens each
    (inclusive — a document longer than ``budget`` spans several).  An
    empty document occupies no tokens and reports the sequence its
    offset falls in for both bounds.

    Ids must be unique, non-null, non-negative integrals < 2^31 (the
    shared sampling-hash precondition, `sampling.sample_hash_expr` —
    larger ids overflow the 64-bit hash product differently per engine);
    violations raise in-expression rather than mis-packing.  Corpora
    with >2^31 documents need a widened hash first.
    """
    base = _sharded(df, text_col, id_col, budget, n_shards, seed)
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = base.withColumn(
        "tok_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    # Integer DIV, not floor(double /): token offsets past 2^53 would
    # lose exactness through a double intermediate.
    seq_first = F.expr(f"CAST(tok_start DIV {budget} AS BIGINT)")
    seq_last = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"CAST((tok_start + n_tokens - 1) DIV {budget} AS BIGINT)"),
    ).otherwise(seq_first).cast("long")
    return packed.select(
        "id",
        "shard",
        "n_tokens",
        "tok_start",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
    )


def packing_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int,
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Per-shard packing summary: (shard, n_docs, total_tokens,
    n_sequences, fill_bp, fill_frac).  ``n_sequences = ceil(total_tokens
    / budget)`` (the final partial chunk is padded); ``fill_frac`` is
    the non-pad fraction of the emitted sequences, the number a data
    engineer sizes shard counts by, and ``fill_bp`` is the same ratio in
    floored basis points — exact integer arithmetic, so cross-engine
    comparisons should use it (ROUND on a dyadic-rational tie differs
    between Spark HALF_UP and IEEE half-even engines)."""
    base = _sharded(df, text_col, id_col, budget, n_shards, seed)
    agg = base.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    # ceil(a / b) on longs without touching floats: (a + b - 1) DIV b;
    # fill_bp likewise stays in 64-bit integer arithmetic end to end
    # (a double intermediate would lose exactness above 2^53).
    sized = agg.select(
        "shard",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.expr(
            f"CAST((total_tokens + {budget - 1}) DIV {budget} AS BIGINT)"
        ).alias("n_sequences"),
    )
    return sized.select(
        "shard",
        "n_docs",
        "total_tokens",
        "n_sequences",
        F.expr(
            "CAST(CASE WHEN n_sequences > 0 THEN "
            f"(total_tokens * 10000) DIV (n_sequences * {budget}) "
            "ELSE 0 END AS BIGINT)"
        ).alias("fill_bp"),
        F.round(
            F.when(
                F.col("n_sequences") > 0,
                F.col("total_tokens") / (F.col("n_sequences") * F.lit(budget)),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("fill_frac"),
    )
