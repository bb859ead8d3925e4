"""Sharded training-data sink with a verifiable manifest.

The last stage of a training-data pipeline materializes the curated
corpus as a fixed set of shards that the training job streams
independently.  At 100 TB the sink must be (a) deterministic — the
shard a document lands in is a pure function of (id, seed), never of
cluster size or input partitioning, so reruns and incremental appends
are stable; (b) verifiable — each shard carries row/token counts and an
order-independent content checksum so a resumed or re-run export can be
validated without re-reading the corpus; (c) balanced — the seeded
Knuth multiplicative hash (`sampling.sample_hash_expr`, the same pure
function the sampling and packing operators key on) spreads ids
uniformly regardless of id clustering.

Plan shape at scale:

- `shard_manifest` is ONE combiner aggregation over a zero-shuffle
  projection (shard + per-row fingerprint are pure column expressions);
  post-shuffle traffic is n_shards rows.
- `write_sharded` repartitions BY THE SHARD COLUMN (one exchange, the
  same key the files are split by, so each output shard is written by
  exactly one task — no small-file explosion from tasks x shards
  cross products) and emits parquet `partitionBy("shard")`.
- `verify_shards` re-derives the manifest from the written files and
  anti-joins it against the expected manifest — a shard-count-sized
  comparison, never a row-level diff.

The per-row fingerprint is the first 60 bits of sha256 over the
checksum columns (NULL-tagged, unit-separator-joined — the injective
encoding `exact_dup_groups` uses), XOR-folded per shard.  XOR is
commutative/associative with identity 0, so the checksum is independent
of row order and partitioning and never overflows — and both engines
compute it exactly (DuckDB replays `('0x' || substr(sha256(...), 1,
15))::BIGINT` with `bit_xor`), which is what makes the manifest an
exact cross-engine oracle row rather than a trust-me number.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mgspark.pipeline.sampling import sample_hash_expr

__all__ = ["shard_expr", "shard_manifest", "write_sharded", "verify_shards"]

_US = "\x1f"  # unit separator: not in natural text, keeps concat injective


def shard_expr(id_col: str, n_shards: int, seed: int = 0):
    """Deterministic shard id in [0, n_shards) as a Column — a pure
    function of (id, seed) via the shared sampling hash.  NULL ids
    raise in-expression (a NULL shard would silently drop rows from
    every shard's manifest)."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    id_val = F.col(id_col).cast("bigint")
    return (
        F.when(
            id_val.isNotNull(),
            F.pmod(sample_hash_expr(id_col, seed), F.lit(int(n_shards))),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    f"write_sharded: NULL {id_col} — shard assignment "
                    "requires non-null integral ids in [0, 2^31)"
                )
            ).cast("bigint")
        )
        .cast("long")
    )


def _fingerprint_expr(checksum_cols: list[str]):
    # NULL-tagged, separator-joined encoding (injective for non-US
    # text), sha256, first 15 hex chars -> 60-bit non-negative bigint.
    parts = []
    for c in checksum_cols:
        col = F.col(c).cast("string")
        parts.append(F.when(col.isNull(), F.lit("\x00")).otherwise(col))
    joined = F.concat_ws(_US, *parts)
    return F.conv(F.substring(F.sha2(joined, 256), 1, 15), 16, 10).cast("bigint")


def shard_manifest(
    df: DataFrame,
    id_col: str,
    checksum_cols: list[str],
    n_shards: int = 64,
    seed: int = 0,
    text_col: str | None = None,
) -> DataFrame:
    """Per-shard export manifest: (shard, n_rows, checksum[, n_tokens]).

    ``checksum`` is the XOR fold of per-row 60-bit sha256 fingerprints
    over ``checksum_cols`` — order- and partitioning-independent, exact
    in any engine.  With ``text_col`` set, ``n_tokens`` adds the
    whitespace token count (the number shard-size planning uses).  One
    zero-shuffle projection + one combiner aggregation.
    """
    if not checksum_cols:
        raise ValueError("checksum_cols must be non-empty")
    cols = [
        shard_expr(id_col, n_shards, seed).alias("shard"),
        _fingerprint_expr(checksum_cols).alias("_fp"),
    ]
    if text_col is not None:
        from mgspark.pipeline.textstats import ws_tokens_expr

        cols.append(
            F.size(ws_tokens_expr(text_col, null_as_empty=True))
            .cast("long")
            .alias("_nt")
        )
    proj = df.select(*cols)
    aggs = [
        F.count("*").alias("n_rows"),
        F.bit_xor("_fp").alias("checksum"),
    ]
    if text_col is not None:
        aggs.append(F.sum("_nt").alias("n_tokens"))
    return proj.groupBy("shard").agg(*aggs)


def shard_manifest_oracle_sql(
    table: str,
    id_col: str,
    checksum_cols: list[str],
    n_shards: int = 64,
    seed: int = 0,
    text_col: str | None = None,
) -> str:
    """DuckDB SQL replaying :func:`shard_manifest` exactly: the same
    Knuth hash, sha256-prefix fingerprint, and XOR fold."""
    knuth, mod = 2654435761, 1 << 32
    fp_parts = " || chr(31) || ".join(
        f"coalesce({c}::VARCHAR, chr(0))" for c in checksum_cols
    )
    sel = [
        f"(({id_col}::BIGINT + {int(seed)}) * {knuth}) % {mod} "
        f"% {int(n_shards)} AS shard",
        f"('0x' || substr(sha256({fp_parts}), 1, 15))::BIGINT AS _fp",
    ]
    aggs = ["count(*)::BIGINT AS n_rows", "bit_xor(_fp) AS checksum"]
    if text_col is not None:
        sel.append(
            f"len(list_filter(string_split(coalesce({text_col}, ''), ' '), "
            "x -> x <> ''))::BIGINT AS _nt"
        )
        aggs.append("sum(_nt)::BIGINT AS n_tokens")
    return (
        f"WITH proj AS (SELECT {', '.join(sel)} FROM {table}) "
        f"SELECT shard, {', '.join(aggs)} FROM proj GROUP BY shard"
    )


def write_sharded(
    df: DataFrame,
    path: str,
    id_col: str,
    checksum_cols: list[str],
    n_shards: int = 64,
    seed: int = 0,
    mode: str = "error",
) -> DataFrame:
    """Materialize ``df`` as ``n_shards`` deterministic parquet shards
    under ``path`` plus a ``_manifest`` parquet, and return the manifest.

    The data is repartitioned BY the shard column before the
    partitioned write, so each shard directory is produced by exactly
    one task (no tasks x shards small-file cross product).  The manifest
    is computed from the input plan in the same pass shape
    (`shard_manifest`) and persisted beside the data; `verify_shards`
    recomputes it from the written files to validate a resumed export.
    """
    shard = shard_expr(id_col, n_shards, seed)
    (
        df.withColumn("shard", shard)
        .repartition(int(n_shards), "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(os.path.join(path, "data"))
    )
    manifest = shard_manifest(df, id_col, checksum_cols, n_shards, seed)
    manifest.coalesce(1).write.mode(mode).parquet(os.path.join(path, "_manifest"))
    return manifest


def verify_shards(
    spark: SparkSession,
    path: str,
    id_col: str,
    checksum_cols: list[str],
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Re-derive the manifest from the files under ``path`` and diff it
    against the stored one.  Returns violations: (shard, kind) where
    kind in ('missing', 'extra', 'mismatch') — empty means the export
    is intact.  Cost: one scan of the data + a shard-count-sized join.
    """
    data = spark.read.parquet(os.path.join(path, "data"))
    stored = spark.read.parquet(os.path.join(path, "_manifest"))
    actual = shard_manifest(
        data.drop("shard"), id_col, checksum_cols, n_shards, seed
    )
    a = actual.select(
        F.col("shard"),
        F.col("n_rows").alias("a_rows"),
        F.col("checksum").alias("a_sum"),
    )
    s = stored.select(
        F.col("shard"),
        F.col("n_rows").alias("s_rows"),
        F.col("checksum").alias("s_sum"),
    )
    joined = a.join(s, "shard", "full_outer")
    return joined.select(
        "shard",
        F.when(F.col("s_rows").isNull(), F.lit("extra"))
        .when(F.col("a_rows").isNull(), F.lit("missing"))
        .when(
            (F.col("a_rows") != F.col("s_rows"))
            | (F.col("a_sum") != F.col("s_sum")),
            F.lit("mismatch"),
        )
        .otherwise(F.lit(None))
        .alias("kind"),
    ).where(F.col("kind").isNotNull())


__all__.append("shard_manifest_oracle_sql")
