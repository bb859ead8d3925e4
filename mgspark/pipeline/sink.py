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
- `write_sharded` range-repartitions BY THE SHARD COLUMN (one exchange,
  the same key the files are split by, so each output shard is written
  by exactly one task — no small-file explosion from tasks x shards
  cross products, and no hash balls-in-bins idling either) and emits
  `partitionBy("shard")` files in parquet or JSONL (`format="json"` —
  the shape training loaders stream); the manifest is then derived from
  the written files, never from a second execution of the input plan.
- `verify_shards` re-derives the manifest from the written files and
  anti-joins it against the expected manifest — a shard-count-sized
  comparison, never a row-level diff.

The per-row fingerprint is the first 60 bits of sha256 over the id plus
the checksum columns (each value tag-prefixed — `N` for NULL, `V` for a
value — and unit-separator-joined, so the encoding is injective for any
values not containing \\x1f), XOR-folded per shard.  XOR is
commutative/associative with identity 0, so the checksum is independent
of row order and partitioning and never overflows — and both engines
compute it exactly (DuckDB replays `('0x' || substr(sha256(...), 1,
15))::BIGINT` with `bit_xor`), which is what makes the manifest an
exact cross-engine oracle row rather than a trust-me number.  The id is
always part of the fingerprint: XOR self-cancels even multiplicities,
so fingerprints must be row-unique for corruption to be visible — with
the (unique) id folded in, only full-row duplicates including the id
could cancel.  Checksum columns are restricted to types whose string
form is engine-independent (string / integral / boolean); doubles,
dates, and timestamps stringify differently per engine and are rejected
rather than silently diverging from the oracle.
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
                    f"sink shard assignment: NULL {id_col} — "
                    "requires non-null integral ids in [0, 2^31)"
                )
            ).cast("bigint")
        )
        .cast("long")
    )


# Types whose cast-to-string is identical in Spark and DuckDB.  Doubles
# ('1.0E8' vs '100000000.0'), dates, and timestamps are not.
_CHECKSUM_TYPES = {"string", "tinyint", "smallint", "int", "bigint", "boolean"}


def _checked_fp_cols(df: DataFrame, id_col: str, checksum_cols: list[str]) -> list[str]:
    if not checksum_cols:
        raise ValueError("checksum_cols must be non-empty")
    cols = [id_col] + [c for c in checksum_cols if c != id_col]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in cols:
        t = types.get(c)
        if t is not None and t not in _CHECKSUM_TYPES:
            raise ValueError(
                f"checksum column {c!r} has type {t}: only "
                f"{sorted(_CHECKSUM_TYPES)} stringify identically across "
                "engines — cast it explicitly first"
            )
    return cols


def _fingerprint_expr(fp_cols: list[str]):
    # Tag-prefixed ('N' null / 'V' value), separator-joined encoding
    # (injective for values without \x1f), sha256, first 15 hex chars
    # -> 60-bit non-negative bigint.
    parts = []
    for c in fp_cols:
        col = F.col(c).cast("string")
        parts.append(
            F.when(col.isNull(), F.lit("N")).otherwise(F.concat(F.lit("V"), col))
        )
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
    over ``id_col`` plus ``checksum_cols`` — order- and
    partitioning-independent, exact in any engine.  With ``text_col``
    set, ``n_tokens`` adds the whitespace token count (the number
    shard-size planning uses).  One zero-shuffle projection + one
    combiner aggregation.
    """
    fp_cols = _checked_fp_cols(df, id_col, checksum_cols)
    cols = [
        shard_expr(id_col, n_shards, seed).alias("shard"),
        _fingerprint_expr(fp_cols).alias("_fp"),
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
    Knuth hash, sha256-prefix fingerprint (id + checksum columns,
    N/V-tagged), and XOR fold."""
    knuth, mod = 2654435761, 1 << 32
    fp_cols = [id_col] + [c for c in checksum_cols if c != id_col]
    fp_parts = " || chr(31) || ".join(
        f"CASE WHEN {c} IS NULL THEN 'N' ELSE 'V' || {c}::VARCHAR END"
        for c in fp_cols
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


_SINK_FORMATS = {"parquet", "json"}


def write_sharded(
    df: DataFrame,
    path: str,
    id_col: str,
    checksum_cols: list[str],
    n_shards: int = 64,
    seed: int = 0,
    mode: str = "error",
    format: str = "parquet",
) -> DataFrame:
    """Materialize ``df`` as ``n_shards`` deterministic shards under
    ``path`` plus a ``_manifest`` parquet, and return the manifest.

    ``format`` is ``'parquet'`` (default) or ``'json'`` (JSONL — one
    object per line, the shape training loaders stream).  The shard
    assignment, range-partitioned write, and manifest are identical in
    both formats: fingerprints are computed from the written rows'
    VALUES, so the manifest is format-independent.  For JSONL the
    read-back uses the input's explicit schema (JSON inference would
    drop a column that is null in every row, and the manifest must see
    every checksum column).

    The data is range-repartitioned BY the shard column before the
    partitioned write: each shard directory is produced by exactly one
    task (no tasks x shards small-file cross product), and range — not
    hash — partitioning of the [0, n_shards) key avoids the balls-in-
    bins collisions that would leave ~1/e of the write tasks idle while
    stragglers write several shards each.  The manifest is then computed
    FROM THE WRITTEN FILES (not by re-executing the input plan, which
    would double the input scan and could desync manifest from data if
    the plan is non-deterministic) and persisted beside them;
    `verify_shards` recomputes the same thing later to validate a
    resumed export.
    """
    if "shard" in df.columns:
        raise ValueError(
            "write_sharded: input already has a 'shard' column — rename "
            "it first (the sink reserves 'shard' for its assignment)"
        )
    if format not in _SINK_FORMATS:
        raise ValueError(f"format must be one of {sorted(_SINK_FORMATS)}, got {format!r}")
    _checked_fp_cols(df, id_col, checksum_cols)
    data_path = os.path.join(path, "data")
    shard = shard_expr(id_col, n_shards, seed)
    (
        df.withColumn("shard", shard)
        .repartitionByRange(int(n_shards), "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .format(format)
        .save(data_path)
    )
    reader = df.sparkSession.read
    if format == "json":
        reader = reader.schema(df.schema)
    written = reader.format(format).load(data_path).drop("shard")
    manifest = shard_manifest(written, id_col, checksum_cols, n_shards, seed)
    manifest.coalesce(1).write.mode(mode).parquet(os.path.join(path, "_manifest"))
    return manifest


def verify_shards(
    spark: SparkSession,
    path: str,
    id_col: str,
    checksum_cols: list[str],
    n_shards: int = 64,
    seed: int = 0,
    format: str = "parquet",
    schema=None,
) -> DataFrame:
    """Re-derive the manifest from the files under ``path`` and diff it
    against the stored one.  Returns violations: (shard, kind) where
    kind in ('missing', 'extra', 'mismatch') — empty means the export
    is intact.  Cost: one scan of the data + a shard-count-sized join.

    ``format='json'`` REQUIRES ``schema`` (the exporting DataFrame's
    ``df.schema``, same as :func:`write_sharded` uses for its own
    read-back): JSONL carries no types and omits null fields, so schema
    inference can drop an all-null checksum column or drift a type,
    failing (or falsely passing sections of) an intact export.
    """
    if format not in _SINK_FORMATS:
        raise ValueError(f"format must be one of {sorted(_SINK_FORMATS)}, got {format!r}")
    reader = spark.read
    if format == "json":
        if schema is None:
            raise ValueError(
                "verify_shards: format='json' requires schema= (the "
                "exporting DataFrame's df.schema) — JSON inference drops "
                "all-null columns and drifts types, desyncing fingerprints"
            )
        reader = reader.schema(schema)
    data = reader.format(format).load(os.path.join(path, "data"))
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
