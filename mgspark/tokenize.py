"""Vectorized token views over text/code tables.

The reference externalized tokenization ("one integer per line" stream
files, pmg.py:515-517); the rebuild derives token streams from columnar
tables with JVM-side expressions only (whole-stage codegen — no Python in
the hot path):

* ``lang_tokens`` — a categorical column as the token stream;
* ``ext_tokens`` — path extension via ``regexp_extract``;
* ``content_tokens`` — whitespace tokens via ``split`` + ``explode``
  (narrow, no shuffle).

All views emit a single ``token`` string column; ``aggregate.encode_tokens``
maps it onto the int64 key domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["lang_tokens", "ext_tokens", "content_tokens", "sha256_invariant"]

EXT_PATTERN = r"\.([A-Za-z0-9]+)$"


def lang_tokens(df: DataFrame, col: str = "lang") -> DataFrame:
    return df.select(F.col(col).cast("string").alias("token")).where(
        F.col("token").isNotNull()
    )


def ext_tokens(df: DataFrame, col: str = "path") -> DataFrame:
    return (
        df.select(F.regexp_extract(F.col(col), EXT_PATTERN, 1).alias("token"))
        .where(F.col("token") != "")
    )


def content_tokens(df: DataFrame, col: str = "content", sep: str = " ") -> DataFrame:
    """Whitespace tokens of a text column; null/empty tokens dropped.

    ``sep`` is a Java regex; the default single-space literal is
    dramatically cheaper than ``\\s+`` in the scan-side hot path and
    matches the DuckDB oracle's ``string_split(text, ' ')``.
    """
    return (
        df.select(F.explode(F.split(F.col(col), sep)).alias("token"))
        .where(F.col("token") != "")
    )


def sha256_invariant(df: DataFrame, col: str = "content") -> DataFrame:
    """Per-row sha256 of a column — the ingest-parity invariant
    (BASELINE.json input_hint: content sha256 equality per row)."""
    return df.withColumn("content_sha256", F.sha2(F.col(col), 256))
