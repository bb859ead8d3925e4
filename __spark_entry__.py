"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the implemented operators from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame callables; ``oracle_sql()`` holds the DuckDB
equivalents.  MG sketch queries whose key cardinality is <= k are *exact
by construction* (no decrement can ever fire, SURVEY.md §1.3), so the
full distributed build+merge pipeline is oracle-checkable with plain
GROUP BY/COUNT SQL.  Queries with true sketching (k < cardinality) or DP
noise are rows-only checks; their error-bound verification lives in
tests/ (pytest).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def _mg_topk_query(table: str, col: str, k: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from mgspark.aggregate import mg_topk

        df = _read(spark, sf_dir, table).select(F.col(col).cast("string").alias("token"))
        return mg_topk(df, "token", k)

    return run


def _mg_topk_oracle(table: str, col: str) -> str:
    return (
        f"SELECT CAST({col} AS VARCHAR) AS token, COUNT(*) AS est "
        f"FROM {table} GROUP BY {col}"
    )


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mgspark.tokenize import content_tokens

    return content_tokens(_read(spark, sf_dir, "documents"), "text")


def q_mg_topk_doc_tokens_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mgspark.aggregate import mg_topk

    return mg_topk(_doc_tokens(spark, sf_dir), "token", 256)


def q_mg_sketch_doc_tokens_k8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True sketching: k=8 < vocab, decrements fire; bound checked in pytest."""
    from mgspark.aggregate import mg_topk

    return mg_topk(_doc_tokens(spark, sf_dir), "token", 8)


def q_mg_grouped_lang_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language sketches via the salted groupBy path, exploded to
    rows.  k=10 >= 5 distinct langs, so estimates are exact."""
    from mgspark.aggregate import decode_keys, encode_tokens, mg_sketch_grouped

    docs = _read(spark, sf_dir, "documents")
    df = encode_tokens(docs.select("source", F.col("lang").alias("token")), "token")
    grouped = mg_sketch_grouped(df, "source", "key", k=10, salt_buckets=4)
    exploded = grouped.select(
        F.col("group").alias("source"),
        F.explode(F.arrays_zip("keys", "counters")).alias("kv"),
    ).select("source", F.col("kv.keys").alias("key"), F.col("kv.counters").alias("est"))
    keys = [r["key"] for r in exploded.select("key").distinct().collect()]
    mapping = decode_keys(docs.select(F.col("lang").alias("token")), "token", keys)
    mapping_df = spark.createDataFrame(
        [(int(key), tok) for key, tok in mapping.items()], "key long, token string"
    )
    return (
        exploded.join(F.broadcast(mapping_df), "key")
        .select("source", "token", "est")
    )


def q_mg_private_topk_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline incl. central approx-DP release (random -> rows-only)."""
    from mgspark import dp
    from mgspark.aggregate import decode_keys, encode_tokens, mg_sketch

    events = _read(spark, sf_dir, "events").select(
        F.col("event_type").alias("token")
    )
    encoded = encode_tokens(events, "token")
    state = mg_sketch(encoded, "key", 10)
    released = dp.privatize_merged(state.to_dict(), 10, epsilon=2.0, delta=1e-6)
    mapping = decode_keys(events, "token", list(released))
    rows = [(mapping.get(key, str(key)), int(cnt)) for key, cnt in released.items()]
    return spark.createDataFrame(rows, "token string, est long")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: distributed MG heavy hitters over document tokens at sf0.001."""
    return q_mg_topk_doc_tokens_exact(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "mg_topk_doc_lang": _mg_topk_query("documents", "lang", 100),
        "mg_topk_returnflag": _mg_topk_query("lineitem", "l_returnflag", 10),
        "mg_topk_orderpriority": _mg_topk_query("orders", "o_orderpriority", 10),
        "mg_topk_mktsegment": _mg_topk_query("customer", "c_mktsegment", 10),
        "mg_topk_event_type": _mg_topk_query("events", "event_type", 10),
        "mg_topk_user_id": _mg_topk_query("events", "user_id", 512),
        "mg_topk_doc_tokens_exact": q_mg_topk_doc_tokens_exact,
        "mg_sketch_doc_tokens_k8": q_mg_sketch_doc_tokens_k8,
        "mg_grouped_lang_by_source": q_mg_grouped_lang_by_source,
        "mg_private_topk_event_type": q_mg_private_topk_event_type,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "mg_topk_doc_lang": _mg_topk_oracle("documents", "lang"),
        "mg_topk_returnflag": _mg_topk_oracle("lineitem", "l_returnflag"),
        "mg_topk_orderpriority": _mg_topk_oracle("orders", "o_orderpriority"),
        "mg_topk_mktsegment": _mg_topk_oracle("customer", "c_mktsegment"),
        "mg_topk_event_type": _mg_topk_oracle("events", "event_type"),
        "mg_topk_user_id": _mg_topk_oracle("events", "user_id"),
        "mg_topk_doc_tokens_exact": (
            "SELECT tok AS token, COUNT(*) AS est FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok FROM documents"
            ") WHERE tok <> '' GROUP BY tok"
        ),
        "mg_grouped_lang_by_source": (
            "SELECT source, lang AS token, COUNT(*) AS est "
            "FROM documents GROUP BY source, lang"
        ),
        # mg_sketch_doc_tokens_k8 / mg_private_topk_event_type: rows-only
        # (approximate / randomized) — bound + DP checks are in tests/.
    }
