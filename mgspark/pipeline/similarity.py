"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k is the exact baseline (JVM higher-order
functions — no Python in the scan path; Spark's TakeOrdered avoids a full
sort for LIMIT k).  The scale path is random-hyperplane LSH bucketing:
candidates come from the query's bucket (plus multiprobe neighbors), so
only a small fraction of vectors is scored; recall is probabilistic and
tested in pytest, not oracled.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

__all__ = ["cosine_topk", "lsh_bucket_embeddings", "ann_lsh_topk"]


def _query_lit(query: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in query])


def cosine_scores(df: DataFrame, vec_col: str, query: Sequence[float]) -> DataFrame:
    """Adds a ``cosine double`` column: cos(vec, query), JVM-side."""
    q = np.asarray(query, dtype=np.float64)
    qnorm = float(np.sqrt((q * q).sum()))
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), _query_lit(query), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col).cast("array<double>"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return df.withColumn("cosine", dot / (norm * F.lit(qnorm)))


def cosine_topk(
    df: DataFrame, vec_col: str, id_col: str, query: Sequence[float], k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k: (id, cosine) — ties broken by id."""
    scored = cosine_scores(df, vec_col, query)
    return (
        scored.select(F.col(id_col).cast("long").alias("id"), "cosine")
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_embeddings(
    df: DataFrame, vec_col: str, id_col: str, n_planes: int = 12, seed: int = 42
) -> DataFrame:
    """Adds a sign-LSH ``bucket long`` per vector (random hyperplanes).

    Deterministic (seeded) hyperplanes so buckets agree across executors
    and across build/query time.  Vectorized numpy inside mapInPandas.
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"]) if first else 0
    planes = _hyperplanes(dim, n_planes, seed)

    schema = StructType(
        [StructField("id", LongType(), False), StructField("bucket", LongType(), False)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.ascontiguousarray(planes.T)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            signs = (mat @ weights) > 0  # (n, planes)
            buckets = np.zeros(len(mat), dtype=np.int64)
            for j in range(signs.shape[1]):
                buckets |= signs[:, j].astype(np.int64) << j
            yield pd.DataFrame({"id": pdf["_id"].to_numpy(dtype=np.int64), "bucket": buckets})

    projected = df.select(
        F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v")
    )
    return projected.mapInPandas(assign, schema)


def ann_lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 12,
    multiprobe: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: score only vectors in the query's LSH
    bucket (plus buckets within ``multiprobe`` sign flips).

    The bucket filter is a broadcastable IN-list predicate, so the scan
    prunes before any scoring; recall is tested statistically in pytest.
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"]) if first else 0
    planes = _hyperplanes(dim, n_planes, seed)
    q = np.asarray(query, dtype=np.float64)
    signs = (planes @ q) > 0
    base = 0
    for j, s in enumerate(signs):
        base |= int(s) << j
    probes = {base}
    if multiprobe >= 1:
        for j in range(n_planes):
            probes.add(base ^ (1 << j))
    if multiprobe >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(base ^ (1 << i) ^ (1 << j))

    buckets = lsh_bucket_embeddings(df, vec_col, id_col, n_planes, seed)
    candidates = buckets.where(F.col("bucket").isin(sorted(probes))).select("id")
    pruned = df.join(
        F.broadcast(candidates.withColumnRenamed("id", id_col)), id_col, "leftsemi"
    )
    return cosine_topk(pruned, vec_col, id_col, query, k)
