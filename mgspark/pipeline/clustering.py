"""Distributed k-means document clustering over embedding columns.

The SemDeDup path (pipeline/similarity.py) trains coarse centroids on a
bounded driver-side sample — the right cost model for coarse
quantization.  This module is the complementary FULL-DATA path: Lloyd
iterations where both the assignment and the centroid update are
distributed, for workloads that need the actual k-means optimum over
the whole corpus (topic bucketing, cluster-balanced mixture sampling,
cluster-stratified eval splits at 100 TB).

Scale design, per iteration:
- assignment is a single scan, computed as a pure-JVM whole-stage-codegen
  expression (per-centroid squared distance via ``zip_with`` +
  ``aggregate`` over the broadcast-literal centroid, argmin via
  ``array_position``/``array_min``) while k*dim stays below
  ``_JVM_EXPR_LIMIT``; above it the same math runs as a vectorized
  numpy ``mapInPandas`` (Arrow batches, never per-row Python);
- the assignment CARRIES ``vec`` through (``carry_vec=True``), so the
  centroid update is scan + combiner aggregate only — there is NO
  per-iteration join back to the cached table (a full-width shuffle
  join per Lloyd round would dominate at 100 TB);
- the centroid update shuffles only k rows of (count, dim partial sums)
  per partition while ``dim <= _DIM_FANOUT_LIMIT`` — ``groupBy(cluster)``
  with one ``sum(element_at(vec, i))`` per dimension gets map-side
  combining from Catalyst, so the exchange is k*(dim+1) doubles per
  partition regardless of table size; at embedding dims (512-1024) the
  per-dimension expression fan-out would bloat codegen, so the update
  switches to ``posexplode(vec)`` + ``groupBy(cluster, pos)`` — still
  combiner-aggregated, k*dim rows total on the exchange;
- the input is persisted once for the iteration loop and unpersisted on
  exit; centroids (k x dim, driver-side numpy) are the only state.

Determinism: init picks the k rows with the smallest Knuth multiplicative
hash of the id (SQL-replicable, order-stable), iterations are a fixed
count, ties in the argmin break to the lowest cluster index — so the
(id, cluster) output is exactly reproducible cross-engine, and the
DuckDB oracle re-runs the identical unrolled iterations in SQL.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "kmeans_fit",
    "kmeans_assign",
    "kmeans_clusters",
    "write_kmeans_embeddings_parquet",
]

_KNUTH = 2654435761
_MOD = 4294967296
# beyond this many (centroid x dim) literal terms, the codegen expression
# tree gets slow to compile; switch to the Arrow/numpy path
_JVM_EXPR_LIMIT = 4096
# beyond this many per-dimension sum(element_at(vec, i)) aggregate
# expressions, the centroid update switches to posexplode + (cluster, pos)
# grouping — same combiner behavior, no codegen bloat at embedding dims
_DIM_FANOUT_LIMIT = 64
# rows per numpy distance block in the Arrow assignment path: bounds the
# (block x k x dim) float64 scratch at ~64 MiB for k*dim = 2^20
_ASSIGN_BLOCK_FLOATS = 8_388_608

_ASSIGN_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("cluster", LongType(), False),
    ]
)

_ASSIGN_VEC_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("cluster", LongType(), False),
        StructField("vec", ArrayType(DoubleType()), False),
    ]
)


def _dist2_expr(vec_col: str, centroid: np.ndarray):
    """Pure-JVM squared euclidean distance to one literal centroid."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(F.col(vec_col), lit, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _assign_expr(vec_col: str, centroids: np.ndarray):
    """Cluster index (argmin distance, ties -> lowest index) as one JVM
    expression: array_position finds the FIRST occurrence of the min."""
    dists = F.array(*[_dist2_expr(vec_col, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("long")


def _assign_pandas(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: np.ndarray,
    carry_vec: bool = False,
) -> DataFrame:
    """Vectorized numpy assignment for large k*dim (Arrow batches).

    Distances are computed as the literal sum((v-c)^2) — the same
    formulation as the JVM ``zip_with`` path and the DuckDB oracle — in
    row blocks sized so the (block, k, dim) difference scratch stays
    bounded.  The expanded form -2*v.c + ||c||^2 is a BLAS call but
    rounds differently, which can flip near-tie argmins cross-engine;
    exactness wins here (the module's contract is bit-stable clusters).
    """
    cents = centroids.astype(np.float64)
    k, dim = cents.shape
    block = max(1, _ASSIGN_BLOCK_FLOATS // max(1, k * dim))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(pdf["_vec"].tolist(), dtype=np.float64)
            parts = []
            for lo in range(0, len(mat), block):
                diff = mat[lo : lo + block, None, :] - cents[None, :, :]
                scores = np.einsum("bkd,bkd->bk", diff, diff)
                parts.append(scores.argmin(axis=1))
            out = {
                "id": pdf["_id"].to_numpy(dtype=np.int64),
                "cluster": np.concatenate(parts).astype(np.int64),
            }
            if carry_vec:
                out["vec"] = pdf["_vec"]
            yield pd.DataFrame(out)

    schema = _ASSIGN_VEC_SCHEMA if carry_vec else _ASSIGN_SCHEMA
    return df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(assign, schema)


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: np.ndarray,
    carry_vec: bool = False,
) -> DataFrame:
    """One assignment pass: (id, cluster) with cluster the nearest
    centroid by squared euclidean distance, ties to the lowest index.

    ``carry_vec=True`` additionally emits the input vector as ``vec`` —
    the iteration loop uses this so the centroid update never joins
    back to the source table (no per-iteration shuffle join)."""
    k, dim = centroids.shape
    if k * dim <= _JVM_EXPR_LIMIT:
        cols = [
            F.col(id_col).alias("id"),
            _assign_expr(vec_col, centroids).alias("cluster"),
        ]
        if carry_vec:
            cols.append(F.col(vec_col).cast("array<double>").alias("vec"))
        return df.select(*cols)
    return _assign_pandas(df, vec_col, id_col, centroids, carry_vec=carry_vec)


def _init_centroids(
    df: DataFrame, vec_col: str, id_col: str, k: int, seed: int
) -> np.ndarray:
    """Deterministic init: the k rows with the smallest Knuth hash of
    the id (TakeOrdered k — no full sort materialized)."""
    rows = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_vec"),
            (((F.col(id_col) + F.lit(seed)) * F.lit(_KNUTH)) % F.lit(_MOD)).alias("_h"),
        )
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    return np.array([r["_vec"] for r in rows], dtype=np.float64)


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iterations: int = 3,
    seed: int = 7,
) -> np.ndarray:
    """Full-data distributed Lloyd: ``iterations`` rounds of
    (assign scan, k-row combiner-aggregated centroid update).  Returns
    the final (k, dim) centroid matrix; empty clusters retain their
    previous centroid (deterministic, matches the SQL oracle)."""
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return np.zeros((0, 0))
    dim = int(first["d"])
    cached = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).persist()
    try:
        centroids = _init_centroids(cached, "vec", "id", k, seed)
        k = len(centroids)  # corpus smaller than k
        for _ in range(iterations):
            centroids = _update_centroids(cached, centroids, dim)
    finally:
        cached.unpersist()
    return centroids


def _iteration_sums(cached: DataFrame, centroids: np.ndarray, dim: int) -> DataFrame:
    """One Lloyd round's centroid-update aggregate, pre-collect.

    Single scan of the cached (id, vec) table: the assignment carries
    ``vec`` through, so there is no join anywhere in the plan (pinned
    by tests/test_plans.py).  Two shapes by dimensionality:

    - dim <= _DIM_FANOUT_LIMIT: ``groupBy(cluster)`` with one
      ``sum(element_at(vec, i))`` per dimension — k rows collected,
      schema (cluster, n, s0..s{dim-1});
    - otherwise: ``posexplode(vec)`` + ``groupBy(cluster, pos)`` —
      k*dim rows collected, schema (cluster, pos, n, s).  ``count(*)``
      per (cluster, pos) equals the cluster count, so no second scan.

    Both are map-side-combined aggregates; the exchange carries
    O(k*dim) doubles per partition regardless of table size.
    """
    assigned = kmeans_assign(cached, "vec", "id", centroids, carry_vec=True)
    if dim <= _DIM_FANOUT_LIMIT:
        return assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at("vec", i + 1)).alias(f"s{i}")
                for i in range(dim)
            ],
        )
    return (
        assigned.select("cluster", F.posexplode("vec").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )


def _update_centroids(
    cached: DataFrame, centroids: np.ndarray, dim: int
) -> np.ndarray:
    rows = _iteration_sums(cached, centroids, dim).collect()
    new = centroids.copy()
    if dim <= _DIM_FANOUT_LIMIT:
        for r in rows:
            c = int(r["cluster"])
            n = int(r["n"])
            new[c] = np.array([r[f"s{i}"] for i in range(dim)]) / n
    else:
        for r in rows:
            new[int(r["cluster"]), int(r["pos"])] = r["s"] / int(r["n"])
    return new


def kmeans_clusters(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iterations: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Fit + one final assignment against the FINAL centroids, so each
    released row's cluster is provably its nearest final centroid.
    Output: (id, cluster)."""
    centroids = kmeans_fit(df, vec_col, id_col, k=k, iterations=iterations, seed=seed)
    if centroids.size == 0:
        return df.select(
            F.col(id_col).alias("id"), F.lit(0).cast("long").alias("cluster")
        ).limit(0)
    return kmeans_assign(df, vec_col, id_col, centroids)


def write_kmeans_embeddings_parquet(
    path: str, n: int = 240, dim: int = 8, k: int = 4, seed: int = 53
) -> str:
    """Deterministic INTEGER-valued well-separated cluster fixture.

    Cross-engine argmin on doubles is only hash-stable when assignment
    margins dwarf summation-order ulp noise; integer components (center
    grid step 20, noise in [-2, 2]) keep every intermediate exactly
    representable and the margins ~10^2, so Spark and the unrolled
    DuckDB SQL oracle agree bit-for-bit on (id, cluster).  Spark-free
    (pyarrow), idempotent, atomic."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    centers = rng.integers(-2, 3, size=(k, dim)) * 20
    ids, vecs = [], []
    for i in range(n):
        c = i % k
        v = centers[c] + rng.integers(-2, 3, size=dim)
        ids.append(i)
        vecs.append([float(x) for x in v])
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        }
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
