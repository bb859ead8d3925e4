"""Distributed k-means (pipeline/clustering.py) vs a sequential numpy
Lloyd oracle, path equivalence (JVM expression vs Arrow/numpy), and
edge cases (empty clusters, empty corpus, tie-break)."""

import numpy as np
import pytest

from mgspark.pipeline.clustering import (
    _DIM_FANOUT_LIMIT,
    _KNUTH,
    _MOD,
    _assign_pandas,
    _iteration_sums,
    kmeans_assign,
    kmeans_clusters,
    kmeans_fit,
)


def _numpy_lloyd(ids, vecs, k, iterations, seed):
    """Sequential reference: identical init / argmin / update rules."""
    ids = np.asarray(ids)
    vecs = np.asarray(vecs, dtype=np.float64)
    order = np.lexsort((ids, (ids + seed) * _KNUTH % _MOD))
    centroids = vecs[order[:k]].copy()
    k = len(centroids)
    for _ in range(iterations):
        d2 = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin ties -> lowest index
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    d2 = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return centroids, d2.argmin(axis=1)


def _mk_df(spark, ids, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_matches_sequential_lloyd(spark):
    rng = np.random.default_rng(3)
    centers = np.array([[0, 0, 0], [40, 0, 0], [0, 40, 40]], dtype=float)
    ids, vecs = [], []
    for i in range(90):
        ids.append(i)
        vecs.append(centers[i % 3] + rng.integers(-2, 3, size=3))
    df = _mk_df(spark, ids, vecs)
    cents = kmeans_fit(df, "embedding", "vec_id", k=3, iterations=4, seed=11)
    ref_cents, ref_assign = _numpy_lloyd(ids, vecs, 3, 4, 11)
    assert np.allclose(cents, ref_cents)
    got = {
        r["id"]: r["cluster"]
        for r in kmeans_clusters(
            df, "embedding", "vec_id", k=3, iterations=4, seed=11
        ).collect()
    }
    assert got == {i: int(c) for i, c in zip(ids, ref_assign)}


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # all points identical: after round 1 every point lands in ONE
    # cluster; the others must retain their (identical) init centroid,
    # not NaN out
    ids = list(range(6))
    vecs = [[5.0, 5.0]] * 6
    df = _mk_df(spark, ids, vecs)
    cents = kmeans_fit(df, "embedding", "vec_id", k=3, iterations=2, seed=1)
    assert cents.shape == (3, 2)
    assert np.isfinite(cents).all()
    assert np.allclose(cents, 5.0)


def test_kmeans_assign_jvm_and_pandas_paths_agree(spark):
    rng = np.random.default_rng(9)
    ids = list(range(40))
    vecs = rng.integers(-8, 9, size=(40, 5)).astype(float)
    df = _mk_df(spark, ids, vecs)
    centroids = rng.integers(-8, 9, size=(4, 5)).astype(np.float64)
    jvm = {r["id"]: r["cluster"] for r in kmeans_assign(df, "embedding", "vec_id", centroids).collect()}
    arrow = {r["id"]: r["cluster"] for r in _assign_pandas(df, "embedding", "vec_id", centroids).collect()}
    assert jvm == arrow


def test_kmeans_assign_tie_breaks_to_lowest_index(spark):
    df = _mk_df(spark, [0], [[0.0, 0.0]])
    centroids = np.array([[3.0, 4.0], [4.0, 3.0], [0.0, 5.0]])  # all dist 5
    r = kmeans_assign(df, "embedding", "vec_id", centroids).collect()[0]
    assert r["cluster"] == 0


def test_kmeans_empty_corpus(spark):
    df = _mk_df(spark, [], []).limit(0)
    assert kmeans_fit(df, "embedding", "vec_id", k=3).size == 0
    assert kmeans_clusters(df, "embedding", "vec_id", k=3).count() == 0


def test_kmeans_corpus_smaller_than_k(spark):
    df = _mk_df(spark, [0, 1], [[0.0, 0.0], [10.0, 10.0]])
    cents = kmeans_fit(df, "embedding", "vec_id", k=5, iterations=2, seed=2)
    assert cents.shape == (2, 2)
    out = kmeans_clusters(df, "embedding", "vec_id", k=5, iterations=2, seed=2)
    assert {r["cluster"] for r in out.collect()} == {0, 1}


def test_kmeans_iteration_plan_has_no_join(spark):
    """The Lloyd-round centroid update must be scan + combiner aggregate
    only — the assignment carries vec through, so no Exchange-on-id /
    SortMergeJoin / BroadcastHashJoin may appear in the iteration plan
    (a per-iteration shuffle join is the 100 TB killer the round-4
    verdict flagged)."""
    df = _mk_df(spark, [0, 1, 2], [[0.0, 0.0], [1.0, 1.0], [9.0, 9.0]])
    cached = df.selectExpr("vec_id as id", "embedding as vec")
    centroids = np.array([[0.0, 0.0], [9.0, 9.0]])
    plan = (
        _iteration_sums(cached, centroids, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "Join"):
        assert marker not in plan, marker


def test_kmeans_assign_carry_vec_both_paths(spark):
    """carry_vec=True must emit the input vector unchanged on both the
    JVM-expression and Arrow paths, with identical clusters."""
    rng = np.random.default_rng(5)
    ids = list(range(20))
    vecs = rng.integers(-8, 9, size=(20, 4)).astype(float)
    df = _mk_df(spark, ids, vecs)
    centroids = rng.integers(-8, 9, size=(3, 4)).astype(np.float64)
    jvm = {r["id"]: (r["cluster"], tuple(r["vec"])) for r in
           kmeans_assign(df, "embedding", "vec_id", centroids, carry_vec=True).collect()}
    arrow = {r["id"]: (r["cluster"], tuple(r["vec"])) for r in
             _assign_pandas(df, "embedding", "vec_id", centroids, carry_vec=True).collect()}
    assert jvm == arrow
    for i in ids:
        assert jvm[i][1] == tuple(vecs[i])


def test_kmeans_high_dim_posexplode_update_matches_sequential(spark):
    """Above _DIM_FANOUT_LIMIT the centroid update switches to the
    posexplode + (cluster, pos) combiner path; the fitted centroids must
    still match the sequential Lloyd oracle exactly."""
    dim = _DIM_FANOUT_LIMIT + 3
    rng = np.random.default_rng(17)
    centers = np.vstack([np.zeros(dim), np.full(dim, 40.0)])
    ids, vecs = [], []
    for i in range(30):
        ids.append(i)
        vecs.append(centers[i % 2] + rng.integers(-2, 3, size=dim))
    df = _mk_df(spark, ids, vecs)
    cents = kmeans_fit(df, "embedding", "vec_id", k=2, iterations=2, seed=3)
    ref_cents, _ = _numpy_lloyd(ids, vecs, 2, 2, 3)
    assert np.allclose(cents, ref_cents)


def test_kmeans_jvm_assignment_has_no_python_node(spark):
    """The small-k assignment must stay inside whole-stage codegen —
    no BatchEvalPython / ArrowEvalPython / mapInPandas in the plan."""
    df = _mk_df(spark, [0, 1], [[0.0, 0.0], [1.0, 1.0]])
    centroids = np.zeros((2, 2))
    plan = kmeans_assign(df, "embedding", "vec_id", centroids)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonMapInArrow", "MapInPandas"):
        assert marker not in plan, marker
