"""Kernel-level tests for the sketch families: error bounds, merge
associativity/commutativity, serialization round-trips. No Spark."""

import numpy as np
import pandas as pd
import pytest

from mgspark.sketches.bloom import BloomFilter
from mgspark.sketches.cms import CountMinSketch
from mgspark.sketches.hll import HLLSketch
from mgspark.sketches.kll import KLLSketch
from mgspark.sketches.tdigest import TDigest


def _series(arr):
    return pd.Series(arr)


def _split_build(sketch, data, n_parts=7):
    """Build over shards then tree-merge — simulates the distributed path."""
    parts = np.array_split(data, n_parts)
    states = []
    for part in parts:
        st = sketch.zero()
        # two batches per shard to exercise incremental build
        for batch in np.array_split(part, 2):
            st = sketch.build(st, _series(batch))
        states.append(sketch.deserialize(sketch.serialize(st)))
    acc = sketch.zero()
    for st in states:
        acc = sketch.merge(acc, st)
    return acc, states


@pytest.mark.parametrize("n_distinct", [100, 5_000, 200_000])
def test_hll_accuracy_and_merge(n_distinct):
    rng = np.random.default_rng(42)
    keys = rng.permutation(n_distinct * 3)[:n_distinct].astype(np.int64)
    data = np.repeat(keys, 3)  # duplicates must not matter
    sketch = HLLSketch(p=14)
    merged, states = _split_build(sketch, data)
    est = sketch.estimate(merged)
    rel_err = abs(est - n_distinct) / n_distinct
    assert rel_err < 0.05, f"HLL rel err {rel_err:.3f}"
    # merge commutative + idempotent
    back = sketch.zero()
    for st in reversed(states):
        back = sketch.merge(back, st)
    assert np.array_equal(back, merged)
    assert np.array_equal(sketch.merge(merged, merged), merged)


def test_cms_bounds():
    rng = np.random.default_rng(7)
    data = (rng.zipf(1.3, size=100_000) % 1000).astype(np.int64)
    sketch = CountMinSketch(eps=1e-3, delta=1e-3)
    merged, _ = _split_build(sketch, data)
    uniq, counts = np.unique(data, return_counts=True)
    est = sketch.estimate(merged, uniq)
    assert (est >= counts).all(), "CMS must never underestimate"
    overshoot = (est - counts).max()
    assert overshoot <= sketch.eps * len(data) * 10, f"overshoot {overshoot}"


def test_cms_merge_commutative():
    rng = np.random.default_rng(1)
    sketch = CountMinSketch(eps=1e-3, delta=1e-2)
    a = sketch.build(sketch.zero(), _series(rng.integers(0, 100, 1000)))
    b = sketch.build(sketch.zero(), _series(rng.integers(0, 100, 1000)))
    assert np.array_equal(sketch.merge(a, b), sketch.merge(b, a))


def test_bloom_no_false_negatives_and_fpr():
    rng = np.random.default_rng(3)
    members = rng.choice(10_000_000, size=50_000, replace=False).astype(np.int64)
    sketch = BloomFilter(capacity=100_000, fpr=0.01)
    merged, _ = _split_build(sketch, members)
    assert sketch.contains(merged, members).all(), "false negative!"
    non_members = (members.max() + 1 + np.arange(50_000)).astype(np.int64)
    fpr = sketch.contains(merged, non_members).mean()
    assert fpr < 0.03, f"observed FPR {fpr:.4f}"


def test_bloom_merge_is_union():
    sketch = BloomFilter(capacity=1000, fpr=0.01)
    a = sketch.build(sketch.zero(), _series(np.arange(100, dtype=np.int64)))
    b = sketch.build(sketch.zero(), _series(np.arange(100, 200, dtype=np.int64)))
    merged = sketch.merge(a, b)
    assert sketch.contains(merged, np.arange(200, dtype=np.int64)).all()
    assert np.array_equal(merged, sketch.merge(b, a))


@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal"])
def test_tdigest_quantile_accuracy(dist):
    rng = np.random.default_rng(11)
    if dist == "uniform":
        data = rng.random(200_000)
    elif dist == "normal":
        data = rng.normal(size=200_000)
    else:
        data = rng.lognormal(sigma=2, size=200_000)
    sketch = TDigest(compression=200)
    merged, _ = _split_build(sketch, data)
    assert len(merged[0]) <= 2 * sketch.compression
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = sketch.quantiles(merged, qs)
    exact = np.quantile(data, qs)
    for q, e, x in zip(qs, est, exact):
        # rank error: where does the estimate fall in the true CDF?
        rank = (data <= e).mean()
        assert abs(rank - q) < 0.02, f"q={q}: rank err {abs(rank-q):.4f}"
    assert int(merged[1].sum()) == len(data)


def test_kll_rank_accuracy_and_merge():
    rng = np.random.default_rng(5)
    data = rng.normal(size=150_000)
    sketch = KLLSketch(k=200)
    merged, states = _split_build(sketch, data)
    total_weight = sum(len(b) * 2**h for h, b in enumerate(merged))
    assert total_weight == len(data)
    for q in [0.05, 0.25, 0.5, 0.75, 0.95]:
        est = sketch.quantile(merged, q)
        rank = (data <= est).mean()
        assert abs(rank - q) < 0.03, f"q={q}: rank err {abs(rank-q):.4f}"
    # serialization round-trip
    rt = sketch.deserialize(sketch.serialize(merged))
    assert all(np.array_equal(a, b) for a, b in zip(rt, merged))
