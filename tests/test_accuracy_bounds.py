"""Accuracy-deviation suite: the reference's per-key error-bound check
for approximate privatization (evaluate.py:361-414 harness, bounds at
evaluate.py:893-900), at reduced sweep sizes with fixed-seed RNG.

Per released key, the signed error est - true must lie within

    [ -max_inacc - 1 - 2*ln(6 e^eps / ((e^eps + 1) delta)) / eps ,
      ln((k+1) e^eps / ((e^eps + 1) beta)) / eps ]

with deviation rate < beta = 0.05 over repetitions x keys.
"""

import math

import numpy as np

from mgspark import dp


def _bounds(sketch_size, epsilon, delta, beta):
    max_inaccuracy = (
        math.log((sketch_size + 1) * math.exp(epsilon) / ((math.exp(epsilon) + 1) * beta))
        / epsilon
    )
    min_inaccuracy = (
        -max_inaccuracy
        - 1
        - 2 * math.log(6 * math.exp(epsilon) / ((math.exp(epsilon) + 1) * delta)) / epsilon
    )
    return min_inaccuracy, max_inaccuracy


def test_approx_release_per_key_accuracy_deviation_rate():
    epsilon, delta, beta = 1.0, 1e-6, 0.05
    repetitions = 10
    rng = np.random.Generator(np.random.PCG64(42))
    deviations = 0
    max_deviations = 0
    for sketch_size in [10 * 2**i for i in range(6)]:
        sketch = {i: i % 50 for i in range(sketch_size)}
        min_inacc, max_inacc = _bounds(sketch_size, epsilon, delta, beta)
        for _ in range(repetitions):
            released = dp.privatize_misra_gries(dict(sketch), epsilon, delta, rng=rng)
            merged_keys = set(sketch) | set(released)
            max_deviations += len(merged_keys)
            for key in merged_keys:
                error = released.get(key, 0) - sketch.get(key, 0)
                if error < min_inacc or error > max_inacc:
                    deviations += 1
    rate = deviations / max_deviations
    assert rate < beta, f"accuracy deviation rate {rate:.4f} >= beta {beta}"


def test_numerical_threshold_more_accurate_than_union_bound():
    """The reference's headline accuracy claim: the numerical threshold
    yields lower total release inaccuracy than the closed-form union
    bound at the same (eps, delta) (evaluate.py:884-915 comparison)."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from oracles import find_threshold_union_bound

    epsilon, delta = 1.0, 1e-6
    rng_a = np.random.Generator(np.random.PCG64(7))
    rng_b = np.random.Generator(np.random.PCG64(7))
    total_numerical = 0
    total_union = 0
    for sketch_size in [40, 160, 640]:
        sketch = {i: i % 50 for i in range(sketch_size)}
        for _ in range(10):
            rel_n = dp.privatize_misra_gries(dict(sketch), epsilon, delta, rng=rng_a)
            t_union = find_threshold_union_bound(epsilon, delta)
            rel_u = dp.privatize_misra_gries(
                dict(sketch), epsilon, delta, threshold=t_union, rng=rng_b
            )
            for released, bucket in ((rel_n, "n"), (rel_u, "u")):
                err = sum(
                    abs(released.get(key, 0) - sketch.get(key, 0))
                    for key in set(sketch) | set(released)
                )
                if bucket == "n":
                    total_numerical += err
                else:
                    total_union += err
    assert total_numerical < total_union
